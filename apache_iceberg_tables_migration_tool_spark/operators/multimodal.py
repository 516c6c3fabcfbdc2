"""Multimodal column plumbing (north star X5).

Convention: a modality payload is an opaque ``binary`` column paired
with a typed metadata struct::

    content  binary
    meta     struct<mime:string, n_bytes:bigint, checksum:bigint>

The Spark-side machinery — schemas, Arrow batch shapes, partitioned
mapInPandas feature extraction, deterministic chunk/frame sampling —
is real and tested. The actual media decode (image/audio libs are not
in this container) is STUBBED: ``decode_image`` raises
``NotImplementedError`` by design, and ``extract_features`` uses a
deterministic byte-histogram fake with the exact UDF signature a real
CLIP/mel-spectrogram extractor would have (swap the inner function,
keep the plumbing).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo payload builder: treat UTF-8 bytes of a text column as an
    opaque binary payload + typed metadata struct (in a real pipeline
    the payload arrives as image/audio bytes from the lake)."""
    content = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("content", content).withColumn(
        "meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(content).cast("bigint").alias("n_bytes"),
            F.xxhash64(content).alias("checksum"),
        ),
    )


def decode_image(content: Column) -> Column:  # pragma: no cover - stub
    """STUB: real image decode requires PIL/libvips, not present in
    this container. The scale design is: Arrow-batched mapInPandas,
    one decode per row inside a partition iterator (never a
    row-at-a-time Python UDF), partition count sized so each batch's
    decoded frames fit executor memory."""
    raise NotImplementedError(
        "image decode is stubbed in this environment; plug a Pandas-UDF "
        "decoder with the extract_features signature"
    )


def extract_features(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    Deterministic fake featurizer: a 16-bin byte-value histogram,
    L1-normalized — stands in for an embedding model, exercising the
    real batch path (Arrow transfer of binary columns, numpy over the
    batch, fixed-dim array<float> output)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = []
            for payload in pdf[content_col]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(
                    np.float64
                )
                total = hist.sum() or 1.0
                feats.append((hist / total).astype(np.float32).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, content_col).mapInPandas(
        featurize, schema=f"{id_col} bigint, features array<float>"
    )


def sample_chunks(
    df: DataFrame,
    n_chunks: int = 4,
    chunk_bytes: int = 16,
    content_col: str = "content",
) -> DataFrame:
    """Deterministic payload chunk sampling (≙ video frame sampling):
    n evenly-spaced byte windows as an array<binary> column — pure
    JVM expressions (substring on binary), no Python."""
    size = F.octet_length(F.col(content_col))
    chunks = F.array(
        *[
            F.substring(
                F.col(content_col),
                (F.floor(size * i / n_chunks) + 1).cast("int"),
                chunk_bytes,
            )
            for i in range(n_chunks)
        ]
    )
    return df.withColumn("chunks", chunks)


def resize_payload(
    df: DataFrame,
    target_bytes: int = 64,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Payload resize (≙ image thumbnail / audio downsample), same
    contract as ``extract_features``: Arrow-batched mapInPandas with a
    deterministic fake kernel — evenly-strided byte selection down to
    ``target_bytes`` (shorter payloads pass through). A real resize
    swaps the inner numpy block for PIL/ffmpeg on the SAME batch
    iterator; schema, meta refresh, and partition shape stay as-is."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for payload in pdf[content_col]:
                raw = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(raw) > target_bytes:
                    idx = np.floor(np.arange(target_bytes) * len(raw) / target_bytes)
                    raw = raw[idx.astype(np.int64)]
                out.append(raw.tobytes())
            yield pd.DataFrame({id_col: pdf[id_col], "resized": out})

    resized = df.select(id_col, content_col).mapInPandas(
        kernel, schema=f"{id_col} bigint, resized binary"
    )
    return df.join(resized, id_col).withColumn(
        "meta_resized",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length("resized").cast("bigint").alias("n_bytes"),
            F.xxhash64("resized").alias("checksum"),
        ),
    )
