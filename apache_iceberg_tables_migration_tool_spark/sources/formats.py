"""Multi-format source/sink adapters: CSV, JSON(-lines), ORC, Parquet.

The reference's data plane is Iceberg-over-parquet only; real
migration estates also land CSV/JSON exports and ORC warehouses, so
the engine exposes one read/write surface across the four formats
with explicit-schema reads (never inference on the data path — at
100 TB a schema-inference pass is a full extra scan).

Format notes (scale):

- ``parquet``/``orc``: columnar, splittable, predicate-pushdown and
  column-pruning capable — preferred interchange. Readers stay
  vectorized.
- ``csv``/``json``: row formats, no pushdown beyond partition
  pruning; only splittable uncompressed (or bzip2). The adapters
  exist for ingest/egress, and ``convert`` is the recommended first
  step of any pipeline that receives them.
- Timestamps are written/read as microsecond-precision UTC; CSV uses
  an explicit ISO pattern so round-trips are locale-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "json", "csv")

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

_CSV_OPTS = {
    "header": "true",
    "timestampFormat": _TS_FMT,
    "nullValue": "\\N",  # distinguish NULL from empty string
    "escape": '"',
}
_JSON_OPTS = {"timestampFormat": _TS_FMT}


def write_table(df: DataFrame, path: str, fmt: str, mode: str = "overwrite") -> None:
    """Write ``df`` at ``path`` in ``fmt``. Nested struct/array/map
    columns are rejected for CSV (flat-only format) rather than
    silently stringified."""
    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}, got {fmt!r}")
    if fmt == "csv":
        bad = [f.name for f in df.schema.fields if f.dataType.typeName() in ("struct", "array", "map")]
        if bad:
            raise ValueError(f"CSV cannot carry nested columns: {bad}")
        df.write.mode(mode).options(**_CSV_OPTS).csv(path)
    elif fmt == "json":
        df.write.mode(mode).options(**_JSON_OPTS).json(path)
    else:
        getattr(df.write.mode(mode), fmt)(path)


def read_table(spark: SparkSession, path: str, fmt: str, schema: StructType) -> DataFrame:
    """Read ``path`` as ``fmt`` with a REQUIRED explicit schema.

    Columnar formats carry their own schema but the caller's schema is
    still applied (projection by name) so all four formats present the
    identical DataFrame; row formats would otherwise need an inference
    scan."""
    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}, got {fmt!r}")
    if fmt == "csv":
        return spark.read.options(**_CSV_OPTS).schema(schema).csv(path)
    if fmt == "json":
        return spark.read.options(**_JSON_OPTS).schema(schema).json(path)
    # parquet/orc: select enforces name/order parity with the row formats
    df = getattr(spark.read, fmt)(path)
    return df.select(*[f.name for f in schema.fields])


def convert(
    spark: SparkSession,
    src_path: str,
    src_fmt: str,
    dst_path: str,
    dst_fmt: str,
    schema: StructType,
    repartition: int | None = None,
) -> None:
    """Format conversion (the ingest normalization step): read with
    explicit schema, optionally repartition for target file sizing,
    write. One scan, one write, no driver materialization."""
    df = read_table(spark, src_path, src_fmt, schema)
    if repartition is not None:
        df = df.repartition(repartition)
    write_table(df, dst_path, dst_fmt)
