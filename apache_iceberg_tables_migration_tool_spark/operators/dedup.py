"""Deduplication operators (north star X1/X2): exact, keep-latest,
exact n-gram Jaccard, MinHash+LSH, and SimHash.

Scale design notes (100 TB):

- Exact dedup is a hash shuffle on the dedup key — already minimal.
- The exact-Jaccard pair join shuffles on *shingle*; a shingle shared
  by d docs fans out to d² candidate rows, so ultra-frequent shingles
  are the skew hazard. ``max_shingle_docs`` drops them (a shingle in
  thousands of docs carries ~no similarity signal); both the operator
  and any oracle must apply the same cap.
- MinHash/LSH replaces the all-pairs shingle join with a band-bucket
  join: cost O(docs × bands) rows, candidates verified exactly. This
  is the path that survives a billion documents.
- All hashing uses bounded arithmetic (< 2^51) so the expressions are
  safe under ANSI mode (no silent/raising bigint overflow).
"""

from __future__ import annotations

import random
from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from apache_iceberg_tables_migration_tool_spark.session import pin

from apache_iceberg_tables_migration_tool_spark.operators.text import (
    hashed_word_shingles,
)

_MERSENNE31 = 2_147_483_647  # 2^31 - 1


def exact_dedup(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Exact dedup on a key set (X1): one hash shuffle."""
    return df.dropDuplicates(list(keys))


def keep_latest(
    df: DataFrame, keys: Sequence[str], ts_col: str, tiebreak: str
) -> DataFrame:
    """Keep the newest row per key — the reference's 'latest snapshot
    per table' resolution (A3) as a general dedup policy."""
    w = Window.partitionBy(*keys).orderBy(F.desc(ts_col), F.desc(tiebreak))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def _pair_jaccard(
    shingles: DataFrame,
    pair_filter: DataFrame | None = None,
    pre_materialized: bool = False,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for doc pairs sharing ≥1 shingle.

    ``shingles``: (doc_id, shingle) distinct-per-doc (string or
    hashed long — ``text.hashed_word_shingles`` for the fast join).
    If ``pair_filter`` (doc_a, doc_b) is given, only those candidate
    pairs are scored — the LSH verify path.

    The per-doc set sizes come from a separate small aggregation and
    are joined onto the (tiny) intersection result at the end. That
    is deliberate: the alternative — carrying the size with every
    exploded shingle row — forces the shingle array itself through
    the ``Generate``, which copies it into every output row
    (measured 2× slower at sf0.1; see hashed_word_shingles note).
    """
    # One narrow repartition materializes the shingle relation in an
    # Exchange all three consumers (a-side, b-side, sizes) reuse —
    # without it the tokenize+shingle projection is recomputed per
    # branch (the b-side is typically a BroadcastExchange, which never
    # plan-matches the a-side, so nothing would be shared).
    # ``pre_materialized`` callers already sit on such an exchange
    # (e.g. the df-cap path, which shares it with the freq pass) —
    # repartitioning again would pay a second full shuffle for nothing.
    if not pre_materialized:
        shingles = shingles.repartition(F.col("doc_id"))
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = shingles.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = shingles.select(F.col("doc_id").alias("doc_b"), "shingle")
    if pair_filter is not None:
        # Candidate-driven verify: expand each candidate pair with
        # doc_a's shingles, keep those doc_b also has. Cost is
        # O(candidates × shingles/doc) — independent of global shingle
        # frequencies, so the all-pairs blowup never materializes.
        cand = pair_filter.select("doc_a", "doc_b").distinct()
        inter = (
            cand.join(a, "doc_a")
            .join(b, ["doc_b", "shingle"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("i"))
        )
    else:
        inter = (
            a.join(b, "shingle")
            .where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("i"))
        )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))).alias("jaccard"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_shingle_docs: int | None = None,
) -> DataFrame:
    """Exact near-duplicate pairs by word-n-gram Jaccard ≥ threshold.

    Ground truth for the approximate variants; quadratic in the worst
    case — cap hot shingles via ``max_shingle_docs`` at scale.
    """
    sh = hashed_word_shingles(docs, id_col, text_col, n)
    if max_shingle_docs is not None:
        # Broadcast the BLOCKED set, not the allowed one: shingles over
        # the df cap are the Zipf head (a sliver of the distinct-shingle
        # space), while the allowed set is nearly ALL distinct shingles
        # — broadcasting that is GBs at 100 TB. Anti-join against the
        # small hot set keeps the broadcast KB-scale at any corpus size.
        # (If a corpus ever yields a hot set too big to broadcast, drop
        # the hint and let AQE pick a shuffle anti-join — semantics are
        # identical.)
        #
        # Materialize the shingle exchange HERE so the freq pass and
        # the anti-join left side reuse ONE tokenize+shingle evaluation
        # (ReuseExchange); r2 computed the projection twice — the freq
        # pass alone regressed the sf0.1 bench 1.54s → 2.89s. (A
        # localCheckpoint barrier was also tried: ~0.7s SLOWER than the
        # exchange here — the downstream self-join plans better off
        # AQE's shuffle statistics — while the opposite held for
        # band_table's Generate stage. Measure, don't guess.)
        sh = sh.repartition(F.col("doc_id"))
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(
            F.broadcast(freq.where(F.col("df") > max_shingle_docs).select("shingle")),
            "shingle",
            "left_anti",
        )
        return _pair_jaccard(sh, pre_materialized=True).where(
            F.col("jaccard") >= threshold
        )
    return _pair_jaccard(sh).where(F.col("jaccard") >= threshold)


def _hash_params(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(rng.randrange(1, 1 << 20), rng.randrange(0, 1 << 20)) for _ in range(num_hashes)]


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 128,
    seed: int = 42,
) -> DataFrame:
    """(doc_id, sig: array<bigint> of length H) MinHash signatures.

    Shingle → xxhash64 (JVM codegen) → fold to 31 bits; hash family is
    the classic universal (a·h + b) mod (2^31−1), all products < 2^51.

    The H min-folds run in an Arrow-batched pandas UDF as one dense
    numpy (shingles × H) broadcast-multiply + column-min per doc. This
    is the measured exception to the JVM-first rule: Spark's
    higher-order ``aggregate``/``transform`` lambdas always evaluate
    interpreted (no codegen for lambda bodies), costing 1.5s (H=48) /
    3.3s (H=128) at sf0.1, while the vectorized numpy evaluation is a
    flat ~0.9s dominated by the JVM-side shingle hashing + Arrow
    transfer — the fold itself is C-speed and H-independent. Values
    are bit-identical (int64 exact, no overflow below 2^51; numpy
    ``%`` ≡ SQL ``pmod`` for positive operands), verified in tests
    against the SQL formulation.

    No explode, no shuffle: a doc's shingles live in one row, so the
    signature is a per-row projection — embarrassingly parallel at any
    corpus size, with Arrow transfer per batch as the only overhead.
    """
    from pyspark.sql.functions import pandas_udf

    params = _hash_params(num_hashes, seed)
    mul = np.array([a for a, _ in params], dtype=np.int64)
    add = np.array([b for _, b in params], dtype=np.int64)

    @pandas_udf("array<bigint>")
    def _sig(col: pd.Series) -> pd.Series:
        out = []
        for h in col:
            hv = np.asarray(h, dtype=np.int64)
            out.append(
                ((hv[:, None] * mul[None, :] + add[None, :]) % _MERSENNE31).min(axis=0)
            )
        return pd.Series(out)

    toks = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("__toks"))
    arr = F.expr(
        f"array_distinct(transform(sequence(0, size(__toks) - {n}), "
        f"i -> concat_ws(' ', slice(__toks, i + 1, {n}))))"
    )
    sets = toks.where(F.size("__toks") >= n).select(F.col(id_col), arr.alias("__sh"))
    hs = sets.select(
        F.col(id_col),
        F.expr(f"transform(__sh, s -> pmod(xxhash64(s), {_MERSENNE31}L))").alias("__hs"),
    )
    return hs.select(F.col(id_col), _sig(F.col("__hs")).alias("sig"))


def minhash_signatures_sql(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 128,
    seed: int = 42,
) -> DataFrame:
    """Pure-JVM twin of :func:`minhash_signatures` (higher-order
    ``aggregate`` folds — interpreted lambda evaluation, so slower;
    see that docstring's measurements). Kept as the bit-equality
    oracle for the Arrow path and for Python-free deployments."""
    toks = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("__toks"))
    arr = F.expr(
        f"array_distinct(transform(sequence(0, size(__toks) - {n}), "
        f"i -> concat_ws(' ', slice(__toks, i + 1, {n}))))"
    )
    sets = toks.where(F.size("__toks") >= n).select(F.col(id_col), arr.alias("__sh"))
    hs = sets.select(
        F.col(id_col),
        F.expr(f"transform(__sh, s -> pmod(xxhash64(s), {_MERSENNE31}L))").alias("__hs"),
    )
    folds = ", ".join(
        f"aggregate(__hs, {_MERSENNE31}L, "
        f"(m, h) -> least(m, pmod(h * {a}L + {b}L, {_MERSENNE31}L)))"
        for a, b in _hash_params(num_hashes, seed)
    )
    return hs.select(F.col(id_col), F.expr(f"array({folds})").alias("sig"))


def band_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    seed: int = 42,
) -> DataFrame:
    """(id, band, bh) LSH band-bucket table — the persistable
    signature INDEX of a corpus. Computing it is one shuffle-free
    pass over the text (see minhash_signatures); at 100 TB it is
    written once (partitioned by band) and every incremental ingest
    joins against it instead of re-reading corpus text."""
    if num_hashes % bands:
        raise ValueError("num_hashes must divide evenly into bands")
    r = num_hashes // bands
    # Materialize signatures behind an RDD barrier before banding. An
    # Exchange is NOT enough: Catalyst pushes projections through a
    # repartition, inlining the H minhash folds into the Generate
    # stage and re-evaluating them per consumer (and a posexplode over
    # the un-materialized folds measured ~50× slower at sf0.1).
    # localCheckpoint is opaque to the optimizer, so banding reads the
    # cached sig array. At true corpus scale the index is persisted to
    # storage anyway (see docstring / ``dedup_batch_against_corpus``'s
    # ``corpus_bands``), which is the same barrier in durable form.
    sigs = minhash_signatures(
        docs, id_col, text_col, n, num_hashes, seed
    ).transform(pin)
    band_hashes = F.array(
        *[
            F.xxhash64(F.lit(b), *[F.col("sig")[b * r + j] for j in range(r)])
            for b in range(bands)
        ]
    )
    return sigs.select(F.col(id_col), F.posexplode(band_hashes).alias("band", "bh"))


def dedup_batch_against_corpus(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    seed: int = 42,
    corpus_bands: DataFrame | None = None,
    new_bands: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup detection: which NEW documents duplicate
    something already in the corpus? The per-ingest step of a crawl
    pipeline — a fresh batch lands and must be checked against the
    accumulated 100 TB corpus without rescanning it.

    Returns (doc_a, doc_b, jaccard) with doc_a from the new batch,
    doc_b from the corpus, exact word-n-gram Jaccard ≥ threshold.
    Ids must be disjoint across the two inputs (they are distinct
    corpora by definition).

    Scale shape — the corpus is touched exactly twice, both times
    narrowly:

    1. Candidate generation joins the small new-batch band table
       against the corpus band table (pass a precomputed/persisted
       one via ``corpus_bands`` to skip even that signature pass).
       The new side is ingest-batch sized, so this hash join is
       effectively a lookup into the corpus index.
    2. Verification shingles ONLY the corpus docs that appear as
       candidates (left-semi prune before tokenizing) — corpus text
       is read just for the candidate sliver, never in full.
    """
    # callers that also persist the batch's band rows (incremental
    # ingest) pass them in so the batch text is signatured ONCE
    nb = (
        new_bands
        if new_bands is not None
        else band_table(new_docs, id_col, text_col, n, num_hashes, bands, seed)
    )
    cb = (
        corpus_bands
        if corpus_bands is not None
        else band_table(corpus_docs, id_col, text_col, n, num_hashes, bands, seed)
    )
    candidates = (
        nb.select(F.col(id_col).alias("doc_a"), "band", "bh")
        .join(cb.select(F.col(id_col).alias("doc_b"), "band", "bh"), ["band", "bh"])
        .select("doc_a", "doc_b")
        .distinct()
        # two consumers (corpus semi-join prune + verify pair filter):
        # without a materialization point each would recompute BOTH
        # band tables — i.e. re-signature the corpus. The candidate
        # set is near-dup-pair sized (tiny), so pin it once.
        .transform(pin)
    )
    cand_corpus = corpus_docs.join(
        candidates.select(F.col("doc_b").alias(id_col)).distinct(),
        id_col,
        "left_semi",
    )
    # Same barrier as minhash_lsh_pairs' verify: four consumers, and
    # the repartition inside _pair_jaccard can be elided by Catalyst
    # (output already partitioned by doc_id), re-running the prune +
    # tokenize per consumer. Candidate docs are batch-plus-sliver
    # sized, so pin them once.
    sh = hashed_word_shingles(
        new_docs.select(F.col(id_col), F.col(text_col)).unionByName(
            cand_corpus.select(F.col(id_col), F.col(text_col))
        ),
        id_col,
        text_col,
        n,
    ).transform(pin)
    return _pair_jaccard(sh, pair_filter=candidates, pre_materialized=True).where(
        F.col("jaccard") >= threshold
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs via MinHash banding + exact-Jaccard verification.

    Bands of r = H/bands rows; docs agreeing on any band become
    candidates (prob 1−(1−s^r)^bands; H=128, b=32 → ~1.0 recall at
    s ≥ 0.8, still ≈0.98 at s = 0.5). Candidates are then scored with
    exact Jaccard, so precision is exact and recall is the only
    approximation. Output schema matches ngram_jaccard_pairs.
    """
    # band_table pins the signature relation with an RDD barrier (see
    # its comment — an Exchange alone gets optimized through and drops
    # the fold projection out of codegen); both sides of the band
    # self-join read the one materialized signature set.
    banded = band_table(docs, id_col, text_col, n, num_hashes, bands, seed)
    # Candidate generation as a band self-join: both sides hash-join on
    # (band, bucket) over the SAME reused exchange, and pair expansion
    # parallelizes across the join (skew-robust: a hot bucket fans out
    # over partitions instead of exploding inside one task). A
    # collect_set + in-bucket pair-expansion variant measured faster in
    # isolation but slower in the full pipeline (object-hash aggregate
    # + per-bucket O(k²) expansion) — keep the join.
    a = banded.select(F.col(id_col).alias("doc_a"), "band", "bh")
    b = banded.select(F.col(id_col).alias("doc_b"), "band", "bh")
    candidates = (
        a.join(b, ["band", "bh"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # Verify shingles ONLY candidate docs: near-dup candidates are a
    # sliver of the corpus, so tokenizing everything again just to
    # have the pair join discard it wastes a corpus-sized shuffle —
    # semi-join prune first (same shape as the incremental-ingest
    # variant). The candidate set feeds two consumers; pin it once.
    candidates = candidates.transform(pin)
    cand_ids = (
        candidates.select(F.col("doc_a").alias(id_col))
        .unionByName(candidates.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    # Pin the candidate shingles with an RDD barrier: the verify has
    # FOUR consumers (a-side, b-side, na, nb) and the repartition-
    # by-doc_id barrier inside _pair_jaccard collapses here — the
    # semi-join output is already hash-partitioned by doc_id, so
    # Catalyst elides the exchange and each consumer re-runs the
    # semi-join + tokenize (r14 plan audit: 4 × SortMergeJoin LeftSemi
    # + Generate subtrees). Candidate docs are a sliver of the corpus,
    # so the checkpoint holds little and the tokenize runs ONCE
    # (measured 2.72 s → 2.08 s at sf0.1).
    sh = hashed_word_shingles(
        docs.join(cand_ids, id_col, "left_semi"), id_col, text_col, n
    ).transform(pin)
    return _pair_jaccard(sh, pair_filter=candidates, pre_materialized=True).where(
        F.col("jaccard") >= threshold
    )


#: SimHash width: 60 bits = 15 hex digits of md5. Deliberately NOT 64:
#: (a) bit 63 would make the reassembled bigint sign-wrap, which some
#: engines reject; (b) 15 digits keep every intermediate < 2^60, safe
#: under ANSI arithmetic everywhere.
SIMHASH_BITS = 60


def simhash_bit_sql(k: int, hex_col: str, dialect: str) -> str:
    """Bit ``k`` (0-based) of the md5-derived token hash, as a SQL
    expression over the hex string column — one shared builder emits
    BOTH dialects (the zorder pattern), so Spark and the DuckDB oracle
    compute bit-identical signatures. Bit k lives in hex digit k/4 at
    nibble position k%4."""
    j, shift = divmod(k, 4)
    pos = f"substr({hex_col}, {j + 1}, 1)"
    if dialect == "spark":
        digit = f"(instr('0123456789abcdef', {pos}) - 1)"
        shifted = f"shiftright({digit}, {shift})" if shift else digit
    elif dialect == "duckdb":
        digit = f"(strpos('0123456789abcdef', {pos}) - 1)"
        shifted = f"({digit} >> {shift})" if shift else digit
    else:  # pragma: no cover
        raise ValueError(f"unknown dialect {dialect!r}")
    return f"(({shifted}) & 1)"


def simhash_sig_sql(dialect: str, sum_prefix: str = "s") -> str:
    """Reassemble the per-bit sign sums ``s0..s{B-1}`` into the
    signature bigint: Σ 2^k over bits whose sum is positive. Literal
    powers of two (not shifts) — portable and ANSI-safe at 60 bits."""
    del dialect  # identical in both dialects; kept for call symmetry
    terms = " + ".join(
        f"(CASE WHEN {sum_prefix}{k} > 0 THEN {1 << k} ELSE 0 END)"
        for k in range(SIMHASH_BITS)
    )
    return f"({terms})"


def simhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """60-bit SimHash over the token multiset → (doc_id, simhash).

    Per bit k: sign of Σ_tokens (bit_k(md5(token)) ? +1 : −1);
    60 conditional SUM aggregates in one pass, reassembled from
    literal powers of two. Hamming distance between signatures
    approximates angular distance between token-frequency vectors.

    Bits come from md5 (not xxhash64) ON PURPOSE: md5 exists in every
    engine, so the full signature — and therefore per-pair Hamming
    distances — is recomputable by the DuckDB oracle via the shared
    ``simhash_bit_sql``/``simhash_sig_sql`` builders. That turns the
    simhash query's recall contract from a pinned-TRUE assertion
    (which a tail pair with large Hamming eventually breaks — seen at
    sf0.1) into an exact cross-engine value check at any scale.
    """
    tok = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).withColumn("hx", F.md5("w"))
    bit_sums = [
        F.sum(
            F.when(F.expr(simhash_bit_sql(k, "hx", "spark")) == 1, 1).otherwise(-1)
        ).alias(f"s{k}")
        for k in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy(id_col).agg(*bit_sums)
    return agg.select(
        F.col(id_col), F.expr(simhash_sig_sql("spark")).cast("bigint").alias("simhash")
    )


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 10,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Pigeonhole banding: split the 60 bits into ``bands`` blocks; any
    pair within distance < bands must agree on ≥1 block → equi-join
    per block, exact popcount verify. Linear-ish candidate generation
    instead of the quadratic all-pairs XOR.

    ``max_hamming`` must be < ``bands`` — that is the pigeonhole
    guarantee. A larger threshold would return only the LUCKY subset
    of qualifying pairs (whichever happen to share a block), a silent
    recall hole this guard turns into a loud error (round-2 shipped
    max_hamming=10 over 8 bands and lost 3 true pairs at sf0.1).
    """
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs bands > max_hamming "
            f"(got {bands}): pigeonhole only guarantees recall for "
            "distance < bands"
        )
    width = SIMHASH_BITS // bands
    sigs = simhash_signatures(docs, id_col, text_col)
    mask = (1 << width) - 1
    block_arr = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), b * width).bitwiseAND(F.lit(mask))
            for b in range(bands)
        ]
    )
    blocks = sigs.select(F.col(id_col), F.col("simhash"), F.posexplode(block_arr).alias("band", "blk"))
    a = blocks.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sig_a"), "band", "blk")
    b = blocks.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sig_b"), "band", "blk")
    return (
        a.join(b, ["band", "blk"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def duplicate_spans(
    docs: DataFrame,
    window: int = 8,
    min_occurrences: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact duplicate-SPAN detection — substring-level dedup, the
    sequence-granular counterpart of document-level near-dedup
    (the "dedup at the 50-token-span level" strategy from
    'Deduplicating Training Data Makes Language Models Better',
    Lee et al. 2022): flag every consecutive ``window``-token span
    whose exact text occurs ``min_occurrences``+ times anywhere in
    the corpus (cross-doc or repeated in-doc), and report per doc how
    many of its spans are duplicated.

    Plan shape: tokenize once, md5 every consecutive span (a codegen
    ``transform`` over ``slice`` — zero Python), explode to
    (doc, span_hash), ONE hash shuffle counts span occurrences, a
    span_hash join + doc-keyed aggregation rolls the flags back up.
    Cost is O(tokens × window) span bytes and two hash shuffles — no
    pairwise join anywhere, so it scales linearly to a 100 TB corpus
    (shard by span_hash). md5 keeps the span key engine-portable
    (DuckDB oracle reproduces it bit-for-bit).

    Returns (id, n_spans, dup_spans, dup_ratio); docs shorter than
    ``window`` tokens yield no row.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if min_occurrences < 1:
        raise ValueError(f"min_occurrences must be >= 1, got {min_occurrences}")
    toks = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("__t"))
    spans = toks.where(F.size("__t") >= window).select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(1, size(__t) - {window} + 1), "
                f"i -> md5(concat_ws(' ', slice(__t, i, {window}))))"
            )
        ).alias("span_hash"),
    )
    occ = spans.groupBy("span_hash").agg(F.count(F.lit(1)).alias("__occ"))
    return (
        spans.join(occ, "span_hash")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(
                F.when(F.col("__occ") >= min_occurrences, 1).otherwise(0)
            ).alias("dup_spans"),
        )
        .select(
            F.col(id_col),
            F.col("n_spans").cast("bigint").alias("n_spans"),
            F.col("dup_spans").cast("bigint").alias("dup_spans"),
            (F.col("dup_spans").cast("double") / F.col("n_spans")).alias("dup_ratio"),
        )
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 30,
) -> DataFrame:
    """Cluster near-duplicate pairs into components → (doc_id,
    cluster_id) with cluster_id = min doc_id of the component — the
    step that turns a pair list into dedup groups with a canonical
    survivor per group.

    Iterative min-label propagation: each round every node takes the
    minimum of its own label and its neighbors' labels; converged when
    the global label sum stops decreasing (labels are monotone
    non-increasing, so one scalar per round is a sound fixpoint test).
    Rounds needed ≈ component diameter — near-dup clusters are
    clique-ish, so 2-3 rounds in practice; each round is one join +
    one aggregate shuffled on the node id, and ``localCheckpoint``
    truncates the lineage so plans stay O(1) per round instead of
    growing with iterations (the standard Spark iterative-algorithm
    hazard). Singleton docs (no pairs) are not emitted — left-join
    from the corpus if needed.
    """
    e = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    edges = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    edges = edges.transform(pin, eager=True)
    labels = (
        edges.select(F.col("a").alias("node")).distinct().withColumn("label", F.col("node"))
    ).transform(pin, eager=True)
    prev_sum = labels.agg(F.sum("label")).first()[0]
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(nbr, labels.node == nbr.a, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
            )
            .transform(pin, eager=True)
        )
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(f"label propagation did not converge in {max_iter} rounds")
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def cap_blocks(
    blocks: DataFrame,
    bucket_cols: list[str],
    max_bucket: int,
    order_col: str,
    what: str,
) -> DataFrame:
    """Hot-bucket guard for banded candidate generation: keep at most
    ``max_bucket`` members per bucket (deterministic — lowest
    ``order_col`` first, so reruns keep the same representatives) and
    LOG how much was dropped — never a silent cap. An adversarial
    bucket (a flood of near-constant images, one hot Voronoi cell)
    otherwise yields a quadratic candidate set that stalls the stage;
    capping bounds it at max_bucket² per bucket. Dropped members lose
    only the pairs *within this bucket* — multi-band/multi-probe
    schemes still find them through their other buckets. The drop
    count costs one small aggregate job over the block rows (already
    materialized by the caller's checkpoint)."""
    import logging

    w = Window.partitionBy(*bucket_cols).orderBy(order_col)
    ranked = blocks.withColumn("__rk", F.row_number().over(w))
    stats = (
        ranked.groupBy(*bucket_cols).count()
        .where(F.col("count") > max_bucket)
        .agg(
            F.count("*").alias("hot"),
            F.sum(F.col("count") - max_bucket).alias("dropped"),
            F.max("count").alias("biggest"),
        )
        .first()
    )
    if stats and stats["hot"]:
        logging.getLogger(__name__).warning(
            "%s: capped %d hot bucket(s) at %d members "
            "(largest had %d; %d member rows dropped) — pairs confined "
            "to a capped bucket are NOT emitted; run exact dedup first "
            "to collapse identical payloads",
            what, stats["hot"], max_bucket, stats["biggest"], stats["dropped"],
        )
    return ranked.where(F.col("__rk") <= max_bucket).drop("__rk")


def banded_hamming_pairs(
    sig: DataFrame,
    band_cols: list[str],
    max_hamming: int,
    id_col: str = "doc_id",
    max_bucket: int | None = None,
) -> DataFrame:
    """All pairs within ``max_hamming`` bits over a signature split
    into per-band integer columns — the multi-column generalization of
    :func:`simhash_pairs` (image pHash bands, any fixed-width binary
    sketch). Pigeonhole banding: a pair within distance <
    ``len(band_cols)`` must agree on ≥1 band → one equi-join per band
    via posexplode, exact popcount verify over the carried band
    values. ``max_hamming`` must be < the band count or recall would
    silently depend on luck (same guard as :func:`simhash_pairs`).

    Scale shape: candidate generation is an equi-shuffle on (band,
    value) — only hash-colliding docs meet, never all pairs; the
    verify is arithmetic on the joined row. Returns (id_a, id_b,
    hamming) with id_a < id_b, deduped across bands.

    The signature projection is eagerly localCheckpoint-ed first:
    both self-join sides would otherwise re-execute the upstream
    (typically a full image decode + hash) — the same
    single-upstream-execution contract as ``cosine_pairs``; the
    checkpoint holds one id plus a few ints per doc.

    Hot-bucket note: a flood of IDENTICAL images collapses into one
    (band, value) bucket and the candidate set is quadratic in the
    flood size — but those pairs are genuinely all duplicates, so the
    OUTPUT itself is quadratic; no cap can fix what the data asks
    for. The scalable composition is exact dedup FIRST (hash the
    payload bytes, keep one representative per identical image —
    `exact_dedup`), then band the surviving distinct images; near-dup
    clusters of distinct images are small, so buckets stay small.
    When the input may be adversarial anyway, ``max_bucket`` bounds
    each (band, value) bucket via :func:`cap_blocks` (logged, never
    silent): candidates become ≤ max_bucket² per bucket at the
    documented cost of pairs confined to a capped bucket."""
    if max_hamming >= len(band_cols):
        raise ValueError(
            f"max_hamming={max_hamming} needs more bands than distance "
            f"(got {len(band_cols)}): pigeonhole only guarantees recall "
            "for distance < band count"
        )
    sig = sig.select(id_col, *band_cols).transform(pin, eager=True)
    arr = F.array(*[F.col(c) for c in band_cols])
    blocks = sig.select(
        F.col(id_col), *band_cols, F.posexplode(arr).alias("band", "blk")
    )
    if max_bucket is not None:
        blocks = cap_blocks(
            blocks, ["band", "blk"], max_bucket, id_col,
            "banded_hamming_pairs",
        )
    a = blocks.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"__a_{c}") for c in band_cols],
        "band", "blk",
    )
    b = blocks.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"__b_{c}") for c in band_cols],
        "band", "blk",
    )
    ham = None
    for c in band_cols:
        d = F.bit_count(F.col(f"__a_{c}").bitwiseXOR(F.col(f"__b_{c}")))
        ham = d if ham is None else (ham + d)
    return (
        a.join(b, ["band", "blk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def hamming_batch_against_index(
    batch_sig: DataFrame,
    index_sig: DataFrame,
    band_cols: list[str],
    max_hamming: int,
    id_col: str = "doc_id",
    index_blocks: DataFrame | None = None,
) -> DataFrame:
    """Incremental image-dedup ingest: which NEW signatures sit within
    ``max_hamming`` bits of something already in the corpus? The
    per-ingest twin of :func:`banded_hamming_pairs`, shaped like
    :func:`dedup_batch_against_corpus`'s band-index lookup: the
    batch's band rows equi-join the corpus's band rows on (band,
    value) — a batch-sized probe (AQE broadcasts the batch side when
    small), never all pairs, and the corpus is never re-decoded or
    re-hashed: the probe touches only the compact signature table
    (one id plus a few ints per image). Persist ``index_sig`` in a
    catalog table and append each accepted batch's signatures to make
    ingest decode-free at any corpus size; to also skip the per-batch
    explode and enable (band, value) clustering/bucketing of the
    index, persist the EXPLODED band rows once and pass them as
    ``index_blocks`` (columns: ``{id_col}``, the band columns,
    ``band``, ``blk`` — the shape this function derives internally).
    Ids must be disjoint across the two inputs. Returns (id_a from
    the batch, id_b from the corpus, hamming ≤ max_hamming), exact
    popcount verify; same pigeonhole recall guard as
    :func:`banded_hamming_pairs`."""
    if max_hamming >= len(band_cols):
        raise ValueError(
            f"max_hamming={max_hamming} needs more bands than distance "
            f"(got {len(band_cols)}): pigeonhole only guarantees recall "
            "for distance < band count"
        )

    def blocks(df: DataFrame, role: str) -> DataFrame:
        arr = F.array(*[F.col(c) for c in band_cols])
        return df.select(
            F.col(id_col).alias(f"id_{role}"),
            *[F.col(c).alias(f"__{role}_{c}") for c in band_cols],
            F.posexplode(arr).alias("band", "blk"),
        )

    # the batch is signatured once (it is typically the output of a
    # decode+hash pass); the index side is a plain table scan
    a = blocks(batch_sig.select(id_col, *band_cols).transform(pin, eager=True), "a")
    if index_blocks is not None:
        b = index_blocks.select(
            F.col(id_col).alias("id_b"),
            *[F.col(c).alias(f"__b_{c}") for c in band_cols],
            "band", "blk",
        )
    else:
        b = blocks(index_sig.select(id_col, *band_cols), "b")
    ham = None
    for c in band_cols:
        d = F.bit_count(F.col(f"__a_{c}").bitwiseXOR(F.col(f"__b_{c}")))
        ham = d if ham is None else (ham + d)
    return (
        a.join(b, ["band", "blk"])
        .select("id_a", "id_b", ham.alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
