"""Training-data curation operators (corpus-scale preprocessing).

The capabilities a 100-TB LLM-pretraining pipeline needs on top of
dedup/similarity/text-stats: benchmark-contamination detection, PII
redaction, intra-document repetition metrics, deterministic
stratified sampling, and GPT-style sequence packing. Everything in
this module is JVM-side codegen expressions or candidate-bounded
joins — no Python in the row path anywhere.

Reference scope note: the reference tool has no curation surface;
these extend the engine per the build contract (first-class
LLM-pipeline operators), reusing its shingling (`operators/text.py`)
and portable-hash conventions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from apache_iceberg_tables_migration_tool_spark.session import pin

from apache_iceberg_tables_migration_tool_spark.operators.text import (
    hashed_word_shingles,
    token_count,
)

# --------------------------------------------------------------------------
# Benchmark contamination (n-gram overlap against an eval set)
# --------------------------------------------------------------------------


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_shared: int = 1,
) -> DataFrame:
    """Docs sharing ≥ ``min_shared`` distinct word ``n``-grams with a
    benchmark/eval corpus → (id, n_shared_shingles, contaminated).

    Scale shape: the benchmark shingle set is DISTINCT-ed and
    **broadcast** (eval suites are MBs against a 100-TB corpus), so
    the corpus-side shingle stream joins map-side with no shuffle of
    corpus data; the only exchange is the per-doc count aggregation,
    which partial-aggregates map-side first. Shingles travel as
    xxhash64 longs, not strings."""
    bench_shingles = (
        hashed_word_shingles(benchmark, id_col, text_col, n)
        .select("shingle")
        .distinct()
    )
    doc_shingles = hashed_word_shingles(docs, id_col, text_col, n)
    shared = (
        doc_shingles.join(F.broadcast(bench_shingles), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
        .where(F.col("n_shared_shingles") >= min_shared)
    )
    return shared.withColumn("contaminated", F.lit(True))


# --------------------------------------------------------------------------
# PII redaction (regex, JVM-side)
# --------------------------------------------------------------------------

# Patterns restricted to syntax Java regex and RE2 (DuckDB) treat
# identically, so the operator is oracle-checkable cross-engine.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-row PII match counts (emails / IPv4 / NANP-style phones)."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        "n_emails": F.regexp_count(c, F.lit(EMAIL_RE)),
        "n_ips": F.regexp_count(c, F.lit(IP_RE)),
        "n_phones": F.regexp_count(c, F.lit(PHONE_RE)),
    }


def redact_pii(text: Column | str) -> Column:
    """Replace emails → <EMAIL>, IPv4 → <IP>, phones → <PHONE>.
    Order matters: emails first (their host part would otherwise be
    clipped by the IP rule for numeric domains), then IPs (dotted
    quads must not be half-eaten by the phone rule), then phones.
    Pure ``regexp_replace`` chain — whole-stage codegen, no UDF."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, IP_RE, "<IP>")
    return F.regexp_replace(c, PHONE_RE, "<PHONE>")


# --------------------------------------------------------------------------
# Intra-document repetition (dup n-gram ratio, Gopher-style)
# --------------------------------------------------------------------------


def repetition_metrics(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """Per-doc repetition profile: total vs distinct word ``n``-grams
    and the duplicate-n-gram ratio (the classic repetition quality
    gate). Entirely per-row array expressions inside whole-stage
    codegen — a narrow map over the scan, no shuffle, no explode."""
    toks = F.split(F.col(text_col), " ")
    grams = F.expr(
        f"transform(sequence(0, size(split({text_col}, ' ')) - {n}), "
        f"i -> concat_ws(' ', slice(split({text_col}, ' '), i + 1, {n})))"
    )
    n_grams = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    n_uniq = F.when(F.size(toks) >= n, F.size(F.array_distinct(grams))).otherwise(0)
    return df.select(
        F.col(id_col),
        n_grams.alias("n_ngrams"),
        n_uniq.alias("n_uniq_ngrams"),
        F.when(n_grams > 0, 1.0 - n_uniq.cast("double") / n_grams)
        .otherwise(0.0)
        .alias("dup_ngram_ratio"),
    )


# --------------------------------------------------------------------------
# Source/domain-level curation (RefinedWeb/C4-style reputation gates)
# --------------------------------------------------------------------------


def source_reputation(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    min_uniq_ratio: float = 0.5,
    max_dup_rate: float = 0.2,
) -> DataFrame:
    """Per-source reputation scoreboard: doc volume, exact-duplicate
    rate, aggregate lexical diversity, and a keep/drop verdict — the
    domain-level filtering stage of a web-corpus pipeline (drop mirror
    farms and template domains wholesale before any per-doc work).

    Returns (source, n_docs, n_distinct_texts, dup_rate,
    uniq_token_ratio, keep).

    Plan shape at 100 TB: one projection computes per-doc token counts
    and a 64-bit text hash inside codegen; ONE shuffle on
    (source, hash) feeds a two-level aggregation (count-distinct
    expands map-side), and the scoreboard is O(sources) rows. Ratios
    are single IEEE divisions of exact bigint sums, so values
    hash-match any ANSI oracle. The verdict joins back to docs with a
    broadcast (O(sources) rows) when filtering.
    """
    toks = F.split(F.col(text_col), " ")
    base = docs.select(
        F.col(source_col).alias("source"),
        F.xxhash64(F.col(text_col)).alias("__th"),
        F.size(toks).alias("__nt"),
        F.size(F.array_distinct(toks)).alias("__nu"),
    )
    agg = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("__th").alias("n_distinct_texts"),
        F.sum("__nt").alias("__sum_nt"),
        F.sum("__nu").alias("__sum_nu"),
    )
    dup_rate = (F.col("n_docs") - F.col("n_distinct_texts")).cast("double") / F.col(
        "n_docs"
    )
    uniq_ratio = F.col("__sum_nu").cast("double") / F.col("__sum_nt")
    return agg.select(
        "source",
        "n_docs",
        "n_distinct_texts",
        dup_rate.alias("dup_rate"),
        uniq_ratio.alias("uniq_token_ratio"),
        (
            (dup_rate <= F.lit(float(max_dup_rate)))
            & (uniq_ratio >= F.lit(float(min_uniq_ratio)))
        ).alias("keep"),
    )


def filter_by_source_reputation(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    min_uniq_ratio: float = 0.5,
    max_dup_rate: float = 0.2,
) -> DataFrame:
    """Docs surviving the source-level gate: broadcast the O(sources)
    keep-set and semi-join — the corpus never shuffles."""
    kept = source_reputation(
        docs, id_col, text_col, source_col, min_uniq_ratio, max_dup_rate
    ).where(F.col("keep")).select("source")
    return docs.join(
        F.broadcast(kept), docs[source_col] == kept["source"], "left_semi"
    )


def source_overlap(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    min_shared: int = 1,
) -> DataFrame:
    """Cross-source duplication matrix: (source_a, source_b,
    n_shared_texts) for source pairs sharing ≥ ``min_shared`` exact
    text hashes — the mirror/syndication detector that tells a crawl
    pipeline which domains republish each other (then one of each
    pair can be dropped wholesale).

    Plan shape: the (source, hash) relation is distinct-ed (one
    shuffle, map-side partial), self-joined on hash — fan-out per
    hash is O(sources-carrying-it)², bounded by the source count, not
    the corpus — and the pair counts are O(sources²) rows."""
    sh = docs.select(
        F.col(source_col).alias("source"), F.xxhash64(F.col(text_col)).alias("__th")
    ).distinct()
    a = sh.select(F.col("source").alias("source_a"), "__th")
    b = sh.select(F.col("source").alias("source_b"), "__th")
    return (
        a.join(b, "__th")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared_texts"))
        .where(F.col("n_shared_texts") >= min_shared)
    )


# --------------------------------------------------------------------------
# Deterministic stratified sampling
# --------------------------------------------------------------------------

#: LCG constants (glibc): portable int64 arithmetic both Spark and any
#: ANSI oracle evaluate identically — unlike xxhash64, which external
#: engines don't implement.
_LCG_A, _LCG_C, _LCG_M = 1103515245, 12345, 2**31


def sample_bucket(id_col: Column | str, buckets: int = 100) -> Column:
    """Deterministic pseudo-uniform bucket in [0, buckets) from an id:
    ``((id % 1000003) * A + C) mod 2^31 mod buckets``. The leading
    prime modulus bounds the multiply far inside int64 for arbitrarily
    large ids (100-TB id spaces included)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return ((c % 1000003) * _LCG_A + _LCG_C) % _LCG_M % buckets


def stratified_sample(
    df: DataFrame,
    rates_pct: dict[str, int],
    id_col: str = "doc_id",
    strata_col: str = "lang",
    default_pct: int = 0,
) -> DataFrame:
    """Keep a deterministic ``rates_pct[stratum]``-percent sample per
    stratum (language/domain quota sampling for training mixes).
    Row-local filter — fully pushed into the scan, zero shuffle, and
    the same rows survive on every engine and every rerun."""
    bucket = sample_bucket(id_col)
    rate = F.lit(default_pct)
    for stratum, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(strata_col) == stratum, pct).otherwise(rate)
    return df.where(bucket < rate)


def quality_weighted_sample(
    df: DataFrame,
    quality: Column,
    bands: list[tuple[float, int]],
    id_col: str = "doc_id",
    default_pct: int = 0,
) -> DataFrame:
    """Quality-PROPORTIONAL sampling (the DCLM/FineWeb move): instead
    of a hard quality cutoff, keep a per-row percentage determined by
    which quality band the row falls in — high-quality text is
    oversampled, low-quality text still contributes a trickle instead
    of being cliff-dropped.

    ``bands`` is [(min_quality, keep_pct), …]; the HIGHEST matching
    threshold wins (they are sorted descending internally), rows below
    every threshold keep ``default_pct``. Selection uses the same
    portable LCG bucket as :func:`stratified_sample`, so it is a pure
    row-local filter — pushed to the scan, zero shuffle, identical
    rows chosen on every engine and rerun. ``quality`` is any
    deterministic per-row expression (unique-token ratio, surprisal
    band, classifier margin)."""
    bucket = sample_bucket(id_col)
    rate = F.lit(default_pct)
    for thr, pct in sorted(bands):  # ascending: later (higher) whens win
        rate = F.when(quality >= F.lit(float(thr)), pct).otherwise(rate)
    return df.where(bucket < rate)


def mixture_sample(
    df: DataFrame,
    weights: dict[str, int],
    budget_rows: int,
    id_col: str = "doc_id",
    strata_col: str = "lang",
) -> DataFrame:
    """Budget-driven training-mix composition: draw ``budget_rows``
    rows distributed across strata by relative ``weights`` ("50% en,
    20% zh, …" for a fixed-size training run). Per-stratum targets
    are exact integers fixed at plan time —
    ``t_s = (w_s * budget) div sum(w)`` — and selection is the
    md5-rank order of :func:`sample_per_stratum`, so the SAME rows
    are chosen on every engine and every rerun. A stratum with fewer
    than ``t_s`` rows contributes everything it has (the mix
    under-weights it rather than failing; check shortfalls by
    comparing output counts to targets).

    One shuffle on the stratum key; for a hot stratum at 100 TB
    pre-filter with ``sample_bucket`` to ~10·t_s/|stratum| first so
    the window input stays bounded — selection is unchanged because
    bucket filtering and md5 rank are independent.

    Strata not in ``weights`` are dropped (weight 0).
    """
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    targets = {s: (w * budget_rows) // total_w for s, w in weights.items()}
    quota = F.lit(0)
    for stratum, t in sorted(targets.items()):
        quota = F.when(F.col(strata_col) == stratum, t).otherwise(quota)
    rk = F.row_number().over(
        Window.partitionBy(strata_col).orderBy(
            F.md5(F.col(id_col).cast("string")), F.col(id_col)
        )
    )
    return (
        df.where(F.col(strata_col).isin(list(targets)))
        .withColumn("__rk", rk)
        .where(F.col("__rk") <= quota)
        .drop("__rk")
    )


def sample_per_stratum(
    df: DataFrame,
    n: int,
    id_col: str = "doc_id",
    strata_col: str = "lang",
) -> DataFrame:
    """Exactly-N-per-stratum deterministic sample: rank by
    ``md5(id)`` (a seedless portable shuffle order) within each
    stratum, keep the first N. One shuffle on the stratum key; skewed
    strata stay bounded because ranking short-circuits at N per
    partition group (TakeOrdered-style). For very hot strata at 100 TB
    pre-filter with ``sample_bucket`` to ~10·N/|stratum| first so the
    window input is small."""
    rk = F.row_number().over(
        Window.partitionBy(strata_col).orderBy(
            F.md5(F.col(id_col).cast("string")), F.col(id_col)
        )
    )
    return df.withColumn("__rk", rk).where(F.col("__rk") <= n).drop("__rk")


# --------------------------------------------------------------------------
# GPT-style sequence packing (concat-and-chunk)
# --------------------------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    strata_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document to a fixed-token-budget training sequence:
    concatenate the stratum's token stream in ``id_col`` order and cut
    every ``budget`` tokens; a doc belongs to the sequence where it
    starts (GPT-style packing with document spanning). Emits per-doc
    ``(id, stratum, n_tokens, seq_id)``.

    Scale shape: the per-stratum prefix sum is computed in TWO phases
    so no single task ever holds a whole stratum — (1) range-partition
    by (stratum, id) and subtotal each partition, (2) broadcast the
    tiny subtotal table back as per-partition offsets, then cumsum
    WITHIN each partition only. A plain
    ``Window.partitionBy(stratum)`` would serialize 100 TB/stratum
    through one task; this stays balanced no matter how skewed the
    strata are."""
    toks = df.select(
        F.col(id_col), F.col(strata_col), token_count(text_col).alias("n_tokens")
    )
    parts = toks.repartitionByRange(F.col(strata_col), F.col(id_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    parts = parts.transform(pin)  # pin partition ids for reuse
    subtotals = (
        parts.groupBy(strata_col, "__pid")
        .agg(F.sum("n_tokens").alias("__sub"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__sub").over(
                    Window.partitionBy(strata_col)
                    .orderBy("__pid")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .drop("__sub")
    )
    local_cum = F.sum("n_tokens").over(
        Window.partitionBy(strata_col, "__pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        parts.join(F.broadcast(subtotals), [strata_col, "__pid"])
        .withColumn("__start", F.col("__offset") + F.coalesce(local_cum, F.lit(0)))
        .select(
            id_col,
            strata_col,
            "n_tokens",
            F.floor(F.col("__start") / budget).alias("seq_id"),
        )
    )


def hash_split(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment — the split EVERY
    training pipeline needs to be reproducible, leak-free, and stable
    under corpus growth (a document keeps its split forever; new
    documents land proportionally).

    Mechanism: md5 of (salt ‖ id) is uniform over the 16^32 hex space,
    so comparing its first-4-hex-chars PREFIX against precomputed
    thresholds partitions rows at 1/65536 granularity. The comparison
    is plain lexicographic order on lowercase hex — bit-portable
    across engines (Spark and DuckDB produce identical md5 hex), and a
    pure row-local projection: zero shuffle, fully scan-pushed, the
    100 TB shape. Changing ``salt`` re-deals the whole split.

    ``fractions`` maps split name → fraction (must sum to ≤ 1; any
    remainder falls into the LAST split listed). Returns ``df`` plus a
    ``split`` column.
    """
    if not fractions or any(v < 0 for v in fractions.values()):
        raise ValueError("fractions must be non-negative and non-empty")
    if sum(fractions.values()) > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {sum(fractions.values())} > 1")
    hx = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    prefix = F.substring(hx, 1, 4)
    names = list(fractions)
    # CASE with ascending thresholds: the first matching WHEN wins,
    # so each split owns exactly its [prev_bound, bound) hex band
    expr = None
    for nm, b in hash_split_thresholds(fractions):
        cond = prefix < F.lit(b)
        expr = F.when(cond, F.lit(nm)) if expr is None else expr.when(cond, F.lit(nm))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)


def hash_split_thresholds(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """The (name, 4-hex upper bound) thresholds ``hash_split`` uses —
    exposed so oracles can restate the identical CASE expression."""
    names = list(fractions)
    out, cum = [], 0.0
    for nm in names[:-1]:
        cum += fractions[nm]
        out.append((nm, format(min(65535, int(cum * 65536)), "04x")))
    return out


def chunk_words(
    df: DataFrame,
    max_words: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document's word sequence into OVERLAPPING fixed-size
    chunks — the context-window preparation step of every embedding /
    retrieval / long-doc training pipeline: chunk ``i`` covers words
    ``[i·stride, i·stride + max_words)`` with ``stride = max_words −
    overlap``, so consecutive chunks share ``overlap`` words and the
    final (possibly short) chunk always covers the document tail.
    Emits ``(id, chunk_id, chunk_text, n_words)``.

    All built-ins (split → sequence → explode → slice → array_join),
    so chunking runs inside whole-stage codegen with no Python in the
    hot path, parallelism is row-wise, and nothing shuffles — the
    100 TB shape is "one map stage". Chunk count uses pure integer
    arithmetic (``1 + ⌈max(0, n−max_words)/stride⌉``), making the
    layout bit-reproducible across engines (the carrier's DuckDB twin
    replays it exactly)."""
    if not 0 <= overlap < max_words:
        raise ValueError(f"need 0 <= overlap < max_words, got {overlap}/{max_words}")
    stride = max_words - overlap
    base = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__ws")
    ).withColumn(
        "__nc",
        (
            F.lit(1)
            + F.floor(
                (F.greatest(F.size("__ws") - max_words, F.lit(0)) + (stride - 1))
                / stride
            )
        ).cast("int"),
    )
    chunk = F.slice(F.col("__ws"), F.col("chunk_id") * stride + 1, max_words)
    return (
        base.withColumn(
            "chunk_id", F.explode(F.sequence(F.lit(0), F.col("__nc") - 1))
        )
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.array_join(chunk, " ").alias("chunk_text"),
            F.size(chunk).cast("int").alias("n_words"),
        )
    )


def dup_ngram_fraction(
    df: DataFrame,
    n: int = 4,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide duplicated-n-gram profile per document — the
    RefinedWeb/MassiveText boilerplate filter that catches what
    WITHIN-doc repetition metrics (`repetition_metrics`) cannot: a
    doc whose n-grams are each used once locally but shared with many
    OTHER documents (mirrors, templates, licence blurbs). For every
    n-gram POSITION (not distinct shingles — a doc that repeats a
    shared phrase is more duplicated, not less) the n-gram's document
    frequency decides whether the position counts as duplicated
    (``df >= min_df``); emits ``(id, n_grams, dup_grams,
    dup_fraction)`` for docs with ≥ n words.

    Scale shape: one shuffle to count each gram's distinct-doc
    frequency (partial aggregation collapses repeats map-side), one
    shuffle to join frequencies back and re-group per doc — both keyed
    on values with corpus-bounded cardinality. ``dup_fraction`` is a
    single int/int IEEE division, so it hash-matches any engine
    computing the same two integers."""
    toks = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__toks")
    ).where(F.size("__toks") >= n)
    gram = F.explode(
        F.expr(
            f"transform(sequence(0, size(__toks) - {n}), "
            f"i -> concat_ws(' ', slice(__toks, i + 1, {n})))"
        )
    )
    grams = toks.select(F.col(id_col), gram.alias("gram"))
    dfreq = grams.groupBy("gram").agg(
        F.countDistinct(F.col(id_col)).alias("__df")
    )
    per_doc = (
        grams.join(dfreq, "gram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("__df") >= min_df, F.lit(1)).otherwise(F.lit(0))
            ).alias("dup_grams"),
        )
    )
    return per_doc.withColumn(
        "dup_fraction",
        F.col("dup_grams").cast("double") / F.col("n_grams").cast("double"),
    )
