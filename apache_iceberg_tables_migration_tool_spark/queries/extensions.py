"""Scale-path extension queries: sketches, range join, skew-safe
aggregation, document-frequency n-grams, and the IVF ANN index.

These go beyond the reference's own surface (SURVEY §2.8 X-ops and
§7 step 6 hardening): each one demonstrates a pattern that matters at
100 TB — sketch-based distinct counting, non-equi broadcast joins,
salting hot keys, and sub-linear candidate generation for ANN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_iceberg_tables_migration_tool_spark.operators import similarity as S
from apache_iceberg_tables_migration_tool_spark.operators import skew as K
from apache_iceberg_tables_migration_tool_spark.functions.portable import dsum
from apache_iceberg_tables_migration_tool_spark.operators.text import word_shingles
from apache_iceberg_tables_migration_tool_spark.queries.registry import query
from apache_iceberg_tables_migration_tool_spark.sources.fixtures import load


@query(
    "approx_distinct_users",
    tags=("sketch", "agg"),
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n_exact, TRUE AS approx_within_5pct
FROM events GROUP BY event_type
""",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-user sketch per event type next to the
    exact count. The oracle pins the exact column AND asserts the
    sketch lands within 5% — if `approx_count_distinct` drifts past
    tolerance the boolean flips and the hash check fails. At 100 TB
    the sketch is the only affordable option (no distinct shuffle,
    mergeable partials); this query keeps it honest against truth.
    """
    ev = load(spark, sf_dir, "events")
    exact = F.count_distinct(F.col("user_id")).alias("n_exact")
    approx = F.approx_count_distinct("user_id", rsd=0.02)
    return ev.groupBy("event_type").agg(
        exact,
        (
            F.abs(approx - F.count_distinct(F.col("user_id")))
            <= 0.05 * F.count_distinct(F.col("user_id"))
        ).alias("approx_within_5pct"),
    )


@query(
    "range_join_value_buckets",
    tags=("join", "range"),
    oracle="""
WITH tiers(tier, lo, hi) AS (VALUES ('low', 0.0, 25.0), ('mid', 25.0, 100.0),
                                    ('high', 100.0, 500.0), ('top', 500.0, 1e9))
SELECT tier, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
FROM events JOIN tiers ON value >= lo AND value < hi
GROUP BY tier
""",
)
def range_join_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded (range) join: bucket every event's value into tier
    intervals via a broadcast non-equi join — the small side is
    replicated to every executor, so no shuffle of the fact table and
    no cross-join blowup."""
    ev = load(spark, sf_dir, "events")
    tiers = spark.createDataFrame(
        [("low", 0.0, 25.0), ("mid", 25.0, 100.0), ("high", 100.0, 500.0), ("top", 500.0, 1e9)],
        schema="tier string, lo double, hi double",
    )
    return (
        ev.join(F.broadcast(tiers), (ev.value >= tiers.lo) & (ev.value < tiers.hi))
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
    )


@query(
    "skew_salted_agg",
    tags=("skew", "agg"),
    oracle="""
SELECT event_type, COUNT(*) AS n_events,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM events GROUP BY event_type
""",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators/skew.py): hot grouping
    keys spread over 32 salt buckets before the final merge. Results
    are row-identical to the direct groupBy — which is exactly what
    the oracle checks."""
    ev = load(spark, sf_dir, "events")
    return K.salted_agg(
        ev,
        keys=["event_type"],
        aggs={
            "n_events": ("1", "count"),
            "min_value": ("value", "min"),
            "max_value": ("value", "max"),
        },
        salt_cols=["event_id"],
        salt_buckets=32,
    )


@query(
    "top_bigrams_per_lang",
    tags=("text", "topk"),
    oracle="""
WITH sh AS (
  SELECT DISTINCT doc_id, lang, w[i] || ' ' || w[i+1] AS bigram
  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
       LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) t),
c AS (SELECT lang, bigram, COUNT(*) AS doc_freq FROM sh GROUP BY 1, 2)
SELECT lang, bigram, doc_freq, rk FROM (
  SELECT lang, bigram, doc_freq,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_freq DESC, bigram) AS rk
  FROM c)
WHERE rk <= 3
""",
)
def top_bigrams_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 word bigrams per language by document frequency:
    codegen'd shingling → (lang, bigram) partial-agg count → window
    top-k. Deterministic tie-break (count desc, bigram asc)."""
    docs = load(spark, sf_dir, "documents")
    sh = word_shingles(docs, "doc_id", "text", n=2)
    freq = (
        sh.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "shingle")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("doc_freq"), F.asc("shingle"))
    return (
        freq.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("lang", F.col("shingle").alias("bigram"), "doc_freq", "rk")
    )


@query(
    "knn_ivf",
    tags=("vector", "approx"),
    oracle="""
SELECT vec_id AS qid, CAST(5 AS BIGINT) AS n_results, TRUE AS recall_ok
FROM embeddings WHERE vec_id < 10
""",
)
def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 neighbors through an IVF index (spherical
    k-means coarse quantizer, nprobe-cell candidate join, exact
    re-rank), self-validated against the exact twin IN the query (the
    reference's stage-6 verify pattern applied to our own
    approximation): per query vector it emits how many results came
    back and whether ≥ 4 of the true top-5 were found; the oracle pins
    (5 results, recall_ok TRUE) per qid. The IVF result list itself is
    quantizer-dependent (seeded k-means centroids — not portable SQL),
    but these derived facts are engine-independent, so a recall
    regression flips booleans and goes red on the scoreboard.

    The 0.8-per-query bar (verified deterministically at sf0.001 and
    sf0.01: worst query finds 4/5) reflects the fixture's
    near-isotropic vectors — the coarse quantizer genuinely prunes
    (nprobe=12 of nlist=16), so occasionally the true 5th neighbor
    sits in an unprobed cell; on clustered real-world corpora the
    usual nprobe ≈ nlist/8 gives higher recall at far lower cost."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(F.col("vec_id").alias("qid"), "embedding")
    approx = S.knn_ivf(emb, queries, k=5, nlist=16, nprobe=12).select("qid", "vec_id")
    exact = S.cosine_topk(emb, queries, k=5).select(
        "qid", "vec_id", F.lit(True).alias("__true_top5")
    )
    joined = approx.join(exact, ["qid", "vec_id"], "left")
    return joined.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_results"),
        (F.count(F.col("__true_top5")) >= 4).alias("recall_ok"),
    )


@query(
    "knn_ivf_persisted",
    tags=("vector", "approx", "metadata"),
    oracle="""
SELECT vec_id AS qid, CAST(5 AS BIGINT) AS n_results, TRUE AS recall_ok,
       TRUE AS persisted_matches_direct
FROM embeddings WHERE vec_id < 10
""",
)
def knn_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF index PERSISTED and searched from the catalog — the
    vector twin of the corpus-build band index: ``ivf_index`` writes
    its (cells, centroids) tables into a `SnapCatalog` (cells
    partitioned by cell so probed-cell joins prune at the scan), a
    fresh search reads them back, and the query validates IN-QUERY
    that (a) recall vs the exact twin holds (≥4 of the true top-5 per
    query, the knn_ivf bar) and (b) the persisted-index search is
    IDENTICAL to the direct in-memory search — the float64→parquet
    round-trip is exact, so any drift flips a hash-checked flag. At
    100 TB this is the shape that amortizes one clustering pass
    across every query batch."""
    import os
    import shutil
    import tempfile

    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    root = tempfile.mkdtemp(prefix="snapcat_ivf_")
    try:
        cells, centroids = S.ivf_index(emb, nlist=16)
        cat = SnapCatalog(os.path.join(root, "wh"))
        cat.write("vec", "ivf_cells", cells, partition_by=["cell"])
        cat.write("vec", "ivf_centroids", centroids)
        cells_p = cat.table("vec", "ivf_cells").read(spark).select("vec_id", "cell")
        cent_p = cat.table("vec", "ivf_centroids").read(spark)

        persisted = S.knn_ivf_search(
            cells_p, cent_p, emb, queries, k=5, nprobe=12
        ).select("qid", "vec_id")
        direct = S.knn_ivf_search(cells, centroids, emb, queries, k=5, nprobe=12).select(
            "qid", "vec_id", F.lit(True).alias("__direct")
        )
        exact = S.cosine_topk(emb, queries, k=5).select(
            "qid", "vec_id", F.lit(True).alias("__true_top5")
        )
        joined = persisted.join(exact, ["qid", "vec_id"], "left").join(
            direct, ["qid", "vec_id"], "left"
        )
        out = joined.groupBy("qid").agg(
            F.count(F.lit(1)).alias("n_results"),
            (F.count(F.col("__true_top5")) >= 4).alias("recall_ok"),
            (F.count(F.col("__direct")) == F.count(F.lit(1))).alias(
                "persisted_matches_direct"
            ),
        )
        return spark.createDataFrame(out.collect(), out.schema)  # materialize pre-cleanup
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "stateful_user_totals",
    tags=("streaming", "stateful"),
    oracle="""
SELECT user_id, COUNT(*) AS n_events,
       SUM(CAST(FLOOR(value * 1e6) AS BIGINT)) / 1e6 AS total_value,
       MAX(ts) AS last_seen
FROM events GROUP BY user_id
""",
)
def stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running count / exact micro-unit value total / last-seen,
    drained over the event stream with an availableNow trigger. The
    final state equals the batch aggregate — which is exactly what
    the oracle checks (exact integer micro-units make the total
    independent of micro-batch split)."""
    from apache_iceberg_tables_migration_tool_spark.streaming.pipelines import (
        read_events_stream,
    )
    from apache_iceberg_tables_migration_tool_spark.streaming.stateful import (
        run_update_to_completion,
        user_stats_stateful,
    )

    stream = user_stats_stateful(read_events_stream(spark, sf_dir))
    return run_update_to_completion(stream, "q_stateful_user_totals")


@query(
    "streaming_dedup_counts",
    tags=("streaming", "dedup", "stateful"),
    oracle="""
SELECT event_type, COUNT(*) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       SUM(CAST(FLOOR(value * 1e6) AS BIGINT)) / 1e6 AS total_value
FROM events GROUP BY event_type
""",
)
def streaming_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup under an at-least-once source: every
    event is delivered TWICE (each row duplicated before the dedup —
    the Kafka-redelivery simulation), streamed through
    ``dropDuplicatesWithinWatermark`` keyed on event_id (state bounded
    by the 1 h watermark), and drained with availableNow. The deduped
    sink must equal the original stream exactly — per-type counts,
    distinct users, and exact micro-unit value totals all match the
    batch aggregate over the UN-duplicated events table, which is
    precisely what the oracle computes."""
    from apache_iceberg_tables_migration_tool_spark.streaming.pipelines import (
        read_events_stream,
        run_append_to_completion,
    )
    from apache_iceberg_tables_migration_tool_spark.streaming.stateful import (
        dedup_events_stream,
    )

    stream = read_events_stream(spark, sf_dir)
    doubled = stream.withColumn(
        "__copy", F.explode(F.array(F.lit(0), F.lit(1)))
    ).drop("__copy")
    deduped = run_append_to_completion(
        dedup_events_stream(doubled), "q_streaming_dedup"
    )
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        (
            F.sum(F.floor(F.col("value") * 1e6).cast("long")) / F.lit(1e6)
        ).alias("total_value"),
    )


@query(
    "token_count_bpe",
    tags=("text",),
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(regexp_extract_all(text,
           '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+'))
           AS n_bpe_tokens
FROM documents
""",
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-ish subword token counts per document — the
    unit a training-data budget is measured in. The segmentation
    regex is lookahead-free so the Java (Spark) and RE2 (DuckDB)
    engines produce identical splits, which the oracle verifies
    count-for-count."""
    from apache_iceberg_tables_migration_tool_spark.operators.text import (
        token_count,
        token_count_bpe as bpe,
    )

    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_ws_tokens"),
        bpe("text").alias("n_bpe_tokens"),
    )


@query(
    "multimodal_feature_knn",
    tags=("multimodal", "vector"),
    oracle="""
WITH h AS (
  SELECT doc_id,
         list_transform(range(0, 16), b ->
           CAST(len(list_filter(range(1, length(text) + 1),
                                i -> ascii(substring(text, i, 1)) % 16 = b)) AS DOUBLE)) AS hist
  FROM documents)
SELECT qid, vec_id, rk FROM (
  SELECT q.doc_id AS qid, e.doc_id AS vec_id,
         ROW_NUMBER() OVER (PARTITION BY q.doc_id
                            ORDER BY list_cosine_similarity(q.hist, e.hist) DESC,
                                     e.doc_id) AS rk
  FROM h q JOIN h e ON e.doc_id <> q.doc_id
  WHERE q.doc_id < 5
) WHERE rk <= 3
""",
)
def multimodal_feature_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal pipeline composition: binary payload attach →
    Arrow-batched feature extraction (byte-histogram stand-in with a
    real extractor's UDF shape) → exact top-3 cosine search over the
    extracted features.

    Oracle-checkable end to end: the fake featurizer is a 16-bin
    byte-value histogram, the fixture text is pure ASCII (verified at
    sf0.001/sf0.01: octet_length == char length for every doc), and
    cosine is scale-invariant — so DuckDB reproduces the ranking from
    raw per-character code-point histograms without the L1
    normalization or the float32 cast. Rank margins at the k=3
    boundary are ≥ 3.8e-5 on the fixtures, two orders above float32
    quantization noise, so ranks hash-match deterministically."""
    from apache_iceberg_tables_migration_tool_spark.operators.multimodal import (
        attach_payload,
        extract_features,
    )

    docs = load(spark, sf_dir, "documents")
    feats = extract_features(attach_payload(docs))
    corpus = feats.select(F.col("doc_id").alias("vec_id"), F.col("features").alias("embedding"))
    queries = corpus.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    return S.cosine_topk(corpus, queries, k=3).select("qid", "vec_id", "rk")


@query(
    "portable_corr_stats",
    tags=("agg", "stats"),
    oracle="""
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n,
       CAST(FLOOR((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) * 1e9) AS BIGINT) / 1e9 AS corr_qty_price
FROM m
""",
)
def portable_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from exact decimal moment sums. Built-in
    corr()/stddev() accumulate doubles, so partial-aggregation order
    changes the last ULPs — not reproducible across engines. Exact
    integer-cent moments cast to double once, then one algebraic
    formula, is bit-deterministic and embarrassingly parallel (five
    decimal SUMs in a single map-side-combined pass)."""
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(18,2)")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(q * p).cast("double").alias("sxy"),
        F.sum(q * q).cast("double").alias("sxx"),
        F.sum(p * p).cast("double").alias("syy"),
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    # moments larger than 2^53 pick up engine-specific decimal->double
    # rounding in the last ULPs; flooring the result to a 1e-9 grid makes
    # the comparison exact (diff is ~1e-18, nine orders below the grid)
    corr9 = F.floor(corr * F.lit(1e9)).cast("long") / F.lit(1e9)
    return m.select("l_returnflag", "n", corr9.alias("corr_qty_price"))


@query(
    "user_event_type_sets",
    tags=("agg", "collect"),
    oracle="""
SELECT user_id,
       string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS event_types,
       COUNT(DISTINCT event_type) AS n_types
FROM events GROUP BY user_id
""",
)
def user_event_type_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set aggregation rendered deterministically: collect_set is
    unordered by contract, so the output is sorted before joining —
    the canonical way to make set-valued results comparable."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias("event_types"),
        F.count_distinct(F.col("event_type")).alias("n_types"),
    )


@query(
    "orders_by_weekday",
    tags=("agg", "datetime"),
    oracle="""
SELECT dayofweek(o_orderdate) AS dow, COUNT(*) AS n_orders,
       CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(28,2))) * 100) AS BIGINT) / 100.0 AS total_price
FROM orders GROUP BY 1
""",
)
def orders_by_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-dimension aggregation. Weekday numbering differs by
    engine (Spark: 1=Sunday…7; DuckDB: 0=Sunday…6) — normalized here
    rather than papered over with locale-dependent day names."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy((F.dayofweek("o_orderdate") - 1).alias("dow")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", scale=2).alias("total_price"),
    )


@query(
    "clean_text_stats",
    tags=("text", "regex"),
    oracle="""
SELECT doc_id,
       length(regexp_replace(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
              ' +', ' ', 'g')) AS n_clean_chars,
       len(string_split(regexp_replace(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
              ' +', ' ', 'g'), ' ')) AS n_clean_tokens
FROM documents
""",
)
def clean_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-cleaning pipeline (lowercase → strip non-alphanumerics →
    collapse whitespace) as pure JVM expressions; the char/token
    counts of the cleaned form are the oracle-checkable surface.
    Character classes only — identical semantics in Java and RE2."""
    docs = load(spark, sf_dir, "documents")
    cleaned = F.regexp_replace(
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")), " +", " "
    )
    return docs.select(
        "doc_id",
        F.length(cleaned).alias("n_clean_chars"),
        F.size(F.split(cleaned, " ")).alias("n_clean_tokens"),
    )


@query(
    "rolling_30d_customer_spend",
    tags=("window", "range-frame"),
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(28,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate
            RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) * 100) AS BIGINT) / 100.0
         AS spend_30d
FROM orders
""",
)
def rolling_30d_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: per-customer trailing-30-day
    spend. The frame is expressed on days-since-epoch with
    rangeBetween(-30, 0) — equivalent to the SQL INTERVAL frame,
    including peer rows on equal dates. Exact decimal sum + floored
    cents keeps every frame's total bit-identical to the oracle."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.datediff("o_orderdate", F.lit("1970-01-01").cast("date")))
        .rangeBetween(-30, 0)
    )
    spend = F.floor(F.sum(F.col("o_totalprice").cast("decimal(28,2)")).over(w) * 100).cast(
        "long"
    ) / F.lit(100.0)
    return o.select("o_custkey", "o_orderkey", spend.alias("spend_30d"))


@query(
    "funnel_conversion",
    tags=("events", "agg", "funnel"),
    oracle="""
SELECT user_id,
       first_click_us,
       COALESCE(last_purchase_us > first_click_us, FALSE) AS converted
FROM (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'click'
                  THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS first_click_us,
         MAX(CASE WHEN event_type = 'purchase'
                  THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS last_purchase_us
  FROM events GROUP BY user_id
)
WHERE first_click_us IS NOT NULL
""",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase funnel in ONE aggregation pass: a user converted
    iff any purchase follows their first click, which is exactly
    ``max(purchase_ts) > min(click_ts)`` — no self-join, no second
    scan, one shuffle on user_id with map-side partials. Timestamps
    compare as epoch microseconds (the fixtures' native precision on
    the Spark side), so both engines decide ties identically."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    agg = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", us)).alias("first_click_us"),
        F.max(F.when(F.col("event_type") == "purchase", us)).alias("last_purchase_us"),
    )
    return agg.where(F.col("first_click_us").isNotNull()).select(
        "user_id",
        "first_click_us",
        F.coalesce(
            F.col("last_purchase_us") > F.col("first_click_us"), F.lit(False)
        ).alias("converted"),
    )


@query(
    "weekly_cohort_retention",
    tags=("events", "agg", "cohort"),
    oracle="""
WITH firsts AS (
  SELECT user_id,
         CAST(FLOOR(MIN(epoch_us(CAST(ts AS TIMESTAMP))) / 604800000000) AS BIGINT)
           AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch_us(CAST(ts AS TIMESTAMP)) / 604800000000) AS BIGINT)
           AS active_week
  FROM events
)
SELECT f.cohort_week,
       a.active_week - f.cohort_week AS week_offset,
       COUNT(*) AS n_users
FROM firsts f JOIN activity a ON f.user_id = a.user_id
GROUP BY 1, 2
""",
)
def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-seen week,
    counted in each later week they were active. Two aggregations and
    one join, ALL keyed on user_id — at scale the cohort assignment
    and the distinct-activity dedup reuse the same hash partitioning,
    and the final (cohort, offset) rollup is tiny. Weeks are epoch-µs
    ÷ 7-day buckets (no calendar/timezone dependence cross-engine)."""
    ev = load(spark, sf_dir, "events")
    week = F.floor(F.unix_micros("ts") / F.lit(604_800_000_000)).cast("bigint")
    firsts = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    activity = ev.select("user_id", week.alias("active_week")).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("active_week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "approx_percentile_quality",
    tags=("sketch", "agg"),
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS p50_exact,
       quantile_cont(l_quantity, 0.9) AS p90_exact,
       TRUE AS sketch_within_2pct
FROM lineitem GROUP BY l_returnflag
""",
)
def approx_percentile_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile sketch vs exact (the approx_distinct_users pattern):
    exact interpolated percentiles are emitted for the value check —
    both engines use the same linear-interpolation definition, so the
    doubles hash-match — while the GK-sketch `percentile_approx`
    (mergeable, bounded memory: the 100 TB path where exact percentile
    means a full sort) is asserted within 2% THROUGH the oracle gate
    via the boolean."""
    li = load(spark, sf_dir, "lineitem")
    exact5 = F.expr("percentile(l_quantity, 0.5)")
    exact9 = F.expr("percentile(l_quantity, 0.9)")
    approx9 = F.expr("percentile_approx(l_quantity, 0.9, 1000)")
    return li.groupBy("l_returnflag").agg(
        exact5.alias("p50_exact"),
        exact9.alias("p90_exact"),
        (F.abs(approx9 - exact9) <= 0.02 * exact9).alias("sketch_within_2pct"),
    )


from apache_iceberg_tables_migration_tool_spark.operators import zorder as Z  # noqa: E402

_Z_COLS = ["za", "zb"]
_Z_BOUNDS = [(0, 4095), (0, 4095)]


@query(
    "zorder_values",
    tags=("scale", "layout"),
    oracle=f"""
WITH d AS (
  SELECT o_orderkey % 4096 AS za, o_custkey % 4096 AS zb FROM orders),
z AS (SELECT {Z.zvalue_sql_duckdb(_Z_COLS, _Z_BOUNDS)} AS zv FROM d)
SELECT CAST(zv >> 26 AS BIGINT) AS zbucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(zv) AS BIGINT) AS zmin,
       CAST(MAX(zv) AS BIGINT) AS zmax
FROM z GROUP BY 1 ORDER BY 1
""",
)
def zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-value computation (operators/zorder.py — the key
    behind zorder_by compaction): interleave two 4096-domain dims of
    orders into one int64, bucket by the top 6 bits. Pure shift/mask
    integer codegen generated from the SAME builder as the DuckDB
    oracle, so every z-value matches bit-for-bit — proof the
    clustering key an engine would persist is portable."""
    o = load(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 4096).alias("za"),
        (F.col("o_custkey") % 4096).alias("zb"),
    )
    zv = F.expr(Z.zvalue_sql_spark(_Z_COLS, _Z_BOUNDS))
    return (
        o.select(zv.alias("zv"))
        .groupBy(F.shiftright("zv", 26).cast("long").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("zv").cast("long").alias("zmin"),
            F.max("zv").cast("long").alias("zmax"),
        )
        .orderBy("zbucket")
    )


@query(
    "stream_stream_join_events",
    tags=("streaming", "windows"),
    oracle="""
WITH c AS (
  SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'),
p AS (
  SELECT user_id, ts AS purchase_ts, value FROM events
  WHERE event_type = 'purchase'),
j AS (
  SELECT c.user_id, c.click_ts, p.purchase_ts, p.value
  FROM c JOIN p ON c.user_id = p.user_id
   AND p.purchase_ts >= c.click_ts
   AND p.purchase_ts <= c.click_ts + INTERVAL 1800 SECONDS)
SELECT COUNT(*) AS pairs,
       COUNT(DISTINCT user_id) AS users,
       CAST(SUM(CAST(FLOOR(value * 1e6) AS BIGINT)) AS BIGINT) AS value_micros
FROM j
""",
)
def stream_stream_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM interval join (X6/streaming tier — the watermark-
    bounded buffered join, Spark's canonical bounded-state form of
    joining two unbounded streams; the reference has no streaming at
    all): purchases within 30 min after a click by the same user,
    drained with availableNow and aggregated. The oracle replays the
    identical interval join in batch SQL — any row the streaming
    buffer dropped or duplicated shifts the counts/micro-unit total."""
    from apache_iceberg_tables_migration_tool_spark.streaming.pipelines import (
        click_purchase_stream_join,
        read_events_stream,
        run_append_to_completion,
    )

    stream = read_events_stream(spark, sf_dir)
    joined = run_append_to_completion(
        click_purchase_stream_join(
            stream.where(F.col("event_type") == "click"),
            stream.where(F.col("event_type") == "purchase"),
            max_gap_sec=1800,
        ),
        "q_stream_stream_join",
    )
    out = joined.agg(
        F.count("*").alias("pairs"),
        F.countDistinct("user_id").alias("users"),
        F.sum(F.floor(F.col("purchase_value") * 1e6).cast("long")).alias("value_micros"),
    )
    return spark.createDataFrame(out.collect(), out.schema)


@query(
    "knn_pq_adc",
    tags=("vector", "approx"),
    oracle="""
SELECT vec_id AS qid, CAST(5 AS BIGINT) AS n_results, TRUE AS recall_ok
FROM embeddings WHERE vec_id < 10
""",
)
def knn_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. IVFPQ's fine quantizer):
    every corpus vector compresses to 16 sub-codes (~8 bytes vs 256 —
    the memory-bound regime where 100 TB of embeddings scan as ~3 TB
    of codes), queries score the codes with per-query dot-product
    lookup tables (asymmetric distance), and only a 200-candidate
    sliver is exactly re-ranked. Self-validated like ``knn_ivf``: the
    oracle pins (5 results, ≥4-of-true-top-5) per query — a recall
    regression flips hash-checked booleans. Completes the ANN family:
    exact / LSH / IVF / SQ8 / PQ."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(F.col("vec_id").alias("qid"), "embedding")
    approx = S.knn_pq(emb, queries, k=5, m=16, ksub=32, rerank=200).select("qid", "vec_id")
    exact = S.cosine_topk(emb, queries, k=5).select(
        "qid", "vec_id", F.lit(True).alias("__true_top5")
    )
    joined = approx.join(exact, ["qid", "vec_id"], "left")
    return joined.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_results"),
        (F.count(F.col("__true_top5")) >= 4).alias("recall_ok"),
    )
