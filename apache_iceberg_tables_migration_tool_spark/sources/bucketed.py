"""Bucketed table layout: co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders)
is shuffling both sides on the join key. Writing both tables
bucketed (hash-partitioned into N files) + sorted by that key moves
the shuffle to write time, once; every subsequent join on the bucket
key reads co-located buckets and skips the Exchange entirely —
Spark's EnsureRequirements sees the scan's output partitioning
already satisfies the join's requirement.

Contract notes (all enforced by Spark, worth knowing at scale):
- both sides must be bucketed by their join column with the SAME
  bucket count (or a divisor, with bucket coalescing enabled);
- the join must be on the full bucket column set;
- ``spark.sql.sources.bucketing.enabled`` (default true) and a
  file-format table in the session catalog (saveAsTable), not a
  bare path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed+sorted parquet table in the
    session catalog. ``path`` makes it external (data under that
    directory)."""
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def physical_plan(df: DataFrame) -> str:
    """Executed-plan string (post EnsureRequirements; for AQE plans
    this is the initial adaptive plan, Exchanges included) — the plan
    in which a co-located join shows no Exchange. ``sparkPlan`` would
    be wrong here: it precedes EnsureRequirements, so it never
    contains Exchange nodes at all."""
    return df._jdf.queryExecution().executedPlan().toString()


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan."""
    return physical_plan(df).count("Exchange hashpartitioning")


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Sort-merge join of two same-bucket-count tables on their
    bucket keys; shuffle-free when the bucketing contract holds
    (assert with :func:`shuffle_count` == 0)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.hint("merge").join(rt, lt[left_key] == rt[right_key])
