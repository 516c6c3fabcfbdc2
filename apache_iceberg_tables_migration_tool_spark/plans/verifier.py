"""Post-migration verification: schema diff + counts + checksums.

Reference stages 4+6 rebuilt:

- schema comparison is a relational anti-join on (column, type) pairs
  in both directions (J1) — and unlike the reference
  (``4_verify_table_creation.py:86-97``) it compares *types*, not
  just names, and partition specs;
- record counts come from snapshot manifests (metadata-only);
- the data checksum is the hardened xxhash64 SUM(decimal)+BIT_XOR
  combine (G5 fix) from operators.integrity.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from apache_iceberg_tables_migration_tool_spark.operators.integrity import table_checksum
from apache_iceberg_tables_migration_tool_spark.plans.plan import MigrationPlan
from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

VERIFY_SCHEMA = T.StructType(
    [
        T.StructField("database", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("schema_match", T.BooleanType()),
        T.StructField("partition_match", T.BooleanType()),
        T.StructField("properties_match", T.BooleanType()),
        T.StructField("count_match", T.BooleanType()),
        T.StructField("checksum_match", T.BooleanType()),
        T.StructField("src_records", T.LongType()),
        T.StructField("dst_records", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("error", T.StringType()),
    ]
)


def schema_diff(
    spark: SparkSession, a: T.StructType, b: T.StructType
) -> DataFrame:
    """Columns present on one side only (name+type anti-join, both
    directions) — empty ⇔ schemas equivalent."""
    fa = [(f.name, f.dataType.simpleString()) for f in a.fields]
    fb = [(f.name, f.dataType.simpleString()) for f in b.fields]
    dfa = spark.createDataFrame(fa, "col_name string, col_type string")
    dfb = spark.createDataFrame(fb, "col_name string, col_type string")
    only_a = dfa.join(dfb, ["col_name", "col_type"], "left_anti").selectExpr(
        "col_name", "col_type", "'source_only' AS side"
    )
    only_b = dfb.join(dfa, ["col_name", "col_type"], "left_anti").selectExpr(
        "col_name", "col_type", "'target_only' AS side"
    )
    return only_a.unionByName(only_b)


def _verify_one(
    spark: SparkSession,
    entry,
    src: SnapCatalog,
    dst: SnapCatalog,
) -> tuple:
    t0 = time.monotonic()
    try:
        s_tbl = src.table(entry.database, entry.table_name)
        d_tbl = dst.table(entry.database, entry.table_name)
        s_snap = s_tbl.resolve_snapshot(snapshot_id=entry.snapshot_id)
        d_snap = d_tbl.resolve_snapshot()

        sch_ok = schema_diff(spark, s_tbl.schema(entry.snapshot_id), d_tbl.schema()).isEmpty()
        part_ok = list(s_snap.partition_spec) == list(d_snap.partition_spec)
        # table properties must round-trip (the reference collects
        # them per table, 2_collect_database_schema_info.py:176-184)
        props_ok = s_tbl.properties() == d_tbl.properties()
        # counts from manifests — metadata-only (the reference ran
        # two full count() scans, 6_verify_data_integrity.py:74-75)
        s_n, d_n = s_snap.total_records, d_snap.total_records
        cnt_ok = s_n == d_n
        chk_ok = (
            table_checksum(s_tbl.read(spark, snapshot_id=entry.snapshot_id))
            == table_checksum(d_tbl.read(spark))
        )
        ok = sch_ok and part_ok and props_ok and cnt_ok and chk_ok
        status = "success" if ok else "mismatch"
        return (
            entry.database, entry.table_name, sch_ok, part_ok, props_ok, cnt_ok,
            chk_ok, s_n, d_n, status, time.monotonic() - t0, None,
        )
    except Exception as e:
        return (
            entry.database, entry.table_name, None, None, None, None, None, None,
            None, "error", time.monotonic() - t0, f"{type(e).__name__}: {e}",
        )


def verify(
    spark: SparkSession,
    plan: MigrationPlan,
    src: SnapCatalog,
    dst: SnapCatalog,
    max_parallel_tables: int = 4,
) -> DataFrame:
    """Verify every planned table; returns the verification report
    DataFrame. sample_match semantics follow the reference
    (counts ∧ checksum, ``6_verify_data_integrity.py:83-87``) plus
    schema/partition equivalence.

    Tables verify concurrently from a thread pool (same shape as
    ``migrate``): each table's verification is a chain of small
    independent read-only jobs (schema anti-join, two checksum scans),
    so overlapping tables lets the next table's jobs back-fill the
    executor slots the current one's tail leaves idle — the
    stragglers-and-idle-capacity pattern. ``pool.map`` preserves plan
    order, so the report rows are unchanged."""
    if not plan.tables:
        return spark.createDataFrame([], VERIFY_SCHEMA)
    with ThreadPoolExecutor(max_workers=max_parallel_tables) as pool:
        rows = list(
            pool.map(lambda e: _verify_one(spark, e, src, dst), plan.tables)
        )
    return spark.createDataFrame(rows, VERIFY_SCHEMA)
