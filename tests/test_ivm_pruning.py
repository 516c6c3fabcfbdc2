"""Focused tests for the r14 single-agg key-prune internals of
streaming.pipelines._old_state / _df_key_pruned: the probe+bounds pair
was fused into one stats agg with an approx-count gate; these pin the
three behavior classes (small key set → exact isin prune, large key
set → [min,max] range prune, all-null/empty delta → empty term) the
fused path must preserve."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog
from apache_iceberg_tables_migration_tool_spark.streaming.pipelines import (
    _df_key_pruned,
    _old_state,
)


def test_df_key_pruned_small_delta_isin(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    cl = spark.createDataFrame([(5,), (7,), (900,)], "k long")
    got = sorted(r["k"] for r in _df_key_pruned(df, cl, ["k"]).collect())
    # ≤256 distinct keys → exact isin prune: only the delta keys survive
    assert got == [5, 7, 900]


def test_df_key_pruned_large_delta_range(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    # 500 distinct keys (> the 384 approx gate): range prune [500, 999]
    cl = spark.range(500, 1000).select(F.col("id").alias("k"))
    got = sorted(r["k"] for r in _df_key_pruned(df, cl, ["k"]).collect())
    assert got == list(range(500, 1000))  # superset-by-range == exact here


def test_df_key_pruned_null_only_delta_empty(spark):
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    cl = spark.createDataFrame([(None,), (None,)], "k long")
    # no non-null delta keys → inner join is provably empty
    assert _df_key_pruned(df, cl, ["k"]).count() == 0


@pytest.fixture()
def small_table(spark, tmp_path):
    cat = SnapCatalog(os.path.join(str(tmp_path), "wh"))
    df = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    cat.write("db", "t", df)
    return cat.table("db", "t")


def test_old_state_small_delta_isin(spark, small_table):
    wm = small_table.current_snapshot().snapshot_id
    cl = spark.createDataFrame([(3,), (11,), (999,)], "k long")
    got = sorted(
        r["k"] for r in _old_state(spark, small_table, wm, ["k", "v"], cl, ["k"]).collect()
    )
    assert got == [3, 11, 999]


def test_old_state_large_delta_range(spark, small_table):
    wm = small_table.current_snapshot().snapshot_id
    cl = spark.range(100, 600).select(F.col("id").alias("k"))
    got = sorted(
        r["k"] for r in _old_state(spark, small_table, wm, ["k", "v"], cl, ["k"]).collect()
    )
    assert got == list(range(100, 600))


def test_old_state_null_only_delta_empty(spark, small_table):
    wm = small_table.current_snapshot().snapshot_id
    cl = spark.createDataFrame([(None,)], "k long")
    assert _old_state(spark, small_table, wm, ["k", "v"], cl, ["k"]).count() == 0
