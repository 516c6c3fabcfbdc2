"""Bucketed-layout co-located join: the write-once-shuffle-never
contract, proven on the physical plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_iceberg_tables_migration_tool_spark.sources.bucketed import (
    colocated_join,
    shuffle_count,
    write_bucketed,
)
from apache_iceberg_tables_migration_tool_spark.sources.fixtures import load
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    write_bucketed(
        load(spark, SF_DIR, "orders"), "b_orders", "o_orderkey", 8, str(root / "orders")
    )
    write_bucketed(
        load(spark, SF_DIR, "lineitem"), "b_lineitem", "l_orderkey", 8, str(root / "lineitem")
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ot, lt = bucketed_tables
    joined = colocated_join(spark, ot, lt, "o_orderkey", "l_orderkey")
    assert shuffle_count(joined) == 0, physical_plan_excerpt(joined)
    # same join over the raw parquet shuffles both sides
    orders = load(spark, SF_DIR, "orders")
    li = load(spark, SF_DIR, "lineitem")
    raw = orders.hint("merge").join(li, orders.o_orderkey == li.l_orderkey)
    assert shuffle_count(raw) >= 2


def physical_plan_excerpt(df):
    from apache_iceberg_tables_migration_tool_spark.sources.bucketed import physical_plan

    return physical_plan(df)[:2000]


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    ot, lt = bucketed_tables
    got = (
        colocated_join(spark, ot, lt, "o_orderkey", "l_orderkey")
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    orders = load(spark, SF_DIR, "orders")
    li = load(spark, SF_DIR, "lineitem")
    want = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert {(r["o_orderkey"], r["n"]) for r in got.collect()} == {
        (r["o_orderkey"], r["n"]) for r in want.collect()
    }


def test_bucketed_agg_skips_shuffle(spark, bucketed_tables):
    # groupBy on the bucket key is also exchange-free
    _, lt = bucketed_tables
    agg = spark.table(lt).groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    assert shuffle_count(agg) == 0
