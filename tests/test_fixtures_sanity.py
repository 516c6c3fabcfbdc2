"""Fixture-sanity guards (VERDICT r2 item 2).

Round 2 shipped red because the driver silently regenerated
events.parquet from ns- to µs-precision timestamps and the loader's
hard-coded ns→µs decode compressed 30 days of 2024 into ~43 minutes of
1970. These tests pin the loaded fixtures' observable invariants so the
next silent regeneration fails ONE cheap test instead of five oracle
rows.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from apache_iceberg_tables_migration_tool_spark.sources import fixtures

from .conftest import SF_DIR


def test_events_timestamps_land_in_2024(spark):
    ev = fixtures.load(spark, SF_DIR, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType)
    row = ev.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    assert row["lo"].year == 2024, f"events min(ts)={row['lo']} — loader precision bug?"
    assert row["hi"].year == 2024, f"events max(ts)={row['hi']} — loader precision bug?"
    # the fixture spans ~30 days of January 2024; a precision slip
    # collapses this to minutes, so also pin the spread
    spread = row["hi"] - row["lo"]
    assert spread >= dt.timedelta(days=20), f"events ts spread {spread} too small"
    assert row["n"] >= 1000, f"events row count {row['n']} below sf0.001 scale"


@pytest.mark.parametrize("name", fixtures.TABLES)
def test_all_fixture_tables_load_nonempty(spark, name):
    df = fixtures.load(spark, SF_DIR, name)
    assert len(df.columns) > 0
    assert df.limit(1).count() == 1, f"{name} is empty"


def test_orders_dates_in_tpch_range(spark):
    o = fixtures.load(spark, SF_DIR, "orders")
    row = o.agg(
        F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
    ).collect()[0]
    # the synthetic fixture spans 1995..2001; leave slack but catch an
    # epoch-collapse (1970) or precision-inflation (2200+) regression
    assert 1990 <= row["lo"].year <= 2010
    assert 1990 <= row["hi"].year <= 2010
