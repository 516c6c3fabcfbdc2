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


def test_nanos_footer_routes_to_fallback(spark, tmp_path):
    """A TIMESTAMP(NANOS) footer (which Spark 4 refuses to infer) must
    probe as non-native and decode through the raw-int64 ÷1000 path."""
    pa = pytest.importorskip("pyarrow")
    pq = pytest.importorskip("pyarrow.parquet")
    base = dt.datetime(2024, 1, 15, tzinfo=dt.timezone.utc)
    ns = [int(base.timestamp() * 1e9) + i * 60_000_000_000 for i in range(4)]
    t = pa.table(
        {
            "event_id": pa.array(range(4), type=pa.int64()),
            "ts": pa.array(ns, type=pa.timestamp("ns")),
            "user_id": pa.array([1, 2, 1, 2], type=pa.int64()),
            "event_type": pa.array(["a", "b", "a", "b"]),
            "value": pa.array([1.0, 2.0, 3.0, 4.0]),
            "props": pa.array(["{}"] * 4),
        }
    )
    path = str(tmp_path / "events.parquet")
    pq.write_table(t, path)
    assert fixtures.events_ts_inferred_type(spark, path) is None
    df = fixtures._load_events(spark, path)
    rows = df.select("ts").orderBy("event_id").collect()
    assert rows[0]["ts"].year == 2024
    assert (rows[1]["ts"] - rows[0]["ts"]) == dt.timedelta(minutes=1)


def test_probe_propagates_unrelated_errors(spark, tmp_path):
    """A missing file must RAISE, not silently cache native=False and
    route a future µs fixture through the ÷1000 fallback (ADVICE r3)."""
    with pytest.raises(Exception) as exc:
        fixtures.events_ts_inferred_type(spark, str(tmp_path / "nope.parquet"))
    assert "TIMESTAMP(NANOS" not in str(exc.value)
    # and nothing was cached for the bad path
    assert str(tmp_path / "nope.parquet") not in fixtures._EVENTS_TS_TYPE_CACHE


def test_orders_dates_in_tpch_range(spark):
    o = fixtures.load(spark, SF_DIR, "orders")
    row = o.agg(
        F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
    ).collect()[0]
    # the synthetic fixture spans 1995..2001; leave slack but catch an
    # epoch-collapse (1970) or precision-inflation (2200+) regression
    assert 1990 <= row["lo"].year <= 2010
    assert 1990 <= row["hi"].year <= 2010
