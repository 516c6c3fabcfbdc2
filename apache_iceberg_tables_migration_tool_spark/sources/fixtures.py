"""Fixture-table access (driver testdata parquet).

Mirrors the reference's "source catalog" role (S1/S10 in SURVEY §2):
table enumeration + scans, but over the driver's parquet fixtures.
Reads are plain ``spark.read.parquet`` so Catalyst predicate pushdown
/ column pruning reach the scan untouched.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: full fixture-set (TESTDATA.md); order is FK-dependency order
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


#: Fallback schema for events.parquet written with TIMESTAMP(NANOS),
#: which Spark 4 refuses to read natively; an explicit long schema
#: sidesteps it independent of session config (no reliance on
#: spark.sql.legacy.parquet.nanosAsLong), and ts is rebuilt as a
#: µs-truncated TimestampType column.
_EVENTS_RAW_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, "
    "event_type string, value double, props string"
)

_EVENTS_COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")

#: Explicit schema for µs/ms-precision events footers (streaming reads
#: require a user-supplied schema; batch reads infer the same thing).
_EVENTS_NATIVE_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


#: footer-probe memo: {path: native?} — the fixture files never change
#: within a session, and every events-touching query pays the probe
#: otherwise (one driver-side footer read per load() call)
_EVENTS_NATIVE_CACHE: dict[str, bool] = {}


def events_ts_is_native(spark: SparkSession, path: str) -> bool:
    """True when Spark can decode the events ``ts`` column natively
    (µs/ms parquet footer), False for a nanos footer that needs the
    raw-int64 fallback decode."""
    cached = _EVENTS_NATIVE_CACHE.get(path)
    if cached is not None:
        return cached
    try:
        ts_type = spark.read.parquet(path).schema["ts"].dataType.typeName()
        native = ts_type in ("timestamp", "timestamp_ntz")
    except Exception:  # nanos footer: Spark 4 refuses schema inference
        native = False
    _EVENTS_NATIVE_CACHE[path] = native
    return native


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Precision-aware events scan.

    The driver has shipped this fixture with both TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS) footers across rounds. Inspect what Spark infers
    from the footer and trust it when it is already a timestamp
    (µs/ms footers — Spark decodes these natively); only fall back to
    the raw-int64 ÷1000 decode when the footer is nanos (Spark either
    throws at schema inference or, under the legacy nanosAsLong conf,
    surfaces a LongType column).
    """
    if events_ts_is_native(spark, path):
        # Session tz is UTC (session.py), so the ntz→tz cast is a
        # wall-clock no-op; downstream operators uniformly see
        # TimestampType.
        return (
            spark.read.parquet(path)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .select(*_EVENTS_COLS)
        )
    raw = spark.read.schema(_EVENTS_RAW_SCHEMA).parquet(path)
    return raw.withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000"))
    ).select(*_EVENTS_COLS)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Lazy; no caching — each query's plan
    owns its scan so pushdown/pruning are per-query."""
    if name not in TABLES:
        raise KeyError(f"unknown fixture table: {name!r}")
    path = table_path(sf_dir, name)
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def list_tables(sf_dir: str) -> list[str]:
    """Catalog enumeration (≙ SHOW TABLES, SURVEY §2 S1)."""
    return [t for t in TABLES if os.path.exists(table_path(sf_dir, t))]
