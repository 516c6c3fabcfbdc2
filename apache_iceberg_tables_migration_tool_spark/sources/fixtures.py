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
from pyspark.errors import AnalysisException

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

#: NTZ twin of the native schema: when the footer is µs with
#: isAdjustedToUTC=false Spark infers TIMESTAMP_NTZ, and a streaming
#: read should declare exactly that and cast afterwards — mirroring
#: the batch loader's infer-then-cast — rather than force an LTZ
#: schema over NTZ data (works under a UTC session, drifts otherwise).
_EVENTS_NTZ_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, "
    "event_type string, value double, props string"
)


#: footer-probe memo: {path: inferred ts typeName or None for nanos}
#: — the fixture files never change within a session, and every
#: events-touching query pays the probe otherwise (one driver-side
#: footer read per load() call)
_EVENTS_TS_TYPE_CACHE: dict[str, str | None] = {}


def events_ts_inferred_type(spark: SparkSession, path: str) -> str | None:
    """The ``ts`` type Spark infers from the events parquet footer:
    ``"timestamp"`` (µs/ms, isAdjustedToUTC=true), ``"timestamp_ntz"``
    (µs/ms, isAdjustedToUTC=false), or ``None`` for a nanos footer
    Spark 4 refuses to infer (→ raw-int64 fallback decode)."""
    if path in _EVENTS_TS_TYPE_CACHE:
        return _EVENTS_TS_TYPE_CACHE[path]
    try:
        ts_type = spark.read.parquet(path).schema["ts"].dataType.typeName()
        if ts_type not in ("timestamp", "timestamp_ntz"):
            ts_type = None  # e.g. LongType under legacy nanosAsLong conf
    except AnalysisException as e:
        # Only the SPECIFIC failure Spark 4 raises for a nanos footer
        # routes to the raw-int64 ÷1000 fallback (probed empirically:
        # AnalysisException, condition PARQUET_TYPE_ILLEGAL, message
        # "Illegal Parquet type: INT64 (TIMESTAMP(NANOS,…))"). Any
        # other error — missing file, FS hiccup, corrupt footer —
        # propagates: a blanket fallback here would silently collapse
        # µs timestamps 1000×, the exact bug class round 3 fixed
        # (ADVICE r3).
        cond = e.getCondition() if hasattr(e, "getCondition") else None
        if cond != "PARQUET_TYPE_ILLEGAL" and "TIMESTAMP(NANOS" not in str(e):
            raise
        ts_type = None
    _EVENTS_TS_TYPE_CACHE[path] = ts_type
    return ts_type


def events_ts_is_native(spark: SparkSession, path: str) -> bool:
    """True when Spark can decode the events ``ts`` column natively
    (µs/ms parquet footer), False for a nanos footer that needs the
    raw-int64 fallback decode."""
    return events_ts_inferred_type(spark, path) is not None


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
