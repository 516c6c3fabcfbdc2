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


#: events.parquet carries TIMESTAMP(NANOS), which Spark 4 refuses to
#: read natively; an explicit long schema sidesteps it independent of
#: session config (no reliance on spark.sql.legacy.parquet.nanosAsLong),
#: and ts is rebuilt as a µs-truncated TimestampType column.
_EVENTS_RAW_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, "
    "event_type string, value double, props string"
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Lazy; no caching — each query's plan
    owns its scan so pushdown/pruning are per-query."""
    if name not in TABLES:
        raise KeyError(f"unknown fixture table: {name!r}")
    path = table_path(sf_dir, name)
    if name == "events":
        raw = spark.read.schema(_EVENTS_RAW_SCHEMA).parquet(path)
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        ).select("event_id", "ts", "user_id", "event_type", "value", "props")
    return spark.read.parquet(path)


def list_tables(sf_dir: str) -> list[str]:
    """Catalog enumeration (≙ SHOW TABLES, SURVEY §2 S1)."""
    return [t for t in TABLES if os.path.exists(table_path(sf_dir, t))]
