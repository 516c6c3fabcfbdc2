"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``apache_iceberg_tables_migration_tool_spark``;
this module just adapts the registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from apache_iceberg_tables_migration_tool_spark.queries import all_oracles, all_queries
from apache_iceberg_tables_migration_tool_spark.queries.relational import (
    flagship_topk_revenue,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q3-shaped top-k revenue) on sf0.001."""
    return flagship_topk_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + north-star ops."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted for non-SQL-expressible
    ops — LSH internals, the filesystem-backed migration pipeline)."""
    return all_oracles()
