"""Query registry: every implemented operator exposed as a named
(spark_fn, oracle_sql) pair for the driver's correctness gate."""

from apache_iceberg_tables_migration_tool_spark.queries.registry import (  # noqa: F401
    QUERIES,
    QuerySpec,
    all_queries,
    all_oracles,
)

# importing the modules populates the registry
from apache_iceberg_tables_migration_tool_spark.queries import relational  # noqa: F401,E402
from apache_iceberg_tables_migration_tool_spark.queries import relational2  # noqa: F401,E402
from apache_iceberg_tables_migration_tool_spark.queries import northstar  # noqa: F401,E402
from apache_iceberg_tables_migration_tool_spark.queries import migration  # noqa: F401,E402
from apache_iceberg_tables_migration_tool_spark.queries import extensions  # noqa: F401,E402
from apache_iceberg_tables_migration_tool_spark.queries import tpch_ext  # noqa: F401,E402
