"""Migration planning + execution + verification (the reference's
six-stage pipeline as one in-process engine)."""

from apache_iceberg_tables_migration_tool_spark.plans.plan import (  # noqa: F401
    MigrationPlan,
    TableMigration,
    collect_plan,
)
from apache_iceberg_tables_migration_tool_spark.plans.migrator import (  # noqa: F401
    migrate,
    migrate_history,
    sync_history,
)
from apache_iceberg_tables_migration_tool_spark.plans.verifier import verify  # noqa: F401
from apache_iceberg_tables_migration_tool_spark.plans.reports import summarize_report  # noqa: F401
