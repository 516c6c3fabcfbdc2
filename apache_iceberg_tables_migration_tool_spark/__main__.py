import sys

from apache_iceberg_tables_migration_tool_spark.cli import main

sys.exit(main())
