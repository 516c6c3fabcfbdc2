"""Capture .explain('formatted') for named queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> <suffix> [query ...]
Writes plans/<tag>/<query>_<suffix>.txt for each query (default: all
headline queries). Uses session.get_spark() (the bench's session, with
DEFAULT_CONF: AQE, runtime bloom filters, 64m broadcast threshold) so
captured plan shapes match what bench.py actually executes — a bare
session's 10 MB broadcast default flips BHJ/SMJ choices (r14 ADVICE).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from apache_iceberg_tables_migration_tool_spark.queries import QUERIES  # noqa: E402
from apache_iceberg_tables_migration_tool_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or [n for n, s in QUERIES.items() if s.headline]
    spark = get_spark(
        app_name="capture_plans",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join("/root/repo/plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", flush=True)


if __name__ == "__main__":
    main()
