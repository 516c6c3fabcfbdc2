"""Capture POST-EXECUTION physical plans for the benched queries.

`capture_plans.py` records initial plans (`AdaptiveSparkPlan
isFinalPlan=false`) — AQE join rewrites, coalesced AQEShuffleReads and
exchange reuse only show up after the action runs. This script
executes each query (count(), the bench action) and dumps
`queryExecution().executedPlan()` — the as-executed tree the r14
verdict asked to see (action #6).

Usage: python scripts/capture_executed_plans.py <tag> [query ...]
Writes plans/<tag>/<query>_executed.txt (default: the headline +
feature bench set). Session = session.get_spark() (bench conf).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from apache_iceberg_tables_migration_tool_spark.queries import QUERIES  # noqa: E402
from apache_iceberg_tables_migration_tool_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: the bench rows (headline + feature tier) — the set the driver times
BENCH_FEATURE = [
    "merge_on_read_lifecycle",
    "changelog_cdc_stream",
    "corpus_build_e2e",
    "incremental_join_view",
    "incremental_join_chain_view",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or (
        [n for n, s in QUERIES.items() if s.headline] + BENCH_FEATURE
    )
    spark = get_spark(
        app_name="capture_executed_plans",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join("/root/repo/plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name].fn(spark, SF_DIR)
        # execute the Dataset's OWN QueryExecution (collect, not
        # count(): count builds a new pruned query) so the adaptive
        # plan below is the finalized one (isFinalPlan=true)
        df.collect()
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_executed.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", flush=True)


if __name__ == "__main__":
    main()
