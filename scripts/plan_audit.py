"""Plan-shape audit over every declared query: one row per query with
Exchange count, join strategies, Python-eval nodes, and scan pushdown
markers — the round-14 optimization evidence table
(plans/r14/plan_audit.md). Queries are built at sf0.01 (building a
lifecycle carrier's DataFrame runs its catalog history; the final
frame's plan is what the driver's action executes)."""

from __future__ import annotations

import os
import re
import sys
import traceback

sys.path.insert(0, "/root/repo")

from apache_iceberg_tables_migration_tool_spark.queries import QUERIES  # noqa: E402
from apache_iceberg_tables_migration_tool_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

MARKS = [
    ("Exchange", re.compile(r"\bExchange\b")),
    ("BroadcastHashJoin", re.compile(r"\bBroadcastHashJoin\b")),
    ("SortMergeJoin", re.compile(r"\bSortMergeJoin\b")),
    ("ShuffledHashJoin", re.compile(r"\bShuffledHashJoin\b")),
    ("Cartesian", re.compile(r"\bCartesianProduct\b")),
    ("BNLJ", re.compile(r"\bBroadcastNestedLoopJoin\b")),
    ("PyEval", re.compile(r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas)\b")),
    ("Generate", re.compile(r"\bGenerate\b")),
]


def main() -> None:
    # session.get_spark(): plans must be captured under DEFAULT_CONF
    # (AQE, runtime bloom filters, 64m broadcast) — the configuration
    # bench.py runs with — or BHJ/SMJ/Exchange counts diverge from the
    # executed plans (r14 ADVICE)
    spark = get_spark(
        app_name="plan_audit",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = os.environ.get("PLAN_AUDIT_OUT", "/root/repo/plans/r14/plan_audit.md")
    rows = []
    for name, specq in QUERIES.items():
        try:
            df = specq.fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            tree = plan.split("\n\n")[0]  # operator tree only, not details
            counts = {m: len(rx.findall(tree)) for m, rx in MARKS}
            pushed = "PushedFilters: [" in plan and not re.search(
                r"PushedFilters: \[\]", plan
            )
            rows.append((name, counts, pushed))
            print("ok", name, flush=True)
        except Exception as e:  # noqa: BLE001
            rows.append((name, None, None))
            print("ERR", name, e, flush=True)
            traceback.print_exc()
    with open(out, "w") as f:
        f.write(
            "# Plan-shape audit (r14, sf0.01): final-frame physical plan "
            "per declared query\n\n"
            "Counts are operator-tree occurrences. Lifecycle carriers "
            "return collected report rows, so their final frames are "
            "LocalTableScans — their data-plane evidence is the per-verb "
            "plan probes and timings in OPTIMIZATION_r14.md.\n\n"
            "| query | Exchange | BHJ | SMJ | SHJ | Cartesian | BNLJ | "
            "PyEval | Generate | scan pushdown |\n"
            "|---|---|---|---|---|---|---|---|---|---|\n"
        )
        for name, counts, pushed in rows:
            if counts is None:
                f.write(f"| {name} | ERR | | | | | | | | |\n")
                continue
            f.write(
                f"| {name} | {counts['Exchange']} | "
                f"{counts['BroadcastHashJoin']} | {counts['SortMergeJoin']} | "
                f"{counts['ShuffledHashJoin']} | {counts['Cartesian']} | "
                f"{counts['BNLJ']} | {counts['PyEval']} | "
                f"{counts['Generate']} | {'yes' if pushed else '-'} |\n"
            )
    print("wrote", out)


if __name__ == "__main__":
    main()
