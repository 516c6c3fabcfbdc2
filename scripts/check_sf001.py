"""Run every registered query vs its DuckDB oracle at an arbitrary SF
(default sf0.01 — the driver's grading scale). Prints one line per
query and a failure summary; exit 1 on any mismatch.

Usage: python scripts/check_sf001.py [sf_dir] [name_substring ...]
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from apache_iceberg_tables_migration_tool_spark.queries import QUERIES
from apache_iceberg_tables_migration_tool_spark.session import get_spark
from tests.oracle_harness import compare, run_oracle


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    subs = sys.argv[2:]
    spark = get_spark(app_name="check-sf", master="local[16]", extra_conf={
        "spark.sql.shuffle.partitions": "16",
        "spark.driver.memory": "8g",
    })
    failures: dict[str, str] = {}
    for name, spec in QUERIES.items():
        if subs and not any(s in name for s in subs):
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                n = sdf.count()
                print(f"ROWS-ONLY {name}: {n} rows ({time.time()-t0:.1f}s)")
                continue
            pdf = run_oracle(spec.oracle, sf_dir)
            compare(sdf, pdf, name)
            print(f"PASS {name} ({time.time()-t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            failures[name] = f"{type(e).__name__}: {e}"
            print(f"FAIL {name}: {failures[name][:300]}", flush=True)
            traceback.print_exc(limit=2)
    print(f"\n{len(failures)} failures / {len(QUERIES)} queries")
    for n, msg in failures.items():
        print(f"  {n}: {msg[:200]}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
