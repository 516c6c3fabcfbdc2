"""A/B micro-benchmark: metadata-plane cost of history walks.

Builds one table with N commits (16 data files each) plus a few MOR
delete commits, then times the summary-only consumers the r10 work
targets: ``snapshots()``, ``main_chain()``, ``snapshots_df`` /
``history_df``, ``current_snapshot()`` and a point
``resolve_snapshot``. Run the same script in a worktree at the
pre-change commit for the "before" column (PERFORMANCE.md round-10
log records both).

Usage: python scripts/bench_history_walk.py [n_commits] [rows_per_commit]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog
from apache_iceberg_tables_migration_tool_spark.sources import snapcat as sc

N_COMMITS = int(sys.argv[1]) if len(sys.argv) > 1 else 40
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import tempfile

root = tempfile.mkdtemp(prefix="histbench_")
cat = SnapCatalog(os.path.join(root, "wh"))

df = spark.range(0, ROWS).select(
    "id", (F.col("id") % 97).alias("k"), (F.col("id") * 3).alias("v")
).repartition(16)

t0 = time.perf_counter()
for i in range(N_COMMITS):
    cat.write("db", "hist", df.where(F.col("id") % N_COMMITS == i), mode="append")
    if i % 10 == 9:
        cat.delete_where("db", "hist", f"k = {i}", mode="merge-on-read")
build = time.perf_counter() - t0
tbl = cat.table("db", "hist")


def timeit(label, fn, reps=5):
    # quiet-minimum over reps; clear the chunk cache each rep so the
    # measurement is parses, not cache hits
    best = float("inf")
    for _ in range(reps):
        sc._CHUNK_CACHE.clear()
        t = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t)
    return label, round(best * 1000, 2)


results = dict(
    [
        timeit("snapshots_ms", lambda: tbl.snapshots()),
        timeit("main_chain_ms", lambda: tbl.main_chain()),
        timeit("snapshots_df_ms", lambda: tbl.snapshots_df(spark).collect()),
        timeit("history_df_ms", lambda: tbl.history_df(spark).collect()),
        timeit("current_snapshot_ms", lambda: tbl.current_snapshot()),
        timeit(
            "resolve_mid_ms",
            lambda: tbl.resolve_snapshot(
                snapshot_id=tbl.snapshots()[N_COMMITS // 2].snapshot_id
            ),
        ),
        timeit("read_head_count_ms", lambda: tbl.read(spark).count(), reps=3),
    ]
)
results["n_commits"] = len(tbl.snapshots())
results["n_files_head"] = len(tbl.current_snapshot().files)
results["build_sec"] = round(build, 1)
print(json.dumps(results))
