"""Commit-verb micro-benchmark (the r9 accounting harness, made
repeatable): bare engine verbs on a synthetic table — append, MOR
delete_keys, stage+publish, a 13-commit MOR table's changelog build
and read. Run in a worktree at the comparison ref for the A/B column.

Usage: python scripts/bench_commit_verbs.py [reps]
"""

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

df = spark.range(0, 20_000).select(
    "id", (F.col("id") % 101).alias("k"), (F.col("id") * 3).alias("v")
)
df.count()  # warm


def med(fn, reps=REPS):
    ts = []
    for _ in range(reps):
        t = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t)
    return round(statistics.median(ts), 3), round(min(ts), 3)


results = {}

root = tempfile.mkdtemp(prefix="verbbench_")
cat = SnapCatalog(os.path.join(root, "wh"))
cat.write("db", "t", df)

results["append_med_s"], results["append_min_s"] = med(
    lambda: cat.write("db", "t", df, mode="append")
)

keys = df.where(F.col("id") % 997 == 0).select("id")
results["mor_delete_med_s"], results["mor_delete_min_s"] = med(
    lambda: cat.delete_keys("db", "t", keys, key_cols=["id"])
)

i = [0]


def stage_publish():
    snap = cat.write("db", "t", df, mode="append", staged=True)
    cat.publish("db", "t", snap.snapshot_id)
    i[0] += 1


results["stage_publish_med_s"], results["stage_publish_min_s"] = med(stage_publish)

# 13-commit MOR table: 7 appends interleaved with 6 MOR deletes
cat2 = SnapCatalog(os.path.join(root, "wh2"))
for j in range(7):
    cat2.write("db", "m", df.where(F.col("id") % 7 == j), mode="append")
    if j < 6:
        cat2.delete_keys(
            "db", "m",
            df.where(F.col("id") % 131 == j).select("id"), key_cols=["id"],
        )
tbl = cat2.table("db", "m")
head = tbl.current_snapshot().snapshot_id

t0 = time.perf_counter()
n_changes = tbl.changelog(spark, None, head).count()
results["changelog_13_commits_s"] = round(time.perf_counter() - t0, 2)
results["changelog_rows"] = n_changes

results["mor_read_med_s"], results["mor_read_min_s"] = med(
    lambda: tbl.read(spark).count(), reps=3
)

print(json.dumps(results))
