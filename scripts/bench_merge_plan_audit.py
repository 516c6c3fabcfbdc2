"""Plan audit for the r11 MERGE compose paths: a 100k-row target x
1k-row source through the explicit-SET + INSERT-mapping shape must
plan as broadcast hash joins (small source broadcasts), zero
SortMergeJoin, zero CartesianProduct. Run: python scripts/bench_merge_plan_audit.py"""
import os.path
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import tempfile, os
from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog
from apache_iceberg_tables_migration_tool_spark.sources import sqlfront as sf

root = tempfile.mkdtemp()
cat = SnapCatalog(os.path.join(root, "wh"))
# 100k-row target, 1k-row source: the source side must broadcast
cat.write("db", "t", spark.range(0, 100000).select(F.col("id").alias("k"), (F.col("id") % 97).cast("int").alias("v"), F.lit("x").alias("name")))
cat.write("db", "s", spark.range(0, 1000).select((F.col("id") * 7).alias("sk"), F.lit(5).cast("int").alias("v"), F.lit("y").alias("name")))

# capture the updates plan by monkeypatching the catalog verbs
plans = {}
orig_upsert = cat.upsert
def spy_upsert(db, tbl, updates, key_cols, **kw):
    plans["upsert_updates"] = updates._jdf.queryExecution().toString()
    return orig_upsert(db, tbl, updates, key_cols=key_cols, **kw)
cat.upsert = spy_upsert
sf.snapcat_dml(spark, cat,
    "MERGE INTO db.t USING db.s AS s ON t.k = s.sk "
    "WHEN MATCHED THEN UPDATE SET v = s.v + 1 "
    "WHEN NOT MATCHED THEN INSERT (k, v, name) VALUES (s.sk, s.v, s.name)")
p = plans["upsert_updates"]
import re as _re
print("== update_set + insert_cols updates plan ==")
print("broadcast joins:", p.count("BroadcastHashJoin"), "| SMJ:", p.count("SortMergeJoin"), "| cartesian:", p.count("Cartesian"))
for line in p.splitlines():
    if "Join" in line and "==" not in line:
        print("  ", line.strip()[:120])
spark.stop()
