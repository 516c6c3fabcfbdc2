"""Bit-parity of the driver-side XXH64 with Spark's F.xxhash64 —
the foundation under bucket-partition manifest pruning. Randomized
(seeded) values across every covered input layout."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from apache_iceberg_tables_migration_tool_spark.functions.xxh64 import (
    spark_xxhash64,
    xxh64_bytes,
    xxh64_int,
    xxh64_long,
)

rng = random.Random(7)

INTS = [0, 1, -1, 5, 2**31 - 1, -(2**31)] + [rng.randint(-(2**31), 2**31 - 1) for _ in range(30)]
LONGS = [0, 1, -1, 2**63 - 1, -(2**63)] + [rng.randint(-(2**63), 2**63 - 1) for _ in range(30)]
STRINGS = (
    ["", "a", "abc", "abcd", "abcdefgh", "x" * 31, "y" * 32, "z" * 100, "naïve-ünïcode-文字"]
    + ["".join(rng.choice("abcdefghij") for _ in range(rng.randint(1, 64))) for _ in range(20)]
)


def test_int_layout_matches_spark(spark):
    rows = spark.createDataFrame([(v,) for v in INTS], "v int").select(
        "v", F.xxhash64("v").alias("h")
    ).collect()
    for r in rows:
        assert xxh64_int(r["v"]) == r["h"], r["v"]


def test_long_layout_matches_spark(spark):
    rows = spark.createDataFrame([(v,) for v in LONGS], "v bigint").select(
        "v", F.xxhash64("v").alias("h")
    ).collect()
    for r in rows:
        assert xxh64_long(r["v"]) == r["h"], r["v"]


def test_string_layout_matches_spark(spark):
    rows = spark.createDataFrame([(v,) for v in STRINGS], "v string").select(
        "v", F.xxhash64("v").alias("h")
    ).collect()
    for r in rows:
        assert xxh64_bytes(r["v"].encode("utf-8")) == r["h"], repr(r["v"])


def test_dispatch_covers_and_declines(spark):
    assert spark_xxhash64(5, "int") == xxh64_int(5)
    assert spark_xxhash64(5, "bigint") == xxh64_long(5)
    assert spark_xxhash64("ab", "string") == xxh64_bytes(b"ab")
    assert spark_xxhash64(1.5, "double") is None  # uncovered → no pruning
