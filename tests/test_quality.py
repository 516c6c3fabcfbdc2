"""Constraint-validation operator: fused scalar checks, uniqueness,
foreign keys — violations counted exactly."""

from __future__ import annotations

from apache_iceberg_tables_migration_tool_spark.operators import quality as Q


def test_validate_all_rule_kinds(spark):
    df = spark.createDataFrame(
        [
            (1, "eu", 10.0, "a@x.com"),
            (2, "us", -5.0, "bad"),       # in_range + matches violations
            (3, None, 20.0, None),        # not_null violation (region), FK exempt? no: id FK still checked
            (3, "xx", 5.0, "c@y.org"),    # duplicate id + accepted_values violation
            (9, "eu", 30.0, "d@z.io"),    # FK orphan (no customer 9)
        ],
        "id long, region string, amount double, email string",
    )
    ref = spark.createDataFrame([(1,), (2,), (3,)], "cid long")
    rep = Q.validate(df, [
        Q.not_null("region"),
        Q.accepted_values("region", ["eu", "us", "ap"]),
        Q.in_range("amount", 0.0, 100.0),
        Q.matches("email", r"^[^@]+@[^@]+\.[a-z]+$"),
        Q.unique(["id"]),
        Q.foreign_key(["id"], ref, ["cid"]),
        Q.custom("amount_vs_region", "region = 'eu' AND amount > 25"),
    ])
    got = {(r["rule"], r["column"]): (r["violations"], r["total"], r["passed"])
           for r in rep.collect()}
    assert got[("not_null", "region")] == (1, 5, False)
    assert got[("accepted_values", "region")] == (2, 5, False)  # None + xx
    assert got[("in_range", "amount")] == (1, 5, False)
    assert got[("matches", "email")] == (1, 5, False)  # null exempt, "bad" fails
    assert got[("unique", "id")] == (2, 5, False)  # both id=3 rows count
    assert got[("foreign_key", "id")] == (1, 5, False)  # id=9 orphan
    assert got[("custom", "amount_vs_region")] == (1, 5, False)  # eu/30


def test_validate_passes_clean_table(spark):
    from pyspark.sql import functions as F

    df = spark.range(10).select("id", F.col("id").alias("v"))
    rep = Q.validate(df, [Q.not_null("v"), Q.unique(["id"]), Q.in_range("v", 0, 9)])
    assert all(r["passed"] for r in rep.collect())
    assert {r["total"] for r in rep.collect()} == {10}
