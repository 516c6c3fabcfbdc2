"""Aggregate navigation (plans/rewriter.py): grouped-aggregate
queries route through maintained views when fresh and sufficient,
fall back to the base otherwise, and both paths agree exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_iceberg_tables_migration_tool_spark.plans.rewriter import (
    answer_aggregate,
    find_rewrite,
)
from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog
from apache_iceberg_tables_migration_tool_spark.streaming.pipelines import (
    refresh_view_changelog,
)

_ROWS = [("a", 0, 10), ("a", 0, 20), ("a", 1, 5), ("b", 0, 7), ("b", 1, 1)]


def _mk(spark, tmp_path):
    cat = SnapCatalog(str(tmp_path / "wh"))
    cat.write("db", "src", spark.createDataFrame(
        _ROWS, "p string, b int, v long").coalesce(1))
    return cat


def test_rewrite_routes_through_fresh_view_and_matches_base(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    refresh_view_changelog(
        spark, cat, "db", "src", "db", "fine", keys=["p", "b"], sum_cols=["v"]
    )
    aggs = [("count", None, "n"), ("sum", "v", "sv")]
    out, m = answer_aggregate(spark, cat, "db", "src", ["p"], aggs)
    assert m is not None and (m.database, m.table) == ("db", "fine")
    got = {r["p"]: (r["n"], r["sv"]) for r in out.collect()}
    assert got == {"a": (3, 35), "b": (2, 8)}
    # the view path must agree with a from-scratch base aggregate
    base = {
        r["p"]: (r["n"], r["sv"])
        for r in cat.table("db", "src").read(spark)
        .groupBy("p").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        .collect()
    }
    assert got == base


def test_rewrite_skips_stale_view_and_falls_back(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    refresh_view_changelog(
        spark, cat, "db", "src", "db", "fine", keys=["p", "b"], sum_cols=["v"]
    )
    cat.write("db", "src", spark.createDataFrame(
        [("a", 1, 100)], "p string, b int, v long"))
    aggs = [("count", None, "n"), ("sum", "v", "sv")]
    assert find_rewrite(cat, "db", "src", ["p"], aggs) is None  # stale
    out, m = answer_aggregate(spark, cat, "db", "src", ["p"], aggs)
    assert m is None  # base fallback, NEW row included
    got = {r["p"]: (r["n"], r["sv"]) for r in out.collect()}
    assert got == {"a": (4, 135), "b": (2, 8)}
    # refreshing makes the view usable again
    refresh_view_changelog(
        spark, cat, "db", "src", "db", "fine", keys=["p", "b"], sum_cols=["v"]
    )
    out, m = answer_aggregate(spark, cat, "db", "src", ["p"], aggs)
    assert m is not None
    assert {r["p"]: (r["n"], r["sv"]) for r in out.collect()} == got


def test_rewrite_prefers_cheapest_covering_view(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    refresh_view_changelog(
        spark, cat, "db", "src", "db", "fine", keys=["p", "b"], sum_cols=["v"]
    )
    refresh_view_changelog(
        spark, cat, "db", "src", "db", "coarse", keys=["p"], sum_cols=["v"]
    )
    aggs = [("sum", "v", "sv")]
    m = find_rewrite(cat, "db", "src", ["p"], aggs)
    assert (m.database, m.table) == ("db", "coarse")  # fewer keys wins
    # a (p, b) query can only use the fine view
    m2 = find_rewrite(cat, "db", "src", ["p", "b"], aggs)
    assert (m2.database, m2.table) == ("db", "fine")
    # an untracked column matches nothing
    assert find_rewrite(cat, "db", "src", ["p"], [("sum", "b", "x")]) is None


def test_rewrite_kind_capabilities(spark, tmp_path):
    """moments serves avg (same IEEE tree both paths); distinct
    serves exact count_distinct at COARSER keys (values, not a
    sketch); minmax serves min/max; wrong fn for a kind matches
    nothing."""
    cat = _mk(spark, tmp_path)
    refresh_view_changelog(
        spark, cat, "db", "src", "db", "mo", keys=["p", "b"], moment_cols=["v"]
    )
    refresh_view_changelog(
        spark, cat, "db", "src", "db", "dv", keys=["b"], distinct_col="v"
    )
    refresh_view_changelog(
        spark, cat, "db", "src", "db", "mm", keys=["p", "b"], minmax_cols=["v"]
    )
    out, m = answer_aggregate(
        spark, cat, "db", "src", ["p"], [("avg", "v", "av")]
    )
    assert m.table == "mo"
    got = {r["p"]: r["av"] for r in out.collect()}
    assert got == {"a": 35 / 3, "b": 4.0}
    out, m = answer_aggregate(
        spark, cat, "db", "src", ["b"], [("count_distinct", "v", "dv_")]
    )
    assert m.table == "dv"
    assert {r["b"]: r["dv_"] for r in out.collect()} == {0: 3, 1: 2}
    out, m = answer_aggregate(
        spark, cat, "db", "src", ["p"],
        [("min", "v", "lo"), ("max", "v", "hi")],
    )
    assert m.table == "mm"
    assert {r["p"]: (r["lo"], r["hi"]) for r in out.collect()} == {
        "a": (5, 20), "b": (1, 7)
    }
    # sum view exists? no — only mo/dv/mm; a sum(v) request is served
    # by... moments (sum derivable from stored sum_v)
    out, m = answer_aggregate(
        spark, cat, "db", "src", ["p"], [("sum", "v", "sv")]
    )
    assert m.table == "mo"
    assert {r["p"]: r["sv"] for r in out.collect()} == {"a": 35, "b": 8}
