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


def test_join_rewrite_exact_signature_and_freshness(spark, tmp_path):
    """A join rollup routes through the maintained join view only for
    the EXACT join signature; a commit on either side staledates it;
    both paths agree."""
    from apache_iceberg_tables_migration_tool_spark.plans.rewriter import (
        answer_join_aggregate,
        find_join_rewrite,
    )
    from apache_iceberg_tables_migration_tool_spark.streaming.pipelines import (
        refresh_join_view,
    )

    cat = SnapCatalog(str(tmp_path / "wh"))
    cat.write("db", "a", spark.createDataFrame(
        [(1, "x"), (2, "y")], "ok long, p string"))
    cat.write("db", "b", spark.createDataFrame(
        [(1, 10), (1, 5), (2, 7)], "ok long, qty long").coalesce(1))
    refresh_join_view(
        spark, cat, "db", "a", "db", "b", "db", "jv",
        on=["ok"], keys=["p"], sum_cols=["qty"],
    )
    tables = [("db", "a"), ("db", "b")]
    aggs = [("count", None, "n"), ("sum", "qty", "sq")]
    out, m = answer_join_aggregate(spark, cat, tables, [["ok"]], ["p"], aggs)
    assert m is not None and m.table == "jv"
    got = {r["p"]: (r["n"], r["sq"]) for r in out.collect()}
    assert got == {"x": (2, 15), "y": (1, 7)}
    # different signature (reversed tables) matches nothing
    assert find_join_rewrite(
        cat, [("db", "b"), ("db", "a")], [["ok"]], ["p"], aggs
    ) is None
    # a commit on side B staledates the view → base-join fallback
    cat.write("db", "b", spark.createDataFrame([(2, 100)], "ok long, qty long"))
    out, m = answer_join_aggregate(spark, cat, tables, [["ok"]], ["p"], aggs)
    assert m is None
    got = {r["p"]: (r["n"], r["sq"]) for r in out.collect()}
    assert got == {"x": (2, 15), "y": (2, 107)}
    # refresh → routable again, same values
    refresh_join_view(
        spark, cat, "db", "a", "db", "b", "db", "jv",
        on=["ok"], keys=["p"], sum_cols=["qty"],
    )
    out, m = answer_join_aggregate(spark, cat, tables, [["ok"]], ["p"], aggs)
    assert m is not None
    assert {r["p"]: (r["n"], r["sq"]) for r in out.collect()} == got


def test_chain_rewrite_routes_through_chain_view(spark, tmp_path):
    from apache_iceberg_tables_migration_tool_spark.plans.rewriter import (
        answer_join_aggregate,
    )
    from apache_iceberg_tables_migration_tool_spark.streaming.pipelines import (
        refresh_join_chain_view,
    )

    cat = SnapCatalog(str(tmp_path / "wh"))
    cat.write("db", "cust", spark.createDataFrame(
        [(1, "x")], "ck long, nat string"))
    cat.write("db", "ords", spark.createDataFrame(
        [(1, 10), (1, 11)], "ck long, ok long").coalesce(1))
    cat.write("db", "items", spark.createDataFrame(
        [(10, 3), (11, 5)], "ok long, qty long").coalesce(1))
    tables = [("db", "cust"), ("db", "ords"), ("db", "items")]
    refresh_join_chain_view(
        spark, cat, tables, "db", "cv",
        ons=[["ck"], ["ok"]], keys=["nat"], sum_cols=["qty"],
    )
    out, m = answer_join_aggregate(
        spark, cat, tables, [["ck"], ["ok"]], ["nat"],
        [("sum", "qty", "sq")],
    )
    assert m is not None and m.table == "cv"
    assert {r["nat"]: r["sq"] for r in out.collect()} == {"x": 8}


def test_topk_rewrite_prefix_and_fallback(spark, tmp_path):
    """A smaller-k query is answered from a bigger-k leaderboard as
    the rk ≤ k prefix; a different partition or metric falls back."""
    from apache_iceberg_tables_migration_tool_spark.plans.rewriter import (
        answer_topk,
    )
    from apache_iceberg_tables_migration_tool_spark.streaming.pipelines import (
        refresh_topk_view,
    )

    cat = SnapCatalog(str(tmp_path / "wh"))
    cat.write("db", "src", spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("a", 3, 30), ("b", 4, 5)],
        "g string, id long, m long").coalesce(1))
    refresh_topk_view(
        spark, cat, "db", "src", "db", "board",
        keys=["g"], metric_col="m", id_col="id", k=3,
    )
    out, m = answer_topk(spark, cat, "db", "src", ["g"], "m", "id", 2)
    assert m is not None and m.table == "board"
    got = {(r["g"], r["id"]): r["rk"] for r in out.collect()}
    assert got == {("a", 3): 1, ("a", 2): 2, ("b", 4): 1}
    # k larger than stored → fallback computes from the base
    out, m = answer_topk(spark, cat, "db", "src", ["g"], "m", "id", 4)
    assert m is None
    assert len(out.collect()) == 4
    # different partition keys → fallback
    out, m = answer_topk(spark, cat, "db", "src", [], "m", "id", 2)
    assert m is None


def test_answer_quantile_from_coarsened_aux(spark, tmp_path):
    """Exact grouped quantiles route through the counted aux even at
    COARSER keys (multiplicities merge first); fallback agrees."""
    from apache_iceberg_tables_migration_tool_spark.plans.rewriter import (
        answer_quantile,
    )

    cat = _mk(spark, tmp_path)
    refresh_view_changelog(
        spark, cat, "db", "src", "db", "dv", keys=["p", "b"], distinct_col="v"
    )
    out, m = answer_quantile(
        spark, cat, "db", "src", ["p"], "v", [0.5]
    )
    assert m is not None and m.table == "dv"
    got = {r["p"]: r["p50_v"] for r in out.collect()}
    # a: values {5,10,20} → median 10; b: {1,7} → ceil(.5*2)=1st → 1
    assert got == {"a": 10, "b": 1}
    # fallback (stale after a new commit) gives identical values
    cat.write("db", "src", spark.createDataFrame(
        [("b", 0, 100)], "p string, b int, v long"))
    out, m = answer_quantile(spark, cat, "db", "src", ["p"], "v", [0.5])
    assert m is None
    assert {r["p"]: r["p50_v"] for r in out.collect()} == {"a": 10, "b": 7}


def test_refresh_view_auto_dispatches_every_kind(spark, tmp_path):
    """refresh_view_auto re-folds any maintained view from its own
    stamped definition: single-table sum/distinct, a join view, a
    chain view and both leaderboards — and refuses undecorated
    tables."""
    import pytest as _pytest

    from apache_iceberg_tables_migration_tool_spark.streaming.pipelines import (
        refresh_join_chain_view,
        refresh_join_view,
        refresh_topk_join_view,
        refresh_topk_view,
        refresh_view_auto,
    )

    cat = _mk(spark, tmp_path)
    cat.write("db", "b2", spark.createDataFrame(
        [(0, 10, 7), (1, 11, 9)], "b int, id long, w long").coalesce(1))
    refresh_view_changelog(
        spark, cat, "db", "src", "db", "v_sum", keys=["p"], sum_cols=["v"]
    )
    refresh_view_changelog(
        spark, cat, "db", "src", "db", "v_dv", keys=["p"], distinct_col="v"
    )
    refresh_topk_view(
        spark, cat, "db", "src", "db", "v_tk",
        keys=["p"], metric_col="v", id_col="b", k=1,
    )
    refresh_join_view(
        spark, cat, "db", "src", "db", "b2", "db", "v_jv",
        on=["b"], keys=["p"], sum_cols=["w"],
    )
    refresh_join_chain_view(
        spark, cat, [("db", "src"), ("db", "b2")], "db", "v_cv",
        ons=[["b"]], keys=["p"], sum_cols=["w"],
    )
    refresh_topk_join_view(
        spark, cat, "db", "src", "db", "b2", "db", "v_tj",
        on=["b"], keys=["p"], metric_col="w", id_cols=["b", "id"], k=1,
    )
    # all current → every auto-refresh no-ops
    for v in ("v_sum", "v_dv", "v_tk", "v_jv", "v_cv", "v_tj"):
        assert refresh_view_auto(spark, cat, "db", v) is None, v
    # mutate both sources → every auto-refresh folds and is exact
    cat.write("db", "src", spark.createDataFrame(
        [("a", 1, 999)], "p string, b int, v long"))
    cat.write("db", "b2", spark.createDataFrame(
        [(1, 12, 100)], "b int, id long, w long"))
    for v in ("v_sum", "v_dv", "v_tk", "v_jv", "v_cv", "v_tj"):
        assert refresh_view_auto(spark, cat, "db", v) is not None, v
        assert refresh_view_auto(spark, cat, "db", v) is None, v  # now current
    got = {r["p"]: r["sum_v"]
           for r in cat.table("db", "v_sum").read(spark).collect()}
    assert got == {"a": 1034, "b": 8}
    tk = {r["p"]: r["b"] for r in cat.table("db", "v_tk").read(spark).collect()}
    assert tk == {"a": 1, "b": 0}  # v=999 promoted b=1 to a's top slot
    with _pytest.raises(ValueError, match="no ivm"):
        refresh_view_auto(spark, cat, "db", "src")


def test_answer_aggregate_refresh_stale_folds_then_routes(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    refresh_view_changelog(
        spark, cat, "db", "src", "db", "fine", keys=["p", "b"], sum_cols=["v"]
    )
    cat.write("db", "src", spark.createDataFrame(
        [("a", 1, 100)], "p string, b int, v long"))
    aggs = [("count", None, "n"), ("sum", "v", "sv")]
    out, m = answer_aggregate(
        spark, cat, "db", "src", ["p"], aggs, refresh_stale=True
    )
    assert m is not None and m.table == "fine"  # folded to head, then routed
    got = {r["p"]: (r["n"], r["sv"]) for r in out.collect()}
    assert got == {"a": (4, 135), "b": (2, 8)}


def test_maintain_view_auto_streams_any_kind(spark, tmp_path):
    """One streaming maintainer for any stamped view: sources come
    from the metadata; a commit on either join side wakes a fold."""
    from apache_iceberg_tables_migration_tool_spark.streaming.pipelines import (
        maintain_view_auto,
        refresh_join_view,
    )

    cat = _mk(spark, tmp_path)
    cat.write("db", "b2", spark.createDataFrame(
        [(0, 7)], "b int, w long"))
    refresh_join_view(
        spark, cat, "db", "src", "db", "b2", "db", "jv",
        on=["b"], keys=["p"], sum_cols=["w"],
    )
    ckpt = str(tmp_path / "ckpt")

    def drain():
        maintain_view_auto(
            spark, cat, "db", "jv", checkpoint_dir=ckpt
        ).awaitTermination()

    drain()
    cat.write("db", "b2", spark.createDataFrame([(1, 100)], "b int, w long"))
    drain()
    got = {r["p"]: r["sum_w"] for r in cat.table("db", "jv").read(spark).collect()}
    # src: a rows at b∈{0,1}, b at b∈{0,1} → a: 7+7(two b=0 rows? see _ROWS)
    want = {
        r["p"]: r["sw"]
        for r in cat.table("db", "src").read(spark)
        .join(cat.table("db", "b2").read(spark), ["b"])
        .groupBy("p").agg(F.sum("w").alias("sw")).collect()
    }
    assert got == want
    drain()  # idempotent
    got2 = {r["p"]: r["sum_w"] for r in cat.table("db", "jv").read(spark).collect()}
    assert got2 == got
