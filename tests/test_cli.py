"""End-to-end CLI workflow: the reference's six-stage UX
(snapshots → plan → migrate → verify → maintain) through one engine
CLI against a fixture-derived warehouse."""

from __future__ import annotations

import json

import pytest

from apache_iceberg_tables_migration_tool_spark.cli import main
from apache_iceberg_tables_migration_tool_spark.queries.migration import (
    build_source_warehouse,
)
from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_wh")
    build_source_warehouse(spark, SF_DIR, str(root))  # creates <root>/src
    return root, str(root / "src")


@pytest.mark.full  # deep soak — round-close tier (SPARK_GRAFT_FULL_TESTS=1)
def test_cli_full_workflow(spark, warehouse, capsys):
    root, src_root = warehouse
    dst_root = str(root / "dst")
    plan_path = str(root / "plan.json")
    snaps_path = str(root / "snaps.json")

    assert main(["snapshots", "--source", src_root, "--out", snaps_path]) == 0
    snaps = json.load(open(snaps_path))
    assert snaps and all(len(v) >= 1 for v in snaps.values())

    assert main(["plan", "--source", src_root, "--out", plan_path]) == 0
    plan = json.load(open(plan_path))
    assert plan["tables"]

    assert main([
        "migrate", "--source", src_root, "--target", dst_root, "--plan", plan_path,
        "--report", str(root / "mig.txt"),
    ]) == 0
    assert main([
        "verify", "--source", src_root, "--target", dst_root, "--plan", plan_path,
        "--report", str(root / "ver.txt"),
    ]) == 0
    report = open(root / "ver.txt").read()
    assert "TOTAL" in report

    # stage-4/6 failure mode: tamper with the target, verify must flag it
    dst = SnapCatalog(dst_root)
    db = plan["tables"][0]["database"]
    name = plan["tables"][0]["table_name"]
    tampered = dst.table(db, name).read(spark).limit(5)
    dst.write(db, name, tampered, mode="overwrite")
    assert main([
        "verify", "--source", src_root, "--target", dst_root, "--plan", plan_path,
    ]) == 1


def test_cli_maintain_and_query(warehouse, capsys):
    _, src_root = warehouse
    assert main(["maintain", "--warehouse", src_root, "--expire-keep-last", "1"]) == 0
    assert main(["list-queries"]) == 0
    out = capsys.readouterr().out
    assert "flagship_topk_revenue" in out and "oracle" in out

    assert main(["query", "--name", "table_counts", "--sf-dir", SF_DIR]) == 0
    assert main(["query", "--name", "nope"]) == 2


@pytest.mark.full  # deep soak — round-close tier (SPARK_GRAFT_FULL_TESTS=1)
def test_cli_migrate_history_flag(spark, warehouse):
    root, src_root = warehouse
    dst_root = str(root / "dst_hist")
    plan_path = str(root / "plan_hist.json")
    assert main(["plan", "--source", src_root, "--out", plan_path]) == 0
    assert main([
        "migrate", "--history", "--source", src_root, "--target", dst_root,
        "--plan", plan_path,
    ]) == 0
    # the target carries the FULL commit history, not one overwrite
    src_cat, dst_cat = SnapCatalog(src_root), SnapCatalog(dst_root)
    for tbl in ("lineitem_snap", "orders_snap"):
        assert len(dst_cat.table("db", tbl).snapshots()) == len(
            src_cat.table("db", tbl).snapshots()
        )
    assert main([
        "verify", "--source", src_root, "--target", dst_root, "--plan", plan_path,
    ]) == 0


def test_cli_merge_and_delete(spark, warehouse, tmp_path):
    _, src_root = warehouse
    upd_path = str(tmp_path / "upd.parquet")
    cat = SnapCatalog(src_root)
    first = cat.table("db", "orders_snap").read(spark).limit(3)
    first.withColumn("o_orderpriority", first["o_orderstatus"]).write.mode(
        "overwrite"
    ).parquet(upd_path)
    n_before = cat.table("db", "orders_snap").read(spark).count()
    assert main([
        "merge", "--warehouse", src_root, "--database", "db", "--table", "orders_snap",
        "--updates", upd_path, "--keys", "o_orderkey",
    ]) == 0
    assert cat.table("db", "orders_snap").read(spark).count() == n_before
    assert main([
        "delete", "--warehouse", src_root, "--database", "db", "--table", "orders_snap",
        "--where", "o_orderstatus = 'F'",
    ]) == 0
    remaining = cat.table("db", "orders_snap").read(spark)
    assert remaining.where("o_orderstatus = 'F'").count() == 0


def test_cli_tag_publish_diff(spark, warehouse, capsys):
    root, src_root = warehouse
    # tag the current snapshot of a table, then drop the tag
    assert main([
        "tag", "--warehouse", src_root, "--database", "db",
        "--table", "orders_snap", "--name", "release-1",
    ]) == 0
    cat = SnapCatalog(src_root)
    assert "release-1" in cat.table("db", "orders_snap").refs()
    assert main([
        "tag", "--warehouse", src_root, "--database", "db",
        "--table", "orders_snap", "--name", "release-1", "--drop",
    ]) == 0
    assert "release-1" not in cat.table("db", "orders_snap").refs()

    # stage a commit through the API, publish it through the CLI
    staged = cat.write(
        "db", "orders_snap",
        cat.table("db", "orders_snap").read(spark).limit(5),
        staged=True, wap_id="cli-audit",
    )
    head_before = cat.table("db", "orders_snap").current_snapshot().snapshot_id
    assert main([
        "publish", "--warehouse", src_root, "--database", "db",
        "--table", "orders_snap", "--snapshot-id", str(staged.snapshot_id),
    ]) == 0
    assert cat.table("db", "orders_snap").current_snapshot().snapshot_id != head_before

    # CDC diff across the published staged append: 5 added, 0 removed
    head_after = cat.table("db", "orders_snap").current_snapshot().snapshot_id
    assert main([
        "diff", "--warehouse", src_root, "--database", "db",
        "--table", "orders_snap",
        "--from-id", str(head_before), "--to-id", str(head_after),
    ]) == 0
    out = capsys.readouterr().out
    assert "0 removed, 5 added" in out


def test_cli_maintain_zorder(spark, tmp_path, capsys):
    cat = SnapCatalog(str(tmp_path / "zwh"))
    from pyspark.sql import functions as F
    cat.write("zdb", "t", spark.range(1024).select(
        (F.col("id") % 32).alias("a"), F.floor(F.col("id") / 32).cast("long").alias("b")))
    assert main([
        "maintain", "--warehouse", str(tmp_path / "zwh"),
        "--compact-zorder-by", "a,b",
    ]) == 0
    assert "z-ordered by ['a', 'b']" in capsys.readouterr().out
    assert cat.table("zdb", "t").read(spark).count() == 1024


def test_cli_maintain_binpack(spark, tmp_path, capsys):
    cat = SnapCatalog(str(tmp_path / "bwh"))
    cat.write("bdb", "t", spark.range(2000).coalesce(1))
    big = cat.table("bdb", "t").current_snapshot().files[0]
    for i in range(3):
        cat.write("bdb", "t", spark.range(9000 + i, 9001 + i).coalesce(1))
    assert main([
        "maintain", "--warehouse", str(tmp_path / "bwh"),
        "--compact-min-file-bytes", str(big.bytes),
    ]) == 0
    assert "binpack" in capsys.readouterr().out
    snap = cat.table("bdb", "t").current_snapshot()
    assert big.path in {f.path for f in snap.files}  # carried by reference
    assert cat.table("bdb", "t").read(spark).count() == 2003


def test_cli_corpus_build(spark, tmp_path, capsys):
    out_path = str(tmp_path / "corpus_summary.json")
    assert main([
        "corpus-build", "--sf-dir", SF_DIR,
        "--warehouse", str(tmp_path / "cwh"), "--out", out_path,
    ]) == 0
    with open(out_path) as f:
        summary = json.load(f)
    assert len(summary["batches"]) == 3
    assert summary["published_records"] == sum(
        b["accepted"] for b in summary["batches"]
    )
    assert summary["band_index_records"] == summary["published_records"] * 12
    assert 0 < summary["mixture_rows"] <= 200
    cat = SnapCatalog(str(tmp_path / "cwh"))
    assert sorted(cat.list_tables("corpus")) == ["band_index", "docs"]


def test_cli_rollback_and_orphans(spark, tmp_path, capsys):
    cat = SnapCatalog(str(tmp_path / "rwh"))
    cat.write("db", "t", spark.range(10).coalesce(1))
    cat.write("db", "t", spark.range(10, 30).coalesce(1))
    assert main([
        "rollback", "--warehouse", str(tmp_path / "rwh"),
        "--database", "db", "--table", "t", "--snapshot-id", "1",
    ]) == 0
    assert "rolled back to snapshot 1" in capsys.readouterr().out
    assert cat.table("db", "t").read(spark).count() == 10
    assert main([
        "maintain", "--warehouse", str(tmp_path / "rwh"), "--remove-orphans",
    ]) == 0
    assert "removed 0 orphan files" in capsys.readouterr().out


def test_cli_alter_schema_evolution(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    wh = str(tmp_path / "awh")
    cat = SnapCatalog(wh)
    cat.write(
        "db", "t",
        spark.range(10).select(
            F.col("id").cast("int").alias("id"),
            (F.col("id") * 2).alias("v"),
        ).coalesce(1),
    )
    assert main([
        "alter", "--warehouse", wh, "--database", "db", "--table", "t",
        "--rename", "v=value", "--widen", "id=bigint", "--add", "lang=string",
    ]) == 0
    out = capsys.readouterr().out
    assert "schema evolved in snapshot 2" in out
    assert "id bigint, value bigint, lang string" in out
    df = cat.table("db", "t").read(spark)
    assert df.columns == ["id", "value", "lang"]
    assert df.agg(F.sum("value")).collect()[0][0] == 90


def test_cli_mor_delete_merge_update(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    wh = str(tmp_path / "morwh")
    cat = SnapCatalog(wh)
    cat.write(
        "db", "t",
        spark.range(10).select("id", (F.col("id") * 2).alias("v")).coalesce(1),
    )
    keys_path = str(tmp_path / "morkeys")
    spark.createDataFrame([(3,), (4,)], "id long").coalesce(1).write.parquet(keys_path)
    assert main([
        "delete", "--warehouse", wh, "--database", "db", "--table", "t",
        "--mor-keys", keys_path, "--cpus", "4",
    ]) == 0
    assert "merge-on-read delete" in capsys.readouterr().out
    assert cat.table("db", "t").read(spark).count() == 8

    upd_path = str(tmp_path / "morupd")
    spark.createDataFrame([(5, 555), (20, 40)], "id long, v long").coalesce(1)\
        .write.parquet(upd_path)
    assert main([
        "merge", "--warehouse", wh, "--database", "db", "--table", "t",
        "--updates", upd_path, "--keys", "id", "--mor", "--cpus", "4",
    ]) == 0
    assert "merge-on-read committed" in capsys.readouterr().out
    got = {r["id"]: r["v"] for r in cat.table("db", "t").read(spark).collect()}
    assert got[5] == 555 and got[20] == 40 and len(got) == 9

    assert main([
        "update", "--warehouse", wh, "--database", "db", "--table", "t",
        "--where", "id = 6", "--set", "v=v+1000", "--cpus", "4",
    ]) == 0
    assert "update committed" in capsys.readouterr().out
    assert cat.table("db", "t").read(spark).where("id = 6").collect()[0]["v"] == 1012

    assert main([
        "delete", "--warehouse", wh, "--database", "db", "--table", "t",
    ]) == 2  # neither --where nor --mor-keys


def test_cli_changelog(spark, tmp_path, capsys):
    wh = str(tmp_path / "clwh")
    cat = SnapCatalog(wh)
    cat.write("db", "t", spark.range(10).coalesce(1))
    cat.write("db", "t", spark.range(10, 15).coalesce(1))
    cat.delete_where("db", "t", "id < 2")
    assert main([
        "changelog", "--warehouse", wh, "--database", "db", "--table", "t",
        "--cpus", "4",
    ]) == 0
    out = capsys.readouterr().out
    assert "15 inserts, 2 deletes" in out


def test_cli_branch_lifecycle(spark, tmp_path, capsys):
    cat = SnapCatalog(str(tmp_path / "bwh"))
    cat.write("db", "t", spark.range(10).coalesce(1))
    wh = str(tmp_path / "bwh")
    assert main([
        "branch", "--warehouse", wh, "--database", "db", "--table", "t",
        "--name", "dev",
    ]) == 0
    assert "branch 'dev' created at snapshot 1" in capsys.readouterr().out
    cat.write("db", "t", spark.range(10, 30).coalesce(1), branch="dev")
    assert cat.table("db", "t").read(spark).count() == 10
    assert main([
        "branch", "--warehouse", wh, "--database", "db", "--table", "t",
        "--name", "dev", "--fast-forward",
    ]) == 0
    assert "fast-forwarded" in capsys.readouterr().out
    assert cat.table("db", "t").read(spark).count() == 30


def test_cli_alter_partition_spec(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    wh = str(tmp_path / "pswh")
    cat = SnapCatalog(wh)
    cat.write(
        "db", "t",
        spark.range(8).select(
            "id",
            (F.col("id") % 2).cast("string").alias("bucket"),
        ).coalesce(1),
    )
    assert main([
        "alter", "--warehouse", wh, "--database", "db", "--table", "t",
        "--partition-by", "bucket",
    ]) == 0
    out = capsys.readouterr().out
    assert "partition spec evolved in snapshot 2" in out and "()->bucket" in out
    # refuses to combine with schema changes
    assert main([
        "alter", "--warehouse", wh, "--database", "db", "--table", "t",
        "--partition-by", "bucket", "--add", "x=string",
    ]) == 2
    cat.write("db", "t", spark.range(8, 12).select(
        "id", (F.col("id") % 2).cast("string").alias("bucket")).coalesce(1))
    tbl = cat.table("db", "t")
    assert tbl.current_snapshot().partition_spec == ["bucket"]
    assert tbl.read(spark).count() == 12


def test_cli_mor_position_delete(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    wh = str(tmp_path / "poswh")
    cat = SnapCatalog(wh)
    cat.write(
        "db", "t",
        spark.range(10).select("id", (F.col("id") * 2).alias("v")).coalesce(1),
    )
    assert main([
        "delete", "--warehouse", wh, "--database", "db", "--table", "t",
        "--where", "v >= 10", "--mor", "--cpus", "4",
    ]) == 0
    out = capsys.readouterr().out
    assert "merge-on-read delete" in out and "5 positions, 0 rewrites" in out
    assert sorted(r["id"] for r in cat.table("db", "t").read(spark).collect()) == [
        0, 1, 2, 3, 4]


def test_cli_analyze(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    wh = str(tmp_path / "anwh")
    cat = SnapCatalog(wh)
    cat.write("db", "t", spark.range(20).select(
        "id", (F.col("id") % 4).alias("g")).coalesce(1))
    assert main([
        "analyze", "--warehouse", wh, "--database", "db", "--table", "t",
        "--columns", "g", "--cpus", "4",
    ]) == 0
    out = capsys.readouterr().out
    assert "analyzed 1 columns at snapshot 1 (20 rows)" in out
    assert cat.table("db", "t").column_stats()["columns"]["g"]["null_count"] == 0


def test_cli_alter_partition_transform_spec(spark, tmp_path, capsys):
    """Two-argument transforms like bucket(4,id) must survive the
    CLI's comma split (depth-aware, same as parenthesized types)."""
    from pyspark.sql import functions as F

    wh = str(tmp_path / "ptwh")
    cat = SnapCatalog(wh)
    cat.write("db", "t", spark.range(8).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("s"), F.col("id") % 2).alias("tag")).coalesce(1))
    assert main([
        "alter", "--warehouse", wh, "--database", "db", "--table", "t",
        "--partition-by", "bucket(4, id),truncate(1, tag)",
    ]) == 0
    assert "partition spec evolved" in capsys.readouterr().out
    cat.write("db", "t", spark.range(8, 16).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("s"), F.col("id") % 2).alias("tag")).coalesce(1))
    newest = max(cat.table("db", "t").current_snapshot().files,
                 key=lambda f: f.path)
    assert "id_bucket=" in newest.path and "tag_trunc=s" in newest.path
    assert cat.table("db", "t").read(spark).count() == 16


def test_cli_alter_add_parenthesized_type(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    wh = str(tmp_path / "decwh")
    cat = SnapCatalog(wh)
    cat.write("db", "t", spark.range(4).select("id", (F.col("id") * 2).alias("v")).coalesce(1))
    assert main([
        "alter", "--warehouse", wh, "--database", "db", "--table", "t",
        "--add", "amt=decimal(12,2),note=string",
    ]) == 0
    assert "amt decimal(12,2)" in capsys.readouterr().out
    assert cat.table("db", "t").read(spark).columns == ["id", "v", "amt", "note"]


def test_cli_merge_mor_into_missing_table(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    wh = str(tmp_path / "mmwh")
    upd = str(tmp_path / "u")
    spark.range(3).select("id", (F.col("id") + 100).alias("v")).coalesce(1).write.parquet(upd)
    # falls back to a plain append commit — must not crash on summary keys
    assert main([
        "merge", "--warehouse", wh, "--database", "db", "--table", "fresh",
        "--updates", upd, "--keys", "id", "--mor", "--cpus", "4",
    ]) == 0
    assert "0 delete files" in capsys.readouterr().out
    assert SnapCatalog(wh).table("db", "fresh").read(spark).count() == 3


def test_cli_maintain_analyze(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    wh = str(tmp_path / "mawh")
    cat = SnapCatalog(wh)
    cat.write("db", "t", spark.range(12).select("id", (F.col("id") % 3).alias("g")).coalesce(1))
    assert main(["--cpus", "4", "maintain", "--warehouse", wh, "--analyze"]) == 0
    assert "db.t: analyzed" in capsys.readouterr().out
    assert cat.table("db", "t").column_stats()["row_count"] == 12


def test_cli_inspect_metadata_tables(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    wh = str(tmp_path / "inswh")
    cat = SnapCatalog(wh)
    cat.write("db", "t", spark.range(6).select("id", (F.col("id") % 2).alias("p")).coalesce(1))
    cat.write("db", "t", spark.range(6, 9).select("id", (F.col("id") % 2).alias("p")).coalesce(1))
    for kind, token in [("snapshots", "append"), ("manifests", "added_files"),
                        ("all-files", "referencing_snapshots"), ("stats", "ndv")]:
        assert main(["inspect", "--warehouse", wh, "--database", "db",
                     "--table", "t", "--table-kind", kind, "--cpus", "4"]) == 0
        assert token in capsys.readouterr().out, kind


def test_cli_query_explain(spark, capsys):
    assert main([
        "--cpus", "4", "query", "--name", "pricing_summary",
        "--sf-dir", "/root/testdata/sf0.001", "--explain",
    ]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "Scan parquet" in out


def test_cli_view_refresh(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    wh = str(tmp_path / "wh")
    cat = SnapCatalog(wh)
    cat.write("db", "src", spark.createDataFrame(
        [("a", 1), ("a", 5), ("b", 3)], "g string, v long").coalesce(1))
    base = ["view-refresh", "--warehouse", wh, "--database", "db",
            "--table", "src", "--view", "rollup", "--keys", "g",
            "--cols", "v"]
    assert main(base) == 0
    got = {r["g"]: (r["group_count"], r["sum_v"])
           for r in cat.table("db", "rollup").read(spark).collect()}
    assert got == {"a": (2, 6), "b": (1, 3)}
    # no new commits → no-op message
    assert main(base) == 0
    assert "already current" in capsys.readouterr().out
    # a COW delete folds incrementally; minmax kind maintains its own view
    cat.delete_where("db", "src", F.col("v") == 5)
    assert main(base) == 0
    got = {r["g"]: (r["group_count"], r["sum_v"])
           for r in cat.table("db", "rollup").read(spark).collect()}
    assert got == {"a": (1, 1), "b": (1, 3)}
    assert main([*base[:8], "mm_view", *base[9:], "--kind", "minmax"]) == 0
    got = {r["g"]: (r["group_count"], r["min_v"], r["max_v"])
           for r in cat.table("db", "mm_view").read(spark).collect()}
    assert got == {"a": (1, 1, 1), "b": (1, 3, 3)}
    # distinct kind: stored view is the counted aux; CLI prints derived
    assert main([*base[:8], "d_view", *base[9:], "--kind", "distinct"]) == 0
    got = {(r["g"], r["v"]): r["group_count"]
           for r in cat.table("db", "d_view").read(spark).collect()}
    assert got == {("a", 1): 1, ("b", 3): 1}
    # same aux serves exact quantiles at read time
    assert main([*base[:8], "d_view", *base[9:], "--kind", "distinct",
                 "--quantiles", "0.5"]) == 0
    assert "p50_v" in capsys.readouterr().out


def test_cli_topk_view_refresh(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    wh = str(tmp_path / "wh")
    cat = SnapCatalog(wh)
    cat.write("db", "src", spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("a", 3, 30), ("b", 4, 5)],
        "g string, id long, m long").coalesce(1))
    base = ["topk-view-refresh", "--warehouse", wh, "--database", "db",
            "--table", "src", "--view", "board", "--keys", "g",
            "--metric", "m", "--id-col", "id", "-k", "2"]
    assert main(base) == 0
    got = {(r["g"], r["id"]): r["rk"]
           for r in cat.table("db", "board").read(spark).collect()}
    assert got == {("a", 3): 1, ("a", 2): 2, ("b", 4): 1}
    assert main(base) == 0
    assert "already current" in capsys.readouterr().out
    cat.delete_where("db", "src", F.col("id") == 3)  # rescan path
    assert main(base) == 0
    got = {(r["g"], r["id"]): r["rk"]
           for r in cat.table("db", "board").read(spark).collect()}
    assert got == {("a", 2): 1, ("a", 1): 2, ("b", 4): 1}


def test_cli_join_view_refresh(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    wh = str(tmp_path / "wh")
    cat = SnapCatalog(wh)
    cat.write("db", "a", spark.createDataFrame(
        [(1, "x"), (2, "y")], "ok long, p string"))
    cat.write("db", "b", spark.createDataFrame(
        [(1, 10), (1, 5), (2, 7)], "ok long, qty long").coalesce(1))
    base = ["join-view-refresh", "--warehouse", wh, "--database", "db",
            "--table", "a", "--b-table", "b", "--view", "jv",
            "--on", "ok", "--keys", "p", "--cols", "qty"]
    assert main(base) == 0
    got = {r["p"]: (r["group_count"], r["sum_qty"])
           for r in cat.table("db", "jv").read(spark).collect()}
    assert got == {"x": (2, 15), "y": (1, 7)}
    assert main(base) == 0
    assert "already current" in capsys.readouterr().out
    # commits on both sides fold in one refresh
    cat.delete_where("db", "b", F.col("qty") == 5)
    cat.write("db", "a", spark.createDataFrame([(3, "y")], "ok long, p string"))
    assert main(base) == 0
    got = {r["p"]: (r["group_count"], r["sum_qty"])
           for r in cat.table("db", "jv").read(spark).collect()}
    assert got == {"x": (1, 10), "y": (1, 7)}


def test_cli_topk_join_view_refresh(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    wh = str(tmp_path / "wh")
    cat = SnapCatalog(wh)
    cat.write("db", "a", spark.createDataFrame(
        [(1, "x"), (2, "y")], "ok long, p string"))
    cat.write("db", "b", spark.createDataFrame(
        [(1, 10, 100), (1, 11, 40), (1, 12, 60), (2, 20, 7)],
        "ok long, id long, m long").coalesce(1))
    base = ["topk-join-view-refresh", "--warehouse", wh, "--database", "db",
            "--table", "a", "--b-table", "b", "--view", "jboard",
            "--on", "ok", "--keys", "p", "--metric", "m",
            "--id-cols", "ok,id", "-k", "2"]
    assert main(base) == 0
    got = {(r["p"], r["id"]): r["rk"]
           for r in cat.table("db", "jboard").read(spark).collect()}
    assert got == {("x", 10): 1, ("x", 12): 2, ("y", 20): 1}
    assert main(base) == 0
    assert "already current" in capsys.readouterr().out
    # commits on both sides fold in one refresh: kill x's #1 (rescan
    # resurrects id=11) and append a new y fact
    cat.delete_where("db", "b", F.col("id") == 10)
    cat.write("db", "b", spark.createDataFrame(
        [(2, 21, 9)], "ok long, id long, m long"))
    assert main(base) == 0
    got = {(r["p"], r["id"]): r["rk"]
           for r in cat.table("db", "jboard").read(spark).collect()}
    assert got == {("x", 12): 1, ("x", 11): 2, ("y", 21): 1, ("y", 20): 2}


@pytest.mark.full  # deep soak — round-close tier (SPARK_GRAFT_FULL_TESTS=1)
def test_cli_join_chain_view_refresh(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    wh = str(tmp_path / "wh")
    cat = SnapCatalog(wh)
    cat.write("db", "cust", spark.createDataFrame(
        [(1, "x"), (2, "y")], "ck long, nat string"))
    cat.write("db", "ords", spark.createDataFrame(
        [(1, 10), (2, 20)], "ck long, ok long").coalesce(1))
    cat.write("db", "items", spark.createDataFrame(
        [(10, 3), (10, 4), (20, 7)], "ok long, qty long").coalesce(1))
    base = ["join-chain-view-refresh", "--warehouse", wh, "--database", "db",
            "--tables", "cust,ords,items", "--view", "cv",
            "--on", "ck", "--on", "ok", "--keys", "nat", "--cols", "qty"]
    assert main(base) == 0
    got = {r["nat"]: (r["group_count"], r["sum_qty"])
           for r in cat.table("db", "cv").read(spark).collect()}
    assert got == {"x": (2, 7), "y": (1, 7)}
    assert main(base) == 0
    assert "already current" in capsys.readouterr().out
    # commits at both ends of the chain fold in one refresh
    cat.delete_where("db", "cust", F.col("ck") == 2)
    cat.write("db", "items", spark.createDataFrame(
        [(10, 1)], "ok long, qty long"))
    assert main(base) == 0
    got = {r["nat"]: (r["group_count"], r["sum_qty"])
           for r in cat.table("db", "cv").read(spark).collect()}
    assert got == {"x": (3, 8)}


def test_cli_query_aggregate_navigation(spark, tmp_path, capsys):
    from apache_iceberg_tables_migration_tool_spark.streaming.pipelines import (
        refresh_view_changelog,
    )

    wh = str(tmp_path / "wh")
    cat = SnapCatalog(wh)
    cat.write("db", "src", spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 7)], "p string, v long").coalesce(1))
    refresh_view_changelog(
        spark, cat, "db", "src", "db", "rollup", keys=["p"], sum_cols=["v"]
    )
    base = ["query-aggregate", "--warehouse", wh, "--database", "db",
            "--table", "src", "--keys", "p", "--aggs", "count:*:n,sum:v:sv"]
    assert main(base) == 0
    out = capsys.readouterr().out
    assert "answered from materialized view db.rollup" in out
    # stale → base path, announced as such
    cat.write("db", "src", spark.createDataFrame([("b", 1)], "p string, v long"))
    assert main(base) == 0
    assert "computed from the base" in capsys.readouterr().out
    # quantile mode through the distinct aux
    refresh_view_changelog(
        spark, cat, "db", "src", "db", "aux", keys=["p"], distinct_col="v"
    )
    assert main(["query-aggregate", "--warehouse", wh, "--database", "db",
                 "--table", "src", "--keys", "p", "--quantiles", "0.5",
                 "--col", "v"]) == 0
    out = capsys.readouterr().out
    assert "answered from materialized view db.aux" in out and "p50_v" in out


def test_cli_view_refresh_auto_and_refresh_stale(spark, tmp_path, capsys):
    from apache_iceberg_tables_migration_tool_spark.streaming.pipelines import (
        refresh_view_changelog,
    )

    wh = str(tmp_path / "wh")
    cat = SnapCatalog(wh)
    cat.write("db", "src", spark.createDataFrame(
        [("a", 10), ("b", 7)], "p string, v long").coalesce(1))
    refresh_view_changelog(
        spark, cat, "db", "src", "db", "rollup", keys=["p"], sum_cols=["v"]
    )
    cat.write("db", "src", spark.createDataFrame([("a", 5)], "p string, v long"))
    # auto-refresh from the stamped definition alone
    assert main(["view-refresh-auto", "--warehouse", wh, "--database", "db",
                 "--view", "rollup"]) == 0
    assert "folded" in capsys.readouterr().out
    got = {r["p"]: r["sum_v"]
           for r in cat.table("db", "rollup").read(spark).collect()}
    assert got == {"a": 15, "b": 7}
    # --refresh-stale folds before answering instead of base fallback
    cat.write("db", "src", spark.createDataFrame([("b", 1)], "p string, v long"))
    assert main(["query-aggregate", "--warehouse", wh, "--database", "db",
                 "--table", "src", "--keys", "p", "--aggs", "sum:v:sv",
                 "--refresh-stale"]) == 0
    assert "answered from materialized view db.rollup" in capsys.readouterr().out


def test_cli_sync_incremental(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    src = SnapCatalog(str(tmp_path / "src"))
    src.write("db", "t", spark.range(0, 10).select("id"))
    src.write("db", "t", spark.range(10, 20).select("id"))
    args = ["sync", "--source", str(tmp_path / "src"),
            "--target", str(tmp_path / "dst")]
    assert main(args) == 0
    assert "replayed 2 commit(s)" in capsys.readouterr().out
    # source evolves → only the delta replays
    src.write("db", "t", spark.range(20, 25).select("id"))
    src.delete_where("db", "t", F.col("id") % 3 == 0)
    assert main(args) == 0
    assert "replayed 2 commit(s)" in capsys.readouterr().out
    dst = SnapCatalog(str(tmp_path / "dst"))
    assert dst.table("db", "t").read(spark).count() == \
        src.table("db", "t").read(spark).count()
    # idempotent
    assert main(args) == 0
    assert "replayed 0 commit(s)" in capsys.readouterr().out


def test_cli_sql_time_travel(spark, tmp_path, capsys):
    cat = SnapCatalog(str(tmp_path / "wh"))
    cat.write("db", "t", spark.range(0, 10).select("id"))
    cat.write("db", "t", spark.range(10, 20).select("id"))
    assert main([
        "sql", "--warehouse", str(tmp_path / "wh"),
        "--query", "SELECT COUNT(*) AS n FROM db.t VERSION AS OF 1",
    ]) == 0
    out = capsys.readouterr().out
    assert "10" in out


def test_cli_maintain_auto(spark, tmp_path, capsys):
    cat = SnapCatalog(str(tmp_path / "wh"))
    for i in range(3):
        cat.write("db", "t", spark.range(i * 5, (i + 1) * 5).select("id"))
    cat.set_properties("db", "t", {"maintain.expire.keep-last": "1"})
    assert main(["maintain", "--warehouse", str(tmp_path / "wh"), "--auto"]) == 0
    assert "expire" in capsys.readouterr().out
    assert len(cat.table("db", "t").snapshots()) == 1


def test_cli_scan_report(spark, tmp_path, capsys):
    from pyspark.sql import functions as F2

    cat = SnapCatalog(str(tmp_path / "wh"))
    cat.create_table("db", "t", "id bigint, name string",
                     properties={"bloom.columns": "id"})
    cat.write("db", "t", spark.range(0, 100, 2).select(
        "id", F2.concat(F2.lit("u"), "id").alias("name")).repartition(2))
    cat.write("db", "t", spark.range(1, 100, 2).select(
        "id", F2.concat(F2.lit("u"), "id").alias("name")).repartition(2))
    assert main([
        "scan-report", "--warehouse", str(tmp_path / "wh"),
        "--database", "db", "--table", "t", "--where", "id=4",
    ]) == 0
    out = capsys.readouterr().out
    assert "skipped" in out and "bloom:id" in out


def test_cli_export(spark, tmp_path, capsys):
    cat = SnapCatalog(str(tmp_path / "wh"))
    cat.write("db", "t", spark.range(0, 12).select("id"))
    assert main([
        "export", "--warehouse", str(tmp_path / "wh"),
        "--database", "db", "--table", "t", "--out", str(tmp_path / "exp"),
    ]) == 0
    out = capsys.readouterr().out
    assert '"records": 12' in out
    assert spark.read.parquet(str(tmp_path / "exp" / "data")).count() == 12


def test_cli_list_views(spark, tmp_path, capsys):
    from apache_iceberg_tables_migration_tool_spark.streaming.pipelines import (
        refresh_view_changelog,
    )

    cat = SnapCatalog(str(tmp_path / "wh"))
    from pyspark.sql import functions as F2

    cat.write("db", "t", spark.range(0, 20).select(
        "id", (F2.col("id") % 3).alias("k")))
    refresh_view_changelog(
        spark, cat, "db", "t", "db", "t_rollup", keys=["k"], sum_cols=["id"]
    )
    assert main(["list-views", "--warehouse", str(tmp_path / "wh")]) == 0
    out = capsys.readouterr().out
    assert "db.t_rollup: kind=sum over [db.t]" in out and "fresh" in out
    # source moves → the view shows STALE
    cat.write("db", "t", spark.range(20, 25).select(
        "id", (F2.col("id") % 3).alias("k")))
    main(["list-views", "--warehouse", str(tmp_path / "wh")])
    assert "STALE" in capsys.readouterr().out
