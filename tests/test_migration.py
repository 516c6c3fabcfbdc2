"""Migration pipeline: plan resolution, skip semantics, execution,
verification, report rollups, JSON interchange round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_iceberg_tables_migration_tool_spark.plans import (
    MigrationPlan,
    collect_plan,
    migrate,
    summarize_report,
    verify,
)
from apache_iceberg_tables_migration_tool_spark.plans.reports import render_text
from apache_iceberg_tables_migration_tool_spark.plans.verifier import schema_diff
from apache_iceberg_tables_migration_tool_spark.queries.migration import (
    build_source_warehouse,
)
from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog
from tests.conftest import SF_DIR

T = [f"2024-06-0{i}T00:00:00.000000+00:00" for i in range(1, 8)]


@pytest.fixture()
def warehouses(spark, tmp_path):
    src = build_source_warehouse(spark, SF_DIR, str(tmp_path))
    dst = SnapCatalog(str(tmp_path / "dst"))
    return src, dst


def test_plan_resolves_as_of_and_skips(warehouses):
    src, _ = warehouses
    # as-of before any orders_snap overwrite but after lineitem commit 2
    plan = collect_plan(src, as_of="2024-06-02T12:00:00+00:00")
    by_name = {t.table_name: t for t in plan.tables}
    assert by_name["lineitem_snap"].snapshot_id == 2  # 2 of 3 commits ≤ T
    assert by_name["orders_snap"].snapshot_id == 1  # before the overwrite
    assert by_name["lineitem_snap"].partition_spec == ["l_shipmonth"]
    # as-of before everything → all tables skipped with reasons
    empty = collect_plan(src, as_of="2024-01-01T00:00:00+00:00")
    assert not empty.tables
    assert len(empty.skipped) == 3
    assert all("no snapshot" in s["reason"] for s in empty.skipped)


def test_plan_json_roundtrip(tmp_path, warehouses):
    src, _ = warehouses
    plan = collect_plan(src, as_of="2024-06-05T00:00:00+00:00")
    p = str(tmp_path / "plan.json")
    plan.to_json(p)
    back = MigrationPlan.from_json(p)
    assert [t.table_name for t in back.tables] == [t.table_name for t in plan.tables]
    assert back.tables[0].schema_ddl == plan.tables[0].schema_ddl


def test_migrate_and_verify_all_match(spark, warehouses):
    src, dst = warehouses
    plan = collect_plan(src, as_of="2024-06-05T00:00:00+00:00")
    mig = migrate(spark, plan, src, dst, committed_at=T[5])
    assert {r["status"] for r in mig.collect()} == {"success"}
    ver = verify(spark, plan, src, dst)
    rows = ver.collect()
    assert all(r["status"] == "success" for r in rows), rows
    assert all(r["checksum_match"] for r in rows)
    # partition spec survived (G2): target table is really partitioned
    assert dst.table("db", "lineitem_snap").partition_spec() == ["l_shipmonth"]
    # records came from manifests and match the source snapshot
    by = {r["table_name"]: r for r in rows}
    assert by["lineitem_snap"].src_records == by["lineitem_snap"].dst_records


def test_verify_detects_tampering(spark, warehouses):
    src, dst = warehouses
    plan = collect_plan(src)
    plan.tables = [t for t in plan.tables if t.table_name == "orders_snap"]
    migrate(spark, plan, src, dst, committed_at=T[5])
    # tamper: drop rows in the target via a new overwrite commit
    tampered = dst.table("db", "orders_snap").read(spark).where(F.col("o_orderkey") % 10 != 0)
    dst.write("db", "orders_snap", tampered, mode="overwrite", committed_at=T[6])
    row = verify(spark, plan, src, dst).collect()[0]
    assert row["status"] == "mismatch"
    assert not row["count_match"]
    assert not row["checksum_match"]
    assert row["schema_match"]  # schema untouched


def test_schema_diff_catches_type_change(spark):
    from pyspark.sql import types as Ty

    a = Ty._parse_datatype_string("id bigint, v double")
    b = Ty._parse_datatype_string("id bigint, v string")
    d = schema_diff(spark, a, b).collect()
    assert {(r["col_name"], r["side"]) for r in d} == {
        ("v", "source_only"), ("v", "target_only")
    }


def test_report_rollup_has_grand_total(spark, warehouses):
    src, dst = warehouses
    plan = collect_plan(src)
    rep = migrate(spark, plan, src, dst, committed_at=T[5])
    summary = summarize_report(rep)
    rows = summary.collect()
    total = [r for r in rows if r["database"] is None]
    assert len(total) == 1
    assert total[0]["n_tables"] == 3
    assert total[0]["n_success"] == 3
    text = render_text(summary)
    assert "TOTAL" in text


def test_incremental_read_returns_only_delta(spark, warehouses):
    src, _ = warehouses
    t = src.table("db", "lineitem_snap")
    full2 = t.read(spark, snapshot_id=2).count()
    full1 = t.read(spark, snapshot_id=1).count()
    inc = t.read_incremental(spark, 1, 2)
    assert inc.count() == full2 - full1
    # delta + snapshot-1 state == snapshot-2 state (row-set equality)
    s2 = t.read(spark, snapshot_id=2)
    union = t.read(spark, snapshot_id=1).unionByName(inc)
    assert union.exceptAll(s2).isEmpty() and s2.exceptAll(union).isEmpty()


def test_incremental_read_refuses_overwrite_range(spark, warehouses):
    src, _ = warehouses
    t = src.table("db", "orders_snap")  # snapshot 2 is an overwrite
    with pytest.raises(ValueError, match="non-append"):
        t.read_incremental(spark, 1, 2)


def test_history_replay_preserves_snapshots(spark, warehouses):
    from apache_iceberg_tables_migration_tool_spark.plans import migrate_history

    src, dst = warehouses
    plan = collect_plan(src)  # latest snapshot of every table
    report = migrate_history(spark, plan, src, dst)
    assert {r["status"] for r in report.collect()} == {"success"}

    for tbl in ("lineitem_snap", "orders_snap", "typed_snap"):
        s_snaps = src.table("db", tbl).snapshots()
        d_snaps = dst.table("db", tbl).snapshots()
        assert len(d_snaps) == len(s_snaps), tbl
        for ss, ds in zip(s_snaps, d_snaps):
            assert ds.committed_at == ss.committed_at, tbl
            assert ds.operation == ss.operation, tbl
            assert ds.total_records == ss.total_records, (tbl, ss.snapshot_id)
        # time travel works at EVERY historical point, not just the last
        def comparable(df):
            # EXCEPT rejects MAP columns → stringify complex types
            return df.select(
                *[
                    F.to_json(c).alias(c)
                    if df.schema[c].dataType.typeName() in ("map", "struct", "array")
                    else F.col(c)
                    for c in df.columns
                ]
            )

        for ss, ds in zip(s_snaps, d_snaps):
            a = comparable(src.table("db", tbl).read(spark, snapshot_id=ss.snapshot_id))
            b = comparable(dst.table("db", tbl).read(spark, snapshot_id=ds.snapshot_id))
            assert a.count() == b.count()
            assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_properties_roundtrip_and_drift_detection(spark, warehouses):
    """Table properties are first-class metadata: they survive the
    migrate create path, verify as properties_match, and a post-copy
    drift on the target flips the flag (the reference collects
    properties per table, 2_collect_database_schema_info.py:176-184)."""
    src, dst = warehouses
    assert src.table("db", "lineitem_snap").properties() == {
        "comment": "lineitem in 3 partitioned appends",
        "write.format": "parquet",
    }
    plan = collect_plan(src)
    by_name = {t.table_name: t for t in plan.tables}
    assert by_name["orders_snap"].properties == {"owner": "etl", "retention.days": "30"}

    migrate(spark, plan, src, dst, committed_at=T[5])
    assert dst.table("db", "orders_snap").properties() == {
        "owner": "etl", "retention.days": "30",
    }
    ver = {r["table_name"]: r for r in verify(spark, plan, src, dst).collect()}
    assert all(r["properties_match"] for r in ver.values())

    # drift: retention changed on the target only → flag flips
    dst.set_properties("db", "orders_snap", {"retention.days": "7"})
    ver2 = {r["table_name"]: r for r in verify(spark, plan, src, dst).collect()}
    assert ver2["orders_snap"]["properties_match"] is False
    assert ver2["orders_snap"]["status"] == "mismatch"
    assert ver2["lineitem_snap"]["properties_match"] is True

    # unset restores parity
    dst.set_properties("db", "orders_snap", {"retention.days": "30"})
    ver3 = {r["table_name"]: r for r in verify(spark, plan, src, dst).collect()}
    assert ver3["orders_snap"]["properties_match"] is True


def test_history_replay_carries_properties(spark, warehouses):
    """History-preserving migration must also land table properties,
    including for histories with no explicit create snapshot."""
    from apache_iceberg_tables_migration_tool_spark.plans import migrate_history

    src, dst = warehouses
    plan = collect_plan(src)
    migrate_history(spark, plan, src, dst).collect()
    assert dst.table("db", "lineitem_snap").properties() == {
        "comment": "lineitem in 3 partitioned appends",
        "write.format": "parquet",
    }


def test_foreign_warehouse_entries_skipped_with_warning(spark, tmp_path, warehouses):
    """A junk directory / stray file in the warehouse is not a table:
    planning must skip it with a warning and record it in the plan's
    skipped list (reference skips non-Iceberg providers,
    2_collect_database_schema_info.py:162-171), never crash."""
    import os
    import warnings

    src, dst = warehouses
    junk_dir = os.path.join(src.warehouse, "db", "_spark_staging")
    os.makedirs(os.path.join(junk_dir, "whatever"))
    with open(os.path.join(src.warehouse, "db", "README.txt"), "w") as f:
        f.write("not a table")

    assert "_spark_staging" not in src.list_tables("db")
    assert src.list_foreign_entries("db") == ["README.txt", "_spark_staging"]

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        plan = collect_plan(src)
    assert {t.table_name for t in plan.tables} == {
        "lineitem_snap", "orders_snap", "typed_snap",
    }
    skipped = {s["table_name"]: s["reason"] for s in plan.skipped}
    assert "_spark_staging" in skipped and "README.txt" in skipped
    assert all("not a snapshot-catalog table" in r for r in skipped.values())
    assert any("_spark_staging" in str(x.message) for x in w)

    # the full pipeline runs clean around the junk
    rep = migrate(spark, plan, src, dst, committed_at=T[5])
    assert {r["status"] for r in rep.collect()} == {"success"}


# ---------------------------------------------------------------------------
# Incremental cross-catalog sync (round 8)
# ---------------------------------------------------------------------------


def _sync_fixture_catalogs(spark, tmp_path):
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

    src = SnapCatalog(str(tmp_path / "src"))
    dst = SnapCatalog(str(tmp_path / "dst"))
    df = spark.range(0, 20).select("id", (F.col("id") * 2).alias("v"))
    src.write("db", "t", df.where(F.col("id") < 10))
    src.write("db", "t", df.where(F.col("id") >= 10))
    return src, dst


def test_sync_history_initial_and_incremental(spark, tmp_path):
    from apache_iceberg_tables_migration_tool_spark.plans import sync_history
    from apache_iceberg_tables_migration_tool_spark.operators.integrity import table_checksum

    src, dst = _sync_fixture_catalogs(spark, tmp_path)
    assert sync_history(spark, src, dst, "db", "t") == 2  # full mirror
    assert sync_history(spark, src, dst, "db", "t") == 0  # idempotent

    # source evolves: append + COW delete + append → one incremental sync
    more = spark.range(20, 30).select("id", (F.col("id") * 2).alias("v"))
    src.write("db", "t", more)
    src.delete_where("db", "t", F.col("id") % 5 == 0)
    src.write("db", "t", spark.range(30, 35).select("id", (F.col("id") * 2).alias("v")))
    assert sync_history(spark, src, dst, "db", "t") == 3
    s_tbl, d_tbl = src.table("db", "t"), dst.table("db", "t")
    assert table_checksum(s_tbl.read(spark)) == table_checksum(d_tbl.read(spark))
    # history shape mirrors: operations and commit times line up
    s_ops = [(s.operation, s.committed_at) for s in s_tbl.main_chain()]
    d_ops = [(s.operation, s.committed_at) for s in d_tbl.main_chain()]
    assert s_ops == d_ops
    assert sync_history(spark, src, dst, "db", "t") == 0


def test_sync_history_refuses_foreign_and_diverged_targets(spark, tmp_path):
    from apache_iceberg_tables_migration_tool_spark.plans import sync_history

    src, dst = _sync_fixture_catalogs(spark, tmp_path)
    # foreign target (no stamps)
    dst.write("db", "t", spark.range(0, 3).select("id", F.col("id").alias("v")))
    with pytest.raises(ValueError, match="not a sync replica"):
        sync_history(spark, src, dst, "db", "t")

    # diverged replica (local commit on the mirror)
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog
    dst2 = SnapCatalog(str(tmp_path / "dst2"))
    sync_history(spark, src, dst2, "db", "t")
    dst2.write("db", "t", spark.range(50, 52).select("id", F.col("id").alias("v")))
    with pytest.raises(ValueError, match="diverged"):
        sync_history(spark, src, dst2, "db", "t")


def test_sync_history_watermark_expired_from_source(spark, tmp_path):
    from apache_iceberg_tables_migration_tool_spark.plans import sync_history

    src, dst = _sync_fixture_catalogs(spark, tmp_path)
    sync_history(spark, src, dst, "db", "t")
    src.write("db", "t", spark.range(20, 25).select("id", F.col("id").alias("v")))
    src.write("db", "t", spark.range(25, 28).select("id", F.col("id").alias("v")))
    # expire drops the watermark commit from the source's log
    src.expire_snapshots("db", "t", keep_last=1)
    with pytest.raises(LookupError, match="no longer in the source history"):
        sync_history(spark, src, dst, "db", "t")


def test_sync_history_replays_rollback_as_state(spark, tmp_path):
    from apache_iceberg_tables_migration_tool_spark.operators.integrity import (
        table_checksum,
    )
    from apache_iceberg_tables_migration_tool_spark.plans import sync_history

    src, dst = _sync_fixture_catalogs(spark, tmp_path)
    sync_history(spark, src, dst, "db", "t")
    first = src.table("db", "t").main_chain()[0].snapshot_id
    src.write("db", "t", spark.range(20, 25).select("id", F.col("id").alias("v")))
    src.rollback("db", "t", first)
    # the rollback commit itself replays (as a full-state overwrite),
    # so the mirror converges to the rolled-back state
    assert sync_history(spark, src, dst, "db", "t") == 2
    assert table_checksum(src.table("db", "t").read(spark)) == table_checksum(
        dst.table("db", "t").read(spark)
    )


def test_sync_history_properties_mirror(spark, tmp_path):
    from apache_iceberg_tables_migration_tool_spark.plans import sync_history

    src, dst = _sync_fixture_catalogs(spark, tmp_path)
    src.set_properties("db", "t", {"owner": "alice", "tier": "gold"})
    sync_history(spark, src, dst, "db", "t")
    assert dst.table("db", "t").properties() == {"owner": "alice", "tier": "gold"}
    # property changes (including unset) mirror on the next sync
    src.set_properties("db", "t", {"tier": None, "owner": "bob"})
    src.write("db", "t", spark.range(20, 22).select("id", F.col("id").alias("v")))
    sync_history(spark, src, dst, "db", "t")
    assert dst.table("db", "t").properties() == {"owner": "bob"}


def test_sync_history_replays_schema_evolution(spark, tmp_path):
    from apache_iceberg_tables_migration_tool_spark.plans import sync_history

    src, dst = _sync_fixture_catalogs(spark, tmp_path)
    sync_history(spark, src, dst, "db", "t")
    # metadata-only rename + an append under the new schema
    src.alter_table("db", "t", rename_columns={"v": "value"})
    src.write(
        "db", "t",
        spark.range(20, 25).select("id", (F.col("id") * 2).alias("value")),
    )
    assert sync_history(spark, src, dst, "db", "t") == 2
    d_tbl = dst.table("db", "t")
    assert [f.name for f in d_tbl.schema().fields] == ["id", "value"]
    assert d_tbl.read(spark).count() == 25


def test_maintain_sync_stream(spark, tmp_path):
    from apache_iceberg_tables_migration_tool_spark.operators.integrity import (
        table_checksum,
    )
    from apache_iceberg_tables_migration_tool_spark.streaming.pipelines import (
        maintain_sync,
    )

    src, dst = _sync_fixture_catalogs(spark, tmp_path)

    def drain():
        maintain_sync(
            spark, src, dst, "db", "t", checkpoint_dir=str(tmp_path / "ckpt")
        ).awaitTermination()

    drain()  # initial mirror via the synchronous pre-sync
    assert dst.table("db", "t").read(spark).count() == 20
    src.write("db", "t", spark.range(20, 30).select("id", F.col("id").alias("v")))
    src.delete_where("db", "t", F.col("id") % 4 == 2)
    drain()
    assert table_checksum(src.table("db", "t").read(spark)) == table_checksum(
        dst.table("db", "t").read(spark)
    )


def test_sync_replays_delete_as_equality_delta(spark, tmp_path):
    """A pure COW delete on the source must reach the mirror as an
    O(delta) merge-on-read equality delete — zero data files written —
    not a full-state rewrite."""
    from apache_iceberg_tables_migration_tool_spark.operators.integrity import (
        table_checksum,
    )
    from apache_iceberg_tables_migration_tool_spark.plans import sync_history

    src, dst = _sync_fixture_catalogs(spark, tmp_path)
    sync_history(spark, src, dst, "db", "t")
    src.delete_where("db", "t", F.col("id") % 4 == 1)
    assert sync_history(spark, src, dst, "db", "t") == 1
    d_head = dst.table("db", "t").current_snapshot()
    assert d_head.operation == "delete"
    assert d_head.summary.get("delete-mode") == "merge-on-read"
    assert int(d_head.summary.get("added-data-files", "0")) == 0
    assert table_checksum(src.table("db", "t").read(spark)) == table_checksum(
        dst.table("db", "t").read(spark)
    )
    # appends after the MOR delete still mirror exactly
    src.write("db", "t", spark.range(40, 45).select("id", F.col("id").alias("v")))
    sync_history(spark, src, dst, "db", "t")
    assert table_checksum(src.table("db", "t").read(spark)) == table_checksum(
        dst.table("db", "t").read(spark)
    )


def test_sync_delete_with_duplicate_rows_falls_back_exact(spark, tmp_path):
    """Deleting SOME copies of duplicated rows is not expressible as
    an equality delete — the replay must fall back to full state and
    stay exact."""
    from apache_iceberg_tables_migration_tool_spark.operators.integrity import (
        table_checksum,
    )
    from apache_iceberg_tables_migration_tool_spark.plans import sync_history

    src = SnapCatalog(str(tmp_path / "src"))
    dst = SnapCatalog(str(tmp_path / "dst"))
    dup = spark.createDataFrame(
        [(1, 10)] * 3 + [(2, 20)] * 2 + [(3, 30)],
        "id bigint, v bigint",
    )
    src.write("db", "t", dup)
    sync_history(spark, src, dst, "db", "t")
    # COW-delete only the rows in ONE file region: rewrite files so
    # exactly one copy of (1, 10) dies — delete_where is by predicate,
    # so delete (3, 30) plus an overwrite that drops one (1, 10) copy
    keep = spark.createDataFrame(
        [(1, 10)] * 2 + [(2, 20)] * 2, "id bigint, v bigint"
    )
    src.write("db", "t", keep, mode="overwrite")
    sync_history(spark, src, dst, "db", "t")
    assert table_checksum(src.table("db", "t").read(spark)) == table_checksum(
        dst.table("db", "t").read(spark)
    )
    # a delete whose victims leave identical survivors: guard must
    # refuse the equality path (checksum equality proves exactness)
    src.delete_where("db", "t", F.col("v") == 20)
    sync_history(spark, src, dst, "db", "t")
    assert table_checksum(src.table("db", "t").read(spark)) == table_checksum(
        dst.table("db", "t").read(spark)
    )


def test_sync_replays_source_mor_delete(spark, tmp_path):
    """A source MERGE-ON-READ delete (no data files written) must
    still replicate — the changelog surfaces its hidden rows and the
    mirror gets the same O(delta) equality-delete shape."""
    from apache_iceberg_tables_migration_tool_spark.operators.integrity import (
        table_checksum,
    )
    from apache_iceberg_tables_migration_tool_spark.plans import sync_history

    src, dst = _sync_fixture_catalogs(spark, tmp_path)
    sync_history(spark, src, dst, "db", "t")
    src.delete_where("db", "t", F.col("id") % 3 == 0, mode="merge-on-read")
    assert sync_history(spark, src, dst, "db", "t") == 1
    d_head = dst.table("db", "t").current_snapshot()
    assert d_head.operation == "delete"
    assert int(d_head.summary.get("added-data-files", "0")) == 0
    assert table_checksum(src.table("db", "t").read(spark)) == table_checksum(
        dst.table("db", "t").read(spark)
    )


def test_sync_history_tolerates_prestamp_mirror_create(spark, tmp_path):
    """ADVICE r8: mirrors built before replayed-from stamping landed
    have an unstamped leading CREATE snapshot. The first sync onto
    such a mirror must proceed, not be refused as 'diverged'."""
    from apache_iceberg_tables_migration_tool_spark.plans import sync_history
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

    src = SnapCatalog(str(tmp_path / "src"))
    dst = SnapCatalog(str(tmp_path / "dst"))
    src.create_table("db", "t", "id BIGINT, v BIGINT")
    src.write("db", "t", spark.range(0, 10).select("id", (F.col("id") * 2).alias("v")))
    sync_history(spark, src, dst, "db", "t")

    # simulate the pre-stamp era: strip the stamp off the mirror's create
    d_tbl = dst.table("db", "t")
    meta = d_tbl._load_meta()
    assert meta["snapshots"][0]["operation"] == "create"
    meta["snapshots"][0]["summary"].pop("replayed-from")
    d_tbl._save_meta(meta)

    src.write("db", "t", spark.range(10, 15).select("id", (F.col("id") * 2).alias("v")))
    assert sync_history(spark, src, dst, "db", "t") == 1
    assert d_tbl.read(spark).count() == 15

    # a mirror whose ONLY snapshot is the unstamped create also syncs
    dst2 = SnapCatalog(str(tmp_path / "dst2"))
    src2 = SnapCatalog(str(tmp_path / "src2"))
    src2.create_table("db", "t", "id BIGINT, v BIGINT")
    sync_history(spark, src2, dst2, "db", "t")
    d2 = dst2.table("db", "t")
    meta2 = d2._load_meta()
    meta2["snapshots"][0]["summary"].pop("replayed-from")
    d2._save_meta(meta2)
    src2.write("db", "t", spark.range(0, 4).select("id", (F.col("id") * 2).alias("v")))
    assert sync_history(spark, src2, dst2, "db", "t") == 1
    assert d2.read(spark).count() == 4

    # a genuinely diverged mirror (local DATA commit) is still refused
    dst.write("db", "t", spark.range(99, 100).select("id", F.col("id").alias("v")))
    with pytest.raises(ValueError, match="diverged"):
        sync_history(spark, src, dst, "db", "t")


def test_sync_noop_tick_parses_no_manifest_chunks(spark, tmp_path, monkeypatch):
    """VERDICT r9 #3 (sync half): a no-op sync tick walks both chains
    via stamps/operations/schemas only — with lazy snapshots it must
    not parse a single manifest chunk on either catalog."""
    from apache_iceberg_tables_migration_tool_spark.plans import sync_history
    from apache_iceberg_tables_migration_tool_spark.sources import snapcat as sc

    src, dst = _sync_fixture_catalogs(spark, tmp_path)
    assert sync_history(spark, src, dst, "db", "t") == 2
    more = spark.range(20, 28).select("id", (F.col("id") * 2).alias("v"))
    src.write("db", "t", more)
    assert sync_history(spark, src, dst, "db", "t") == 1

    reads = []
    real = sc.SnapTable._read_chunk

    def counting(self, sha):
        reads.append((self.name, sha))
        return real(self, sha)

    monkeypatch.setattr(sc.SnapTable, "_read_chunk", counting)
    sc._CHUNK_CACHE.clear()
    assert sync_history(spark, src, dst, "db", "t") == 0
    assert reads == [], f"no-op sync parsed {len(reads)} chunks: {reads[:5]}"
