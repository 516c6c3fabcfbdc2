"""Multi-table atomic transactions (`sources/transactions.py`):
staged-write batches with a single atomic commit point and
crash-recoverable roll-forward."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from apache_iceberg_tables_migration_tool_spark.sources.snapcat import (
    CommitConflictError,
    SnapCatalog,
)
from apache_iceberg_tables_migration_tool_spark.sources.transactions import (
    MultiTableTransaction,
    TransactionRollForwardError,
    pending_transactions,
    recover_transactions,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 10).alias("v")
    )


def _count(spark, cat, db, tbl):
    t = cat.table(db, tbl)
    if not t.exists() or t.current_snapshot() is None:
        return 0
    return t.read(spark).count()


def test_txn_commit_publishes_all(spark, tmp_path):
    cat = SnapCatalog(str(tmp_path / "wh"))
    cat.write("db", "a", _df(spark, 0, 5))
    cat.write("db", "b", _df(spark, 0, 7))
    with MultiTableTransaction(cat) as txn:
        txn.write("db", "a", _df(spark, 5, 10))
        txn.write("db", "b", _df(spark, 7, 10))
        # staged writes are invisible before commit
        assert _count(spark, cat, "db", "a") == 5
        assert _count(spark, cat, "db", "b") == 7
    assert _count(spark, cat, "db", "a") == 10
    assert _count(spark, cat, "db", "b") == 10
    assert pending_transactions(cat) == []


def test_txn_abort_on_exception_publishes_nothing(spark, tmp_path):
    cat = SnapCatalog(str(tmp_path / "wh"))
    cat.write("db", "a", _df(spark, 0, 5))
    with pytest.raises(RuntimeError, match="boom"):
        with MultiTableTransaction(cat) as txn:
            txn.write("db", "a", _df(spark, 5, 10))
            txn.write("db", "b", _df(spark, 0, 3))
            raise RuntimeError("boom")
    assert _count(spark, cat, "db", "a") == 5
    # table b only ever had the staged commit: still unpublished
    assert _count(spark, cat, "db", "b") == 0
    assert pending_transactions(cat) == []


def test_txn_crash_mid_publish_recovers(spark, tmp_path, monkeypatch):
    cat = SnapCatalog(str(tmp_path / "wh"))
    cat.write("db", "a", _df(spark, 0, 5))
    cat.write("db", "b", _df(spark, 0, 5))
    txn = MultiTableTransaction(cat)
    txn.write("db", "a", _df(spark, 5, 10))
    txn.write("db", "b", _df(spark, 5, 10))

    real_publish = cat.publish
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise CommitConflictError("injected crash")
        return real_publish(*a, **kw)

    monkeypatch.setattr(cat, "publish", flaky)
    with pytest.raises(TransactionRollForwardError):
        txn.commit()
    # commit point passed: intent file recorded, first table published
    assert pending_transactions(cat) == [txn.txn_id]
    assert _count(spark, cat, "db", "a") == 10
    assert _count(spark, cat, "db", "b") == 5
    monkeypatch.setattr(cat, "publish", real_publish)
    assert recover_transactions(cat) == [txn.txn_id]
    assert _count(spark, cat, "db", "b") == 10
    assert pending_transactions(cat) == []
    # recovery is idempotent
    assert recover_transactions(cat) == []


def test_new_txn_heals_crashed_predecessor(spark, tmp_path, monkeypatch):
    cat = SnapCatalog(str(tmp_path / "wh"))
    cat.write("db", "a", _df(spark, 0, 5))
    txn = MultiTableTransaction(cat)
    txn.write("db", "a", _df(spark, 5, 10))
    monkeypatch.setattr(
        cat, "publish",
        lambda *a, **kw: (_ for _ in ()).throw(CommitConflictError("crash")),
    )
    with pytest.raises(TransactionRollForwardError):
        txn.commit()
    monkeypatch.undo()
    assert pending_transactions(cat) == [txn.txn_id]
    # constructing the next transaction rolls the predecessor forward
    MultiTableTransaction(cat)
    assert pending_transactions(cat) == []
    assert _count(spark, cat, "db", "a") == 10


def test_txn_staged_append_cherry_picks_over_interleaved_commit(spark, tmp_path):
    cat = SnapCatalog(str(tmp_path / "wh"))
    cat.write("db", "a", _df(spark, 0, 5))
    txn = MultiTableTransaction(cat)
    txn.write("db", "a", _df(spark, 5, 10))
    cat.write("db", "a", _df(spark, 100, 103))  # lands mid-transaction
    txn.commit()
    got = sorted(
        r["id"] for r in cat.table("db", "a").read(spark).select("id").collect()
    )
    assert got == list(range(0, 10)) + [100, 101, 102]


def test_txn_staged_overwrite_conflict_aborts_atomically(spark, tmp_path):
    cat = SnapCatalog(str(tmp_path / "wh"))
    cat.write("db", "a", _df(spark, 0, 5))
    cat.write("db", "b", _df(spark, 0, 5))
    txn = MultiTableTransaction(cat)
    txn.write("db", "b", _df(spark, 50, 60), mode="overwrite")
    txn.write("db", "a", _df(spark, 5, 10))
    cat.write("db", "b", _df(spark, 100, 103))  # conflicts with the overwrite
    with pytest.raises(CommitConflictError, match="nothing published"):
        txn.commit()
    # atomic abort: NEITHER entry visible, no intent file
    assert _count(spark, cat, "db", "a") == 5
    assert sorted(
        r["id"] for r in cat.table("db", "b").read(spark).select("id").collect()
    ) == [0, 1, 2, 3, 4, 100, 101, 102]
    assert pending_transactions(cat) == []


def test_empty_txn_commit_is_noop(spark, tmp_path):
    cat = SnapCatalog(str(tmp_path / "wh"))
    with MultiTableTransaction(cat):
        pass
    assert pending_transactions(cat) == []


def test_txn_rejects_use_after_commit(spark, tmp_path):
    cat = SnapCatalog(str(tmp_path / "wh"))
    txn = MultiTableTransaction(cat)
    txn.commit()
    with pytest.raises(RuntimeError, match="already committed"):
        txn.write("db", "a", _df(spark, 0, 1))
    with pytest.raises(RuntimeError, match="already committed"):
        txn.commit()


def test_txn_row_level_ops_commit_atomically(spark, tmp_path):
    cat = SnapCatalog(str(tmp_path / "wh"))
    cat.write("db", "a", _df(spark, 0, 10))
    cat.write("db", "b", _df(spark, 0, 10))
    with MultiTableTransaction(cat) as txn:
        txn.delete_where("db", "a", F.col("id") % 2 == 0)
        txn.upsert(
            "db", "b",
            spark.range(8, 12).select("id", (F.col("id") * 100).alias("v")),
            key_cols=["id"],
        )
        # staged: nothing visible yet
        assert _count(spark, cat, "db", "a") == 10
        assert _count(spark, cat, "db", "b") == 10
    a_rows = sorted(r["id"] for r in cat.table("db", "a").read(spark).collect())
    assert a_rows == [1, 3, 5, 7, 9]
    b = {r["id"]: r["v"] for r in cat.table("db", "b").read(spark).collect()}
    assert len(b) == 12 and b[8] == 800 and b[11] == 1100 and b[3] == 30


def test_txn_mor_delete_and_update_staged(spark, tmp_path):
    cat = SnapCatalog(str(tmp_path / "wh"))
    cat.write("db", "a", _df(spark, 0, 10))
    cat.write("db", "b", _df(spark, 0, 10))
    with MultiTableTransaction(cat) as txn:
        txn.delete_where("db", "a", F.col("id") >= 8, mode="merge-on-read")
        txn.update_where("db", "b", F.col("id") < 2, {"v": F.lit(-1)})
        assert _count(spark, cat, "db", "a") == 10
    assert _count(spark, cat, "db", "a") == 8
    b = {r["id"]: r["v"] for r in cat.table("db", "b").read(spark).collect()}
    assert b[0] == -1 and b[1] == -1 and b[2] == 20


def test_txn_base_dependent_must_be_first_entry(spark, tmp_path):
    cat = SnapCatalog(str(tmp_path / "wh"))
    cat.write("db", "a", _df(spark, 0, 10))
    txn = MultiTableTransaction(cat)
    txn.write("db", "a", _df(spark, 10, 15))
    with pytest.raises(CommitConflictError, match="FIRST entry"):
        txn.delete_where("db", "a", F.col("id") < 2)
    with pytest.raises(CommitConflictError, match="FIRST entry"):
        txn.write("db", "a", _df(spark, 0, 1), mode="overwrite")
    txn.abort()
    # delete FIRST then append on the same table is the legal order
    with MultiTableTransaction(cat) as txn2:
        txn2.delete_where("db", "a", F.col("id") < 2)
        txn2.write("db", "a", _df(spark, 10, 15))
    got = sorted(r["id"] for r in cat.table("db", "a").read(spark).collect())
    assert got == list(range(2, 15))


def test_consistent_reader_snapshot_isolation(spark, tmp_path):
    from apache_iceberg_tables_migration_tool_spark.sources.transactions import (
        ConsistentReader,
    )

    cat = SnapCatalog(str(tmp_path / "wh"))
    cat.write("db", "fact", _df(spark, 0, 10))
    cat.write("db", "dim", _df(spark, 0, 3))
    reader = ConsistentReader(cat)
    # commits land after pinning — the reader must not see them
    cat.write("db", "fact", _df(spark, 10, 20))
    cat.delete_where("db", "dim", F.col("id") == 0)
    assert reader.read(spark, "db", "fact").count() == 10
    assert reader.read(spark, "db", "dim").count() == 3
    out = reader.sql(
        spark,
        "SELECT (SELECT COUNT(*) FROM db.fact) AS nf, "
        "(SELECT COUNT(*) FROM db.dim) AS nd",
    ).collect()[0]
    assert (out["nf"], out["nd"]) == (10, 3)
    # explicit time travel overrides the pin
    n_now = reader.sql(
        spark,
        f"SELECT COUNT(*) AS n FROM db.fact VERSION AS OF "
        f"{cat.table('db', 'fact').current_snapshot().snapshot_id}",
    ).collect()[0]["n"]
    assert n_now == 20
    # unpinned table → loud error
    cat.write("db", "late", _df(spark, 0, 2))
    with pytest.raises(LookupError, match="not pinned"):
        reader.read(spark, "db", "late")


def test_double_publish_is_idempotent_no_duplicate_rows(spark, tmp_path):
    """ADVICE r8 (medium): a recovering process racing the original
    committer can call publish twice for the same staged snapshot.
    The second call used to take the cherry-pick path with 'added'
    computed against the STAGED parent, duplicating rows. publish is
    now a lineage-checked no-op the second time."""
    cat = SnapCatalog(str(tmp_path / "wh"))
    cat.write("db", "a", _df(spark, 0, 5))
    snap = cat.write("db", "a", _df(spark, 5, 10), staged=True)
    # first publish: pointer fast path
    cat.publish("db", "a", snap.snapshot_id)
    assert _count(spark, cat, "db", "a") == 10
    # second publish of the SAME staged snapshot (the race's loser):
    # must be a no-op, not a duplicate-appending cherry-pick
    again = cat.publish("db", "a", snap.snapshot_id)
    assert again.snapshot_id == snap.snapshot_id
    assert _count(spark, cat, "db", "a") == 10


def test_double_publish_after_cherry_pick_is_idempotent(spark, tmp_path):
    """Same race, cherry-pick flavor: an interleaved commit forces the
    first publish through the cherry-pick path; the loser's retry must
    find the published-from stamp and no-op."""
    cat = SnapCatalog(str(tmp_path / "wh"))
    cat.write("db", "a", _df(spark, 0, 5))
    snap = cat.write("db", "a", _df(spark, 5, 10), staged=True)
    cat.write("db", "a", _df(spark, 100, 103), mode="append")  # interleaved
    first = cat.publish("db", "a", snap.snapshot_id)
    assert first.summary["published-from"] == str(snap.snapshot_id)
    assert _count(spark, cat, "db", "a") == 13
    second = cat.publish("db", "a", snap.snapshot_id)
    assert second.snapshot_id == first.snapshot_id
    assert _count(spark, cat, "db", "a") == 13


def test_roll_forward_tolerates_missing_intent_file(spark, tmp_path):
    """A concurrent recoverer that finished (and removed) the intent
    first must not crash the loser."""
    from apache_iceberg_tables_migration_tool_spark.sources import transactions as T

    cat = SnapCatalog(str(tmp_path / "wh"))
    T._roll_forward(cat, str(tmp_path / "wh" / "_txns" / "txn-gone.json"))
