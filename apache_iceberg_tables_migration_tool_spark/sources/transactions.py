"""Multi-table ATOMIC transactions over a SnapCatalog.

The reference migrates tables one by one with no cross-table
consistency (each of `5_migrate_tables_data.py`'s per-table writes
commits independently; a crash mid-run leaves the target half
migrated with nothing recording the fact). Real warehouses need the
batch-spanning guarantee — fact and dim land together or not at all —
which per-table Iceberg itself cannot give (Glue/Hive catalogs commit
one table at a time; Nessie adds catalog-level commits for exactly
this reason). This module adds it on top of the engine's existing
write-audit-publish machinery:

1. Every write inside the transaction executes EAGERLY as a STAGED
   (WAP) commit — full data plane, invisible to readers (`SnapCatalog
   .write(staged=True)`). A transaction that never commits costs
   nothing to abort: staged snapshots stay in the log as unpublished
   forensics, the same contract failed WAP audits already follow.
2. ``commit()`` writes ONE catalog-level intent file
   (``<warehouse>/_txns/txn-<id>.json``, tmp + atomic rename) naming
   every (table, staged snapshot). That rename is THE commit point.
3. The staged snapshots are then PUBLISHED one table at a time
   (roll-forward). A crash anywhere in phase 3 leaves the intent
   file behind, and :func:`recover_transactions` — run explicitly or
   by the next transaction on the same catalog — finishes the
   remaining publishes idempotently (a snapshot already on the
   published lineage, or cherry-picked into it via its
   ``published-from`` stamp, is skipped).

Atomicity story, stated honestly: the commit DECISION is atomic (one
rename), and afterwards the transaction is guaranteed to roll forward
to fully-published; but per-table pointers flip one at a time, so a
reader racing phase 3 can observe a committed-but-not-yet-published
table (bounded staleness, resolved by recovery — the standard 2PC
visibility window; removing it entirely would need every reader to
resolve through a catalog-level pointer). Concurrency: appends
staged by a transaction cherry-pick cleanly over commits that land
in between (the `publish` fast path / replay rule); a staged
OVERWRITE whose base moved is refused at preflight — before the
commit point — so the transaction aborts atomically rather than
half-publishing.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame

from apache_iceberg_tables_migration_tool_spark.sources.snapcat import (
    CommitConflictError,
    SnapCatalog,
    Snapshot,
    SnapTable,
)

__all__ = [
    "MultiTableTransaction",
    "TransactionRollForwardError",
    "recover_transactions",
    "pending_transactions",
]


class TransactionRollForwardError(RuntimeError):
    """A committed transaction could not finish publishing. The intent
    file remains; :func:`recover_transactions` retries the remaining
    publishes."""


def _txn_dir(catalog: SnapCatalog) -> str:
    return os.path.join(catalog.warehouse, "_txns")


def _published_ids(tbl: SnapTable) -> set[int]:
    """Snapshot ids visible on the table's published lineage,
    including staged snapshots that were cherry-picked in (their new
    snapshot carries ``published-from``)."""
    cur = tbl.current_snapshot()
    if cur is None:
        return set()
    by_id = {s.snapshot_id: s for s in tbl.snapshots()}
    out: set[int] = set()
    cid: int | None = cur.snapshot_id
    while cid is not None and cid in by_id:
        s = by_id[cid]
        out.add(cid)
        pf = s.summary.get("published-from")
        if pf is not None:
            out.add(int(pf))
        cid = s.parent_id
    return out


def pending_transactions(catalog: SnapCatalog) -> list[str]:
    """Transaction ids with a committed intent file awaiting (or mid)
    roll-forward."""
    d = _txn_dir(catalog)
    if not os.path.isdir(d):
        return []
    return sorted(
        f[len("txn-"):-len(".json")]
        for f in os.listdir(d)
        if f.startswith("txn-") and f.endswith(".json")
    )


def _roll_forward(catalog: SnapCatalog, path: str) -> None:
    """Publish every not-yet-published entry of one intent file, then
    remove it. Idempotent AND race-safe: ``SnapCatalog.publish`` is a
    no-op (under the table commit lock) for a snapshot already on the
    published lineage, so a recovering process racing the original
    committer on the same intent cannot double-apply an entry — the
    ``_published_ids`` check here is just a cheap skip, not the
    correctness guard."""
    try:
        with open(path) as fh:
            intent = json.load(fh)
    except FileNotFoundError:
        return  # a concurrent recoverer finished this intent first
    for e in intent["entries"]:
        tbl = catalog.table(e["database"], e["table"])
        if e["snapshot_id"] in _published_ids(tbl):
            continue  # already rolled forward before a crash
        try:
            catalog.publish(e["database"], e["table"], e["snapshot_id"])
        except CommitConflictError as exc:
            raise TransactionRollForwardError(
                f"transaction {intent['txn_id']}: publishing staged snapshot "
                f"{e['snapshot_id']} of {e['database']}.{e['table']} conflicts "
                f"with a commit that landed after the transaction committed "
                f"({exc}). The intent file remains at {path}; resolve the "
                "conflict (rollback the conflicting commit or drop the "
                "transaction file) and re-run recover_transactions."
            ) from exc
    try:
        os.remove(path)
    except FileNotFoundError:
        pass  # concurrent recoverer won the removal — same outcome


def recover_transactions(catalog: SnapCatalog) -> list[str]:
    """Finish the roll-forward of every committed-but-unfinished
    transaction on this catalog (crash recovery). Returns the
    recovered transaction ids."""
    done = []
    for txn_id in pending_transactions(catalog):
        _roll_forward(catalog, os.path.join(_txn_dir(catalog), f"txn-{txn_id}.json"))
        done.append(txn_id)
    return done


class MultiTableTransaction:
    """Atomic multi-table write batch (see module docstring).

    Usage::

        with MultiTableTransaction(cat) as txn:
            txn.write("db", "orders", new_orders)            # staged
            txn.write("db", "lineitem", new_items)           # staged
        # __exit__ commits: both published, or neither

    Exiting on an exception ABORTS: nothing was published, the staged
    snapshots remain in each table's log as unpublished forensics.
    Supported operations: ``write`` (append/overwrite), ``delete_where``
    (COW or merge-on-read), ``upsert`` and ``update_where`` — every
    mutating verb the catalog has. Base-dependent operations
    (overwrite/delete/merge/update) are computed against the table's
    PUBLISHED state, so each must be its table's FIRST entry in the
    transaction; appends may follow (they cherry-pick over the
    published base-dependent commit). The ordering guard raises at
    staging time, and the preflight re-checks every base-dependent
    entry against the live head at commit time — both BEFORE the
    commit point, so a violated transaction aborts atomically.
    """

    def __init__(self, catalog: SnapCatalog):
        self.catalog = catalog
        self.txn_id = uuid.uuid4().hex[:12]
        self.entries: list[dict] = []
        self._done = False
        # a new transaction first heals any crashed predecessor so its
        # tables aren't stuck in the visibility window indefinitely.
        # Deliberately fail-loud: if a predecessor is STUCK (publish
        # conflict), no new transaction starts on this catalog until a
        # human resolves it — half-applied committed transactions are
        # exactly the state this module exists to prevent compounding
        recover_transactions(catalog)

    # -- staged operations -------------------------------------------------

    def write(
        self,
        database: str,
        table: str,
        df: DataFrame,
        mode: str = "append",
        **kwargs,
    ) -> Snapshot:
        """Stage a write into the transaction. Data is written NOW
        (full distributed write); visibility waits for commit. An
        ``overwrite`` is base-dependent and must be the table's first
        entry in this transaction (appends may follow it)."""
        if self._done:
            raise RuntimeError("transaction already committed or aborted")
        if mode != "append":
            self._guard_base_dependent(database, table, mode)
        snap = self.catalog.write(
            database, table, df, mode=mode, staged=True,
            wap_id=f"txn-{self.txn_id}", **kwargs,
        )
        self._record(database, table, snap)
        return snap

    def delete_where(
        self, database: str, table: str, condition, **kwargs
    ) -> Snapshot:
        """Stage a row-level DELETE (copy-on-write or merge-on-read per
        ``mode=``) into the transaction. Computed against the table's
        CURRENT PUBLISHED state, so it must be the table's first entry
        (see :meth:`_guard_base_dependent`)."""
        self._guard_base_dependent(database, table, "delete")
        snap = self.catalog.delete_where(
            database, table, condition, staged=True, **kwargs
        )
        self._record(database, table, snap)
        return snap

    def upsert(
        self, database: str, table: str, updates: DataFrame,
        key_cols: list[str], **kwargs,
    ) -> Snapshot:
        """Stage a MERGE (upsert) into the transaction. Base-dependent:
        must be the table's first entry."""
        self._guard_base_dependent(database, table, "merge")
        snap = self.catalog.upsert(
            database, table, updates, key_cols, staged=True, **kwargs
        )
        self._record(database, table, snap)
        return snap

    def update_where(
        self, database: str, table: str, condition, assignments, **kwargs
    ) -> Snapshot:
        """Stage a row-level UPDATE into the transaction.
        Base-dependent: must be the table's first entry."""
        self._guard_base_dependent(database, table, "update")
        snap = self.catalog.update_where(
            database, table, condition, assignments, staged=True, **kwargs
        )
        self._record(database, table, snap)
        return snap

    def _guard_base_dependent(self, database: str, table: str, op: str) -> None:
        """A base-dependent (non-append) operation reads the table's
        published state when STAGED — it cannot see this transaction's
        earlier staged entries on the same table, and its publish would
        conflict with theirs (pointer moved). Refuse up front instead
        of stranding the roll-forward. Appends after it are fine (they
        cherry-pick); a second base-dependent entry is not."""
        if self._done:
            raise RuntimeError("transaction already committed or aborted")
        prior = [
            e for e in self.entries
            if (e["database"], e["table"]) == (database, table)
        ]
        if prior:
            raise CommitConflictError(
                f"transaction {self.txn_id}: staged {op} on "
                f"{database}.{table} must be that table's FIRST entry — "
                f"it is computed against the published state and cannot "
                f"see the transaction's earlier staged entries "
                f"({[e['operation'] for e in prior]}); reorder the "
                "operations (base-dependent op first, appends after)"
            )

    def _record(self, database: str, table: str, snap: Snapshot) -> None:
        self.entries.append(
            {
                "database": database,
                "table": table,
                "snapshot_id": snap.snapshot_id,
                "operation": snap.operation,
            }
        )

    # -- outcome -----------------------------------------------------------

    def commit(self) -> None:
        """Make every staged write visible, atomically (see module
        docstring for the exact guarantee)."""
        if self._done:
            raise RuntimeError("transaction already committed or aborted")
        self._done = True
        if not self.entries:
            return
        # preflight: refuse the one unpublishable shape BEFORE the
        # commit point — a staged overwrite whose base moved cannot be
        # replayed over commits it never saw (publish would raise
        # mid-roll-forward, stranding the transaction half applied)
        for e in self.entries:
            if e["operation"] == "append":
                continue  # cherry-pickable over any interleaved commit
            tbl = self.catalog.table(e["database"], e["table"])
            by_id = {s.snapshot_id: s for s in tbl.snapshots()}
            staged = by_id[e["snapshot_id"]]
            cur = tbl.current_snapshot()
            if staged.parent_id != (cur.snapshot_id if cur else None):
                raise CommitConflictError(
                    f"transaction {self.txn_id}: staged {e['operation']} on "
                    f"{e['database']}.{e['table']} (snapshot "
                    f"{e['snapshot_id']}) conflicts with a commit that landed "
                    "since it was staged; transaction aborted, nothing "
                    "published"
                )
        d = _txn_dir(self.catalog)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"txn-{self.txn_id}.json")
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as fh:
            json.dump({"txn_id": self.txn_id, "entries": self.entries}, fh, indent=1)
        os.replace(tmp, path)  # THE atomic commit point
        _roll_forward(self.catalog, path)

    def abort(self) -> None:
        """Discard the transaction: nothing becomes visible. Already
        idempotent/no-op after commit()."""
        self._done = True

    def __enter__(self) -> "MultiTableTransaction":
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        if exc_type is None:
            if not self._done:
                self.commit()
        else:
            self.abort()
        return False


class ConsistentReader:
    """SNAPSHOT-ISOLATION reads across tables — the read-side
    counterpart of :class:`MultiTableTransaction`: pin every table's
    current snapshot id at construction, then every read (DataFrame or
    SQL) resolves at the pinned versions no matter how many commits
    land in between. A dashboard that joins fact and dim twice gets
    the SAME answer twice; without pinning, a commit between the two
    queries makes them silently inconsistent. Pure metadata — pinning
    costs one ``current_snapshot()`` per table, nothing is copied, and
    pinned snapshots stay readable until ``expire_snapshots`` ages
    them out (keep the expire horizon longer than reader lifetimes).

    ``tables`` limits the pin set (``[(db, table), ...]``); default is
    every table in the catalog. Explicit ``VERSION AS OF`` /
    ``TIMESTAMP AS OF`` clauses in :meth:`sql` override the pin for
    that reference."""

    def __init__(self, catalog: SnapCatalog, tables=None):
        self.catalog = catalog
        self.pins: dict[str, int] = {}
        if tables is None:
            tables = [
                (db, t)
                for db in catalog.list_namespaces()
                if not db.startswith("_")
                for t in catalog.list_tables(db)
            ]
        for db, t in tables:
            cur = catalog.table(db, t).current_snapshot()
            if cur is not None:
                self.pins[f"{db}.{t}"] = cur.snapshot_id

    def read(self, spark, database: str, table: str) -> DataFrame:
        key = f"{database}.{table}"
        if key not in self.pins:
            raise LookupError(
                f"{key} was not pinned (missing at construction or empty)"
            )
        return self.catalog.table(database, table).read(
            spark, snapshot_id=self.pins[key]
        )

    def sql(self, spark, query: str) -> DataFrame:
        from apache_iceberg_tables_migration_tool_spark.sources.sqlfront import (
            snapcat_sql,
        )

        return snapcat_sql(spark, self.catalog, query, pins=self.pins)
