"""Plan execution: create target tables + copy snapshot data.

Reference stages 3+5 (``3_create_dst_tables.py:66-112``,
``5_migrate_tables_data.py:44-110``) with the fidelity gaps closed:

- G1: DDL uses Spark ``simpleString()`` types (round-trips nested
  struct/array/map/decimal), not ``str(dataType)``.
- G2: the partition spec reaches the target table and the copy write.
- double-scan: record counts come from the target commit manifest,
  not a separate ``df.count()`` before the write.

Table-level parallelism: the reference migrates tables serially on
the driver (``5_migrate_tables_data.py:186-193``); we submit per-table
copy jobs from a thread pool, so independent tables occupy the
cluster concurrently (Spark's scheduler interleaves their stages).
Per-table errors are isolated into the report, matching the
reference's try/except-per-table behavior.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from apache_iceberg_tables_migration_tool_spark.session import pin

from apache_iceberg_tables_migration_tool_spark.plans.plan import MigrationPlan, TableMigration
from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("database", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("records_migrated", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("error", T.StringType()),
    ]
)


@dataclass
class MigrationResult:
    database: str
    table_name: str
    status: str
    snapshot_id: int
    records_migrated: int
    duration_sec: float
    error: str | None = None


def _migrate_one(
    spark: SparkSession,
    entry: TableMigration,
    src: SnapCatalog,
    dst: SnapCatalog,
    committed_at: str | None,
) -> MigrationResult:
    t0 = time.monotonic()
    try:
        # stage-3 equivalent: namespace + table DDL on the target —
        # including source table properties (the reference collects
        # them per table, 2_collect_database_schema_info.py:176-184)
        dst.create_namespace(entry.database)
        dst.create_table(
            entry.database,
            entry.table_name,
            entry.schema_ddl,
            partition_by=entry.partition_spec,
            properties=entry.properties,
            committed_at=committed_at,
        )
        # stage-5 equivalent: time-travel read at the planned snapshot,
        # full overwrite into the target; one distributed pass
        df: DataFrame = src.table(entry.database, entry.table_name).read(
            spark, snapshot_id=entry.snapshot_id
        )
        # hash distribution for partitioned copies (≙ Iceberg
        # write.distribution-mode=hash): clusters rows onto write tasks
        # by the spec columns, so P partition values are written by up
        # to P parallel tasks instead of every input task writing every
        # value — same file count and identical table contents (the
        # copy is verified by order-insensitive checksum), but the
        # file-writing parallelizes (measured 3.33 s → 1.79 s on the
        # 83-partition lineitem copy at sf0.1) and at cluster scale it
        # is what prevents the tasks × partitions small-file explosion
        snap = dst.write(
            entry.database,
            entry.table_name,
            df,
            mode="overwrite",
            partition_by=entry.partition_spec,
            committed_at=committed_at,
            distribution="hash" if entry.partition_spec else None,
        )
        return MigrationResult(
            database=entry.database,
            table_name=entry.table_name,
            status="success",
            snapshot_id=entry.snapshot_id,
            records_migrated=snap.total_records,  # commit metrics, no extra count()
            duration_sec=time.monotonic() - t0,
        )
    except Exception as e:  # per-table isolation, like the reference
        return MigrationResult(
            database=entry.database,
            table_name=entry.table_name,
            status="failed",
            snapshot_id=entry.snapshot_id,
            records_migrated=0,
            duration_sec=time.monotonic() - t0,
            error=f"{type(e).__name__}: {e}",
        )


def migrate(
    spark: SparkSession,
    plan: MigrationPlan,
    src: SnapCatalog,
    dst: SnapCatalog,
    max_parallel_tables: int = 4,
    committed_at: str | None = None,
) -> DataFrame:
    """Execute the plan; returns the migration report as a DataFrame
    (database, table_name, status, records, duration)."""
    if not plan.tables:
        return spark.createDataFrame([], RESULT_SCHEMA)
    with ThreadPoolExecutor(max_workers=max_parallel_tables) as pool:
        results = list(
            pool.map(lambda e: _migrate_one(spark, e, src, dst, committed_at), plan.tables)
        )
    rows = [
        (r.database, r.table_name, r.status, r.snapshot_id, r.records_migrated,
         r.duration_sec, r.error)
        for r in results
    ]
    return spark.createDataFrame(rows, RESULT_SCHEMA)


def _replay_commits(
    spark: SparkSession,
    table,
    dst: SnapCatalog,
    database: str,
    name: str,
    snaps,
    prev_id: int | None,
    properties: dict | None,
) -> tuple[int, int]:
    """Replay source commits onto the target in order, each target
    commit stamped ``replayed-from`` with its source snapshot id (the
    resumable-sync watermark). Appends replay from the incremental
    file delta (O(changed data)); anything else replays the full
    snapshot state. Returns (commits replayed, target total records).
    """
    total = 0
    n = 0
    for s in snaps:
        if s.operation == "create" and not s.files:
            dst.create_table(
                database, name, s.schema_ddl,
                partition_by=s.partition_spec, properties=properties,
                committed_at=s.committed_at,
                summary_extra={"replayed-from": str(s.snapshot_id)},
            )
            prev_id = s.snapshot_id
            n += 1
            continue
        if s.operation in ("append", "create"):
            df = table.read_incremental(spark, prev_id, s.snapshot_id)
            mode = "append"
        elif s.operation == "delete" and prev_id is not None:
            # DELETE commits replay as an O(delta) equality-delete on
            # the mirror when that is provably exact (see
            # _replay_delete_delta) — a 10-row delete on a 100 TB
            # source must not become a full-state rewrite downstream
            snap = _replay_delete_delta(
                spark, table, dst, database, name, prev_id, s
            )
            if snap is not None:
                total = snap.total_records
                prev_id = s.snapshot_id
                n += 1
                continue
            df = table.read(spark, snapshot_id=s.snapshot_id)
            mode = "overwrite"
        else:  # overwrite/merge/update/replace: replay full state at s
            df = table.read(spark, snapshot_id=s.snapshot_id)
            mode = "overwrite"
        snap = dst.write(
            database, name, df,
            mode=mode, partition_by=s.partition_spec,
            committed_at=s.committed_at, operation=s.operation,
            summary_extra={"replayed-from": str(s.snapshot_id)},
        )
        total = snap.total_records
        prev_id = s.snapshot_id
        n += 1
    return n, total


def _replay_delete_delta(
    spark: SparkSession,
    table,
    dst: SnapCatalog,
    database: str,
    name: str,
    prev_id: int,
    s,
):
    """Replay one source DELETE commit onto the mirror as a
    merge-on-read EQUALITY DELETE of the deleted rows — O(deleted
    rows) written instead of a full-state overwrite — when that is
    provably exact; returns None to signal the full-state fallback.

    An equality delete hides EVERY row matching the key tuple
    (null-safely), so the delta replay is exact iff (a) the deleted
    multiset carries no duplicate full rows (two deleted copies of one
    value would be one key — fine — but we cannot tell that case apart
    from (b) cheaply, so duplicates fall back), and (b) no identical
    row SURVIVES in the source's post-commit state (deleting 1 of 2
    identical rows is not expressible as an equality delete). (a) is
    an O(delta) aggregate; (b) is a null-safe semi-join of the
    post-state against the deleted rowset — a read-only table pass,
    strictly cheaper than the fallback's read+write. An empty delete
    (audit no-op) replays as a no-op predicate delete, carrying files
    by reference."""
    cl = table.changelog(spark, prev_id, s.snapshot_id, net_changes=True)
    data_cols = [c for c in cl.columns if not c.startswith("_")]
    dels = cl.where(F.col("_change_type") == "delete").select(*data_cols)
    dels = dels.transform(pin)  # consumed by 3 plans
    n_dels = dels.count()
    stamp = {"replayed-from": str(s.snapshot_id)}
    if n_dels == 0:
        return dst.delete_where(
            database, name, F.lit(False),
            committed_at=s.committed_at, summary_extra=stamp,
        )
    if dels.distinct().count() != n_dels:
        return None  # duplicate deleted rows — not equality-expressible
    post = table.read(spark, snapshot_id=s.snapshot_id)
    cond = None
    for c in data_cols:
        eq = F.col(f"__p.{c}").eqNullSafe(F.col(f"__d.{c}"))
        cond = eq if cond is None else (cond & eq)
    survivor = (
        post.alias("__p").join(dels.alias("__d"), cond, "left_semi").limit(1)
    )
    if survivor.count() > 0:
        return None  # identical rows survive — equality would over-delete
    return dst.delete_keys(
        database, name, dels, key_cols=data_cols,
        committed_at=s.committed_at, summary_extra=stamp,
    )


def sync_history(
    spark: SparkSession,
    src: SnapCatalog,
    dst: SnapCatalog,
    database: str,
    table_name: str,
    upto_snapshot_id: int | None = None,
) -> int:
    """INCREMENTAL cross-catalog sync — the continuous-replication
    capability the reference explicitly lacks (`README.md:136-138`
    admits point-in-time only, no incremental sync): replay onto the
    target ONLY the source commits that landed since the last sync,
    and keep doing so as the source evolves. The watermark is the
    ``replayed-from`` stamp every replicated commit already carries,
    read from the TARGET's own history — no side state, so a crashed
    sync resumes exactly after its last completed commit and a re-run
    no-ops (each replayed commit lands atomically with its stamp).

    First call on a missing target performs the full history replay;
    later calls cost O(new commits) driver-side plus O(changed data)
    per append (incremental file delta). Raises ``ValueError`` if the
    target exists but is not a replica (no stamps) or has local
    commits interleaved (a diverged mirror must not be silently
    overwritten), and ``LookupError`` if the source has expired the
    watermark commit from its log (keep the expire horizon longer
    than the sync cadence). Returns the number of commits replayed."""
    s_tbl = src.table(database, table_name)
    chain = s_tbl.main_chain()
    if upto_snapshot_id is not None:
        chain = [s for s in chain if s.snapshot_id <= upto_snapshot_id]
    d_tbl = dst.table(database, table_name)
    wm: int | None = None
    if d_tbl.exists() and d_tbl.snapshots():
        d_chain = d_tbl.main_chain()
        stamps = [
            int(s.summary["replayed-from"])
            for s in d_chain
            if "replayed-from" in s.summary
        ]
        unstamped = [s for s in d_chain if "replayed-from" not in s.summary]
        # Mirrors created by migrate_history BEFORE replayed-from
        # stamping landed have one unstamped snapshot: the leading,
        # file-less CREATE. That is provably not a local data commit —
        # tolerate it iff it is the chain head, carries no files, and
        # its schema appears in the source history (ADVICE r8); map it
        # to the source's own leading create for watermark purposes.
        benign_lead = False
        if unstamped:
            lead = d_chain[0]
            benign_lead = (
                len(unstamped) == 1
                and unstamped[0].snapshot_id == lead.snapshot_id
                and lead.operation == "create"
                and not lead.files
                and lead.schema_ddl in {s.schema_ddl for s in chain}
            )
            if not benign_lead:
                if not stamps:
                    raise ValueError(
                        f"target {database}.{table_name} exists but "
                        "carries no replayed-from stamps — not a sync "
                        "replica; refusing to write into it"
                    )
                ids = [s.snapshot_id for s in unstamped]
                raise ValueError(
                    f"target {database}.{table_name} has {len(unstamped)} "
                    f"local commit(s) beyond the replicated history "
                    f"(snapshot ids {ids}) — the mirror diverged; resolve "
                    "manually (rollback the local commits or re-mirror "
                    "into a fresh table)"
                )
        if not stamps:
            if not (benign_lead and chain and chain[0].operation == "create"):
                raise ValueError(
                    f"target {database}.{table_name} exists but carries no "
                    "replayed-from stamps — not a sync replica; refusing to "
                    "write into it"
                )
            # create-only pre-stamp mirror: resume after the source create
            stamps = [chain[0].snapshot_id]
        wm = max(stamps)
        if wm not in {s.snapshot_id for s in chain}:
            raise LookupError(
                f"sync watermark {wm} of {database}.{table_name} is no "
                "longer in the source history (expired or rolled back) — "
                "cannot prove the incremental delta; re-mirror into a "
                "fresh table"
            )
    pending = [s for s in chain if wm is None or s.snapshot_id > wm]
    if not pending:
        return 0
    dst.create_namespace(database)
    n, _total = _replay_commits(
        spark, s_tbl, dst, database, table_name, pending, wm,
        s_tbl.properties() or None,
    )
    sp, dp = s_tbl.properties(), d_tbl.properties()
    if sp != dp:  # mirror properties exactly, including unsets
        dst.set_properties(
            database, table_name,
            {**{k: None for k in dp if k not in sp}, **sp},
        )
    return n


def _replay_one(
    spark: SparkSession,
    entry: TableMigration,
    src: SnapCatalog,
    dst: SnapCatalog,
) -> MigrationResult:
    """History-preserving migration of one table: every source commit
    up to the planned snapshot is replayed as a commit on the target,
    keeping committed_at, operation, and per-snapshot row counts —
    the fix for the reference's G4 (README promises snapshot-history
    preservation, `README.md:8`, but stage 5 writes one overwrite,
    `5_migrate_tables_data.py:80-83`, so history is lost).

    Append commits are replayed from the *incremental* file delta
    (O(changed data), the way an Iceberg changed-data sync works);
    overwrites replay the full snapshot state. Time travel on the
    target then works for every migrated point, not just the last.
    """
    t0 = time.monotonic()
    try:
        table = src.table(entry.database, entry.table_name)
        # published lineage only — staged (WAP) snapshots are not table
        # history and must not be replayed onto the target
        snaps = [s for s in table.main_chain() if s.snapshot_id <= entry.snapshot_id]
        dst.create_namespace(entry.database)
        _n, total = _replay_commits(
            spark, table, dst, entry.database, entry.table_name,
            snaps, None, entry.properties,
        )
        if entry.properties:
            # histories that start with a data-bearing commit (no
            # explicit create snapshot) create the target inside
            # write(), which carries no properties — re-apply them so
            # the round-trip holds for every history shape
            dst.set_properties(entry.database, entry.table_name, entry.properties)
        return MigrationResult(
            database=entry.database,
            table_name=entry.table_name,
            status="success",
            snapshot_id=entry.snapshot_id,
            records_migrated=total,
            duration_sec=time.monotonic() - t0,
        )
    except Exception as e:  # per-table isolation, like the reference
        return MigrationResult(
            database=entry.database,
            table_name=entry.table_name,
            status="failed",
            snapshot_id=entry.snapshot_id,
            records_migrated=0,
            duration_sec=time.monotonic() - t0,
            error=f"{type(e).__name__}: {e}",
        )


def migrate_history(
    spark: SparkSession,
    plan: MigrationPlan,
    src: SnapCatalog,
    dst: SnapCatalog,
    max_parallel_tables: int = 4,
) -> DataFrame:
    """Execute the plan with full snapshot-history replay (see
    ``_replay_one``); same report schema as ``migrate``."""
    if not plan.tables:
        return spark.createDataFrame([], RESULT_SCHEMA)
    with ThreadPoolExecutor(max_workers=max_parallel_tables) as pool:
        results = list(pool.map(lambda e: _replay_one(spark, e, src, dst), plan.tables))
    rows = [
        (r.database, r.table_name, r.status, r.snapshot_id, r.records_migrated,
         r.duration_sec, r.error)
        for r in results
    ]
    return spark.createDataFrame(rows, RESULT_SCHEMA)
