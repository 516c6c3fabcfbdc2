"""Streaming variants of the event-window operators (north star X6).

The batch operators in ``operators.windows`` use the exact
``window()`` / ``session_window()`` expressions Structured Streaming
executes with state, so a streaming job over the same events produces
the same aggregates — asserted in tests via ``availableNow`` triggers
(process-everything-then-stop, the batch-parity mode).

Watermarks bound state: ``withWatermark(ts, delay)`` lets Spark drop
window state older than the watermark — the knob that makes these
aggregations run indefinitely at cluster scale without unbounded
memory. At 100 TB/day the same topology applies with a Kafka source
swapped in for the file source; nothing else changes.
"""

from __future__ import annotations

import json
import logging
import os
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from apache_iceberg_tables_migration_tool_spark.session import pin

_log = logging.getLogger(__name__)

from apache_iceberg_tables_migration_tool_spark.sources.fixtures import (
    _EVENTS_NATIVE_SCHEMA,
    _EVENTS_NTZ_SCHEMA,
    _EVENTS_RAW_SCHEMA,
    events_ts_inferred_type,
    table_path,
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events fixture (same precision-aware
    timestamp handling as the batch loader: native µs/ms decode when the
    footer allows, raw-int64 ns fallback otherwise).

    The user schema a stream declares must MATCH the footer's inferred
    type — the batch loader infers then casts, so the stream mirrors it
    by branching on the probed type: an NTZ footer is declared
    ``timestamp_ntz`` and cast to session-tz timestamp afterwards
    (declaring LTZ directly over NTZ data happens to read identically
    under the UTC session but would drift under a non-UTC session or a
    stricter future Spark — ADVICE r3)."""
    ts_type = events_ts_inferred_type(spark, table_path(sf_dir, "events"))
    if ts_type is None:
        schema = _EVENTS_RAW_SCHEMA
    elif ts_type == "timestamp_ntz":
        schema = _EVENTS_NTZ_SCHEMA
    else:
        schema = _EVENTS_NATIVE_SCHEMA
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if ts_type is None:
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type == "timestamp_ntz":
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts_stream(
    events: DataFrame, width_sec: int = 600, watermark: str = "30 minutes"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{width_sec} seconds").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_counts_stream(
    events: DataFrame, gap_sec: int = 1800, watermark: str = "1 hour"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", f"{gap_sec} seconds").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp("w.start").alias("session_start"),
            "user_id",
            "n_events",
        )
    )


def run_to_completion(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Execute a streaming aggregation over all available input
    (``availableNow`` trigger + complete-mode memory sink) and return
    the result as a DataFrame — the batch-parity harness."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def sliding_counts_stream(
    events: DataFrame, width_sec: int = 1200, slide_sec: int = 600, watermark: str = "1 hour"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", f"{width_sec} seconds", f"{slide_sec} seconds").alias("w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def ingest_stream_to_catalog(
    events: DataFrame,
    catalog,
    database: str,
    table: str,
    checkpoint_dir: str,
):
    """Streaming ingestion into the snapshot catalog: every
    micro-batch becomes one append commit (a snapshot), exactly how
    an Iceberg streaming sink commits — so the migration/time-travel
    surface applies to continuously-arriving data. foreachBatch is
    the bridge between Structured Streaming and any batch-committing
    sink; the checkpoint dir gives at-least-once batch replay, and
    the sink dedupes on batch_id: each commit stamps
    ``streaming.batch_id`` into its snapshot summary, and a replayed
    micro-batch (same batch_id already in the snapshot chain, e.g.
    after a crash between sink commit and checkpoint write) is
    skipped instead of appending duplicate rows — the same
    commit-and-check protocol Iceberg's streaming sink uses."""

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        tbl = catalog.table(database, table)
        if tbl.exists():
            seen = {
                s.summary.get("streaming.batch_id") for s in tbl.snapshots()
            }
            if str(batch_id) in seen:
                return  # replayed micro-batch — already committed
        catalog.write(
            database,
            table,
            batch_df,
            mode="append",
            summary_extra={"streaming.batch_id": str(batch_id)},
        )

    return (
        events.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def ingest_stream_wap(
    events: DataFrame,
    catalog,
    database: str,
    table: str,
    checkpoint_dir: str,
    audit,
):
    """Gated streaming ingestion via write-audit-publish: every
    micro-batch is STAGED (``SnapCatalog.write(staged=True)``),
    audited by reading the staged snapshot back, and only published
    into the table history if the audit passes — the production
    pattern for quality-gated stream landing (bad batches stay in
    the log as unpublished snapshots for forensics instead of
    polluting the table, and ``expire_snapshots`` eventually ages
    them out).

    ``audit(staged_df) -> bool`` sees the FULL staged table state
    (current + batch) exactly as readers would after publish, so
    invariant-style audits (row counts, null rates, referential
    checks) run against the real post-commit picture. Batch-id
    replay dedup works as in :func:`ingest_stream_to_catalog`, over
    published AND staged snapshots (a replayed failed batch is not
    re-staged)."""

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        tbl = catalog.table(database, table)
        if tbl.exists():
            seen = {s.summary.get("streaming.batch_id") for s in tbl.snapshots()}
            if str(batch_id) in seen:
                return  # replayed micro-batch — already staged/committed
        staged = catalog.write(
            database,
            table,
            batch_df,
            mode="append",
            staged=True,
            wap_id=f"stream-{batch_id}",
            summary_extra={"streaming.batch_id": str(batch_id)},
        )
        spark = batch_df.sparkSession
        if audit(tbl.read(spark, snapshot_id=staged.snapshot_id)):
            catalog.publish(database, table, staged.snapshot_id)

    return (
        events.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_append_to_completion(stream_df: DataFrame, query_name: str) -> DataFrame:
    """``run_to_completion`` twin for non-aggregating streams (joins,
    projections): append-mode memory sink, availableNow trigger."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def enrich_stream_static(events: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static enrichment join. The static side is re-planned
    per micro-batch (so a slowly-changing dim table picks up updates
    between batches) and broadcast when small — the standard pattern
    for attaching reference data to a live stream. Stateless: no
    watermark needed, state size O(1)."""
    return events.join(F.broadcast(dim), on, "left")


def click_purchase_stream_join(
    clicks: DataFrame,
    purchases: DataFrame,
    max_gap_sec: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: purchases within ``max_gap_sec``
    after a click by the same user. Both sides carry watermarks and
    the join condition bounds event-time distance, so Spark can expire
    buffered rows once the watermark passes ``click_ts + max_gap`` —
    bounded state on an unbounded stream (the 100 TB/day-safe form;
    an unconstrained stream-stream join would buffer forever)."""
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {max_gap_sec} SECONDS"))
    )
    return c.join(p, cond, "inner").select(
        F.col("c_user").alias("user_id"), "click_ts", "purchase_ts", "purchase_value"
    )


# ---- continuous curation ingest ---------------------------------------

_DOCUMENTS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents fixture — stands in for
    a continuously-landing crawl/ingest directory."""
    return (
        spark.readStream.schema(_DOCUMENTS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def curate_documents(docs: DataFrame) -> DataFrame:
    """Streaming-compatible curation gate: token-count + uniq-ratio
    quality filter, duplicate-5-gram repetition cap, and PII
    redaction. Every transform is a stateless per-row codegen
    expression, so the SAME function runs on a batch DataFrame and a
    structured stream (no watermark, no state store) — parity is
    asserted in tests. Stateful stages (cross-doc dedup, sampling
    quotas, packing) stay in the batch layer downstream of the
    continuous gate, where they belong: they need corpus-global
    views a stream can't have."""
    from apache_iceberg_tables_migration_tool_spark.operators.curation import redact_pii

    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tok
    grams = F.expr(
        "transform(sequence(0, size(split(text, ' ')) - 5), "
        "i -> concat_ws(' ', slice(split(text, ' '), i + 1, 5)))"
    )
    dup_ratio = F.when(
        n_tok >= 5,
        1.0 - F.size(F.array_distinct(grams)).cast("double") / (n_tok - 4),
    ).otherwise(0.0)
    return (
        docs.where(n_tok.between(20, 1000) & (uniq_ratio >= 0.3) & (dup_ratio <= 0.5))
        .select("doc_id", "lang", redact_pii("text").alias("clean_text"))
    )


def stream_catalog_appends(
    spark: SparkSession,
    catalog,
    database: str,
    table: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Tail a snapshot-catalog table as a STREAMING SOURCE (≙ reading
    an Iceberg table with ``spark.readStream.format("iceberg")`` —
    the CDC-consumption half the reference's one-shot migration
    lacks). Append commits write immutable parquet files into fresh
    ``data/s{N}`` commit directories, which is exactly the layout
    Spark's file-stream source incrementally discovers: each new
    commit's files surface as new stream input once, and the
    CHECKPOINT carries consumption state — a restarted consumer
    resumes after the last processed commit instead of re-reading the
    table (exactly-once per file, Spark's file-source guarantee).

    Append-only contract, like Iceberg's streaming read: overwrite /
    rewrite commits would re-surface rewritten files as fresh input,
    so callers should tail append-only tables (raise via
    ``read_incremental`` semantics where needed). Staged (WAP)
    commits are a caveat: their data files exist on disk before
    publish, so a tailing consumer sees them at write time — gate
    WAP-ingested tables through the published changelog instead.

    ``max_files_per_trigger`` bounds per-micro-batch input (backfill
    throttling over a large existing table)."""
    tbl = catalog.table(database, table)
    reader = spark.readStream.schema(tbl.schema())
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(os.path.join(tbl.root, "data", "*"))


def maintain_view_stream(
    spark: SparkSession,
    catalog,
    src_database: str,
    src_table: str,
    view_database: str,
    view_table: str,
    keys: list[str],
    sum_cols: list[str],
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    view_keep_last: int = 50,
    on_nonappend: str = "error",
):
    """Streaming MATERIALIZED VIEW maintenance: tail a table's append
    commits (:func:`stream_catalog_appends`) and fold every micro-batch
    into a snapshot-versioned COUNT/SUM rollup table via
    `operators/ivm.py` — each refresh costs one aggregate over the
    BATCH plus an aggregate-sized merge, never a base-table rescan,
    and the view's own commit history time-travels like any table
    (the streaming twin of the batch `incremental_view_maintenance`
    query; at 100 TB this is how a day of appends keeps a dashboard
    rollup fresh in O(appended rows)).

    Exactly-once under at-least-once replay: the view commit stamps
    ``streaming.batch_id`` and a replayed batch (crash between view
    commit and checkpoint write) is skipped — the same protocol as
    :func:`ingest_stream_to_catalog`.

    Bounded metadata: after each fold the view's history is trimmed to
    ``view_keep_last`` snapshots — without this a long-running stream
    grows one snapshot (plus superseded rollup files) per micro-batch
    forever. Replay dedup only ever needs batch ids near the head
    (file-source replays are adjacent), so the trim also bounds the
    seen-set scan.

    ENFORCED append-only contract: every batch file's commit is
    resolved against the source's snapshot log (the sid is encoded in
    the ``data/s{N}`` path). Files written by ``replace`` commits
    (compaction — row-preserving rewrites, same rule the changelog
    applies at ``snapcat.changelog``) are always dropped, so running
    ``maintain`` on a streamed source no longer double-counts its
    rows into the view. Files from row-CHANGING commits (overwrite /
    merge / delete / rollback) cannot be folded as inserts:
    ``on_nonappend="error"`` (default) fails the stream loudly;
    ``"skip"`` drops them — the view then misses those updates (goes
    stale, never corrupt). Row-changing commits that write NO data
    files — pure merge-on-read delete-file commits, rollbacks,
    overwrites-to-empty — are invisible to a data-file tail, so the
    fold additionally scans the snapshot LOG (once at start, then per
    micro-batch) and applies the same error/skip policy to any such
    commit: without this a MOR delete would silently never subtract
    and the view would diverge forever, not merely go stale. For
    streams over mutating tables use the changelog-backed
    :func:`maintain_view_changelog` instead.

    Expired history: a batch file whose commit has been expired from
    the snapshot log resolves to no operation. On the FIRST fold of a
    fresh view (backfill) such a file is folded iff it is live in the
    source's current snapshot — live rows belong in the view no
    matter which commit wrote them, and expiry has already removed
    dead pre-compaction originals from disk, so no double count is
    possible. Once the view exists, unknown-commit files take the
    ``on_nonappend`` policy instead: a live-but-unknown file arriving
    mid-stream can be an expired compaction's rewrite of rows already
    folded, which folding again would double-count (keep the source's
    expire horizon longer than the trigger interval)."""
    import re

    from apache_iceberg_tables_migration_tool_spark.operators import ivm

    if on_nonappend not in ("error", "skip"):
        raise ValueError(f"on_nonappend must be 'error' or 'skip', got {on_nonappend!r}")

    #: commit kinds that preserve the table's row multiset
    _ROW_PRESERVING = ("append", "create", "replace", "alter")
    #: snapshots are immutable, so each sid's visibility verdict is
    #: computed once across the stream's lifetime — the per-batch cost
    #: is O(new commits), not O(history × manifest) every micro-batch
    _vetted: dict[int, bool] = {}

    def _check_invisible_row_changes() -> None:
        """Police the commits a data-file tail can never see: any
        row-changing commit that wrote no files under its own
        ``data/s{sid}`` directory (pure-MOR delete-file commits,
        rollback, overwrite-to-empty). Driver-side metadata scan of
        the already-loaded snapshot log; short-circuits per commit and
        memoizes per-sid verdicts."""
        src = catalog.table(src_database, src_table)
        if not src.exists():
            return
        for s in src.snapshots():
            ok = _vetted.get(s.snapshot_id)
            if ok is None:
                pref = f"data/s{s.snapshot_id:06d}/"
                ok = s.operation in _ROW_PRESERVING or any(
                    f.path.startswith(pref) for f in s.files
                )
                _vetted[s.snapshot_id] = ok
            if ok:
                continue  # row-preserving, or the batch-file policy polices it
            if on_nonappend == "error":
                raise RuntimeError(
                    f"maintain_view_stream: {src_database}.{src_table} snapshot "
                    f"{s.snapshot_id} (operation={s.operation}) changed rows "
                    "without writing data files, which a data-file tail cannot "
                    "observe — folding around it would corrupt the view "
                    "permanently, not merely let it go stale. Use the "
                    "changelog-backed maintain_view_changelog for mutating "
                    "sources, or pass on_nonappend='skip' to let the view "
                    "silently miss these row changes."
                )
            _log.warning(
                "maintain_view_stream: skipping invisible row-changing "
                "commit %s (operation=%s) on %s.%s — the view misses "
                "these row changes (on_nonappend='skip')",
                s.snapshot_id, s.operation, src_database, src_table,
            )
            return  # skip: accept staleness once, don't rescan the log

    _check_invisible_row_changes()  # no-new-files runs must fail too

    events = stream_catalog_appends(
        spark, catalog, src_database, src_table, max_files_per_trigger
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        vt = catalog.table(view_database, view_table)
        view_fresh = not (vt.exists() and vt.current_snapshot() is not None)
        if not view_fresh:
            seen = {s.summary.get("streaming.batch_id") for s in vt.snapshots()}
            if str(batch_id) in seen:
                return  # replayed micro-batch — view already folded
        _check_invisible_row_changes()
        # Resolve each batch file's commit against the snapshot log and
        # keep only genuinely-appended rows (driver-side metadata: one
        # distinct over the batch's file list, never the table).
        src = catalog.table(src_database, src_table)
        cur = src.current_snapshot()
        live = {f.path for f in cur.files} if cur is not None else set()
        ops = {s.snapshot_id: s.operation for s in src.snapshots()}
        paths = [
            r["p"]
            for r in batch_df.select(F.input_file_name().alias("p")).distinct().collect()
        ]

        def _sid(path: str) -> int | None:
            m = re.search(r"/data/s(\d+)/", path)
            return int(m.group(1)) if m else None

        drop_paths = []
        for p in paths:
            op = ops.get(_sid(p))
            if op is None:
                # commit expired from the log (see docstring): backfill
                # folds live files, everything else takes the policy
                rel = os.path.relpath(re.sub(r"^file:/*", "/", p), src.root)
                if view_fresh and rel in live:
                    continue
                if on_nonappend == "error":
                    state = "live" if rel in live else "no longer live"
                    raise RuntimeError(
                        f"maintain_view_stream: {src_database}.{src_table} file "
                        f"{p} was written by a commit already expired from the "
                        f"snapshot log (file is {state} in the current "
                        "snapshot); mid-stream the fold cannot prove it is a "
                        "pure append. Keep the source's expire_snapshots "
                        "horizon longer than the trigger interval, or pass "
                        "on_nonappend='skip'."
                    )
                drop_paths.append(p)
                continue
            if op in ("append", "create"):
                continue
            if op == "replace":  # compaction rewrite — rows already folded
                drop_paths.append(p)
                continue
            if on_nonappend == "error":
                raise RuntimeError(
                    f"maintain_view_stream: {src_database}.{src_table} file {p} "
                    f"was written by a non-append commit (operation={op}); the "
                    "fold cannot represent row changes as inserts. Use the "
                    "changelog-backed maintain_view_changelog for mutating "
                    "sources, or pass on_nonappend='skip' to let the view go "
                    "stale instead."
                )
            drop_paths.append(p)
        if drop_paths:
            _log.warning(
                "maintain_view_stream: dropping %d non-append batch file(s) "
                "of %s.%s from the fold (on_nonappend='skip' / compaction)",
                len(drop_paths), src_database, src_table,
            )
            if len(drop_paths) == len(paths):
                return  # nothing appended in this micro-batch
            batch_df = batch_df.where(~F.input_file_name().isin(drop_paths))
        delta = ivm.grouped_aggregate(batch_df, keys, sum_cols)
        if vt.exists() and vt.current_snapshot() is not None:
            base = vt.read(batch_df.sparkSession)
            refreshed = ivm.apply_agg_delta(base, delta, keys, sum_cols)
        else:
            refreshed = delta
        catalog.write(
            view_database, view_table, refreshed, mode="overwrite",
            summary_extra={"streaming.batch_id": str(batch_id)},
        )
        if view_keep_last is not None:
            catalog.expire_snapshots(
                view_database, view_table, keep_last=view_keep_last
            )

    return (
        events.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def refresh_view_changelog(
    spark: SparkSession,
    catalog,
    src_database: str,
    src_table: str,
    view_database: str,
    view_table: str,
    keys: list[str],
    sum_cols: list[str] | None = None,
    minmax_cols: list[str] | None = None,
    moment_cols: list[str] | None = None,
    distinct_col: str | None = None,
) -> int | None:
    """One incremental refresh of a materialized view driven by the
    source's row-level CHANGELOG (``SnapTable.changelog`` — ≙ folding
    an Iceberg ``create_changelog_view`` stream), the principled
    successor to the file-tail fold: append, copy-on-write upsert /
    delete, merge-on-read and rollback commits ALL maintain the view
    exactly, and ``replace`` (compaction) commits contribute nothing
    by construction.

    Views come in four kinds: ``sum_cols`` → COUNT/SUM rollup
    (self-maintainable, pure O(changed rows) fold); ``minmax_cols`` →
    COUNT/MIN/MAX (folds inserts in O(delta); deletes touching a
    group's extremum trigger an affected-group-only rescan via
    :func:`~...operators.ivm.apply_minmax_delta`); ``moment_cols`` →
    COUNT/Σv/Σv² raw moments (self-maintainable; derive AVG/VAR at
    read time with :func:`~...operators.ivm.derive_stats`);
    ``distinct_col`` → exact deletable COUNT(DISTINCT): the STORED
    view is the per-(group, value) counted auxiliary (itself a COUNT
    view, hence exactly self-maintainable where sketches can't
    subtract), and ``ivm.derive_distinct`` reads the distinct count
    off it. Exactly one must be given.

    Exactly-once without a separate checkpoint: the high-water mark
    (``ivm.src_snapshot_id``) rides IN the view's own commit summary,
    so refresh + watermark advance are one atomic commit — a crashed
    or replayed refresh re-reads the old watermark and either redoes
    the identical fold or no-ops. The initial build recomputes from
    the source head directly (cheaper and delete-history-proof vs
    replaying the full changelog).

    Returns the source snapshot id the view now reflects, or None if
    there was nothing to fold. Raises ``LookupError`` if the stored
    watermark snapshot has been expired from the source's history —
    keep the source's ``expire_snapshots`` horizon longer than the
    refresh cadence.
    """
    from apache_iceberg_tables_migration_tool_spark.operators import ivm

    if sum(
        k is not None for k in (sum_cols, minmax_cols, moment_cols, distinct_col)
    ) != 1:
        raise ValueError(
            "provide exactly one of sum_cols / minmax_cols / moment_cols / "
            "distinct_col"
        )
    src = catalog.table(src_database, src_table)
    head = src.current_snapshot()
    if head is None:
        return None
    vt = catalog.table(view_database, view_table)
    from_id = None
    if vt.exists() and vt.current_snapshot() is not None:
        wm = vt.current_snapshot().summary.get("ivm.src_snapshot_id")
        if wm is None:
            raise ValueError(
                f"{view_database}.{view_table} exists but carries no "
                "ivm.src_snapshot_id watermark — not a changelog-maintained "
                "view; refusing to overwrite it"
            )
        from_id = int(wm)
        if from_id == head.snapshot_id:
            return None  # already current
    if from_id is None:
        cur = src.read(spark, snapshot_id=head.snapshot_id)
        if sum_cols is not None:
            refreshed = ivm.grouped_aggregate(cur, keys, sum_cols)
        elif moment_cols is not None:
            refreshed = ivm.grouped_moments(cur, keys, moment_cols)
        elif distinct_col is not None:
            refreshed = ivm.grouped_distinct_aux(cur, keys, distinct_col)
        else:
            refreshed = ivm.grouped_minmax(cur, keys, minmax_cols)
    else:
        cl = src.changelog(spark, from_id, head.snapshot_id, net_changes=True)
        base = vt.read(spark)
        if sum_cols is not None:
            delta = ivm.agg_delta(cl, keys, sum_cols)
            refreshed = ivm.apply_agg_delta(base, delta, keys, sum_cols)
        elif moment_cols is not None:
            delta = ivm.moments_delta(cl, keys, moment_cols)
            refreshed = ivm.apply_moments_delta(base, delta, keys, moment_cols)
        elif distinct_col is not None:
            refreshed = ivm.apply_distinct_delta(base, cl, keys, distinct_col)
        else:
            cur = src.read(spark, snapshot_id=head.snapshot_id)
            refreshed = ivm.apply_minmax_delta(base, cl, cur, keys, minmax_cols)
    kind, vcols = next(
        (kn, vc)
        for kn, vc in (
            ("sum", sum_cols), ("minmax", minmax_cols),
            ("moments", moment_cols),
            ("distinct", [distinct_col] if distinct_col is not None else None),
        )
        if vc is not None
    )
    catalog.write(
        view_database, view_table, refreshed, mode="overwrite",
        summary_extra={
            "ivm.src_snapshot_id": str(head.snapshot_id),
            # view DEFINITION metadata: lets the aggregate-navigation
            # rewriter (plans/rewriter.py) discover this view and
            # prove a query can be answered from it
            "ivm.src": f"{src_database}.{src_table}",
            "ivm.keys": json.dumps(keys),
            "ivm.kind": kind,
            "ivm.cols": json.dumps(vcols),
        },
    )
    return head.snapshot_id


def _marker_feed_maintainer(
    spark: SparkSession,
    catalog,
    tables,
    do_refresh,
    view_database: str,
    view_table: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None,
    view_keep_last: int | None,
):
    """Shared chassis of the changelog-backed view maintainers: one
    synchronous refresh first (pre-marker history + immediate
    freshness), then a file-source tail over the UNION of the given
    tables' commit-marker feeds, each micro-batch re-running the
    refresh — folding watermark→head makes batching irrelevant and
    replays no-ops — and trimming the view history when something
    folded."""
    do_refresh()
    feeds = []
    for tbl in tables:
        mdir = os.path.join(tbl.root, "metadata", "commits")
        os.makedirs(mdir, exist_ok=True)  # pre-marker / pre-first-commit tables
        reader = spark.readStream.schema("snapshot_id long, operation string")
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        feeds.append(reader.option("pathGlobFilter", "*.json").json(mdir))
    events = feeds[0]
    for f in feeds[1:]:
        events = events.unionByName(f)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if do_refresh() is not None and view_keep_last is not None:
            catalog.expire_snapshots(
                view_database, view_table, keep_last=view_keep_last
            )

    return (
        events.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def refresh_topk_view(
    spark: SparkSession,
    catalog,
    src_database: str,
    src_table: str,
    view_database: str,
    view_table: str,
    keys: list[str],
    metric_col: str,
    id_col: str,
    k: int,
) -> int | None:
    """One incremental refresh of a TOP-K-per-group view (leaderboard
    — the k-generalization of the MIN/MAX kind, row-shaped so it gets
    its own entry point rather than a kind flag): inserts fold by
    re-ranking the stored rows plus the slice's inserted candidates
    (under pure inserts the boundary only rises, so evicted rows can
    never legally return); a delete matters only when it removes a
    STORED row, and exactly those groups rescan from the current
    state via :func:`~...operators.ivm.apply_topk_delta`'s pruned
    rescan (≤256 affected keys push down as a scan predicate).

    Same exactly-once watermark protocol as
    :func:`refresh_view_changelog`: ``ivm.src_snapshot_id`` rides in
    the view's own commit summary. Returns the source snapshot id the
    view now reflects, or None if nothing to fold."""
    from apache_iceberg_tables_migration_tool_spark.operators import ivm

    src = catalog.table(src_database, src_table)
    head = src.current_snapshot()
    if head is None:
        return None
    vt = catalog.table(view_database, view_table)
    from_id = None
    if vt.exists() and vt.current_snapshot() is not None:
        wm = vt.current_snapshot().summary.get("ivm.src_snapshot_id")
        if wm is None:
            raise ValueError(
                f"{view_database}.{view_table} exists but carries no "
                "ivm.src_snapshot_id watermark — not a changelog-maintained "
                "view; refusing to overwrite it"
            )
        from_id = int(wm)
        if from_id == head.snapshot_id:
            return None  # already current
    if from_id is None:
        cur = src.read(spark, snapshot_id=head.snapshot_id)
        refreshed = ivm.grouped_topk(cur, keys, metric_col, id_col, k)
    else:
        cl = src.changelog(spark, from_id, head.snapshot_id, net_changes=True)
        cur = src.read(spark, snapshot_id=head.snapshot_id)
        refreshed = ivm.apply_topk_delta(
            vt.read(spark), cl, cur, keys, metric_col, id_col, k
        )
    catalog.write(
        view_database, view_table, refreshed, mode="overwrite",
        summary_extra={
            "ivm.src_snapshot_id": str(head.snapshot_id),
            "ivm.src": f"{src_database}.{src_table}",
            "ivm.keys": json.dumps(keys),
            "ivm.kind": "topk",
            "ivm.metric": metric_col,
            "ivm.ids": json.dumps(
                [id_col] if isinstance(id_col, str) else list(id_col)
            ),
            "ivm.k": str(k),
        },
    )
    return head.snapshot_id


def _join_side_cols(
    ta, tb, ha, hb, on: list[str], needed: list[str], who: str
) -> tuple[list[str], list[str]]:
    """Project each join side to the columns the view actually needs:
    the join keys plus whichever non-key columns live on that side —
    narrow time-travel scans, and :func:`~...operators.ivm.join_delta`'s
    disjointness contract. Raises when a needed column exists on both
    sides or neither."""
    a_fields = set(ta.schema(snapshot_id=ha.snapshot_id).fieldNames())
    b_fields = set(tb.schema(snapshot_id=hb.snapshot_id).fieldNames())
    for c in needed:
        if (c in a_fields) == (c in b_fields):
            raise ValueError(
                f"{who}: column {c!r} must exist on exactly one "
                f"side of the join (in A: {c in a_fields}, in B: "
                f"{c in b_fields}) — rename/project the sources first"
            )
    a_cols = list(on) + [c for c in needed if c in a_fields]
    b_cols = list(on) + [c for c in needed if c in b_fields]
    return a_cols, b_cols


def _old_state(
    spark: SparkSession,
    tbl,
    wm: int,
    cols: list[str],
    other_cl: DataFrame | None,
    on: list[str],
) -> DataFrame:
    """Pre-slice state of one join side, pruned to the OTHER side's
    delta join keys where possible: by bilinearity each old state
    only ever joins that delta (never the other old state), and
    inner-join null semantics make key pruning exact. A numeric
    single-column join key prunes at the MANIFEST level — a
    ``read_where`` key-range scan skips files whose footer bounds
    can't contain any delta key (the 100 TB shape: a day's delta
    against a clustered fact table reads the overlapping files,
    not the table) — plus an exact ``isin`` filter when the
    delta's key set is small (probed with a limit-bounded
    collect, ≤257 rows on the driver). Everything else falls back
    to the plain time-travel read; when ``other_cl`` is None the
    returned frame is never executed at all."""
    from pyspark.sql import types as T

    def full():
        return tbl.read(spark, snapshot_id=wm).select(*cols)

    if other_cl is None or len(on) != 1:
        return full()
    k = on[0]
    if not isinstance(tbl.schema(snapshot_id=wm)[k].dataType, T.NumericType):
        return full()  # string footer stats may be truncated — no range trust
    # ONE delta-sized job answers emptiness + bounds + (approximately)
    # "is the key set small": min/max double as the non-null-key probe
    # (lo is NULL ⇔ no non-null delta keys ⇔ inner join is empty).
    # The exact ≤256-key probe job now runs ONLY when the approx
    # distinct count says it can pay off — a large delta (the common
    # refresh after a bulk append) skips it, halving the driver jobs
    # this helper costs. The gate is approximate but SOUND: if it
    # fires spuriously the probe just overflows 257 and we keep the
    # range prune; if it misses a genuinely small set we only lose the
    # isin sharpening, never correctness (rsd 5% ⇒ a true ≤256-key set
    # estimates well under the 384 gate).
    stats = other_cl.agg(
        F.min(k).alias("lo"),
        F.max(k).alias("hi"),
        F.approx_count_distinct(k).alias("nd"),
    ).first()
    if stats["lo"] is None:
        return full().limit(0)  # no non-null delta keys: nothing joins
    pruned = tbl.read_where(
        spark, [(k, ">=", stats["lo"]), (k, "<=", stats["hi"])],
        snapshot_id=wm,
    ).select(*cols)
    if stats["nd"] <= 384:
        probe = (
            other_cl.select(k).where(F.col(k).isNotNull())
            .distinct().limit(257).collect()
        )
        if len(probe) <= 256:
            pruned = pruned.where(F.col(k).isin([r[k] for r in probe]))
    return pruned


def _old_states_parallel(
    spark: SparkSession,
    ta, wm_a: int, a_cols: list[str], cl_b: DataFrame | None,
    tb, wm_b: int, b_cols: list[str], cl_a: DataFrame | None,
    on: list[str],
) -> tuple[DataFrame, DataFrame]:
    """Both join sides' pruned old states, computed concurrently.

    Each :func:`_old_state` call is an independent driver-blocking
    chain (it materializes the OTHER side's changelog checkpoint and
    runs a delta-sized stats agg), so submitting the two from a
    2-thread pool overlaps their jobs on the cluster instead of
    serializing them on the driver — actions are only sequential
    because the driver calls them sequentially (guide §2.6)."""
    with ThreadPoolExecutor(max_workers=2) as pool:
        fut_a = pool.submit(_old_state, spark, ta, wm_a, a_cols, cl_b, on)
        fut_b = pool.submit(_old_state, spark, tb, wm_b, b_cols, cl_a, on)
        return fut_a.result(), fut_b.result()


def refresh_join_view(
    spark: SparkSession,
    catalog,
    a_database: str,
    a_table: str,
    b_database: str,
    b_table: str,
    view_database: str,
    view_table: str,
    on: list[str],
    keys: list[str],
    sum_cols: list[str] | None = None,
    moment_cols: list[str] | None = None,
    minmax_cols: list[str] | None = None,
    distinct_col: str | None = None,
) -> tuple[int, int] | None:
    """One incremental refresh of a grouped rollup over the inner
    equi-join ``A ⋈ B``, driven by BOTH sides' changelogs — the
    two-table rung of the IVM ladder (single-table COUNT/SUM, MIN/MAX
    and moments live in :func:`refresh_view_changelog`). Four view
    kinds: ``sum_cols`` → COUNT/SUM; ``moment_cols`` → COUNT/Σv/Σv²
    raw moments (derive AVG/VAR at read time with
    :func:`~...operators.ivm.derive_stats`); ``distinct_col`` → the
    counted per-(group, value) auxiliary (read COUNT(DISTINCT) or
    exact quantiles off it) — all three self-maintainable under the
    signed joined delta; ``minmax_cols`` → COUNT/MIN/MAX,
    where a delete touching a group's extremum triggers
    :func:`~...operators.ivm.apply_minmax_delta`'s affected-group
    rescan with the NEW-state join as the rescan source — the ≤256
    affected-key predicate pushes through the join into both scans
    (Catalyst routes each group-key conjunct to the side that owns
    the column), so the rescan re-joins only damaged groups. Exactly
    one kind must be given. The joined delta comes from
    :func:`~...operators.ivm.join_delta`'s bilinearity identity, so a
    refresh joins only changed rows against the other side's
    (time-travel) old state — never the two full new states — and
    folds the signed result into the view with the same
    aggregate-sized merge as the single-table path.

    Watermarks for both sources ride in the view's own commit summary
    (``ivm.src_a_snapshot_id`` / ``ivm.src_b_snapshot_id``), so
    refresh + double watermark advance are one atomic commit: a
    crashed or replayed refresh redoes the identical fold or no-ops.
    The initial build joins the two heads directly. Appends, COW
    upserts/deletes, MOR commits and rollbacks on EITHER side all
    maintain the view exactly; compaction contributes nothing.

    ``keys``/``sum_cols`` may come from either side (join keys in
    ``on`` may also serve as group keys); every other referenced
    column must exist on exactly one side — the standard disjointness
    the join itself needs. Returns the (a, b) snapshot-id pair the
    view now reflects, or None if there was nothing to fold. Raises
    ``LookupError`` if a stored watermark has been expired from its
    source's history."""
    from apache_iceberg_tables_migration_tool_spark.operators import ivm

    kinds = (sum_cols, moment_cols, minmax_cols,
             [distinct_col] if distinct_col is not None else None)
    if sum(k is not None for k in kinds) != 1:
        raise ValueError(
            "provide exactly one of sum_cols / moment_cols / minmax_cols / "
            "distinct_col"
        )
    vcols = next(k for k in kinds if k is not None)
    ta = catalog.table(a_database, a_table)
    tb = catalog.table(b_database, b_table)
    ha, hb = ta.current_snapshot(), tb.current_snapshot()
    if ha is None or hb is None:
        return None
    vt = catalog.table(view_database, view_table)
    wm_a = wm_b = None
    if vt.exists() and vt.current_snapshot() is not None:
        s = vt.current_snapshot().summary
        if "ivm.src_a_snapshot_id" not in s or "ivm.src_b_snapshot_id" not in s:
            raise ValueError(
                f"{view_database}.{view_table} exists but carries no "
                "ivm.src_a/b_snapshot_id watermarks — not a join-maintained "
                "view; refusing to overwrite it"
            )
        wm_a = int(s["ivm.src_a_snapshot_id"])
        wm_b = int(s["ivm.src_b_snapshot_id"])
        if wm_a == ha.snapshot_id and wm_b == hb.snapshot_id:
            return None  # already current

    a_cols, b_cols = _join_side_cols(
        ta, tb, ha, hb, on, [c for c in (*keys, *vcols) if c not in on],
        "refresh_join_view",
    )

    if wm_a is None:
        a_new = ta.read(spark, snapshot_id=ha.snapshot_id).select(*a_cols)
        b_new = tb.read(spark, snapshot_id=hb.snapshot_id).select(*b_cols)
        joined = a_new.join(b_new, on)
        if sum_cols is not None:
            refreshed = ivm.grouped_aggregate(joined, keys, sum_cols)
        elif moment_cols is not None:
            refreshed = ivm.grouped_moments(joined, keys, moment_cols)
        elif distinct_col is not None:
            refreshed = ivm.grouped_distinct_aux(joined, keys, distinct_col)
        else:
            refreshed = ivm.grouped_minmax(joined, keys, minmax_cols)
    else:
        meta = ["_change_type"]
        # localCheckpoint: each slice is delta-sized and consumed up to
        # four times (key probe, bounds, two join terms) — materialize
        # once instead of replaying the changelog per consumer
        cl_a = (
            ta.changelog(spark, wm_a, ha.snapshot_id)
            .select(*a_cols, *meta).transform(pin)
            if wm_a != ha.snapshot_id
            else None
        )
        cl_b = (
            tb.changelog(spark, wm_b, hb.snapshot_id)
            .select(*b_cols, *meta).transform(pin)
            if wm_b != hb.snapshot_id
            else None
        )
        a_old, b_old = _old_states_parallel(
            spark, ta, wm_a, a_cols, cl_b, tb, wm_b, b_cols, cl_a, on
        )
        jd = ivm.join_delta(cl_a, a_old, cl_b, b_old, on)
        base = vt.read(spark)
        if sum_cols is not None:
            delta = ivm.agg_delta(jd, keys, sum_cols)
            refreshed = ivm.apply_agg_delta(base, delta, keys, sum_cols)
        elif moment_cols is not None:
            delta = ivm.moments_delta(jd, keys, moment_cols)
            refreshed = ivm.apply_moments_delta(base, delta, keys, moment_cols)
        elif distinct_col is not None:
            refreshed = ivm.apply_distinct_delta(base, jd, keys, distinct_col)
        else:
            # affected-group rescan source = the NEW-state join; the
            # bounded affected-key predicate pushes through the join
            # into both sides' scans, so only damaged groups re-join
            a_new = ta.read(spark, snapshot_id=ha.snapshot_id).select(*a_cols)
            b_new = tb.read(spark, snapshot_id=hb.snapshot_id).select(*b_cols)
            refreshed = ivm.apply_minmax_delta(
                base, jd, a_new.join(b_new, on), keys, minmax_cols
            )
    kind, kcols = next(
        (kn, vc)
        for kn, vc in (
            ("sum", sum_cols), ("moments", moment_cols),
            ("minmax", minmax_cols),
            ("distinct", [distinct_col] if distinct_col is not None else None),
        )
        if vc is not None
    )
    catalog.write(
        view_database, view_table, refreshed, mode="overwrite",
        summary_extra={
            "ivm.src_a_snapshot_id": str(ha.snapshot_id),
            "ivm.src_b_snapshot_id": str(hb.snapshot_id),
            "ivm.srcs": json.dumps(
                [f"{a_database}.{a_table}", f"{b_database}.{b_table}"]
            ),
            "ivm.ons": json.dumps([on]),
            "ivm.keys": json.dumps(keys),
            "ivm.kind": kind,
            "ivm.cols": json.dumps(kcols),
        },
    )
    return (ha.snapshot_id, hb.snapshot_id)


def maintain_join_view_changelog(
    spark: SparkSession,
    catalog,
    a_database: str,
    a_table: str,
    b_database: str,
    b_table: str,
    view_database: str,
    view_table: str,
    on: list[str],
    keys: list[str],
    sum_cols: list[str] | None = None,
    checkpoint_dir: str = None,
    moment_cols: list[str] | None = None,
    minmax_cols: list[str] | None = None,
    distinct_col: str | None = None,
    max_files_per_trigger: int | None = None,
    view_keep_last: int = 50,
):
    """Streaming wrapper around :func:`refresh_join_view` — the
    join-view twin of :func:`maintain_view_changelog`: a UNION of the
    two sources' commit-marker feeds drives discovery, so a commit on
    EITHER side (including metadata-only MOR deletes, rollbacks and
    WAP publishes via their ``.pub`` markers) wakes a fold; every
    micro-batch folds both changelogs from the view's per-side
    watermarks to the current heads, so batching never changes the
    result and replays no-op. One synchronous refresh runs before the
    stream starts (pre-marker history + immediate freshness). View
    kinds as in :func:`refresh_join_view`: exactly one of
    ``sum_cols`` / ``moment_cols`` / ``minmax_cols``."""
    if checkpoint_dir is None:
        raise ValueError("checkpoint_dir is required")
    kinds = dict(
        sum_cols=sum_cols, moment_cols=moment_cols, minmax_cols=minmax_cols,
        distinct_col=distinct_col,
    )

    def do_refresh():
        return refresh_join_view(
            spark, catalog, a_database, a_table, b_database, b_table,
            view_database, view_table, on, keys, **kinds,
        )

    return _marker_feed_maintainer(
        spark, catalog,
        [catalog.table(a_database, a_table), catalog.table(b_database, b_table)],
        do_refresh, view_database, view_table,
        checkpoint_dir, max_files_per_trigger, view_keep_last,
    )


def refresh_topk_join_view(
    spark: SparkSession,
    catalog,
    a_database: str,
    a_table: str,
    b_database: str,
    b_table: str,
    view_database: str,
    view_table: str,
    on: list[str],
    keys: list[str],
    metric_col: str,
    id_cols: list[str] | str,
    k: int,
) -> tuple[int, int] | None:
    """One incremental refresh of a TOP-K-per-group view over the
    inner equi-join ``A ⋈ B`` — the leaderboard completing the
    join-view family (COUNT/SUM, moments, MIN/MAX, distinct/quantile
    live in :func:`refresh_join_view`; the single-table leaderboard in
    :func:`refresh_topk_view`). The joined delta comes from
    :func:`~...operators.ivm.join_delta`'s bilinearity identity —
    only changed rows ever join the other side's (time-travel,
    key-pruned) old state — and folds with
    :func:`~...operators.ivm.apply_topk_delta` in ``collapse="net"``
    mode: a signed joined multiset has no commit order, and the same
    joined row can carry several +/− entries that must cancel exactly
    (both factor rows dying yields −1, −1, +1 = net −1).

    A joined row's identity is COMPOSITE — pass ``id_cols`` covering
    the finer side's primary key (e.g. ``["ok", "ln"]`` for
    orders ⋈ lineitem); together with the group keys it must identify
    each live joined row uniquely. Groups whose stored rows are
    touched rescan from the NEW-state join, pruned by the bounded
    affected-key predicate, which Catalyst pushes through the join
    into both sides' scans — only damaged groups re-join.

    Watermark protocol as :func:`refresh_join_view`
    (``ivm.src_a/b_snapshot_id`` ride in the view's own commit, so
    refresh + advance are atomic and replays no-op). Returns the
    (a, b) snapshot-id pair the view now reflects, or None if nothing
    to fold."""
    from apache_iceberg_tables_migration_tool_spark.operators import ivm

    ids = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    ta = catalog.table(a_database, a_table)
    tb = catalog.table(b_database, b_table)
    ha, hb = ta.current_snapshot(), tb.current_snapshot()
    if ha is None or hb is None:
        return None
    vt = catalog.table(view_database, view_table)
    wm_a = wm_b = None
    if vt.exists() and vt.current_snapshot() is not None:
        s = vt.current_snapshot().summary
        if "ivm.src_a_snapshot_id" not in s or "ivm.src_b_snapshot_id" not in s:
            raise ValueError(
                f"{view_database}.{view_table} exists but carries no "
                "ivm.src_a/b_snapshot_id watermarks — not a join-maintained "
                "view; refusing to overwrite it"
            )
        wm_a = int(s["ivm.src_a_snapshot_id"])
        wm_b = int(s["ivm.src_b_snapshot_id"])
        if wm_a == ha.snapshot_id and wm_b == hb.snapshot_id:
            return None  # already current
    a_cols, b_cols = _join_side_cols(
        ta, tb, ha, hb, on,
        [c for c in (*keys, metric_col, *ids) if c not in on],
        "refresh_topk_join_view",
    )
    a_new = ta.read(spark, snapshot_id=ha.snapshot_id).select(*a_cols)
    b_new = tb.read(spark, snapshot_id=hb.snapshot_id).select(*b_cols)
    if wm_a is None:
        refreshed = ivm.grouped_topk(a_new.join(b_new, on), keys, metric_col, ids, k)
    else:
        meta = ["_change_type"]
        cl_a = (
            ta.changelog(spark, wm_a, ha.snapshot_id)
            .select(*a_cols, *meta).transform(pin)
            if wm_a != ha.snapshot_id
            else None
        )
        cl_b = (
            tb.changelog(spark, wm_b, hb.snapshot_id)
            .select(*b_cols, *meta).transform(pin)
            if wm_b != hb.snapshot_id
            else None
        )
        a_old, b_old = _old_states_parallel(
            spark, ta, wm_a, a_cols, cl_b, tb, wm_b, b_cols, cl_a, on
        )
        jd = ivm.join_delta(cl_a, a_old, cl_b, b_old, on)
        refreshed = ivm.apply_topk_delta(
            vt.read(spark), jd, a_new.join(b_new, on),
            keys, metric_col, ids, k, collapse="net",
        )
    catalog.write(
        view_database, view_table, refreshed, mode="overwrite",
        summary_extra={
            "ivm.src_a_snapshot_id": str(ha.snapshot_id),
            "ivm.src_b_snapshot_id": str(hb.snapshot_id),
            "ivm.srcs": json.dumps(
                [f"{a_database}.{a_table}", f"{b_database}.{b_table}"]
            ),
            "ivm.ons": json.dumps([on]),
            "ivm.keys": json.dumps(keys),
            "ivm.kind": "topk",
            "ivm.metric": metric_col,
            "ivm.ids": json.dumps(ids),
            "ivm.k": str(k),
        },
    )
    return (ha.snapshot_id, hb.snapshot_id)


def _df_key_pruned(df: DataFrame, cl: DataFrame | None, on: list[str]) -> DataFrame:
    """DataFrame-level twin of :func:`_old_state`'s key pruning for
    ACCUMULATED old states (a join of several tables, so there is no
    single manifest to range-scan): filter to the partner delta's
    join keys — ≤256 distinct keys become an exact ``isin`` Catalyst
    pushes through the join into the owning table's scan, larger
    deltas a [min, max] range filter (exact as a filter: a row
    outside the delta's key range cannot equal any delta key).
    Inner-join null semantics make both prunes exact. Multi-column
    keys fall back to the unpruned frame — the optimizer still sees
    the delta-sized probe side and plans a broadcast join."""
    if cl is None or len(on) != 1:
        return df
    k = on[0]
    # One delta-sized job answers emptiness + bounds + (approximately)
    # key-set size — the exact ≤256-key probe runs only when the
    # approx distinct count says it can pay off (same single-agg shape
    # and soundness argument as _old_state: a spurious gate fire just
    # overflows the probe; a miss only forgoes the isin sharpening).
    # Bulk deltas — where the probe's distinct shuffle is priciest —
    # now cost ONE job here instead of two.
    stats = cl.agg(
        F.min(k).alias("lo"),
        F.max(k).alias("hi"),
        F.approx_count_distinct(k).alias("nd"),
    ).first()
    if stats["lo"] is None:
        return df.limit(0)  # no non-null delta keys: the term is empty
    if stats["nd"] <= 384:
        probe = (
            cl.select(k).where(F.col(k).isNotNull()).distinct().limit(257).collect()
        )
        if len(probe) <= 256:
            return df.where(F.col(k).isin([r[k] for r in probe]))
    return df.where((F.col(k) >= stats["lo"]) & (F.col(k) <= stats["hi"]))


def refresh_join_chain_view(
    spark: SparkSession,
    catalog,
    tables: list[tuple[str, str]],
    view_database: str,
    view_table: str,
    ons: list[list[str]],
    keys: list[str],
    sum_cols: list[str] | None = None,
    moment_cols: list[str] | None = None,
    minmax_cols: list[str] | None = None,
    distinct_col: str | None = None,
) -> tuple[int, ...] | None:
    """One incremental refresh of a grouped rollup over an N-WAY join
    chain ``T0 ⋈ T1 ⋈ … ⋈ Tn−1`` (star schemas included — step ``s``
    joins the accumulated left side with ``tables[s+1]`` on
    ``ons[s]``, whose key may live on ANY left table), driven by ALL
    sides' changelogs. The delta comes from composing the bilinearity
    identity with ITSELF: :func:`~...operators.ivm.join_delta` emits
    a changelog-shaped signed multiset, so the fold feeds each step's
    output back in as the left-hand changelog of the next step —
    sign products associate, and the recursion expands to exactly the
    2ⁿ−1 multilinear terms that each touch at least one delta. Work
    per term is O(changed rows × their matches): old-state factors
    never join each other without a delta bound somewhere in the
    term, the per-table old scans are manifest-range-pruned against
    their partner delta (:func:`_old_state`), accumulated old joins
    are key-pruned with exact ``isin``/range filters
    (:func:`_df_key_pruned`), and each intermediate delta is
    lazily checkpointed — it is consumed by two join terms plus the
    next step's pruning probes, and must not replay the upstream
    delta join per consumer.

    View kinds as :func:`refresh_join_view` (COUNT/SUM, raw moments,
    COUNT/MIN/MAX with rescan-through-the-join, counted distinct
    auxiliary); exactly one must be given. Non-key columns must each
    exist on exactly one table; every ``ons[s]`` key must exist on
    ``tables[s+1]`` and on exactly one of ``tables[0..s]``.

    One watermark per table (``ivm.src_{i}_snapshot_id``) rides in
    the view's own commit summary — refresh + N watermark advances
    are one atomic commit, replays no-op. Returns the tuple of
    snapshot ids the view now reflects, or None if nothing to fold."""
    from apache_iceberg_tables_migration_tool_spark.operators import ivm

    n = len(tables)
    if n < 2:
        raise ValueError("refresh_join_chain_view needs at least two tables")
    if len(ons) != n - 1:
        raise ValueError(f"expected {n - 1} join-key lists, got {len(ons)}")
    kinds = (sum_cols, moment_cols, minmax_cols,
             [distinct_col] if distinct_col is not None else None)
    if sum(k is not None for k in kinds) != 1:
        raise ValueError(
            "provide exactly one of sum_cols / moment_cols / minmax_cols / "
            "distinct_col"
        )
    vcols = next(k for k in kinds if k is not None)

    tbls = [catalog.table(db, t) for db, t in tables]
    heads = [t.current_snapshot() for t in tbls]
    if any(h is None for h in heads):
        return None
    vt = catalog.table(view_database, view_table)
    wms: list[int | None] = [None] * n
    if vt.exists() and vt.current_snapshot() is not None:
        s = vt.current_snapshot().summary
        names = [f"ivm.src_{i}_snapshot_id" for i in range(n)]
        if any(nm not in s for nm in names):
            raise ValueError(
                f"{view_database}.{view_table} exists but carries no "
                f"{names} watermarks — not a chain-maintained view; "
                "refusing to overwrite it"
            )
        wms = [int(s[nm]) for nm in names]
        if all(w == h.snapshot_id for w, h in zip(wms, heads)):
            return None  # already current

    # column ownership: each non-key column on exactly one table; each
    # step key on the right table and exactly one left table
    fields = [
        set(t.schema(snapshot_id=h.snapshot_id).fieldNames())
        for t, h in zip(tbls, heads)
    ]
    all_on = {k for on_s in ons for k in on_s}
    cols: list[dict] = [dict() for _ in range(n)]  # ordered col sets
    for c in (*keys, *vcols):
        if c in all_on:
            continue
        owners = [i for i in range(n) if c in fields[i]]
        if len(owners) != 1:
            raise ValueError(
                f"refresh_join_chain_view: column {c!r} must exist on exactly "
                f"one table (owners: {[tables[i] for i in owners]}) — "
                "rename/project the sources first"
            )
        cols[owners[0]][c] = True
    for s_i, on_s in enumerate(ons):
        right = s_i + 1
        for k in on_s:
            if k not in fields[right]:
                raise ValueError(
                    f"refresh_join_chain_view: step-{s_i} key {k!r} missing "
                    f"from right table {tables[right]}"
                )
            owners = [i for i in range(right) if k in fields[i]]
            if len(owners) != 1:
                raise ValueError(
                    f"refresh_join_chain_view: step-{s_i} key {k!r} must "
                    f"exist on exactly one of tables[0..{s_i}] (owners: "
                    f"{[tables[i] for i in owners]})"
                )
            cols[right][k] = True
            cols[owners[0]][k] = True
    col_lists = [list(c) for c in cols]

    def new_state(i: int) -> DataFrame:
        return tbls[i].read(
            spark, snapshot_id=heads[i].snapshot_id
        ).select(*col_lists[i])

    if wms[0] is None:
        joined = new_state(0)
        for s_i in range(1, n):
            joined = joined.join(new_state(s_i), ons[s_i - 1])
        if sum_cols is not None:
            refreshed = ivm.grouped_aggregate(joined, keys, sum_cols)
        elif moment_cols is not None:
            refreshed = ivm.grouped_moments(joined, keys, moment_cols)
        elif distinct_col is not None:
            refreshed = ivm.grouped_distinct_aux(joined, keys, distinct_col)
        else:
            refreshed = ivm.grouped_minmax(joined, keys, minmax_cols)
    else:
        cls = [
            tbls[i].changelog(spark, wms[i], heads[i].snapshot_id)
            .select(*col_lists[i], "_change_type").transform(pin)
            if wms[i] != heads[i].snapshot_id
            else None
            for i in range(n)
        ]
        l_cl = cls[0]
        l_old = tbls[0].read(spark, snapshot_id=wms[0]).select(*col_lists[0])
        for s_i in range(1, n):
            on_s = ons[s_i - 1]
            r_cl = cls[s_i]
            if l_cl is not None or r_cl is not None:
                # the right table's manifest-pruned old state (stats agg
                # over the LEFT delta) and the accumulated left old
                # state's key prune (stats agg over the RIGHT delta) are
                # independent driver-blocking chains — overlap them,
                # same §2.6 shape as refresh_join_view's two sides
                with ThreadPoolExecutor(max_workers=2) as pool:
                    fut_r = pool.submit(
                        _old_state,
                        spark, tbls[s_i], wms[s_i], col_lists[s_i], l_cl, on_s,
                    )
                    fut_l = pool.submit(_df_key_pruned, l_old, r_cl, on_s)
                    r_pruned = fut_r.result()
                    l_old_pruned = fut_l.result()
                new_cl = ivm.join_delta(
                    l_cl, l_old_pruned, r_cl, r_pruned, on_s
                ).transform(pin)
            else:
                new_cl = None
            # the UNPRUNED accumulation — later steps prune it against
            # their own partner deltas at use time
            l_old = l_old.join(
                tbls[s_i].read(spark, snapshot_id=wms[s_i])
                .select(*col_lists[s_i]),
                on_s,
            )
            l_cl = new_cl
        base = vt.read(spark)
        if sum_cols is not None:
            delta = ivm.agg_delta(l_cl, keys, sum_cols)
            refreshed = ivm.apply_agg_delta(base, delta, keys, sum_cols)
        elif moment_cols is not None:
            delta = ivm.moments_delta(l_cl, keys, moment_cols)
            refreshed = ivm.apply_moments_delta(base, delta, keys, moment_cols)
        elif distinct_col is not None:
            refreshed = ivm.apply_distinct_delta(base, l_cl, keys, distinct_col)
        else:
            cur = new_state(0)
            for s_i in range(1, n):
                cur = cur.join(new_state(s_i), ons[s_i - 1])
            refreshed = ivm.apply_minmax_delta(base, l_cl, cur, keys, minmax_cols)
    kind = next(
        kn
        for kn, vc in (
            ("sum", sum_cols), ("moments", moment_cols),
            ("minmax", minmax_cols),
            ("distinct", [distinct_col] if distinct_col is not None else None),
        )
        if vc is not None
    )
    summary = {
        f"ivm.src_{i}_snapshot_id": str(heads[i].snapshot_id) for i in range(n)
    }
    summary.update({
        "ivm.srcs": json.dumps([f"{db}.{t}" for db, t in tables]),
        "ivm.ons": json.dumps(ons),
        "ivm.keys": json.dumps(keys),
        "ivm.kind": kind,
        "ivm.cols": json.dumps(vcols),
    })
    catalog.write(
        view_database, view_table, refreshed, mode="overwrite",
        summary_extra=summary,
    )
    return tuple(h.snapshot_id for h in heads)


def maintain_join_chain_view_changelog(
    spark: SparkSession,
    catalog,
    tables: list[tuple[str, str]],
    view_database: str,
    view_table: str,
    ons: list[list[str]],
    keys: list[str],
    checkpoint_dir: str,
    sum_cols: list[str] | None = None,
    moment_cols: list[str] | None = None,
    minmax_cols: list[str] | None = None,
    distinct_col: str | None = None,
    max_files_per_trigger: int | None = None,
    view_keep_last: int = 50,
):
    """Streaming wrapper around :func:`refresh_join_chain_view`: a
    UNION of ALL chain tables' commit-marker feeds drives discovery,
    so a commit on any side wakes a fold with the usual
    fold-to-heads / replay-no-op semantics."""
    kinds = dict(
        sum_cols=sum_cols, moment_cols=moment_cols, minmax_cols=minmax_cols,
        distinct_col=distinct_col,
    )

    def do_refresh():
        return refresh_join_chain_view(
            spark, catalog, tables, view_database, view_table, ons, keys,
            **kinds,
        )

    return _marker_feed_maintainer(
        spark, catalog, [catalog.table(db, t) for db, t in tables],
        do_refresh, view_database, view_table,
        checkpoint_dir, max_files_per_trigger, view_keep_last,
    )


def maintain_topk_join_view_changelog(
    spark: SparkSession,
    catalog,
    a_database: str,
    a_table: str,
    b_database: str,
    b_table: str,
    view_database: str,
    view_table: str,
    on: list[str],
    keys: list[str],
    metric_col: str,
    id_cols: list[str] | str,
    k: int,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    view_keep_last: int = 50,
):
    """Streaming wrapper around :func:`refresh_topk_join_view`: the
    joined leaderboard stays fresh off the UNION of both sources'
    commit-marker feeds, with the same fold-to-head / replay-no-op
    semantics as the other changelog maintainers."""

    def do_refresh():
        return refresh_topk_join_view(
            spark, catalog, a_database, a_table, b_database, b_table,
            view_database, view_table, on, keys, metric_col, id_cols, k,
        )

    return _marker_feed_maintainer(
        spark, catalog,
        [catalog.table(a_database, a_table), catalog.table(b_database, b_table)],
        do_refresh, view_database, view_table,
        checkpoint_dir, max_files_per_trigger, view_keep_last,
    )


def refresh_view_auto(spark: SparkSession, catalog, view_database: str,
                      view_table: str):
    """Refresh ANY maintained view from its own stamped definition —
    every refresh protocol records the view's source(s), join keys,
    group keys, kind and columns in the view's commit summary, so a
    scheduler (or `query-aggregate --refresh-stale`) needs only the
    view's name: read the metadata, dispatch to the matching
    refresher. Raises ``ValueError`` for tables that carry no
    definition (pre-metadata views or non-view tables — never guess).
    Returns whatever the dispatched refresher returns."""
    vt = catalog.table(view_database, view_table)
    cur = vt.current_snapshot() if vt.exists() else None
    s = cur.summary if cur is not None else {}
    kind = s.get("ivm.kind")
    if kind is None:
        raise ValueError(
            f"{view_database}.{view_table} carries no ivm.* definition "
            "metadata — not an auto-refreshable maintained view"
        )
    keys = json.loads(s["ivm.keys"])
    if "ivm.srcs" in s:
        srcs = [tuple(x.split(".", 1)) for x in json.loads(s["ivm.srcs"])]
        ons = json.loads(s["ivm.ons"])
        if kind == "topk":
            if len(srcs) != 2:
                raise ValueError("top-k join views are two-table")
            return refresh_topk_join_view(
                spark, catalog, *srcs[0], *srcs[1], view_database, view_table,
                on=ons[0], keys=keys, metric_col=s["ivm.metric"],
                id_cols=json.loads(s["ivm.ids"]), k=int(s["ivm.k"]),
            )
        cols = json.loads(s["ivm.cols"])
        kinds = {
            "sum": dict(sum_cols=cols), "moments": dict(moment_cols=cols),
            "minmax": dict(minmax_cols=cols),
            "distinct": dict(distinct_col=cols[0]),
        }[kind]
        # two-table views use the a/b watermark protocol; longer
        # chains (or 2-chains built by the chain refresher) the
        # positional one — the stamped watermark names disambiguate
        if len(srcs) == 2 and "ivm.src_a_snapshot_id" in s:
            return refresh_join_view(
                spark, catalog, *srcs[0], *srcs[1], view_database, view_table,
                on=ons[0], keys=keys, **kinds,
            )
        return refresh_join_chain_view(
            spark, catalog, list(srcs), view_database, view_table,
            ons=ons, keys=keys, **kinds,
        )
    src_db, src_tbl = s["ivm.src"].split(".", 1)
    if kind == "topk":
        return refresh_topk_view(
            spark, catalog, src_db, src_tbl, view_database, view_table,
            keys=keys, metric_col=s["ivm.metric"],
            id_col=json.loads(s["ivm.ids"]), k=int(s["ivm.k"]),
        )
    if kind == "ann_cells":
        return refresh_ann_index(
            spark, catalog, src_db, src_tbl, view_database, view_table,
            s["ann.centroids"], id_col=s["ann.id_col"],
            vec_col=s["ann.vec_col"],
        )
    cols = json.loads(s["ivm.cols"])
    kinds = {
        "sum": dict(sum_cols=cols), "moments": dict(moment_cols=cols),
        "minmax": dict(minmax_cols=cols),
        "distinct": dict(distinct_col=cols[0]),
    }[kind]
    return refresh_view_changelog(
        spark, catalog, src_db, src_tbl, view_database, view_table,
        keys=keys, **kinds,
    )


def maintain_view_auto(
    spark: SparkSession,
    catalog,
    view_database: str,
    view_table: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    view_keep_last: int = 50,
):
    """Streaming maintenance for ANY maintained view from its own
    stamped definition: the source tables come out of the view's
    ``ivm.src``/``ivm.srcs`` metadata, their commit-marker feeds
    drive discovery, and every micro-batch re-runs
    :func:`refresh_view_auto` — one maintainer for every view kind
    the engine can define. The view must already exist (one
    synchronous refresh created it and stamped the definition)."""
    vt = catalog.table(view_database, view_table)
    cur = vt.current_snapshot() if vt.exists() else None
    s = cur.summary if cur is not None else {}
    if "ivm.kind" not in s:
        raise ValueError(
            f"{view_database}.{view_table} carries no ivm.* definition "
            "metadata — create it with a refresh_* call first"
        )
    srcs = (
        json.loads(s["ivm.srcs"]) if "ivm.srcs" in s else [s["ivm.src"]]
    )
    tables = [catalog.table(*x.split(".", 1)) for x in srcs]

    def do_refresh():
        return refresh_view_auto(spark, catalog, view_database, view_table)

    return _marker_feed_maintainer(
        spark, catalog, tables, do_refresh, view_database, view_table,
        checkpoint_dir, max_files_per_trigger, view_keep_last,
    )


def maintain_topk_view_changelog(
    spark: SparkSession,
    catalog,
    src_database: str,
    src_table: str,
    view_database: str,
    view_table: str,
    keys: list[str],
    metric_col: str,
    id_col: str,
    k: int,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    view_keep_last: int = 50,
):
    """Streaming wrapper around :func:`refresh_topk_view`: the
    leaderboard stays fresh off the source's commit-marker feed with
    the same fold-to-head / replay-no-op semantics as the other
    changelog maintainers."""

    def do_refresh():
        return refresh_topk_view(
            spark, catalog, src_database, src_table,
            view_database, view_table, keys, metric_col, id_col, k,
        )

    return _marker_feed_maintainer(
        spark, catalog, [catalog.table(src_database, src_table)],
        do_refresh, view_database, view_table,
        checkpoint_dir, max_files_per_trigger, view_keep_last,
    )


def maintain_view_changelog(
    spark: SparkSession,
    catalog,
    src_database: str,
    src_table: str,
    view_database: str,
    view_table: str,
    keys: list[str],
    checkpoint_dir: str,
    sum_cols: list[str] | None = None,
    minmax_cols: list[str] | None = None,
    moment_cols: list[str] | None = None,
    distinct_col: str | None = None,
    max_files_per_trigger: int | None = None,
    view_keep_last: int = 50,
):
    """Streaming wrapper around :func:`refresh_view_changelog`: a
    file-source tail over the source's COMMIT-MARKER feed
    (``metadata/commits/s{N}.json`` — one immutable file per commit,
    ≙ Iceberg's versioned metadata files) is used purely as commit
    discovery; every micro-batch folds the changelog from the view's
    watermark to the CURRENT published head, so batching never
    changes the result and replays no-op on the watermark. Unlike
    :func:`maintain_view_stream` this stays exact under compaction,
    COW upserts/deletes and MOR commits — and because markers fire
    for EVERY commit kind, metadata-only commits (rollback, pure-MOR
    equality deletes, alter) wake the fold too, closing the old
    data-file tail's trigger-lag hole.

    One synchronous refresh runs before the stream starts: it covers
    commits that predate the marker feed (tables from older layouts)
    and makes the view current immediately. WAP: a staged commit's
    marker wakes a refresh that no-ops until publish, and the publish
    itself — a pointer-only commit that appends no snapshot — writes
    a distinct ``s{N}.pub.json`` marker (``_write_publish_marker``),
    so the published rows fold immediately instead of waiting for the
    next real commit."""
    kinds = dict(
        sum_cols=sum_cols, minmax_cols=minmax_cols, moment_cols=moment_cols,
        distinct_col=distinct_col,
    )

    def do_refresh():
        return refresh_view_changelog(
            spark, catalog, src_database, src_table,
            view_database, view_table, keys, **kinds,
        )

    return _marker_feed_maintainer(
        spark, catalog, [catalog.table(src_database, src_table)],
        do_refresh, view_database, view_table,
        checkpoint_dir, max_files_per_trigger, view_keep_last,
    )


def refresh_ann_index(
    spark: SparkSession,
    catalog,
    src_database: str,
    src_table: str,
    index_database: str,
    cells_table: str,
    centroids_table: str,
    nlist: int = 64,
    train_sample: int = 100_000,
    iters: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    compact_after_deletes: int | None = 8,
) -> int | None:
    """One incremental refresh of a persisted IVF ANN index
    (`similarity.ivf_index` shape: a ``cells`` assignment table
    partitioned by cell plus a frozen ``centroids`` quantizer) driven
    by the embedding table's row-level changelog — the vector twin of
    :func:`refresh_view_changelog`: the index is just another
    maintained view, so a mutating corpus keeps its ANN index fresh in
    O(changed vectors) instead of re-clustering 100 TB of embeddings
    per batch.

    First call builds the index from the source's current state
    (trains the seeded spherical k-means quantizer once). Every later
    call folds the changelog slice from the index's own watermark:
    deleted/updated ids drop out of ``cells`` by anti-join, inserted
    vectors are assigned against the FROZEN persisted quantizer in one
    Arrow pass (`similarity.assign_cells`) — assignment is pure
    arithmetic, so the maintained table is bit-identical to a full
    re-assignment of the final state against the same centroids
    (pinned by the `ann_index_maintenance` carrier). Freezing the
    quantizer is standard IVF practice: cell QUALITY can drift as the
    corpus distribution shifts (recall, not correctness); retrain by
    dropping the index tables and rebuilding.

    Exactly-once via the same protocol as every other maintained view:
    the watermark (``ivm.src_snapshot_id``) rides in the cells table's
    own commit summary, together with an ``ivm.kind="ann_cells"``
    definition stamp so :func:`refresh_view_auto` /
    :func:`maintain_view_auto` can drive it by name. Returns the
    source snapshot id the index now reflects, or None if current.
    """
    from apache_iceberg_tables_migration_tool_spark.operators import similarity

    src = catalog.table(src_database, src_table)
    head = src.current_snapshot()
    if head is None:
        return None
    ct = catalog.table(index_database, cells_table)
    from_id = None
    if ct.exists() and ct.current_snapshot() is not None:
        s = ct.current_snapshot().summary
        wm = s.get("ivm.src_snapshot_id")
        if wm is None or s.get("ivm.kind") != "ann_cells":
            raise ValueError(
                f"{index_database}.{cells_table} exists but carries no "
                "ann_cells definition stamp — not a maintained ANN index; "
                "refusing to overwrite it"
            )
        from_id = int(wm)
        if from_id == head.snapshot_id:
            return None  # already current
    stamp = {
        "ivm.src_snapshot_id": str(head.snapshot_id),
        "ivm.src": f"{src_database}.{src_table}",
        "ivm.kind": "ann_cells",
        "ivm.keys": json.dumps([id_col]),
        "ivm.cols": json.dumps([vec_col]),
        "ann.centroids": centroids_table,
        "ann.id_col": id_col,
        "ann.vec_col": vec_col,
    }
    if from_id is None:
        cur = src.read(spark, snapshot_id=head.snapshot_id)
        cells, centroids = similarity.ivf_index(
            cur, nlist, train_sample, iters, seed, id_col, vec_col
        )
        # centroids first: a crash between the writes leaves a
        # quantizer without cells, and the next refresh (cells absent)
        # simply rebuilds both — never a stamped-but-stale index. The
        # rebuild OVERWRITES: an append onto the crashed attempt's
        # centroids would leave duplicate cell rows and fail the
        # contiguity check in centroid_matrix (self-review find)
        catalog.write(index_database, centroids_table, centroids, mode="overwrite")
        catalog.write(
            index_database, cells_table, cells,
            partition_by=["cell"], summary_extra=stamp,
        )
        return head.snapshot_id
    cl = src.changelog(spark, from_id, head.snapshot_id, net_changes=True)
    cent_df = catalog.table(index_database, centroids_table).read(spark)
    cent = similarity.centroid_matrix(cent_df)
    changed = cl.select(F.col(id_col).alias("vec_id")).distinct()
    # collapse intra-slice churn to each id's LAST change (commit order,
    # insert outranking delete within one commit, the apply_topk_delta
    # rule): a vector born AND killed inside the slice nets to two
    # changelog rows — folding its insert would resurrect a dead id in
    # the index forever (caught by test_maintain_ann_index_stream)
    from pyspark.sql import Window as _W

    last = cl.withColumn(
        "__rn",
        F.row_number().over(
            _W.partitionBy(id_col).orderBy(
                F.col("_commit_order").desc(), F.col("_change_type").desc()
            )
        ),
    ).where(F.col("__rn") == 1)
    ins = last.where(F.col("_change_type") == "insert").select(id_col, vec_col)
    assigned = similarity.assign_cells(ins, cent, id_col, vec_col)
    # Fold the delta as MOR equality-delete(changed ids) + append(new
    # assignments): the data plane writes O(changed vectors), not
    # O(index size) — a small delta into a billion-vector index costs
    # the delta (ADVICE r8; the same append+delete_keys pattern the
    # other maintained views use). Two commits, crash-exact: the
    # delete commit carries the OLD watermark, so a crash before the
    # append replays the same slice — re-deleting absent ids is a
    # no-op and the re-append lands the identical rows. Read side is
    # unchanged (anti-join semantics ≡ the old full overwrite, pinned
    # by ann_index_maintenance); equality-delete files accumulate
    # until the bounded self-compaction below (VERDICT r9 #4).
    if not changed.isEmpty():
        catalog.delete_keys(
            index_database, cells_table, changed, key_cols=["vec_id"],
            summary_extra={**stamp, "ivm.src_snapshot_id": str(from_id)},
        )
    catalog.write(
        index_database, cells_table, assigned.select("vec_id", "cell"),
        mode="append", partition_by=["cell"], summary_extra=stamp,
    )
    # Bounded read amplification for a LONG-RUNNING maintained index:
    # every refresh with deletes adds one equality-delete file that
    # every later cell scan must anti-join. Once the live delete-file
    # count reaches the bound, materialize them with one compaction
    # rewrite — O(index)/K amortized per refresh, and the commit
    # CARRIES the ivm/ann definition stamp (a bare compact would wipe
    # the watermark and brick the maintainer). maintain.* policies on
    # the cells table (`maintain.compact.max-delete-files`) do the
    # same from the nightly auto_maintain sweep.
    if compact_after_deletes is not None:
        head_cells = catalog.table(index_database, cells_table).current_snapshot()
        if len(head_cells.delete_files) >= compact_after_deletes:
            catalog.compact(
                index_database, cells_table, spark, summary_extra=stamp
            )
    return head.snapshot_id


def maintain_ann_index(
    spark: SparkSession,
    catalog,
    src_database: str,
    src_table: str,
    index_database: str,
    cells_table: str,
    centroids_table: str,
    checkpoint_dir: str,
    nlist: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_files_per_trigger: int | None = None,
    view_keep_last: int = 50,
):
    """Streaming wrapper around :func:`refresh_ann_index`: the ANN
    index stays fresh off the embedding table's commit-marker feed
    with the same fold-to-head / replay-no-op semantics as the other
    changelog maintainers — appends, COW upserts/deletes and MOR
    deletes all keep the persisted index exact in O(changed vectors)
    per micro-batch."""

    def do_refresh():
        return refresh_ann_index(
            spark, catalog, src_database, src_table,
            index_database, cells_table, centroids_table,
            nlist=nlist, id_col=id_col, vec_col=vec_col,
        )

    return _marker_feed_maintainer(
        spark, catalog, [catalog.table(src_database, src_table)],
        do_refresh, index_database, cells_table,
        checkpoint_dir, max_files_per_trigger, view_keep_last,
    )


def maintain_sync(
    spark: SparkSession,
    src_catalog,
    dst_catalog,
    database: str,
    table: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """STREAMING continuous replication: tail the source table's
    commit-marker feed and run :func:`plans.migrator.sync_history`
    per micro-batch — every source commit (append, COW/MOR
    delete, compaction, rollback, even metadata-only alters, since
    markers fire for every commit kind) replicates onto the target
    within a trigger interval, each replicated commit landing with
    its ``replayed-from`` watermark so crash/replay semantics are the
    sync's own (resume mid-history, re-runs no-op). One synchronous
    sync runs before the stream starts (pre-marker history +
    immediate convergence). The mirror's history is NEVER trimmed —
    a replica must preserve the replayed timeline."""
    from apache_iceberg_tables_migration_tool_spark.plans.migrator import (
        sync_history,
    )

    def do_refresh():
        return sync_history(spark, src_catalog, dst_catalog, database, table)

    return _marker_feed_maintainer(
        spark, dst_catalog, [src_catalog.table(database, table)],
        do_refresh, database, table,
        checkpoint_dir, max_files_per_trigger, view_keep_last=None,
    )


def ann_index_report(
    spark: SparkSession,
    catalog,
    index_database: str,
    cells_table: str,
) -> DataFrame:
    """Health report for a maintained ANN index — the observability
    twin of ``scan_report``: per-cell vector counts plus, repeated on
    every row for one-DataFrame ergonomics, the quantizer's balance
    factor (max cell share × nlist — 1.0 is perfectly balanced; a
    frozen quantizer drifts as the corpus shifts, and a high factor
    means candidate buckets are going quadratic) and the index's
    staleness in SOURCE COMMITS behind the current head (0 = fresh).
    Drives the retrain/refresh decision a production vector store
    automates: refresh when stale, rebuild when imbalanced."""
    ct = catalog.table(index_database, cells_table)
    cur = ct.current_snapshot() if ct.exists() else None
    s = cur.summary if cur is not None else {}
    if s.get("ivm.kind") != "ann_cells":
        raise ValueError(
            f"{index_database}.{cells_table} is not a maintained ANN index"
        )
    src_db, src_tbl = s["ivm.src"].split(".", 1)
    src = catalog.table(src_db, src_tbl)
    wm = int(s["ivm.src_snapshot_id"])
    behind = len([x for x in src.main_chain() if x.snapshot_id > wm])
    cells = ct.read(spark)
    per = cells.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vectors"))
    total = cells.count()
    nlist = per.count()
    top = per.agg(F.max("n_vectors")).collect()[0][0] or 0
    balance = (top / total * nlist) if total else 0.0
    return (
        per.withColumn("share", F.col("n_vectors") / F.lit(total))
        .withColumn("balance_factor", F.lit(float(balance)))
        .withColumn("stale_commits", F.lit(behind))
        .orderBy("cell")
    )


def list_views(catalog, databases: list[str] | None = None) -> list[dict]:
    """Inventory every MAINTAINED VIEW in the catalog from the
    definition stamps its refreshes carry — kind, source(s), group
    keys, and whether it is FRESH (all stored watermarks equal their
    sources' current heads) — the operational overview behind
    `view-refresh-auto`/`query-aggregate --refresh-stale`: which
    views exist, which can answer queries right now, which need a
    refresh. Pure metadata; one dict per view."""
    out: list[dict] = []
    for db in databases or catalog.list_namespaces():
        if db.startswith("_"):
            continue
        for name in catalog.list_tables(db):
            vt = catalog.table(db, name)
            cur = vt.current_snapshot() if vt.exists() else None
            s = cur.summary if cur is not None else {}
            kind = s.get("ivm.kind")
            if kind is None:
                continue
            srcs = (
                json.loads(s["ivm.srcs"]) if "ivm.srcs" in s
                else [s.get("ivm.src", "?")]
            )
            if "ivm.srcs" in s:
                tabs = [tuple(x.split(".", 1)) for x in srcs]
                fresh = _join_view_fresh_meta(catalog, s, tabs)
            else:
                src_db, src_t = s["ivm.src"].split(".", 1)
                head = catalog.table(src_db, src_t).current_snapshot()
                fresh = head is not None and s.get(
                    "ivm.src_snapshot_id"
                ) == str(head.snapshot_id)
            out.append({
                "database": db, "view": name, "kind": kind,
                "sources": srcs,
                "keys": json.loads(s.get("ivm.keys", "[]")),
                "fresh": bool(fresh),
            })
    return out


def _join_view_fresh_meta(catalog, s: dict, tables) -> bool:
    """Freshness of a multi-source view from its stamped watermarks
    (same rule as the rewriter's `_join_view_fresh`)."""
    if "ivm.src_a_snapshot_id" in s:
        names = ["ivm.src_a_snapshot_id", "ivm.src_b_snapshot_id"]
    else:
        names = [f"ivm.src_{i}_snapshot_id" for i in range(len(tables))]
    for (db, t), nm in zip(tables, names):
        head = catalog.table(db, t).current_snapshot()
        if head is None or s.get(nm) != str(head.snapshot_id):
            return False
    return True
