"""Command-line surface mirroring the reference's six CLI stages.

The reference ships six standalone scripts chained by JSON files
(`1_collect_src_snapshots.py` … `6_verify_data_integrity.py`); a
user drives them as `python 1_... --catalog ... --output-file ...`.
This CLI exposes the same workflow over the engine:

| Reference stage | Subcommand |
|---|---|
| 1 collect snapshots | `snapshots` |
| 2 resolve + collect schema | `plan` (also stage 1's enumeration) |
| 3 create target tables | `migrate` (DDL + copy in one pass) |
| 4 verify creation | `verify` (schema diff included) |
| 5 migrate data | `migrate` |
| 6 verify integrity | `verify` (counts + checksum) |
| (maintenance procedures) | `maintain` |
| (analytics queries) | `query` / `list-queries` |
| (beyond reference: row-level ops) | `merge` / `delete` |
| (beyond reference: WAP & refs) | `publish` / `tag` |
| (beyond reference: CDC audit) | `diff` |

JSON plan files remain the interchange format between `plan` and
`migrate`/`verify`, so the stage-by-stage operational model (run,
inspect, continue) is preserved — but each subcommand is one engine
call, not a script with its own SparkSession/config copy-paste.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _spark(cpus: str | None) -> SparkSession:
    from apache_iceberg_tables_migration_tool_spark.session import get_spark

    master = f"local[{cpus}]" if cpus else None
    spark = get_spark(app_name="iceberg-migration-cli", master=master)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def cmd_snapshots(args: argparse.Namespace) -> int:
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

    src = SnapCatalog(args.source)
    out: dict[str, list[dict]] = {}
    for db in args.databases or src.list_namespaces():
        for name in src.list_tables(db):
            snaps = src.table(db, name).snapshots()
            out[f"{db}.{name}"] = [
                {
                    "snapshot_id": s.snapshot_id,
                    "committed_at": s.committed_at,
                    "operation": s.operation,
                    "summary": dict(s.summary),
                }
                for s in snaps
            ]
    text = json.dumps(out, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    else:
        print(text)
    return 0


def cmd_plan(args: argparse.Namespace) -> int:
    from apache_iceberg_tables_migration_tool_spark.plans.plan import collect_plan
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

    src = SnapCatalog(args.source)
    plan = collect_plan(src, databases=args.databases, as_of=args.as_of)
    plan.to_json(args.out)
    print(f"planned {len(plan.tables)} tables, skipped {len(plan.skipped)} -> {args.out}")
    for s in plan.skipped:
        print(f"  skipped {s['database']}.{s['table_name']}: {s['reason']}")
    return 0


def cmd_sql(args: argparse.Namespace) -> int:
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog
    from apache_iceberg_tables_migration_tool_spark.sources.sqlfront import (
        snapcat_execute,
    )

    spark = _spark(args.cpus)
    df = snapcat_execute(spark, SnapCatalog(args.warehouse), args.query)
    df.show(args.limit, truncate=False)
    return 0


def cmd_list_views(args: argparse.Namespace) -> int:
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog
    from apache_iceberg_tables_migration_tool_spark.streaming.pipelines import (
        list_views,
    )

    views = list_views(SnapCatalog(args.warehouse), databases=args.databases)
    if not views:
        print("no maintained views")
        return 0
    for v in views:
        srcs = ", ".join(v["sources"])
        state = "fresh" if v["fresh"] else "STALE"
        print(
            f"{v['database']}.{v['view']}: kind={v['kind']} over [{srcs}] "
            f"keys={v['keys']} — {state}"
        )
    return 0


def cmd_export(args: argparse.Namespace) -> int:
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import (
        SnapCatalog,
        export_snapshot,
    )

    spark = _spark(args.cpus)
    m = export_snapshot(
        SnapCatalog(args.warehouse), spark, args.database, args.table,
        args.out, snapshot_id=args.snapshot_id, as_of=args.as_of,
    )
    print(json.dumps(m, indent=1))
    return 0


def cmd_scan_report(args: argparse.Namespace) -> int:
    import re as _re

    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

    preds = []
    for w in args.where:
        m = _re.match(r"^\s*(\w+)\s*(<=|>=|=|<|>)\s*(.+?)\s*$", w)
        if not m:
            print(f"scan-report: cannot parse predicate {w!r}", file=sys.stderr)
            return 2
        col, op, raw = m.groups()
        try:
            val: object = int(raw)
        except ValueError:
            try:
                val = float(raw)
            except ValueError:
                val = raw
        preds.append((col, op, val))
    spark = _spark(args.cpus)
    rep = SnapCatalog(args.warehouse).table(args.database, args.table).scan_report(
        spark, preds
    )
    rep.persist()
    rep.orderBy("decision", "file_path").show(1000, truncate=False)
    kept = rep.where("decision = 'read'").count()
    total = rep.count()
    rep.unpersist()
    print(f"reads {kept} of {total} file(s); skipped {total - kept}")
    return 0


def cmd_sync(args: argparse.Namespace) -> int:
    from apache_iceberg_tables_migration_tool_spark.plans.migrator import sync_history
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

    spark = _spark(args.cpus)
    src = SnapCatalog(args.source)
    dst = SnapCatalog(args.target)
    targets: list[tuple[str, str]] = []
    if args.tables:
        targets = [tuple(t.split(".", 1)) for t in args.tables]
    else:
        for db in args.databases or src.list_namespaces():
            targets += [(db, t) for t in src.list_tables(db)]
    failed = 0
    for db, name in targets:
        try:
            n = sync_history(spark, src, dst, db, name)
            print(f"{db}.{name}: replayed {n} commit(s)")
        except Exception as e:  # per-table isolation, like the reference
            failed += 1
            print(f"{db}.{name}: FAILED {type(e).__name__}: {e}")
    return 1 if failed else 0


def cmd_migrate(args: argparse.Namespace) -> int:
    from apache_iceberg_tables_migration_tool_spark.plans.migrator import (
        migrate,
        migrate_history,
    )
    from apache_iceberg_tables_migration_tool_spark.plans.plan import MigrationPlan
    from apache_iceberg_tables_migration_tool_spark.plans.reports import (
        render_text,
        summarize_report,
    )
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

    spark = _spark(args.cpus)
    plan = MigrationPlan.from_json(args.plan)
    run = migrate_history if args.history else migrate
    report = run(
        spark,
        plan,
        SnapCatalog(args.source),
        SnapCatalog(args.target),
        max_parallel_tables=args.parallel,
    )
    report.persist()
    text = render_text(summarize_report(report))
    print(text)
    if args.report:
        with open(args.report, "w") as f:
            f.write(text + "\n")
    failed = report.where("status <> 'success'").count()
    report.unpersist()
    return 1 if failed else 0


def cmd_verify(args: argparse.Namespace) -> int:
    from apache_iceberg_tables_migration_tool_spark.plans.plan import MigrationPlan
    from apache_iceberg_tables_migration_tool_spark.plans.reports import (
        render_text,
        summarize_report,
    )
    from apache_iceberg_tables_migration_tool_spark.plans.verifier import verify
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

    spark = _spark(args.cpus)
    plan = MigrationPlan.from_json(args.plan)
    report = verify(spark, plan, SnapCatalog(args.source), SnapCatalog(args.target))
    report.persist()
    text = render_text(summarize_report(report))
    print(text)
    if args.report:
        with open(args.report, "w") as f:
            f.write(text + "\n")
    failed = report.where("status <> 'success'").count()
    report.unpersist()
    return 1 if failed else 0


def cmd_maintain(args: argparse.Namespace) -> int:
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

    if args.compact_min_file_bytes and (
            args.compact_sort_by or args.compact_zorder_by):
        print("maintain: --compact-min-file-bytes (binpack) cannot "
              "combine with sort/zorder rewrites", file=sys.stderr)
        return 2
    spark = _spark(args.cpus)
    cat = SnapCatalog(args.warehouse)
    if getattr(args, "auto", False):
        from apache_iceberg_tables_migration_tool_spark.sources.snapcat import (
            auto_maintain,
        )

        report = auto_maintain(cat, spark, databases=args.databases)
        for r in report:
            print(f"{r['database']}.{r['table']}: {r['action']} — {r['detail']}")
        if not report:
            print("auto-maintain: nothing to do")
        return 1 if any(r["action"] == "error" for r in report) else 0
    for db in args.databases or cat.list_namespaces():
        for name in cat.list_tables(db):
            if args.expire_keep_last:
                expired = cat.expire_snapshots(db, name, keep_last=args.expire_keep_last)
                print(f"{db}.{name}: expired {len(expired)} snapshots")
            if (args.compact or args.compact_sort_by or args.compact_zorder_by
                    or args.compact_min_file_bytes):
                sort_by = args.compact_sort_by.split(",") if args.compact_sort_by else None
                zorder_by = (
                    args.compact_zorder_by.split(",") if args.compact_zorder_by else None
                )
                cat.compact(
                    db, name, spark, sort_by=sort_by, zorder_by=zorder_by,
                    min_file_bytes=args.compact_min_file_bytes,
                )
                how = (
                    f" (z-ordered by {zorder_by})"
                    if zorder_by
                    else (f" (sorted by {sort_by})" if sort_by else "")
                )
                if args.compact_min_file_bytes:
                    how = f" (binpack < {args.compact_min_file_bytes} bytes)"
                print(f"{db}.{name}: compacted{how}")
            if args.remove_orphans:
                removed = cat.remove_orphan_files(db, name)
                print(f"{db}.{name}: removed {len(removed)} orphan files")
            if args.analyze:
                stats = cat.analyze(db, name, spark)
                print(f"{db}.{name}: analyzed {len(stats)} columns")
    return 0


def cmd_rollback(args: argparse.Namespace) -> int:
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

    snap = SnapCatalog(args.warehouse).rollback(
        args.database, args.table, args.snapshot_id
    )
    print(
        f"{args.database}.{args.table}: rolled back to snapshot "
        f"{args.snapshot_id} (logged as snapshot {snap.snapshot_id}, "
        f"{snap.summary['total-records']} records at head)"
    )
    return 0


def cmd_alter(args: argparse.Namespace) -> int:
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

    def _split_depth0(spec: str) -> list[str]:
        # split on commas OUTSIDE parentheses: "amt=decimal(12,2)" and
        # the transform "bucket(4,id)" are each ONE item
        items, depth, cur = [], 0, []
        for ch in spec:
            if ch == "," and depth == 0:
                items.append("".join(cur))
                cur = []
                continue
            depth += ch == "("
            depth -= ch == ")"
            cur.append(ch)
        items.append("".join(cur))
        return items

    def _pairs(spec: str | None) -> dict[str, str]:
        # "a=b,c=d" → {"a": "b", "c": "d"}
        if not spec:
            return {}
        items = _split_depth0(spec)
        out = {}
        for item in items:
            if "=" not in item:
                raise SystemExit(f"alter: expected name=value, got {item!r}")
            k, v = item.split("=", 1)
            out[k] = v
        return out

    if args.partition_by is not None:
        if args.add or args.rename or args.drop or args.widen:
            print("alter: --partition-by is a separate commit; do not "
                  "combine it with schema changes")
            return 2
        snap = SnapCatalog(args.warehouse).alter_partition_spec(
            args.database, args.table,
            # depth-aware: bucket(4,id) / truncate(8,col) are one entry
            [c.strip() for c in _split_depth0(args.partition_by) if c.strip()],
        )
        print(
            f"{args.database}.{args.table}: partition spec evolved in "
            f"snapshot {snap.snapshot_id} (metadata-only, "
            f"{snap.summary['partition-spec']}); future writes use the "
            "new layout, existing files keep theirs"
        )
        return 0
    snap = SnapCatalog(args.warehouse).alter_table(
        args.database,
        args.table,
        add_columns=_pairs(args.add) or None,
        rename_columns=_pairs(args.rename) or None,
        drop_columns=args.drop.split(",") if args.drop else None,
        widen_columns=_pairs(args.widen) or None,
    )
    print(
        f"{args.database}.{args.table}: schema evolved in snapshot "
        f"{snap.snapshot_id} (metadata-only) → {snap.schema_ddl}"
    )
    return 0


def cmd_branch(args: argparse.Namespace) -> int:
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

    cat = SnapCatalog(args.warehouse)
    if args.fast_forward:
        head = cat.fast_forward(args.database, args.table, args.name)
        print(f"{args.database}.{args.table}: main fast-forwarded to "
              f"branch {args.name!r} (snapshot {head})")
    else:
        base = cat.create_branch(
            args.database, args.table, args.name, snapshot_id=args.snapshot_id
        )
        print(f"{args.database}.{args.table}: branch {args.name!r} created "
              f"at snapshot {base}")
    return 0


def cmd_merge(args: argparse.Namespace) -> int:
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

    spark = _spark(args.cpus)
    updates = spark.read.parquet(args.updates)
    cat = SnapCatalog(args.warehouse)
    if args.mor:
        snap = cat.upsert_mor(
            args.database, args.table, updates, key_cols=args.keys.split(",")
        )
        # upsert_mor on a missing/empty table falls back to a plain
        # append commit whose summary has no delete-file entry
        print(
            f"{args.database}.{args.table}: merge-on-read committed snapshot "
            f"{snap.snapshot_id} (added {snap.summary.get('added-records', '0')} "
            f"records, {snap.summary.get('added-delete-files', '0')} delete "
            "files, 0 rewrites)"
        )
        return 0
    snap = cat.upsert(
        args.database, args.table, updates, key_cols=args.keys.split(",")
    )
    print(
        f"{args.database}.{args.table}: merge committed snapshot {snap.snapshot_id} "
        f"(rewrote {snap.summary['rewritten-data-files']} files, "
        f"added {snap.summary['added-records']} records)"
    )
    return 0


def cmd_delete(args: argparse.Namespace) -> int:
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

    if not args.mor_keys and args.where is None:
        print("delete: one of --where or --mor-keys is required")
        return 2
    spark = _spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    cat = SnapCatalog(args.warehouse)
    if args.mor_keys:
        keys = spark.read.parquet(args.mor_keys)
        snap = cat.delete_keys(
            args.database, args.table, keys,
            key_cols=args.key_cols.split(",") if args.key_cols else None,
        )
        print(
            f"{args.database}.{args.table}: merge-on-read delete committed "
            f"snapshot {snap.snapshot_id} "
            f"({snap.summary['equality-delete-keys']} keys, 0 rewrites)"
        )
        return 0
    if args.mor:
        snap = cat.delete_where(
            args.database, args.table, args.where, mode="merge-on-read"
        )
        print(
            f"{args.database}.{args.table}: merge-on-read delete committed "
            f"snapshot {snap.snapshot_id} "
            f"({snap.summary['position-delete-rows']} positions, 0 rewrites)"
        )
        return 0
    snap = cat.delete_where(args.database, args.table, args.where)
    print(
        f"{args.database}.{args.table}: delete committed snapshot {snap.snapshot_id} "
        f"(rewrote {snap.summary['rewritten-data-files']} files)"
    )
    return 0


def cmd_update(args: argparse.Namespace) -> int:
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

    spark = _spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    items, depth, cur = [], 0, []
    for ch in args.set:  # commas inside parens belong to the expression
        if ch == "," and depth == 0:
            items.append("".join(cur))
            cur = []
            continue
        depth += ch == "("
        depth -= ch == ")"
        cur.append(ch)
    items.append("".join(cur))
    assignments = dict(item.split("=", 1) for item in items)
    snap = SnapCatalog(args.warehouse).update_where(
        args.database, args.table, args.where, assignments
    )
    print(
        f"{args.database}.{args.table}: update committed snapshot {snap.snapshot_id} "
        f"(rewrote {snap.summary['rewritten-data-files']} files)"
    )
    return 0


def cmd_analyze(args: argparse.Namespace) -> int:
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

    spark = _spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    cat = SnapCatalog(args.warehouse)
    stats = cat.analyze(
        args.database, args.table, spark,
        columns=args.columns.split(",") if args.columns else None,
    )
    cs = cat.table(args.database, args.table).column_stats()
    print(
        f"{args.database}.{args.table}: analyzed {len(stats)} columns at "
        f"snapshot {cs['snapshot_id']} ({cs['row_count']} rows)"
    )
    for c, v in sorted(stats.items()):
        print(f"  {c}: ndv~{v['ndv']} nulls={v['null_count']} "
              f"min={v['min']} max={v['max']}")
    return 0


def cmd_inspect(args: argparse.Namespace) -> int:
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

    spark = _spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    tbl = SnapCatalog(args.warehouse).table(args.database, args.table)
    dfs = {
        "snapshots": tbl.snapshots_df,
        "history": tbl.history_df,
        "refs": tbl.refs_df,
        "files": tbl.files_df,
        "delete-files": tbl.delete_files_df,
        "partitions": tbl.partitions_df,
        "manifests": tbl.manifests_df,
        "all-files": tbl.all_files_df,
        "stats": tbl.stats_df,
    }
    df = dfs[args.table_kind](spark)
    df.show(args.limit, truncate=False)
    return 0


def cmd_tag(args: argparse.Namespace) -> int:
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

    cat = SnapCatalog(args.warehouse)
    if args.drop:
        cat.drop_ref(args.database, args.table, args.name)
        print(f"{args.database}.{args.table}: dropped tag {args.name!r}")
    else:
        sid = cat.tag(args.database, args.table, args.name, snapshot_id=args.snapshot_id)
        print(f"{args.database}.{args.table}: tag {args.name!r} -> snapshot {sid}")
    return 0


def cmd_publish(args: argparse.Namespace) -> int:
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

    snap = SnapCatalog(args.warehouse).publish(
        args.database, args.table, args.snapshot_id
    )
    via = (
        f" (cherry-picked as snapshot {snap.snapshot_id})"
        if snap.snapshot_id != args.snapshot_id
        else ""
    )
    print(f"{args.database}.{args.table}: published snapshot {args.snapshot_id}{via}")
    return 0


def cmd_diff(args: argparse.Namespace) -> int:
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

    spark = _spark(args.cpus)
    tbl = SnapCatalog(args.warehouse).table(args.database, args.table)
    out = tbl.diff_snapshots(spark, args.from_id, args.to_id)
    # print a bounded sample; counts come from a distributed agg, so
    # the driver never collects the (table-sized) diff
    for r in out.take(args.limit):
        print(r)
    counts = {r["op"]: r["n"] for r in out.groupBy("op").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    n_rem = counts.get("removed", 0)
    n_add = sum(counts.values()) - n_rem
    print(f"-- {n_rem} removed, {n_add} added "
          f"({args.from_id} -> {args.to_id})")
    return 0


def cmd_changelog(args: argparse.Namespace) -> int:
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

    spark = _spark(args.cpus)
    tbl = SnapCatalog(args.warehouse).table(args.database, args.table)
    to_id = (
        args.to_id
        if args.to_id is not None
        else tbl.current_snapshot().snapshot_id
    )
    out = tbl.changelog(spark, args.from_id, to_id)
    # bounded sample + distributed counts — a CDC range over a big
    # table must never be collected whole to the driver
    for r in out.orderBy("_commit_order", "_change_type").limit(args.limit).collect():
        print(r)
    counts = {r["_change_type"]: r["n"] for r in out.groupBy("_change_type")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    n_del = counts.get("delete", 0)
    n_ins = sum(counts.values()) - n_del
    print(
        f"-- changelog ({args.from_id} -> {to_id}]: "
        f"{n_ins} inserts, {n_del} deletes"
    )
    return 0


def cmd_view_refresh(args: argparse.Namespace) -> int:
    """Changelog-driven materialized-view refresh: create-or-advance
    a COUNT/SUM, COUNT/MIN/MAX or COUNT/Σv/Σv² rollup of a catalog
    table in O(changed rows) — the operable face of
    `streaming/pipelines.refresh_view_changelog` (the cron-job shape:
    run it after commits land, or on a schedule)."""
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog
    from apache_iceberg_tables_migration_tool_spark.streaming.pipelines import (
        refresh_view_changelog,
    )

    spark = _spark(args.cpus)
    cat = SnapCatalog(args.warehouse)
    cols = args.cols.split(",")
    if args.kind == "distinct":
        if len(cols) != 1:
            print("-- --kind distinct takes exactly one column")
            return 2
        kinds = {"distinct_col": cols[0]}
    else:
        kinds = {args.kind + "_cols": cols}
    folded = refresh_view_changelog(
        spark, cat, args.database, args.table,
        args.view_database or args.database, args.view,
        keys=args.keys.split(","), **kinds,
    )
    wants_read = args.kind == "distinct" and args.quantiles
    if folded is None:
        print("-- view already current (nothing to fold)")
    if folded is not None or wants_read:
        vdb = args.view_database or args.database
        vt = cat.table(vdb, args.view)
        out = vt.read(spark)
        if args.kind == "distinct":  # stored aux → derived read-time stats
            from apache_iceberg_tables_migration_tool_spark.operators.ivm import (
                derive_distinct,
                derive_quantiles,
            )

            if args.quantiles:
                qs = [float(x) for x in args.quantiles.split(",")]
                out = derive_quantiles(out, args.keys.split(","), cols[0], qs)
            else:
                out = derive_distinct(out, args.keys.split(","), cols[0])
        if folded is not None:
            print(f"-- folded to source snapshot {folded}; view rows:")
        for r in out.limit(args.limit).collect():
            print(r)
    return 0


def cmd_topk_view_refresh(args: argparse.Namespace) -> int:
    """Top-k (leaderboard) view refresh — the operable face of
    `streaming/pipelines.refresh_topk_view`."""
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog
    from apache_iceberg_tables_migration_tool_spark.streaming.pipelines import (
        refresh_topk_view,
    )

    spark = _spark(args.cpus)
    cat = SnapCatalog(args.warehouse)
    vdb = args.view_database or args.database
    folded = refresh_topk_view(
        spark, cat, args.database, args.table, vdb, args.view,
        keys=args.keys.split(","), metric_col=args.metric,
        id_col=args.id_col, k=args.k,
    )
    if folded is None:
        print("-- view already current (nothing to fold)")
    else:
        vt = cat.table(vdb, args.view)
        print(f"-- folded to source snapshot {folded}; view rows:")
        for r in vt.read(spark).orderBy(*args.keys.split(","), "rk") \
                .limit(args.limit).collect():
            print(r)
    return 0


def cmd_join_view_refresh(args: argparse.Namespace) -> int:
    """Join-view refresh: create-or-advance a COUNT/SUM (or raw-
    moments) rollup over ``A ⋈ B`` from BOTH sides' changelogs in
    O(changed rows × matches) — the operable face of
    `streaming/pipelines.refresh_join_view` (run after commits land
    on either side, or on a schedule)."""
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog
    from apache_iceberg_tables_migration_tool_spark.streaming.pipelines import (
        refresh_join_view,
    )

    spark = _spark(args.cpus)
    cat = SnapCatalog(args.warehouse)
    jcols = args.cols.split(",")
    if args.kind == "distinct":
        if len(jcols) != 1:
            print("-- --kind distinct takes exactly one column")
            return 2
        kinds = {"distinct_col": jcols[0]}
    else:
        kinds = {args.kind + "_cols": jcols}
    vdb = args.view_database or args.database
    folded = refresh_join_view(
        spark, cat, args.database, args.table,
        args.b_database or args.database, args.b_table,
        vdb, args.view,
        on=args.on.split(","), keys=args.keys.split(","), **kinds,
    )
    if folded is None:
        print("-- view already current (nothing to fold)")
    else:
        vt = cat.table(vdb, args.view)
        print(f"-- folded to source snapshots (a={folded[0]}, b={folded[1]}); "
              "view rows:")
        for r in vt.read(spark).limit(args.limit).collect():
            print(r)
    return 0


def cmd_join_chain_view_refresh(args: argparse.Namespace) -> int:
    """N-way join-chain view refresh — the operable face of
    `streaming/pipelines.refresh_join_chain_view` (a star/snowflake
    rollup kept fresh from ALL member tables' changelogs)."""
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog
    from apache_iceberg_tables_migration_tool_spark.streaming.pipelines import (
        refresh_join_chain_view,
    )

    spark = _spark(args.cpus)
    cat = SnapCatalog(args.warehouse)
    tables = [
        tuple(t.split(".", 1)) if "." in t else (args.database, t)
        for t in args.tables.split(",")
    ]
    ons = [o.split(",") for o in args.on]
    cols = args.cols.split(",")
    if args.kind == "distinct":
        if len(cols) != 1:
            print("-- --kind distinct takes exactly one column")
            return 2
        kinds = {"distinct_col": cols[0]}
    else:
        kinds = {args.kind + "_cols": cols}
    vdb = args.view_database or args.database
    folded = refresh_join_chain_view(
        spark, cat, tables, vdb, args.view,
        ons=ons, keys=args.keys.split(","), **kinds,
    )
    if folded is None:
        print("-- view already current (nothing to fold)")
    else:
        vt = cat.table(vdb, args.view)
        print(f"-- folded to source snapshots {folded}; view rows:")
        for r in vt.read(spark).limit(args.limit).collect():
            print(r)
    return 0


def cmd_topk_join_view_refresh(args: argparse.Namespace) -> int:
    """Joined-leaderboard refresh — the operable face of
    `streaming/pipelines.refresh_topk_join_view` (run after commits
    land on either side, or on a schedule)."""
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog
    from apache_iceberg_tables_migration_tool_spark.streaming.pipelines import (
        refresh_topk_join_view,
    )

    spark = _spark(args.cpus)
    cat = SnapCatalog(args.warehouse)
    vdb = args.view_database or args.database
    keys = args.keys.split(",")
    folded = refresh_topk_join_view(
        spark, cat, args.database, args.table,
        args.b_database or args.database, args.b_table,
        vdb, args.view,
        on=args.on.split(","), keys=keys, metric_col=args.metric,
        id_cols=args.id_cols.split(","), k=args.k,
    )
    if folded is None:
        print("-- view already current (nothing to fold)")
    else:
        vt = cat.table(vdb, args.view)
        print(f"-- folded to source snapshots (a={folded[0]}, b={folded[1]}); "
              "view rows:")
        for r in vt.read(spark).orderBy(*keys, "rk").limit(args.limit).collect():
            print(r)
    return 0


def cmd_query_aggregate(args: argparse.Namespace) -> int:
    """Aggregate navigation from the command line: answer a grouped
    aggregate (or exact grouped quantiles) over a catalog table — or
    a join chain with --tables/--on — routed through a maintained
    materialized view when one is fresh and sufficient
    (`plans/rewriter.py`), else computed from the base; prints which
    path answered."""
    from apache_iceberg_tables_migration_tool_spark.plans import rewriter
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

    if not args.table and not args.tables:
        print("-- provide --table (single-table) or --tables/--on (join)")
        return 2
    spark = _spark(args.cpus)
    cat = SnapCatalog(args.warehouse)
    keys = args.keys.split(",") if args.keys else []
    if args.quantiles:
        if not args.col:
            print("-- --quantiles needs --col")
            return 2
        if not args.table:
            print("-- --quantiles is single-table: provide --table")
            return 2
        qs = [float(x) for x in args.quantiles.split(",")]
        out, m = rewriter.answer_quantile(
            spark, cat, args.database, args.table, keys, args.col, qs,
            refresh_stale=args.refresh_stale,
        )
    else:
        aggs = []
        for spec in args.aggs.split(","):
            parts = spec.split(":")
            if len(parts) != 3:
                print(f"-- bad agg spec {spec!r} (want fn:col:alias)")
                return 2
            fn, col, alias = parts
            aggs.append((fn, None if col == "*" else col, alias))
        if args.tables:
            tables = [
                tuple(t.split(".", 1)) if "." in t else (args.database, t)
                for t in args.tables.split(",")
            ]
            ons = [o.split(",") for o in (args.on or [])]
            out, m = rewriter.answer_join_aggregate(
                spark, cat, tables, ons, keys, aggs,
                refresh_stale=args.refresh_stale,
            )
        else:
            out, m = rewriter.answer_aggregate(
                spark, cat, args.database, args.table, keys, aggs,
                refresh_stale=args.refresh_stale,
            )
    if m is None:
        print("-- computed from the base (no usable fresh view)")
    else:
        print(f"-- answered from materialized view {m.database}.{m.table}")
    for r in out.limit(args.limit).collect():
        print(r)
    return 0


def cmd_view_refresh_auto(args: argparse.Namespace) -> int:
    """Self-describing view refresh — the operable face of
    `streaming/pipelines.refresh_view_auto`."""
    from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog
    from apache_iceberg_tables_migration_tool_spark.streaming.pipelines import (
        refresh_view_auto,
    )

    spark = _spark(args.cpus)
    cat = SnapCatalog(args.warehouse)
    folded = refresh_view_auto(spark, cat, args.database, args.view)
    if folded is None:
        print("-- view already current (nothing to fold)")
    else:
        print(f"-- folded to source snapshot(s) {folded}")
    return 0


def cmd_corpus_build(args: argparse.Namespace) -> int:
    from apache_iceberg_tables_migration_tool_spark.plans.corpus import build_corpus
    from apache_iceberg_tables_migration_tool_spark.sources.fixtures import load

    spark = _spark(args.cpus)
    docs = load(spark, args.sf_dir, "documents")
    result = build_corpus(
        spark, docs, args.warehouse,
        min_shared=args.min_shared, threshold=args.threshold,
        mix_budget=args.mix_budget,
    )
    tbl = result.catalog.table("corpus", "docs")
    summary = {
        "warehouse": args.warehouse,
        "batches": result.batch_stats,
        "published_records": tbl.current_snapshot().total_records,
        "band_index_records": result.catalog.table(
            "corpus", "band_index"
        ).current_snapshot().total_records,
        "mixture_rows": result.mixture.count(),
    }
    text = json.dumps(summary, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    else:
        print(text)
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    from apache_iceberg_tables_migration_tool_spark.queries import QUERIES

    if args.name not in QUERIES:
        print(f"unknown query {args.name!r}; see list-queries", file=sys.stderr)
        return 2
    spark = _spark(args.cpus)
    df = QUERIES[args.name].fn(spark, args.sf_dir)
    if args.explain:
        # the plan-review loop: PushedFilters reaching the scan,
        # WholeStageCodegen spans, join strategies — read before
        # trusting any query at scale
        df.explain("formatted")
        return 0
    df.show(args.limit, truncate=False)
    return 0


def cmd_list_queries(args: argparse.Namespace) -> int:
    from apache_iceberg_tables_migration_tool_spark.queries import QUERIES

    for name, spec in sorted(QUERIES.items()):
        oracle = "oracle" if spec.oracle else "rows-only"
        tags = ",".join(spec.tags)
        print(f"{name:40s} {oracle:9s} {tags}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="apache_iceberg_tables_migration_tool_spark",
        description="PySpark-native snapshot-migration + analytics engine",
    )
    p.add_argument("--cpus", default=None, help="local[N] cores (default: env/all)")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("snapshots", help="stage 1: dump snapshot histories")
    sp.add_argument("--source", required=True)
    sp.add_argument("--databases", nargs="*", default=None)
    sp.add_argument("--out", default=None)
    sp.set_defaults(fn=cmd_snapshots)

    sp = sub.add_parser("plan", help="stages 1+2: resolve snapshots as-of, collect schemas")
    sp.add_argument("--source", required=True)
    sp.add_argument("--databases", nargs="*", default=None)
    sp.add_argument("--as-of", dest="as_of", default=None)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_plan)

    sp = sub.add_parser("migrate", help="stages 3+5: create target tables + copy data")
    sp.add_argument("--source", required=True)
    sp.add_argument("--target", required=True)
    sp.add_argument("--plan", required=True)
    sp.add_argument("--report", default=None)
    sp.add_argument("--parallel", type=int, default=4)
    sp.add_argument(
        "--history", action="store_true",
        help="replay every source commit (snapshot-history-preserving; "
        "appends copy only the incremental file delta)",
    )
    sp.set_defaults(fn=cmd_migrate)

    sp = sub.add_parser(
        "sql",
        help="run Spark SQL over catalog tables: reads (db.table, VERSION "
        "AS OF id|'tag', TIMESTAMP AS OF 'ts', metadata tables) and DML "
        "(INSERT INTO/OVERWRITE, CREATE TABLE AS, DELETE FROM, UPDATE)",
    )
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--query", required=True)
    sp.add_argument("--limit", type=int, default=50)
    sp.add_argument("--cpus", default=None)
    sp.set_defaults(fn=cmd_sql)

    sp = sub.add_parser(
        "list-views",
        help="inventory maintained views (kind, sources, keys, fresh?)",
    )
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--databases", nargs="*", default=None)
    sp.set_defaults(fn=cmd_list_views)

    sp = sub.add_parser(
        "export",
        help="point-in-time export to plain parquet + provenance "
        "manifest (the escape hatch: any engine can read it)",
    )
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--database", required=True)
    sp.add_argument("--table", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--snapshot-id", type=int, default=None)
    sp.add_argument("--as-of", default=None)
    sp.add_argument("--cpus", default=None)
    sp.set_defaults(fn=cmd_export)

    sp = sub.add_parser(
        "scan-report",
        help="per-file pruning explain for a point/range predicate: which "
        "files a scan reads vs skips (bounds/bloom/bucket, and why)",
    )
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--database", required=True)
    sp.add_argument("--table", required=True)
    sp.add_argument(
        "--where", required=True, action="append",
        help="predicate as col<op>value, e.g. --where 'id=42' "
        "--where 'ts>=2024-01-01' (repeatable, ANDed)",
    )
    sp.add_argument("--cpus", default=None)
    sp.set_defaults(fn=cmd_scan_report)

    sp = sub.add_parser(
        "sync",
        help="incremental cross-catalog sync: replay only commits since "
        "the last sync (continuous replication; the reference is "
        "point-in-time only)",
    )
    sp.add_argument("--source", required=True)
    sp.add_argument("--target", required=True)
    sp.add_argument("--databases", nargs="*", default=None,
                    help="default: every namespace in the source")
    sp.add_argument("--tables", nargs="*", default=None,
                    help="db.table names; default: every table in scope")
    sp.add_argument("--cpus", default=None)
    sp.set_defaults(fn=cmd_sync)

    sp = sub.add_parser("verify", help="stages 4+6: schema diff + counts + checksum")
    sp.add_argument("--source", required=True)
    sp.add_argument("--target", required=True)
    sp.add_argument("--plan", required=True)
    sp.add_argument("--report", default=None)
    sp.set_defaults(fn=cmd_verify)

    sp = sub.add_parser("maintain", help="expire snapshots / compact files")
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--databases", nargs="*", default=None)
    sp.add_argument(
        "--auto", action="store_true",
        help="policy-driven sweep: enforce each table's maintain.* "
        "properties (expire keep-last/older-than, binpack small files, "
        "orphan cleanup) with per-table error isolation",
    )
    sp.add_argument("--expire-keep-last", type=int, default=None)
    sp.add_argument("--compact", action="store_true")
    sp.add_argument(
        "--compact-sort-by", default=None,
        help="comma-separated sort columns: range-cluster the rewrite so "
        "file min/max stats enable scan skipping",
    )
    sp.add_argument(
        "--compact-min-file-bytes", type=int, default=None,
        help="binpack: rewrite only files smaller than this (bytes)")
    sp.add_argument(
        "--compact-zorder-by", default=None,
        help="comma-separated integral columns: Morton z-order the rewrite "
        "so files are bounded in EVERY listed dimension (multi-column "
        "file skipping)",
    )
    sp.add_argument(
        "--remove-orphans", action="store_true",
        help="delete data files no snapshot references (crashed-write residue)",
    )
    sp.add_argument("--analyze", action="store_true",
                    help="compute+persist column statistics per table")
    sp.set_defaults(fn=cmd_maintain)

    sp = sub.add_parser(
        "rollback", help="move the published head back to an earlier snapshot"
    )
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--database", required=True)
    sp.add_argument("--table", required=True)
    sp.add_argument("--snapshot-id", type=int, required=True)
    sp.set_defaults(fn=cmd_rollback)

    sp = sub.add_parser(
        "alter",
        help="metadata-only schema evolution (add/rename/drop/widen columns)",
    )
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--database", required=True)
    sp.add_argument("--table", required=True)
    sp.add_argument("--add", help="name=type[,name=type…] columns to add")
    sp.add_argument("--rename", help="old=new[,old=new…] columns to rename")
    sp.add_argument("--drop", help="comma-separated columns to drop")
    sp.add_argument("--widen", help="name=type[,…] lossless type widenings")
    sp.add_argument("--partition-by", default=None,
                    help="evolve the partition spec (comma-separated "
                    "columns; '' = unpartitioned) — metadata-only, "
                    "future writes only")
    sp.set_defaults(fn=cmd_alter)

    sp = sub.add_parser(
        "branch", help="create a writable branch ref / fast-forward main to it"
    )
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--database", required=True)
    sp.add_argument("--table", required=True)
    sp.add_argument("--name", required=True)
    sp.add_argument("--snapshot-id", type=int, default=None)
    sp.add_argument("--fast-forward", action="store_true")
    sp.set_defaults(fn=cmd_branch)

    sp = sub.add_parser("merge", help="row-level MERGE (upsert) from a parquet dataset")
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--database", required=True)
    sp.add_argument("--table", required=True)
    sp.add_argument("--updates", required=True, help="parquet path with update rows")
    sp.add_argument("--keys", required=True, help="comma-separated key columns")
    sp.add_argument("--mor", action="store_true",
                    help="merge-on-read: append rows + equality-delete file, "
                    "zero rewrites")
    sp.add_argument("--cpus", default=None)
    sp.set_defaults(fn=cmd_merge)

    sp = sub.add_parser("delete", help="row-level DELETE by SQL predicate")
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--database", required=True)
    sp.add_argument("--table", required=True)
    sp.add_argument("--where", default=None, help="SQL predicate, e.g. \"lang = 'de'\"")
    sp.add_argument("--mor-keys", default=None,
                    help="parquet path of key rows: merge-on-read equality "
                    "delete (no data rewrite) instead of --where COW")
    sp.add_argument("--key-cols", default=None,
                    help="comma-separated key columns (default: all --mor-keys columns)")
    sp.add_argument("--mor", action="store_true",
                    help="with --where: merge-on-read position delete "
                    "(records matched (file,pos) pairs, no data rewrite)")
    sp.add_argument("--cpus", default=None)
    sp.set_defaults(fn=cmd_delete)

    sp = sub.add_parser("update", help="row-level UPDATE (copy-on-write)")
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--database", required=True)
    sp.add_argument("--table", required=True)
    sp.add_argument("--where", required=True, help="SQL predicate")
    sp.add_argument("--set", required=True,
                    help="col=expr[,col=expr…] assignments, e.g. \"v=v+1\"")
    sp.add_argument("--cpus", default=None)
    sp.set_defaults(fn=cmd_update)

    sp = sub.add_parser("analyze", help="compute+persist column statistics (NDV/nulls/min-max)")
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--database", required=True)
    sp.add_argument("--table", required=True)
    sp.add_argument("--columns", default=None, help="comma-separated (default: all stat-able)")
    sp.add_argument("--cpus", default=None)
    sp.set_defaults(fn=cmd_analyze)

    sp = sub.add_parser(
        "inspect", help="print a metadata table (≙ SELECT * FROM t.<kind>)"
    )
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--database", required=True)
    sp.add_argument("--table", required=True)
    sp.add_argument("--table-kind", default="snapshots",
                    choices=["snapshots", "history", "refs", "files",
                             "delete-files", "partitions", "manifests",
                             "all-files", "stats"])
    sp.add_argument("--limit", type=int, default=50)
    sp.add_argument("--cpus", default=None)
    sp.set_defaults(fn=cmd_inspect)

    sp = sub.add_parser("tag", help="create/drop a named snapshot tag")
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--database", required=True)
    sp.add_argument("--table", required=True)
    sp.add_argument("--name", required=True)
    sp.add_argument("--snapshot-id", type=int, default=None)
    sp.add_argument("--drop", action="store_true")
    sp.set_defaults(fn=cmd_tag)

    sp = sub.add_parser(
        "publish", help="publish a staged (WAP) snapshot into table history"
    )
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--database", required=True)
    sp.add_argument("--table", required=True)
    sp.add_argument("--snapshot-id", type=int, required=True)
    sp.set_defaults(fn=cmd_publish)

    sp = sub.add_parser("diff", help="row-level CDC diff between two snapshots")
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--database", required=True)
    sp.add_argument("--table", required=True)
    sp.add_argument("--from-id", type=int, required=True)
    sp.add_argument("--to-id", type=int, required=True)
    sp.add_argument("--limit", type=int, default=20)
    sp.add_argument("--cpus", default=None)
    sp.set_defaults(fn=cmd_diff)

    sp = sub.add_parser(
        "changelog",
        help="ordered multi-commit CDC stream (insert/delete rows per commit)",
    )
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--database", required=True)
    sp.add_argument("--table", required=True)
    sp.add_argument("--from-id", type=int, default=None,
                    help="exclusive start snapshot (default: table creation)")
    sp.add_argument("--to-id", type=int, default=None,
                    help="inclusive end snapshot (default: current head)")
    sp.add_argument("--limit", type=int, default=20)
    sp.add_argument("--cpus", default=None)
    sp.set_defaults(fn=cmd_changelog)

    sp = sub.add_parser(
        "view-refresh",
        help="changelog-driven materialized-view refresh (COUNT/SUM, "
        "MIN/MAX with affected-group rescan, or AVG/VAR moments) — "
        "O(changed rows), watermark in the view's own commit",
    )
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--database", required=True)
    sp.add_argument("--table", required=True)
    sp.add_argument("--view", required=True, help="view table name")
    sp.add_argument("--view-database", default=None,
                    help="view namespace (default: source database)")
    sp.add_argument("--keys", required=True, help="comma-separated group keys")
    sp.add_argument("--cols", required=True, help="comma-separated value columns")
    sp.add_argument("--kind", choices=["sum", "minmax", "moment", "distinct"],
                    default="sum")
    sp.add_argument("--quantiles", default=None,
                    help="with --kind distinct: comma-separated fractions — "
                    "print exact quantiles (derive_quantiles) off the stored "
                    "aux instead of distinct counts")
    sp.add_argument("--limit", type=int, default=20)
    sp.add_argument("--cpus", default=None)
    sp.set_defaults(fn=cmd_view_refresh)

    sp = sub.add_parser(
        "topk-view-refresh",
        help="changelog-driven TOP-K (leaderboard) view refresh: keep the "
        "k highest-metric rows per group fresh — inserts re-rank, deletes "
        "of ranked rows rescan only their group",
    )
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--database", required=True)
    sp.add_argument("--table", required=True)
    sp.add_argument("--view", required=True, help="view table name")
    sp.add_argument("--view-database", default=None,
                    help="view namespace (default: source database)")
    sp.add_argument("--keys", required=True, help="comma-separated group keys")
    sp.add_argument("--metric", required=True, help="ranking metric column")
    sp.add_argument("--id-col", required=True, help="unique row id column")
    sp.add_argument("-k", type=int, default=10, help="rows kept per group")
    sp.add_argument("--limit", type=int, default=20)
    sp.add_argument("--cpus", default=None)
    sp.set_defaults(fn=cmd_topk_view_refresh)

    sp = sub.add_parser(
        "join-view-refresh",
        help="changelog-driven JOIN-view refresh: keep a COUNT/SUM or "
        "AVG/VAR rollup over A ⋈ B fresh from both changelogs "
        "(bilinearity delta, per-side watermarks in the view commit)",
    )
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--database", required=True, help="side-A namespace")
    sp.add_argument("--table", required=True, help="side-A table")
    sp.add_argument("--b-table", required=True, help="side-B table")
    sp.add_argument("--b-database", default=None,
                    help="side-B namespace (default: --database)")
    sp.add_argument("--view", required=True, help="view table name")
    sp.add_argument("--view-database", default=None,
                    help="view namespace (default: --database)")
    sp.add_argument("--on", required=True, help="comma-separated join keys")
    sp.add_argument("--keys", required=True, help="comma-separated group keys")
    sp.add_argument("--cols", required=True, help="comma-separated value columns")
    sp.add_argument("--kind", choices=["sum", "moment", "minmax", "distinct"],
                    default="sum")
    sp.add_argument("--limit", type=int, default=20)
    sp.add_argument("--cpus", default=None)
    sp.set_defaults(fn=cmd_join_view_refresh)

    sp = sub.add_parser(
        "join-chain-view-refresh",
        help="changelog-driven N-WAY join-chain view refresh: keep a "
        "rollup over T0 ⋈ T1 ⋈ … fresh from every member table's "
        "changelog (composed bilinearity; one watermark per table in "
        "the view commit)",
    )
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--database", required=True,
                    help="default namespace for --tables entries")
    sp.add_argument("--tables", required=True,
                    help="comma-separated chain tables, 'name' or 'db.name'")
    sp.add_argument("--view", required=True, help="view table name")
    sp.add_argument("--view-database", default=None,
                    help="view namespace (default: --database)")
    sp.add_argument("--on", action="append", required=True,
                    help="join keys for one chain step (repeat per step; "
                    "comma-separate composite keys)")
    sp.add_argument("--keys", required=True, help="comma-separated group keys")
    sp.add_argument("--cols", required=True, help="comma-separated value columns")
    sp.add_argument("--kind", choices=["sum", "moment", "minmax", "distinct"],
                    default="sum")
    sp.add_argument("--limit", type=int, default=20)
    sp.add_argument("--cpus", default=None)
    sp.set_defaults(fn=cmd_join_chain_view_refresh)

    sp = sub.add_parser(
        "topk-join-view-refresh",
        help="changelog-driven TOP-K view over A ⋈ B: keep the k "
        "highest-metric joined rows per group fresh from both sides' "
        "changelogs (bilinearity delta, net-signed fold, per-side "
        "watermarks in the view commit)",
    )
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--database", required=True, help="side-A namespace")
    sp.add_argument("--table", required=True, help="side-A table")
    sp.add_argument("--b-table", required=True, help="side-B table")
    sp.add_argument("--b-database", default=None,
                    help="side-B namespace (default: --database)")
    sp.add_argument("--view", required=True, help="view table name")
    sp.add_argument("--view-database", default=None,
                    help="view namespace (default: --database)")
    sp.add_argument("--on", required=True, help="comma-separated join keys")
    sp.add_argument("--keys", required=True, help="comma-separated group keys")
    sp.add_argument("--metric", required=True, help="ranking metric column")
    sp.add_argument("--id-cols", required=True,
                    help="comma-separated columns identifying a joined row "
                    "(cover the finer side's primary key)")
    sp.add_argument("-k", type=int, default=10, help="rows kept per group")
    sp.add_argument("--limit", type=int, default=20)
    sp.add_argument("--cpus", default=None)
    sp.set_defaults(fn=cmd_topk_join_view_refresh)

    sp = sub.add_parser(
        "query-aggregate",
        help="answer a grouped aggregate (or exact quantiles) with "
        "AGGREGATE NAVIGATION: routed through a fresh maintained view "
        "when one matches, else computed from the base",
    )
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--database", required=True)
    sp.add_argument("--table", default=None, help="base table (single-table)")
    sp.add_argument("--tables", default=None,
                    help="comma-separated chain tables for a JOIN query")
    sp.add_argument("--on", action="append", default=None,
                    help="join keys per chain step (repeat; with --tables)")
    sp.add_argument("--keys", default="", help="comma-separated group keys")
    sp.add_argument("--aggs", default="count:*:n",
                    help="comma-separated fn:col:alias "
                    "(fn: count sum min max avg count_distinct; col * for count)")
    sp.add_argument("--quantiles", default=None,
                    help="comma-separated fractions — exact grouped quantiles "
                    "of --col instead of --aggs")
    sp.add_argument("--col", default=None, help="value column for --quantiles")
    sp.add_argument("--refresh-stale", action="store_true",
                    help="bring a matching-but-stale view to head first "
                    "(O(delta) fold via its stamped definition) instead of "
                    "falling back to the base")
    sp.add_argument("--limit", type=int, default=20)
    sp.add_argument("--cpus", default=None)
    sp.set_defaults(fn=cmd_query_aggregate)

    sp = sub.add_parser(
        "view-refresh-auto",
        help="refresh ANY maintained view from its own stamped "
        "definition metadata (single-table, join, chain or top-k) — "
        "the cron-job shape needs only the view's name",
    )
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--database", required=True, help="view namespace")
    sp.add_argument("--view", required=True, help="view table name")
    sp.add_argument("--cpus", default=None)
    sp.set_defaults(fn=cmd_view_refresh_auto)

    sp = sub.add_parser(
        "corpus-build",
        help="end-to-end training-corpus build: reputation gate + "
        "decontamination + iterative index-backed near-dup dedup + "
        "WAP-gated ingest + mixture sample (plans/corpus.py)",
    )
    sp.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--min-shared", type=int, default=3)
    sp.add_argument("--threshold", type=float, default=0.5)
    sp.add_argument("--mix-budget", type=int, default=200)
    sp.add_argument("--out", default=None)
    sp.set_defaults(fn=cmd_corpus_build)

    sp = sub.add_parser("query", help="run a registered analytics query")
    sp.add_argument("--name", required=True)
    sp.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    sp.add_argument("--limit", type=int, default=20)
    sp.add_argument("--explain", action="store_true",
                    help="print the formatted physical plan instead of rows")
    sp.set_defaults(fn=cmd_query)

    sp = sub.add_parser("list-queries", help="list the registered query surface")
    sp.set_defaults(fn=cmd_list_queries)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
