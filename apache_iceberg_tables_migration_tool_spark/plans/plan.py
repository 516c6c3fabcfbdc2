"""Migration plan: which snapshot of which table moves where.

Replaces the reference's JSON-file hand-offs between its six CLI
stages (``snapshot-info-file`` → ``info-file`` → …,
``2_collect_database_schema_info.py:268-269``) with one in-process
plan object; JSON import/export is kept as an interchange format
(same record shape as the reference's dataclasses,
``2_collect_database_schema_info.py:10-19``).
"""

from __future__ import annotations

import json
import warnings
from dataclasses import asdict, dataclass, field
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog


@dataclass
class TableMigration:
    database: str
    table_name: str
    snapshot_id: int
    committed_at: str
    schema_ddl: str
    partition_spec: list[str] = field(default_factory=list)
    properties: dict[str, str] = field(default_factory=dict)
    records: int = 0


@dataclass
class MigrationPlan:
    as_of: str | None
    tables: list[TableMigration] = field(default_factory=list)
    skipped: list[dict] = field(default_factory=list)  # (db, table, reason)

    PLAN_SCHEMA = T.StructType(
        [
            T.StructField("database", T.StringType()),
            T.StructField("table_name", T.StringType()),
            T.StructField("snapshot_id", T.LongType()),
            T.StructField("committed_at", T.StringType()),
            T.StructField("schema_ddl", T.StringType()),
            T.StructField("partition_spec", T.ArrayType(T.StringType())),
            T.StructField("records", T.LongType()),
        ]
    )

    def to_df(self, spark: SparkSession) -> DataFrame:
        rows = [
            (t.database, t.table_name, t.snapshot_id, t.committed_at,
             t.schema_ddl, t.partition_spec, t.records)
            for t in self.tables
        ]
        return spark.createDataFrame(rows, self.PLAN_SCHEMA)

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"as_of": self.as_of, "tables": [asdict(t) for t in self.tables],
                       "skipped": self.skipped}, f, indent=1)

    @classmethod
    def from_json(cls, path: str) -> "MigrationPlan":
        with open(path) as f:
            raw = json.load(f)
        return cls(
            as_of=raw.get("as_of"),
            tables=[TableMigration(**t) for t in raw["tables"]],
            skipped=raw.get("skipped", []),
        )


def collect_plan(
    src: SnapCatalog,
    databases: list[str] | None = None,
    as_of: str | datetime | None = None,
) -> MigrationPlan:
    """Stages 1+2 of the reference in one pass: enumerate tables,
    resolve 'latest snapshot ≤ as_of' per table, capture schema /
    partition spec / record counts from the snapshot manifest.

    Tables with no snapshot at-or-before ``as_of`` are *skipped with a
    reason*, matching the reference's per-table error isolation
    (``2_collect_database_schema_info.py:105-107``); so are foreign
    warehouse entries that are not catalog tables at all (junk
    directories, stray files — the reference's non-Iceberg-provider
    skip, ``2_collect_database_schema_info.py:162-171``), each with a
    warning instead of a crash. This walks catalog metadata only — no
    data jobs. The distributed form of the same resolution (for
    catalogs with millions of tables) is the window/max_by pattern in
    queries.relational.asof_snapshot_resolution.
    """
    plan = MigrationPlan(as_of=as_of if isinstance(as_of, str) or as_of is None else as_of.isoformat())
    for db in databases or src.list_namespaces():
        for foreign in src.list_foreign_entries(db):
            reason = "not a snapshot-catalog table (no metadata/table.json)"
            warnings.warn(f"skipping {db}/{foreign}: {reason}", stacklevel=2)
            plan.skipped.append({"database": db, "table_name": foreign, "reason": reason})
        for name in src.list_tables(db):
            tbl = src.table(db, name)
            try:
                snap = tbl.resolve_snapshot(as_of=as_of)
            except LookupError as e:
                plan.skipped.append({"database": db, "table_name": name, "reason": str(e)})
                continue
            plan.tables.append(
                TableMigration(
                    database=db,
                    table_name=name,
                    snapshot_id=snap.snapshot_id,
                    committed_at=snap.committed_at,
                    schema_ddl=snap.schema_ddl,
                    partition_spec=list(snap.partition_spec),
                    properties=tbl.properties(),
                    records=snap.total_records,
                )
            )
    return plan
