"""Real Apache Iceberg catalog adapter (production path).

`SnapCatalog` implements the snapshot/time-travel/maintenance
semantics on plain parquet so the whole engine is testable in this
container (no Iceberg runtime jar available, and installs are not
permitted). On a cluster with `iceberg-spark-runtime` on the
classpath, THIS adapter exposes the same surface over genuine
Iceberg tables, using exactly the mechanisms the reference uses:

- session catalogs via ``spark.sql.catalog.<name>`` config
  (≙ `1_collect_src_snapshots.py:24-34`, `5_migrate_tables_data.py:29-36`
  dual-catalog setup);
- `.snapshots` metadata table scans (≙ `1_collect_src_snapshots.py:61-62`)
  — plus `.files`, fixing the reference's G3 (it queried `.snapshots`
  for `file_path`, a column that lives in `.files`);
- time-travel reads via the `snapshot-id` / `as-of-timestamp` read
  options (≙ `2_collect_database_schema_info.py:151-153`,
  `5_migrate_tables_data.py:72-74`);
- DDL with `PARTITIONED BY` + `TBLPROPERTIES` (fixing G1/G2: types
  come from `simpleString()` DDL, partition spec survives creation);
- maintenance via the Iceberg procedures
  (`CALL <cat>.system.expire_snapshots/rewrite_data_files`).

Every method raises a clear error when the runtime is absent, so
importing this module is always safe (import-try gating per the
build contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CATALOG_CLASS = "org.apache.iceberg.spark.SparkCatalog"


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(ICEBERG_CATALOG_CLASS)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


#: Iceberg SQL extensions class — required for MERGE INTO, branch DDL
#: and the CALL maintenance procedures on real Iceberg catalogs.
ICEBERG_EXTENSIONS = "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"

#: public catalog-impl / io-impl classes the reference deploys with
GLUE_CATALOG_IMPL = "org.apache.iceberg.aws.glue.GlueCatalog"
S3TABLES_CATALOG_IMPL = "software.amazon.s3tables.iceberg.S3TablesCatalog"
REST_CATALOG_TYPE = "rest"
S3_FILE_IO_IMPL = "org.apache.iceberg.aws.s3.S3FileIO"


def _apply(builder, conf: dict[str, str]):
    """Apply a config dict to either a SparkSession.Builder or return
    it merged into a plain dict (pure assembly — unit-testable with no
    JVM, no AWS)."""
    if isinstance(builder, dict):
        builder.update(conf)
        return builder
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder


def catalog_conf(
    name: str,
    *,
    type: str | None = None,
    catalog_impl: str | None = None,
    warehouse: str | None = None,
    io_impl: str | None = None,
    extra: dict[str, str] | None = None,
    with_extensions: bool = True,
) -> dict[str, str]:
    """Assemble the ``spark.sql.catalog.<name>.*`` property map for an
    Iceberg session catalog. Pure string building — the piece of the
    reference's deployment story (`1_collect_src_snapshots.py:31-34`,
    `5_migrate_tables_data.py:27-37`) that IS verifiable offline."""
    prefix = f"spark.sql.catalog.{name}"
    conf: dict[str, str] = {prefix: ICEBERG_CATALOG_CLASS}
    if type is not None:
        conf[f"{prefix}.type"] = type
    if catalog_impl is not None:
        conf[f"{prefix}.catalog-impl"] = catalog_impl
    if warehouse is not None:
        conf[f"{prefix}.warehouse"] = warehouse
    if io_impl is not None:
        conf[f"{prefix}.io-impl"] = io_impl
    for k, v in (extra or {}).items():
        conf[f"{prefix}.{k}"] = v
    if with_extensions:
        conf["spark.sql.extensions"] = ICEBERG_EXTENSIONS
    return conf


def configure_hadoop_catalog(builder, name: str, warehouse: str):
    """Attach a local/HDFS/S3 Hadoop-style Iceberg catalog to a
    SparkSession builder (test/prod parity with the reference's Glue
    and S3Tables catalog configs)."""
    return _apply(
        builder,
        catalog_conf(name, type="hadoop", warehouse=warehouse, with_extensions=False),
    )


def configure_glue_catalog(
    builder,
    name: str,
    warehouse: str,
    *,
    io_impl: str = S3_FILE_IO_IMPL,
    extra: dict[str, str] | None = None,
):
    """AWS Glue Data Catalog — the reference's SOURCE catalog config
    (`1_collect_src_snapshots.py:31-34`: GlueCatalog + S3FileIO +
    warehouse URI). ``builder`` may be a SparkSession.Builder or a
    plain dict (returned merged, for offline tests)."""
    return _apply(
        builder,
        catalog_conf(
            name, catalog_impl=GLUE_CATALOG_IMPL, warehouse=warehouse,
            io_impl=io_impl, extra=extra,
        ),
    )


def configure_s3tables_catalog(
    builder, name: str, table_bucket_arn: str, *, extra: dict[str, str] | None = None
):
    """Amazon S3 Tables — the reference's TARGET catalog config
    (`5_migrate_tables_data.py:33-36`: S3TablesCatalog with the table
    bucket ARN as the warehouse)."""
    return _apply(
        builder,
        catalog_conf(
            name, catalog_impl=S3TABLES_CATALOG_IMPL,
            warehouse=table_bucket_arn, extra=extra,
        ),
    )


def configure_rest_catalog(
    builder,
    name: str,
    uri: str,
    *,
    warehouse: str | None = None,
    credential: str | None = None,
    token: str | None = None,
    extra: dict[str, str] | None = None,
):
    """Iceberg REST catalog (e.g. a self-hosted REST server, Polaris,
    or any spec-compliant endpoint): ``type=rest`` + ``uri`` plus
    optional OAuth2 ``credential``/``token`` passthrough."""
    props: dict[str, str] = {"uri": uri}
    if credential is not None:
        props["credential"] = credential
    if token is not None:
        props["token"] = token
    props.update(extra or {})
    return _apply(
        builder,
        catalog_conf(name, type=REST_CATALOG_TYPE, warehouse=warehouse, extra=props),
    )


class IcebergCatalog:
    """Same capability surface as ``SnapCatalog``, over real Iceberg
    tables in a configured Spark catalog."""

    def __init__(self, spark: SparkSession, catalog: str):
        self.spark = spark
        self.catalog = catalog
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg Spark runtime not on the classpath; add "
                "iceberg-spark-runtime to spark.jars.packages (this container "
                "has no Iceberg jar — use SnapCatalog for local testing)"
            )

    # ---- naming ---------------------------------------------------------

    def _qualified(self, database: str, name: str) -> str:
        # uniform backtick quoting (reference quotes only dashed names,
        # 2_collect_database_schema_info.py:145-148)
        return f"`{self.catalog}`.`{database}`.`{name}`"

    # ---- enumeration (S1) ----------------------------------------------

    def list_namespaces(self) -> list[str]:
        rows = self.spark.sql(f"SHOW NAMESPACES IN `{self.catalog}`").collect()
        return sorted(r[0] for r in rows)

    def list_tables(self, database: str) -> list[str]:
        rows = self.spark.sql(f"SHOW TABLES IN `{self.catalog}`.`{database}`").collect()
        return sorted(r["tableName"] for r in rows)

    # ---- metadata tables (S2; G3 fix) ----------------------------------

    def snapshots_df(self, database: str, name: str) -> DataFrame:
        return self.spark.table(f"{self._qualified(database, name)}.snapshots")

    def files_df(self, database: str, name: str) -> DataFrame:
        return self.spark.table(f"{self._qualified(database, name)}.files")

    def history_df(self, database: str, name: str) -> DataFrame:
        return self.spark.table(f"{self._qualified(database, name)}.history")

    # ---- DDL (W1/W2; G1+G2 fixes) --------------------------------------

    def create_namespace(self, database: str) -> None:
        self.spark.sql(f"CREATE NAMESPACE IF NOT EXISTS `{self.catalog}`.`{database}`")

    def create_table(
        self,
        database: str,
        name: str,
        schema_ddl: str,
        partition_by: list[str] | None = None,
        properties: dict[str, str] | None = None,
    ) -> None:
        parts = f" PARTITIONED BY ({', '.join(partition_by)})" if partition_by else ""
        props = (
            " TBLPROPERTIES (" + ", ".join(f"'{k}'='{v}'" for k, v in properties.items()) + ")"
            if properties
            else ""
        )
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self._qualified(database, name)} "
            f"({schema_ddl}) USING iceberg{parts}{props}"
        )

    # ---- reads (S3/S4/S5) ----------------------------------------------

    def read(
        self,
        database: str,
        name: str,
        snapshot_id: int | None = None,
        as_of: str | None = None,
    ) -> DataFrame:
        reader = self.spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", snapshot_id)
        elif as_of is not None:
            reader = reader.option("as-of-timestamp", as_of)
        return reader.table(self._qualified(database, name))

    # ---- writes (W3) ----------------------------------------------------

    def write(self, database: str, name: str, df: DataFrame, mode: str = "append") -> None:
        writer = df.writeTo(self._qualified(database, name))
        if mode == "overwrite":
            # full overwrite in one commit; partition-scoped overwrites
            # should use overwritePartitions() on a partitioned target
            writer.using("iceberg").createOrReplace()
        else:
            writer.append()

    # ---- refs & write-audit-publish -------------------------------------

    def write_staged(
        self, database: str, name: str, df: DataFrame, wap_id: str
    ) -> None:
        """WAP staged append (≙ SnapCatalog.write(staged=True)): with
        ``write.wap.enabled`` on the table and ``spark.wap.id`` set,
        Iceberg commits the snapshot to the log WITHOUT advancing the
        current pointer; the snapshot carries ``wap.id`` in its
        summary for the auditor to find."""
        self.spark.sql(
            f"ALTER TABLE {self._qualified(database, name)} "
            f"SET TBLPROPERTIES ('write.wap.enabled' = 'true')"
        )
        self.spark.conf.set("spark.wap.id", wap_id)
        try:
            df.writeTo(self._qualified(database, name)).append()
        finally:
            self.spark.conf.unset("spark.wap.id")

    def find_staged_snapshot(self, database: str, name: str, wap_id: str) -> int:
        """Snapshot id of a staged WAP commit, from the .snapshots
        metadata table's summary map."""
        from pyspark.sql import functions as F

        rows = (
            self.snapshots_df(database, name)
            .where(F.element_at("summary", "wap.id") == wap_id)
            .select("snapshot_id")
            .collect()
        )
        if not rows:
            raise LookupError(f"no staged snapshot with wap.id={wap_id!r}")
        return rows[0]["snapshot_id"]

    def publish(self, database: str, name: str, snapshot_id: int) -> DataFrame:
        """Publish a staged snapshot (≙ SnapCatalog.publish):
        ``cherrypick_snapshot`` fast-forwards when the base is
        unmoved and cherry-picks appends onto a moved base, erroring
        on non-reappliable changes — the same semantics the
        filesystem catalog implements."""
        return self.spark.sql(
            f"CALL `{self.catalog}`.system.cherrypick_snapshot("
            f"table => '{database}.{name}', snapshot_id => {snapshot_id})"
        )

    def tag(
        self, database: str, name: str, tag_name: str, snapshot_id: int | None = None
    ) -> None:
        """CREATE TAG (ref-retained by expire_snapshots, like
        SnapCatalog.tag)."""
        at = f" AS OF VERSION {snapshot_id}" if snapshot_id is not None else ""
        self.spark.sql(
            f"ALTER TABLE {self._qualified(database, name)} "
            f"CREATE OR REPLACE TAG `{tag_name}`{at}"
        )

    def drop_ref(self, database: str, name: str, ref_name: str) -> None:
        self.spark.sql(
            f"ALTER TABLE {self._qualified(database, name)} DROP TAG `{ref_name}`"
        )

    def read_ref(self, database: str, name: str, ref: str) -> DataFrame:
        """Read a tag/branch by name (``VERSION AS OF 'ref'``)."""
        return self.spark.read.option("tag", ref).table(
            self._qualified(database, name)
        )

    # ---- maintenance (X7) ----------------------------------------------

    def expire_snapshots(self, database: str, name: str, older_than: str) -> DataFrame:
        return self.spark.sql(
            f"CALL `{self.catalog}`.system.expire_snapshots("
            f"table => '{database}.{name}', older_than => TIMESTAMP '{older_than}')"
        )

    def compact(self, database: str, name: str) -> DataFrame:
        return self.spark.sql(
            f"CALL `{self.catalog}`.system.rewrite_data_files(table => '{database}.{name}')"
        )

    def compact_sorted(self, database: str, name: str, sort_by: list[str]) -> DataFrame:
        """Sort-order rewrite (≙ SnapCatalog.compact(sort_by=…)):
        range-clusters files so column min/max stats enable scan
        skipping on the sort key."""
        order = ", ".join(sort_by)
        return self.spark.sql(
            f"CALL `{self.catalog}`.system.rewrite_data_files("
            f"table => '{database}.{name}', strategy => 'sort', "
            f"sort_order => '{order}')"
        )

    # ---- row-level operations (SnapCatalog.upsert/delete_where parity) --

    def upsert(
        self, database: str, name: str, updates: DataFrame, key_cols: list[str]
    ) -> None:
        """MERGE INTO: the Iceberg runtime plans copy-on-write (or
        merge-on-read per table properties) itself — same contract as
        ``SnapCatalog.upsert``."""
        updates.createOrReplaceTempView("__merge_updates")
        on = " AND ".join(f"t.`{k}` = s.`{k}`" for k in key_cols)
        self.spark.sql(
            f"MERGE INTO {self._qualified(database, name)} t "
            f"USING __merge_updates s ON {on} "
            f"WHEN MATCHED THEN UPDATE SET * "
            f"WHEN NOT MATCHED THEN INSERT *"
        )

    def delete_where(self, database: str, name: str, condition: str) -> None:
        """DELETE FROM with a SQL predicate (file-level COW/MOR chosen
        by the runtime) — ``SnapCatalog.delete_where`` parity."""
        self.spark.sql(
            f"DELETE FROM {self._qualified(database, name)} WHERE {condition}"
        )

    def read_incremental(
        self, database: str, name: str, from_id: int, to_id: int
    ) -> DataFrame:
        """Incremental append scan between snapshots —
        ``SnapTable.read_incremental`` parity via the native
        start/end-snapshot-id read options."""
        return (
            self.spark.read.option("start-snapshot-id", from_id)
            .option("end-snapshot-id", to_id)
            .table(self._qualified(database, name))
        )
