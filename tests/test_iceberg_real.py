"""End-to-end test of the real-Iceberg adapter.

SKIPPED in this container: `iceberg-spark-runtime` is not on the
classpath and cannot be vendored (no network / no Maven cache —
see README "Real-Iceberg execution status"). On any machine where
the jar IS present (e.g. `pyspark --packages
org.apache.iceberg:iceberg-spark-runtime-4.1_2.13:<ver>`), this
module runs the reference's full lifecycle through
`sources/iceberg_real.IcebergCatalog` on a local Hadoop catalog:
create → append ×2 → time-travel → expire_snapshots →
rewrite_data_files → MERGE → DELETE → incremental read
(reference substrate: 1_collect_src_snapshots.py:24-35,
5_migrate_tables_data.py:72-83, 6_verify_data_integrity.py:74-87).
"""

import pytest
from pyspark.sql import SparkSession

from apache_iceberg_tables_migration_tool_spark.sources.iceberg_real import (
    IcebergCatalog,
    configure_hadoop_catalog,
    iceberg_available,
)


@pytest.fixture(scope="module")
def iceberg_spark(tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("iceberg_wh"))
    builder = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-e2e")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
    )
    spark = configure_hadoop_catalog(builder, "it", wh).getOrCreate()
    if not iceberg_available(spark):
        pytest.skip(
            "iceberg-spark-runtime not on the classpath. Jar resolution "
            "re-attempted in rounds 3, 4, 5 AND 7: no iceberg jar anywhere on "
            "the filesystem (`find / -name '*iceberg*.jar'` empty, "
            "pyspark/jars has no iceberg artifact), no ~/.ivy2 or ~/.m2 "
            "cache to resolve offline, and no network (repo1.maven.org "
            "and pypi.org both fail DNS), so --packages/--jars/pip can't "
            "fetch org.apache.iceberg:iceberg-spark-runtime-4.1_2.13 "
            "(reference pins iceberg-spark-runtime-3.5_2.12:1.6.1, "
            "1_collect_src_snapshots.py:24-29). On a machine with the jar "
            "this module runs the full lifecycle."
        )
    yield spark


def test_full_lifecycle_on_hadoop_catalog(iceberg_spark):
    spark = iceberg_spark
    cat = IcebergCatalog(spark, "it")
    cat.create_namespace("db")
    cat.create_table(
        "db", "t", "id BIGINT, region STRING, amount DOUBLE",
        partition_by=["region"], properties={"owner": "etl"},
    )

    cat.write("db", "t", spark.createDataFrame(
        [(1, "eu", 10.0), (2, "us", 20.0)], "id BIGINT, region STRING, amount DOUBLE"))
    cat.write("db", "t", spark.createDataFrame(
        [(3, "eu", 30.0)], "id BIGINT, region STRING, amount DOUBLE"))

    snaps = cat.snapshots_df("db", "t").orderBy("committed_at").collect()
    assert len(snaps) == 2
    first_id = snaps[0]["snapshot_id"]

    # time travel to the first append
    assert cat.read("db", "t", snapshot_id=first_id).count() == 2
    assert cat.read("db", "t").count() == 3

    # incremental read covers exactly the second append
    inc = cat.read_incremental("db", "t", snaps[0]["snapshot_id"], snaps[1]["snapshot_id"])
    assert [r["id"] for r in inc.collect()] == [3]

    # row-level ops
    cat.upsert("db", "t", spark.createDataFrame(
        [(2, "us", 25.0), (4, "ap", 40.0)], "id BIGINT, region STRING, amount DOUBLE"),
        key_cols=["id"])
    assert cat.read("db", "t").where("id = 2").collect()[0]["amount"] == 25.0
    cat.delete_where("db", "t", "region = 'ap'")
    assert cat.read("db", "t").where("region = 'ap'").count() == 0

    # maintenance procedures execute and the table stays readable
    cat.compact("db", "t")
    cat.compact_sorted("db", "t", ["id"])
    cat.expire_snapshots("db", "t", older_than="2100-01-01 00:00:00")
    assert cat.read("db", "t").count() == 3
    assert cat.files_df("db", "t").count() >= 1
    assert cat.history_df("db", "t").count() >= 1


def test_wap_stage_audit_publish_on_real_iceberg(iceberg_spark):
    spark = iceberg_spark
    cat = IcebergCatalog(spark, "it")
    cat.create_namespace("db")
    cat.create_table("db", "w", "id BIGINT, v DOUBLE")
    cat.write("db", "w", spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "id BIGINT, v DOUBLE"))

    # staged append: current state unchanged until publish
    cat.write_staged("db", "w", spark.createDataFrame(
        [(3, 3.0)], "id BIGINT, v DOUBLE"), wap_id="audit-9")
    assert cat.read("db", "w").count() == 2
    staged_id = cat.find_staged_snapshot("db", "w", "audit-9")
    assert cat.read("db", "w", snapshot_id=staged_id).count() == 3

    cat.publish("db", "w", staged_id)
    assert cat.read("db", "w").count() == 3

    # tag + read-by-ref + drop
    cat.tag("db", "w", "v1")
    assert cat.read_ref("db", "w", "v1").count() == 3
    cat.drop_ref("db", "w", "v1")
