"""Backend contract parity (round-4 verdict action #8): the SAME
snapshot/time-travel/row-level/maintenance assertions run against
``SnapCatalog`` (always) and ``IcebergCatalog`` (gated on the runtime
jar — absent in this container, see test_iceberg_real.py). The day a
jar is on the classpath, parity lights up with zero new test code:
both backends are driven through one thin adapter protocol, so any
behavioral split between the parquet-native implementation and real
Iceberg fails HERE first."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from apache_iceberg_tables_migration_tool_spark.sources.iceberg_real import (
    IcebergCatalog,
    iceberg_available,
)
from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

_seq = itertools.count()


class SnapBackend:
    """Adapter: SnapCatalog → the common contract surface."""

    def __init__(self, spark, warehouse: str):
        self.spark = spark
        self.cat = SnapCatalog(warehouse)

    def create_namespace(self, db):
        self.cat.create_namespace(db)

    def write(self, db, t, df, mode="append"):
        self.cat.write(db, t, df, mode=mode)

    def read(self, db, t, snapshot_id=None):
        return self.cat.table(db, t).read(self.spark, snapshot_id=snapshot_id)

    def snapshot_ids(self, db, t):
        return [s.snapshot_id for s in self.cat.table(db, t).snapshots()]

    def tag(self, db, t, name):
        self.cat.tag(db, t, name)

    def read_ref(self, db, t, name):
        return self.cat.table(db, t).read(self.spark, ref=name)

    def delete_where(self, db, t, condition):
        self.cat.delete_where(db, t, condition)

    def upsert(self, db, t, updates, key_cols):
        self.cat.upsert(db, t, updates, key_cols=key_cols)

    def expire_keep_current(self, db, t):
        self.cat.expire_snapshots(db, t, keep_last=1)


class IcebergBackend:
    """Adapter: IcebergCatalog → the same surface."""

    def __init__(self, spark, catalog: str):
        self.spark = spark
        self.cat = IcebergCatalog(spark, catalog)

    def create_namespace(self, db):
        self.cat.create_namespace(db)

    def write(self, db, t, df, mode="append"):
        if t not in self.cat.list_tables(db):
            ddl = ", ".join(
                f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
            )
            self.cat.create_table(db, t, ddl)
        self.cat.write(db, t, df, mode=mode)

    def read(self, db, t, snapshot_id=None):
        return self.cat.read(db, t, snapshot_id=snapshot_id)

    def snapshot_ids(self, db, t):
        return [
            r["snapshot_id"]
            for r in self.cat.snapshots_df(db, t)
            .orderBy("committed_at")
            .collect()
        ]

    def tag(self, db, t, name):
        self.cat.tag(db, t, name)

    def read_ref(self, db, t, name):
        return self.cat.read_ref(db, t, name)

    def delete_where(self, db, t, condition):
        self.cat.delete_where(db, t, condition)

    def upsert(self, db, t, updates, key_cols):
        self.cat.upsert(db, t, updates, key_cols=key_cols)

    def expire_keep_current(self, db, t):
        self.cat.expire_snapshots(db, t, older_than="2100-01-01 00:00:00")


@pytest.fixture(params=["snap", "iceberg"])
def backend(request, spark, tmp_path):
    if request.param == "snap":
        return SnapBackend(spark, str(tmp_path / "wh"))
    if not iceberg_available(spark):
        pytest.skip(
            "iceberg-spark-runtime not on the classpath (see "
            "test_iceberg_real.py) — parity runs wherever the jar exists"
        )
    return IcebergBackend(spark, "contract_it")


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") * 10).cast("long").alias("v"),
    )


def _fresh(backend):
    db = "contract"
    t = f"t{next(_seq)}"
    backend.create_namespace(db)
    return db, t


def test_contract_write_read_roundtrip(spark, backend):
    db, t = _fresh(backend)
    backend.write(db, t, _df(spark, 0, 10))
    out = backend.read(db, t)
    assert out.count() == 10
    assert out.agg(F.sum("v")).collect()[0][0] == sum(i * 10 for i in range(10))


def test_contract_append_and_snapshot_log(spark, backend):
    db, t = _fresh(backend)
    backend.write(db, t, _df(spark, 0, 5))
    backend.write(db, t, _df(spark, 5, 10))
    assert backend.read(db, t).count() == 10
    assert len(backend.snapshot_ids(db, t)) == 2


def test_contract_time_travel(spark, backend):
    db, t = _fresh(backend)
    backend.write(db, t, _df(spark, 0, 5))
    backend.write(db, t, _df(spark, 5, 10))
    first = backend.snapshot_ids(db, t)[0]
    assert backend.read(db, t, snapshot_id=first).count() == 5
    assert backend.read(db, t).count() == 10


def test_contract_tag_pins_state(spark, backend):
    db, t = _fresh(backend)
    backend.write(db, t, _df(spark, 0, 5))
    backend.tag(db, t, "v1")
    backend.write(db, t, _df(spark, 5, 10))
    assert backend.read_ref(db, t, "v1").count() == 5
    assert backend.read(db, t).count() == 10


def test_contract_delete_where(spark, backend):
    db, t = _fresh(backend)
    backend.write(db, t, _df(spark, 0, 10))
    backend.delete_where(db, t, "id >= 7")
    out = backend.read(db, t)
    assert sorted(r["id"] for r in out.collect()) == list(range(7))


def test_contract_upsert(spark, backend):
    db, t = _fresh(backend)
    backend.write(db, t, _df(spark, 0, 5))
    updates = spark.createDataFrame([(3, 999), (7, 70)], "id int, v long")
    backend.upsert(db, t, updates, key_cols=["id"])
    got = {r["id"]: r["v"] for r in backend.read(db, t).collect()}
    assert got[3] == 999 and got[7] == 70 and len(got) == 6


def test_contract_expire_keeps_current_readable(spark, backend):
    db, t = _fresh(backend)
    backend.write(db, t, _df(spark, 0, 5))
    backend.write(db, t, _df(spark, 5, 10))
    backend.expire_keep_current(db, t)
    assert backend.read(db, t).count() == 10
    assert len(backend.snapshot_ids(db, t)) == 1
