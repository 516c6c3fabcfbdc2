"""Round-trip tests for the multi-format source/sink adapters."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from apache_iceberg_tables_migration_tool_spark.sources.fixtures import load
from apache_iceberg_tables_migration_tool_spark.sources.formats import (
    FORMATS,
    convert,
    read_table,
    write_table,
)
from tests.conftest import SF_DIR


def _fingerprint(df):
    """Order-insensitive content fingerprint over stringified rows."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\0")) for c in df.columns]
    return (
        df.select(F.xxhash64(*cols).alias("h"))
        .selectExpr("bit_xor(h) AS x", "count(*) AS n")  # xor: order-insensitive, no overflow
        .first()
    )


@pytest.mark.parametrize("fmt", FORMATS)
def test_roundtrip_preserves_rows_and_schema(spark, fmt, tmp_path):
    src = load(spark, SF_DIR, "orders")  # bigints, doubles, strings, timestamp
    path = str(tmp_path / f"orders_{fmt}")
    write_table(src, path, fmt)
    back = read_table(spark, path, fmt, src.schema)
    assert [f.name for f in back.schema.fields] == [f.name for f in src.schema.fields]
    assert _fingerprint(back) == _fingerprint(src)


def test_csv_null_vs_empty_string(spark, tmp_path):
    df = spark.createDataFrame([(1, None), (2, ""), (3, "x")], "id int, s string")
    path = str(tmp_path / "nulls_csv")
    write_table(df, path, "csv")
    back = read_table(spark, path, "csv", df.schema)
    got = {r["id"]: r["s"] for r in back.collect()}
    assert got == {1: None, 2: "", 3: "x"}


def test_csv_rejects_nested_columns(spark, tmp_path):
    df = spark.range(1).select(F.struct(F.lit(1).alias("a")).alias("s"))
    with pytest.raises(ValueError, match="nested"):
        write_table(df, str(tmp_path / "bad"), "csv")


def test_convert_csv_to_parquet(spark, tmp_path):
    src = load(spark, SF_DIR, "customer")
    csv_path, pq_path = str(tmp_path / "c_csv"), str(tmp_path / "c_pq")
    write_table(src, csv_path, "csv")
    convert(spark, csv_path, "csv", pq_path, "parquet", src.schema, repartition=2)
    back = read_table(spark, pq_path, "parquet", src.schema)
    assert _fingerprint(back) == _fingerprint(src)
