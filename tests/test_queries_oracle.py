"""Every registered query with an oracle runs at sf0.001 and must
match DuckDB exactly (the driver repeats this at sf0.01)."""

from __future__ import annotations

import pytest

from apache_iceberg_tables_migration_tool_spark.queries import QUERIES
from tests.conftest import SF_DIR
from tests.oracle_harness import compare, run_oracle

ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, SF_DIR)
    pdf = run_oracle(spec.oracle, SF_DIR)
    compare(sdf, pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
