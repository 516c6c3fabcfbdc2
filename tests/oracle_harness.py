"""Replica of the driver's Spark-vs-DuckDB comparison so parity
breaks in pytest before they break in CORRECTNESS_r{N}.json.

Normalization: sort columns by name, sort rows by all columns,
compare exact (our queries are engineered to be bit-deterministic —
any drift is a real parity bug, not noise).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from apache_iceberg_tables_migration_tool_spark.sources.fixtures import TABLES, table_path


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con.sql(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str) -> None:
    got = _normalize(spark_df.toPandas())
    want = _normalize(oracle_pdf)
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        # The driver hashes stringified values, so bigint 1653 vs HUGEINT→
        # float64 1653.0 is a red row even when numerically equal (round-1
        # vector_sql_arith failure). Mirror that: an int/float dtype-class
        # split between engines is a parity bug, not noise.
        g_num = np.issubdtype(g.dtype, np.number)
        w_num = np.issubdtype(np.asarray(w).dtype, np.number)
        if g_num and w_num:
            g_float = np.issubdtype(g.dtype, np.floating)
            w_float = np.issubdtype(np.asarray(w).dtype, np.floating)
            assert g_float == w_float, (
                f"{name}: dtype-class mismatch on {c!r}: spark={g.dtype} vs "
                f"oracle={np.asarray(w).dtype} — the driver's value hash will "
                f"differ even if values are equal (CAST the oracle side)"
            )
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(np.asarray(w).dtype, np.floating):
            g = np.asarray(g, dtype=np.float64)
            w = np.asarray(w, dtype=np.float64)
            both_nan = np.isnan(g) & np.isnan(w)
            same = (g == w) | both_nan
            assert same.all(), (
                f"{name}: float col {c!r} differs; max abs diff "
                f"{np.nanmax(np.abs(g - w))}; first rows {g[~same][:3]} vs {w[~same][:3]}"
            )
        else:
            eq = pd.Series(g).astype(str).eq(pd.Series(w).astype(str))
            assert eq.all(), (
                f"{name}: col {c!r} differs at rows {np.where(~eq)[0][:5]}: "
                f"{g[~eq.to_numpy()][:3]} vs {w[~eq.to_numpy()][:3]}"
            )
