"""Z-order (Morton) clustering: interleave the bits of several
normalized columns into one sort key so that range-partitioned files
cover small HYPER-RECTANGLES of the key space instead of slabs of a
single leading column (≙ Iceberg's ``rewrite_data_files`` with a
zorder sort strategy / Delta OPTIMIZE ZORDER BY).

Why it matters at 100 TB: lexicographic ``sort_by (a, b)`` makes
every file span nearly the FULL domain of ``b``, so a filter on
``b`` alone prunes nothing. Z-order bounds every file in every
dimension at once — parquet footer min/max stats then skip whole
files for predicates on ANY subset of the z-columns.

The z-value is generated as a SQL expression over exact int64
arithmetic (integer division, shifts, masks) in BOTH the Spark and
DuckDB dialects from one shared builder, so the key is reproducible
bit-for-bit across engines — the oracle-checked ``zorder_values``
query relies on that.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _build(
    cols: list[str],
    bounds: list[tuple[int, int]],
    bits: int,
    div: str,
    shl,
    shr,
) -> str:
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds int64")
    levels = (1 << bits) - 1
    normed = []
    for c, (lo, hi) in zip(cols, bounds):
        span = hi - lo
        if span <= 0:
            normed.append("0")
        else:
            # exact: ((c - lo) * (2^bits - 1)) intdiv (hi - lo)
            normed.append(f"((CAST({c} AS BIGINT) - {lo}) * {levels}) {div} {span}")
    parts = []
    for i in range(bits):
        for j, nc in enumerate(normed):
            if nc == "0":
                continue
            parts.append(shl(f"({shr(nc, i)} & 1)", i * n + j))
    return " | ".join(parts) if parts else "CAST(0 AS BIGINT)"


def default_bits(n_cols: int) -> int:
    return min(16, 63 // n_cols)


def zvalue_sql_spark(
    cols: list[str], bounds: list[tuple[int, int]], bits: int | None = None
) -> str:
    """Spark-SQL z-value expression (shiftleft/shiftright, div)."""
    bits = bits or default_bits(len(cols))
    return _build(
        cols, bounds, bits, "div",
        lambda x, k: f"shiftleft({x}, {k})",
        lambda x, k: f"shiftright(({x}), {k})",
    )


def zvalue_sql_duckdb(
    cols: list[str], bounds: list[tuple[int, int]], bits: int | None = None
) -> str:
    """DuckDB z-value expression (<<, >>, //) — the oracle twin,
    byte-identical semantics to :func:`zvalue_sql_spark`."""
    bits = bits or default_bits(len(cols))
    return _build(
        cols, bounds, bits, "//",
        lambda x, k: f"(({x}) << {k})",
        lambda x, k: f"(({x}) >> {k})",
    )


def zvalue_col(
    cols: list[str], bounds: list[tuple[int, int]], bits: int | None = None
) -> Column:
    """The z-value as a Spark Column (whole-stage-codegen integer
    ops — no UDF, no shuffle). ``cols`` must be integral with known
    [lo, hi] bounds (get them from one small agg, or from catalog
    stats at scale)."""
    return F.expr(zvalue_sql_spark(cols, bounds, bits))
