"""Cross-engine-deterministic numeric expression helpers.

The driver's correctness gate hashes query output values from Spark
and from a DuckDB oracle. Double-precision *aggregation* is
order-dependent, so a naive ``SUM(double)`` can differ in the last
bits between engines (different partial-sum orders). These helpers
make aggregates bit-deterministic:

- per-row values are cast to an exact ``DECIMAL`` (the fixtures carry
  2-decimal monetary doubles, so a scale ≥ value-scale + 2 guard
  digits round-trips exactly),
- the aggregate runs in decimal (exact, order-insensitive),
- the result is cast back to ``DOUBLE`` (one deterministic
  nearest-even conversion — identical in any IEEE-754 engine).

Per-row double *arithmetic* (``price * (1 - discount)``) is already
IEEE-deterministic when both engines evaluate the same expression
tree, so it stays in double and is only decimal-cast at the
aggregation boundary.

All helpers are pure Column expressions — whole-stage-codegen
friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 4, precision: int = 28) -> Column:
    """Order-insensitive exact sum of a double column → DOUBLE.

    High-scale sums (6-8 decimals) are floored to exact integer cents
    before the double conversion. Two reasons, both found the hard
    way: (a) a decimal with > ~16 significant digits converts to
    double with engine-dependent last-ULP rounding; (b) rounding
    half-values differs across engines (Spark HALF_UP vs DuckDB
    half-even) and 6-decimal sums of 2-decimal money land on exact
    .xx5 ties constantly. FLOOR has no tie cases, the cents stay
    < 2^53 (exact in double), and cents/100.0 is one correctly-rounded
    IEEE op — bit-identical everywhere.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.sum(c.cast(f"decimal({precision},{scale})"))
    if scale > 2:
        return F.floor(s * 100).cast("long") / F.lit(100.0)
    return s.cast("double")


def davg(col: Column | str, scale: int = 4, precision: int = 28) -> Column:
    """Deterministic mean: exact decimal sum → double ÷ bigint count.

    Division of two deterministic doubles is a single IEEE op, so the
    result is reproducible across engines (unlike AVG(double)).
    """
    c = F.col(col) if isinstance(col, str) else col
    num = F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")
    den = F.count(c)
    return num / den


def portable_sum_sql(expr: str, scale: int = 4, precision: int = 28) -> str:
    """DuckDB-side twin of :func:`dsum` for oracle SQL strings."""
    inner = f"SUM(CAST(({expr}) AS DECIMAL({precision},{scale})))"
    if scale > 2:
        return f"CAST(FLOOR({inner} * 100) AS BIGINT) / 100.0"
    return f"CAST({inner} AS DOUBLE)"


def portable_avg_sql(expr: str, scale: int = 4, precision: int = 28) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL({precision},{scale}))) AS DOUBLE)"
        f" / COUNT({expr})"
    )
