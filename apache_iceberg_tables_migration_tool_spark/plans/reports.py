"""Report aggregation as DataFrames (reference W5/A4).

The reference computes per-database subtotals + grand totals in
driver-Python dict loops (~230 LoC across the four report writers,
e.g. ``5_migrate_tables_data.py:124-163``); here it's one ROLLUP
aggregation, rendered at the edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def summarize_report(report: DataFrame, status_col: str = "status") -> DataFrame:
    """Per-database rollup: table counts, success counts, record sums.
    The NULL database row is the grand total."""
    agg = [
        F.count(F.lit(1)).alias("n_tables"),
        F.count(F.when(F.col(status_col) == "success", 1)).alias("n_success"),
    ]
    if "records_migrated" in report.columns:
        agg.append(F.sum("records_migrated").alias("total_records"))
    if "src_records" in report.columns:
        agg.append(F.sum("src_records").alias("total_src_records"))
    return report.rollup("database").agg(*agg).orderBy(F.col("database").asc_nulls_last())


def render_text(summary: DataFrame) -> str:
    """Human-readable edge rendering (the reference's .txt reports)."""
    lines = ["database | " + " | ".join(c for c in summary.columns if c != "database")]
    for row in summary.collect():
        d = row["database"] if row["database"] is not None else "TOTAL"
        rest = " | ".join(str(row[c]) for c in summary.columns if c != "database")
        lines.append(f"{d} | {rest}")
    return "\n".join(lines)
