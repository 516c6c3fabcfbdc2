"""Declarative data-quality constraint validation (Deequ/dbt-tests
style, public pattern) — the acceptance gate a migration or a
training-data ingest runs before trusting a table. The reference's
verification stage checks only count + checksum
(`6_verify_data_integrity.py:45-115`); this adds column-level
constraints as first-class, scale-shaped checks:

- Scalar row predicates (not_null / accepted_values / in_range /
  matches / custom SQL) FUSE into ONE aggregation pass over the
  table — k constraints cost one scan, not k.
- ``unique`` adds one hash-shuffle per distinct key set (a groupBy
  on the key, counting groups with multiplicity > 1).
- ``foreign_key`` adds one join per reference — broadcast when the
  referenced key side is dimension-sized.

Every check emits (rule, column, violations, total, passed) — a
DataFrame report, not driver booleans, so it lands in catalogs /
reports like any other data.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    kind: str
    column: str  # display column ("a,b" for multi-key rules)
    predicate: Column | None = None  # row-level violation predicate
    keys: tuple[str, ...] = ()
    ref: DataFrame | None = field(default=None, compare=False)
    ref_keys: tuple[str, ...] = ()


def not_null(column: str) -> Rule:
    return Rule("not_null", column, predicate=F.col(column).isNull())


def accepted_values(column: str, values: list) -> Rule:
    return Rule(
        "accepted_values", column,
        predicate=~F.col(column).isin(values) | F.col(column).isNull(),
    )


def in_range(column: str, lo, hi) -> Rule:
    return Rule(
        "in_range", column,
        predicate=F.col(column).isNull()
        | (F.col(column) < F.lit(lo))
        | (F.col(column) > F.lit(hi)),
    )


def matches(column: str, regex: str) -> Rule:
    """Violation = non-null value NOT matching ``regex`` (Java∩RE2-safe
    patterns recommended for cross-engine checkability)."""
    return Rule(
        "matches", column,
        predicate=F.col(column).isNotNull() & ~F.col(column).rlike(regex),
    )


def custom(name: str, violation_sql: str) -> Rule:
    """Violation = rows where ``violation_sql`` is true."""
    return Rule("custom", name, predicate=F.expr(violation_sql))


def unique(columns: list[str]) -> Rule:
    return Rule("unique", ",".join(columns), keys=tuple(columns))


def foreign_key(columns: list[str], ref: DataFrame, ref_columns: list[str]) -> Rule:
    """Violation = rows whose non-null key tuple has no match in
    ``ref`` (SQL FK semantics: null keys are exempt)."""
    return Rule(
        "foreign_key", ",".join(columns),
        keys=tuple(columns), ref=ref, ref_keys=tuple(ref_columns),
    )


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Run every rule; returns (rule, column, violations, total,
    passed) ordered as given. One fused scan for all scalar rules +
    one shuffle/join per unique/foreign_key rule."""
    spark = df.sparkSession
    total_col = F.count(F.lit(1)).alias("__total")
    scalar = [(i, r) for i, r in enumerate(rules) if r.predicate is not None]
    results: dict[int, tuple[int, int]] = {}
    aggs = [total_col] + [
        F.sum(r.predicate.cast("long")).alias(f"__v{i}") for i, r in scalar
    ]
    row = df.agg(*aggs).collect()[0]
    total = int(row["__total"])
    for i, _r in scalar:
        results[i] = (int(row[f"__v{i}"] or 0), total)
    for i, r in enumerate(rules):
        if r.kind == "unique":
            dup = (
                df.groupBy(*r.keys)
                .agg(F.count(F.lit(1)).alias("__n"))
                .where(F.col("__n") > 1)
                .agg(F.coalesce(F.sum("__n"), F.lit(0)).alias("__d"))
                .collect()[0]["__d"]
            )
            results[i] = (int(dup), total)
        elif r.kind == "foreign_key":
            keyed = df.select(
                *[F.col(c).alias(k) for c, k in zip(r.keys, r.ref_keys)]
            )
            for k in r.ref_keys:  # MATCH SIMPLE: any-null key is exempt
                keyed = keyed.where(F.col(k).isNotNull())
            nn = keyed.count()
            orphans = keyed.join(
                r.ref.select(*r.ref_keys).distinct(), list(r.ref_keys), "left_anti"
            ).count()
            results[i] = (int(orphans), nn)
    rows = [
        (r.kind, r.column, results[i][0], results[i][1], results[i][0] == 0)
        for i, r in enumerate(rules)
    ]
    return spark.createDataFrame(
        rows,
        "rule string, column string, violations long, total long, passed boolean",
    )
