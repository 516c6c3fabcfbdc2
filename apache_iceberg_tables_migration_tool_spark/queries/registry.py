"""Registration plumbing for the oracle-checked query surface.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame``
with (optionally) an ANSI/DuckDB oracle SQL string over the fixture
views. Column aliases MUST match between the two — the driver sorts
columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None = None  # None → driver records rows-only check
    headline: bool = False  # included in bench.py's timed set
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a query under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, headline=headline, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, SparkQuery]:
    return {n: s.fn for n, s in QUERIES.items()}


def all_oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in QUERIES.items() if s.oracle is not None}
