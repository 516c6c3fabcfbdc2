"""Skew-handling primitives for hot-key aggregations and joins.

At 100 TB a handful of hot keys (one viral document, one default
user_id) can pin a whole stage on one reducer. Two standard remedies,
both semantics-preserving:

- **Salted two-phase aggregation**: append a random-ish salt to the
  grouping key, partially aggregate on (key, salt) — spreading a hot
  key over ``salt_buckets`` reducers — then re-aggregate on the key.
  Only algebraic aggregates (count/sum/min/max) decompose this way;
  the helpers here expose exactly those.
- **Salted broadcast-side replication join**: explode the small side
  ``salt_buckets`` ways and salt the big side's key, so a hot join
  key fans across reducers. With AQE skew-join handling ON
  (`spark.sql.adaptive.skewJoin.enabled`, our session default) Spark
  does this adaptively; the explicit form is for engines/configs
  where AQE is unavailable and as the deterministic-test variant.

The salt is `pmod(xxhash64(<whole row id cols>), buckets)` rather
than `rand()`: deterministic (tests, retries — a task re-run under
speculation must salt identically, `rand()` would not) and shuffle-
balanced.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_cols: Sequence[str],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (input column/expr, fn) with fn in
    {count, sum, min, max}. Phase 1 aggregates on (keys, salt) —
    map-side combine plus a spread of each hot key over
    ``salt_buckets`` reducers; phase 2 merges partials on keys alone
    (count merges via sum). Result is identical to the direct
    ``groupBy(keys).agg(...)``.
    """
    merge_fn = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    for out, (_, fn) in aggs.items():
        if fn not in merge_fn:
            raise ValueError(f"{out}: {fn!r} is not decomposable (use count/sum/min/max)")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt_buckets))
    phase1 = (
        df.withColumn(_SALT, salt)
        .groupBy(*keys, _SALT)
        .agg(
            *[
                getattr(F, fn)(F.expr(src)).alias(out)
                for out, (src, fn) in aggs.items()
            ]
        )
    )
    return phase1.groupBy(*keys).agg(
        *[merge_fn[fn](F.col(out)).alias(out) for out, (_, fn) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 32,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small
    side across all ``salt_buckets`` salts, join on (keys, salt).

    Row-for-row identical to ``big.join(small, on, how)`` for
    inner/left joins. The small side grows ×buckets — appropriate
    when it is dimension-sized but a broadcast is not possible (or
    the hot key makes even a shuffle join lopsided).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (right side is replicated)")
    on = list(on)
    salted_big = big.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    )
    replicated = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<bigint>"))
    )
    return salted_big.join(replicated, [*on, _SALT], how).drop(_SALT)
