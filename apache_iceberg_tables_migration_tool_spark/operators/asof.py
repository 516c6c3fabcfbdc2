"""Distributed as-of join.

The reference's core temporal primitive is "latest snapshot at or
before T" (``2_collect_database_schema_info.py:34-55``), computed in
driver Python over collected rows. The general distributed form is an
as-of join; Spark has no native one, so we use the union+window
sort-merge pattern:

1. tag left/right rows and union them on (key, ts),
2. one shuffle partitions by key, sort by (ts, side),
3. ``last(right_payload, ignorenulls=True)`` over the ordered window
   fills each left row with the most recent right row at-or-before it.

Cost: a single hash shuffle of |L|+|R| rows + per-partition sort —
identical asymptotics to a sort-merge join, with no range-condition
row explosion. At 100 TB the shuffle is on the join key, so hot keys
skew; mitigate by pre-filtering right to the left key set (semi-join)
and, for pathological keys, salting with per-salt right replication.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_T = "__asof_t"
_SIDE = "__asof_side"
_R = "__asof_r"
_M = "__asof_m"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    how: str = "left",
    direction: str = "backward",
    tolerance_sec: float | None = None,
    prefilter_right: bool = False,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` (direction='backward', inclusive) or the
    least ``right_ts >= left_ts`` ('forward') sharing the join key.

    Right payload columns (everything except key + timestamp) are
    appended to the left schema; ``how='inner'`` drops unmatched left
    rows. Ties on ``right_ts`` resolve to the max payload struct
    (deterministic; right payload must be orderable).
    ``tolerance_sec`` bounds the match gap (pandas/polars merge_asof
    semantics): a right row farther than the tolerance counts as no
    match. The bound is applied after the window fill — no extra
    shuffle.

    ``prefilter_right=True`` semi-joins the right side to the left's
    distinct key set before the union — output-identical (right rows
    whose key never occurs on the left can never be matched), but the
    big union shuffle then carries only matchable right rows. Worth it
    when the right side is much larger than its matched slice (e.g.
    joining a small order stream against a firehose of quotes); a
    waste of one extra shuffle when most right keys appear on the
    left, hence opt-in.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on_cols = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in set(on_cols) | {right_ts}]
    if not payload:
        raise ValueError("right side has no payload columns")
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(f"right payload collides with left columns: {sorted(overlap)}")

    if prefilter_right:
        right = right.join(left.select(*on_cols).distinct(), on_cols, "left_semi")

    l2 = left.withColumn(_T, F.col(left_ts)).withColumn(_SIDE, F.lit(1))
    r2 = right.select(
        *on_cols,
        F.col(right_ts).alias(_T),
        F.lit(0).alias(_SIDE),
        # matched right ts rides along as the struct's first field so the
        # tolerance check needs no second join; equal-ts ties still break
        # on the payload (same first field within a tie group)
        F.struct(F.col(right_ts).alias("__rts"), *[F.col(c) for c in payload]).alias(_R),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)

    ts_order: Column = F.col(_T).asc() if direction == "backward" else F.col(_T).desc()
    # at equal timestamps the right row sorts first → inclusive match;
    # _R as final key makes equal-ts right rows resolve deterministically
    w = (
        Window.partitionBy(*on_cols)
        .orderBy(ts_order, F.col(_SIDE).asc(), F.col(_R).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn(_M, F.last(_R, ignorenulls=True).over(w))
    out = filled.where(F.col(_SIDE) == 1)
    if tolerance_sec is not None:
        gap = F.abs(
            F.col(_T).cast("double") - F.col(f"{_M}.__rts").cast("double")
        )
        out = out.withColumn(_M, F.when(gap <= F.lit(float(tolerance_sec)), F.col(_M)))
    if how == "inner":
        out = out.where(F.col(_M).isNotNull())
    for c in payload:
        out = out.withColumn(c, F.col(f"{_M}.{c}"))
    return out.drop(_T, _SIDE, _R, _M)
