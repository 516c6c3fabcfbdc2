"""Event-time windowing (north star X6): tumbling, sliding, session.

Batch forms use the same ``window()`` / ``session_window()``
expressions Structured Streaming uses, so the streaming variants
(streaming.pipelines) share semantics exactly. Window starts are
emitted as epoch seconds (bigint) — stable across engines regardless
of sub-second timestamp precision (the events fixture is ns-precision
parquet; Spark truncates to µs, so raw timestamps would not
hash-match an oracle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch(col: Column) -> Column:
    return F.unix_timestamp(col)


def tumbling(
    df: DataFrame,
    ts_col: str,
    width_sec: int,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Fixed windows: groupBy(window(ts, width), keys) → one shuffle;
    partial aggregation happens map-side, so cardinality after the
    shuffle is windows × keys — scale-safe for any input volume."""
    win = F.window(F.col(ts_col), f"{width_sec} seconds")
    return (
        df.groupBy(win.alias("w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", _epoch(F.col("w.start")))
        .drop("w")
    )


def sliding(
    df: DataFrame,
    ts_col: str,
    width_sec: int,
    slide_sec: int,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Sliding windows: each row lands in width/slide windows (Spark
    expands internally — the fan-out factor is the thing to watch at
    scale; keep width/slide small)."""
    win = F.window(F.col(ts_col), f"{width_sec} seconds", f"{slide_sec} seconds")
    return (
        df.groupBy(win.alias("w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", _epoch(F.col("w.start")))
        .drop("w")
    )


def session(
    df: DataFrame,
    ts_col: str,
    gap_sec: int,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Session windows: events within ``gap_sec`` of the previous
    event (per key) merge into one session. ``session_window`` is
    Spark's native merging-window aggregate (same operator streaming
    uses with state); equivalent to the gaps-and-islands SQL form."""
    win = F.session_window(F.col(ts_col), f"{gap_sec} seconds")
    return (
        df.groupBy(win.alias("w"), *keys)
        .agg(*aggs)
        .withColumn("session_start", _epoch(F.col("w.start")))
        .drop("w")
    )


def resample_forward_fill(
    df: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Regularize an irregular event series onto a DAILY grid with
    forward fill — the gap-fill/resample step time-series warehouses
    run before rolling metrics (a day with no events must still
    produce a row, carrying the last observed value forward). Per
    entity: aggregate events to days, explode the entity's [first
    active day, last active day] span into a dense grid
    (``sequence(date, date)``), left-join the observed days back, and
    forward-fill with ``last(ignorenulls)`` over an entity-ordered
    window. Emits ``(id, day, n_events, day_sum, filled_sum)`` where
    gap days have ``n_events = 0``, NULL ``day_sum`` and the carried
    ``filled_sum``.

    Values fold in integer MICRO-units (``floor(v·1e6)``), so sums
    are order-independent and bit-portable across engines (the dsum
    rule the money queries use). Scale shape: the grid explode is
    bounded by each entity's span; the forward fill partitions by
    entity — per-entity series serialize through one task (the
    standard entity-partitioned layout), entities parallelize."""
    e = df.select(
        F.col(id_col),
        F.to_date(F.date_trunc("day", F.col(ts_col))).alias("day"),
        F.floor(F.col(value_col) * 1e6).cast("long").alias("__v"),
    )
    d = e.groupBy(id_col, "day").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("__v").alias("day_sum")
    )
    grid = (
        d.groupBy(id_col)
        .agg(F.min("day").alias("__d0"), F.max("day").alias("__d1"))
        .select(
            F.col(id_col), F.explode(F.sequence("__d0", "__d1")).alias("day")
        )
    )
    j = grid.join(d, [id_col, "day"], "left").withColumn(
        "n_events", F.coalesce(F.col("n_events"), F.lit(0))
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.withColumn("filled_sum", F.last("day_sum", ignorenulls=True).over(w))
