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

from pyspark.sql import Column, DataFrame
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
