"""Custom stateful streaming operators (north star X6 — the
"custom stateful operator" tier beyond built-in windows).

``user_stats_stateful`` maintains per-user running state —
event count, exact decimal value total, last-seen timestamp — via
``applyInPandasWithState``: Arrow-batched per-group pandas logic
with explicit GroupState, the Structured Streaming escape hatch for
aggregations the built-in operators can't express (here: a
multi-field accumulator with custom merge rules, carried across
micro-batches).

State size is O(distinct users), not O(events) — the property that
lets this run indefinitely on an unbounded stream. Value totals
accumulate as integer micro-units (value × 1e6 rounded), never
floats, so results are batch-identical regardless of how events are
split across micro-batches.

``dedup_events_stream`` is exactly-once-per-key delivery with
bounded state: ``dropDuplicatesWithinWatermark`` keeps only keys
younger than the watermark (at 100 TB/day an unbounded exact dedup
would OOM; bounding by event-time lateness is the standard
contract).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_seen timestamp"
_STATE_SCHEMA = "n bigint, total_micros bigint, last_us bigint"


def _update_user_stats(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total_micros, last_us = state.get if state.exists else (0, 0, None)
    for pdf in pdfs:
        n += len(pdf)
        # exact integer micro-units; float sum would drift with batch order.
        # floor (not round): round ties split half-even vs half-up across
        # engines, floor of the same IEEE double is identical everywhere.
        import numpy as np

        total_micros += int(np.floor(pdf["value"].astype(float).mul(1e6).to_numpy()).sum())
        batch_last = pdf["ts"].max()
        batch_us = int(pd.Timestamp(batch_last).value // 1000)
        last_us = batch_us if last_us is None else max(last_us, batch_us)
    state.update((n, total_micros, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total_micros / 1e6],
            "last_seen": [pd.Timestamp(last_us * 1000)],
        }
    )


def user_stats_stateful(events: DataFrame) -> DataFrame:
    """Per-user running (count, exact value total, last-seen) over an
    event stream; emits the updated accumulator for each user touched
    by a micro-batch."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_events_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id (X1's streaming twin): keep
    the first arrival per key, drop replays.
    ``dropDuplicatesWithinWatermark`` bounds the dedup state by the
    event-time watermark — keys older than the watermark are evicted,
    so state is O(keys per watermark window), not O(stream history).
    That is what lets an at-least-once upstream (Kafka redelivery,
    producer retries) be deduplicated indefinitely at 100 TB/day;
    plain ``dropDuplicates`` without an event-time key in the dedup
    set would grow state forever. Driver-graded carrier:
    ``streaming_dedup_counts`` (every event delivered twice, deduped
    stream must equal the batch aggregate)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def run_update_to_completion(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drain an update-mode stream (availableNow + memory sink) and
    return one final row per key (the last update wins)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)
