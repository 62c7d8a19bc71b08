"""Streaming CDC log compaction — the incremental twin of
``plans.events_ops.events_cdc_apply``.

The batch op compacts a change log with one per-key window (last writer
wins on the (ts, event_id) total order; a final 'error' event is a
delete tombstone). The streaming twin maintains the same state
incrementally: a per-key ``max_by`` aggregate whose state is ONE struct
per key — bounded by key cardinality, independent of throughput, and
engine-managed in the state store (no Python in the loop).

Output modes: ``update`` emits each key's new latest row per micro-batch
(the CDC feed a downstream MERGE consumes); ``complete`` materializes
the full compacted state (memory-sink friendly). Tombstones stay IN the
state (an 'error' row must keep suppressing older rows); consumers
filter them exactly like the batch query does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_apply_stream(updates: DataFrame, drop_tombstones: bool = True) -> DataFrame:
    """Running last-writer-wins state per user_id over a streaming change
    log with columns (user_id, event_id, ts, event_type, value).

    Same total order and tombstone semantics as the batch
    ``events_cdc_apply``; ``drop_tombstones`` filters 'error'-typed
    latest rows from the OUTPUT while the aggregate still tracks them
    (so a tombstone correctly shadows every earlier change).
    """
    latest = (
        updates.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("event_type", "value", "ts"),
                F.struct("ts", "event_id"),
            ).alias("s")
        )
        .select(
            "user_id",
            F.col("s.event_type").alias("last_type"),
            F.col("s.value").alias("last_value"),
            F.col("s.ts").alias("updated_at"),
        )
    )
    if drop_tombstones:
        latest = latest.filter(F.col("last_type") != "error")
    return latest
