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


def cdc_index_sink(index, insert_fn, id_col: str, op_col: str = "op"):
    """foreachBatch callable that routes a CDC-shaped micro-batch
    (``op_col`` in {'I','D'}) to a maintained index — the production
    shape of index maintenance, where the ingest stream carries
    retractions alongside appends (round-9 verdict #2).

    Routing per epoch, deletes FIRST so the same epoch's inserts verify
    against a tombstone-filtered corpus (matching the batch gates, where
    delete precedes the delta):

    - op='D' rows tombstone via ``index.delete(ids, seq=batch_id)``;
    - op='I' rows append via ``insert_fn(rows_without_op, batch_id)``
      (the caller binds apply_batch with its column names/pairs dir).

    Exactly-once across restarts: each half is skipped INDEPENDENTLY
    when its epoch's ``_SUCCESS`` job-commit marker already exists
    (``index.completed_delete`` / ``index.completed``) — so a mixed
    I+D epoch that crashed between its delete commit and its insert
    commit retries only the insert half, and a fully-committed epoch
    redelivered by the checkpoint is a no-op. Both writes are
    mode=overwrite, so a crashed half simply rewrites its own batch
    dir on retry. Pinned by test_cdc_delete_epoch_restart_exactly_once.

    Works for both maintained indexes (MinHashDedupIndex, IVFIndex) —
    the contract is ``delete(spark, ids_df, seq)``, ``completed(seq)``,
    ``completed_delete(seq)``.
    """

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        deletes = batch_df.filter(F.col(op_col) == "D").select(id_col)
        inserts = batch_df.filter(F.col(op_col) == "I").drop(op_col)
        if not index.completed_delete(batch_id) and not deletes.isEmpty():
            index.delete(batch_df.sparkSession, deletes, seq=batch_id)
        if not index.completed(batch_id) and not inserts.isEmpty():
            insert_fn(inserts, batch_id)

    return apply
