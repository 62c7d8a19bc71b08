"""Streaming deduplication — the incremental twin of ``operators.dedup``.

Batch exact dedup (``dedup_exact``) fingerprints rows and keeps one per
fingerprint. The streaming form must answer the same question under an
unbounded input: "have I seen this row before?" — which naively needs
unbounded state. Two profiles:

- ``dedup_stream`` — ``dropDuplicatesWithinWatermark``: state holds only
  keys younger than the event-time watermark, so memory is bounded by
  (arrival rate × watermark horizon) regardless of stream lifetime. A
  duplicate arriving after the horizon is NOT caught — the documented
  trade-off; pick the horizon from the source's real re-delivery window
  (e.g. a Kafka producer retry storm spans seconds, not days).
- ``dedup_stream_exact`` — plain ``dropDuplicates`` on the key: catches
  duplicates forever but state grows with distinct keys, which at 100 TB
  is itself a dataset. Only for bounded reprocessing runs
  (trigger=availableNow over a finite backlog); live pipelines should
  use the watermarked profile.

At-least-once file/Kafka delivery makes duplicates NORMAL in streaming
ingest; this operator is what turns at-least-once transport into
exactly-once table contents (together with the idempotent foreachBatch
sink in ``streaming.ingest``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_HORIZON = "1 hour"


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    horizon: str = DEFAULT_HORIZON,
) -> DataFrame:
    """Watermark-bounded streaming dedup: first arrival of each key wins;
    re-deliveries within ``horizon`` of event time are dropped. State is
    pruned as the watermark advances past each key's event time."""
    return events.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def dedup_stream_exact(
    events: DataFrame,
    keys: list[str] | None = None,
) -> DataFrame:
    """Unbounded-state streaming dedup (full-history exactness). Use only
    for bounded backlog replays; see module docstring."""
    return events.dropDuplicates(keys or ["event_id"])
