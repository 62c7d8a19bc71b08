"""Structured Streaming profile of the engine (extension surface).

The reference is batch-only (SURVEY.md §2.9) — its closest analogue is the
incremental-batch pattern (per-file COPY idempotency + left-anti delta
loads). This package offers the real streaming counterparts:

- ``ingest``: file-source ``readStream`` + watermarked tumbling-window
  aggregation (streaming twin of ``events_hourly_agg``), and a
  ``foreachBatch`` incremental loader that reuses the batch pipeline's
  delta-load semantics with exactly-once file tracking via checkpoints.
- ``sessionize``: gap sessionization two ways — built-in
  ``session_window`` (native state store, the scale path) and a custom
  ``applyInPandasWithState`` stateful operator (the pattern for operators
  Spark lacks natively).
- ``dedup``: streaming deduplication — watermark-bounded state
  (``dropDuplicatesWithinWatermark``) for live pipelines, full-history
  for bounded replays; turns at-least-once delivery into exactly-once
  table contents.
- ``joins``: stream-static dimension enrichment (per-trigger broadcast)
  and watermarked stream-stream attribution with the two-sided time
  bound that keeps join state O(window) instead of O(stream).

Everything here is triggered-batch testable: ``Trigger.AvailableNow`` +
``maxFilesPerTrigger`` drain a bounded directory through real watermark
advancement, so unit tests cover late-data/close semantics deterministically.
"""

from .cdc import cdc_apply_stream
from .dedup import dedup_stream, dedup_stream_exact
from .ingest import (
    hourly_agg_stream,
    incremental_append,
    run_available_now,
    stream_source,
    windowed_distinct_stream,
)
from .joins import attribute_stream, enrich_stream
from .sessionize import sessionize_session_window, sessionize_stateful

__all__ = [
    "attribute_stream",
    "cdc_apply_stream",
    "dedup_stream",
    "dedup_stream_exact",
    "enrich_stream",
    "stream_source",
    "hourly_agg_stream",
    "incremental_append",
    "run_available_now",
    "sessionize_session_window",
    "windowed_distinct_stream",
    "sessionize_stateful",
]
