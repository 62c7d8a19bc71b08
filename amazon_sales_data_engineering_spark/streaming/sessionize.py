"""Streaming gap sessionization — built-in and custom-stateful paths.

Batch twin: ``plans.events_ops.events_sessionize`` (lag + cumulative-sum
session ids). Two streaming implementations:

- ``sessionize_session_window`` — Spark-native ``F.session_window``:
  state lives in the JVM state store, merges are engine-managed, append
  output emits a session once the watermark passes its close. This is the
  scale path (no Python in the loop).
- ``sessionize_stateful`` — ``applyInPandasWithState`` with explicit
  session state per user: the template for custom stateful operators the
  engine needs but Spark lacks natively. State is a compact per-key
  summary (open sessions as parallel arrays), NOT buffered events, so
  state size is O(open sessions) regardless of throughput; event-time
  timeouts flush sessions whose close passed the watermark even if the
  key receives no further data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

DEFAULT_GAP = "30 minutes"

SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

# Open sessions per key as parallel arrays (ms epoch); compact and
# merge-friendly. A struct-of-arrays beats array-of-structs here: the state
# codec round-trips flat arrays cheaply.
SESSION_STATE_SCHEMA = (
    "starts array<long>, ends array<long>, counts array<long>, sums array<double>"
)


def sessionize_session_window(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    gap: str = DEFAULT_GAP,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Native session windows. ``session_window.end`` is last-event + gap;
    ``session_end`` below is the last event itself to match the batch twin."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap).alias("w"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(key_col, "session_start", "session_end", "n_events", "total_value")
    )


def sessionize_stateful(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    gap_ms: int = 30 * 60 * 1000,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Custom stateful sessionization via ``applyInPandasWithState``.

    Emits a session (append mode) once the watermark passes its close
    (last event + gap). The worker function is nested so cloudpickle
    serializes it by value — executors don't need this package installed.
    """

    def update(key, pdf_iter, state):
        import pandas as pd

        def to_ms(series):
            return series.values.astype("datetime64[ms]").astype("int64")

        # (start, end, n, total) per open session, sorted by start
        sessions = list(zip(*state.get)) if state.exists else []

        if not state.hasTimedOut:
            for pdf in pdf_iter:
                ms = to_ms(pdf[ts_col])
                vals = pdf[value_col].astype("float64")
                sessions.extend(
                    (int(t), int(t), 1, float(v)) for t, v in zip(ms, vals)
                )

        sessions.sort()
        merged = []
        for s in sessions:
            if merged and s[0] <= merged[-1][1] + gap_ms:
                p = merged[-1]
                merged[-1] = (p[0], max(p[1], s[1]), p[2] + s[2], p[3] + s[3])
            else:
                merged.append(s)

        wm = state.getCurrentWatermarkMs()
        closed = [s for s in merged if s[1] + gap_ms <= wm]
        open_ = [s for s in merged if s[1] + gap_ms > wm]

        if open_:
            state.update(tuple(list(col) for col in zip(*open_)))
            # flush via timeout when the watermark passes the earliest close
            state.setTimeoutTimestamp(max(open_[0][1] + gap_ms, wm + 1))
        elif state.exists:
            state.remove()

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start": pd.to_datetime([s[0] for s in closed], unit="ms"),
                    "session_end": pd.to_datetime([s[1] for s in closed], unit="ms"),
                    "n_events": [s[2] for s in closed],
                    "total_value": [s[3] for s in closed],
                }
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )
