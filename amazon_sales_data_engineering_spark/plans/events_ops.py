"""Event-stream queries over the ``events`` table — the batch halves of the
Structured Streaming profile (streaming/ runs the same logic incrementally;
SURVEY.md §2.9: the reference is batch-only, these are extensions).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import decimal_sum
from .registry import register
from .util import t

SESSION_GAP = "INTERVAL 30 MINUTES"


@register(
    "events_hourly_agg",
    oracle="""
SELECT date_trunc('hour', ts) AS hour_ts,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
    doc="Tumbling-window (hourly) aggregation — batch twin of the streaming "
    "windowed agg (streaming.ingest runs it with a watermark).",
    tags=("events", "window-agg"),
    bench=True,
)
def events_hourly_agg(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    # date_trunc() on TIMESTAMP_NTZ returns a session-tz TIMESTAMP (shifting
    # wall time under non-UTC sessions); rebuild from wall-clock fields
    # instead — pure NTZ, timezone-independent.
    if dict(e.dtypes)["ts"] == "timestamp_ntz":
        hour = F.make_timestamp_ntz(
            F.year("ts"), F.month("ts"), F.dayofmonth("ts"),
            F.hour("ts"), F.lit(0), F.lit(0),
        )
    else:
        hour = F.date_trunc("hour", F.col("ts"))
    return (
        e.groupBy(hour.alias("hour_ts"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            decimal_sum("value", alias="total_value"),
        )
    )


@register(
    "events_sessionize",
    oracle=f"""
WITH g AS (
  SELECT user_id, event_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN prev_ts IS NULL OR ts > prev_ts + {SESSION_GAP} THEN 1 ELSE 0 END AS is_new
  FROM g
), sessions AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged
)
SELECT user_id,
       CAST(session_idx AS BIGINT) AS session_idx,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM sessions
GROUP BY user_id, session_idx
""",
    doc="Gap-based sessionization (30-min inactivity): lag + cumulative-sum "
    "session ids + per-session rollup. Batch twin of "
    "streaming.sessionize (applyInPandasWithState). Timestamp arithmetic "
    "only — no epoch conversion, so timezone-independent.",
    tags=("events", "sessionize"),
    bench=True,
)
def events_sessionize(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.col("ts") > prev_ts + F.expr(SESSION_GAP)), F.lit(1)
    ).otherwise(F.lit(0))
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        e.withColumn("is_new", is_new)
        .withColumn("session_idx", F.sum("is_new").over(cum).cast("bigint"))
        .groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            decimal_sum("value", alias="total_value"),
        )
    )


@register(
    "events_sliding_agg",
    oracle="""
SELECT make_timestamp(CAST((floor(epoch(ts) / 900) * 900 - j * 900) * 1000000 AS BIGINT))
         AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events CROSS JOIN unnest([0, 1, 2, 3]) AS t(j)
GROUP BY 1, 2
""",
    doc="Sliding-window agg (1 hour window, 15 min slide): each event lands "
    "in 4 overlapping windows. Spark assigns windows map-side (no row "
    "explosion shuffle beyond the agg itself); the oracle replicates the "
    "epoch-aligned window-start arithmetic with an explicit 4-way unnest. "
    "Completes the window family: tumbling (events_hourly_agg) / sliding / "
    "session (events_sessionize).",
    tags=("events", "window-agg"),
    bench=True,
)
def events_sliding_agg(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            decimal_sum("value", alias="total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
