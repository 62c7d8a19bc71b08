"""Event-stream queries over the ``events`` table — the batch halves of the
Structured Streaming profile (streaming/ runs the same logic incrementally;
SURVEY.md §2.9: the reference is batch-only, these are extensions).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import fast_decimal_sum_expr
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
            # r11 fast path (functions.hashing.fast_decimal_sum_expr):
            # events.value is an exact 2dp money double at every sf
            # (verified by DECIMAL(18,2) round-trip over the corpus),
            # so the unscaled-long sum is result-identical to the
            # per-row DECIMAL(18,6)-cast idiom it replaces.
            fast_decimal_sum_expr(F.col("value")).alias("total_value"),
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
            # r11 fast path (functions.hashing.fast_decimal_sum_expr):
            # events.value is an exact 2dp money double at every sf
            # (verified by DECIMAL(18,2) round-trip over the corpus),
            # so the unscaled-long sum is result-identical to the
            # per-row DECIMAL(18,6)-cast idiom it replaces.
            fast_decimal_sum_expr(F.col("value")).alias("total_value"),
        )
    )


@register(
    "events_funnel",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY 1
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY 1
)
SELECT * FROM (
  SELECT 1 AS stage_idx, 'view' AS stage, (SELECT COUNT(*) FROM v) AS n_users
  UNION ALL
  SELECT 2, 'view>click', (SELECT COUNT(*) FROM c)
  UNION ALL
  SELECT 3, 'view>click>purchase', (SELECT COUNT(*) FROM p)
)
""",
    doc="Ordered conversion funnel (view → click-after-view → purchase-"
    "after-click): each stage is a conditional MIN per user joined back "
    "to the previous stage's timestamp, so ordering is enforced, not "
    "just co-occurrence. All three stages aggregate and join on "
    "user_id — one key, so at scale the shuffles co-partition and AQE "
    "broadcasts the shrinking stage tables; final counts are 3 rows. "
    "Timestamps are only compared, never converted: timezone-safe.",
    tags=("events", "funnel", "join"),
)
def events_funnel(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )

    def stage(idx: int, name: str, df):
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(idx).alias("stage_idx"),
            F.lit(name).alias("stage"),
            "n_users",
        )

    return (
        stage(1, "view", v)
        .unionAll(stage(2, "view>click", c))
        .unionAll(stage(3, "view>click>purchase", p))
    )


@register(
    "events_cohort_retention",
    oracle="""
WITH cohort AS (
  SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day FROM events GROUP BY 1
)
SELECT c.cohort_day,
       CAST(date_diff('day', c.cohort_day, CAST(e.ts AS DATE)) AS INTEGER)
         AS day_offset,
       COUNT(DISTINCT e.user_id) AS n_active
FROM events e JOIN cohort c ON c.user_id = e.user_id
GROUP BY 1, 2
""",
    doc="Cohort retention matrix: users grouped by first-seen day, counted "
    "as active per day-offset. One user-keyed aggregate builds the "
    "cohort table; the join back is user-co-partitioned (broadcast at "
    "small scale via AQE); the matrix aggregate is exact COUNT "
    "DISTINCT — two map-side-combinable shuffles on a 100 TB event "
    "log. Date arithmetic is wall-clock day diff on both engines: "
    "timezone-safe with the NTZ event timestamps.",
    tags=("events", "cohort", "agg"),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    cohort = e.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("cohort_day")
    )
    return (
        e.join(cohort, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.to_date("ts"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
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
            # r11 fast path (functions.hashing.fast_decimal_sum_expr):
            # events.value is an exact 2dp money double at every sf
            # (verified by DECIMAL(18,2) round-trip over the corpus),
            # so the unscaled-long sum is result-identical to the
            # per-row DECIMAL(18,6)-cast idiom it replaces.
            fast_decimal_sum_expr(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "events_gaps_islands",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), seq AS (
  SELECT user_id, d,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INT) AS rn
  FROM days
), streaks AS (
  SELECT user_id, d - rn AS anchor, COUNT(*) AS len
  FROM seq GROUP BY 1, 2
)
SELECT user_id,
       CAST(COUNT(*) AS INT) AS n_streaks,
       CAST(SUM(len) AS INT) AS n_active_days,
       CAST(MAX(len) AS INT) AS max_streak_days
FROM streaks GROUP BY 1
""",
    doc="Gaps-and-islands: per-user consecutive-day activity streaks via "
    "the date-minus-row_number anchor trick (consecutive days share one "
    "anchor; any gap shifts it). Shape at scale: the distinct "
    "(user, day) grid is a map-side-combinable aggregate that shrinks "
    "events by the per-day event multiplicity BEFORE the one sort "
    "shuffle on user_id; the window is per-user (no global ordering), "
    "then two more map-side aggregates. Dates and integer counts only "
    "— engine-exact.",
    tags=("events", "window", "islands"),
)
def events_gaps_islands(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    days = e.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    seq = days.select(
        "user_id", "d", F.row_number().over(w).cast("int").alias("rn")
    )
    streaks = (
        seq.select("user_id", F.date_sub(F.col("d"), F.col("rn")).alias("anchor"))
        .groupBy("user_id", "anchor")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    return streaks.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_streaks"),
        F.sum("len").cast("int").alias("n_active_days"),
        F.max("len").cast("int").alias("max_streak_days"),
    )


@register(
    "events_cdc_apply",
    oracle="""
WITH ranked AS (
  SELECT user_id, event_type, value, ts, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_type AS last_type, value AS last_value,
       ts AS updated_at
FROM ranked
WHERE rn = 1 AND event_type <> 'error'
""",
    doc="CDC log compaction: treat events as a change log per user_id — "
    "last writer wins on the (ts, event_id) total order, and a final "
    "'error' event acts as a delete tombstone (the key is absent from "
    "the compacted state). This is the MERGE-free apply shape used by "
    "log-structured tables: ONE window per key (no join against the "
    "previous snapshot), deterministic tie-break, arbitrarily "
    "re-runnable. value passes through unaggregated (same IEEE double "
    "on both engines).",
    tags=("events", "cdc", "window"),
)
def events_cdc_apply(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.select(
            "user_id", "event_type", "value", "ts",
            F.row_number().over(w).alias("rn"),
        )
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
            F.col("ts").alias("updated_at"),
        )
    )


@register(
    "events_sliding_distinct",
    oracle="""
SELECT make_timestamp(CAST((floor(epoch(ts) / 1800) * 1800 - j * 1800)
                           * 1000000 AS BIGINT)) AS window_start,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events CROSS JOIN unnest([0, 1]) AS t(j)
GROUP BY 1
""",
    doc="Sliding-window EXACT distinct users (1 h window, 30 min slide): "
    "each event lands in 2 windows; COUNT(DISTINCT) shuffles on "
    "(window, user) then counts — the exact-cardinality path next to "
    "approx_distinct_sketch's HLL (which is the right answer at 100 TB; "
    "this one is the oracle-checkable exact twin for bounded windows). "
    "Spark assigns windows map-side via F.window.",
    tags=("events", "window-agg", "distinct"),
)
def events_sliding_distinct(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(F.col("w.start").alias("window_start"), "n_users", "n_events")
    )


@register(
    "events_funnel_timed",
    oracle="""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'click' GROUP BY 1
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'view'
    AND e.ts >= s1.t1 AND e.ts <= s1.t1 + INTERVAL 24 HOUR
  GROUP BY 1
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase'
    AND e.ts >= s2.t2 AND e.ts <= s2.t2 + INTERVAL 24 HOUR
  GROUP BY 1
)
SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
       s2.user_id IS NOT NULL AS reached_view,
       s3.user_id IS NOT NULL AS reached_purchase
FROM s1
LEFT JOIN s2 ON s2.user_id = s1.user_id
LEFT JOIN s3 ON s3.user_id = s1.user_id
""",
    doc="TIME-CONSTRAINED funnel (click → view within 24 h → purchase "
    "within 24 h of the view): sequential pattern matching where each "
    "stage's window anchors on the PREVIOUS stage's match — the shape "
    "plain conditional-MIN funnels (events_funnel) can't express. "
    "Three user-keyed aggregates chained by co-partitioned joins; every "
    "shuffle is on user_id, so at scale the chain is one exchange "
    "reused. Timestamps compare exactly (NTZ wall-clock on both "
    "engines).",
    tags=("events", "funnel", "join"),
)
def events_funnel_timed(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    day = F.expr("INTERVAL 24 HOURS")
    s1 = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter((F.col("ts") >= F.col("t1")) & (F.col("ts") <= F.col("t1") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter((F.col("ts") >= F.col("t2")) & (F.col("ts") <= F.col("t2") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            "t1",
            "t2",
            "t3",
            F.col("t2").isNotNull().alias("reached_view"),
            F.col("t3").isNotNull().alias("reached_purchase"),
        )
    )


@register(
    "events_rate_anomalies",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), med AS (
  SELECT event_type,
         PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY n) AS med_n
  FROM hourly GROUP BY 1
), dev AS (
  SELECT h.event_type, h.h, h.n, m.med_n,
         abs(h.n - m.med_n) AS adev
  FROM hourly h JOIN med m ON m.event_type = h.event_type
), mad AS (
  SELECT event_type,
         PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY adev) AS mad_n
  FROM dev GROUP BY 1
)
SELECT d.event_type, d.h AS hour_ts, d.n, d.med_n, m.mad_n,
       d.adev > 4 * m.mad_n AS is_spike
FROM dev d JOIN mad m ON m.event_type = d.event_type
""",
    doc="Time-series rate-anomaly detection: hourly event counts per type "
    "scored against the type's own median ± 4·MAD — robust monitoring "
    "fences a single traffic spike cannot poison (unlike mean/stddev). "
    "Everything is integers and exact PERCENTILE_DISC members; the "
    "4·MAD comparison is one integer multiply. Composition of the "
    "hourly-agg and MAD-outlier shapes over the time axis; both "
    "percentile aggregates are per-type (bounded groups), the hourly "
    "count is one map-side-combinable aggregate over the event log.",
    tags=("events", "profile", "stats"),
)
def events_rate_anomalies(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    # date_trunc returns LTZ even for NTZ input (session-TZ shift) — build
    # the hour NTZ-natively instead, as range_join_event_windows does.
    hour = F.make_timestamp_ntz(
        F.year("ts"), F.month("ts"), F.dayofmonth("ts"), F.hour("ts"),
        F.lit(0), F.lit(0),
    )
    hourly = e.groupBy("event_type", hour.alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    med = hourly.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n)")
        .cast("bigint")
        .alias("med_n")
    )
    dev = hourly.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("n") - F.col("med_n"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)")
        .cast("bigint")
        .alias("mad_n")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            F.col("h").alias("hour_ts"),
            "n",
            "med_n",
            "mad_n",
            (F.col("adev") > 4 * F.col("mad_n")).alias("is_spike"),
        )
    )


@register(
    "event_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
), trans AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
), row_tot AS (
  SELECT prev_type, SUM(n) AS tot FROM trans GROUP BY 1
)
SELECT t.prev_type, t.next_type, t.n,
       CAST(t.n AS DOUBLE) / r.tot AS p
FROM trans t JOIN row_tot r ON r.prev_type = t.prev_type
""",
    doc="First-order Markov transition matrix over per-user event "
    "sequences: lag over the (ts, event_id)-ordered stream pairs each "
    "event with its predecessor, counts per (prev → next), and the "
    "row-conditional probability as one exact-integer division — the "
    "behavioral-model estimation step (what follows a click?) behind "
    "next-event prediction and bot detection. One sort shuffle on the "
    "user key + two tiny aggregates; states are bounded (event types), "
    "so the matrix broadcasts anywhere.",
    tags=("events", "window", "stats", "ml"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    row_tot = trans.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    return trans.join(F.broadcast(row_tot), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.col("tot")).alias("p"),
    )


@register(
    "events_late_arrival_profile",
    oracle="""
WITH a AS (
  SELECT user_id, ts, event_id,
         (CAST(ts AS DATE) - DATE '1970-01-01') * 12 + hour(ts) // 2 AS batch,
         event_id % 7 AS shard
  FROM events
), w AS (
  SELECT user_id, ts,
         MAX(ts) OVER (PARTITION BY user_id ORDER BY batch, shard, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS seen_max
  FROM a
), l AS (
  SELECT user_id,
         CASE WHEN seen_max IS NOT NULL AND seen_max > ts
              THEN epoch_us(seen_max) - epoch_us(ts) ELSE 0 END AS late_us
  FROM w
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(*) FILTER (WHERE late_us > 0) AS BIGINT) AS n_out_of_order,
       CAST(COUNT(*) FILTER (WHERE late_us > 1800000000) AS BIGINT)
         AS n_beyond_watermark,
       CAST(MAX(late_us) AS BIGINT) AS max_late_us
FROM l
GROUP BY 1
""",
    doc="Late-data profile for watermark sizing: replaying each user's "
    "events in ARRIVAL order — batched ingestion simulated "
    "deterministically as (2-hour wall-clock batch, event_id %% 7 "
    "shard, event_id), the arrival pattern of a sharded collector "
    "that flushes per batch — an event is out-of-order when "
    "its event time is behind the running max already seen, and would "
    "be DROPPED by a 30-minute watermark when it is more than 30 "
    "minutes behind — the batch measurement that tells you what "
    "delayThreshold the streaming twins (streaming/) can afford "
    "before they start discarding real data. Lateness is an exact "
    "integer microsecond difference (timestampdiff — NTZ-safe); one "
    "user-keyed sort shuffle feeds both the running-max window and "
    "the aggregate.",
    tags=("events", "streaming", "profile", "window"),
)
def events_late_arrival_profile(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        (
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")) * 12
            + F.floor(F.hour("ts") / 2)
        ).alias("batch"),
        (F.col("event_id") % 7).alias("shard"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("batch", "shard", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late_us = F.when(
        F.col("seen_max").isNotNull() & (F.col("seen_max") > F.col("ts")),
        F.expr("timestampdiff(MICROSECOND, ts, seen_max)"),
    ).otherwise(F.lit(0).cast("bigint"))
    return (
        e.withColumn("seen_max", F.max("ts").over(w))
        .select("user_id", late_us.alias("late_us"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.count(F.when(F.col("late_us") > 0, 1)).cast("bigint").alias(
                "n_out_of_order"
            ),
            F.count(F.when(F.col("late_us") > 1800000000, 1)).cast("bigint").alias(
                "n_beyond_watermark"
            ),
            F.max("late_us").cast("bigint").alias("max_late_us"),
        )
    )


@register(
    "events_max_concurrency",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
), g AS (
  SELECT user_id, sec,
         lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id)
           AS prev_sec
  FROM e
), flagged AS (
  SELECT user_id, sec,
         CASE WHEN prev_sec IS NULL OR sec - prev_sec >= 1800
              THEN 1 ELSE 0 END AS is_new
  FROM g
), sessions AS (
  SELECT user_id, sec,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY sec
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_idx
  FROM flagged
), intervals AS (
  SELECT user_id, MIN(sec) AS s, MAX(sec) AS l
  FROM sessions GROUP BY user_id, session_idx
), deltas AS (
  SELECT s AS t, CAST(1 AS BIGINT) AS delta FROM intervals
  UNION ALL
  SELECT l + 1 AS t, CAST(-1 AS BIGINT) AS delta FROM intervals
), swept AS (
  SELECT t, delta,
         SUM(delta) OVER (ORDER BY t, delta
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM deltas
), mx AS (SELECT MAX(cum) AS m FROM swept)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM intervals) AS n_sessions,
       CAST(mx.m AS BIGINT) AS max_concurrent,
       (SELECT MIN(t) FROM swept, mx WHERE swept.cum = mx.m) AS at_sec
FROM mx
""",
    doc="Peak session concurrency via the classic sweep-line: 30-minute "
    "gap sessions become +1/-1 boundary events on the epoch-second "
    "line, the GLOBAL running sum is the live-session count at every "
    "boundary, and its max (plus the first second achieving it) is the "
    "capacity-planning number an event platform sizes against. The "
    "global running sum is exactly the single-partition-window trap "
    "this repo keeps refusing: it runs through operators.prefixsum."
    "distributed_cumsum (two-phase bucket scan — the THIRD operator on "
    "that primitive after Pareto and backlog), so the sweep "
    "parallelizes over time buckets. Ties are totally ordered by "
    "(t, delta) with -1 before +1, so a session ending the instant "
    "another starts never inflates the peak. All integers.",
    tags=("events", "temporal", "prefixsum", "capacity"),
)
def events_max_concurrency(spark: SparkSession, sf_dir: str):
    from ..operators.prefixsum import distributed_cumsum

    e = t(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec"),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    flagged = e.select(
        "user_id", "sec",
        F.when(
            F.lag("sec").over(w).isNull()
            | (F.col("sec") - F.lag("sec").over(w) >= 1800),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.select(
        "user_id", "sec", F.sum("is_new").over(wrun).alias("session_idx")
    )
    # intervals feeds three subtrees (both delta sides + the session
    # count) and swept feeds three more — persist both or the whole
    # sessionize window chain re-executes per subtree (measured 53s ->
    # ~3s at sf0.01; CacheManager dedupes repeated runs).
    intervals = sessions.groupBy("user_id", "session_idx").agg(
        F.min("sec").alias("s"), F.max("sec").alias("l")
    ).persist()
    deltas = intervals.select(
        F.col("s").alias("t"), F.lit(1).cast("bigint").alias("delta")
    ).unionByName(
        intervals.select(
            (F.col("l") + 1).alias("t"), F.lit(-1).cast("bigint").alias("delta")
        )
    )
    swept = distributed_cumsum(
        deltas, order_col="t", value_col="delta", tiebreak=["delta"],
        out_col="cum",
    ).select("t", F.col("cum").cast("bigint").alias("cum")).persist()
    n_sessions = intervals.agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    mx = swept.agg(F.max("cum").alias("max_concurrent"))
    at = (
        swept.join(F.broadcast(mx), F.col("cum") == F.col("max_concurrent"))
        .agg(F.min("t").alias("at_sec"))
    )
    return n_sessions.crossJoin(mx).crossJoin(at)


@register(
    "events_clamped_balance",
    oracle="""
WITH e AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         CASE WHEN event_type = 'purchase' THEN CAST(floor(value) AS BIGINT)
              WHEN event_type = 'error' THEN -CAST(floor(value) AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS delta
  FROM events
), seqs AS (
  SELECT user_id,
         list(delta ORDER BY sec, event_id) AS deltas
  FROM e GROUP BY 1
)
SELECT user_id,
       CAST(len(deltas) AS BIGINT) AS n_events,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), deltas),
                        (acc, x) -> greatest(acc + x, 0)) AS BIGINT)
         AS final_balance,
       CAST(list_sum(deltas) AS BIGINT) AS naive_sum
FROM seqs
""",
    doc="Clamped running balance per user — credits (purchases) minus "
    "debits (errors) where the balance can never go below zero: the "
    "canonical NON-ASSOCIATIVE scan (inventory with stockouts, "
    "prepaid credit, rate-limiter tokens). A plain cumsum/window "
    "CANNOT express it — clamping at every step changes history — so "
    "the engine collects each key's deltas in event order and folds "
    "them IN-ROW with aggregate() (max(acc + x, 0) at every step, "
    "integer-exact); emitting the naive unclamped sum beside it makes "
    "the gate prove the clamp actually bit (they differ wherever a "
    "user ever hit zero). Scale shape: one groupBy shuffle, then the "
    "sequential dependency runs inside codegen per key — per-key "
    "sequences are the bounded dimension (a user's events, not the "
    "corpus); for million-event keys the same fold generalizes to the "
    "associative (clamp-compose) segmented scan, documented here as "
    "the scale-out path. Oracle: DuckDB replays the identical ordered "
    "fold with list_reduce.",
    tags=("events", "window", "scan", "stateful"),
)
def events_clamped_balance(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec"),
        F.when(
            F.col("event_type") == "purchase",
            F.floor(F.col("value")).cast("bigint"),
        )
        .when(
            F.col("event_type") == "error",
            -F.floor(F.col("value")).cast("bigint"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("delta"),
    )
    seqs = e.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("sec", "event_id", "delta"))
        ).alias("ordered")
    )
    deltas = F.transform(F.col("ordered"), lambda s: s.getField("delta"))
    fold = F.aggregate(
        deltas,
        F.lit(0).cast("bigint"),
        lambda acc, x: F.greatest(acc + x, F.lit(0).cast("bigint")),
    )
    return seqs.select(
        "user_id",
        F.size("ordered").cast("bigint").alias("n_events"),
        fold.alias("final_balance"),
        F.aggregate(
            deltas, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("naive_sum"),
    )


@register(
    "events_common_paths",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
), g AS (
  SELECT user_id, event_type, sec, event_id,
         lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id)
           AS prev_sec
  FROM e
), flagged AS (
  SELECT user_id, event_type, sec, event_id,
         CASE WHEN prev_sec IS NULL OR sec - prev_sec >= 1800
              THEN 1 ELSE 0 END AS is_new
  FROM g
), sess AS (
  SELECT user_id, event_type, sec, event_id,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY sec, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_idx
  FROM flagged
), seqs AS (
  SELECT user_id, session_idx,
         list(event_type ORDER BY sec, event_id) AS path
  FROM sess GROUP BY 1, 2
), prefixes AS (
  SELECT array_to_string(path[1:2], '>') AS path, 2 AS path_len
  FROM seqs WHERE len(path) >= 2
  UNION ALL
  SELECT array_to_string(path[1:3], '>') AS path, 3 AS path_len
  FROM seqs WHERE len(path) >= 3
)
SELECT path, CAST(path_len AS INT) AS path_len,
       CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM prefixes GROUP BY 1, 2
ORDER BY n_sessions DESC, path ASC
LIMIT 20
""",
    doc="Common session-path mining: each 30-minute-gap session's "
    "ordered event-type sequence contributes its length-2 and "
    "length-3 PREFIXES (how journeys start — the navigation-analysis "
    "complement of event_transition_matrix's one-step Markov view), "
    "and the top-20 prefixes by session count come back totally "
    "ordered. Per-session sequences are built with the ordered "
    "collect + in-row slice/join idiom (bounded by session length, "
    "never corpus-sized); the global top-20 is "
    "TakeOrderedAndProject. All counts integer; (sec, event_id) "
    "totally orders every sequence on both engines.",
    tags=("events", "sessionize", "path", "topk"),
)
def events_common_paths(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec"),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    is_new = F.when(
        F.lag("sec").over(w).isNull()
        | (F.col("sec") - F.lag("sec").over(w) >= 1800),
        1,
    ).otherwise(0)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = e.withColumn("is_new", is_new).withColumn(
        "session_idx", F.sum("is_new").over(cum)
    )
    seqs = sess.groupBy("user_id", "session_idx").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("sec", "event_id", "event_type"))
            ),
            lambda s: s.getField("event_type"),
        ).alias("path")
    )
    prefixes = None
    for plen in (2, 3):
        p = seqs.filter(F.size("path") >= plen).select(
            F.concat_ws(">", F.slice("path", 1, plen)).alias("path"),
            F.lit(plen).cast("int").alias("path_len"),
        )
        prefixes = p if prefixes is None else prefixes.unionByName(p)
    return (
        prefixes.groupBy("path", "path_len")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path"))
        .limit(20)
    )


@register(
    "events_changepoint_cusum",
    oracle="""
WITH daily AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days, CAST(SUM(c) AS BIGINT) AS total
  FROM daily
), dev AS (
  SELECT d.day, d.c, t.n_days, t.total,
         d.c * t.n_days - t.total AS dev
  FROM daily d, tot t
), cusum AS (
  SELECT day, c, n_days, total,
         CAST(SUM(dev) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM dev
)
SELECT n_days, total, day AS change_day, cum AS cusum_at_change
FROM cusum
ORDER BY abs(cum) DESC, day ASC
LIMIT 1
""",
    doc="CUSUM change-point detection on the daily event-rate series, "
    "in EXACT integers: deviations are cross-multiplied (c*n - total "
    "instead of c - mean, clearing the rational mean), their running "
    "sum is the classic CUSUM statistic, and the day maximizing |S_k| "
    "is the maximum-likelihood single change point for a level shift "
    "— the monitoring primitive behind 'when did ingestion break'. "
    "The running sum is the fourth consumer of operators.prefixsum."
    "distributed_cumsum (after Pareto, backlog, concurrency): the "
    "series is day-grained here but the same two-phase scan handles a "
    "per-second series at any history length. The argmax row comes "
    "back via TakeOrderedAndProject with a (|S|, day) total order; "
    "everything integer, so the oracle's window formulation must "
    "agree bit-for-bit.",
    tags=("events", "stats", "prefixsum", "monitoring"),
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str):
    from ..operators.prefixsum import distributed_cumsum

    daily = (
        t(spark, sf_dir, "events")
        .select(
            F.expr(
                "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
                " ts) DIV 86400"
            ).alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("c").alias("total")
    )
    dev = daily.crossJoin(F.broadcast(tot)).select(
        "day", "c", "n_days", "total",
        (F.col("c") * F.col("n_days") - F.col("total")).alias("dev"),
    )
    cusum = distributed_cumsum(
        dev, order_col="day", value_col="dev", tiebreak=[], out_col="cum"
    ).select(
        "n_days", "total", F.col("day").alias("change_day"),
        F.col("cum").cast("bigint").alias("cusum_at_change"),
    )
    return cusum.orderBy(
        F.abs(F.col("cusum_at_change")).desc(), F.col("change_day")
    ).limit(1)


@register(
    "events_decayed_engagement",
    oracle="""
WITH daily AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), mx AS (
  SELECT MAX(day) AS max_day FROM daily
), weighted AS (
  SELECT d.user_id,
         d.c * (CAST(1 AS BIGINT) <<
                CAST(40 - LEAST((mx.max_day - d.day) // 7, 40) AS INT))
           AS w
  FROM daily d, mx
)
SELECT user_id, CAST(SUM(w) AS BIGINT) AS decayed_score_2p40
FROM weighted GROUP BY 1
ORDER BY decayed_score_2p40 DESC, user_id ASC
LIMIT 20
""",
    doc="Recency-weighted engagement with EXACT exponential decay: "
    "half-life = one week, so a day-count c aged k weeks contributes "
    "c * 2^-k — represented exactly as c * 2^(40-k) fixed-point "
    "integers (ages capped at 40 half-lives ~ zero weight), summed "
    "with a plain integer aggregate. The standard float-decay "
    "implementation (sum of c*exp(-lambda*age)) is partition-order "
    "dependent AND engine-divergent in libm; powers of two make the "
    "decay exact, associative, and map-side combinable — the shape a "
    "100 TB engagement pipeline can actually re-run reproducibly. "
    "Top-20 users via TakeOrderedAndProject; the global max-day is "
    "one broadcast scalar.",
    tags=("events", "temporal", "agg", "decay"),
)
def events_decayed_engagement(spark: SparkSession, sf_dir: str):
    daily = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr(
                "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
                " ts) DIV 86400"
            ).alias("day"),
        )
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    mx = daily.agg(F.max("day").alias("max_day"))
    weighted = daily.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.expr(
            "c * shiftleft(CAST(1 AS BIGINT),"
            " CAST(40 - LEAST((max_day - day) DIV 7, 40) AS INT))"
        ).alias("w"),
    )
    return (
        weighted.groupBy("user_id")
        .agg(F.sum("w").cast("bigint").alias("decayed_score_2p40"))
        .orderBy(F.col("decayed_score_2p40").desc(), F.col("user_id"))
        .limit(20)
    )


@register(
    "events_bounce_dwell",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
), g AS (
  SELECT user_id, sec,
         lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id)
           AS prev_sec
  FROM e
), flagged AS (
  SELECT user_id, sec,
         CASE WHEN prev_sec IS NULL OR sec - prev_sec >= 1800
              THEN 1 ELSE 0 END AS is_new
  FROM g
), sess AS (
  SELECT user_id, sec,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY sec
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_idx
  FROM flagged
), per_session AS (
  SELECT user_id, session_idx,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         MAX(sec) - MIN(sec) AS dwell_sec
  FROM sess GROUP BY 1, 2
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000
            // COUNT(*) AS BIGINT) AS bounce_permille,
       CAST(SUM(dwell_sec) AS BIGINT) AS total_dwell_sec,
       CAST(MAX(dwell_sec) AS BIGINT) AS longest_dwell_sec
FROM per_session GROUP BY 1
""",
    doc="Bounce rate and dwell time per user — the product-analytics "
    "pair every engagement dashboard leads with: sessions with a "
    "single event are bounces (permille, integer cross-multiplied), "
    "dwell is last-minus-first epoch second within each 30-minute-gap "
    "session. Derived entirely from the sessionize window chain the "
    "family already gates (events_sessionize proves the sessions; "
    "this proves the per-user rollup ON them), so the marginal plan "
    "is one extra user-keyed aggregate. Integer epoch arithmetic "
    "only — timezone-proof.",
    tags=("events", "sessionize", "agg", "product-metrics"),
)
def events_bounce_dwell(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec"),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    is_new = F.when(
        F.lag("sec").over(w).isNull()
        | (F.col("sec") - F.lag("sec").over(w) >= 1800),
        1,
    ).otherwise(0)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per_session = (
        e.withColumn("is_new", is_new)
        .withColumn("session_idx", F.sum("is_new").over(cum))
        .groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("sec") - F.min("sec")).alias("dwell_sec"),
        )
    )
    bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        bounce.cast("bigint").alias("n_bounces"),
        F.expr(
            "SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000"
            " DIV COUNT(*)"
        ).cast("bigint").alias("bounce_permille"),
        F.sum("dwell_sec").cast("bigint").alias("total_dwell_sec"),
        F.max("dwell_sec").cast("bigint").alias("longest_dwell_sec"),
    )


@register(
    "events_dau_wau_stickiness",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
  FROM events
), dau AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY 1
), spread AS (
  SELECT user_id, day + k.k AS day
  FROM ud, unnest([0, 1, 2, 3, 4, 5, 6]) AS k(k)
), wau AS (
  SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
  FROM spread GROUP BY 1
)
SELECT d.day, d.dau, w.wau,
       CAST(d.dau * 1000 // w.wau AS BIGINT) AS stickiness_permille
FROM dau d JOIN wau w ON w.day = d.day
""",
    doc="DAU / trailing-7-day WAU / stickiness — the growth-metrics "
    "headline: WAU(d) counts distinct users active in (d-6..d], "
    "computed EXACTLY by spreading each (user, day) activity row onto "
    "the 7 future days it keeps the user 'weekly active' for (bounded "
    "7x fanout, then one distinct aggregate) — the trick that avoids "
    "both a 7-way self-join and a sliding-window COUNT DISTINCT "
    "(which no engine does exactly in one window). Stickiness = "
    "DAU/WAU in integer permille, the DAU-days-per-week engagement "
    "ratio. Scale: everything is (user, day)-grained — the event "
    "volume collapses at the first DISTINCT; the 7x spread is on the "
    "collapsed table. Output days with zero DAU don't exist by "
    "construction; WAU >= DAU > 0 so the division is safe.",
    tags=("events", "agg", "product-metrics", "window"),
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str):
    ud = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr(
                "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
                " ts) DIV 86400"
            ).alias("day"),
        )
        .distinct()
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    spread = ud.select(
        "user_id", "day",
        F.explode(F.array(*[F.lit(k) for k in range(7)])).alias("k"),
    ).select("user_id", (F.col("day") + F.col("k")).alias("day"))
    wau = spread.groupBy("day").agg(
        F.count_distinct("user_id").alias("wau")
    )
    return dau.join(wau, "day").select(
        "day", "dau", "wau",
        F.expr("dau * 1000 DIV wau").cast("bigint")
        .alias("stickiness_permille"),
    )


@register(
    "events_interarrival_percentiles",
    oracle="""
WITH e AS (
  SELECT event_type, user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
), gaps AS (
  SELECT event_type,
         sec - lag(sec) OVER (PARTITION BY event_type, user_id
                              ORDER BY sec, event_id) AS gap
  FROM e
)
SELECT event_type,
       CAST(COUNT(gap) AS BIGINT) AS n_gaps,
       CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY gap) AS BIGINT)
         AS p50_sec,
       CAST(PERCENTILE_DISC(0.95) WITHIN GROUP (ORDER BY gap) AS BIGINT)
         AS p95_sec,
       MAX(gap) AS max_sec
FROM gaps WHERE gap IS NOT NULL
GROUP BY 1
""",
    doc="Inter-arrival-time percentiles per event type — the cadence "
    "profile that sizes watermark delays and sessionization gaps from "
    "DATA instead of folklore: per (type, user) consecutive-event "
    "gaps in integer epoch seconds, rolled up to exact "
    "PERCENTILE_DISC p50/p95 (actual sample members — no "
    "interpolation arithmetic to diverge between engines) and the "
    "max. Pairs with events_late_arrival_profile (which measures "
    "ARRIVAL disorder; this measures event-time spacing): together "
    "they are the two empirical inputs a streaming deployment needs "
    "before choosing its delayThreshold and session gap. One window "
    "over (type, user) + one percentile aggregate per type.",
    tags=("events", "temporal", "percentile", "profile"),
)
def events_interarrival_percentiles(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events").select(
        "event_type", "user_id", "event_id",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec"),
    )
    w = Window.partitionBy("event_type", "user_id").orderBy("sec", "event_id")
    gaps = e.select(
        "event_type", (F.col("sec") - F.lag("sec").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("gap").alias("n_gaps"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap)")
        .cast("bigint").alias("p50_sec"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY gap)")
        .cast("bigint").alias("p95_sec"),
        F.max("gap").alias("max_sec"),
    )


@register(
    "markov_nextstep_eval",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
), seq AS (
  SELECT event_type AS prev,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY sec, event_id) AS nxt
  FROM e
), trans AS (
  SELECT prev, nxt, CAST(COUNT(*) AS BIGINT) AS c
  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
), model AS (
  SELECT prev, nxt AS predicted FROM (
    SELECT prev, nxt, row_number() OVER (
      PARTITION BY prev ORDER BY c DESC, nxt ASC) AS rn
    FROM trans
  ) WHERE rn = 1
), scored AS (
  SELECT s.prev, CAST(COUNT(*) AS BIGINT) AS n_transitions,
         CAST(SUM(CASE WHEN s.nxt = m.predicted THEN 1 ELSE 0 END)
              AS BIGINT) AS n_correct
  FROM seq s JOIN model m ON m.prev = s.prev
  WHERE s.nxt IS NOT NULL
  GROUP BY 1
)
SELECT sc.prev, m.predicted, sc.n_transitions, sc.n_correct,
       CAST(sc.n_correct * 1000 // sc.n_transitions AS BIGINT)
         AS hit_rate_permille
FROM scored sc JOIN model m ON m.prev = sc.prev
""",
    doc="Next-event prediction eval for the first-order Markov model: "
    "the argmax transition per previous type (deterministic (count, "
    "type) tiebreak) becomes the predictor, every observed transition "
    "scores it, and hit-rate@1 comes back per type in integer "
    "permille — in-engine MODEL EVALUATION on sequence data, closing "
    "the loop event_transition_matrix opens (it estimates the "
    "probabilities; this measures whether acting on them beats "
    "chance). Train and eval share one window pass; resubstitution "
    "evaluation is intentional and documented — the point is the "
    "eval MECHANISM (a temporal split via ml_time_split_embargo "
    "composes trivially). All integers.",
    tags=("events", "ml", "eval", "sequence"),
)
def markov_nextstep_eval(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec"),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    seq = e.select(
        F.col("event_type").alias("prev"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    trans = seq.groupBy("prev", "nxt").agg(F.count(F.lit(1)).alias("c"))
    wm = Window.partitionBy("prev").orderBy(F.col("c").desc(), F.col("nxt"))
    model = (
        trans.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") == 1)
        .select("prev", F.col("nxt").alias("predicted"))
    )
    scored = (
        seq.join(F.broadcast(model), "prev")
        .groupBy("prev", "predicted")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.sum(
                F.when(F.col("nxt") == F.col("predicted"), 1).otherwise(0)
            ).cast("bigint").alias("n_correct"),
        )
    )
    return scored.select(
        "prev", "predicted", "n_transitions", "n_correct",
        F.expr("n_correct * 1000 DIV n_transitions").cast("bigint")
        .alias("hit_rate_permille"),
    )


@register(
    "events_burstiness_fano",
    oracle="""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), moments AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS ssq
  FROM daily GROUP BY 1
)
SELECT event_type, n, s, ssq,
       CAST((1000 * (n * ssq - s * s)) // ((n - 1) * s) AS BIGINT)
         AS fano_milli
FROM moments WHERE n > 1
""",
    doc="Burstiness (Fano factor: variance-to-mean of the daily count "
    "series) per event type, in cross-multiplied integers: F_milli = "
    "1000*(n*ssq - s^2) / ((n-1)*s) from the three exact integer "
    "moments (n, sum, sum-of-squares) — one map-side-combinable "
    "aggregate, no float variance accumulators. F ~ 1000 means "
    "Poisson-like arrivals; far above flags bursty/overdispersed "
    "traffic (retry storms, batchy producers) — the dispersion "
    "diagnostic the rate-anomaly fences and watermark sizing both "
    "assume away, now measured. Overflow headroom: n*ssq at daily "
    "grain stays far under int64 for any realistic per-type volume "
    "(counts would need ~3e9/day x 1000 days to threaten it).",
    tags=("events", "stats", "profile", "agg"),
)
def events_burstiness_fano(spark: SparkSession, sf_dir: str):
    daily = (
        t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr(
                "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
                " ts) DIV 86400"
            ).alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    moments = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ssq"),
    )
    return moments.filter(F.col("n") > 1).select(
        "event_type", "n", "s", "ssq",
        F.expr("(1000 * (n * ssq - s * s)) DIV ((n - 1) * s)")
        .cast("bigint").alias("fano_milli"),
    )


@register(
    "events_hourweek_heatmap",
    oracle="""
WITH e AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
), cells AS (
  SELECT (sec // 86400 + 4) % 7 AS dow,   -- 1970-01-01 was a Thursday
         (sec % 86400) // 3600 AS hour,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY 1, 2
), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cells)
SELECT CAST(c.dow AS BIGINT) AS dow, CAST(c.hour AS BIGINT) AS hour, c.n,
       CAST(c.n * 10000 // t.total AS BIGINT) AS share_permyriad
FROM cells c, tot t
""",
    doc="Hour-of-week traffic heatmap (the 7x24 ops matrix behind "
    "capacity planning and maintenance-window choice): day-of-week "
    "derived as (epoch_day + 4) % 7 — pure integer arithmetic, "
    "immune to the dayofweek() cross-engine trap (Sunday=0 vs ISO) "
    "documented at orders_weekday_seasonality — and hour from "
    "seconds-of-day; each cell carries its integer permyriad share. "
    "One map-side-combinable aggregate over however many events "
    "exist; the output is always exactly the populated subset of "
    "168 cells.",
    tags=("events", "temporal", "profile", "agg"),
)
def events_hourweek_heatmap(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events").select(
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec")
    )
    cells = e.groupBy(
        F.expr("(sec DIV 86400 + 4) % 7").cast("bigint").alias("dow"),
        F.expr("(sec % 86400) DIV 3600").cast("bigint").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = cells.agg(F.sum("n").cast("bigint").alias("total"))
    return cells.crossJoin(F.broadcast(tot)).select(
        "dow", "hour", "n",
        F.expr("n * 10000 DIV total").cast("bigint").alias("share_permyriad"),
    )


@register(
    "slo_error_burn_hours",
    oracle="""
WITH hourly AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour_id,
         CAST(COUNT(*) AS BIGINT) AS total,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS errors
  FROM events GROUP BY 1
), flagged AS (
  SELECT hour_id, total, errors,
         CASE WHEN errors * 4 > total THEN 1 ELSE 0 END AS violating
  FROM hourly
), edges AS (
  SELECT hour_id, violating,
         CASE WHEN violating = 1 AND COALESCE(lag(violating) OVER
              (ORDER BY hour_id), 0) = 0 THEN 1 ELSE 0 END AS starts
  FROM flagged
), runs AS (
  SELECT hour_id, violating,
         SUM(starts) OVER (ORDER BY hour_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM edges
), streaks AS (
  SELECT run_id, CAST(COUNT(*) AS BIGINT) AS len
  FROM runs WHERE violating = 1 GROUP BY 1
)
SELECT CAST((SELECT COUNT(*) FROM flagged) AS BIGINT) AS n_hours,
       CAST((SELECT SUM(violating) FROM flagged) AS BIGINT)
         AS n_violating,
       CAST(COALESCE((SELECT MAX(len) FROM streaks), 0) AS BIGINT)
         AS longest_streak_hours,
       CAST((SELECT SUM(errors) FROM flagged) * 1000
            // (SELECT SUM(total) FROM flagged) AS BIGINT)
         AS overall_error_permille
""",
    doc="SLO burn report for the error budget: hours whose error share "
    "exceeds 25% (integer cross-multiplied errors*4 > total — the "
    "threshold never touches a float), the count of violating hours, "
    "and the LONGEST consecutive violation streak via the gaps-"
    "islands run numbering — because one bad hour pages nobody but "
    "six in a row is an incident; burn-rate alerting is precisely "
    "'violation streak length at a given threshold'. The hourly "
    "rollup is one map-side-combinable aggregate; the streak window "
    "runs over the HOUR series (series-sized, like every bounded "
    "window in this repo), not events.",
    tags=("events", "monitoring", "slo", "islands", "agg"),
)
def slo_error_burn_hours(spark: SparkSession, sf_dir: str):
    hourly = (
        t(spark, sf_dir, "events")
        .select(
            F.expr(
                "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
                " ts) DIV 3600"
            ).alias("hour_id"),
            F.col("event_type"),
        )
        .groupBy("hour_id")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("bigint")
            .alias("errors"),
        )
    )
    flagged = hourly.withColumn(
        "violating",
        F.when(F.col("errors") * 4 > F.col("total"), 1).otherwise(0),
    ).persist()
    w = Window.orderBy("hour_id")
    edges = flagged.withColumn(
        "starts",
        F.when(
            (F.col("violating") == 1)
            & (F.coalesce(F.lag("violating").over(w), F.lit(0)) == 0),
            1,
        ).otherwise(0),
    )
    runs = edges.withColumn(
        "run_id",
        F.sum("starts").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    streaks = (
        runs.filter(F.col("violating") == 1)
        .groupBy("run_id")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    summary = flagged.agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("violating").cast("bigint").alias("n_violating"),
        F.sum("errors").cast("bigint").alias("tot_err"),
        F.sum("total").cast("bigint").alias("tot_all"),
    )
    longest = streaks.agg(
        F.coalesce(F.max("len"), F.lit(0)).cast("bigint")
        .alias("longest_streak_hours")
    )
    return summary.crossJoin(longest).select(
        "n_hours", "n_violating", "longest_streak_hours",
        F.expr("tot_err * 1000 DIV tot_all").cast("bigint")
        .alias("overall_error_permille"),
    )


@register(
    "events_pattern_regex",
    oracle="""
WITH e AS (
  SELECT user_id, event_id,
         substring(event_type, 1, 1) AS sym,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
), seqs AS (
  SELECT user_id,
         array_to_string(list(sym ORDER BY sec, event_id), '') AS seq
  FROM e GROUP BY 1
)
SELECT user_id,
       CAST(length(seq) AS BIGINT) AS n_events,
       CAST(len(regexp_extract_all(seq, 'vc*p')) AS BIGINT) AS n_browse_buy,
       CAST(len(regexp_extract_all(seq, 'e+p')) AS BIGINT) AS n_error_recovery,
       substring(seq, 1, 1) = 's' AS started_signup,
       CAST(COALESCE(list_max(list_transform(
              regexp_extract_all(seq, 'c+'), x -> length(x))), 0) AS BIGINT)
         AS longest_click_run
FROM seqs
""",
    doc="CEP-style sequence pattern matching — the MATCH_RECOGNIZE "
    "analogue: each user's time-ordered event history is symbolized "
    "to one character per event (the five types have distinct "
    "initials) and CEP patterns become plain REGEXES over the "
    "per-user string: 'vc*p' counts browse-to-buy conversions "
    "(view, any clicks, purchase), 'e+p' counts error-recovery "
    "purchases, an anchor tests signup-first onboarding, and "
    "max-len('c+') extracts the longest click streak. Ordering is "
    "made deterministic by the (sec, event_id) tiebreak — without "
    "the unique-id tiebreak, same-second events would make the "
    "symbol string engine-dependent and the gate would flap. Shape "
    "at scale: one user-keyed sort-aggregate builds the bounded "
    "per-user string in-row (same precondition as "
    "events_common_paths: per-entity history is bounded); the regex "
    "pass is a narrow JVM-side map — no joins, no state machine "
    "operator, leftmost non-overlapping match semantics identical "
    "across engines. Counts are exact integers.",
    tags=("events", "pattern", "text"),
)
def events_pattern_regex(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.substring("event_type", 1, 1).alias("sym"),
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec"),
    )
    seqs = e.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("sec", "event_id", "sym"))
                ),
                lambda s: s["sym"],
            ),
            "",
        ).alias("seq")
    )
    runs = F.regexp_extract_all(F.col("seq"), F.lit("c+"), F.lit(0))
    return seqs.select(
        "user_id",
        F.length("seq").cast("bigint").alias("n_events"),
        F.regexp_count(F.col("seq"), F.lit("vc*p"))
        .cast("bigint")
        .alias("n_browse_buy"),
        F.regexp_count(F.col("seq"), F.lit("e+p"))
        .cast("bigint")
        .alias("n_error_recovery"),
        (F.substring("seq", 1, 1) == "s").alias("started_signup"),
        F.coalesce(
            F.array_max(F.transform(runs, lambda x: F.length(x))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("longest_click_run"),
    )


def tvd_report(c):
    """Exact total-variation drift report from per-type window counts
    ``(event_type, n_a, n_b)`` — the shared tail of events_drift_tvd
    (batch) and streaming_drift_tvd (stream-folded counts): shares in
    ppm, per-type contribution, and the global tvd_ppm, in exact
    cross-multiplied integer arithmetic (DECIMAL(38,0) intermediates).

    Window totals are guarded with greatest(total, 1) — the KMV
    estimator's idiom — so a degenerate input where every event lands
    in one window yields defined 0 shares/tvd instead of Spark's
    non-ANSI NULL-on-div-by-zero diverging from DuckDB's // error
    (every numerator is 0 whenever its total is)."""
    tot = c.agg(
        F.greatest(F.sum("n_a"), F.lit(1)).cast("bigint").alias("ta"),
        F.greatest(F.sum("n_b"), F.lit(1)).cast("bigint").alias("tb"),
    )
    term = c.crossJoin(F.broadcast(tot)).select(
        "event_type", "n_a", "n_b",
        F.expr(
            "CAST((CAST(n_a AS DECIMAL(38,0)) * 1000000) div ta AS BIGINT)"
        ).alias("share_a_ppm"),
        F.expr(
            "CAST((CAST(n_b AS DECIMAL(38,0)) * 1000000) div tb AS BIGINT)"
        ).alias("share_b_ppm"),
        F.expr(
            "abs(CAST(n_a AS DECIMAL(38,0)) * tb - CAST(n_b AS DECIMAL(38,0)) * ta)"
        ).alias("dterm"),
        "ta", "tb",
    ).persist()  # feeds both the global TVD and the per-type projection
    g = term.agg(
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * SUM(dterm))"
            " div (CAST(2 AS DECIMAL(38,0)) * first(ta) * first(tb)) AS BIGINT)"
        ).alias("tvd_ppm")
    )
    return term.crossJoin(F.broadcast(g)).select(
        "event_type", "n_a", "n_b", "share_a_ppm", "share_b_ppm",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * dterm)"
            " div (CAST(2 AS DECIMAL(38,0)) * ta * tb) AS BIGINT)"
        ).alias("contrib_ppm"),
        "tvd_ppm",
    )


_TVD_ORACLE = """
WITH base AS (
  SELECT event_type,
         CASE WHEN date_part('day', ts) <= 15 THEN 'a' ELSE 'b' END AS w
  FROM events
),
c AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN w = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN w = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM base GROUP BY 1
),
tot AS (SELECT CAST(greatest(SUM(n_a), 1) AS BIGINT) AS ta,
               CAST(greatest(SUM(n_b), 1) AS BIGINT) AS tb
        FROM c),
term AS (
  SELECT event_type, n_a, n_b,
         CAST((n_a::HUGEINT * 1000000) // ta AS BIGINT) AS share_a_ppm,
         CAST((n_b::HUGEINT * 1000000) // tb AS BIGINT) AS share_b_ppm,
         abs(n_a::HUGEINT * tb - n_b::HUGEINT * ta) AS dterm,
         ta, tb
  FROM c, tot
),
g AS (
  SELECT CAST((1000000::HUGEINT * SUM(dterm))
              // (2::HUGEINT * (SELECT ta FROM tot) * (SELECT tb FROM tot))
         AS BIGINT) AS tvd_ppm
  FROM term
)
SELECT event_type, n_a, n_b, share_a_ppm, share_b_ppm,
       CAST((1000000::HUGEINT * dterm) // (2::HUGEINT * ta * tb) AS BIGINT)
         AS contrib_ppm,
       (SELECT tvd_ppm FROM g) AS tvd_ppm
FROM term
"""


@register(
    "events_drift_tvd",
    oracle=_TVD_ORACLE,
    doc="Distribution-drift monitor over the event stream: split events "
    "into a reference window and a comparison window (day-of-month <= "
    "15 vs the rest — a wall-clock field, timezone-independent on NTZ "
    "data) and measure how far the event-type mix moved. The drift "
    "statistic is TOTAL VARIATION DISTANCE, TVD = (1/2) sum_t "
    "|p_t - q_t| — chosen over the industry-default PSI deliberately: "
    "PSI needs ln(p/q) (cross-engine libm, last-ulp rank drift — the "
    "registry's no-log rule) while TVD cross-multiplies to exact "
    "integers: |n_a*T_b - n_b*T_a| summed, then one floor division to "
    "ppm. Output per event type: window counts, shares (ppm), the "
    "type's contribution to the drift, and the global tvd_ppm "
    "(constant column — the alert threshold a monitor pages on, e.g. "
    "tvd_ppm > 100000 = 10 points of distribution shift). Scale "
    "shape: one map-side-combinable aggregate keyed by event type + "
    "a 1-row total broadcast — the same two-pass shape at any stream "
    "volume; the windowed-HLL / quantile-sketch streaming twins show "
    "how the same signal runs incrementally.",
    tags=("events", "drift", "monitoring", "agg"),
)
def events_drift_tvd(spark: SparkSession, sf_dir: str):
    base = t(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.dayofmonth("ts") <= 15, "a").otherwise("b").alias("w"),
    )
    c = base.groupBy("event_type").agg(
        F.sum(F.when(F.col("w") == "a", 1).otherwise(0))
        .cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("w") == "b", 1).otherwise(0))
        .cast("bigint").alias("n_b"),
    )
    return tvd_report(c)


@register(
    "events_peak_over_threshold",
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
), u AS (
  SELECT percentile_disc(0.90) WITHIN GROUP (ORDER BY c) AS u FROM hourly
), exc AS (
  SELECT c - (SELECT u FROM u) AS x FROM hourly
  WHERE c > (SELECT u FROM u)
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM hourly) AS n_hours,
       (SELECT CAST(u AS BIGINT) FROM u) AS threshold,
       CAST(COUNT(*) AS BIGINT) AS n_exceedances,
       CAST(SUM(x) AS DOUBLE) / COUNT(*) AS mean_excess,
       CAST(MAX(x) AS BIGINT) AS max_excess
FROM exc
""",
    doc="Peaks-over-threshold load diagnostic (the empirical first step "
    "of an extreme-value analysis, Pickands 1975): hourly event "
    "counts, the exact p90 threshold (percentile_disc ELEMENT — an "
    "actual observed count, bit-identical cross-engine), and the "
    "exceedance count / mean excess / max excess above it. The mean "
    "excess is the quantity a GPD tail fit starts from; a capacity "
    "planner watches it to size burst headroom. Exact bigint counts "
    "with ONE final division. Shape: one hour-bucket aggregate, one "
    "percentile aggregate broadcast back as a scalar, one filtered "
    "global aggregate — no windows, no joins on data.",
    tags=("events", "stats", "timeseries", "agg"),
)
def events_peak_over_threshold(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    if dict(e.dtypes)["ts"] == "timestamp_ntz":
        hour = F.make_timestamp_ntz(
            F.year("ts"), F.month("ts"), F.dayofmonth("ts"),
            F.hour("ts"), F.lit(0), F.lit(0),
        )
    else:
        hour = F.date_trunc("hour", F.col("ts"))
    hourly = e.groupBy(hour.alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    u = F.broadcast(
        hourly.agg(
            F.expr("percentile_disc(0.90) WITHIN GROUP (ORDER BY c)")
            .cast("bigint")
            .alias("u")
        )
    )
    nh = F.broadcast(
        hourly.agg(F.count(F.lit(1)).cast("bigint").alias("n_hours"))
    )
    exc = hourly.crossJoin(u).filter(F.col("c") > F.col("u")).select(
        "u", (F.col("c") - F.col("u")).alias("x")
    )
    return (
        exc.groupBy("u")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exceedances"),
            (F.sum("x").cast("double") / F.count(F.lit(1))).alias(
                "mean_excess"
            ),
            F.max("x").cast("bigint").alias("max_excess"),
        )
        .crossJoin(nh)
        .select(
            "n_hours",
            F.col("u").alias("threshold"),
            "n_exceedances",
            "mean_excess",
            "max_excess",
        )
    )
