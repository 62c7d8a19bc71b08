"""Temporal-join queries: as-of and range joins (operators.temporal).

Not in the reference (SURVEY.md §2.3 lists them as absent) — these are the
custom-operator extensions. DuckDB verifies them with its NATIVE temporal
joins (ASOF JOIN; plain inequality join), i.e. the oracle uses a different
algorithm than the engine — a real differential test, not a mirror.

Timestamps: orders.o_orderdate / events.ts surface as TIMESTAMP_NTZ; the
as-of query keys on DATE (cast is wall-clock, timezone-free) and the range
query builds hour bounds with make_timestamp_ntz — no session-timezone
dependence anywhere.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.temporal import asof_join, range_join
from .registry import register
from .util import t


@register(
    "asof_join_price_index",
    oracle="""
WITH idx AS (
  SELECT o_orderpriority AS p, CAST(o_orderdate AS DATE) AS d,
         MIN(o_totalprice) AS ref_price
  FROM orders
  WHERE day(CAST(o_orderdate AS DATE)) % 5 = 1
  GROUP BY 1, 2
),
l AS (SELECT o_orderkey, o_orderpriority, CAST(o_orderdate AS DATE) AS od FROM orders)
SELECT l.o_orderkey, l.o_orderpriority, idx.ref_price
FROM l ASOF LEFT JOIN idx
  ON l.o_orderpriority = idx.p AND l.od >= idx.d
""",
    doc="As-of join: every order gets the most recent reference price "
    "(sparse per-priority daily index, days ending in 1 or 6) at or before "
    "its date. Engine: union + last(ignorenulls) window — one sort-shuffle, "
    "no inequality join. Oracle: DuckDB's native ASOF JOIN (different "
    "algorithm, same answer).",
    tags=("join", "asof", "temporal"),
    bench=True,
)
def asof_join_price_index(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    day = F.col("o_orderdate").cast("date")
    idx = (
        o.filter(F.dayofmonth(day) % 5 == 1)
        .groupBy(F.col("o_orderpriority"), day.alias("d"))
        .agg(F.min("o_totalprice").alias("ref_price"))
    )
    left = o.select("o_orderkey", "o_orderpriority", day.alias("od"))
    out = asof_join(
        left,
        idx,
        left_time="od",
        right_time="d",
        by=["o_orderpriority"],
        right_cols=["ref_price"],
    )
    return out.select("o_orderkey", "o_orderpriority", "ref_price")


@register(
    "range_join_event_windows",
    oracle="""
WITH hours AS (
  SELECT DISTINCT make_timestamp(year(ts), month(ts), day(ts), hour(ts), 0, 0.0) AS h
  FROM events
),
iv AS (
  SELECT h AS win_start, h + INTERVAL 2 HOUR AS win_end
  FROM hours WHERE hour(h) % 7 = 0
)
SELECT e.event_id, iv.win_start,
       CAST(SUM(1) AS BIGINT) AS n_windows
FROM events e JOIN iv
  ON e.ts >= iv.win_start AND e.ts < iv.win_end
GROUP BY 1, 2
""",
    doc="Range join: events matched to the 2-hour windows containing them "
    "(windows anchored at hours ≡ 0 mod 7 — overlapping, so some events "
    "land in two). Engine: bucketed equi-join on fixed-width time cells + "
    "exact verify (O(points+cells), no nested loop). Oracle: DuckDB plain "
    "inequality join.",
    tags=("join", "range", "temporal"),
    bench=True,
)
def range_join_event_windows(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    hour = F.make_timestamp_ntz(
        F.year("ts"), F.month("ts"), F.dayofmonth("ts"), F.hour("ts"),
        F.lit(0), F.lit(0),
    )
    iv = (
        e.select(hour.alias("win_start"))
        .distinct()
        .filter(F.hour("win_start") % 7 == 0)
        .withColumn("win_end", F.col("win_start") + F.expr("INTERVAL 2 HOURS"))
    )
    joined = range_join(
        e.select("event_id", "ts"),
        iv,
        point_time="ts",
        start_col="win_start",
        end_col="win_end",
        bucket=7200,
    )
    return joined.groupBy("event_id", "win_start").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows")
    )


@register(
    "asof_forward_tolerance",
    oracle="""
WITH idx AS (
  SELECT o_orderpriority AS p, CAST(o_orderdate AS DATE) AS d,
         MIN(o_totalprice) AS ref_price
  FROM orders
  WHERE day(CAST(o_orderdate AS DATE)) % 5 = 1
  GROUP BY 1, 2
),
l AS (SELECT o_orderkey, o_orderpriority, CAST(o_orderdate AS DATE) AS od FROM orders),
nxt AS (
  SELECT l.o_orderkey, l.o_orderpriority, l.od,
         (SELECT MIN(d) FROM idx
          WHERE idx.p = l.o_orderpriority AND idx.d >= l.od) AS nd
  FROM l
)
SELECT n.o_orderkey, n.o_orderpriority,
       CASE WHEN n.nd IS NOT NULL AND n.nd <= n.od + 3
            THEN i.ref_price END AS ref_price
FROM nxt n LEFT JOIN idx i
  ON i.p = n.o_orderpriority AND i.d = n.nd
""",
    doc="Forward as-of join with tolerance (pandas merge_asof semantics): "
    "every order gets the NEXT reference price at or after its date, "
    "nulled when the match is more than 3 days out — the shape of "
    "'attach the next quote/settlement within the allowed staleness'. "
    "Engine: the same single union + last(ignorenulls) sort-shuffle as "
    "backward as-of, with the window order reversed and the tolerance "
    "applied as a post-window filter on the matched time — no second "
    "join. Oracle: correlated MIN subquery + equi-join re-lookup "
    "(different algorithm, same answer).",
    tags=("join", "asof", "temporal"),
)
def asof_forward_tolerance(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    day = F.col("o_orderdate").cast("date")
    idx = (
        o.filter(F.dayofmonth(day) % 5 == 1)
        .groupBy(F.col("o_orderpriority"), day.alias("d"))
        .agg(F.min("o_totalprice").alias("ref_price"))
    )
    left = o.select("o_orderkey", "o_orderpriority", day.alias("od"))
    out = asof_join(
        left,
        idx,
        left_time="od",
        right_time="d",
        by=["o_orderpriority"],
        right_cols=["ref_price"],
        direction="forward",
        tolerance=3,
    )
    return out.select("o_orderkey", "o_orderpriority", "ref_price")


@register(
    "asof_join_nearest",
    oracle="""
WITH idx AS (
  SELECT o_orderpriority AS p, CAST(o_orderdate AS DATE) AS d,
         MIN(o_totalprice) AS ref_price
  FROM orders
  WHERE day(CAST(o_orderdate AS DATE)) % 5 = 1
  GROUP BY 1, 2
),
l AS (SELECT o_orderkey, o_orderpriority, CAST(o_orderdate AS DATE) AS od FROM orders),
b AS (
  SELECT l.o_orderkey, l.o_orderpriority, l.od, i.d AS bd, i.ref_price AS bp
  FROM l ASOF LEFT JOIN idx i ON l.o_orderpriority = i.p AND l.od >= i.d
),
f AS (
  SELECT l.o_orderkey, i.d AS fd, i.ref_price AS fp
  FROM l ASOF LEFT JOIN idx i ON l.o_orderpriority = i.p AND l.od <= i.d
),
pick AS (
  SELECT b.o_orderkey, b.o_orderpriority, b.od,
         CASE WHEN f.fd IS NULL THEN b.bd WHEN b.bd IS NULL THEN f.fd
              WHEN (b.od - b.bd) <= (f.fd - b.od) THEN b.bd ELSE f.fd
         END AS nd,
         CASE WHEN f.fd IS NULL THEN b.bp WHEN b.bd IS NULL THEN f.fp
              WHEN (b.od - b.bd) <= (f.fd - b.od) THEN b.bp ELSE f.fp
         END AS np
  FROM b JOIN f ON f.o_orderkey = b.o_orderkey
)
SELECT o_orderkey, o_orderpriority,
       CASE WHEN nd IS NOT NULL AND abs(od - nd) <= 2 THEN np
       END AS ref_price
FROM pick
""",
    doc="Nearest-direction as-of join (pandas merge_asof "
    "direction='nearest'): every order gets the reference price from the "
    "CLOSEST index day in either direction, ties broken backward, nulled "
    "past a 2-day tolerance — the 'snap to the nearest quote' shape "
    "backward/forward alone can't express. Engine: the same single "
    "union + by-key exchange as the directional as-ofs, with BOTH fills "
    "computed over it (last(ignorenulls) ascending for backward, "
    "first(ignorenulls) over the trailing frame with the tie order "
    "reversed for forward) — two in-partition sorts, one shuffle, no "
    "second join, no pair blowup. Oracle: DuckDB's NATIVE ASOF joins in "
    "both directions + CASE on the day gaps (a different algorithm "
    "entirely; the correlated-subquery formulation was O(n·idx) and "
    "timed out at sf1).",
    tags=("join", "asof", "temporal"),
)
def asof_join_nearest(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    day = F.col("o_orderdate").cast("date")
    idx = (
        o.filter(F.dayofmonth(day) % 5 == 1)
        .groupBy(F.col("o_orderpriority"), day.alias("d"))
        .agg(F.min("o_totalprice").alias("ref_price"))
    )
    left = o.select("o_orderkey", "o_orderpriority", day.alias("od"))
    out = asof_join(
        left,
        idx,
        left_time="od",
        right_time="d",
        by=["o_orderpriority"],
        right_cols=["ref_price"],
        direction="nearest",
        tolerance=2,
    )
    return out.select("o_orderkey", "o_orderpriority", "ref_price")


@register(
    "resample_ffill_daily",
    oracle="""
WITH daily AS (
  SELECT o_orderpriority AS p, CAST(o_orderdate AS DATE) AS d,
         COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS tot
  FROM orders GROUP BY 1, 2
), b AS (
  SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
         MAX(CAST(o_orderdate AS DATE)) AS hi
  FROM orders
), spine AS (
  SELECT pr.p, CAST(t.d AS DATE) AS d
  FROM (SELECT DISTINCT o_orderpriority AS p FROM orders) pr, b,
       unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS t(d)
)
SELECT s.p AS o_orderpriority, s.d AS day,
       last_value(dl.n IGNORE NULLS) OVER w AS n_orders_ff,
       last_value(dl.tot IGNORE NULLS) OVER w AS total_ff,
       dl.d IS NOT NULL AS observed
FROM spine s LEFT JOIN daily dl ON dl.p = s.p AND dl.d = s.d
WINDOW w AS (PARTITION BY s.p ORDER BY s.d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    doc="Time-series resampling to a regular daily grid with forward "
    "fill: per-priority daily totals exist only on observed days; the "
    "complete spine is keys × sequence(min_day, max_day) built "
    "DISTRIBUTED (sequence+explode per key — no driver-side range, "
    "SURVEY §2.11.4's date-spine fix reused), gaps carry the last "
    "observation forward via last(ignorenulls) over the per-key window. "
    "Shape at scale: one agg shuffle, one co-keyed join, one per-key "
    "sort window — all partitioned by the series key; the fill copies "
    "already-deterministic doubles, so no new float arithmetic.",
    tags=("temporal", "window", "resample"),
)
def resample_ffill_daily(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    from ..functions.hashing import decimal_sum

    o = t(spark, sf_dir, "orders")
    day = F.col("o_orderdate").cast("date")
    daily = o.groupBy(F.col("o_orderpriority").alias("p"), day.alias("d")).agg(
        F.count(F.lit(1)).alias("n"),
        decimal_sum("o_totalprice", alias="tot"),
    )
    bounds = o.agg(
        F.min(day).alias("lo"), F.max(day).alias("hi")
    )
    spine = (
        o.select(F.col("o_orderpriority").alias("p"))
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "p",
            F.explode(
                F.expr("sequence(lo, hi, interval 1 day)")
            ).alias("d"),
        )
    )
    s = spine.alias("s")
    dl = daily.alias("dl")
    joined = s.join(
        dl,
        (F.col("s.p") == F.col("dl.p")) & (F.col("s.d") == F.col("dl.d")),
        "left",
    )
    w = (
        Window.partitionBy(F.col("s.p"))
        .orderBy(F.col("s.d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col("s.p").alias("o_orderpriority"),
        F.col("s.d").alias("day"),
        F.last(F.col("dl.n"), ignorenulls=True).over(w).alias("n_orders_ff"),
        F.last(F.col("dl.tot"), ignorenulls=True).over(w).alias("total_ff"),
        F.col("dl.d").isNotNull().alias("observed"),
    )


@register(
    "resample_linear_interpolate",
    oracle="""
WITH daily AS (
  SELECT o_orderpriority AS p, CAST(o_orderdate AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders
  WHERE day(CAST(o_orderdate AS DATE)) % 3 = 1
  GROUP BY 1, 2
), b AS (
  SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
         MAX(CAST(o_orderdate AS DATE)) AS hi
  FROM orders
), spine AS (
  SELECT pr.p, CAST(t.d AS DATE) AS d
  FROM (SELECT DISTINCT o_orderpriority AS p FROM orders) pr, b,
       unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS t(d)
), g AS (
  SELECT s.p, s.d, dl.n,
         last_value(dl.n IGNORE NULLS) OVER wb AS pn,
         last_value(dl.d IGNORE NULLS) OVER wb AS pd,
         first_value(dl.n IGNORE NULLS) OVER wf AS nn,
         first_value(dl.d IGNORE NULLS) OVER wf AS nd
  FROM spine s LEFT JOIN daily dl ON dl.p = s.p AND dl.d = s.d
  WINDOW wb AS (PARTITION BY s.p ORDER BY s.d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY s.p ORDER BY s.d
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT p AS o_orderpriority, d AS day,
       n IS NOT NULL AS observed, n AS n_obs,
       CASE WHEN n IS NOT NULL THEN n * 1000
            WHEN pn IS NOT NULL AND nn IS NOT NULL
            THEN (pn * (nd - d) + nn * (d - pd)) * 1000 // (nd - pd)
       END AS interp_milli
FROM g
""",
    doc="Time-series resampling with LINEAR interpolation — the gap-fill "
    "forward-fill can't express: per-priority order counts observed only "
    "on days-of-month ≡ 1 (mod 3), resampled onto the complete daily "
    "spine with each gap day interpolated between its surrounding "
    "observations in EXACT integer milli-units "
    "((prev·(next_d−d) + next·(d−prev_d))·1000 DIV span — all BIGINT, "
    "floor-div agrees across engines on non-negative terms, so no float "
    "ever enters the fill). Days before the first / after the last "
    "observation stay NULL (no extrapolation). Shape at scale: one agg "
    "shuffle, one distributed sequence+explode spine, one co-keyed left "
    "join, then BOTH fills (last-preceding and first-following) over the "
    "same per-key exchange — two in-partition sorts, no second shuffle, "
    "the same single-exchange trick as the nearest as-of.",
    tags=("temporal", "window", "resample"),
    bench=True,
)
def resample_linear_interpolate(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    day = F.col("o_orderdate").cast("date")
    daily = (
        o.filter(F.dayofmonth(day) % 3 == 1)
        .groupBy(F.col("o_orderpriority").alias("p"), day.alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bounds = o.agg(F.min(day).alias("lo"), F.max(day).alias("hi"))
    spine = (
        o.select(F.col("o_orderpriority").alias("p"))
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "p",
            F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d"),
        )
    )
    s = spine.alias("s")
    dl = daily.alias("dl")
    joined = s.join(
        dl,
        (F.col("s.p") == F.col("dl.p")) & (F.col("s.d") == F.col("dl.d")),
        "left",
    )
    wb = (
        Window.partitionBy(F.col("s.p"))
        .orderBy(F.col("s.d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # The next-observation fill is a RUNNING last() over DESCENDING day —
    # never a currentRow..unboundedFollowing frame, which Spark executes
    # as a per-row rescan of the partition remainder (O(partition²); the
    # nearest-asof operator hit this as a measured hang at sf1).
    wf = (
        Window.partitionBy(F.col("s.p"))
        .orderBy(F.col("s.d").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g = joined.select(
        F.col("s.p").alias("p"),
        F.col("s.d").alias("d"),
        F.col("dl.n").alias("n"),
        F.last(F.col("dl.n"), ignorenulls=True).over(wb).alias("pn"),
        F.last(F.col("dl.d"), ignorenulls=True).over(wb).alias("pd"),
        F.last(F.col("dl.n"), ignorenulls=True).over(wf).alias("nn"),
        F.last(F.col("dl.d"), ignorenulls=True).over(wf).alias("nd"),
    )
    interp = F.when(F.col("n").isNotNull(), F.col("n") * 1000).when(
        F.col("pn").isNotNull() & F.col("nn").isNotNull(),
        F.expr(
            "(pn * datediff(nd, d) + nn * datediff(d, pd)) * 1000"
            " DIV datediff(nd, pd)"
        ),
    )
    return g.select(
        F.col("p").alias("o_orderpriority"),
        F.col("d").alias("day"),
        F.col("n").isNotNull().alias("observed"),
        F.col("n").alias("n_obs"),
        interp.alias("interp_milli"),
    )


@register(
    "events_interval_coverage",
    oracle="""
WITH iv AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT) + 1800 AS e
  FROM events
), flagged AS (
  SELECT user_id, s, e,
         CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   IS NULL
              OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS ni,
         event_id
  FROM iv
), isl AS (
  SELECT user_id, s, e,
         SUM(ni) OVER (PARTITION BY user_id ORDER BY s, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM flagged
), per_island AS (
  SELECT user_id, island, MAX(e) - MIN(s) AS len, COUNT(*) AS n
  FROM isl GROUP BY 1, 2
)
SELECT user_id,
       CAST(SUM(len) AS BIGINT) AS covered_len,
       COUNT(*) AS n_islands,
       CAST(SUM(n) AS BIGINT) AS n_intervals
FROM per_island
GROUP BY 1
""",
    doc="Interval-union coverage per user: each event opens a 30-minute "
    "activity interval; overlaps merge (sweep via running-max window) "
    "and the answer is the union's total seconds + maximal-island count "
    "— 'how long was the user actually active', the quantity naive "
    "SUM(duration) double-counts. operators.temporal.interval_union_"
    "length: two windows + two aggregates over ONE sort shuffle on the "
    "user key; all integer epoch arithmetic (timestampdiff on NTZ = "
    "wall-clock seconds = DuckDB epoch()).",
    tags=("temporal", "events", "window"),
    bench=True,
)
def events_interval_coverage(spark: SparkSession, sf_dir: str):
    from ..operators.temporal import interval_union_length

    e = t(spark, sf_dir, "events")
    # NTZ literal — a plain TIMESTAMP literal is LTZ and coercing the NTZ
    # event column to it would shift by the session timezone.
    s = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    iv = e.select(
        "user_id",
        "event_id",
        s.alias("s"),
        (s + F.lit(1800)).alias("e"),
    )
    return interval_union_length(
        iv, by=["user_id"], start_col="s", end_col="e",
        order_tiebreak=["event_id"],
    )


@register(
    "attribution_last_touch",
    oracle="""
WITH clicks AS (
  SELECT user_id, ts, MAX(event_id) AS click_id
  FROM events WHERE event_type = 'click'
  GROUP BY user_id, ts
), purch AS (
  SELECT event_id AS purchase_id, user_id, ts
  FROM events WHERE event_type = 'purchase'
), nearest AS (
  SELECT p.purchase_id, p.user_id, p.ts,
         (SELECT MAX(c.ts) FROM clicks c
          WHERE c.user_id = p.user_id AND c.ts <= p.ts) AS click_ts
  FROM purch p
)
SELECT n.purchase_id, n.user_id,
       CASE WHEN n.click_ts IS NOT NULL
                 AND n.click_ts >= n.ts - INTERVAL 2 HOUR
            THEN c.click_id END AS click_id,
       n.click_ts IS NOT NULL AND n.click_ts >= n.ts - INTERVAL 2 HOUR
         AS attributed
FROM nearest n
LEFT JOIN clicks c ON c.user_id = n.user_id AND c.ts = n.click_ts
""",
    doc="Last-touch attribution: every purchase attributed to the user's "
    "most recent click within a 2-hour lookback — the marketing-"
    "attribution shape, built by COMPOSING operators.temporal.asof_join "
    "(backward direction + interval tolerance) rather than a bespoke "
    "plan: clicks pre-deduped per (user, ts) with max event_id so "
    "same-timestamp ties are deterministic on both engines. One sort "
    "shuffle on the user key (the as-of union trick); no inequality "
    "join. Oracle: correlated MAX subquery + equi-join re-lookup — a "
    "different algorithm that must agree.",
    tags=("temporal", "asof", "events"),
)
def attribution_last_touch(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    out = asof_join(
        purch,
        clicks,
        left_time="ts",
        right_time="ts",
        by=["user_id"],
        right_cols=["click_id"],
        tolerance="2 hours",
    )
    return out.select(
        "purchase_id",
        "user_id",
        "click_id",
        F.col("click_id").isNotNull().alias("attributed"),
    )


@register(
    "pit_join_scd2",
    oracle="""
WITH dim AS (
  SELECT c_custkey AS custkey, c_mktsegment AS segment,
         DATE '1994-01-01' AS valid_from,
         CASE WHEN c_custkey % 3 = 0 THEN DATE '1996-07-01' END AS valid_to
  FROM customer
  UNION ALL
  SELECT c_custkey, 'MOVED', DATE '1996-07-01', CAST(NULL AS DATE)
  FROM customer WHERE c_custkey % 3 = 0
)
SELECT o.o_orderkey, o.o_custkey, CAST(o.o_orderdate AS DATE) AS od,
       d.segment
FROM orders o LEFT JOIN dim d
  ON d.custkey = o.o_custkey
 AND d.valid_from <= CAST(o.o_orderdate AS DATE)
 AND (d.valid_to IS NULL OR CAST(o.o_orderdate AS DATE) < d.valid_to)
""",
    doc="Point-in-time-correct SCD2 join — THE feature-store primitive: "
    "each order picks the dimension version valid AT ITS OWN DATE "
    "(never the current one — that's label leakage in a training set). "
    "Engine: backward as-of join on valid_from per customer (one sort "
    "shuffle, no inequality join) + a valid_to check that nulls out "
    "matches falling in a validity gap (orders before the first "
    "version exercise it). Oracle: plain interval inequality LEFT join "
    "— a different algorithm that must agree row-for-row. Dim: two "
    "synthetic versions (every 3rd customer re-segmented 1996-07-01), "
    "same construction style as scd2_customer_segments.",
    tags=("join", "asof", "temporal", "scd2"),
)
def pit_join_scd2(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    v1 = c.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("1994-01-01").cast("date").alias("valid_from"),
        F.when(
            F.col("c_custkey") % 3 == 0, F.lit("1996-07-01").cast("date")
        ).alias("valid_to"),
    )
    v2 = (
        c.filter(F.col("c_custkey") % 3 == 0)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.lit("MOVED").alias("segment"),
            F.lit("1996-07-01").cast("date").alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
        )
    )
    dim = v1.unionByName(v2)
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey"),
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").cast("date").alias("od"),
    )
    out = asof_join(
        o,
        dim,
        left_time="od",
        right_time="valid_from",
        by=["custkey"],
        right_cols=["segment", "valid_to"],
    )
    valid = F.col("valid_to").isNull() | (F.col("od") < F.col("valid_to"))
    return out.select(
        "o_orderkey",
        "o_custkey",
        "od",
        F.when(valid, F.col("segment")).alias("segment"),
    )


@register(
    "orders_weekday_seasonality",
    oracle="""
WITH d AS (
  SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) % 7 AS weekday_no,
         CAST(floor(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT) AS cents
  FROM orders
), per_day AS (
  SELECT weekday_no, COUNT(*) AS n_orders,
         CAST(SUM(cents) AS BIGINT) AS sum_cents
  FROM d GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n_orders) AS BIGINT) AS n_total,
         CAST(SUM(sum_cents) AS BIGINT) AS cents_total
  FROM per_day
)
SELECT weekday_no, n_orders, sum_cents,
       ((sum_cents * 1000) // n_orders) AS mean_millicents,
       ((((sum_cents * 1000) // n_orders) * 1000)
        // ((cents_total * 1000) // n_total)) AS seasonal_index_milli
FROM per_day, tot
""",
    doc="Weekly seasonality profile: revenue-per-order by day-of-week as a "
    "seasonal index (day mean / overall mean, integer milli-units). The "
    "weekday is epoch-day mod 7 — pure integer arithmetic, no calendar "
    "function, so the bucketing is identical on any engine and timezone "
    "(DuckDB's dayofweek is Sunday=0 while Spark's is 1-based — the "
    "exact cross-engine trap this sidesteps). Revenue is floored cents "
    "(the same IEEE multiply+floor both sides), so means and the index "
    "are floor-division chains of exact integers: engine-exact, "
    "overflow-bounded (milli-cents means, never cents x total x 1000). "
    "Shape: one map-side-combinable aggregate + a broadcast total — the "
    "seasonal-decomposition input at any scale.",
    tags=("temporal", "agg", "seasonality"),
)
def orders_weekday_seasonality(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    day_no = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
    ).cast("bigint")
    cents = F.floor(F.col("o_totalprice").cast("double") * 100).cast("bigint")
    per_day = (
        o.select((day_no % 7).alias("weekday_no"), cents.alias("cents"))
        .groupBy("weekday_no")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("sum_cents"),
        )
    )
    tot = per_day.agg(
        F.sum("n_orders").cast("bigint").alias("n_total"),
        F.sum("sum_cents").cast("bigint").alias("cents_total"),
    )
    return per_day.crossJoin(F.broadcast(tot)).select(
        "weekday_no",
        "n_orders",
        "sum_cents",
        F.expr("(sum_cents * 1000) div n_orders").alias("mean_millicents"),
        F.expr(
            "(((sum_cents * 1000) div n_orders) * 1000)"
            " div ((cents_total * 1000) div n_total)"
        ).alias("seasonal_index_milli"),
    )


@register(
    "attribution_position_weighted",
    oracle="""
WITH purch AS (
  SELECT event_id AS purchase_id, user_id, ts
  FROM events WHERE event_type = 'purchase'
), touch AS (
  SELECT event_id, user_id, event_type, ts
  FROM events WHERE event_type IN ('click', 'view')
), joined AS (
  SELECT p.purchase_id, t.event_id, t.event_type, t.ts
  FROM purch p JOIN touch t
    ON t.user_id = p.user_id
   AND t.ts >= p.ts - INTERVAL 2 HOUR AND t.ts < p.ts
), ranked AS (
  SELECT purchase_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY purchase_id
                            ORDER BY ts, event_id) AS pos,
         ROW_NUMBER() OVER (PARTITION BY purchase_id
                            ORDER BY ts DESC, event_id DESC) AS rev,
         COUNT(*) OVER (PARTITION BY purchase_id) AS n
  FROM joined
), credited AS (
  SELECT event_type,
         CASE WHEN n = 1 THEN 1000
              WHEN n = 2 THEN 500
              WHEN pos = 1 THEN 400
              WHEN rev = 1 THEN 400
              ELSE 200 // (n - 2) END AS credit_milli
  FROM ranked
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(credit_milli) AS BIGINT) AS credit_milli_total
FROM credited GROUP BY 1
""",
    doc="Position-weighted (U-shaped) multi-touch attribution: every "
    "purchase credits the user's click/view touches in its 2-hour "
    "lookback 40/20/40 — first touch 400 permille, last 400, the "
    "middle 200 split evenly (truncating integer division keeps both "
    "engines bit-identical; 1-touch paths get 1000, 2-touch 500/500). "
    "Complements attribution_last_touch (winner-take-all) with the "
    "multi-touch shape marketing analytics actually reports. Engine: "
    "the purchase-touch pairing is an EQUI-join on user_id with the "
    "time window as a join filter — per-user fanout, never an "
    "inequality-only nested loop — then per-purchase position ranks "
    "(two row_numbers + count over the purchase partition) and one "
    "final aggregate. Tie-safe: (ts, event_id) totally orders "
    "touches on both engines.",
    tags=("temporal", "events", "attribution", "window"),
)
def attribution_position_weighted(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    purch = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    touch = e.filter(F.col("event_type").isin("click", "view")).select(
        "event_id", "user_id", "event_type", "ts"
    )
    joined = purch.join(
        touch,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("ts") >= F.col("p_ts") - F.expr("INTERVAL 2 HOURS"))
        & (F.col("ts") < F.col("p_ts")),
    ).select("purchase_id", "event_id", "event_type", "ts")
    fwd = Window.partitionBy("purchase_id").orderBy("ts", "event_id")
    bwd = Window.partitionBy("purchase_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = joined.select(
        "event_type",
        F.row_number().over(fwd).alias("pos"),
        F.row_number().over(bwd).alias("rev"),
        F.count(F.lit(1)).over(Window.partitionBy("purchase_id")).alias("n"),
    )
    credited = ranked.select(
        "event_type",
        F.when(F.col("n") == 1, 1000)
        .when(F.col("n") == 2, 500)
        .when(F.col("pos") == 1, 400)
        .when(F.col("rev") == 1, 400)
        .otherwise(F.expr("200 DIV (n - 2)"))
        .alias("credit_milli"),
    )
    return credited.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum("credit_milli").cast("bigint").alias("credit_milli_total"),
    )


@register(
    "bitemporal_asof_audit",
    oracle="""
WITH versions AS (
  -- valid-time v1 for every customer, recorded at tx day 0
  SELECT c_custkey AS custkey, c_mktsegment AS segment,
         DATE '1994-01-01' AS valid_from,
         DATE '1995-01-01' AS tx_from
  FROM customer
  UNION ALL
  -- every 3rd customer moves segment, effective RETROACTIVELY from
  -- 1994-07-01 but only RECORDED on 1996-01-01 (a late correction)
  SELECT c_custkey, 'MOVED', DATE '1994-07-01', DATE '1996-01-01'
  FROM customer WHERE c_custkey % 3 = 0
), pick AS (
  SELECT o.o_orderkey, o.o_custkey,
         CAST(o.o_orderdate AS DATE) AS od, v.segment, v.tx_from,
         row_number() OVER (
           PARTITION BY o.o_orderkey
           ORDER BY v.valid_from DESC, v.tx_from DESC
         ) AS rn
  FROM orders o JOIN versions v
    ON v.custkey = o.o_custkey
   AND v.valid_from <= CAST(o.o_orderdate AS DATE)
   AND v.tx_from <= DATE '1995-06-01'   -- what the DB knew on audit day
)
SELECT o_orderkey, o_custkey, od, segment AS segment_as_known
FROM pick WHERE rn = 1
""",
    doc="BITEMPORAL as-of audit — the reproducibility primitive "
    "pit_join_scd2 can't express: pick the dimension version that was "
    "(a) effective AT THE ORDER'S OWN DATE (valid time) and (b) KNOWN "
    "to the warehouse on the audit date (transaction time), so the "
    "query reproduces what any past report actually said even after "
    "retroactive corrections land. The synthetic history plants "
    "exactly that trap: a segment change effective 1994-07-01 but "
    "recorded 1996-01-01 — an audit as-of 1995-06-01 must IGNORE it "
    "(the correction wasn't known yet) although it is valid-time "
    "applicable; dropping the tx filter silently rewrites history. "
    "Engine shape: the tx filter prunes versions BEFORE the per-order "
    "latest-version rank (one window over order-keyed joins, "
    "dimension side broadcastable); both axes are plain date "
    "comparisons — timezone-proof.",
    tags=("temporal", "asof", "scd2", "bitemporal", "audit"),
)
def bitemporal_asof_audit(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    c = t(spark, sf_dir, "customer")
    v1 = c.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("1994-01-01").cast("date").alias("valid_from"),
        F.lit("1995-01-01").cast("date").alias("tx_from"),
    )
    v2 = c.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("custkey"),
        F.lit("MOVED").alias("segment"),
        F.lit("1994-07-01").cast("date").alias("valid_from"),
        F.lit("1996-01-01").cast("date").alias("tx_from"),
    )
    versions = v1.unionByName(v2)
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").cast("date").alias("od")
    )
    joined = o.join(
        versions,
        (F.col("custkey") == F.col("o_custkey"))
        & (F.col("valid_from") <= F.col("od"))
        & (F.col("tx_from") <= F.lit("1995-06-01").cast("date")),
    )
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("valid_from").desc(), F.col("tx_from").desc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderkey", "o_custkey", "od",
            F.col("segment").alias("segment_as_known"),
        )
    )


@register(
    "order_to_ship_percentiles",
    oracle="""
WITH stages AS (
  SELECT o.o_orderpriority AS priority,
         CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                        CAST(l.l_shipdate AS DATE)) AS BIGINT) AS d_ship
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY d_ship) AS BIGINT)
         AS p50_days,
       CAST(PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY d_ship) AS BIGINT)
         AS p90_days,
       CAST(PERCENTILE_DISC(0.99) WITHIN GROUP (ORDER BY d_ship) AS BIGINT)
         AS p99_days,
       MAX(d_ship) AS max_days
FROM stages GROUP BY 1
""",
    doc="Order-to-ship latency percentiles per priority — the SLA "
    "tail report: exact PERCENTILE_DISC p50/p90/p99 plus max of the "
    "day gap between order placement and line shipment, split by "
    "order priority so 'does URGENT actually ship faster, and at "
    "which tail does it stop mattering' is answerable in one scan. "
    "Co-keyed join + one percentile aggregate per priority; exact "
    "element-selection percentiles (no interpolation arithmetic), "
    "integer day math, timezone-proof.",
    tags=("temporal", "warehouse", "percentile", "agg", "sla"),
)
def order_to_ship_percentiles(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    stages = li.join(o, F.col("o_orderkey") == F.col("l_orderkey")).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).cast("bigint").alias("d_ship"),
    )
    pd_ = lambda p: F.expr(
        f"percentile_disc({p}) WITHIN GROUP (ORDER BY d_ship)"
    ).cast("bigint")
    return stages.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        pd_(0.5).alias("p50_days"),
        pd_(0.9).alias("p90_days"),
        pd_(0.99).alias("p99_days"),
        F.max("d_ship").alias("max_days"),
    )
