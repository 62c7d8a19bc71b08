"""Window-frame and result-shaping operators: explicit ROWS frames,
distribution functions (ntile / percent_rank / cume_dist), full-partition
frames (last_value), GROUPING SETS, PIVOT, and exact median.

Completes the window family started in analytics_ops (lag) and parity
(rank / row_number): those cover ranking; these cover running frames and
value distribution — the other half of what warehouse users write daily.

Determinism: every window here is ordered by a TOTAL order (date +
unique key tiebreak), so frame contents are identical on both engines;
running sums go through the exact-decimal idiom; ntile/percent_rank/
cume_dist are integer-arithmetic over ranks (+ one IEEE division) and
bit-stable given a total order. Exact median interpolates the two middle
values with a single (a+b)/2 — deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import decimal_sum
from .registry import register
from .util import t


@register(
    "window_running_frame",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_spend,
       CAST(NTILE(4) OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey) AS INTEGER)
         AS spend_quartile,
       PERCENT_RANK() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS pct_rank,
       CUME_DIST() OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey) AS cume,
       LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND UNBOUNDED FOLLOWING)
         AS latest_orderkey
FROM orders
""",
    doc="Explicit window frames: per-customer running spend (ROWS "
    "UNBOUNDED PRECEDING frame, exact-decimal sum), quartile ntile, "
    "percent_rank / cume_dist, and a full-partition last_value. One "
    "shuffle on o_custkey serves all five windows (same partition + "
    "order), which Spark collapses into a single Window node.",
    tags=("window", "frame"),
)
def window_running_frame(spark: SparkSession, sf_dir: str):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(running)
        .cast("double")
        .alias("running_spend"),
        F.ntile(4).over(w).alias("spend_quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.last("o_orderkey").over(full).alias("latest_orderkey"),
    )


@register(
    "grouping_sets_region_status",
    oracle="""
SELECT r.r_name AS region_name, o.o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
         AS total_price
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY GROUPING SETS ((r.r_name), (o.o_orderstatus), ())
""",
    doc="Explicit GROUPING SETS — region totals, status totals, and the "
    "grand total in ONE aggregate, without the cross-combinations CUBE "
    "would add. Spark expands the sets map-side (each input row emits "
    "one partial per set), so a single shuffle carries all three "
    "levels. Completes the multi-level family: ROLLUP "
    "(rollup_region_nation) / CUBE (cube_status_priority) / GROUPING "
    "SETS.",
    tags=("agg", "grouping-sets"),
)
def grouping_sets_region_status(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        # Rename BEFORE grouping: groupingSets matches grouping columns by
        # expression identity, so an .alias() inside the set list would not
        # be recognized as the same column and the set silently groups by
        # nothing (all-NULL output).
        .withColumnRenamed("r_name", "region_name")
    )
    return joined.groupingSets(
        [["region_name"], ["o_orderstatus"], []], "region_name", "o_orderstatus"
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        decimal_sum("o_totalprice", alias="total_price"),
    )


@register(
    "pivot_status_by_segment",
    oracle="""
SELECT c.c_mktsegment,
       COUNT(*) FILTER (WHERE o.o_orderstatus = 'F') AS F,
       COUNT(*) FILTER (WHERE o.o_orderstatus = 'O') AS O,
       COUNT(*) FILTER (WHERE o.o_orderstatus = 'P') AS P,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6)))
              FILTER (WHERE o.o_orderstatus = 'F') AS DOUBLE) AS F_price,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6)))
              FILTER (WHERE o.o_orderstatus = 'O') AS DOUBLE) AS O_price,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6)))
              FILTER (WHERE o.o_orderstatus = 'P') AS DOUBLE) AS P_price
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY 1
""",
    doc="PIVOT: order status becomes columns per market segment (counts + "
    "exact-decimal totals). The pivot value list is PINNED ('F','O','P') "
    "— never inferred — so the output schema is stable and the plan "
    "needs no extra distinct-values job; equivalent to DuckDB FILTER "
    "aggregates. Spark evaluates pinned pivots as conditional aggregates "
    "in one pass (no per-value scans).",
    tags=("agg", "pivot"),
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    piv = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("price"),
        )
    )
    # Spark names pivot output "<value>_<aggalias>"; align to the oracle's
    # FILTER-aggregate names (counts keep the bare status letter).
    return piv.select(
        "c_mktsegment",
        F.col("F_n").alias("F"),
        F.col("O_n").alias("O"),
        F.col("P_n").alias("P"),
        "F_price",
        "O_price",
        "P_price",
    )


@register(
    "median_price_by_status",
    oracle="""
SELECT o_orderstatus,
       MEDIAN(o_totalprice) AS median_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY 1
""",
    doc="Exact MEDIAN per group (sort-based percentile-0.5, interpolating "
    "the two middle values with one (a+b)/2 — deterministic on both "
    "engines since the inputs are identical doubles). Spark's exact "
    "median materializes each group's values — fine for bounded group "
    "counts like a status column; at unbounded cardinality use "
    "approx_percentile (documented trade-off, not gated here because "
    "sketches are engine-specific).",
    tags=("agg", "percentile"),
)
def median_price_by_status(spark: SparkSession, sf_dir: str):
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.median("o_totalprice").alias("median_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "window_navigation",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice,
       first_value(o_totalprice) OVER w AS cheapest_so_far,
       nth_value(o_totalprice, 2) OVER w AS second_cheapest_so_far,
       lead(o_totalprice, 2, -1.0) OVER
         (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
         AS price_after_next,
       lag(o_totalprice, 2, -1.0) OVER
         (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
         AS price_before_prev
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    doc="Window navigation family: first_value / nth_value over a running "
    "frame, lead/lag with offset 2 and a non-null DEFAULT (the corner "
    "where engines differ on default typing). Full (price, key) "
    "tiebreak makes every navigation deterministic; all four share one "
    "sort shuffle. nth_value returns NULL until the frame holds 2 rows "
    "— identical in both engines.",
    tags=("window", "navigation"),
)
def window_navigation(spark: SparkSession, sf_dir: str):
    base = Window.partitionBy("o_orderstatus").orderBy(
        "o_totalprice", "o_orderkey"
    )
    run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.first("o_totalprice").over(run).alias("cheapest_so_far"),
        F.nth_value("o_totalprice", 2).over(run).alias(
            "second_cheapest_so_far"
        ),
        F.lead("o_totalprice", 2, -1.0).over(base).alias("price_after_next"),
        F.lag("o_totalprice", 2, -1.0).over(base).alias("price_before_prev"),
    )


@register(
    "window_rolling_7day",
    oracle="""
WITH daily AS (
  SELECT o_orderpriority,
         CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) AS day_no,
         COUNT(*) AS n_orders,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR)
              AS DOUBLE) AS revenue
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, day_no, n_orders, revenue,
       CAST(SUM(n_orders) OVER w AS BIGINT) AS orders_7d,
       COUNT(*) OVER w AS active_days_7d
FROM daily
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY day_no
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
    doc="Time-based rolling 7-day window via a RANGE frame: per priority, "
    "orders in the trailing week of each active day. RANGE frames bound "
    "by VALUE distance (missing days still shrink the window — a ROWS "
    "frame would wrongly span gaps), expressed on integer day numbers "
    "so the frame arithmetic is exact and identical in both engines "
    "(Spark's rangeBetween takes numeric offsets; interval-typed RANGE "
    "is SQL-syntax sugar over the same thing). Completes the frame "
    "family: ROWS (window_running_frame), GROUPS-like dedup windows, "
    "and now value-RANGE. The rolling sum is over per-day integer "
    "counts — no float accumulation in the frame.",
    tags=("window", "frames", "temporal"),
)
def window_rolling_7day(spark: SparkSession, sf_dir: str):
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(
            "o_orderpriority",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1992-01-01").cast("date"),
            )
            .cast("bigint")
            .alias("day_no"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("string")
            .cast("double")
            .alias("revenue"),
        )
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day_no")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "o_orderpriority",
        "day_no",
        "n_orders",
        "revenue",
        F.sum("n_orders").over(w).alias("orders_7d"),
        F.count(F.lit(1)).over(w).alias("active_days_7d"),
    )
