"""Analytic-surface extensions beyond the reference: grouping sets
(rollup/cube), lag/lead analytics, and intersect/except set operations.

The reference has none of these (SURVEY.md §2.4 "Not present", §2.7); they
are one-liners in Spark and complete the engine's OLAP surface. All gated:
rollup/cube NULL subtotal markers, window tiebreaks, and set-op NULL
semantics are identical in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import decimal_sum
from .registry import register
from .util import t


@register(
    "rollup_region_nation",
    oracle="""
SELECT r.r_name AS region_name, n.n_name AS nation_name,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_acctbal
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
    doc="ROLLUP (region, nation): per-nation rows + per-region subtotals + "
    "grand total in one pass. Spark expands grouping sets map-side, so the "
    "shuffle carries each partial once per grouping set — no extra scan "
    "per level.",
    tags=("agg", "rollup"),
)
def rollup_region_nation(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return (
        joined.rollup(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            decimal_sum("c_acctbal", alias="total_acctbal"),
        )
    )


@register(
    "cube_status_priority",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    doc="CUBE (status, priority): all four grouping sets in one aggregate.",
    tags=("agg", "cube"),
)
def cube_status_priority(spark: SparkSession, sf_dir: str):
    return (
        t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            decimal_sum("o_totalprice", alias="total_price"),
        )
    )


@register(
    "lag_order_gaps",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(date_diff('day',
            lag(o_orderdate) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey),
            o_orderdate) AS INT) AS days_since_prev
FROM orders
""",
    doc="lag() analytics: per-customer days since previous order "
    "(tiebreak on order key for determinism). First order per customer "
    "yields NULL, matching SQL lag semantics.",
    tags=("window", "lag"),
)
def lag_order_gaps(spark: SparkSession, sf_dir: str):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).cast("int").alias("days_since_prev"),
    )


@register(
    "intersect_except_segments",
    oracle="""
WITH b AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
big AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000),
both_ AS (SELECT c_custkey FROM b INTERSECT SELECT c_custkey FROM big),
only_b AS (SELECT c_custkey FROM b EXCEPT SELECT c_custkey FROM big)
SELECT 'both' AS bucket, c_custkey FROM both_
UNION ALL
SELECT 'building_only' AS bucket, c_custkey FROM only_b
""",
    doc="INTERSECT / EXCEPT: BUILDING-segment customers split by whether "
    "they placed a >100k order. Spark intersect()/exceptAll() lower to "
    "left-semi/left-anti aggregates — no full sort.",
    tags=("setop",),
)
def intersect_except_segments(spark: SparkSession, sf_dir: str):
    b = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    big = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    both = b.intersect(big).select(F.lit("both").alias("bucket"), "c_custkey")
    only_b = b.exceptAll(big).distinct().select(
        F.lit("building_only").alias("bucket"), "c_custkey"
    )
    return both.unionByName(only_b)


@register(
    "salted_join_revenue",
    oracle="""
SELECT o.o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
""",
    doc="Skew-safe join: lineitem->orders through operators.skew.salted_join "
    "(deterministic salt splits hot keys across partitions; compact side "
    "replicated salt x). Result is row-identical to the plain join — the "
    "oracle IS the plain join.",
    tags=("join", "skew"),
)
def salted_join_revenue(spark: SparkSession, sf_dir: str):
    from ..operators.skew import salted_join

    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"), "l_extendedprice"
    )
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("orderkey"), "o_orderpriority"
    )
    return (
        salted_join(li, o, ["orderkey"], "inner", salt=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            decimal_sum("l_extendedprice", alias="revenue"),
        )
    )
