"""Kimball warehouse-modeling patterns beyond the reference's plain star:
accumulating-snapshot facts and many-to-many allocation bridges.

The reference's fact table is a transaction fact
(/root/reference/step_5_curated_to_consumption.py:460-591); these are the
two other canonical fact shapes a consumer migrating a real warehouse
asks for next.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .registry import register
from .util import t


@register(
    "fact_accumulating_snapshot",
    oracle="""
SELECT o.o_orderkey, o.o_orderstatus,
       CAST(o.o_orderdate AS DATE) AS order_date,
       CAST(MIN(l.l_shipdate) AS DATE) AS first_ship_date,
       CAST(MAX(l.l_shipdate) AS DATE) AS last_ship_date,
       COUNT(*) AS n_items,
       CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                      CAST(MIN(l.l_shipdate) AS DATE)) AS INT)
         AS days_to_first_ship,
       CAST(date_diff('day', CAST(MIN(l.l_shipdate) AS DATE),
                      CAST(MAX(l.l_shipdate) AS DATE)) AS INT)
         AS ship_span_days
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2, 3
""",
    doc="Accumulating-snapshot fact: one row per order tracking its "
    "lifecycle milestones (order date, first/last ship) and the lag "
    "measures between them — the Kimball pattern for processes with "
    "defined stages, complementing the reference's transaction fact. "
    "Milestones are MIN/MAX over the co-keyed lineitem join (one "
    "shuffle); lags are integer day diffs. Rebuild-from-scratch is "
    "idempotent by construction; the incremental refresh path is "
    "rollup_incremental_merge's partial-merge algebra on the same "
    "aggregates.",
    tags=("warehouse", "fact", "agg"),
)
def fact_accumulating_snapshot(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    first_ship = F.min(F.col("l_shipdate").cast("date"))
    last_ship = F.max(F.col("l_shipdate").cast("date"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "o_orderkey",
            "o_orderstatus",
            F.col("o_orderdate").cast("date").alias("order_date"),
        )
        .agg(
            first_ship.alias("first_ship_date"),
            last_ship.alias("last_ship_date"),
            F.count(F.lit(1)).alias("n_items"),
            F.datediff(first_ship, F.min(F.col("o_orderdate").cast("date")))
            .cast("int")
            .alias("days_to_first_ship"),
            F.datediff(last_ship, first_ship)
            .cast("int")
            .alias("ship_span_days"),
        )
    )


@register(
    "bridge_allocation_weights",
    oracle="""
WITH counts AS (
  SELECT l_orderkey, COUNT(*) AS n_items,
         SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS order_rev_dec
  FROM lineitem GROUP BY 1
)
SELECT l.l_orderkey, l.l_linenumber, l.l_partkey,
       c.n_items,
       CAST(1 AS DOUBLE) / c.n_items AS alloc_weight,
       l.l_extendedprice
         / CAST(CAST(c.order_rev_dec AS VARCHAR) AS DOUBLE) AS revenue_share
FROM lineitem l JOIN counts c ON c.l_orderkey = l.l_orderkey
""",
    doc="Many-to-many allocation bridge: each order–part row carries an "
    "equal-split allocation weight (1/n_items, one exact-input IEEE "
    "division) and a value-proportional revenue share (line price over "
    "the exact-decimal order total, string-routed) — the bridge-table "
    "weights that let a star schema aggregate order-grain measures "
    "through a many-to-many relationship without double counting "
    "(weights per order sum to 1). One co-keyed aggregate broadcast "
    "back onto the line scan.",
    tags=("warehouse", "bridge", "join"),
)
def bridge_allocation_weights(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).alias(
            "order_rev_dec"
        ),
    )
    return li.join(counts, "l_orderkey").select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "n_items",
        (F.lit(1.0) / F.col("n_items")).alias("alloc_weight"),
        (
            F.col("l_extendedprice")
            / F.col("order_rev_dec").cast("string").cast("double")
        ).alias("revenue_share"),
    )
