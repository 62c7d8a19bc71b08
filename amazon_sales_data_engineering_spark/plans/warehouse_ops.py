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


@register(
    "dim_inferred_members",
    oracle="""
WITH dim AS (
  SELECT c_custkey, c_name, c_mktsegment
  FROM customer WHERE c_custkey % 17 <> 0
), missing AS (
  SELECT DISTINCT o.o_custkey AS c_custkey
  FROM orders o LEFT JOIN dim d ON d.c_custkey = o.o_custkey
  WHERE d.c_custkey IS NULL
)
SELECT c_custkey, c_name, c_mktsegment, FALSE AS is_inferred FROM dim
UNION ALL
SELECT c_custkey, 'UNKNOWN' AS c_name, 'UNKNOWN' AS c_mktsegment,
       TRUE AS is_inferred
FROM missing
""",
    doc="Late-arriving dimension handling: facts referencing keys absent "
    "from the dimension (every 17th customer withheld to simulate a "
    "late feed) get INFERRED members — placeholder rows flagged "
    "is_inferred, inserted so fact loads never drop or orphan rows; "
    "when the real dimension row arrives, the SCD2 machinery "
    "(scd2_customer_segments) closes the placeholder. Distinct-missing "
    "via one anti join; the union is narrow. The third piece of the "
    "dim-maintenance triad: delta loads (left_anti_new_dims), SCD2 "
    "history, inferred members.",
    tags=("warehouse", "dim", "join"),
)
def dim_inferred_members(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    dim = c.filter(F.col("c_custkey") % 17 != 0).select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    missing = (
        o.select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .join(dim.select("c_custkey"), "c_custkey", "left_anti")
    )
    return dim.withColumn("is_inferred", F.lit(False)).unionByName(
        missing.select(
            "c_custkey",
            F.lit("UNKNOWN").alias("c_name"),
            F.lit("UNKNOWN").alias("c_mktsegment"),
            F.lit(True).alias("is_inferred"),
        )
    )


@register(
    "percent_of_parent_hierarchy",
    oracle="""
WITH nat AS (
  SELECT r.r_name AS region_name, n.n_name AS nation_name,
         SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS bal_dec
  FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY 1, 2
), reg AS (
  SELECT region_name, SUM(bal_dec) AS reg_dec FROM nat GROUP BY 1
), tot AS (SELECT SUM(bal_dec) AS tot_dec FROM nat)
SELECT n.region_name, n.nation_name,
       CAST(CAST(n.bal_dec AS VARCHAR) AS DOUBLE) AS balance,
       CAST(CAST(n.bal_dec AS VARCHAR) AS DOUBLE)
         / CAST(CAST(r.reg_dec AS VARCHAR) AS DOUBLE) AS pct_of_region,
       CAST(CAST(r.reg_dec AS VARCHAR) AS DOUBLE)
         / CAST(CAST(t.tot_dec AS VARCHAR) AS DOUBLE) AS region_pct_of_total
FROM nat n
JOIN reg r ON r.region_name = n.region_name
CROSS JOIN tot t
""",
    doc="Percent-of-parent along the region → nation hierarchy: each "
    "nation's share of its region and each region's share of the total, "
    "from ONE leaf-level decimal aggregate re-aggregated upward (exact "
    "and associative, so parent totals are bit-identical to direct "
    "computation); shares leave via the string route and one IEEE "
    "division each. The drill-down companion to rollup_region_nation's "
    "subtotals.",
    tags=("agg", "reporting", "hierarchy"),
)
def percent_of_parent_hierarchy(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    nat = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).alias("bal_dec")
        )
    )
    reg = nat.groupBy("region_name").agg(F.sum("bal_dec").alias("reg_dec"))
    tot = nat.agg(F.sum("bal_dec").alias("tot_dec"))
    s = lambda col: F.col(col).cast("string").cast("double")  # noqa: E731
    return (
        nat.join(F.broadcast(reg), "region_name")
        .crossJoin(F.broadcast(tot))
        .select(
            "region_name",
            "nation_name",
            s("bal_dec").alias("balance"),
            (s("bal_dec") / s("reg_dec")).alias("pct_of_region"),
            (s("reg_dec") / s("tot_dec")).alias("region_pct_of_total"),
        )
    )


@register(
    "orders_open_backlog",
    oracle="""
WITH close AS (
  SELECT l_orderkey, MAX(l_shipdate) AS close_ts
  FROM lineitem GROUP BY 1
), spans AS (
  SELECT CAST(o.o_orderdate AS DATE) AS open_d,
         CAST(COALESCE(c.close_ts, o.o_orderdate) AS DATE) + 1 AS close_d
  FROM orders o LEFT JOIN close c ON c.l_orderkey = o.o_orderkey
), ev AS (
  SELECT open_d AS d, 1 AS delta FROM spans
  UNION ALL
  SELECT close_d AS d, -1 AS delta FROM spans
), daily AS (
  SELECT d, CAST(SUM(delta) AS BIGINT) AS net FROM ev GROUP BY 1
)
SELECT d, net, CAST(SUM(net) OVER (ORDER BY d) AS BIGINT) AS n_open
FROM daily
""",
    doc="Open-order backlog time series (the census / concurrent-intervals "
    "problem): each order is open from o_orderdate until its last "
    "l_shipdate; the daily open count is the running sum of +1/-1 "
    "boundary events. The naive formulation is a GLOBAL running window "
    "— a single-partition sort at scale — so the Spark plan first "
    "collapses events to per-day nets (bounded by the calendar, "
    "map-side combinable) and then runs operators.prefixsum."
    "distributed_cumsum: percentile-fenced range buckets, per-bucket "
    "local windows, and a broadcast offset join — bit-identical to the "
    "global window (proven by this gate: the oracle IS the global "
    "window) with parallelism n_buckets instead of 1. Integer deltas "
    "end-to-end.",
    tags=("warehouse", "temporal", "prefixsum", "window"),
)
def orders_open_backlog(spark: SparkSession, sf_dir: str):
    from ..operators.prefixsum import distributed_cumsum

    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    close = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("close_ts"))
    spans = o.join(close, o.o_orderkey == close.l_orderkey, "left").select(
        F.col("o_orderdate").cast("date").alias("open_d"),
        F.date_add(
            F.coalesce(F.col("close_ts"), F.col("o_orderdate")).cast("date"), 1
        ).alias("close_d"),
    )
    ev = spans.select(F.col("open_d").alias("d"), F.lit(1).alias("delta")).unionByName(
        spans.select(F.col("close_d").alias("d"), F.lit(-1).alias("delta"))
    )
    daily = ev.groupBy("d").agg(F.sum("delta").cast("bigint").alias("net"))
    # percentile_disc fences need a numeric order key; epoch-day is the
    # same total order as the date itself.
    daily = daily.withColumn(
        "d_num", F.datediff(F.col("d"), F.lit("1970-01-01")).cast("bigint")
    )
    return distributed_cumsum(
        daily, "d_num", "net", tiebreak=[], out_col="cum"
    ).select("d", "net", F.col("cum").cast("bigint").alias("n_open"))


@register(
    "fact_grain_reconcile",
    oracle="""
WITH r AS (
  SELECT l_orderkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,4))
             * (1 + CAST(l_tax AS DECIMAL(18,4)))
             * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS recomputed
  FROM lineitem GROUP BY 1
), diffs AS (
  SELECT o.o_orderkey,
         CAST(abs(CAST(o.o_totalprice AS DECIMAL(28,6)) - r.recomputed)
              * 1000000 AS BIGINT) AS diff_micro,
         CAST(r.recomputed * 1000000 AS BIGINT) AS base_micro
  FROM orders o JOIN r ON r.l_orderkey = o.o_orderkey
), rel AS (
  SELECT (diff_micro * 1000) // base_micro AS dev_permille FROM diffs
  WHERE base_micro > 0
)
SELECT CAST(LEAST(dev_permille // 50, 20) AS BIGINT) AS dev_bucket_50pm,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM rel GROUP BY 1
""",
    doc="Fact-grain reconciliation: every order header's o_totalprice "
    "is recomputed from its OWN line items (sum of extendedprice * "
    "(1+tax) * (1-discount), exact decimal throughout) and the "
    "relative deviation distribution comes back as 50-permille "
    "buckets — the header-vs-detail drift report every warehouse "
    "runs after loads, partial reprocessing, or currency fixes "
    "(table_diff_reconcile compares two TABLES row-hash-wise; this "
    "audits one table against its own declared AGGREGATION GRAIN). "
    "On this synthetic corpus the header totals are deliberately NOT "
    "derived from the lines, so the histogram lands in high-deviation "
    "buckets — the audit measures exactly that, instead of "
    "vacuously reporting zero. Numerics: exact decimal products/sums, "
    "then micro-unit BIGINTs and truncating integer division — no "
    "decimal->double conversions anywhere (the one cross-engine trap "
    "for wide decimals). Two co-keyed aggregates at any scale.",
    tags=("warehouse", "quality", "reconcile", "agg"),
)
def fact_grain_reconcile(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1) + F.col("l_tax").cast("decimal(18,4)"))
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
        ).alias("line_amt"),
    )
    r = li.groupBy("l_orderkey").agg(F.sum("line_amt").alias("recomputed"))
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    diffs = o.join(r, F.col("l_orderkey") == F.col("o_orderkey")).select(
        (
            F.abs(
                F.col("o_totalprice").cast("decimal(28,6)")
                - F.col("recomputed")
            )
            * 1000000
        ).cast("bigint").alias("diff_micro"),
        (F.col("recomputed") * 1000000).cast("bigint").alias("base_micro"),
    )
    rel = diffs.filter(F.col("base_micro") > 0).select(
        F.expr("(diff_micro * 1000) DIV base_micro").alias("dev_permille")
    )
    return rel.groupBy(
        F.least(F.expr("dev_permille DIV 50"), F.lit(20))
        .cast("bigint")
        .alias("dev_bucket_50pm")
    ).agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "parts_slow_movers",
    oracle="""
WITH last_sale AS (
  SELECT l_partkey AS partkey, MAX(l_shipdate) AS last_ship
  FROM lineitem GROUP BY 1
), anchored AS (
  SELECT partkey, last_ship,
         CAST(date_diff('day', CAST(last_ship AS DATE),
              (SELECT CAST(MAX(l_shipdate) AS DATE) FROM lineitem))
              AS BIGINT) AS idle_days
  FROM last_sale
), fence AS (
  SELECT CAST(PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY idle_days)
              AS BIGINT) AS p90
  FROM anchored
)
SELECT a.partkey, CAST(a.last_ship AS DATE) AS last_ship, a.idle_days,
       f.p90 AS idle_p90_days
FROM anchored a, fence f
WHERE a.idle_days > f.p90
""",
    doc="Slow-mover detection: each part's days since last shipment "
    "(anchored to the corpus max ship date, so reruns are "
    "deterministic — never wall-clock now()), flagged when idle time "
    "exceeds the exact p90 fence of the idle distribution — the "
    "inventory-rationalization shortlist (discontinue, discount, "
    "relocate). One part-keyed MAX aggregate, one PERCENTILE_DISC "
    "scalar broadcast back, a map-side filter: the same three-step "
    "shape at any part-catalog size. Integer day arithmetic; "
    "relative (percentile) fencing keeps the query meaningful at "
    "every scale factor where a fixed '90 days idle' would be "
    "vacuous or total.",
    tags=("warehouse", "inventory", "percentile", "agg"),
)
def parts_slow_movers(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_shipdate")
    last_sale = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.max("l_shipdate").alias("last_ship")
    )
    anchor = li.agg(F.max(F.col("l_shipdate").cast("date")).alias("mx"))
    anchored = last_sale.crossJoin(F.broadcast(anchor)).select(
        "partkey", "last_ship",
        F.datediff(F.col("mx"), F.col("last_ship").cast("date"))
        .cast("bigint")
        .alias("idle_days"),
    )
    fence = anchored.agg(
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY idle_days)")
        .cast("bigint")
        .alias("p90")
    )
    return (
        anchored.crossJoin(F.broadcast(fence))
        .filter(F.col("idle_days") > F.col("p90"))
        .select(
            "partkey", F.col("last_ship").cast("date").alias("last_ship"),
            "idle_days", F.col("p90").alias("idle_p90_days"),
        )
    )


@register(
    "order_fanout_profile",
    oracle="""
WITH per_order AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_items
  FROM lineitem GROUP BY 1
)
SELECT n_items, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM per_order GROUP BY 1
""",
    doc="Order fan-out profile: the distribution of line items per "
    "order — the join-cardinality histogram that sizes every "
    "orders-to-lineitem operation in this repo (basket-bounded pair "
    "generation in assoc_rules, the star-join fact grain, skew "
    "decisions): a long tail here is what turns a per-order explode "
    "into a hot task. Two nested integer aggregates, both map-side "
    "combinable; at 100 TB this is the profile you check BEFORE "
    "choosing broadcast vs shuffle strategies, so it earns a "
    "first-class gate next to key_skew_profile (which profiles one "
    "key's frequency; this profiles the group-size distribution).",
    tags=("warehouse", "profile", "skew", "agg"),
)
def order_fanout_profile(spark: SparkSession, sf_dir: str):
    per_order = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )
    return per_order.groupBy("n_items").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "catalog_dead_stock",
    oracle="""
WITH sold AS (
  SELECT DISTINCT l_partkey FROM lineitem
), flagged AS (
  SELECT p.p_brand AS brand,
         CASE WHEN s.l_partkey IS NULL THEN 1 ELSE 0 END AS never_sold
  FROM part p LEFT JOIN sold s ON s.l_partkey = p.p_partkey
)
SELECT brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(never_sold) AS BIGINT) AS n_never_sold,
       CAST(SUM(never_sold) * 1000 // COUNT(*) AS BIGINT)
         AS dead_permille
FROM flagged GROUP BY 1
""",
    doc="Dead-stock census per brand: catalog parts with ZERO lifetime "
    "sales (anti-join of the part master against the distinct sold "
    "set), rolled up to brand with an integer-permille dead share — "
    "the assortment-pruning complement of parts_slow_movers (which "
    "flags decaying sellers; this flags parts that never sold at "
    "all, invisible to any query that starts FROM the fact table). "
    "The distinct-sold set is part-key-sized, the left join "
    "broadcastable or co-partitioned; one rollup.",
    tags=("warehouse", "inventory", "anti", "agg"),
)
def catalog_dead_stock(spark: SparkSession, sf_dir: str):
    sold = t(spark, sf_dir, "lineitem").select("l_partkey").distinct()
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    flagged = p.join(
        sold, F.col("l_partkey") == F.col("p_partkey"), "left"
    ).select(
        F.col("p_brand").alias("brand"),
        F.when(F.col("l_partkey").isNull(), 1).otherwise(0).alias("never_sold"),
    )
    return flagged.groupBy("brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("never_sold").cast("bigint").alias("n_never_sold"),
        F.expr("SUM(never_sold) * 1000 DIV COUNT(*)").cast("bigint")
        .alias("dead_permille"),
    )


@register(
    "open_order_aging",
    oracle="""
WITH anchor AS (
  SELECT CAST(MAX(o_orderdate) AS DATE) AS today FROM orders
), aged AS (
  SELECT o.o_orderpriority AS priority,
         CAST(date_diff('day', CAST(o.o_orderdate AS DATE), a.today)
              AS BIGINT) AS age_days
  FROM orders o, anchor a
  WHERE o.o_orderstatus = 'O'
), banded AS (
  SELECT priority,
         CASE WHEN age_days <= 30 THEN '0-30'
              WHEN age_days <= 90 THEN '31-90'
              WHEN age_days <= 365 THEN '91-365'
              ELSE '365+' END AS age_band,
         age_days
  FROM aged
)
SELECT priority, age_band,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       MIN(age_days) AS min_age, MAX(age_days) AS max_age
FROM banded GROUP BY 1, 2
""",
    doc="Open-order aging by priority — the WIP triage matrix: every "
    "still-open ('O') order's age against the corpus anchor date "
    "(max order date — deterministic, never wall-clock), banded into "
    "the 30/90/365-day escalation tiers ops queues actually use, "
    "with a min/max envelope per cell. An URGENT order sitting in "
    "the 365+ band is the row someone gets paged about; "
    "orders_open_backlog gives the time-series census, this gives "
    "the point-in-time escalation list. One broadcast anchor + one "
    "filtered map-side aggregate; integer day arithmetic.",
    tags=("warehouse", "temporal", "reporting", "agg"),
)
def open_order_aging(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority", "o_orderdate"
    )
    anchor = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("today"))
    aged = (
        o.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(anchor))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(F.col("today"), F.col("o_orderdate").cast("date"))
            .cast("bigint")
            .alias("age_days"),
        )
    )
    band = (
        F.when(F.col("age_days") <= 30, "0-30")
        .when(F.col("age_days") <= 90, "31-90")
        .when(F.col("age_days") <= 365, "91-365")
        .otherwise("365+")
    )
    return aged.groupBy("priority", band.alias("age_band")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("age_days").alias("min_age"),
        F.max("age_days").alias("max_age"),
    )


@register(
    "single_source_risk",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
), per_part AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers FROM pairs
  GROUP BY 1
), labeled AS (
  SELECT p.p_brand AS brand,
         CASE WHEN pp.n_suppliers = 1 THEN 1 ELSE 0 END AS single
  FROM per_part pp JOIN part p ON p.p_partkey = pp.l_partkey
)
SELECT brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts_sold,
       CAST(SUM(single) AS BIGINT) AS n_single_sourced,
       CAST(SUM(single) * 1000 // COUNT(*) AS BIGINT)
         AS single_source_permille
FROM labeled GROUP BY 1
""",
    doc="Single-source supply risk per brand: parts whose entire sales "
    "history flows through exactly ONE supplier (distinct part-"
    "supplier pairs, per-part supplier count, integer-permille share "
    "by brand) — the supply-chain fragility metric procurement "
    "reviews run after every disruption; a brand at 900 permille "
    "single-sourced is one bankruptcy away from a stockout. "
    "Complements market_concentration_hhi (revenue concentration "
    "ACROSS suppliers) with the per-part redundancy view. Two "
    "map-side-combinable aggregates + a broadcast dim join.",
    tags=("warehouse", "supply-chain", "risk", "agg"),
)
def single_source_risk(spark: SparkSession, sf_dir: str):
    pairs = (
        t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    per_part = pairs.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    labeled = per_part.join(
        F.broadcast(p), F.col("p_partkey") == F.col("l_partkey")
    ).select(
        F.col("p_brand").alias("brand"),
        F.when(F.col("n_suppliers") == 1, 1).otherwise(0).alias("single"),
    )
    return labeled.groupBy("brand").agg(
        F.count(F.lit(1)).alias("n_parts_sold"),
        F.sum("single").cast("bigint").alias("n_single_sourced"),
        F.expr("SUM(single) * 1000 DIV COUNT(*)").cast("bigint")
        .alias("single_source_permille"),
    )
