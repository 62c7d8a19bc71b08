"""TPC-H query-shape fill-out: Q7, Q8, Q9, Q12, Q13, Q15, Q20.

The corpus schema is a simplified TPC-H (no partsupp table, no
l_shipmode/l_commitdate/l_receiptdate, no comment columns), so each query
keeps the *operator shape* of its TPC-H namesake while substituting
available columns:

- Q7  volume shipping between a nation pair (multi-join + OR-pair filter)
- Q8  market share of one supplier nation inside a region (conditional
  revenue share = SUM(CASE)/SUM — two pinned sums, one division)
- Q9  product-line profit by supplier nation and year (p_retailprice
  stands in for ps_supplycost)
- Q12 late-shipment priority counts (datediff bucket stands in for
  shipmode/commit-receipt lag; SUM(CASE) dual counters)
- Q13 customer order-count distribution (left outer join + two-level agg)
- Q15 top supplier by 3-month revenue (agg view + global-max equality,
  kept distributed via a broadcast 1-row max)
- Q20 suppliers shipping >50% of a part's volume (nested per-key vs
  per-group aggregate comparison; partsupp availability replaced by
  shipped-quantity share)

Float determinism follows the registry contract (registry.py module doc):
revenue expressions are fixed-parenthesisation IEEE per-row ops pinned to
DECIMAL(25,8) before SUM, totals surfaced as DECIMAL(25,6)→DOUBLE; plain
column sums use decimal_sum (DECIMAL(18,6)). Divisions happen once, on
the deterministic doubles.

Reference parity surface: the flat join/agg idioms of
/root/reference/step_5_curated_to_consumption.py (star joins, CASE
counters, groupBy rollups) extended to the standard warehouse shapes a
reference user would write next (SURVEY §2.4/§2.5).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import decimal_sum, fast_decimal_sum_expr
from .registry import register
from .util import t, ts_lit

# Per-row revenue: product of doubles is a single IEEE op (deterministic),
# pinned to an exact decimal before the (associative) sum. Mirrors
# parity._REVENUE_SQL but qualified for multi-table joins.
_REV_SQL = (
    "CAST(CAST(SUM(CAST({p} * (1.0 - {d}) AS DECIMAL(25,8)))"
    " AS DECIMAL(25,6)) AS DOUBLE)"
)


def _rev_raw(price="l_extendedprice", disc="l_discount"):
    return F.col(price) * (F.lit(1.0) - F.col(disc))


def _rev_dec(price="l_extendedprice", disc="l_discount"):
    return _rev_raw(price, disc).cast("decimal(25,8)")


def _rev_sum(price="l_extendedprice", disc="l_discount"):
    # Result-identical unscaled-long fast path (r11: the per-row
    # double→DECIMAL cast is a BigDecimal string round-trip; see
    # functions.hashing.fast_decimal_sum_expr for the equivalence proof).
    return fast_decimal_sum_expr(_rev_raw(price, disc), scale=8, final_scale=6)


@register(
    "q7_nation_volume",
    oracle="""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
       {rev} AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1995-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY 1, 2, 3
""".format(rev=_REV_SQL.format(p="l.l_extendedprice", d="l.l_discount")),
    doc="TPC-H Q7 shape: bidirectional nation-pair shipping volume. "
    "nation is broadcast twice under different aliases; the OR-pair "
    "filter runs post-join on the two small dim columns while the "
    "shipdate range pushes to the lineitem scan. orders/customer join "
    "shuffle (AQE may still broadcast at small SF) — the 100TB-safe "
    "default.",
    tags=("join", "agg", "tpch"),
    bench=True,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str):
    l = t(spark, sf_dir, "lineitem")
    l = l.filter(
        (F.col("l_shipdate") >= ts_lit(l, "l_shipdate", "1995-01-01"))
        & (F.col("l_shipdate") < ts_lit(l, "l_shipdate", "1997-01-01"))
    )
    s = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(_rev_sum().alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle="""
SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(CASE WHEN n1.n_name = 'NATION_5'
                 THEN l.l_extendedprice * (1.0 - l.l_discount)
                 ELSE 0.0 END AS DECIMAL(25,8))) AS DOUBLE)
       / CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                 AS DECIMAL(25,8))) AS DOUBLE) AS mkt_share
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n2.n_regionkey
WHERE r.r_name = 'AMERICA'
  AND p.p_type = 'PROMO'
  AND o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY 1
""",
    doc="TPC-H Q8 shape: one nation's market share inside a region = "
    "SUM(CASE)/SUM over the same pinned-decimal revenue — two exact sums, "
    "one deterministic double division. part/supplier/nation/region "
    "broadcast; the customer-region filter prunes via the broadcast dim "
    "before the orders shuffle join.",
    tags=("join", "agg", "tpch"),
    bench=True,
)
def q8_market_share(spark: SparkSession, sf_dir: str):
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    o = t(spark, sf_dir, "orders")
    o = o.filter(
        (F.col("o_orderdate") >= ts_lit(o, "o_orderdate", "1995-01-01"))
        & (F.col("o_orderdate") < ts_lit(o, "o_orderdate", "1997-01-01"))
    )
    c = t(spark, sf_dir, "customer")
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    nation_rev = F.when(F.col("supp_nation") == "NATION_5", _rev_raw()).otherwise(
        F.lit(0.0)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                # fast path per sum; the CASE's 0.0 branch floors to 0
                # exactly, so both conversions match the decimal pins.
                fast_decimal_sum_expr(nation_rev, scale=8)
                / fast_decimal_sum_expr(_rev_raw(), scale=8)
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    oracle="""
SELECT n.n_name AS nation,
       CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
       CAST(CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                 - p.p_retailprice * l.l_quantity
                 AS DECIMAL(25,8))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%widget%'
GROUP BY 1, 2
""",
    doc="TPC-H Q9 shape: product-line profit by supplier nation and order "
    "year; p_retailprice stands in for the absent ps_supplycost. The "
    "per-row profit is two IEEE products and one subtraction in fixed "
    "order on both engines, pinned to DECIMAL(25,8) pre-sum. The "
    "name-LIKE filter prunes part before its broadcast.",
    tags=("join", "agg", "tpch"),
    bench=True,
)
def q9_product_profit(spark: SparkSession, sf_dir: str):
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders")
    # profit is a difference of a 4 dp and a 2 dp exact product — a <= 4 dp
    # value (possibly negative; floor(x+0.5) rounds half-up either sign
    # here since no value sits near a .5 boundary) — fast-path eligible.
    profit = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            fast_decimal_sum_expr(profit, scale=8, final_scale=6).alias(
                "sum_profit"
            )
        )
    )


@register(
    "q12_late_shipment_priority",
    oracle="""
SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 60
            THEN 'LATE' ELSE 'ONTIME' END AS ship_bucket,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY 1
""",
    doc="TPC-H Q12 shape: dual SUM(CASE) priority counters per shipping "
    "bucket; ship-vs-order day lag stands in for the absent "
    "commit/receipt dates (all corpus timestamps are midnight, so Spark "
    "datediff and DuckDB date_diff('day') agree exactly). One shuffle "
    "join + one small agg.",
    tags=("join", "agg", "tpch"),
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str):
    l = t(spark, sf_dir, "lineitem")
    l = l.filter(
        (F.col("l_shipdate") >= ts_lit(l, "l_shipdate", "1996-01-01"))
        & (F.col("l_shipdate") < ts_lit(l, "l_shipdate", "1997-01-01"))
    )
    o = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60, "LATE"
            )
            .otherwise("ONTIME")
            .alias("ship_bucket")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_order_count_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '5-LOW'
  GROUP BY 1
) per_cust
GROUP BY 1
""",
    doc="TPC-H Q13 shape: order-count-per-customer distribution. The "
    "LEFT JOIN keeps zero-order customers (COUNT of the null-extended "
    "key is 0); the priority predicate lives in the join condition, not "
    "a WHERE (a WHERE would silently drop the nulls). Two aggregation "
    "levels, the second over at most |distinct counts| rows.",
    tags=("join", "agg", "tpch"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey) & (o.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count(F.col("o_orderkey")).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    oracle="""
WITH rev AS (
  SELECT l_suppkey AS supplier_no, {rev} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN rev r ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
""".format(rev=_REV_SQL.format(p="l_extendedprice", d="l_discount")),
    doc="TPC-H Q15 shape: supplier(s) with max 3-month revenue. The "
    "global max is a broadcast 1-row aggregate cross-joined back (no "
    "driver collect); equality on the pinned-decimal-derived double is "
    "engine-exact, so ties surface identically on both sides.",
    tags=("join", "agg", "subquery", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str):
    l = t(spark, sf_dir, "lineitem")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= ts_lit(l, "l_shipdate", "1996-01-01"))
            & (F.col("l_shipdate") < ts_lit(l, "l_shipdate", "1996-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_rev_sum().alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    s = t(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q20_excess_shippers",
    oracle="""
WITH qty AS (
  SELECT l.l_partkey, l.l_suppkey,
         CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS supp_qty
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE 'small%'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY 1, 2
),
tot AS (
  SELECT l_partkey, CAST(SUM(CAST(supp_qty AS DECIMAL(25,6))) AS DOUBLE) AS part_qty
  FROM qty GROUP BY 1
)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM qty q
JOIN tot t ON t.l_partkey = q.l_partkey
JOIN supplier s ON s.s_suppkey = q.l_suppkey
WHERE q.supp_qty > 0.5 * t.part_qty
""",
    doc="TPC-H Q20 shape: suppliers who shipped the majority of a "
    "selected part's annual volume (shipped-quantity share replaces the "
    "absent partsupp availability). Nested aggregate: per-(part,supplier) "
    "quantity reaggregated per-part, compared after exact decimal sums "
    "surface as deterministic doubles. The reaggregation reuses the "
    "first agg's shuffle partitioning on l_partkey — no second scan.",
    tags=("join", "agg", "subquery", "tpch"),
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str):
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    qty = (
        l.filter(
            (F.col("l_shipdate") >= ts_lit(l, "l_shipdate", "1997-01-01"))
            & (F.col("l_shipdate") < ts_lit(l, "l_shipdate", "1998-01-01"))
        )
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(decimal_sum("l_quantity", alias="supp_qty"))
    )
    tot = qty.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum(F.col("supp_qty").cast("decimal(25,6)")).cast("double").alias("part_qty")
    )
    s = t(spark, sf_dir, "supplier")
    return (
        qty.join(tot, qty.l_partkey == tot.t_partkey)
        .filter(F.col("supp_qty") > F.lit(0.5) * F.col("part_qty"))
        .join(F.broadcast(s), qty.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
    )
