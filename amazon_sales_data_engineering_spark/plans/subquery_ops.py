"""Subquery-shaped operator family: semi/anti joins, correlated scalar
subqueries, group-having IN lists, and disjunctive pushdown.

The reference's query surface is flat (no subqueries appear in the five
step scripts), but any engine claiming "a user of the reference could run
every query they run today" must also cover the standard warehouse idioms
users write NEXT: EXISTS / NOT IN / correlated aggregates / HAVING against
a global scalar. Each is expressed Spark-first:

- EXISTS            -> ``left_semi`` join (no row multiplication, no dedup)
- NOT IN (no NULLs) -> ``left_anti`` join
- correlated scalar -> join against a pre-aggregated per-key scalar
  (Catalyst performs the same de-correlation for SQL-string subqueries;
  writing the join explicitly keeps the plan visible and testable)
- global scalar     -> crossJoin(broadcast(1-row agg)) — stays fully
  distributed, no driver-side collect of the scalar

Float determinism follows the registry contract: every SUM/AVG over a
DOUBLE column goes element-wise through DECIMAL (exact, associative), and
scalar comparisons happen on the deterministic DOUBLE produced by a single
cast/division. min/max on doubles are order-insensitive and compared raw.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .registry import register
from .util import t, ts_lit


@register(
    "q4_priority_semijoin",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate < TIMESTAMP '1995-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY 1
""",
    doc="TPC-H Q4 shape: EXISTS as a left-semi join — orders in a date "
    "range having at least one returned item, counted per priority. The "
    "semi join never multiplies rows, so no post-join dedup is needed; "
    "the date filter pushes to the orders scan. Ref parity surface: "
    "subquery idiom over step_5 fact tables.",
    tags=("join", "semi", "subquery", "tpch"),
)
def q4_priority_semijoin(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.filter(
            (F.col("o_orderdate") >= ts_lit(o, "o_orderdate", "1995-01-01"))
            & (F.col("o_orderdate") < ts_lit(o, "o_orderdate", "1995-07-01"))
        )
        .join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q16_supplier_antijoin",
    oracle="""
SELECT p.p_brand, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1
""",
    doc="TPC-H Q16 shape: NOT IN rewritten as a left-anti join (valid "
    "because s_suppkey is non-null; NULL-bearing NOT IN lists have "
    "three-valued semantics an anti join does not reproduce — documented "
    "here, enforced by the supplier schema). The excluded-supplier list "
    "is tiny and broadcast; distinct-count aggregates per brand.",
    tags=("join", "anti", "subquery", "tpch"),
)
def q16_supplier_antijoin(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    bad = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "q17_small_qty_revenue",
    oracle="""
WITH avg_qty AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)
           AS part_avg
  FROM lineitem GROUP BY 1
)
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(25,4))) AS DOUBLE)
         / CAST(7.0 AS DOUBLE) AS avg_yearly,
       COUNT(*) AS n_items
FROM lineitem l
JOIN avg_qty a ON a.l_partkey = l.l_partkey
WHERE l.l_quantity < CAST(0.2 AS DOUBLE) * a.part_avg
""",
    doc="TPC-H Q17 shape: correlated per-part AVG subquery, de-correlated "
    "into a join against a per-part aggregate (the same rewrite Catalyst "
    "applies to the SQL form). The average is exact-decimal-sum / count — "
    "one deterministic division — so the 0.2*avg comparison is bit-stable "
    "on both engines.",
    tags=("join", "subquery", "agg", "tpch"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("part_avg")
    )
    return (
        li.join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < F.lit(0.2).cast("double") * F.col("part_avg"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(25,4)")).cast("double")
                / F.lit(7.0).cast("double")
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q18_large_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY 1
  HAVING SUM(CAST(l_quantity AS DECIMAL(25,6))) > 300
)
SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice, b.total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""",
    doc="TPC-H Q18 shape: IN-list produced by a GROUP BY ... HAVING "
    "subquery, rewritten as join-after-aggregate (the aggregate shrinks "
    "the fact side before the join, so the heavy side joins once against "
    "a filtered key set instead of the raw lineitem).",
    tags=("join", "subquery", "agg", "having", "tpch"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 300)
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("total_qty"))
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


@register(
    "q21_sole_returner",
    oracle="""
SELECT s.s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY 1
""",
    doc="TPC-H Q21 shape: nested EXISTS + NOT EXISTS ('the only supplier "
    "who had returns on a multi-supplier order'). Spark plan avoids BOTH "
    "correlated self-joins via an aggregate reformulation: per order, "
    "count distinct suppliers overall and distinct suppliers with "
    "returns; the predicate pair (EXISTS other-supplier, NOT EXISTS "
    "other-returning-supplier) is exactly (n_supp > 1 AND n_ret_supp = "
    "1). Two map-side-combinable aggregates replace two shuffled "
    "self-joins — the classic Q21 scale trap. Counts per (order, "
    "supplier) line item, matching the SQL's row multiplicity.",
    tags=("join", "semi", "anti", "subquery", "agg", "tpch"),
)
def q21_sole_returner(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    per_order = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    qualifying = per_order.filter(
        (F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1)
    ).select("l_orderkey")
    r_items = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    return (
        r_items.join(qualifying, "l_orderkey", "left_semi")
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,4))) AS DOUBLE) / COUNT(*)
           AS avg_pos
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_mktsegment, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(25,4))) AS DOUBLE) AS total_bal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.avg_pos
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'P')
GROUP BY 1
""",
    doc="TPC-H Q22 shape: global scalar subquery (average positive "
    "balance) + NOT EXISTS anti join. The scalar is a 1-row aggregate "
    "crossJoin-broadcast onto the customer table — fully distributed, no "
    "driver collect; the anti join sees only the pre-filtered 'P' order "
    "keys.",
    tags=("join", "anti", "subquery", "agg", "tpch"),
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(25,4)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_pos")
        )
    )
    p_orders = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_pos"))
        .join(p_orders, c.c_custkey == p_orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(25,4)"))
            .cast("double")
            .alias("total_bal"),
        )
    )


@register(
    "q2_min_unit_price",
    oracle="""
WITH unit AS (
  SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit_price
  FROM lineitem
), min_unit AS (
  SELECT l_partkey, MIN(unit_price) AS min_price FROM unit GROUP BY 1
)
SELECT p.p_partkey, p.p_name, s.s_name, m.min_price
FROM unit u
JOIN min_unit m ON m.l_partkey = u.l_partkey AND u.unit_price = m.min_price
JOIN part p ON p.p_partkey = u.l_partkey
JOIN supplier s ON s.s_suppkey = u.l_suppkey
WHERE p.p_size < 5
GROUP BY 1, 2, 3, 4
""",
    doc="TPC-H Q2 shape: correlated MIN subquery (argmin per group) — "
    "which supplier sold each small part at its lowest unit price. "
    "De-correlated into a join against a per-part MIN aggregate; the "
    "double division is a single IEEE op so the equality re-match is "
    "exact on both engines. Ties (several suppliers at the min) are "
    "kept, as in the SQL; GROUP BY collapses repeat sales at the same "
    "min price.",
    tags=("join", "subquery", "agg", "argmin", "tpch"),
)
def q2_min_unit_price(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_size") < 5)
    s = t(spark, sf_dir, "supplier")
    unit = li.select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    min_unit = unit.groupBy("l_partkey").agg(F.min("unit_price").alias("min_price"))
    return (
        unit.join(
            min_unit,
            (unit.l_partkey == min_unit.l_partkey)
            & (unit.unit_price == min_unit.min_price),
        )
        .drop(min_unit.l_partkey)
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "min_price")
        .distinct()
    )


@register(
    "q19_disjunctive_pushdown",
    oracle="""
SELECT CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(25,4)))
         AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3'  AND l.l_quantity BETWEEN 20 AND 30)
""",
    doc="TPC-H Q19 shape: OR-of-ANDs across both join sides. Catalyst "
    "extracts the common single-side residuals (brand IN (...) onto the "
    "part scan, quantity BETWEEN 1 AND 30 onto the lineitem scan) so "
    "both scans prune before the broadcast join; the full disjunction "
    "evaluates post-join.",
    tags=("join", "filter", "disjunction", "tpch"),
)
def q19_disjunctive_pushdown(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & q.between(20, 30))
    )
    disc = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(25,4)"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(disc).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q11_brand_value_having",
    oracle="""
WITH brand_value AS (
  SELECT p.p_brand,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(25,4))) AS DOUBLE) AS value
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1
), total AS (
  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,4))) AS DOUBLE) AS grand
  FROM lineitem
)
SELECT b.p_brand, b.value
FROM brand_value b, total
WHERE b.value > CAST(0.01 AS DOUBLE) * total.grand
""",
    doc="TPC-H Q11 shape: HAVING against a global scalar subquery (brands "
    "holding >1% of total extended price). Both the per-brand values and "
    "the grand total are exact decimal sums cast once to double, and the "
    "threshold multiply is a single IEEE op — deterministic comparison. "
    "The 1-row total is crossJoin-broadcast, not collected.",
    tags=("join", "subquery", "agg", "having", "tpch"),
)
def q11_brand_value_having(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    brand_value = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(25,4)"))
            .cast("double")
            .alias("value")
        )
    )
    total = li.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(25,4)"))
        .cast("double")
        .alias("grand")
    )
    return (
        brand_value.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.lit(0.01).cast("double") * F.col("grand"))
        .select("p_brand", "value")
    )
