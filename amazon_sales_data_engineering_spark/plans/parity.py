"""Reference-parity queries (SURVEY.md §2 operator inventory), expressed on
the driver's TPC-H-ish corpus (FIXTURES.md §3 mapping: orders+lineitem ≈
sales orders, region/nation ≈ region_dim, customer ≈ customer_dim, part ≈
product_dim).

Every query pairs an idiomatic-Spark plan with a DuckDB oracle. See
plans.registry for the determinism rules (decimal-sum idiom etc.).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import (
    decimal_sum,
    decimal_sum_expr,
    fast_decimal_sum_expr,
    unscaled_fixed,
)
from ..operators.datespine import date_spine
from ..operators.dedup import rank_dedup
from ..operators.delta import new_rows
from ..operators.sequences import dense_keys
from ..operators.setops import union_distinct
from .registry import register
from .util import t, ts_lit

# ---------------------------------------------------------------------------
# Aggregation pipeline: TPC-H-style headline queries (bench set)
# ---------------------------------------------------------------------------

# Money-sum determinism (see plans.registry): per-row cast at scale 8 —
# strictly beyond the data's intrinsic 6-dp precision, so no rounding ties —
# then rescale the exact decimal SUM to scale 2 before the double cast so
# the unscaled total stays below 2^53 (where decimal→double conversion is
# engine-identical).
_REVENUE_SQL = (
    "CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,8)))"
    " AS DECIMAL(25,6)) AS DOUBLE)"
)


def _revenue_raw():
    """Per-row revenue as the plain IEEE product — the value the decimal
    pin makes exact. eprice is a 2 dp money value, (1-discount) 2 dp, so
    the true product has <= 4 decimal digits and magnitude < 2^52/1e8:
    exactly the ``fast_decimal_sum_expr`` precondition at scale 8."""
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def _revenue_col():
    return _revenue_raw().cast("decimal(25,8)")


def _revenue_sum():
    # Result-identical unscaled-long fast path (r11 §4/§1.2: the per-row
    # double→DECIMAL cast is a BigDecimal string round-trip that dominated
    # these scan+agg queries); equivalence proven in
    # tests/test_fast_decimal.py + the oracle gate.
    return fast_decimal_sum_expr(_revenue_raw(), scale=8, final_scale=6)


@register(
    "q1_pricing_summary",
    oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
  {_REVENUE_SQL} AS sum_disc_price,
  CAST(CAST(SUM(CAST((l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax) AS DECIMAL(25,8))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1-style pricing summary: scan-filter-aggregate with full "
    "map-side partial aggregation (SURVEY §2.4 extended).",
    tags=("agg", "filter"),
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str):
    l = t(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    # All per-row pins on the fast unscaled-long path (result-identical —
    # see fast_decimal_sum_expr): qty is integral, price/discount 2 dp,
    # charge = revenue*(1+tax) <= 6 dp — all within the scale-6/8 domain.
    charge = _revenue_raw() * (F.lit(1.0) + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= ts_lit(l, "l_shipdate", "2000-12-01 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            fast_decimal_sum_expr(F.col("l_quantity")).alias("sum_qty"),
            fast_decimal_sum_expr(F.col("l_extendedprice")).alias("sum_base_price"),
            _revenue_sum().alias("sum_disc_price"),
            fast_decimal_sum_expr(charge, scale=8, final_scale=6).alias("sum_charge"),
            (fast_decimal_sum_expr(F.col("l_quantity")) / cnt.cast("double")).alias("avg_qty"),
            (fast_decimal_sum_expr(F.col("l_extendedprice")) / cnt.cast("double")).alias("avg_price"),
            (fast_decimal_sum_expr(F.col("l_discount")) / cnt.cast("double")).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT
  l_orderkey AS order_key,
  CAST(o_orderdate AS DATE) AS order_dt,
  o_orderpriority AS order_priority,
  {_REVENUE_SQL} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, order_key ASC
LIMIT 10
""",
    doc="TPC-H Q3-style: selective dim filter, two joins, agg, total-order "
    "top-k (SURVEY §2.3 J6 / §2.6 O1).",
    tags=("join", "agg", "topk"),
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    o = o.filter(F.col("o_orderdate") < ts_lit(o, "o_orderdate", "1998-01-01 00:00:00"))
    l = l.filter(F.col("l_shipdate") > ts_lit(l, "l_shipdate", "1998-01-01 00:00:00"))
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("l_orderkey").alias("order_key"),
            F.col("o_orderdate").cast("date").alias("order_dt"),
            F.col("o_orderpriority").alias("order_priority"),
        )
        .agg(_revenue_sum().alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("order_key").asc())
        .limit(10)
    )


@register(
    "q5_region_volume",
    oracle=f"""
SELECT n_name, {_REVENUE_SQL} AS revenue
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
""",
    doc="TPC-H Q5-style local-supplier volume: 6-way join with broadcast "
    "dims (region/nation pinned broadcast; AQE handles the rest).",
    tags=("join", "agg", "broadcast"),
    bench=True,
)
def q5_region_volume(spark: SparkSession, sf_dir: str):
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = o.filter(
        (F.col("o_orderdate") >= ts_lit(o, "o_orderdate", "1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts_lit(o, "o_orderdate", "1999-01-01 00:00:00"))
    )
    return (
        F.broadcast(r)
        .join(F.broadcast(n), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(c, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(_revenue_sum().alias("revenue"))
    )


@register(
    "star_join_enriched",
    oracle=f"""
SELECT r_name AS region_name, p_brand AS brand,
       {_REVENUE_SQL} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation   ON n_nationkey = c_nationkey
JOIN region   ON r_regionkey = n_regionkey
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
GROUP BY 1, 2
""",
    doc="Full star-join fact assembly + rollup (SURVEY §2.3 J6): fact never "
    "shuffles for the true dims (broadcast); orders/customer join via "
    "shuffle since they scale with the fact.",
    tags=("join", "agg", "broadcast", "star"),
    bench=True,
)
def star_join_enriched(spark: SparkSession, sf_dir: str):
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    p = t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier")
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("r_name").alias("region_name"), F.col("p_brand").alias("brand"))
        .agg(
            _revenue_sum().alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Scans / projections / filters (SURVEY §2.1, §2.2)
# ---------------------------------------------------------------------------


@register(
    "scan_project_limit",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment, c_acctbal
FROM customer
ORDER BY c_custkey
LIMIT 10
""",
    doc="Projection + total-order LIMIT — the reference's connectivity smoke "
    "query (SURVEY §2.1 S12; /root/reference/step_1_check_connection.py:54-66).",
    tags=("scan",),
)
def scan_project_limit(spark: SparkSession, sf_dir: str):
    return (
        t(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
        .orderBy("c_custkey")
        .limit(10)
    )


@register(
    "filter_status_priority",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       CAST(o_orderdate AS DATE) AS order_dt,
       'OPEN_URGENT' AS bucket
FROM orders
WHERE o_orderstatus = 'O' AND o_orderpriority = '1-URGENT'
""",
    doc="Chained equality filters + literal injection — the Paid∧Delivered "
    "pattern (SURVEY §2.2 P1/P2/P4; /root/reference/step_4_source_to_curated.py:40-58,97-103).",
    tags=("filter",),
)
def filter_status_priority(spark: SparkSession, sf_dir: str):
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.col("o_orderdate").cast("date").alias("order_dt"),
            F.lit("OPEN_URGENT").alias("bucket"),
        )
    )


@register(
    "project_cast_rename",
    oracle="""
SELECT l_orderkey AS order_key,
       l_linenumber AS line_number,
       CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(18,0)) AS order_quantity,
       CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(18,2)) AS extended_price,
       CAST(l_shipdate AS DATE) AS ship_dt,
       l_returnflag AS return_flag
FROM lineitem
""",
    doc="Projection with rename + explicit casts — the positional-cast load "
    "shape (SURVEY §2.2 P5/P7/P8; /root/reference/step_3_load_from_stage_to_source.py:28-43). "
    "DOUBLE->DECIMAL is routed through a string on BOTH engines: each prints "
    "the shortest round-trip decimal representation of the same IEEE double, "
    "so the subsequent decimal cast is exact and engine-agnostic (Spark "
    "rounds BigDecimal-of-shortest-repr HALF_UP while DuckDB rounds the exact "
    "binary value — they disagree on tie-adjacent raw doubles).",
    tags=("project", "cast"),
)
def project_cast_rename(spark: SparkSession, sf_dir: str):
    return t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_number"),
        F.col("l_quantity").cast("string").cast("decimal(18,0)").alias("order_quantity"),
        F.col("l_extendedprice").cast("string").cast("decimal(18,2)").alias("extended_price"),
        F.col("l_shipdate").cast("date").alias("ship_dt"),
        F.col("l_returnflag").alias("return_flag"),
    )


@register(
    "lit_and_case_default",
    oracle="""
SELECT o_orderkey,
       COALESCE(CASE WHEN o_orderpriority = '5-LOW' THEN NULL ELSE o_orderpriority END, 'NA') AS priority_or_na,
       'US' AS country,
       'AMER' AS region
FROM orders
""",
    doc="CASE/NULL-default + constant columns — promo-code 'NA' pattern "
    "(SURVEY §2.2 P4/P9; /root/reference/step_5_curated_to_consumption.py:205-214).",
    tags=("project",),
)
def lit_and_case_default(spark: SparkSession, sf_dir: str):
    nullable = F.when(F.col("o_orderpriority") == "5-LOW", F.lit(None)).otherwise(
        F.col("o_orderpriority")
    )
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.coalesce(nullable, F.lit("NA")).alias("priority_or_na"),
        F.lit("US").alias("country"),
        F.lit("AMER").alias("region"),
    )


@register(
    "currency_conversion",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(18,2)) AS local_amt,
       l_extendedprice / (1.0 + l_tax) AS usd_amt
FROM lineitem
""",
    doc="Arithmetic projection (division) with decimal pinning — the USD "
    "conversion (SURVEY §2.2 P10; /root/reference/step_4_source_to_curated.py:150-153). "
    "local_amt uses the string-routed DOUBLE->DECIMAL idiom (see "
    "project_cast_rename) so both engines cast the identical shortest-repr "
    "string; the division itself is a fixed-parenthesization IEEE chain and "
    "compares exactly as DOUBLE.",
    tags=("project", "arithmetic"),
)
def currency_conversion(spark: SparkSession, sf_dir: str):
    return t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").cast("string").cast("decimal(18,2)").alias("local_amt"),
        (F.col("l_extendedprice") / (F.lit(1.0) + F.col("l_tax"))).alias("usd_amt"),
    )


@register(
    "split_key_segments",
    oracle="""
SELECT p_partkey,
       split_part(p_brand || '/' || p_type || '/' || CAST(p_size AS VARCHAR), '/', 1) AS brand_seg,
       split_part(p_brand || '/' || p_type || '/' || CAST(p_size AS VARCHAR), '/', 2) AS type_seg,
       split_part(p_brand || '/' || p_type || '/' || CAST(p_size AS VARCHAR), '/', 3) AS size_seg
FROM part
""",
    doc="split()[i] segment extraction — the mobile_key Brand/Model/Color/"
    "Memory parse (SURVEY §2.8 F1; /root/reference/step_5_curated_to_consumption.py:132-135).",
    tags=("string",),
)
def split_key_segments(spark: SparkSession, sf_dir: str):
    key = F.concat_ws(
        "/", F.col("p_brand"), F.col("p_type"), F.col("p_size").cast("string")
    )
    parts = F.split(key, "/")
    return t(spark, sf_dir, "part").select(
        "p_partkey",
        parts.getItem(0).alias("brand_seg"),
        parts.getItem(1).alias("type_seg"),
        parts.getItem(2).alias("size_seg"),
    )


# ---------------------------------------------------------------------------
# Joins / sets / windows (SURVEY §2.3, §2.5, §2.7)
# ---------------------------------------------------------------------------


@register(
    "full_outer_daily_totals",
    oracle="""
WITH o AS (
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS order_value
  FROM orders GROUP BY 1
), s AS (
  SELECT CAST(l_shipdate AS DATE) AS d, COUNT(*) AS n_lines
  FROM lineitem GROUP BY 1
)
SELECT COALESCE(o.d, s.d) AS day,
       COALESCE(n_orders, 0) AS n_orders,
       COALESCE(order_value, CAST(0.0 AS DOUBLE)) AS order_value,
       COALESCE(n_lines, 0) AS n_lines
FROM o FULL OUTER JOIN s ON o.d = s.d
""",
    doc="Full-outer equi-join of two daily rollups — the sales×forex outer "
    "join (SURVEY §2.3 J1; /root/reference/step_4_source_to_curated.py:106-111).",
    tags=("join", "outer"),
    bench=True,
)
def full_outer_daily_totals(spark: SparkSession, sf_dir: str):
    o = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # fast path: o_totalprice is a 2 dp money double (result-identical)
            fast_decimal_sum_expr(F.col("o_totalprice")).alias("order_value"),
        )
    )
    s = (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_shipdate").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )
    return o.join(s, o["d"] == s["d"], "outer").select(
        F.coalesce(o["d"], s["d"]).alias("day"),
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("order_value"), F.lit(0.0)).alias("order_value"),
        F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
    )


@register(
    "window_rank_dedup",
    oracle="""
SELECT l_orderkey, l_linenumber, ship_dt FROM (
  SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_dt,
         rank() OVER (PARTITION BY l_orderkey ORDER BY l_shipdate DESC) AS rk
  FROM lineitem
) WHERE rk = 1
""",
    doc="rank()-based latest-per-partition dedup, ties kept (SURVEY §2.5 W1; "
    "/root/reference/step_4_source_to_curated.py:114-132 — collapsed from "
    "window+filter+self-join to a single window+filter).",
    tags=("window", "dedup"),
    bench=True,
)
def window_rank_dedup(spark: SparkSession, sf_dir: str):
    l = t(spark, sf_dir, "lineitem")
    out = rank_dedup(
        l,
        partition_by=["l_orderkey"],
        order_by=[F.col("l_shipdate").desc()],
        keep_ties=True,
    )
    return out.select(
        "l_orderkey", "l_linenumber", F.col("l_shipdate").cast("date").alias("ship_dt")
    )


@register(
    "union_distinct_customers",
    oracle="""
SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 100
UNION
SELECT c_custkey, c_name FROM customer WHERE c_custkey BETWEEN 51 AND 150
""",
    doc="Deduplicating UNION — Snowpark union semantics (SURVEY §2.7 U1; "
    "/root/reference/step_5_curated_to_consumption.py:469).",
    tags=("setop",),
)
def union_distinct_customers(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_custkey") <= 100).select("c_custkey", "c_name")
    b = c.filter(F.col("c_custkey").between(51, 150)).select("c_custkey", "c_name")
    return union_distinct(a, b)


@register(
    "left_anti_new_dims",
    oracle="""
SELECT DISTINCT p_brand, p_type FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM (SELECT DISTINCT p_brand, p_type FROM part WHERE p_size <= 25) e
  WHERE e.p_brand = p.p_brand AND e.p_type = p.p_type
)
""",
    doc="Left-anti delta detection on a column list (SURVEY §2.3 J4/J5; "
    "/root/reference/step_5_curated_to_consumption.py:169-173 etc.).",
    tags=("join", "anti"),
)
def left_anti_new_dims(spark: SparkSession, sf_dir: str):
    p = t(spark, sf_dir, "part")
    incoming = p.select("p_brand", "p_type").dropDuplicates(["p_brand", "p_type"])
    existing = p.filter(F.col("p_size") <= 25).select("p_brand", "p_type")
    return new_rows(incoming, existing, ["p_brand", "p_type"])


@register(
    "groupby_dim_distinct",
    oracle="""
SELECT p_brand, p_type, COUNT(*) AS n_parts
FROM part GROUP BY 1, 2
""",
    doc="groupBy-as-DISTINCT dim builder (SURVEY §2.4 A1; "
    "/root/reference/step_5_curated_to_consumption.py:84,149-151).",
    tags=("agg",),
)
def groupby_dim_distinct(spark: SparkSession, sf_dir: str):
    return (
        t(spark, sf_dir, "part")
        .groupBy("p_brand", "p_type")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


@register(
    "topk_per_group",
    oracle="""
SELECT p_brand, p_partkey, p_retailprice, rank_in_brand FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         CAST(row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS INT) AS rank_in_brand
  FROM part
) WHERE rank_in_brand <= 3
""",
    doc="Top-k per group via ranking window (extension of SURVEY §2.5/§2.6).",
    tags=("window", "topk"),
)
def topk_per_group(spark: SparkSession, sf_dir: str):
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        t(spark, sf_dir, "part")
        .select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.row_number().over(w).cast("int").alias("rank_in_brand"),
        )
        .filter(F.col("rank_in_brand") <= 3)
    )


# ---------------------------------------------------------------------------
# Sequences / date spine / metadata (SURVEY §2.8 F7-F15, §2.1 S10)
# ---------------------------------------------------------------------------


@register(
    "surrogate_keys_dense",
    oracle="""
SELECT CAST(1000 + row_number() OVER (ORDER BY c_custkey) AS BIGINT) AS customer_sk,
       c_custkey, c_name
FROM customer
""",
    doc="Sequence/NEXTVAL emulation: dense surrogate keys with offset "
    "(SURVEY §1.1, §4.3; dims only — facts use unique_keys at scale).",
    tags=("sequence",),
)
def surrogate_keys_dense(spark: SparkSession, sf_dir: str):
    return dense_keys(
        t(spark, sf_dir, "customer").select("c_custkey", "c_name"),
        key_col="customer_sk",
        order_by=["c_custkey"],
        start=1001,
    ).select("customer_sk", "c_custkey", "c_name")


@register(
    "surrogate_keys_unique",
    oracle="""
SELECT COUNT(*) AS n_rows, COUNT(*) AS n_distinct_keys,
       TRUE AS keys_unique, TRUE AS min_at_least_start
FROM customer
""",
    doc="The SCALE profile of sequence emulation (SURVEY §4.3, §7.3.1): "
    "unique_keys = monotonically_increasing_id + offset, fully parallel, "
    "no single-partition window. Key VALUES are partition-layout-dependent "
    "by design, so the gate compares the operator's invariants — count, "
    "distinctness, and the start offset — which are deterministic.",
    tags=("sequence",),
)
def surrogate_keys_unique(spark: SparkSession, sf_dir: str):
    from ..operators.sequences import unique_keys

    keyed = unique_keys(
        t(spark, sf_dir, "customer").select("c_custkey", "c_name"),
        key_col="customer_sk",
        start=5001,
    )
    return keyed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("customer_sk").alias("n_distinct_keys"),
        (F.countDistinct("customer_sk") == F.count(F.lit(1))).alias("keys_unique"),
        (F.min("customer_sk") >= F.lit(5001)).alias("min_at_least_start"),
    )


@register(
    "session_context",
    oracle="""
SELECT 'spark_catalog' AS catalog, 'default' AS database,
       TRUE AS has_user, TRUE AS has_version
""",
    doc="Session-context scalar functions (SURVEY §2.1 S13; "
    "/root/reference/step_1_check_connection.py:43-52): current_catalog/"
    "current_database are compared literally against Spark's vanilla-"
    "session defaults; current_user/version (no Snowflake role/warehouse "
    "analogue — session.py config replaces them) are asserted non-empty "
    "since their values are host-dependent.",
    tags=("session",),
)
def session_context(spark: SparkSession, sf_dir: str):
    return spark.range(1).select(
        F.current_catalog().alias("catalog"),
        F.current_database().alias("database"),
        (F.length(F.current_user()) > 0).alias("has_user"),
        (F.length(F.version()) > 0).alias("has_version"),
    )


@register(
    "sql_string_entry",
    oracle="""
SELECT c_mktsegment AS mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c_mktsegment
""",
    doc="SQL-string entry point (SURVEY §2.1 S11; the reference drives "
    "everything through session.sql strings, e.g. "
    "/root/reference/step_4_source_to_curated.py:94): temp views + "
    "spark.sql() — the exact interface a reference user would reach for. "
    "Decimal-sum idiom keeps the aggregate order-independent.",
    tags=("sql", "scan"),
)
def sql_string_entry(spark: SparkSession, sf_dir: str):
    t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT c.c_mktsegment AS mktsegment, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                 AS total_value
        FROM v_orders o JOIN v_customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        """
    )


@register(
    "date_dim_spine",
    oracle="""
WITH b AS (
  SELECT CAST(min(o_orderdate) AS DATE) AS mn, CAST(max(o_orderdate) AS DATE) AS mx FROM orders
), s AS (
  SELECT mn, CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS order_dt FROM b
)
SELECT order_dt,
       CAST(year(order_dt) AS INT) AS order_year,
       CAST(month(order_dt) AS INT) AS order_month,
       CAST(quarter(order_dt) AS INT) AS order_quarter,
       CAST(day(order_dt) AS INT) AS order_day,
       CAST(isodow(order_dt) AS INT) AS order_isodow,
       dayname(order_dt) AS order_dayname,
       CAST(date_diff('day', mn, order_dt) + 1 AS INT) AS day_counter,
       CASE WHEN isodow(order_dt) >= 6 THEN 'Weekend' ELSE 'Weekday' END AS order_daytype
FROM s
""",
    doc="Distributed date-dim spine — sequence()+explode replaces the "
    "reference's driver-side pandas date math (SURVEY §2.8 F7-F13; "
    "/root/reference/step_5_curated_to_consumption.py:386-425).",
    tags=("datespine",),
)
def date_dim_spine(spark: SparkSession, sf_dir: str):
    return date_spine(t(spark, sf_dir, "orders"), "o_orderdate")


@register(
    "metadata_file_stats",
    oracle="""
SELECT 'orders.parquet' AS file_name, COUNT(*) AS n_rows FROM orders
""",
    doc="File-metadata columns (SURVEY §2.1 S10): Spark's hidden _metadata "
    "struct replaces Snowflake metadata$filename "
    "(/root/reference/step_3_load_from_stage_to_source.py:44-46). The "
    "Spark side reads the real _metadata.file_path per input split and "
    "groups by the LOGICAL table file — the first '<name>.parquet' path "
    "component — which is the same string whether the table is one "
    "parquet file (driver testdata) or a Spark-written directory of "
    "part files (the 10x probe corpus), so the oracle's layout "
    "prediction holds at ANY sf dir instead of hardcoding one path "
    "or one physical layout.",
    tags=("metadata",),
)
def metadata_file_stats(spark: SparkSession, sf_dir: str):
    return (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            F.regexp_extract(
                F.col("_metadata.file_path"), r"([^/]+\.parquet)", 1
            ).alias("file_name")
        )
        .groupBy("file_name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "sql_cte_window_qualify",
    oracle="""
WITH seg_rev AS (
  SELECT c.c_mktsegment AS mktsegment, c.c_custkey,
         CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS VARCHAR)
              AS DOUBLE) AS customer_value,
         COUNT(*) AS n_orders
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT mktsegment, c_custkey, customer_value, n_orders,
       CAST(rnk AS INT) AS rnk
FROM (
  SELECT *, row_number() OVER (PARTITION BY mktsegment
                               ORDER BY customer_value DESC, c_custkey) AS rnk
  FROM seg_rev
)
WHERE rnk <= 3
""",
    doc="Full modern-SQL surface through ONE spark.sql string: CTE + "
    "aggregate + windowed rank filter (the QUALIFY idiom, spelled as "
    "the subquery filter both engines lower it to) — top-3 customers by exact-decimal lifetime value "
    "per segment. Together with sql_string_entry this proves the "
    "engine's SQL-string interface covers the analyst dialect, not "
    "just programmatic DataFrames; Catalyst plans the rank filter as "
    "the same partial WindowGroupLimit the DataFrame path gets.",
    tags=("sql", "window", "agg"),
)
def sql_cte_window_qualify(spark: SparkSession, sf_dir: str):
    t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        WITH seg_rev AS (
          SELECT c.c_mktsegment AS mktsegment, c.c_custkey,
                 CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6)))
                      AS STRING) AS DOUBLE) AS customer_value,
                 COUNT(*) AS n_orders
          FROM v_orders o JOIN v_customer c ON o.o_custkey = c.c_custkey
          GROUP BY 1, 2
        )
        SELECT mktsegment, c_custkey, customer_value, n_orders,
               CAST(rnk AS INT) AS rnk
        FROM (
          SELECT *, row_number() OVER (PARTITION BY mktsegment
                                       ORDER BY customer_value DESC,
                                                c_custkey) AS rnk
          FROM seg_rev
        )
        WHERE rnk <= 3
        """
    )


@register(
    "pysource_partitioned_read",
    oracle="""
WITH g AS (
  SELECT i AS id,
         ((i * 2654435761) % 4294967296) % 10 AS bucket,
         ((i * 2654435761) % 4294967296) % 100000 AS amount_cents
  FROM range(0, 20000) t(i)
)
SELECT CAST(bucket AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(amount_cents) AS BIGINT) AS amount_total,
       MIN(id) AS id_min, MAX(id) AS id_max
FROM g GROUP BY 1
""",
    doc="Custom input connector through Spark 4's Python Data Source "
    "API (sources/pysource.py): the engine-extension analogue of the "
    "reference's declarative FILE FORMAT + stage objects (/root/"
    "reference/Snowflake Worksheets/4. Common Schema.sql:5-23) — "
    "where Snowflake teaches the warehouse a new input kind with DDL, "
    "Spark registers a DataSource class and addresses it as "
    "spark.read.format('synthetic_rows'). The source declares its "
    "schema, parses reader options, and — the scale property — "
    "returns one InputPartition per row-range from partitions(), so "
    "executors generate ranges in parallel like any file source; "
    "nothing funnels through the driver. Rows are a pure function of "
    "the row id (multiplicative-hash bucket/amount), so the oracle "
    "regenerates the full relation from range() and the per-bucket "
    "rollup must match exactly.",
    tags=("source", "connector", "pysource", "agg"),
)
def pysource_partitioned_read(spark: SparkSession, sf_dir: str):
    from ..sources.pysource import register_synthetic_source

    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_rows")
        .option("n_rows", 20000)
        .option("n_parts", 16)
        .load()
    )
    return df.groupBy(F.col("bucket").cast("int").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("amount_cents").alias("amount_total"),
        F.min("id").alias("id_min"),
        F.max("id").alias("id_max"),
    )


@register(
    "csv_splittable_roundtrip",
    oracle="""
SELECT doc_id,
       COALESCE(CASE WHEN doc_id % 3 = 0 THEN replace(text, ' ', chr(10))
                     ELSE text END, '') AS payload
FROM documents
""",
    doc="Splittable ingest for multiLine CSV (SURVEY §7.3.4's documented "
    "scale-killer: multiLine=True reads each file as ONE split, so a "
    "single multi-TB CSV serializes onto one core). The mitigation — "
    "sources/splittable_csv.read_csv_splittable — is the classic "
    "two-pass distributed record splitter: pass 1 counts quote chars "
    "per fixed byte chunk in parallel (O(#chunks) integers to the "
    "driver, prefix-XOR gives the quote PARITY at every chunk start), "
    "pass 2 extracts records from byte ranges in Arrow-batched "
    "mapInPandas (a record terminator is a newline at even parity; "
    "each task owns records STARTING in its range, Hadoop input-split "
    "convention), and field parsing stays JVM-side via from_csv. This "
    "query is the parity gate: every document's text — with newlines "
    "INJECTED into every third doc so quoted fields span chunk "
    "boundaries — is written as quoted CSV, read back through the "
    "splittable path at 64 KiB splits (hundreds of chunks, far more "
    "than files), and must reproduce the documents table byte-for-"
    "byte. tests/test_splittable_csv.py additionally proves equality "
    "with Spark's own multiLine reader on the real IN fixtures "
    "(embedded-newline addresses).",
    tags=("source", "csv", "ingest", "scale"),
)
def csv_splittable_roundtrip(spark: SparkSession, sf_dir: str):
    import hashlib
    import os
    import tempfile

    from ..sources.splittable_csv import read_csv_splittable
    from pyspark.sql import types as T

    payload = F.coalesce(
        F.when(
            F.col("doc_id") % 3 == 0, F.replace(F.col("text"), F.lit(" "), F.lit("\n"))
        ).otherwise(F.col("text")),
        F.lit(""),
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out = os.path.join(tempfile.gettempdir(), f"asde_csv_split_{tag}")
    (
        t(spark, sf_dir, "documents")
        .select("doc_id", payload.alias("payload"))
        .coalesce(2)
        .write.mode("overwrite")
        .options(header=True, quoteAll=True, quote='"', escape='"')
        .csv(out)
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.StringType()),
        ]
    )
    df = read_csv_splittable(
        spark, f"{out}/*.csv", schema, split_bytes=64 << 10, header=True
    )
    return df.select("doc_id", F.coalesce("payload", F.lit("")).alias("payload"))


@register(
    "json_splittable_roundtrip",
    oracle="""
SELECT doc_id,
       COALESCE(CASE WHEN doc_id % 4 = 0 THEN replace(text, ' ', chr(34))
                     WHEN doc_id % 4 = 1 THEN replace(text, ' ', chr(92) || chr(34))
                     WHEN doc_id % 4 = 2 THEN replace(text, ' ', chr(10))
                     ELSE text END, '') AS payload
FROM documents
""",
    doc="Splittable ingest for multiLine top-level-array JSON (round-7 "
    "verdict #2: the FR source was the LAST single-split file format "
    "after the CSV splitter landed). sources/splittable_json."
    "read_json_splittable extends the two-pass scheme to JSON's "
    "backslash escaping: pass 1 computes each byte chunk's STATE-"
    "TRANSFER FUNCTION (unescaped-quote parity for both entry "
    "backslash-run parities + bracket-depth deltas for all four entry "
    "states, numpy-vectorized), the driver folds O(#chunks) integers "
    "into the exact (string, escape, depth) state at every chunk "
    "start, and pass 2 slices depth-1 elements from byte ranges in "
    "Arrow-batched mapInPandas — each task owns elements STARTING in "
    "its range — with field parsing JVM-side via from_json. This gate "
    "round-trips the documents table through array-JSON files with "
    "adversarial payloads injected by doc_id % 4: quotes (escape "
    "churn), backslash+quote pairs (multi-byte escape runs that chunk "
    "splits bisect), raw newlines (escaped by the writer, re-expanded "
    "by the parser) — read back at 64 KiB splits (hundreds of chunks). "
    "tests/test_splittable_json.py additionally proves element-level "
    "equality with Spark's native multiLine reader on the REAL FR "
    "fixtures (pretty-printed, \\u escapes, null fields) across split "
    "sizes down to 1 byte.",
    tags=("source", "json", "ingest", "scale"),
)
def json_splittable_roundtrip(spark: SparkSession, sf_dir: str):
    return _json_splittable(spark, sf_dir, wrapper=False)


def _json_splittable(spark: SparkSession, sf_dir: str, wrapper: bool):
    """Shared body of the two splittable-JSON gates: write the documents
    table as adversarial-payload JSON (bare array or wrapper object),
    read it back through the element splitter at 64 KiB splits."""
    import hashlib
    import os
    import tempfile

    from ..sources.splittable_json import read_json_splittable
    from pyspark.sql import types as T

    d = F.col("doc_id")
    payload = F.coalesce(
        F.when(d % 4 == 0, F.replace(F.col("text"), F.lit(" "), F.lit('"')))
        .when(d % 4 == 1, F.replace(F.col("text"), F.lit(" "), F.lit('\\"')))
        .when(d % 4 == 2, F.replace(F.col("text"), F.lit(" "), F.lit("\n")))
        .otherwise(F.col("text")),
        F.lit(""),
    )
    rows = F.collect_list(F.struct("doc_id", "payload"))
    body = (
        # the common API-dump shape: scalar metadata keys AROUND the
        # one element array (to_json emits them in struct field order)
        F.to_json(
            F.struct(
                F.lit("asde").alias("source"),
                rows.alias("rows"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        if wrapper
        else F.to_json(rows)
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    kind = "wrap" if wrapper else "split"
    out = os.path.join(tempfile.gettempdir(), f"asde_json_{kind}_{tag}")
    (
        t(spark, sf_dir, "documents")
        .select("doc_id", payload.alias("payload"))
        .groupBy((d % 2).alias("g"))
        .agg(body.alias("j"))
        # ONE top-level JSON value per file — the splitter's contract
        # (round-9: concatenated values per file now raise instead of
        # silently merging); partitionBy gives each group its own dir.
        .write.mode("overwrite")
        .partitionBy("g")
        .text(out)
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.StringType()),
        ]
    )
    df = read_json_splittable(
        spark, f"{out}/g=*/part-*", schema, split_bytes=64 << 10
    )
    return df.select(
        "doc_id", F.coalesce("payload", F.lit("")).alias("payload")
    )


@register(
    "json_splittable_wrapper",
    oracle="""
SELECT doc_id,
       COALESCE(CASE WHEN doc_id % 4 = 0 THEN replace(text, ' ', chr(34))
                     WHEN doc_id % 4 = 1 THEN replace(text, ' ', chr(92) || chr(34))
                     WHEN doc_id % 4 = 2 THEN replace(text, ' ', chr(10))
                     ELSE text END, '') AS payload
FROM documents
""",
    doc="WRAPPER-OBJECT shape for the splittable JSON reader (round-9 "
    "verdict #3 — generalizes the bare-array precondition): the "
    "documents table is written as {\"source\": ..., \"rows\": [...], "
    "\"n\": ...} files — the most common real-world API-dump layout — "
    "with the same doc_id %% 4 adversarial payload injection as "
    "json_splittable_roundtrip (quotes, backslash+quote pairs, raw "
    "newlines), and read back at 64 KiB splits through "
    "sources/splittable_json.read_json_splittable, which detects the "
    "shape from the head byte and slices elements at depth 2 with the "
    "same state-transfer automaton. Scalar metadata keys before AND "
    "after the array prove wrapper content doesn't confuse element "
    "slicing. Precondition violations RAISE (never silently drop): "
    "non-object elements, object-valued wrapper keys, second arrays, "
    "NDJSON — tests/test_splittable_json.py pins each raise path and "
    "byte-parity vs the native multiLine reader + explode across "
    "split sizes 1..60.",
    tags=("source", "json", "ingest", "scale"),
)
def json_splittable_wrapper(spark: SparkSession, sf_dir: str):
    return _json_splittable(spark, sf_dir, wrapper=True)


@register(
    "sql_recursive_hierarchy",
    oracle="""
WITH RECURSIVE walk(node, amount) AS (
  SELECT CAST(l_partkey AS BIGINT), CAST(l_quantity AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT node // 10, amount FROM walk WHERE node > 0
)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_contrib,
       CAST(SUM(amount) AS BIGINT) AS subtree_qty
FROM walk WHERE node < 1000
GROUP BY 1
""",
    doc="Native recursive CTE (Spark 4 WITH RECURSIVE) — hierarchical "
    "rollup over the implicit decimal category tree parent(p) = p DIV "
    "10: every lineitem walks its ancestor chain to the root, and each "
    "category node aggregates its whole subtree's quantity. The "
    "recursion is row-bounded (each row contributes exactly one "
    "ancestor path of depth <= 6 via UNION ALL — no transitive-closure "
    "path explosion, which matters because Spark's recursive CTE does "
    "not yet support UNION-dedup recursion; the operator-level BFS/SSSP "
    "alternatives in operators/graph.py stay the right tool for "
    "graphs). Engine executes the fixpoint loop itself — depth-bounded "
    "scans, one per level — where the reference would hand the same "
    "hierarchy walk to Snowflake's CONNECT BY / recursive CTE. Both "
    "engines run structurally identical recursive SQL.",
    tags=("sql", "recursive", "hierarchy", "agg"),
)
def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str):
    # Spark's recursion ROW-limit guard defaults to 1M total rows across
    # iterations — fine at the gate scales, tripped by design at 10x
    # (6M lineitems x <=7 ancestor levels ~= 40M recursion rows). The
    # recursion SHAPE is provably bounded (depth <= 7: l_partkey < 10^7,
    # one row per level, no path explosion), so size the guard from the
    # known fan-out instead of the default: 8 x input rows, computed
    # job-free from parquet footer metadata. Raising the guard blindly
    # (-1) would also disarm it for genuinely runaway recursions.
    from .util import parquet_num_rows

    spark.conf.set(
        "spark.sql.cteRecursionRowLimit",
        str(8 * parquet_num_rows(sf_dir, "lineitem")),
    )
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem_rec")
    return spark.sql(
        """
        WITH RECURSIVE walk(node, amount) AS (
          SELECT CAST(l_partkey AS BIGINT), CAST(l_quantity AS BIGINT)
          FROM v_lineitem_rec
          UNION ALL
          SELECT node DIV 10, amount FROM walk WHERE node > 0
        )
        SELECT node, COUNT(*) AS n_contrib, SUM(amount) AS subtree_qty
        FROM walk WHERE node < 1000
        GROUP BY 1
        """
    )


@register(
    "sql_parameterized_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_orderpriority = '1-URGENT'
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
    doc="Parameterized SQL with named arguments + the IDENTIFIER "
    "clause: the table name and every predicate constant arrive as "
    "BOUND PARAMETERS (spark.sql(..., args={...})), not string "
    "interpolation — the injection-safe replacement for the "
    "reference's f-string SQL assembly (/root/reference/step_3_load_"
    "from_stage_to_source.py builds every statement by interpolation). "
    "IDENTIFIER(:tbl) parameterizes the relation itself, which is the "
    "session-variable idiom for multi-tenant / per-layer pipelines "
    "(same query text against source/curated/consumption). The oracle "
    "is the fully-literal equivalent; plans identically to "
    "TakeOrderedAndProject.",
    tags=("sql", "parameterized", "topk"),
)
def sql_parameterized_topk(spark: SparkSession, sf_dir: str):
    t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_param")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM IDENTIFIER(:tbl)
        WHERE o_orderpriority = :prio
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT :k
        """,
        args={"tbl": "v_orders_param", "prio": "1-URGENT", "k": 25},
    )


@register(
    "null_semantics_battery",
    oracle="""
WITH c AS (
  SELECT c_custkey AS k,
         NULLIF(c_mktsegment, 'BUILDING') AS seg,
         CASE WHEN c_custkey % 7 = 0 THEN NULL
              ELSE c_custkey % 5 END AS grp
  FROM customer
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(seg) AS BIGINT) AS n_seg_nonnull,
       CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_distinct_seg,
       CAST(SUM(CASE WHEN seg IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_seg,
       CAST(SUM(CASE WHEN grp NOT IN (1, NULL) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_notin_with_null,
       CAST(SUM(CASE WHEN grp IN (1, NULL) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_in_with_null,
       CAST(SUM(CASE WHEN grp = grp THEN 1 ELSE 0 END) AS BIGINT)
         AS n_self_eq,
       CAST(SUM(CASE WHEN grp IS NOT DISTINCT FROM grp THEN 1 ELSE 0 END)
            AS BIGINT) AS n_self_nullsafe,
       CAST(SUM(COALESCE(grp, -1)) AS BIGINT) AS grp_sum_coalesced,
       CAST(MAX(CASE WHEN seg IS NULL THEN NULL ELSE 1 END) AS BIGINT)
         AS max_ignores_null
FROM c
""",
    doc="Three-valued-logic parity battery in ONE aggregate row: the "
    "NULL behaviors that silently differ between engines-in-spirit "
    "and corrupt migrated pipelines — COUNT(col) vs COUNT(*), "
    "COUNT(DISTINCT) excluding NULLs entirely, `x NOT IN (.., NULL)` being "
    "NEVER true (the classic anti-join rewrite bug: UNKNOWN, not "
    "FALSE, so the count is exactly 0), `x IN (.., NULL)` true only "
    "on a positive match, NULL = NULL yielding UNKNOWN while IS NOT "
    "DISTINCT FROM yields TRUE, aggregate NULL-skipping, and COALESCE "
    "defaults. Every column is an integer count over derived nullable "
    "columns (NULLIF + a modular NULL pattern), so the single output "
    "row pins the full 3VL truth table; a wrong engine default on any "
    "rule flips a count and fails the hash. Complements "
    "nullsafe_join_keys (join-key <=>) with the expression-level "
    "semantics.",
    tags=("semantics", "null", "parity", "agg"),
)
def null_semantics_battery(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None).cast("bigint"))
        .otherwise(F.col("c_custkey") % 5)
        .alias("grp"),
    )
    one_if = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")
    return c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("seg").alias("n_seg_nonnull"),
        F.count_distinct("seg").alias("n_distinct_seg"),
        one_if(F.col("seg").isNull()).alias("n_null_seg"),
        one_if(F.expr("grp NOT IN (1, NULL)")).alias("n_notin_with_null"),
        one_if(F.expr("grp IN (1, NULL)")).alias("n_in_with_null"),
        one_if(F.col("grp") == F.col("grp")).alias("n_self_eq"),
        one_if(F.expr("grp IS NOT DISTINCT FROM grp")).alias("n_self_nullsafe"),
        F.sum(F.coalesce(F.col("grp"), F.lit(-1))).cast("bigint")
        .alias("grp_sum_coalesced"),
        F.max(F.when(F.col("seg").isNull(), F.lit(None)).otherwise(F.lit(1)))
        .cast("bigint")
        .alias("max_ignores_null"),
    )
