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

from ..functions.hashing import decimal_sum, fast_decimal_sum_expr
from .registry import register
from .util import t, t_copurchase_edges


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


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,6))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6 shape: pure scan-filter-aggregate — every predicate must "
    "reach the parquet scan (range + between + less-than pushdown).",
    tags=("agg", "filter", "tpch"),
    bench=True,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    sd = F.col("l_shipdate")
    lo = F.lit("1995-01-01").cast(dict(li.dtypes)["l_shipdate"])
    hi = F.lit("1996-01-01").cast(dict(li.dtypes)["l_shipdate"])
    return (
        li.filter((sd >= lo) & (sd < hi))
        .filter(F.col("l_discount").between(0.03, 0.07))
        .filter(F.col("l_quantity") < 24)
        .agg(
            # r11 fast path: price (2dp) * discount (2dp) is an exact 4dp
            # double, so the unscaled-long sum at scale 6 is result-
            # identical to the per-row DECIMAL(25,6) cast it replaces
            # (see functions.hashing.fast_decimal_sum_expr).
            fast_decimal_sum_expr(
                F.col("l_extendedprice") * F.col("l_discount")
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q10_returned_by_customer",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name AS nation_name,
       CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(25,4))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_items
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY 1, 2, 3
""",
    doc="TPC-H Q10 shape (available columns): revenue lost to returns per "
    "customer. Fact-to-fact join (orders-lineitem) plus broadcast dims.",
    tags=("join", "agg", "tpch"),
)
def q10_returned_by_customer(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    expr = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(25,4)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation_name"))
        .agg(
            F.sum(expr).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q14_promo_effect",
    oracle="""
SELECT (CAST(SUM(CAST(CASE WHEN p.p_type LIKE 'PROMO%'
                 THEN l.l_extendedprice * (1.0 - l.l_discount) ELSE 0.0 END
                 AS DECIMAL(25,4))) AS DOUBLE)
        / CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                 AS DECIMAL(25,4))) AS DOUBLE)) * CAST(100.0 AS DOUBLE)
         AS promo_revenue_pct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1995-09-01'
  AND l.l_shipdate < TIMESTAMP '1995-10-01'
""",
    doc="TPC-H Q14 shape: conditional aggregation over a broadcast "
    "dimension join (promo revenue share).",
    tags=("join", "agg", "tpch"),
)
def q14_promo_effect(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    sd = F.col("l_shipdate")
    ty = dict(li.dtypes)["l_shipdate"]
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), disc).otherwise(F.lit(0.0))
    return (
        li.filter(
            (sd >= F.lit("1995-09-01").cast(ty)) & (sd < F.lit("1995-10-01").cast(ty))
        )
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                (
                    F.sum(promo.cast("decimal(25,4)")).cast("double")
                    / F.sum(disc.cast("decimal(25,4)")).cast("double")
                )
                * F.lit(100.0)
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "json_props_extract",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS k_sum,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max,
       COUNT(*) FILTER (WHERE json_extract_string(props, '$.k') IS NULL)
         AS n_unparsed
FROM events
GROUP BY 1
""",
    doc="Semi-structured path extraction on a live JSON column — the "
    "engine-side analogue of the reference's VARIANT `$1:\"Field\"::type` "
    "loads (SURVEY §2.1 S7; /root/reference/step_3_load_from_stage_to_"
    "source.py:58-76). `from_json` with an explicit schema parses once "
    "into a struct (schema'd, vectorized, JVM-side); malformed documents "
    "yield NULL (PERMISSIVE semantics, counted in n_unparsed) instead of "
    "failing the job. Integer aggregation is exact — no float idiom "
    "needed.",
    tags=("json", "semistruct", "agg"),
)
def json_props_extract(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k BIGINT").getField("k")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.count(F.when(F.col("k").isNull(), 1)).alias("n_unparsed"),
        )
    )


@register(
    "approx_distinct_sketch",
    oracle="""
SELECT e.event_type,
       COUNT(*) AS n_events,
       TRUE AS hll_within_3rsd,
       TRUE AS median_in_iqr
FROM events e
GROUP BY 1
""",
    doc="Approximate aggregates — HyperLogLog++ distinct users and "
    "quantile-sketch value percentiles per event type — oracle-gated as "
    "a BOUNDS proof: raw sketch registers are engine- and merge-order-"
    "specific (not portable), but the CLAIMS a sketch makes are exact-"
    "checkable, so the query emits booleans (|hll - exact| ≤ 3·rsd·exact; "
    "approx median inside the exact p25–p75 IQR) that the DuckDB oracle "
    "pins to TRUE — a sketch drifting out of bounds now hash-fails the "
    "gate instead of hiding behind a rows-only check. The exact "
    "count_distinct/percentile_disc terms exist only to ground the gate; "
    "a production rollup keeps just the sketch columns (fixed-size "
    "state, map-side combinable, one shuffle — exact distinct-count "
    "would shuffle every key; see hll_portable_distinct for the "
    "portable-register variant and the merge-equivalence proof). "
    "Property-test twin: tests/test_properties.py.",
    tags=("agg", "approx", "sketch"),
)
def approx_distinct_sketch(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    # The DISTINCT aggregate runs in its OWN groupBy (r11): mixing
    # count_distinct with the ObjectAgg sketch/percentile functions in
    # one aggregate triggers the multi-distinct Expand rewrite, which
    # doubles the input and drags every sketch through the expanded
    # sort path — measured 3.0s vs 1.0-1.3s warm for the split form at
    # sf0.1. The re-join is a broadcast of one row per event type.
    agg = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", 0.5, 10000).alias("approx_median"),
        F.expr(
            "percentile_disc(0.25) WITHIN GROUP (ORDER BY value)"
        ).alias("p25"),
        F.expr(
            "percentile_disc(0.75) WITHIN GROUP (ORDER BY value)"
        ).alias("p75"),
        F.count(F.lit(1)).alias("n_events"),
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    agg = agg.join(F.broadcast(exact), "event_type")
    return agg.select(
        "event_type",
        "n_events",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.lit(0.06) * F.col("exact_users")
        ).alias("hll_within_3rsd"),
        (
            (F.col("approx_median") >= F.col("p25"))
            & (F.col("approx_median") <= F.col("p75"))
        ).alias("median_in_iqr"),
    )


@register(
    "percentiles_by_status",
    oracle="""
SELECT o_orderstatus,
       PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25,
       PERCENTILE_DISC(0.50) WITHIN GROUP (ORDER BY o_totalprice) AS p50,
       PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS p75,
       PERCENTILE_DISC(0.95) WITHIN GROUP (ORDER BY o_totalprice) AS p95,
       COUNT(*) AS n_orders
FROM orders
GROUP BY 1
""",
    doc="Exact per-group quantiles via SQL-standard PERCENTILE_DISC: "
    "discrete percentiles SELECT an actual member of the group (smallest "
    "value whose cumulative distribution ≥ p) — zero interpolation "
    "arithmetic, so results are engine-exact by construction, unlike "
    "percentile_cont whose lower+(upper-lower)*frac can differ in the "
    "last ulp. Exact quantiles materialize each group's values (fine "
    "for bounded group counts like status); unbounded-cardinality "
    "profiling belongs to approx_distinct_sketch's approx_percentile "
    "path.",
    tags=("agg", "percentile"),
)
def percentiles_by_status(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    pd_ = lambda p: F.expr(  # noqa: E731
        f"percentile_disc({p}) WITHIN GROUP (ORDER BY o_totalprice)"
    )
    return o.groupBy("o_orderstatus").agg(
        pd_(0.25).alias("p25"),
        pd_(0.50).alias("p50"),
        pd_(0.75).alias("p75"),
        pd_(0.95).alias("p95"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "histogram_extendedprice",
    oracle="""
WITH bounds AS (
  SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
  FROM lineitem
)
SELECT CAST(LEAST(floor((l_extendedprice - lo) * 20.0 / (hi - lo)), 19)
            AS BIGINT) AS bucket,
       COUNT(*) AS n_rows,
       MIN(l_extendedprice) AS bucket_min,
       MAX(l_extendedprice) AS bucket_max
FROM lineitem, bounds
GROUP BY 1
""",
    doc="Equi-width 20-bucket histogram of l_extendedprice — the numeric "
    "profiling op behind range-partition planning and data-quality "
    "dashboards. Two passes: a global min/max aggregate (broadcast back "
    "as a 1-row table) and one map-side bucket assignment + count. "
    "Bucket index arithmetic is (x-lo)*20/(hi-lo) with identical "
    "parenthesization on both engines and a floor to integers; the "
    "closed top bucket (LEAST(...,19)) absorbs x = hi exactly. At "
    "100 TB both passes are single map-side-combinable aggregates.",
    tags=("agg", "profile"),
)
def histogram_extendedprice(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )
    bucket = F.least(
        F.floor(
            (F.col("l_extendedprice") - F.col("lo"))
            * F.lit(20.0)
            / (F.col("hi") - F.col("lo"))
        ),
        F.lit(19),
    ).cast("bigint")
    return (
        li.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_extendedprice").alias("bucket_min"),
            F.max("l_extendedprice").alias("bucket_max"),
        )
    )


@register(
    "zscore_by_group",
    oracle="""
WITH stats AS (
  SELECT l_returnflag, l_linestatus,
         COUNT(*) AS n,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR)
              AS DOUBLE) AS s1,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))
                       * CAST(l_extendedprice AS DECIMAL(28,6))) AS VARCHAR)
              AS DOUBLE) AS s2
  FROM lineitem
  GROUP BY 1, 2
)
SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, l.l_linestatus,
       (l.l_extendedprice - (s.s1 / s.n))
         / sqrt((s.s2 - (s.s1 * s.s1) / s.n) / (s.n - 1)) AS z
FROM lineitem l JOIN stats s
  ON s.l_returnflag = l.l_returnflag AND s.l_linestatus = l.l_linestatus
""",
    doc="Per-group z-score normalization of l_extendedprice — the "
    "feature-scaling primitive. Group moments (sum, sum-of-squares) go "
    "through EXACT decimal aggregation (the per-row square is one exact "
    "DECIMAL multiply, the sums are associative) and leave the decimal "
    "domain once via the string route, so mean/variance inputs are "
    "bit-identical doubles in both engines; the remaining arithmetic "
    "((x-mu)/sd with the textbook n-1 variance) is a fixed "
    "parenthesization of IEEE ops written identically on both sides. "
    "Shape at scale: one map-side-combinable aggregate over the fact "
    "table; the groups-sized moment table broadcasts back onto the "
    "scan — no second shuffle of the 100 TB side.",
    tags=("agg", "window", "corpus"),
)
def zscore_by_group(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    dec = F.col("l_extendedprice").cast("decimal(18,6)")
    stats = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("string").cast("double").alias("s1"),
        F.sum(dec * dec).cast("string").cast("double").alias("s2"),
    )
    z = (F.col("l_extendedprice") - (F.col("s1") / F.col("n"))) / F.sqrt(
        (F.col("s2") - (F.col("s1") * F.col("s1")) / F.col("n"))
        / (F.col("n") - 1)
    )
    return li.join(
        F.broadcast(stats), ["l_returnflag", "l_linestatus"]
    ).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
        z.alias("z"),
    )


@register(
    "nullsafe_join_keys",
    oracle="""
WITH l AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 97 = 0 THEN NULL ELSE c_custkey END AS k
  FROM customer WHERE c_custkey % 2 = 0
), r AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 97 = 0 THEN NULL ELSE c_custkey END AS k
  FROM customer WHERE c_custkey % 3 = 0
)
SELECT CAST(SUM(CASE WHEN l.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_pairs,
       CAST(SUM(CASE WHEN l.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_value_pairs,
       COUNT(*) AS n_pairs
FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
""",
    doc="Null-safe equi-join semantics (Spark <=> / eqNullSafe vs SQL IS "
    "NOT DISTINCT FROM): NULL keys MATCH each other instead of "
    "disappearing — the semantic corner that silently loses or "
    "multiplies rows when an engine treats it as plain equality. The "
    "null-key population is deliberately non-trivial (every 97th key on "
    "both sides) so the null-null cross-match contributes a quadratic "
    "term the gate would catch if either engine dropped it. Spark still "
    "plans this as a hash join (null-safe equality is hashable) — not a "
    "nested loop.",
    tags=("join", "semantics"),
)
def nullsafe_join_keys(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    k = F.when(F.col("c_custkey") % 97 == 0, F.lit(None)).otherwise(
        F.col("c_custkey")
    )
    l = c.filter(F.col("c_custkey") % 2 == 0).select(k.alias("lk"))
    r = c.filter(F.col("c_custkey") % 3 == 0).select(k.alias("rk"))
    j = l.join(r, F.col("lk").eqNullSafe(F.col("rk")))
    return j.agg(
        F.sum(F.when(F.col("lk").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null_pairs"),
        F.sum(F.when(F.col("lk").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_value_pairs"),
        F.count(F.lit(1)).alias("n_pairs"),
    )


@register(
    "pagerank_copurchase",
    oracle="""
WITH e AS MATERIALIZED (
  -- MATERIALIZED is load-bearing at sf1 (round-9 verdict #6): without
  -- it DuckDB inlines the lineitem self-join into nodes/deg/c1/c2 and
  -- recomputes the ~240M-row pair build four times — 563s and a 100GB
  -- cap by hand; materialized it runs once and fits the default cap.
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
), nodes AS MATERIALIZED (
  SELECT src AS node FROM e UNION SELECT dst FROM e
), deg AS MATERIALIZED (
  SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1
), n AS (
  SELECT COUNT(*) AS n_nodes FROM nodes
), pr0 AS MATERIALIZED (
  SELECT node, CAST(1000000000000000 AS BIGINT) // n.n_nodes AS pf
  FROM nodes, n
), c1 AS MATERIALIZED (
  SELECT e.dst AS node, SUM(p.pf // d.outdeg) AS s
  FROM e JOIN pr0 p ON p.node = e.src JOIN deg d ON d.src = e.src
  GROUP BY 1
), pr1 AS MATERIALIZED (
  SELECT nodes.node,
         (15 * CAST(1000000000000000 AS BIGINT)) // (100 * n.n_nodes)
         + (85 * COALESCE(c1.s, 0)) // 100 AS pf
  FROM nodes CROSS JOIN n LEFT JOIN c1 ON c1.node = nodes.node
), c2 AS MATERIALIZED (
  SELECT e.dst AS node, SUM(p.pf // d.outdeg) AS s
  FROM e JOIN pr1 p ON p.node = e.src JOIN deg d ON d.src = e.src
  GROUP BY 1
), pr2 AS (
  SELECT nodes.node,
         (15 * CAST(1000000000000000 AS BIGINT)) // (100 * n.n_nodes)
         + (85 * COALESCE(c2.s, 0)) // 100 AS pf
  FROM nodes CROSS JOIN n LEFT JOIN c2 ON c2.node = nodes.node
)
SELECT node, CAST(pf AS BIGINT) AS pr_fixed,
       CAST(pf AS DOUBLE) / CAST(1000000000000000 AS DOUBLE) AS pr
FROM pr2
""",
    doc="PageRank, two synchronous rounds over the part co-purchase graph "
    "(distinct symmetric part pairs within an order — fanout bounded by "
    "order size, so edge construction is O(orders x items^2), never a "
    "global cross join). Third member of the iterative-algorithm family "
    "(connected components, k-means, PageRank), each with a different "
    "fixpoint structure. Per round: one src-keyed join + one dst-keyed "
    "aggregate — the two-shuffle step that scales to billions of edges. "
    "Ranks live in FIXED-POINT integer units of 1e-15 (operators.graph."
    "pagerank_rounds): every step is 64-bit integer multiply/divide/sum, "
    "so results are bit-identical across engines BY CONSTRUCTION — no "
    "float summation order, no decimal-string routing (whose Java "
    "Double.toString quirk bit this query's first float-based draft), "
    "and the aggregate stays a plain map-side-combinable integer SUM. "
    "Quantization error <= outdeg ulps of 1e-15 per round: irrelevant "
    "at ranking precision, and the price of determinism at 100 TB.",
    tags=("graph", "iterative", "join", "agg"),
)
def pagerank_copurchase(spark: SparkSession, sf_dir: str):
    from ..operators.graph import pagerank_rounds

    # Shared session-cached distinct edge table (src-partitioned); the
    # weight column is simply dropped for the unweighted walk.
    edges = t_copurchase_edges(spark, sf_dir).select("src", "dst")
    return pagerank_rounds(edges, n_rounds=2, damping_pct=85)


@register(
    "graph_triangle_count",
    oracle="""
WITH e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), nodes AS (
  SELECT u AS node FROM e UNION SELECT v FROM e
), tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM e e1
  JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
)
SELECT (SELECT COUNT(*) FROM nodes) AS n_nodes,
       (SELECT COUNT(*) FROM e) AS n_edges,
       tri.n_triangles
FROM tri
""",
    doc="Triangle counting over the part co-purchase graph (fourth member "
    "of the iterative/graph family). The engine orients every edge from "
    "its lower-(degree, id) endpoint (operators.graph.triangle_count — "
    "Suri-Vassilvitskii degree orientation), which caps per-node wedge "
    "fanout at O(sqrt(|E|)) regardless of hub skew; the oracle counts "
    "the same triangles with the naive id-orientation (b > a, c > b) — "
    "a genuinely different plan that must agree exactly. Counts are "
    "integers; co-purchase edges are bounded by order size as in "
    "pagerank_copurchase.",
    tags=("graph", "join", "agg"),
    bench=True,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str):
    from ..operators.graph import triangle_count

    # Oriented view of the shared session-cached edge table: both
    # orientations are stored, so src < dst is a narrow filter over
    # cached data — the whole self-join edge build disappears.
    # (r11: a skip-the-distinct + cache-partitioned-degrees variant was
    # measured 1.8× slower at sf1 and reverted — see the operator's
    # docstring note. The materialized distinct stays.)
    edges = (
        t_copurchase_edges(spark, sf_dir)
        .select("src", "dst")
        .filter(F.col("src") < F.col("dst"))
    )
    return triangle_count(edges)


@register(
    "assoc_rules_copurchase",
    oracle="""
WITH basket AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM basket
), item AS (
  SELECT l_partkey, COUNT(*) AS n_item FROM basket GROUP BY 1
), pair AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_both
  FROM basket a JOIN basket b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT p.part_a, p.part_b, p.n_both, ia.n_item AS n_a, ib.n_item AS n_b,
       CAST(p.n_both AS DOUBLE) / n.n_orders AS support,
       CAST(p.n_both AS DOUBLE) / ia.n_item AS confidence,
       CAST(p.n_both * n.n_orders AS DOUBLE) / CAST(ia.n_item * ib.n_item AS DOUBLE)
         AS lift
FROM pair p
JOIN item ia ON ia.l_partkey = p.part_a
JOIN item ib ON ib.l_partkey = p.part_b
CROSS JOIN n
WHERE p.n_both >= 2
""",
    doc="Market-basket association rules over order baskets: co-occurrence "
    "pairs (min support 2 orders) with support / confidence / lift. Pair "
    "generation is the within-basket self-join — fanout bounded by "
    "basket size, never a global cross join; counts are exact integers "
    "and each measure is ONE IEEE division of exact-in-double integer "
    "products (n_both*n_orders <= 2^53), so no decimal routing is "
    "needed. Shape at scale: two map-side-combinable aggregates + the "
    "basket self-join; the item-frequency table is dimension-sized and "
    "broadcasts onto the pair stream.",
    tags=("agg", "join", "basket"),
    bench=True,
)
def assoc_rules_copurchase(spark: SparkSession, sf_dir: str):
    # r11 restructure (guide §2.3/§2.4): the basket-distinct + basket⋈
    # basket self-join needed FOUR basket-sized exchanges (distinct, two
    # join re-shuffles by orderkey, pair aggregate). Collapsing the
    # basket into one per-order sorted part SET (collect_set is map-side
    # partial-aggregatable) generates the same x < y pairs IN-ROW — the
    # cooccurrence_pairs idiom, fanout bounded by basket size — so only
    # the set build and the pair aggregate ever exchange. n_orders and
    # item frequencies become rollups of the persisted set table (the
    # countDistinct turns into a plain count of its rows).
    sets = (
        t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
        .persist()
    )
    n = sets.agg(F.count(F.lit(1)).alias("n_orders"))
    item = (
        sets.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    pair = (
        sets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "ps",
                        lambda x, i: F.transform(
                            F.slice(
                                "ps", i + F.lit(2), F.size("ps") - i - 1
                            ),
                            lambda y: F.struct(
                                x.alias("part_a"), y.alias("part_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 2)
    )
    ia = item.select(
        F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a")
    )
    ib = item.select(
        F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b")
    )
    return (
        pair.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "n_both",
            "n_a",
            "n_b",
            (F.col("n_both").cast("double") / F.col("n_orders")).alias("support"),
            (F.col("n_both").cast("double") / F.col("n_a")).alias("confidence"),
            (
                (F.col("n_both") * F.col("n_orders")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )


@register(
    "contingency_chi2_cells",
    oracle="""
WITH obs AS (
  SELECT o_orderstatus AS status, o_orderpriority AS priority,
         COUNT(*) AS o
  FROM orders GROUP BY 1, 2
), r AS (SELECT status, SUM(o) AS r_tot FROM obs GROUP BY 1),
c AS (SELECT priority, SUM(o) AS c_tot FROM obs GROUP BY 1),
n AS (SELECT SUM(o) AS n_tot FROM obs)
SELECT obs.status, obs.priority, obs.o,
       CAST(r.r_tot * c.c_tot AS DOUBLE) / n.n_tot AS expected,
       ((obs.o - CAST(r.r_tot * c.c_tot AS DOUBLE) / n.n_tot)
        * (obs.o - CAST(r.r_tot * c.c_tot AS DOUBLE) / n.n_tot))
       / (CAST(r.r_tot * c.c_tot AS DOUBLE) / n.n_tot) AS chi2_term
FROM obs
JOIN r ON r.status = obs.status
JOIN c ON c.priority = obs.priority
CROSS JOIN n
""",
    doc="Contingency-table chi-square contributions per (status, priority) "
    "cell: observed count, expected = row_total*col_total/grand_total, "
    "and the (o-e)^2/e term. Expected's numerator is an exact-in-double "
    "integer product (< 2^53) and each term is a fixed 3-op IEEE chain "
    "written identically on both sides — deterministic without decimal "
    "routing. Per-cell output deliberately avoids the global sum (a "
    "partition-order-dependent double reduction); summing the bounded "
    "cell set is the caller's one-liner. Shape: one count aggregate + "
    "two groups-sized rollups broadcast back.",
    tags=("agg", "profile", "stats"),
)
def contingency_chi2_cells(spark: SparkSession, sf_dir: str):
    obs = (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
    )
    r = obs.groupBy("status").agg(F.sum("o").alias("r_tot"))
    c = obs.groupBy("priority").agg(F.sum("o").alias("c_tot"))
    n = obs.agg(F.sum("o").alias("n_tot"))
    e = (F.col("r_tot") * F.col("c_tot")).cast("double") / F.col("n_tot")
    term = ((F.col("o") - e) * (F.col("o") - e)) / e
    return (
        obs.join(F.broadcast(r), "status")
        .join(F.broadcast(c), "priority")
        .crossJoin(F.broadcast(n))
        .select("status", "priority", "o", e.alias("expected"), term.alias("chi2_term"))
    )


_COPURCHASE_EDGES = """
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""


@register(
    "graph_kcore_peel",
    # Multiply-referenced CTEs carry MATERIALIZED: DuckDB 1.0 inlines
    # CTEs per reference, so without the hint the lineitem self-join
    # re-runs once per reference — exponentially through the chained
    # peel rounds (e1 references e0 twice, e2 references e1 twice...).
    # Harmless at gate scales, a >300s timeout at sf1; materialized the
    # whole oracle runs in ~3s at 12M edges.
    oracle=f"""
WITH e0 AS MATERIALIZED ({_COPURCHASE_EDGES}),
d1 AS (
  SELECT node, COUNT(*) AS c FROM (
    SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0
  ) GROUP BY 1
),
k1 AS (SELECT node FROM d1 WHERE c >= 3),
e1 AS MATERIALIZED (
  SELECT e0.u, e0.v FROM e0
  JOIN k1 a ON a.node = e0.u JOIN k1 b ON b.node = e0.v
),
d2 AS (
  SELECT node, COUNT(*) AS c FROM (
    SELECT u AS node FROM e1 UNION ALL SELECT v FROM e1
  ) GROUP BY 1
),
k2 AS (SELECT node FROM d2 WHERE c >= 3),
e2 AS MATERIALIZED (
  SELECT e1.u, e1.v FROM e1
  JOIN k2 a ON a.node = e1.u JOIN k2 b ON b.node = e1.v
)
SELECT node, COUNT(*) AS deg FROM (
  SELECT u AS node FROM e2 UNION ALL SELECT v FROM e2
) GROUP BY 1
""",
    doc="Two peeling rounds toward the 3-core of the co-purchase graph "
    "(operators.graph.kcore_peel): drop degree<3 nodes and their edges, "
    "twice; output survivors with residual degree. Fifth member of the "
    "graph family — the dense-substructure filter used to isolate "
    "well-connected product communities (and, in corpus land, tightly "
    "interlinked near-dup clusters) before running costlier analytics "
    "inside them. Bounded rounds keep it gate-comparable; each round is "
    "one degree aggregate + two semi joins, O(|E|) per round.",
    tags=("graph", "iterative", "agg"),
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str):
    from ..operators.graph import kcore_peel

    # Oriented view (src < dst) of the shared session-cached edge table.
    edges = (
        t_copurchase_edges(spark, sf_dir)
        .select("src", "dst")
        .filter(F.col("src") < F.col("dst"))
    )
    return kcore_peel(edges, k=3, rounds=2)


@register(
    "regression_trend_by_priority",
    oracle="""
WITH pts AS (
  SELECT o_orderpriority,
         CAST(date_diff('day', DATE '1995-01-01',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
         CAST(o_totalprice AS DECIMAL(18,6)) AS y
  FROM orders
), m AS (
  SELECT o_orderpriority,
         COUNT(*) AS n,
         SUM(x) AS sx,
         SUM(x * x) AS sxx,
         CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(x AS DECIMAL(18,0)) * y) AS VARCHAR) AS DOUBLE)
           AS sxy
  FROM pts GROUP BY 1
)
SELECT o_orderpriority, n,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
       (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
         AS intercept
FROM m
""",
    doc="Per-priority OLS trend of order value over time, from EXACT "
    "moment sums: x (epoch days) moments are 64-bit integer sums, y and "
    "xy moments are exact decimal sums leaving the decimal domain once "
    "via the string route — so the closed-form slope/intercept inputs "
    "are bit-identical doubles in both engines, and the remaining "
    "arithmetic is a fixed parenthesization of IEEE ops written "
    "identically on both sides. Contrast with built-in regr_slope, "
    "whose running-covariance accumulation is partition-order-dependent "
    "and NOT gate-comparable. Shape: one map-side-combinable aggregate "
    "over the fact table; integer headroom documented in-line (n·Sxx "
    "≈ 1e17 < 2^63 at sf0.1; scaled-up callers widen x to DECIMAL).",
    tags=("agg", "stats", "ml"),
)
def regression_trend_by_priority(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    x = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
    ).cast("bigint")
    y = F.col("o_totalprice").cast("decimal(18,6)")
    m = o.select(
        "o_orderpriority", x.alias("x"), y.alias("y")
    ).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").cast("string").cast("double").alias("sy"),
        F.sum(F.col("x").cast("decimal(18,0)") * F.col("y"))
        .cast("string")
        .cast("double")
        .alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        "o_orderpriority",
        "n",
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("intercept"),
    )


@register(
    "graph_edge_similarity",
    # Oracle counts common neighbors by DEGREE-ORIENTED TRIANGLE
    # ENUMERATION (orient every edge from the (degree, id)-smaller
    # endpoint; wedge-join the two out-edges at each apex, close
    # against the canonical edge list, then credit each triangle to
    # its three edges). The earlier per-edge wedge join expanded every
    # edge by its endpoint's full neighborhood — Σ_e d(u) ≈ 1.4e9
    # probe rows at sf1, a >9-min DuckDB run; orientation bounds the
    # apex out-degree by O(sqrt E) and finishes the same counts in
    # ~90s. common(u,v) = triangles through (u,v) — an exact identity,
    # verified value-equal to the wedge formulation at the gate scale.
    oracle=f"""
WITH e0 AS MATERIALIZED ({_COPURCHASE_EDGES}),
und AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
deg AS MATERIALIZED (SELECT u AS node, COUNT(*) AS d FROM und GROUP BY 1),
o AS MATERIALIZED (
  SELECT CASE WHEN (du.d, x.u) < (dv.d, x.v) THEN x.u ELSE x.v END AS a,
         CASE WHEN (du.d, x.u) < (dv.d, x.v) THEN x.v ELSE x.u END AS b
  FROM e0 x JOIN deg du ON du.node = x.u JOIN deg dv ON dv.node = x.v
),
tri AS MATERIALIZED (
  SELECT p.a AS x, p.b AS y, q.b AS z
  FROM o p JOIN o q ON q.a = p.a AND p.b < q.b
  JOIN e0 w ON w.u = p.b AND w.v = q.b
),
common AS MATERIALIZED (
  SELECT u, v, COUNT(*) AS c FROM (
    SELECT LEAST(x, y) AS u, GREATEST(x, y) AS v FROM tri
    UNION ALL SELECT LEAST(x, z), GREATEST(x, z) FROM tri
    UNION ALL SELECT LEAST(y, z), GREATEST(y, z) FROM tri
  ) GROUP BY 1, 2
)
SELECT e.u, e.v,
       COALESCE(c.c, 0) AS common,
       du.d AS deg_u, dv.d AS deg_v,
       CASE WHEN du.d + dv.d - 2 - COALESCE(c.c, 0) > 0
            THEN CAST(COALESCE(c.c, 0) AS DOUBLE)
                 / (du.d + dv.d - 2 - COALESCE(c.c, 0)) END AS nb_jaccard
FROM e0 e
LEFT JOIN common c ON c.u = e.u AND c.v = e.v
JOIN deg du ON du.node = e.u
JOIN deg dv ON dv.node = e.v
""",
    doc="Link-prediction features per co-purchase edge: common-neighbor "
    "count and neighborhood Jaccard (operators.graph."
    "edge_neighborhood_similarity — in-row adjacency intersection, the "
    "triangle_count shape reused). Oracle: degree-oriented triangle "
    "enumeration credited back to edges, a genuinely different plan. "
    "Integer counts + one division; 0/0 edges yield NULL identically.",
    tags=("graph", "join", "ml"),
)
def graph_edge_similarity(spark: SparkSession, sf_dir: str):
    from ..operators.graph import edge_neighborhood_similarity

    # Oriented view (src < dst) of the shared session-cached edge table.
    edges = (
        t_copurchase_edges(spark, sf_dir)
        .select("src", "dst")
        .filter(F.col("src") < F.col("dst"))
    )
    return edge_neighborhood_similarity(edges)


@register(
    "graph_label_propagation",
    oracle="""
WITH e AS MATERIALIZED (
  -- materialized: the lineitem self-join is referenced by r1, r2, deg,
  -- tot AND intra — inlined, DuckDB runs it five times (round-10
  -- verdict #6 sf1 oracle-cost rule)
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
), r1 AS (
  SELECT u AS node, label FROM (
    SELECT u, label, c,
           row_number() OVER (PARTITION BY u ORDER BY c DESC, label) AS rn
    FROM (SELECT e.u, e.v AS label, COUNT(*) AS c FROM e GROUP BY 1, 2)
  ) WHERE rn = 1
), r2 AS MATERIALIZED (
  -- materialized: referenced by intra (twice) and comm
  SELECT u AS node, label FROM (
    SELECT u, label, c,
           row_number() OVER (PARTITION BY u ORDER BY c DESC, label) AS rn
    FROM (SELECT e.u, l.label, COUNT(*) AS c
          FROM e JOIN r1 l ON l.node = e.v GROUP BY 1, 2)
  ) WHERE rn = 1
)
SELECT node, label FROM r2
""",
    doc="Bounded-round synchronous label propagation (community detection) "
    "over the part co-purchase graph — fifth member of the iterative "
    "family, with a different update rule than connected components: "
    "most-frequent neighbor label, ties to the MINIMUM label "
    "(deterministic total order; classic random-tie LPA is not gate-"
    "comparable). operators.graph.label_propagation_rounds: the edge "
    "list is dedup'd INSIDE its one hash(v) partitioning exchange "
    "(HashPartitioning(v) satisfies the distinct's clustered(u,v)) and "
    "persisted with that partitioning, so each round's edge⋈labels "
    "join re-exchanges only the node-sized label table; the per-round "
    "moving data is the map-side-combined (node, label) histogram plus "
    "a max_by((count, -label)) argmax — no row ever carries more than "
    "one label, no edge-sized shuffle after the build. The oracle "
    "replays both rounds as grouped row_number picks — a structurally "
    "different plan that must agree exactly.",
    tags=("graph", "iterative", "agg"),
    bench=True,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str):
    from ..operators.graph import label_propagation_rounds

    # Shared session-cached DISTINCT edge table: the one-time edge
    # materialization was LPA's measured floor (round-4 verdict) and is
    # now amortized across every graph query in the session. The table
    # arrives deduped and src-partitioned, so LPA's internal (u, v)
    # dedup is a no-op over already-unique rows and its u-clustered
    # aggregate needs no fresh exchange.
    edges = t_copurchase_edges(spark, sf_dir).select("src", "dst")
    # symmetric + prepartitioned_distinct: the shared table carries
    # both orientations, is distinct by construction, and arrives
    # hash-partitioned by src — LPA's alias swap reuses that layout
    # with ZERO edge exchange (r11; was a 51 MB repartition-by-v).
    return label_propagation_rounds(
        edges, n_rounds=2, symmetric=True, prepartitioned_distinct=True
    )


@register(
    "graph_community_modularity",
    oracle="""
WITH e AS MATERIALIZED (
  -- materialized: the lineitem self-join is referenced by r1, r2, deg,
  -- tot AND intra — inlined, DuckDB runs it five times (round-10
  -- verdict #6 sf1 oracle-cost rule)
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
), r1 AS (
  SELECT u AS node, label FROM (
    SELECT u, label, c,
           row_number() OVER (PARTITION BY u ORDER BY c DESC, label) AS rn
    FROM (SELECT e.u, e.v AS label, COUNT(*) AS c FROM e GROUP BY 1, 2)
  ) WHERE rn = 1
), r2 AS MATERIALIZED (
  -- materialized: referenced by intra (twice) and comm
  SELECT u AS node, label FROM (
    SELECT u, label, c,
           row_number() OVER (PARTITION BY u ORDER BY c DESC, label) AS rn
    FROM (SELECT e.u, l.label, COUNT(*) AS c
          FROM e JOIN r1 l ON l.node = e.v GROUP BY 1, 2)
  ) WHERE rn = 1
), deg AS (
  SELECT u AS node, COUNT(*) AS d FROM e GROUP BY 1
), tot AS (
  SELECT COUNT(*) AS e2 FROM e
), intra AS (
  SELECT la.label, COUNT(*) AS intra_edges
  FROM e
  JOIN r2 la ON la.node = e.u
  JOIN r2 lb ON lb.node = e.v
  WHERE la.label = lb.label
  GROUP BY 1
), comm AS (
  SELECT r2.label,
         CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(deg.d) AS BIGINT) AS degree_sum
  FROM r2 JOIN deg ON deg.node = r2.node
  GROUP BY 1
)
SELECT c.label, c.n_nodes,
       CAST(COALESCE(i.intra_edges, 0) AS BIGINT) AS intra_edges,
       c.degree_sum,
       CAST(tot.e2 AS BIGINT) AS e2,
       CAST(COALESCE(i.intra_edges, 0) * tot.e2
            - c.degree_sum * c.degree_sum AS BIGINT) AS modularity_term_num
FROM comm c LEFT JOIN intra i ON i.label = c.label, tot
""",
    doc="Community quality for the LPA partition (graph_label_propagation's "
    "labels): per-community intra-edge count, degree mass, and the "
    "modularity contribution kept as the EXACT INTEGER numerator "
    "intra_c*2m - deg_c^2 (global Q = sum(term)/(2m)^2) — modularity "
    "never crosses an aggregation boundary as a float, so community "
    "ranking and the gate comparison are engine-exact; the single "
    "float division is left to the consumer. Shape at scale: labels "
    "are two bounded LPA rounds (node-keyed shuffles); intra-edges is "
    "the edge list with two label lookups joined on its endpoints "
    "(node-keyed, never pair-wise); degree mass reuses the node-keyed "
    "degree aggregate. Nothing materializes more than O(|E|) rows.",
    tags=("graph", "iterative", "agg", "eval"),
)
def graph_community_modularity(spark: SparkSession, sf_dir: str):
    from ..operators.graph import label_propagation_rounds

    # Shared session-cached distinct edge table (already persisted —
    # no per-query persist/unpersist lifecycle to manage here).
    edges = t_copurchase_edges(spark, sf_dir).select("src", "dst")
    # symmetric + prepartitioned_distinct: same zero-edge-exchange
    # reuse of the shared table's layout as graph_label_propagation.
    labels = label_propagation_rounds(
        edges, n_rounds=2, symmetric=True, prepartitioned_distinct=True
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    tot = edges.agg(F.count(F.lit(1)).cast("bigint").alias("e2"))
    la = labels.select(F.col("node").alias("src"), F.col("label").alias("lab_a"))
    lb = labels.select(F.col("node").alias("dst"), F.col("label").alias("lab_b"))
    intra = (
        edges.join(la, "src")
        .join(lb, "dst")
        .filter(F.col("lab_a") == F.col("lab_b"))
        .groupBy(F.col("lab_a").alias("label"))
        .agg(F.count(F.lit(1)).alias("intra_edges"))
    )
    comm = (
        labels.join(deg, "node")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("d").cast("bigint").alias("degree_sum"),
        )
    )
    out = (
        comm.join(intra, "label", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "label",
            "n_nodes",
            F.coalesce(F.col("intra_edges"), F.lit(0)).cast("bigint").alias(
                "intra_edges"
            ),
            "degree_sum",
            "e2",
            (
                F.coalesce(F.col("intra_edges"), F.lit(0)).cast("bigint")
                * F.col("e2")
                - F.col("degree_sum") * F.col("degree_sum")
            ).cast("bigint").alias("modularity_term_num"),
        )
    )
    return out


@register(
    "graph_bfs_layers",
    oracle="""
WITH RECURSIVE e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
), seed AS (
  SELECT u AS node FROM (
    SELECT u, COUNT(*) AS c FROM e GROUP BY 1
    ORDER BY c DESC, u ASC LIMIT 1
  )
), walk(node, dist) AS (
  SELECT node, 0 FROM seed
  UNION
  SELECT e.v, w.dist + 1
  FROM walk w JOIN e ON e.u = w.node
  WHERE w.dist < 3
)
SELECT node, CAST(MIN(dist) AS INT) AS dist
FROM walk GROUP BY 1
""",
    doc="Bounded breadth-first distances (3 hops) from the top-degree "
    "part in the co-purchase graph — the sixth iterative-family member "
    "and the reachability primitive behind 'related products within k "
    "steps' and taxonomy blast-radius queries. operators.graph."
    "bfs_layers expands only the previous FRONTIER per round (one "
    "src-keyed join + anti-join against settled, lazily checkpointed, "
    "probe-materialized, caches released per round), so total work is "
    "O(edges within k hops), not O(rounds x graph). The seed is the "
    "deterministic (degree DESC, id) argmax. The oracle is a "
    "recursive-CTE walk with UNION-dedup on (node, dist) states and "
    "MIN-dist collapse — a different formulation that must agree "
    "exactly.",
    tags=("graph", "iterative", "join"),
)
def graph_bfs_layers(spark: SparkSession, sf_dir: str):
    from ..operators.graph import bfs_layers

    # Shared session-cached distinct edge table (both orientations).
    edges = t_copurchase_edges(spark, sf_dir).select("src", "dst")
    seed = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("node").asc())
        .limit(1)
        .select("node")
    )
    return bfs_layers(edges, seed, max_depth=3)


@register(
    "graph_sssp_weighted",
    oracle="""
WITH pairs AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v,
         CAST(1 + LEAST(a.l_quantity, b.l_quantity) AS BIGINT) AS w
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
), e AS MATERIALIZED (
  -- MATERIALIZED is load-bearing at sf1 (round-9 verdict #6): inlined,
  -- DuckDB recomputes the lineitem-pair build inside seed/d1/d2/d3 and
  -- exhausted spill disk when heavy oracles overlapped; materialized
  -- the pair build runs once.
  SELECT u, v, MIN(w) AS w FROM pairs GROUP BY 1, 2
), seed AS (
  SELECT u AS node FROM (
    SELECT u, COUNT(*) AS c FROM e GROUP BY 1
    ORDER BY c DESC, u ASC LIMIT 1
  )
), d0 AS (
  SELECT node, CAST(0 AS BIGINT) AS dist FROM seed
), d1 AS MATERIALIZED (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d0
    UNION ALL
    SELECT e.v, d0.dist + e.w FROM d0 JOIN e ON e.u = d0.node
  ) GROUP BY 1
), d2 AS MATERIALIZED (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d1
    UNION ALL
    SELECT e.v, d1.dist + e.w FROM d1 JOIN e ON e.u = d1.node
  ) GROUP BY 1
), d3 AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d2
    UNION ALL
    SELECT e.v, d2.dist + e.w FROM d2 JOIN e ON e.u = d2.node
  ) GROUP BY 1
)
SELECT node, CAST(dist AS BIGINT) AS dist FROM d3
""",
    doc="Weighted single-source shortest paths (3 Bellman-Ford rounds) "
    "from the top-degree part over the co-purchase graph, edge weight "
    "= 1 + min co-purchased quantity (integer -> deterministic dists). "
    "The weighted complement of graph_bfs_layers: hop counts become "
    "path costs, which is the primitive behind cheapest-substitution "
    "chains and weighted taxonomy distance. operators.graph."
    "sssp_rounds relaxes only the IMPROVED frontier per round (k "
    "frontier rounds provably equal k full relaxations), min-combines "
    "candidates map-side before touching the distance table, and "
    "keeps the round discipline (lazy localCheckpoint, probe "
    "materialization, cache release, early exit). The oracle unrolls "
    "the same three relaxations as nested full-table min-merges — a "
    "different formulation that must agree exactly.",
    tags=("graph", "iterative", "join", "weighted"),
    bench=True,
)
def graph_sssp_weighted(spark: SparkSession, sf_dir: str):
    from ..operators.graph import sssp_rounds

    # Shared session-cached weighted edge table — the in-row k² basket
    # explode + min-combine construction lives in
    # plans/util.t_copurchase_edges and is built once per session.
    edges = t_copurchase_edges(spark, sf_dir)
    seed = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("node").asc())
        .limit(1)
        .select("node")
    )
    return sssp_rounds(edges, seed, rounds=3)


@register(
    "json_variant_native",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS k_sum,
       CAST(SUM(COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT),
                         -1)) AS BIGINT) AS mk_sum,
       CAST(SUM(user_id) AS BIGINT) AS u_sum,
       CAST(COUNT(*) AS BIGINT) AS n_tag0_match,
       'OBJECT<m: OBJECT<k: BIGINT>, tags: ARRAY<STRING>, u: BIGINT>'
         AS nested_schema
FROM events
GROUP BY 1
""",
    doc="NATIVE VARIANT parity (SURVEY §2.1 S7): the reference loads "
    "semi-structured files through a schemaless VARIANT and extracts "
    "typed paths ($1:\"Field\"::type — /root/reference/step_3_load_"
    "from_stage_to_source.py:58-76). Spark 4 has the real thing: "
    "try_parse_json -> VariantType (schemaless, malformed -> NULL), "
    "variant_get typed path extraction including NESTED object and "
    "ARRAY INDEX paths, schema_of_variant introspection. The query "
    "parses the live props column, then round-trips a CONSTRUCTED "
    "nested document {u, tags[], m{k}} through to_json -> parse_json "
    "-> $.m.k / $.tags[0] / $.u, proving the full path grammar; the "
    "recovered values must reconcile with the flat columns they came "
    "from (mk_sum = k_sum with NULL ks pinned to -1; tags[0] always "
    "matches event_type; the per-row variant schema is the constant "
    "the oracle hardcodes). Complements json_props_extract "
    "(from_json with a DECLARED schema): VARIANT is the schema-on-"
    "read path, from_json the schema-on-write one — the same split "
    "the reference's stage-vs-table layers draw.",
    tags=("json", "semistruct", "variant", "agg"),
)
def json_variant_native(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    live = F.try_parse_json(F.col("props"))
    vk = F.variant_get(live, "$.k", "bigint")
    nested_json = F.to_json(
        F.struct(
            F.col("user_id").alias("u"),
            F.array(F.col("event_type")).alias("tags"),
            F.struct(F.coalesce(vk, F.lit(-1)).alias("k")).alias("m"),
        )
    )
    nv = F.parse_json(nested_json)
    mk = F.variant_get(nv, "$.m.k", "bigint")
    tag0 = F.variant_get(nv, "$.tags[0]", "string")
    uu = F.variant_get(nv, "$.u", "bigint")
    return (
        e.select(
            "event_type", vk.alias("vk"), mk.alias("mk"), uu.alias("uu"),
            tag0.alias("tag0"), F.schema_of_variant(nv).alias("sch"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("vk").alias("k_sum"),
            F.sum("mk").alias("mk_sum"),
            F.sum("uu").alias("u_sum"),
            F.count(F.when(F.col("tag0") == F.col("event_type"), 1)).alias(
                "n_tag0_match"
            ),
            F.min("sch").alias("nested_schema"),
        )
    )


@register(
    "graph_clustering_coefficient",
    oracle="""
WITH e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT u AS node FROM e UNION ALL SELECT v FROM e
  ) GROUP BY 1
), tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM e e1
  JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
), credit AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
), nt AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM credit GROUP BY 1
)
SELECT d.node, d.deg, COALESCE(nt.n_tri, 0) AS n_tri
FROM deg d LEFT JOIN nt ON nt.node = d.node
WHERE d.deg >= 2
""",
    doc="Per-node triangle participation + degree — the integer "
    "numerators of the LOCAL CLUSTERING COEFFICIENT 2*n_tri/"
    "(deg*(deg-1)), the node-level cohesion feature global triangle "
    "counting can't give (a hub with many triangles may still be a "
    "sparse star; a small tight clique maxes the coefficient). Same "
    "degree-oriented in-row intersection as graph_triangle_count "
    "(operators.graph.triangle_counts_per_node) with per-member "
    "attribution: each closing intersection credits both oriented "
    "endpoints by its size and each closer once, so every triangle "
    "counts exactly once per member. The oracle re-derives the credits "
    "from naive id-oriented triangle enumeration — a different plan "
    "that must agree node-by-node.",
    tags=("graph", "join", "agg", "ml"),
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str):
    from ..operators.graph import triangle_counts_per_node

    # Oriented view (src < dst) of the shared session-cached edge table.
    edges = (
        t_copurchase_edges(spark, sf_dir)
        .select("src", "dst")
        .filter(F.col("src") < F.col("dst"))
    )
    return triangle_counts_per_node(edges)


#: Bloom layout: 66 words x 62 usable bits = 4092 bits, 3 multiplicative
#: hashes. 62-bit masks keep 1 << pos inside signed-64 range on BOTH
#: engines (bit 63 would overflow DuckDB's signed shift).
_BLOOM_BITS = 4092
_BLOOM_HASHES = (2654435761, 2246822519, 3266489917)


def _bloom_bit_sql(key: str, a: int) -> str:
    return f"((({key} % 2147483647) * {a}) % 2147483647) % {_BLOOM_BITS}"


@register(
    "bloom_filter_semijoin",
    oracle=f"""
WITH members AS (
  SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
), bits AS (
  {' UNION ALL '.join(
      f"SELECT ({_bloom_bit_sql('k', a)}) AS bit FROM members"
      for a in _BLOOM_HASHES
  )}
), words AS (
  SELECT bit // 62 AS word, bit_or(1::BIGINT << (bit % 62)) AS mask
  FROM bits GROUP BY 1
), probes AS (
  SELECT DISTINCT o_custkey AS k FROM orders
), probe_bits AS (
  {' UNION ALL '.join(
      f"SELECT k, ({_bloom_bit_sql('k', a)}) AS bit FROM probes"
      for a in _BLOOM_HASHES
  )}
), checked AS (
  SELECT pb.k,
         CASE WHEN (w.mask & (1::BIGINT << (pb.bit % 62))) <> 0
              THEN 1 ELSE 0 END AS hit
  FROM probe_bits pb LEFT JOIN words w ON w.word = pb.bit // 62
), verdicts AS (
  SELECT k, CAST(MIN(hit) AS BIGINT) AS passes FROM checked GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(v.passes) AS BIGINT) AS n_pass,
       CAST(SUM(CASE WHEN m.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_true_members,
       CAST(SUM(CASE WHEN v.passes = 1 AND m.k IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_positives
FROM verdicts v LEFT JOIN members m ON m.k = v.k
""",
    doc="Distributed Bloom-filter semi-join — the mechanism behind "
    "runtime row-group filters and shuffle-pruning at 100 TB: the "
    "BUILDING-segment customer keys are folded into a 4092-bit filter "
    "(66 x 62-bit words; per-key work is a 3-row explode, the filter "
    "build is one 66-group BIT_OR aggregate — map-side combinable, "
    "broadcastable at any build-side cardinality), then every distinct "
    "orders customer probes it (broadcast join against the 66-word "
    "table, MIN-of-hits verdict) and the query reports the measured "
    "false-positive count against exact membership. Everything is "
    "integer bit arithmetic on deterministic multiplicative hashes, so "
    "— unlike engine-internal bloom sketches — the whole structure is "
    "oracle-exact: DuckDB rebuilds the identical filter bit-for-bit. "
    "Complements dynamic_filter_join (which gates Spark's own runtime "
    "IN-pruning) by making the filter itself a first-class, portable "
    "operator with a measured FP rate.",
    tags=("join", "bloom", "sketch", "runtime-filter"),
    bench=True,
)
def bloom_filter_semijoin(spark: SparkSession, sf_dir: str):
    members = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
    )

    def bloom_bit(a: int):
        return (
            F.pmod(F.pmod(F.col("k"), F.lit(2147483647)) * F.lit(a),
                   F.lit(2147483647))
            % F.lit(_BLOOM_BITS)
        )

    def explode_bits(df):
        return df.select(
            "k", F.explode(F.array(*[bloom_bit(a) for a in _BLOOM_HASHES]))
            .alias("bit")
        )

    words = (
        explode_bits(members)
        .groupBy(F.expr("bit DIV 62").alias("word"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 62 AS INT))")
            ).alias("mask")
        )
    )
    probes = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k")
    ).distinct()
    checked = (
        explode_bits(probes)
        .join(F.broadcast(words), F.expr("bit DIV 62") == F.col("word"), "left")
        .select(
            "k",
            F.when(
                F.expr(
                    "(mask & shiftleft(CAST(1 AS BIGINT),"
                    " CAST(bit % 62 AS INT))) <> 0"
                ), 1
            ).otherwise(0).alias("hit"),
        )
    )
    verdicts = checked.groupBy("k").agg(
        F.min("hit").cast("bigint").alias("passes")
    )
    joined = verdicts.join(
        members.withColumnRenamed("k", "mk"),
        F.col("k") == F.col("mk"), "left",
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum("passes").alias("n_pass"),
        F.sum(F.when(F.col("mk").isNotNull(), 1).otherwise(0)).cast("bigint")
        .alias("n_true_members"),
        F.sum(
            F.when((F.col("passes") == 1) & F.col("mk").isNull(), 1).otherwise(0)
        ).cast("bigint").alias("n_false_positives"),
    )


_CMS_W = 1024


@register(
    "cms_heavy_hitters",
    oracle=f"""
WITH keys AS (
  SELECT o_custkey AS k FROM orders
), counters AS (
  {' UNION ALL '.join(
      f"SELECT {d} AS d, ({_bloom_bit_sql('k', a)}) % {_CMS_W} AS idx, "
      f"CAST(COUNT(*) AS BIGINT) AS c FROM keys GROUP BY 2"
      for d, a in enumerate(_BLOOM_HASHES)
  )}
), merged AS (
  SELECT d, idx, CAST(SUM(c) AS BIGINT) AS c FROM counters GROUP BY 1, 2
), exact AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS true_cnt FROM keys GROUP BY 1
), top AS (
  SELECT k, true_cnt FROM exact
  ORDER BY true_cnt DESC, k ASC LIMIT 20
), probe AS (
  {' UNION ALL '.join(
      f"SELECT k, true_cnt, {d} AS d, ({_bloom_bit_sql('k', a)}) % {_CMS_W} "
      f"AS idx FROM top"
      for d, a in enumerate(_BLOOM_HASHES)
  )}
), est AS (
  SELECT p.k, p.true_cnt, CAST(MIN(m.c) AS BIGINT) AS cms_est
  FROM probe p JOIN merged m ON m.d = p.d AND m.idx = p.idx
  GROUP BY 1, 2
)
SELECT k AS custkey, true_cnt, cms_est,
       cms_est - true_cnt AS overestimate
FROM est
""",
    doc="Count-min sketch frequency estimation, oracle-EXACT: order "
    "custkeys stream into a depth-3 x width-1024 counter grid (per-"
    "row work is a 3-row explode; the sketch build is ONE 3072-group "
    "integer aggregate — map-side combinable, mergeable across "
    "partitions/days by simple addition, fixed 24 KB state at ANY "
    "stream size, which is the whole point at 100 TB), then the 20 "
    "exact-heaviest keys probe it and the query reports estimate vs "
    "truth — materializing CMS's one-sided guarantee (est >= true; "
    "overflow only from hash collisions) as auditable integers. "
    "Deterministic multiplicative hashes make the sketch portable: "
    "DuckDB rebuilds the identical grid, unlike engine-internal "
    "sketches (approx_distinct_sketch gates its non-portable HLL++ "
    "registers via exact BOUNDS booleans instead). Third member of "
    "the portable-sketch family with "
    "the Bloom semi-join and the MinHash/SimHash signatures.",
    tags=("agg", "sketch", "heavy-hitters"),
    bench=True,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str):
    keys = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))

    def cms_cells(df):
        cells = [
            F.struct(
                F.lit(d).alias("d"),
                (
                    F.pmod(
                        F.pmod(F.col("k"), F.lit(2147483647)) * F.lit(a),
                        F.lit(2147483647),
                    )
                    % F.lit(_BLOOM_BITS) % F.lit(_CMS_W)
                ).alias("idx"),
            )
            for d, a in enumerate(_BLOOM_HASHES)
        ]
        return df.select("*", F.explode(F.array(*cells)).alias("cell")).select(
            *df.columns, F.col("cell.d").alias("d"), F.col("cell.idx").alias("idx")
        )

    merged = cms_cells(keys).groupBy("d", "idx").agg(
        F.count(F.lit(1)).alias("c")
    )
    exact = keys.groupBy("k").agg(F.count(F.lit(1)).alias("true_cnt"))
    top = exact.orderBy(F.col("true_cnt").desc(), F.col("k")).limit(20)
    probed = cms_cells(top).join(F.broadcast(merged), ["d", "idx"])
    return (
        probed.groupBy("k", "true_cnt")
        .agg(F.min("c").cast("bigint").alias("cms_est"))
        .select(
            F.col("k").alias("custkey"),
            "true_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("true_cnt")).alias("overestimate"),
        )
    )


def _hll_regs(u, key="event_type"):
    """(key, bucket, reg) register table from distinct keys ``u``
    (key, k) — the mergeable sketch state: registers from two
    disjoint key sets combine by per-bucket MAX."""
    hashed = u.select(
        key, F.md5(F.col("k").cast("string")).alias("h")
    ).select(
        key,
        (F.conv(F.substring("h", 1, 2), 16, 10).cast("bigint") % 64)
        .alias("bucket"),
        F.conv(F.substring("h", 3, 12), 16, 10).cast("bigint").alias("v"),
    )
    rank = F.least(
        F.when(F.col("v") == 0, F.lit(49)).otherwise(
            F.lit(49) - F.length(F.bin(F.col("v").cast("bigint")))
        ),
        F.lit(40),
    )
    return (
        hashed.select(key, "bucket", rank.alias("rank"))
        .groupBy(key, "bucket")
        .agg(F.max("rank").cast("bigint").alias("reg"))
    )


#: linear-counting table round(m*ln(m/V)) for V=1..64, precomputed in
#: Python so BOTH engines share identical integer literals.
_HLL_LC = [266, 222, 196, 177, 163, 151, 142, 133, 126, 119, 113, 107,
           102, 97, 93, 89, 85, 81, 78, 74, 71, 68, 65, 63, 60, 58, 55,
           53, 51, 48, 46, 44, 42, 40, 39, 37, 35, 33, 32, 30, 28, 27,
           25, 24, 23, 21, 20, 18, 17, 16, 15, 13, 12, 11, 10, 9, 7, 6,
           5, 4, 3, 2, 1, 0]


def _hll_estimate(spark, types_df, regs, key="event_type"):
    """Fold a register table into (key, r_max, s, n_empty,
    raw_est, hll_est) — raw alpha*m^2 estimator with the linear-counting
    small-range switch, all integer arithmetic."""
    from pyspark.sql import Window

    grid = (
        types_df
        .crossJoin(spark.range(64).select(F.col("id").alias("bucket")))
        .join(regs, [key, "bucket"], "left")
        .select(key, F.coalesce(F.col("reg"), F.lit(0)).alias("reg"))
    )
    wmax = Window.partitionBy(key)
    summed = (
        grid.withColumn("rmax", F.max("reg").over(wmax))
        .groupBy(key)
        .agg(
            F.max("rmax").cast("bigint").alias("r_max"),
            F.sum(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(rmax - reg AS INT))")
            ).cast("bigint").alias("s"),
        )
    )
    empties = grid.groupBy(key).agg(
        F.sum(F.when(F.col("reg") == 0, 1).otherwise(0)).cast("bigint")
        .alias("n_empty")
    )
    raw_est = F.expr(
        "(709 * 4096 * shiftleft(CAST(1 AS BIGINT), CAST(r_max AS INT)))"
        " DIV (1000 * s)"
    ).cast("bigint")
    lc_table = F.array(*[F.lit(v).cast("bigint") for v in _HLL_LC])
    out = summed.join(empties, key).withColumn("raw_est", raw_est)
    corrected = F.when(
        (F.col("n_empty") > 0) & (F.col("raw_est") < 160),
        F.element_at(lc_table, F.col("n_empty").cast("int")),
    ).otherwise(F.col("raw_est"))
    return out.select(
        key, "r_max", "s", "n_empty", "raw_est",
        corrected.cast("bigint").alias("hll_est"),
    )


@register(
    "hll_portable_distinct",
    oracle="""
WITH u AS (
  SELECT DISTINCT event_type, user_id AS k FROM events
), hx AS (
  SELECT event_type, md5(CAST(k AS VARCHAR)) AS h FROM u
), hashed AS (
  SELECT event_type,
         ((instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
          + (instr('0123456789abcdef', substr(h, 2, 1)) - 1)) % 64 AS bucket,
         CAST((instr('0123456789abcdef', substr(h, 3, 1)) - 1) * 17592186044416 + (instr('0123456789abcdef', substr(h, 4, 1)) - 1) * 1099511627776 + (instr('0123456789abcdef', substr(h, 5, 1)) - 1) * 68719476736 + (instr('0123456789abcdef', substr(h, 6, 1)) - 1) * 4294967296 + (instr('0123456789abcdef', substr(h, 7, 1)) - 1) * 268435456 + (instr('0123456789abcdef', substr(h, 8, 1)) - 1) * 16777216 + (instr('0123456789abcdef', substr(h, 9, 1)) - 1) * 1048576 + (instr('0123456789abcdef', substr(h, 10, 1)) - 1) * 65536 + (instr('0123456789abcdef', substr(h, 11, 1)) - 1) * 4096 + (instr('0123456789abcdef', substr(h, 12, 1)) - 1) * 256 + (instr('0123456789abcdef', substr(h, 13, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(h, 14, 1)) - 1) * 1 AS BIGINT) AS v
  FROM hx
), ranked AS (
  SELECT event_type, bucket,
         LEAST(CASE WHEN v = 0 THEN 49
                    ELSE 49 - length(bin(CAST(v AS BIGINT))) END, 40) AS rank
  FROM hashed
), regs AS (
  SELECT event_type, bucket, CAST(MAX(rank) AS BIGINT) AS reg
  FROM ranked GROUP BY 1, 2
), grid AS (
  SELECT t.event_type, g.bucket, COALESCE(r.reg, 0) AS reg
  FROM (SELECT DISTINCT event_type FROM u) t
  CROSS JOIN (SELECT unnest(range(0, 64)) AS bucket) g
  LEFT JOIN regs r ON r.event_type = t.event_type AND r.bucket = g.bucket
), withmax AS (
  SELECT event_type, reg,
         MAX(reg) OVER (PARTITION BY event_type) AS rmax
  FROM grid
), summed AS (
  SELECT event_type, CAST(MAX(rmax) AS BIGINT) AS r_max,
         CAST(SUM(CAST(1 AS BIGINT) << CAST(rmax - reg AS INT)) AS BIGINT)
           AS s
  FROM withmax GROUP BY 1
), empties AS (
  SELECT event_type, CAST(SUM(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_empty
  FROM grid GROUP BY 1
), raw AS (
  SELECT s.event_type, s.r_max, s.s, emp.n_empty,
         CAST((709 * 4096 * (CAST(1 AS BIGINT) << CAST(s.r_max AS INT)))
              // (1000 * s.s) AS BIGINT) AS raw_est
  FROM summed s JOIN empties emp ON emp.event_type = s.event_type
), exact AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact FROM u GROUP BY 1
)
SELECT e.event_type, e.n_exact, r.r_max, r.s, r.n_empty, r.raw_est,
       CASE WHEN r.n_empty > 0 AND r.raw_est < 160
            THEN CAST(([266, 222, 196, 177, 163, 151, 142, 133, 126, 119, 113, 107, 102, 97, 93, 89, 85, 81, 78, 74, 71, 68, 65, 63, 60, 58, 55, 53, 51, 48, 46, 44, 42, 40, 39, 37, 35, 33, 32, 30, 28, 27, 25, 24, 23, 21, 20, 18, 17, 16, 15, 13, 12, 11, 10, 9, 7, 6, 5, 4, 3, 2, 1, 0])[CAST(r.n_empty AS INT)] AS BIGINT)
            ELSE r.raw_est END AS hll_est
FROM exact e JOIN raw r ON r.event_type = e.event_type
""",
    doc="Portable HyperLogLog, oracle-EXACT: per event type, distinct "
    "users stream into 64 registers (bucket = two md5 hex chars; "
    "rank = leading-zero rank of a 48-bit md5 slice via "
    "length(bin(v)) — exact integer, no log2 float near powers of "
    "two; rank capped at 40 so the 2^r_max fold stays in int64), and "
    "the raw HLL estimate alpha*m^2/sum(2^-reg) is evaluated entirely "
    "in integers: sum(2^(r_max-reg)) over the full 64-bucket grid "
    "(empty registers count as 0 — they contribute 2^r_max) and a "
    "single truncating division with alpha_64 = 709/1000; the small-"
    "range regime (empty registers and raw < 2.5m — where the raw "
    "estimator is known-biased) switches to linear counting "
    "m*ln(m/V) via a 64-entry integer table precomputed in Python "
    "and shared verbatim by both engines. The sketch "
    "is what 100 TB cardinality estimation actually ships: fixed "
    "64-register state per group, map-side combinable (register MAX "
    "merges), mergeable across days. Emitting (n_exact, registers "
    "fold, estimate) makes the error auditable row-by-row; the "
    "deterministic hashes make the whole structure engine-portable — "
    "the fourth oracle-exact sketch next to Bloom, count-min, and "
    "MinHash (Spark's own HLL++ registers aren't portable, so "
    "approx_distinct_sketch oracle-gates their BOUNDS instead).",
    tags=("agg", "sketch", "approx", "distinct"),
    bench=True,
)
def hll_portable_distinct(spark: SparkSession, sf_dir: str):
    # r11 note: persisting `u` (it feeds three subtrees) was tried and
    # MEASURED SLOWER same-sitting (1.3s -> 2.1s at sf0.1): without the
    # persist, Catalyst prunes each branch to a narrower parquet scan
    # (the event-type list never materializes the full user distinct),
    # and the three pruned scans beat one materialized cache. Left as
    # is deliberately.
    u = (
        t(spark, sf_dir, "events")
        .select("event_type", F.col("user_id").alias("k"))
        .distinct()
    )
    est = _hll_estimate(spark, u.select("event_type").distinct(), _hll_regs(u))
    exact = u.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_exact"))
    return exact.join(est, "event_type").select(
        "event_type", "n_exact", "r_max", "s", "n_empty", "raw_est", "hll_est"
    )


@register(
    "sketch_merge_equivalence",
    oracle="""
WITH u AS (
  SELECT DISTINCT event_type, user_id AS k FROM events
), hx AS (
  SELECT event_type, md5(CAST(k AS VARCHAR)) AS h FROM u
), hashed AS (
  SELECT event_type,
         ((instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
          + (instr('0123456789abcdef', substr(h, 2, 1)) - 1)) % 64 AS bucket,
         CAST((instr('0123456789abcdef', substr(h, 3, 1)) - 1) * 17592186044416 + (instr('0123456789abcdef', substr(h, 4, 1)) - 1) * 1099511627776 + (instr('0123456789abcdef', substr(h, 5, 1)) - 1) * 68719476736 + (instr('0123456789abcdef', substr(h, 6, 1)) - 1) * 4294967296 + (instr('0123456789abcdef', substr(h, 7, 1)) - 1) * 268435456 + (instr('0123456789abcdef', substr(h, 8, 1)) - 1) * 16777216 + (instr('0123456789abcdef', substr(h, 9, 1)) - 1) * 1048576 + (instr('0123456789abcdef', substr(h, 10, 1)) - 1) * 65536 + (instr('0123456789abcdef', substr(h, 11, 1)) - 1) * 4096 + (instr('0123456789abcdef', substr(h, 12, 1)) - 1) * 256 + (instr('0123456789abcdef', substr(h, 13, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(h, 14, 1)) - 1) AS BIGINT) AS v
  FROM hx
), ranked AS (
  SELECT event_type, bucket,
         LEAST(CASE WHEN v = 0 THEN 49
                    ELSE 49 - length(bin(CAST(v AS BIGINT))) END, 40) AS rank
  FROM hashed
), regs AS (
  SELECT event_type, bucket, CAST(MAX(rank) AS BIGINT) AS reg
  FROM ranked GROUP BY 1, 2
), grid AS (
  SELECT t.event_type, g.bucket, COALESCE(r.reg, 0) AS reg
  FROM (SELECT DISTINCT event_type FROM u) t
  CROSS JOIN (SELECT unnest(range(0, 64)) AS bucket) g
  LEFT JOIN regs r ON r.event_type = t.event_type AND r.bucket = g.bucket
), withmax AS (
  SELECT event_type, reg,
         MAX(reg) OVER (PARTITION BY event_type) AS rmax
  FROM grid
), summed AS (
  SELECT event_type, CAST(MAX(rmax) AS BIGINT) AS r_max,
         CAST(SUM(CAST(1 AS BIGINT) << CAST(rmax - reg AS INT)) AS BIGINT)
           AS s
  FROM withmax GROUP BY 1
), empties AS (
  SELECT event_type, CAST(SUM(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_empty
  FROM grid GROUP BY 1
), raw AS (
  SELECT s.event_type, emp.n_empty,
         CAST((709 * 4096 * (CAST(1 AS BIGINT) << CAST(s.r_max AS INT)))
              // (1000 * s.s) AS BIGINT) AS raw_est
  FROM summed s JOIN empties emp ON emp.event_type = s.event_type
), est AS (
  SELECT event_type,
         CASE WHEN n_empty > 0 AND raw_est < 160
              THEN CAST(([266, 222, 196, 177, 163, 151, 142, 133, 126, 119,
                          113, 107, 102, 97, 93, 89, 85, 81, 78, 74, 71, 68,
                          65, 63, 60, 58, 55, 53, 51, 48, 46, 44, 42, 40, 39,
                          37, 35, 33, 32, 30, 28, 27, 25, 24, 23, 21, 20, 18,
                          17, 16, 15, 13, 12, 11, 10, 9, 7, 6, 5, 4, 3, 2, 1,
                          0])[CAST(n_empty AS INT)] AS BIGINT)
              ELSE raw_est END AS hll_est
  FROM raw
)
SELECT e.event_type, x.n_exact, e.hll_est AS est_merged,
       e.hll_est AS est_direct, TRUE AS merge_equals_direct
FROM est e JOIN (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact FROM u GROUP BY 1
) x ON x.event_type = e.event_type
""",
    doc="Mergeability proof for the portable HLL — the property that "
    "makes sketches shippable at 100 TB (build per day/partition, "
    "MAX-merge registers, never rescan history): the key space is "
    "split into two disjoint halves (k % 2), registers are built "
    "INDEPENDENTLY per half, max-merged, and estimated; the same "
    "estimator also runs directly on the full key set. The gate "
    "output asserts est_merged == est_direct per group (the oracle "
    "computes only the direct path and hardcodes equality TRUE + the "
    "merged column mirroring it — if Spark's merge path diverged "
    "from its direct path, both the boolean and the est_merged "
    "column would break the hash). Register MAX over disjoint sets "
    "commutes exactly, so this is a structural identity, not an "
    "approximation claim; the companion rollup_incremental_merge "
    "proves the same algebra for decimal partial aggregates.",
    tags=("agg", "sketch", "incremental", "merge"),
)
def sketch_merge_equivalence(spark: SparkSession, sf_dir: str):
    u = (
        t(spark, sf_dir, "events")
        .select("event_type", F.col("user_id").alias("k"))
        .distinct()
    )
    types = u.select("event_type").distinct()
    half_a = u.filter(F.col("k") % 2 == 0)
    half_b = u.filter(F.col("k") % 2 == 1)
    merged_regs = (
        _hll_regs(half_a)
        .unionByName(_hll_regs(half_b))
        .groupBy("event_type", "bucket")
        .agg(F.max("reg").alias("reg"))
    )
    est_m = _hll_estimate(spark, types, merged_regs).select(
        "event_type", F.col("hll_est").alias("est_merged")
    )
    est_d = _hll_estimate(spark, types, _hll_regs(u)).select(
        "event_type", F.col("hll_est").alias("est_direct")
    )
    exact = u.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        exact.join(est_m, "event_type")
        .join(est_d, "event_type")
        .select(
            "event_type", "n_exact", "est_merged", "est_direct",
            (F.col("est_merged") == F.col("est_direct")).alias(
                "merge_equals_direct"
            ),
        )
    )


@register(
    "score_auc_exact",
    oracle="""
WITH labeled AS (
  SELECT n_chars AS score, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
), grouped AS (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(pos) AS BIGINT) AS p
  FROM labeled GROUP BY 1
), cum AS (
  SELECT score, c, p,
         CAST(SUM(c) OVER (ORDER BY score
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_c
  FROM grouped
), terms AS (
  SELECT SUM(p * (2 * (cum_c - c) + c + 1)) AS rank2_sum FROM cum
), totals AS (
  SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
         CAST(SUM(c - p) AS BIGINT) AS n_neg
  FROM grouped
)
SELECT t.n_pos, t.n_neg,
       CAST(terms.rank2_sum - t.n_pos * (t.n_pos + 1) AS BIGINT) AS u2,
       CAST((terms.rank2_sum - t.n_pos * (t.n_pos + 1)) * 1000
            // (2 * t.n_pos * t.n_neg) AS BIGINT) AS auc_milli
FROM terms, totals t
""",
    doc="EXACT AUC (Mann-Whitney rank-sum) of a score as a classifier — "
    "here n_chars predicting lang='en' — entirely in integers: ties "
    "get average ranks kept integral by working at 2x scale "
    "(2*avg_rank = 2*start + count + 1 per tied-score group), U2 = "
    "sum of doubled positive ranks minus n_pos(n_pos+1), and AUC = "
    "U2 / (2*n_pos*n_neg) emitted as truncated permille next to its "
    "exact numerator/denominator pieces. This is THE threshold-free "
    "quality-classifier evaluation (is this heuristic worth gating "
    "on?) and the usual float implementation is partition-order "
    "dependent; rank sums over tied-score GROUPS make it a pure "
    "integer aggregate. The global rank offsets are a running count "
    "over score groups — the fifth consumer of operators.prefixsum."
    "distributed_cumsum, so the score domain can be billions of "
    "distinct values without a single-partition window.",
    tags=("agg", "stats", "ml", "eval", "prefixsum"),
)
def score_auc_exact(spark: SparkSession, sf_dir: str):
    from ..operators.prefixsum import distributed_cumsum

    labeled = t(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    grouped = labeled.groupBy("score").agg(
        F.count(F.lit(1)).alias("c"), F.sum("pos").cast("bigint").alias("p")
    )
    cum = distributed_cumsum(
        grouped, order_col="score", value_col="c", tiebreak=[], out_col="cum_c"
    ).select(
        "score", "c", "p", F.col("cum_c").cast("bigint").alias("cum_c")
    )
    terms = cum.agg(
        F.sum(
            F.col("p") * (2 * (F.col("cum_c") - F.col("c")) + F.col("c") + 1)
        ).cast("bigint").alias("rank2_sum")
    )
    totals = grouped.agg(
        F.sum("p").cast("bigint").alias("n_pos"),
        F.sum(F.col("c") - F.col("p")).cast("bigint").alias("n_neg"),
    )
    return (
        terms.crossJoin(totals)
        .select(
            "n_pos", "n_neg",
            (F.col("rank2_sum") - F.col("n_pos") * (F.col("n_pos") + 1))
            .cast("bigint").alias("u2"),
            F.expr(
                "(rank2_sum - n_pos * (n_pos + 1)) * 1000"
                " DIV (2 * n_pos * n_neg)"
            ).cast("bigint").alias("auc_milli"),
        )
    )


@register(
    "score_avg_precision",
    oracle="""
WITH labeled AS (
  SELECT n_chars AS score, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
), grouped AS (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(pos) AS BIGINT) AS p
  FROM labeled GROUP BY 1
), cum AS (
  SELECT score, c, p,
         CAST(SUM(c) OVER (ORDER BY score DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_c,
         CAST(SUM(p) OVER (ORDER BY score DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_p
  FROM grouped
), terms AS (
  SELECT CAST(SUM(p * ((cum_p * 100000000000) // cum_c)) AS BIGINT)
           AS ap_num
  FROM cum
), totals AS (
  SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
         CAST(SUM(c - p) AS BIGINT) AS n_neg
  FROM grouped
)
SELECT t.n_pos, t.n_neg, terms.ap_num,
       CAST(terms.ap_num AS DOUBLE) / t.n_pos / 100000000000
         AS avg_precision
FROM terms, totals t
""",
    doc="EXACT average precision (the area under the precision-recall "
    "curve by the step-interpolation every ranking library reports) of "
    "a score as a classifier — n_chars predicting lang='en', the same "
    "base as score_auc_exact, which AP complements exactly where AUC "
    "misleads: under heavy class imbalance (a rare positive class at "
    "100 TB corpus scale) AP weights performance at the top of the "
    "ranking. Tie-safe threshold form: AP = sum over distinct scores "
    "descending of (p_v / n_pos) * precision@v with precision@v = "
    "cum_p/cum_c over the >=v prefix. Each precision is materialized "
    "as the TRUNCATED integer (cum_p * 10^11) DIV cum_c — both "
    "engines truncate positive integer division identically, so the "
    "per-threshold terms and their bigint sum are bit-deterministic "
    "(error bound n/10^11, mirrored exactly — no float crosses the "
    "aggregation). The descending cumulative counts ride ONE "
    "radix-packed distributed_cumsum pass (p*2^32 + c, valid while "
    "total rows < 2^32 — wider radix above that), so the score "
    "domain can be billions of distinct values with no "
    "single-partition window; the oracle's window cumsum is the "
    "small-scale formulation of the same prefix.",
    tags=("agg", "stats", "ml", "eval", "prefixsum"),
)
def score_avg_precision(spark: SparkSession, sf_dir: str):
    from ..operators.prefixsum import distributed_cumsum

    labeled = t(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    grouped = labeled.groupBy("score").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum("pos").cast("bigint").alias("p"),
    )
    packed = grouped.select(
        "score",
        "c",
        "p",
        (-F.col("score")).alias("neg_score"),
        (F.col("p") * F.lit(4294967296).cast("bigint") + F.col("c")).alias(
            "__packed"
        ),
    )
    cum = distributed_cumsum(
        packed,
        order_col="neg_score",
        value_col="__packed",
        tiebreak=[],
        out_col="__cum",
    ).withColumn("__cum_b", F.col("__cum").cast("bigint")).select(
        "score",
        "c",
        "p",
        F.expr("__cum_b DIV 4294967296").alias("cum_p"),
        (F.col("__cum_b") % F.lit(4294967296).cast("bigint")).alias("cum_c"),
    )
    terms = cum.agg(
        F.sum(
            F.col("p") * F.expr("(cum_p * 100000000000) DIV cum_c")
        ).cast("bigint").alias("ap_num")
    )
    totals = grouped.agg(
        F.sum("p").cast("bigint").alias("n_pos"),
        F.sum(F.col("c") - F.col("p")).cast("bigint").alias("n_neg"),
    )
    return terms.crossJoin(totals).select(
        "n_pos",
        "n_neg",
        "ap_num",
        (
            F.col("ap_num").cast("double")
            / F.col("n_pos")
            / F.lit(100000000000)
        ).alias("avg_precision"),
    )


@register(
    "score_lift_calibration",
    oracle="""
WITH labeled AS (
  SELECT n_chars AS score, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
), b AS (
  SELECT [PERCENTILE_DISC(0.1) WITHIN GROUP (ORDER BY score),
          PERCENTILE_DISC(0.2) WITHIN GROUP (ORDER BY score),
          PERCENTILE_DISC(0.3) WITHIN GROUP (ORDER BY score),
          PERCENTILE_DISC(0.4) WITHIN GROUP (ORDER BY score),
          PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY score),
          PERCENTILE_DISC(0.6) WITHIN GROUP (ORDER BY score),
          PERCENTILE_DISC(0.7) WITHIN GROUP (ORDER BY score),
          PERCENTILE_DISC(0.8) WITHIN GROUP (ORDER BY score),
          PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY score)] AS bnds
  FROM labeled
), binned AS (
  SELECT CAST(len(list_filter(b.bnds, x -> x < score)) AS INT) AS decile,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pos) AS BIGINT) AS n_pos
  FROM labeled, b GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n_pos) AS BIGINT) AS total_pos FROM binned
), gained AS (
  SELECT decile, n, n_pos,
         CAST(SUM(n_pos) OVER (ORDER BY decile DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_pos
  FROM binned
)
SELECT g.decile, g.n, g.n_pos,
       CAST(g.n_pos * 1000 // g.n AS BIGINT) AS pos_permille,
       g.cum_pos,
       CAST(g.cum_pos * 1000 // t.total_pos AS BIGINT) AS gain_permille
FROM gained g, tot t
""",
    doc="Decile lift & calibration report for a score-as-classifier — "
    "the model-QA companion to score_auc_exact: equi-depth score "
    "deciles (exact PERCENTILE_DISC fences broadcast, map-side "
    "bucket assignment — never a global ntile sort), each reporting "
    "its observed positive rate in permille (the calibration curve) "
    "and the cumulative positives captured walking deciles top-down "
    "(the gain/lift chart — 'contact the top 20% and reach X% of "
    "positives'). All integer cross-multiplied rates; the cumulative "
    "walk is a window over exactly 10 bin rows (series-sized, like "
    "the prefix-sum offsets table), so nothing about the plan "
    "changes at 100 TB.",
    tags=("agg", "stats", "ml", "eval", "percentile"),
)
def score_lift_calibration(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    labeled = t(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    # Bounded fence row collected as literals (the histogram_equidepth
    # recipe): 9 codegen compares per row replace the interpreted
    # 9-element lambda filter per row. Identical decile integers.
    fence_row = labeled.agg(
        *[
            F.expr(
                f"percentile_disc({p / 10}) WITHIN GROUP (ORDER BY score)"
            ).alias(f"f{p}")
            for p in range(1, 10)
        ]
    ).collect()[0]
    decile = sum(
        F.when(F.lit(v) < F.col("score"), 1).otherwise(0)
        for v in [fence_row[f"f{p}"] for p in range(1, 10)]
    ).cast("int")
    binned = labeled.groupBy(decile.alias("decile")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pos").cast("bigint").alias("n_pos"),
    )
    tot = binned.agg(F.sum("n_pos").cast("bigint").alias("total_pos"))
    w = Window.orderBy(F.col("decile").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gained = binned.withColumn(
        "cum_pos", F.sum("n_pos").over(w).cast("bigint")
    )
    return gained.crossJoin(F.broadcast(tot)).select(
        "decile", "n", "n_pos",
        F.expr("n_pos * 1000 DIV n").cast("bigint").alias("pos_permille"),
        "cum_pos",
        F.expr("cum_pos * 1000 DIV total_pos").cast("bigint")
        .alias("gain_permille"),
    )


@register(
    "market_concentration_hhi",
    oracle="""
WITH rev AS (
  SELECT n.n_name AS nation,
         s.s_suppkey,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100)
              AS BIGINT) AS cents
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  GROUP BY 1, 2
), tot AS (
  SELECT nation, CAST(SUM(cents) AS BIGINT) AS total_cents,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         SUM(CAST(cents AS HUGEINT) * cents) AS ssq
  FROM rev GROUP BY 1
)
SELECT nation, n_suppliers, total_cents,
       CAST((1000000 * ssq) // (CAST(total_cents AS HUGEINT)
                                * total_cents) AS BIGINT) AS hhi_micro
FROM tot
""",
    doc="Herfindahl-Hirschman supplier-concentration index per nation — "
    "the antitrust/supply-risk number: HHI = sum of squared revenue "
    "shares, emitted in micro-units via cross-multiplication "
    "(1e6 * sum(x^2) / S^2) so no share is ever a float. The squared "
    "cent sums exceed int64 by design, so the ONE wide step runs in "
    "128-bit integers — Spark DECIMAL(38,0) exact arithmetic mirrored "
    "by DuckDB HUGEINT, then the final ratio collapses back to "
    "BIGINT micro-units (bounded by 1e6). 10000 micro = a perfectly "
    "competitive 1%-share field; 1e6 = monopoly. Two "
    "map-side-combinable aggregates; revenue is exact decimal cents "
    "end to end.",
    tags=("agg", "stats", "reporting", "concentration"),
)
def market_concentration_hhi(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), "s_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents")
        )
    )
    tot = rev.groupBy("nation").agg(
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(
            F.col("cents").cast("decimal(38,0)")
            * F.col("cents").cast("decimal(38,0)")
        ).alias("ssq"),
    )
    # truncating DIV, not decimal "/": Spark decimal division rounds
    # HALF_UP at its result scale, which can land one above DuckDB's
    # floor division on near-integer quotients.
    return tot.select(
        "nation", "n_suppliers", "total_cents",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * ssq) DIV "
            "(CAST(total_cents AS DECIMAL(38,0)) * total_cents) AS BIGINT)"
        ).alias("hhi_micro"),
    )


@register(
    "revenue_gini_exact",
    oracle="""
WITH rev AS (
  SELECT o_custkey AS custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
), pos AS (
  SELECT custkey, cents,
         CAST(row_number() OVER (ORDER BY cents, custkey) AS BIGINT) AS i
  FROM rev
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS HUGEINT) AS s,
         SUM(CAST(i AS HUGEINT) * cents) AS ixsum
  FROM pos
)
SELECT CAST(n AS BIGINT) AS n_customers,
       CAST(s AS BIGINT) AS total_cents,
       CAST((1000 * (2 * ixsum - (n + 1) * s)) // (n * s) AS BIGINT)
         AS gini_milli
FROM agg
""",
    doc="Exact Gini coefficient of customer revenue concentration — the "
    "inequality measure behind 'do 20% of customers carry 80% of "
    "revenue' (the integral the Pareto/ABC curve eyeballs): G = "
    "(2*sum(i*x_sorted) - (n+1)*S) / (n*S) over ascending-sorted "
    "revenues, emitted in truncated milli with every intermediate an "
    "exact integer (positions from the rank scan, 128-bit products "
    "where i*x exceeds int64 — Spark DECIMAL(38,0) mirrored by DuckDB "
    "HUGEINT). The global positions come from operators.prefixsum."
    "distributed_cumsum counting ones over the (revenue, custkey) "
    "total order — the sixth consumer of the two-phase scan, because "
    "a global row_number is exactly the single-partition window this "
    "repo keeps refusing (the oracle USES that window; the engine "
    "must not).",
    tags=("agg", "stats", "prefixsum", "concentration"),
)
def revenue_gini_exact(spark: SparkSession, sf_dir: str):
    from ..operators.prefixsum import distributed_cumsum

    rev = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents")
        )
        .withColumn("one", F.lit(1).cast("bigint"))
    )
    pos = distributed_cumsum(
        rev, order_col="cents", value_col="one", tiebreak=["custkey"],
        out_col="i",
    ).select("custkey", "cents", F.col("i").cast("bigint").alias("i"))
    agg = pos.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("decimal(38,0)").alias("s"),
        F.sum(
            F.col("i").cast("decimal(38,0)") * F.col("cents")
        ).alias("ixsum"),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.col("s").cast("bigint").alias("total_cents"),
        F.expr(
            "CAST((1000 * (2 * ixsum - (CAST(n AS DECIMAL(38,0)) + 1) * s))"
            " DIV (CAST(n AS DECIMAL(38,0)) * s) AS BIGINT)"
        ).alias("gini_milli"),
    )


@register(
    "cohort_ltv_curve",
    oracle="""
WITH first_order AS (
  SELECT o_custkey AS custkey,
         MIN(CAST(EXTRACT(year FROM o_orderdate) * 12
                  + EXTRACT(month FROM o_orderdate) AS BIGINT)) AS cohort_m
  FROM orders GROUP BY 1
), labeled AS (
  SELECT f.cohort_m,
         CAST(EXTRACT(year FROM o.o_orderdate) * 12
              + EXTRACT(month FROM o.o_orderdate) AS BIGINT)
           - f.cohort_m AS month_offset,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS rev
  FROM orders o JOIN first_order f ON f.custkey = o.o_custkey
), cell AS (
  SELECT cohort_m, month_offset,
         CAST(SUM(rev * 100) AS BIGINT) AS rev_cents
  FROM labeled GROUP BY 1, 2
)
SELECT cohort_m, month_offset, rev_cents,
       CAST(SUM(rev_cents) OVER (PARTITION BY cohort_m ORDER BY month_offset
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_ltv_cents
FROM cell
""",
    doc="Cohort LTV curve: customers grouped by first-order month, "
    "revenue accumulated per month offset — the 'how much is a "
    "January-2024 customer worth by month 6' matrix that retention "
    "counts (events_cohort_retention) only gesture at. Revenue "
    "travels as exact integer CENTS end to end (decimal x 100 -> "
    "BIGINT), so the cumulative window adds integers — no float "
    "drift across the curve. The cumulative window partitions by "
    "cohort over MONTH OFFSETS (a bounded series per cohort, like "
    "the prefix-sum offsets table), never over customers; the heavy "
    "work is two customer-keyed aggregates.",
    tags=("agg", "cohort", "reporting", "window"),
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    mnum = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("bigint")
    first = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.min(mnum).alias("cohort_m")
    )
    labeled = o.join(first, F.col("custkey") == F.col("o_custkey")).select(
        "cohort_m",
        (mnum - F.col("cohort_m")).alias("month_offset"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("rev"),
    )
    cell = labeled.groupBy("cohort_m", "month_offset").agg(
        F.sum(F.col("rev") * 100).cast("bigint").alias("rev_cents")
    )
    w = Window.partitionBy("cohort_m").orderBy("month_offset").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return cell.select(
        "cohort_m", "month_offset", "rev_cents",
        F.sum("rev_cents").over(w).cast("bigint").alias("cum_ltv_cents"),
    )


@register(
    "revenue_new_vs_returning",
    oracle="""
WITH first_order AS (
  SELECT o_custkey AS custkey, MIN(CAST(o_orderdate AS DATE)) AS first_d
  FROM orders GROUP BY 1
), labeled AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) * 100
              + EXTRACT(month FROM o.o_orderdate) AS BIGINT) AS yyyymm,
         CASE WHEN CAST(o.o_orderdate AS DATE) = f.first_d
              THEN 'new' ELSE 'returning' END AS segment,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS rev
  FROM orders o JOIN first_order f ON f.custkey = o.o_custkey
)
SELECT yyyymm, segment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(rev * 100) AS BIGINT) AS rev_cents
FROM labeled GROUP BY 1, 2
""",
    doc="New-vs-returning revenue split per month — the growth-"
    "accounting headline (is revenue coming from acquisition or "
    "retention?): an order is 'new' iff placed on its customer's "
    "first order DATE (ties on the same day count as the acquisition "
    "event), everything later is 'returning'. One customer-keyed MIN "
    "aggregate joined back (co-partitioned), then a month x segment "
    "rollup in exact integer cents. Deterministic: the new/returning "
    "boundary is a date equality, never a wall-clock cutoff.",
    tags=("agg", "cohort", "reporting"),
)
def revenue_new_vs_returning(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    first = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.min(F.col("o_orderdate").cast("date")).alias("first_d")
    )
    labeled = o.join(first, F.col("custkey") == F.col("o_custkey")).select(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("yyyymm"),
        F.when(
            F.col("o_orderdate").cast("date") == F.col("first_d"), "new"
        ).otherwise("returning").alias("segment"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("rev"),
    )
    return labeled.groupBy("yyyymm", "segment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("rev") * 100).cast("bigint").alias("rev_cents"),
    )


@register(
    "discount_lift_bands",
    oracle="""
WITH banded AS (
  SELECT CAST(floor(l_discount * 100) AS BIGINT) AS discount_pct,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS price
  FROM lineitem
)
SELECT discount_pct,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(qty) AS BIGINT) AS total_qty,
       CAST(SUM(qty) * 1000 // COUNT(*) AS BIGINT) AS qty_milli_per_line,
       CAST(SUM(price * 100) AS BIGINT) AS revenue_cents
FROM banded GROUP BY 1
""",
    doc="Discount-band lift table: per whole-percent discount band, "
    "line count, total quantity, mean quantity per line in integer "
    "milli (cross-multiplied — no float mean), and exact-cent "
    "revenue — the raw curve behind 'does a deeper discount move "
    "more units or just give margin away', and the generalization "
    "of q6's single-band what-if to the whole discount surface. "
    "Bands via floor(discount*100) on the exact decimal (never a "
    "float multiply); one map-side-combinable aggregate.",
    tags=("agg", "reporting", "pricing"),
)
def discount_lift_bands(spark: SparkSession, sf_dir: str):
    banded = t(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_discount") * 100).cast("bigint")
        .alias("discount_pct"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
    )
    return banded.groupBy("discount_pct").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("qty").cast("bigint").alias("total_qty"),
        F.expr("SUM(qty) * 1000 DIV COUNT(*)").cast("bigint")
        .alias("qty_milli_per_line"),
        F.sum(F.col("price") * 100).cast("bigint").alias("revenue_cents"),
    )


@register(
    "supplier_share_shift",
    oracle="""
WITH b AS (
  SELECT (CAST(floor(epoch(MIN(l_shipdate))) AS BIGINT)
          + CAST(floor(epoch(MAX(l_shipdate))) AS BIGINT)) // 2 AS mid_sec
  FROM lineitem
), labeled AS (
  SELECT l.l_suppkey AS suppkey,
         CASE WHEN CAST(floor(epoch(l.l_shipdate)) AS BIGINT) < b.mid_sec
              THEN 'h1' ELSE 'h2' END AS half,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) AS rev
  FROM lineitem l, b
), per AS (
  SELECT suppkey, half, CAST(SUM(rev * 100) AS BIGINT) AS cents
  FROM labeled GROUP BY 1, 2
), tot AS (
  SELECT half, CAST(SUM(cents) AS BIGINT) AS total FROM per GROUP BY 1
), shares AS (
  SELECT p.suppkey, p.half,
         CAST(p.cents * 10000 // t.total AS BIGINT) AS share_pm
  FROM per p JOIN tot t ON t.half = p.half
), wide AS (
  SELECT suppkey,
         COALESCE(MAX(CASE WHEN half = 'h1' THEN share_pm END), 0) AS h1_pm,
         COALESCE(MAX(CASE WHEN half = 'h2' THEN share_pm END), 0) AS h2_pm
  FROM shares GROUP BY 1
)
SELECT suppkey, h1_pm, h2_pm, h2_pm - h1_pm AS shift_pm
FROM wide
ORDER BY abs(h2_pm - h1_pm) DESC, suppkey ASC
LIMIT 25
""",
    doc="Supplier market-share shift between the first and second half "
    "of the time range: per-half revenue shares in integer permyriad "
    "(cross-multiplied against each half's own total, so the halves "
    "are comparable even when volumes differ), pivoted wide, and the "
    "25 biggest absolute movers returned — the share-shift report "
    "competitive analysis runs quarterly. The midpoint is integer "
    "epoch arithmetic off one broadcast min/max (timezone-proof on "
    "NTZ timestamps); missing halves coalesce to zero share "
    "(an entrant or dropout IS a mover). All integers; the mover "
    "ranking is TakeOrderedAndProject on (|shift|, suppkey).",
    tags=("agg", "reporting", "share", "topk"),
)
def supplier_share_shift(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_shipdate", "l_extendedprice"
    )
    sec = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        " l_shipdate)"
    )
    b = li.agg(
        F.expr(
            "(timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
            " MIN(l_shipdate)) + timestampdiff(SECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', MAX(l_shipdate))) DIV 2"
        ).alias("mid_sec")
    )
    labeled = li.crossJoin(F.broadcast(b)).select(
        F.col("l_suppkey").alias("suppkey"),
        F.when(sec < F.col("mid_sec"), "h1").otherwise("h2").alias("half"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("rev"),
    )
    per = labeled.groupBy("suppkey", "half").agg(
        F.sum(F.col("rev") * 100).cast("bigint").alias("cents")
    )
    tot = per.groupBy("half").agg(F.sum("cents").cast("bigint").alias("total"))
    shares = per.join(F.broadcast(tot), "half").select(
        "suppkey", "half",
        F.expr("cents * 10000 DIV total").cast("bigint").alias("share_pm"),
    )
    wide = shares.groupBy("suppkey").agg(
        F.coalesce(
            F.max(F.when(F.col("half") == "h1", F.col("share_pm"))), F.lit(0)
        ).cast("bigint").alias("h1_pm"),
        F.coalesce(
            F.max(F.when(F.col("half") == "h2", F.col("share_pm"))), F.lit(0)
        ).cast("bigint").alias("h2_pm"),
    )
    return (
        wide.select(
            "suppkey", "h1_pm", "h2_pm",
            (F.col("h2_pm") - F.col("h1_pm")).alias("shift_pm"),
        )
        .orderBy(F.abs(F.col("shift_pm")).desc(), F.col("suppkey"))
        .limit(25)
    )


@register(
    "order_value_log2_histogram",
    oracle="""
WITH cents AS (
  SELECT CAST(floor(o_totalprice) AS BIGINT) AS units, o_totalprice
  FROM orders WHERE o_totalprice >= 1
)
SELECT CAST(length(bin(units)) AS BIGINT) AS log2_band,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
         AS revenue_cents,
       MIN(units) AS band_min_units, MAX(units) AS band_max_units
FROM cents GROUP BY 1
""",
    doc="Log2-banded order-value histogram: the band is literally the "
    "bit length of the floored order value (length(bin(x)) — the "
    "exact integer log2+1 both engines agree on, the same trick the "
    "portable HLL rank uses; no float log, no boundary-rounding "
    "divergence at powers of two). Doubling bands are the natural "
    "view for heavy-tailed money distributions where equi-width "
    "buckets put everything in bucket 1 and equi-depth hides the "
    "tail; each band carries exact-cent revenue so 'which doubling "
    "band pays the bills' reads off directly. One "
    "map-side-combinable aggregate.",
    tags=("agg", "profile", "histogram"),
)
def order_value_log2_histogram(spark: SparkSession, sf_dir: str):
    cents = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 1)
        .select(
            F.floor(F.col("o_totalprice")).cast("bigint").alias("units"),
            "o_totalprice",
        )
    )
    return cents.groupBy(
        F.length(F.bin(F.col("units"))).cast("bigint").alias("log2_band")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("revenue_cents"),
        F.min("units").alias("band_min_units"),
        F.max("units").alias("band_max_units"),
    )


@register(
    "monthly_peak_concentration",
    oracle="""
WITH daily AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) * 100
              + EXTRACT(month FROM o_orderdate) AS BIGINT) AS yyyymm,
         CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
), monthly AS (
  SELECT yyyymm,
         CAST(SUM(cents) AS BIGINT) AS month_cents,
         CAST(MAX(cents) AS BIGINT) AS peak_cents,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM daily GROUP BY 1
), peak_day AS (
  SELECT yyyymm, MIN(day) AS peak_day
  FROM daily d
  WHERE cents = (SELECT MAX(cents) FROM daily m WHERE m.yyyymm = d.yyyymm)
  GROUP BY 1
)
SELECT m.yyyymm, m.n_days, m.month_cents, m.peak_cents, p.peak_day,
       CAST(m.peak_cents * 1000 // m.month_cents AS BIGINT)
         AS peak_share_permille
FROM monthly m JOIN peak_day p ON p.yyyymm = m.yyyymm
""",
    doc="Monthly peak-day concentration: each month's revenue share "
    "landing on its single biggest day (integer permille, exact "
    "cents) plus the day itself (earliest on ties — deterministic) — "
    "the promotional-dependence / operational-peaking metric that "
    "tells a retailer whether a month is a steady drumbeat or one "
    "flash sale plus silence, and tells the platform how to size for "
    "peaks rather than means. Day and month rollups are two "
    "map-side-combinable aggregates; the argmax day is a co-keyed "
    "min-over-ties join, never a global sort.",
    tags=("agg", "temporal", "reporting", "capacity"),
)
def monthly_peak_concentration(spark: SparkSession, sf_dir: str):
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
            .cast("bigint")
            .alias("yyyymm"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents")
        )
    )
    monthly = daily.groupBy("yyyymm").agg(
        F.sum("cents").cast("bigint").alias("month_cents"),
        F.max("cents").cast("bigint").alias("peak_cents"),
        F.count(F.lit(1)).alias("n_days"),
    )
    peak_day = (
        daily.join(
            monthly.select("yyyymm", "peak_cents"), "yyyymm"
        )
        .filter(F.col("cents") == F.col("peak_cents"))
        .groupBy("yyyymm")
        .agg(F.min("day").alias("peak_day"))
    )
    return monthly.join(peak_day, "yyyymm").select(
        "yyyymm", "n_days", "month_cents", "peak_cents", "peak_day",
        F.expr("peak_cents * 1000 DIV month_cents").cast("bigint")
        .alias("peak_share_permille"),
    )


@register(
    "brand_affinity_matrix",
    oracle="""
WITH items AS (
  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), n_orders AS (
  SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n FROM items
), brand_cnt AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS c FROM items GROUP BY 1
), pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b,
         CAST(COUNT(*) AS BIGINT) AS together
  FROM items a JOIN items b
    ON a.okey = b.okey AND a.brand < b.brand
  GROUP BY 1, 2
)
SELECT p.brand_a, p.brand_b, p.together, ca.c AS n_a, cb.c AS n_b,
       CAST((p.together * n.n * 1000) // (ca.c * cb.c) AS BIGINT)
         AS lift_milli
FROM pairs p
JOIN brand_cnt ca ON ca.brand = p.brand_a
JOIN brand_cnt cb ON cb.brand = p.brand_b
CROSS JOIN n_orders n
""",
    doc="Brand-affinity matrix: which BRANDS land in the same basket "
    "more than independence predicts — lift = P(a,b)/(P(a)P(b)) "
    "cross-multiplied to integer milli (together*N*1000 / (n_a*n_b)), "
    "computed at the brand level where the matrix is small and dense "
    "(assoc_rules_copurchase works at part level where it is huge "
    "and sparse — the two answer different merchandising questions: "
    "substitutes/complements between product LINES vs specific item "
    "rules). Baskets deduplicate to DISTINCT (order, brand) first, "
    "so a basket with five items of one brand counts once; the pair "
    "join is basket-bounded exactly like the part-level one. All "
    "integers.",
    tags=("agg", "join", "basket", "reporting"),
)
def brand_affinity_matrix(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    items = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
        .persist()
    )
    n_orders = items.agg(F.count_distinct("okey").alias("n"))
    brand_cnt = items.groupBy("brand").agg(F.count(F.lit(1)).alias("c"))
    # Pairs generated IN-ROW from the per-order brand set (bounded:
    # baskets ≤7 items) instead of the items self-join — the
    # assoc_rules_copurchase recipe (r11 change 3) applied at brand
    # level: one hash aggregate + codegen array expansion replaces the
    # sort-merge self-join's two sorted cache reads. items is DISTINCT
    # (okey, brand), so set-pairs count each co-basket exactly once —
    # identical `together`.
    from ..operators.graph import cooccurrence_pairs

    pairs = (
        cooccurrence_pairs(items, "okey", "brand", ordered=True)
        .groupBy(
            F.col("src").alias("brand_a"), F.col("dst").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).alias("together"))
    )
    ca = brand_cnt.select(F.col("brand").alias("brand_a"), F.col("c").alias("n_a"))
    cb = brand_cnt.select(F.col("brand").alias("brand_b"), F.col("c").alias("n_b"))
    return (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a", "brand_b", "together", "n_a", "n_b",
            F.expr("(together * n * 1000) DIV (n_a * n_b)").cast("bigint")
            .alias("lift_milli"),
        )
    )


@register(
    "price_position_in_type",
    oracle="""
WITH ranked AS (
  SELECT p_type, p_partkey, p_retailprice,
         CAST(COUNT(*) OVER (PARTITION BY p_type) AS BIGINT) AS n_in_type,
         CAST(row_number() OVER (
           PARTITION BY p_type
           ORDER BY p_retailprice, p_partkey) AS BIGINT) AS pos
  FROM part
)
SELECT p_type, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(CASE WHEN pos * 10 <= n_in_type THEN 1 ELSE 0 END)
            AS BIGINT) AS n_budget_decile,
       CAST(SUM(CASE WHEN pos * 10 > n_in_type * 9 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_premium_decile,
       MIN(p_retailprice) AS price_min, MAX(p_retailprice) AS price_max
FROM ranked GROUP BY 1
""",
    doc="Price positioning within product type: each part's rank among "
    "its own type (ties broken by key) classifies it into the budget "
    "bottom decile or premium top decile by integer cross-"
    "multiplication (pos*10 <= n, pos*10 > 9n — no percent_rank "
    "float), and the per-type census shows where each line's catalog "
    "is weighted — the assortment-strategy view pricing teams read "
    "next to the raw price envelope. The window partitions by type "
    "(bounded groups), never globally; decimals only min/maxed, "
    "never summed.",
    tags=("window", "reporting", "pricing", "agg"),
)
def price_position_in_type(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    p = t(spark, sf_dir, "part").select("p_type", "p_partkey", "p_retailprice")
    w = Window.partitionBy("p_type")
    wo = Window.partitionBy("p_type").orderBy("p_retailprice", "p_partkey")
    ranked = p.select(
        "p_type", "p_retailprice",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_in_type"),
        F.row_number().over(wo).cast("bigint").alias("pos"),
    )
    return ranked.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(
            F.when(F.col("pos") * 10 <= F.col("n_in_type"), 1).otherwise(0)
        ).cast("bigint").alias("n_budget_decile"),
        F.sum(
            F.when(F.col("pos") * 10 > F.col("n_in_type") * 9, 1).otherwise(0)
        ).cast("bigint").alias("n_premium_decile"),
        F.min("p_retailprice").alias("price_min"),
        F.max("p_retailprice").alias("price_max"),
    )


@register(
    "customer_repeat_rate",
    oracle="""
WITH per_cust AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN n_orders = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS one_and_done,
       CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) * 1000
            // COUNT(*) AS BIGINT) AS repeat_permille,
       CAST(SUM(n_orders) * 1000 // COUNT(*) AS BIGINT)
         AS orders_per_cust_milli
FROM per_cust GROUP BY 1
""",
    doc="Repeat rate and one-and-done share per segment — the retention "
    "KPI pair a subscription/commerce review opens with: share of "
    "customers who ever came back (integer permille) and mean orders "
    "per customer in milli (cross-multiplied — no float mean), next "
    "to the raw one-and-done count. Two map-side-combinable "
    "aggregates on the customer key; q13's order-count distribution "
    "gives the full histogram, this gives the headline cut by "
    "segment.",
    tags=("agg", "cohort", "reporting"),
)
def customer_repeat_rate(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders").select("o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    per_cust = (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return per_cust.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.when(F.col("n_orders") == 1, 1).otherwise(0)).cast("bigint")
        .alias("one_and_done"),
        F.expr(
            "SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) * 1000"
            " DIV COUNT(*)"
        ).cast("bigint").alias("repeat_permille"),
        F.expr("SUM(n_orders) * 1000 DIV COUNT(*)").cast("bigint")
        .alias("orders_per_cust_milli"),
    )


@register(
    "revenue_runrate_projection",
    oracle="""
WITH anchor AS (
  SELECT CAST(MAX(o_orderdate) AS DATE) AS today FROM orders
), mtd AS (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
           AS mtd_cents,
         CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT)
           AS days_elapsed
  FROM orders o, anchor a
  WHERE EXTRACT(year FROM o.o_orderdate) = EXTRACT(year FROM a.today)
    AND EXTRACT(month FROM o.o_orderdate) = EXTRACT(month FROM a.today)
), cal AS (
  SELECT CAST(EXTRACT(day FROM (date_trunc('month', a.today)
              + INTERVAL 1 MONTH - INTERVAL 1 DAY)) AS BIGINT)
           AS days_in_month
  FROM anchor a
)
SELECT m.mtd_cents, m.days_elapsed, c.days_in_month,
       CAST((m.mtd_cents * c.days_in_month) // m.days_elapsed AS BIGINT)
         AS projected_cents
FROM mtd m, cal c
""",
    doc="Month-to-date run-rate projection: revenue booked so far in "
    "the anchor month (= the corpus max order date — never "
    "wall-clock, so reruns are deterministic) scaled by "
    "days-in-month over days-elapsed, all in exact integer cents "
    "with a single truncating division — the 'are we on track' "
    "number every revenue dashboard extrapolates, made rerun- and "
    "engine-reproducible. Days-in-month from last-day-of-month date "
    "arithmetic (clamping semantics both engines share, proven in "
    "date_functions_showcase). One filtered aggregate.",
    tags=("agg", "temporal", "reporting", "forecast"),
)
def revenue_runrate_projection(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    anchor = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("today"))
    joined = o.crossJoin(F.broadcast(anchor)).filter(
        (F.year("o_orderdate") == F.year("today"))
        & (F.month("o_orderdate") == F.month("today"))
    )
    mtd = joined.agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("mtd_cents"),
        F.count_distinct(F.col("o_orderdate").cast("date")).alias(
            "days_elapsed"
        ),
    )
    cal = anchor.select(
        F.dayofmonth(F.last_day("today")).cast("bigint").alias("days_in_month")
    )
    return mtd.crossJoin(F.broadcast(cal)).select(
        "mtd_cents", "days_elapsed", "days_in_month",
        F.expr("(mtd_cents * days_in_month) DIV days_elapsed").cast("bigint")
        .alias("projected_cents"),
    )


@register(
    "returns_rate_by_price_band",
    oracle="""
WITH banded AS (
  SELECT CAST(length(bin(CAST(floor(l_extendedprice) AS BIGINT)))
              AS BIGINT) AS log2_band,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS returned
  FROM lineitem WHERE l_extendedprice >= 1
)
SELECT log2_band,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(returned) AS BIGINT) AS n_returned,
       CAST(SUM(returned) * 1000 // COUNT(*) AS BIGINT)
         AS return_permille
FROM banded GROUP BY 1
""",
    doc="Return rate by price band: lines bucketed into doubling price "
    "bands (the exact bit-length banding of order_value_log2_"
    "histogram) with the returned-flag share in integer permille — "
    "'do expensive items come back more' is the merchandising "
    "question behind restocking-fee and inspection policies, and the "
    "doubling bands keep the heavy-tailed price axis readable where "
    "linear bands collapse. One map-side-combinable aggregate; no "
    "floats anywhere.",
    tags=("agg", "reporting", "returns", "histogram"),
)
def returns_rate_by_price_band(spark: SparkSession, sf_dir: str):
    banded = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_extendedprice") >= 1)
        .select(
            F.length(
                F.bin(F.floor(F.col("l_extendedprice")).cast("bigint"))
            ).cast("bigint").alias("log2_band"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            .alias("returned"),
        )
    )
    return banded.groupBy("log2_band").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("returned").cast("bigint").alias("n_returned"),
        F.expr("SUM(returned) * 1000 DIV COUNT(*)").cast("bigint")
        .alias("return_permille"),
    )


@register(
    "quantile_sketch_binned",
    oracle="""
WITH c AS (
  SELECT CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS c FROM lineitem
),
b AS (
  SELECT MIN(c) AS lo, MAX(c) - MIN(c) + 1 AS rng,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM c
),
hist AS (
  SELECT ((c.c - b.lo) * 256) // b.rng AS bin, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM c, b GROUP BY 1
),
cum AS (
  SELECT bin, cnt, CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum
  FROM hist
),
qs AS (SELECT unnest([500, 900, 950, 990]) AS q_permille),
j AS (
  SELECT q.q_permille, h.bin, h.cnt, h.cum,
         ((q.q_permille * b.n) + 999) // 1000 AS target_rank,
         b.lo, b.rng
  FROM qs q, cum h, b
  WHERE h.cum >= ((q.q_permille * b.n) + 999) // 1000
),
pick AS (SELECT q_permille, MIN(bin) AS bin FROM j GROUP BY 1)
SELECT CAST(p.q_permille AS INT) AS q_permille,
       CAST(j.target_rank AS BIGINT) AS target_rank,
       CAST(p.bin AS INT) AS bin,
       CAST(j.lo + (p.bin * j.rng) // 256 AS BIGINT) AS est_cents,
       j.cnt AS bin_count,
       j.cum AS cum_le,
       CAST((j.rng + 255) // 256 AS BIGINT) AS bound_cents
FROM pick p
JOIN j ON j.q_permille = p.q_permille AND j.bin = p.bin
""",
    doc="Mergeable fixed-width-histogram quantile sketch over "
    "l_extendedprice — the missing member of the portable-sketch "
    "family (Bloom membership, CMS frequency, HLL cardinality, and "
    "now rank/quantile): p50/p90/p95/p99 from a 256-bin histogram "
    "whose per-partition partials merge by plain ADDITION, i.e. the "
    "map-side combine IS the sketch merge — build per shard/day, sum "
    "the 256-int states, never rescan history, exactly how a 100 TB "
    "pipeline tracks latency/price percentiles. Two passes: an exact "
    "min/max/count aggregate (map-side, broadcast back) fixes the bin "
    "domain, then one map-side-combinable histogram aggregate; the "
    "256-row cumulative scan is a driver-scale window, not a data "
    "window. Every number is fixed-point integer arithmetic — "
    "floor(price*100) cents, integer bin = (c-lo)*256 div rng, "
    "integer target rank = ceil-div — so estimate, per-bin count, and "
    "the certified error bound (one bin width, bound_cents) are "
    "bit-identical on any engine: an approximation algorithm with an "
    "EXACTLY oracled answer. Rank guarantee: the true q-quantile lies "
    "within [est_cents, est_cents + bound_cents).",
    tags=("agg", "sketch", "quantile", "incremental"),
    bench=True,
)
def quantile_sketch_binned(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice") * F.lit(100.0))
        .cast("bigint")
        .alias("c")
    )
    b = li.agg(
        F.min("c").alias("lo"),
        (F.max("c") - F.min("c") + F.lit(1)).alias("rng"),
        F.count(F.lit(1)).alias("n"),
    )
    hist = (
        li.join(F.broadcast(b))
        .select(
            F.expr("((c - lo) * 256) div rng").alias("bin"),
            "lo", "rng", "n",
        )
        .groupBy("bin", "lo", "rng", "n")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    qs = F.broadcast(
        cum.sparkSession.range(1).select(
            F.explode(
                F.array(*[F.lit(x) for x in (500, 900, 950, 990)])
            ).alias("q_permille")
        )
    )
    j = (
        cum.join(qs)
        .withColumn(
            "target_rank", F.expr("((q_permille * n) + 999) div 1000")
        )
        .filter(F.col("cum") >= F.col("target_rank"))
    )
    picked = j.groupBy("q_permille").agg(
        F.min("bin").alias("bin"),
        F.min_by("cnt", "bin").alias("bin_count"),
        F.min_by("cum", "bin").alias("cum_le"),
        F.max("target_rank").alias("target_rank"),
        F.max("lo").alias("lo"),
        F.max("rng").alias("rng"),
    )
    return picked.select(
        F.col("q_permille").cast("int").alias("q_permille"),
        F.col("target_rank").cast("bigint").alias("target_rank"),
        F.col("bin").cast("int").alias("bin"),
        (F.col("lo") + F.expr("(bin * rng) div 256"))
        .cast("bigint")
        .alias("est_cents"),
        F.col("bin_count").cast("bigint").alias("bin_count"),
        F.col("cum_le").cast("bigint").alias("cum_le"),
        F.expr("(rng + 255) div 256").cast("bigint").alias("bound_cents"),
    )


@register(
    "graph_personalized_pagerank",
    # MATERIALIZED on every multiply-referenced CTE: DuckDB 1.0 inlines
    # per reference, so the unrolled two-round chain re-ran the edge
    # self-join exponentially (>300s at sf1; ~4s materialized).
    oracle="""
WITH e AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
), nodes AS MATERIALIZED (
  SELECT src AS node FROM e UNION SELECT dst FROM e
), deg AS MATERIALIZED (
  SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1
), seeds AS (
  SELECT src AS node FROM (
    SELECT src, row_number() OVER (ORDER BY COUNT(*) DESC, src ASC) AS rn
    FROM e GROUP BY src
  ) WHERE rn <= 3
), pr0 AS MATERIALIZED (
  SELECT n.node, s.node IS NOT NULL AS is_seed,
         CASE WHEN s.node IS NOT NULL
              THEN CAST(1000000000000000 AS BIGINT) // 3
              ELSE CAST(0 AS BIGINT) END AS pf
  FROM nodes n LEFT JOIN seeds s ON s.node = n.node
), c1 AS MATERIALIZED (
  SELECT e.dst AS node, SUM(p.pf // d.outdeg) AS s
  FROM e JOIN pr0 p ON p.node = e.src AND p.pf > 0
         JOIN deg d ON d.src = e.src
  GROUP BY 1
), pr1 AS MATERIALIZED (
  SELECT p.node, p.is_seed,
         CASE WHEN p.is_seed
              THEN (15 * CAST(1000000000000000 AS BIGINT)) // 300
              ELSE CAST(0 AS BIGINT) END
         + (85 * COALESCE(c1.s, 0)) // 100 AS pf
  FROM pr0 p LEFT JOIN c1 ON c1.node = p.node
), c2 AS MATERIALIZED (
  SELECT e.dst AS node, SUM(p.pf // d.outdeg) AS s
  FROM e JOIN pr1 p ON p.node = e.src AND p.pf > 0
         JOIN deg d ON d.src = e.src
  GROUP BY 1
), pr2 AS (
  SELECT p.node, p.is_seed,
         CASE WHEN p.is_seed
              THEN (15 * CAST(1000000000000000 AS BIGINT)) // 300
              ELSE CAST(0 AS BIGINT) END
         + (85 * COALESCE(c2.s, 0)) // 100 AS pf
  FROM pr1 p LEFT JOIN c2 ON c2.node = p.node
)
SELECT node, is_seed, CAST(pf AS BIGINT) AS ppr_fixed,
       CAST(pf AS DOUBLE) / CAST(1000000000000000 AS DOUBLE) AS ppr
FROM pr2
""",
    doc="Personalized PageRank — random walk with restart to the 3 "
    "highest-degree parts (ties to the lower id: a deterministic seed "
    "rule), two synchronous rounds over the co-purchase graph. The "
    "recommendation-relevance twin of pagerank_copurchase: teleport "
    "mass returns to the SEEDS, so ranks measure proximity to the "
    "seed neighborhood, not global centrality. Same fixed-point 1e-15 "
    "integer arithmetic (bit-identical cross-engine, map-side "
    "combinable SUM), plus the PPR-specific scale property: zero-rank "
    "nodes are filtered before the contribution join (an exact "
    "identity — zero contributes zero), so round r's join touches "
    "only the r-hop seed neighborhood — neighborhood-sized shuffles, "
    "the reason walk-with-restart scales to huge graphs for local "
    "queries. Oracle unrolls both rounds with naive full-table "
    "left-join merges — a structurally different plan that must agree "
    "bit-for-bit.",
    tags=("graph", "iterative", "join", "agg"),
)
def graph_personalized_pagerank(spark: SparkSession, sf_dir: str):
    from ..operators.graph import personalized_pagerank_rounds

    # Shared session-cached distinct edge table; no per-query
    # persist/unpersist lifecycle (the cache outlives this query by
    # design — every graph query in the session reuses it).
    edges = t_copurchase_edges(spark, sf_dir).select("src", "dst")
    seeds = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .orderBy(F.col("outdeg").desc(), F.col("node").asc())
        .limit(3)
        .select("node")
    )
    return personalized_pagerank_rounds(edges, seeds, n_rounds=2)


@register(
    "hll_rolling_distinct",
    oracle="""
WITH u AS (
  SELECT DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_id,
         user_id AS k
  FROM events
), hx AS (
  SELECT day_id, md5(CAST(k AS VARCHAR)) AS h FROM u
), hashed AS (
  SELECT day_id,
         ((instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
          + (instr('0123456789abcdef', substr(h, 2, 1)) - 1)) % 64 AS bucket,
         CAST((instr('0123456789abcdef', substr(h, 3, 1)) - 1) * 17592186044416 + (instr('0123456789abcdef', substr(h, 4, 1)) - 1) * 1099511627776 + (instr('0123456789abcdef', substr(h, 5, 1)) - 1) * 68719476736 + (instr('0123456789abcdef', substr(h, 6, 1)) - 1) * 4294967296 + (instr('0123456789abcdef', substr(h, 7, 1)) - 1) * 268435456 + (instr('0123456789abcdef', substr(h, 8, 1)) - 1) * 16777216 + (instr('0123456789abcdef', substr(h, 9, 1)) - 1) * 1048576 + (instr('0123456789abcdef', substr(h, 10, 1)) - 1) * 65536 + (instr('0123456789abcdef', substr(h, 11, 1)) - 1) * 4096 + (instr('0123456789abcdef', substr(h, 12, 1)) - 1) * 256 + (instr('0123456789abcdef', substr(h, 13, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(h, 14, 1)) - 1) * 1 AS BIGINT) AS v
  FROM hx
), ranked AS (
  SELECT day_id, bucket,
         LEAST(CASE WHEN v = 0 THEN 49
                    ELSE 49 - length(bin(CAST(v AS BIGINT))) END, 40) AS rank
  FROM hashed
), regs AS (
  SELECT day_id, bucket, CAST(MAX(rank) AS BIGINT) AS reg
  FROM ranked GROUP BY 1, 2
), grid AS (
  SELECT t.day_id, g.bucket, COALESCE(r.reg, 0) AS reg
  FROM (SELECT DISTINCT day_id FROM u) t
  CROSS JOIN (SELECT unnest(range(0, 64)) AS bucket) g
  LEFT JOIN regs r ON r.day_id = t.day_id AND r.bucket = g.bucket
), merged AS (
  SELECT day_id, bucket,
         MAX(reg) OVER (PARTITION BY bucket ORDER BY day_id
                        RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS reg
  FROM grid
), withmax AS (
  SELECT day_id, reg, MAX(reg) OVER (PARTITION BY day_id) AS rmax
  FROM merged
), summed AS (
  SELECT day_id, CAST(MAX(rmax) AS BIGINT) AS r_max,
         CAST(SUM(CAST(1 AS BIGINT) << CAST(rmax - reg AS INT)) AS BIGINT)
           AS s
  FROM withmax GROUP BY 1
), empties AS (
  SELECT day_id, CAST(SUM(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_empty
  FROM merged GROUP BY 1
), raw AS (
  SELECT s.day_id, s.r_max, emp.n_empty,
         CAST((709 * 4096 * (CAST(1 AS BIGINT) << CAST(s.r_max AS INT)))
              // (1000 * s.s) AS BIGINT) AS raw_est
  FROM summed s JOIN empties emp ON emp.day_id = s.day_id
)
SELECT day_id, r_max, n_empty,
       CASE WHEN n_empty > 0 AND raw_est < 160
            THEN CAST(([266, 222, 196, 177, 163, 151, 142, 133, 126, 119, 113, 107, 102, 97, 93, 89, 85, 81, 78, 74, 71, 68, 65, 63, 60, 58, 55, 53, 51, 48, 46, 44, 42, 40, 39, 37, 35, 33, 32, 30, 28, 27, 25, 24, 23, 21, 20, 18, 17, 16, 15, 13, 12, 11, 10, 9, 7, 6, 5, 4, 3, 2, 1, 0])[CAST(n_empty AS INT)] AS BIGINT)
            ELSE raw_est END AS hll_est
FROM raw
""",
    doc="Rolling 3-day distinct users via WINDOWED SKETCH MERGE — the "
    "production shape for '90-day rolling uniques' at 100 TB, where "
    "exact sliding COUNT(DISTINCT) would rescan the whole window "
    "every day: each day folds to a fixed 64-register HLL state "
    "(one map-side-combinable aggregate over that day only — the "
    "raw-history scan happens ONCE per day, ever), and the rolling "
    "estimate is a register-MAX over a value-RANGE window of the "
    "tiny (days x 64) state table — merging 90 days costs 90x64 "
    "integer MAXes, not a 90-day rescan. Register MAX over a day "
    "range is exactly the HLL union (same algebra "
    "sketch_merge_equivalence proves for disjoint key halves), so "
    "the windowed estimate IS the estimate of the union of those "
    "days' user sets. Same portable md5 registers + all-integer "
    "estimator as hll_portable_distinct (the per-type twin); "
    "events_sliding_distinct is the exact small-scale twin of this "
    "sketch path. RANGE (value-based) window bounds make day gaps "
    "merge correctly — a ROWS window would silently widen across "
    "missing days.",
    tags=("agg", "sketch", "approx", "distinct", "incremental"),
)
def hll_rolling_distinct(spark: SparkSession, sf_dir: str):
    e = (
        t(spark, sf_dir, "events")
        .select(
            F.expr(
                "CAST(timestampdiff(SECOND,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) AS BIGINT)"
                " div 86400"
            ).alias("day_id"),
            F.col("user_id").alias("k"),
        )
        .distinct()
    )
    regs = _hll_regs(e, key="day_id")
    days = e.select("day_id").distinct()
    grid = (
        days.crossJoin(spark.range(64).select(F.col("id").alias("bucket")))
        .join(regs, ["day_id", "bucket"], "left")
        .select(
            "day_id", "bucket", F.coalesce("reg", F.lit(0)).alias("reg")
        )
    )
    wm = (
        Window.partitionBy("bucket")
        .orderBy("day_id")
        .rangeBetween(-2, Window.currentRow)
    )
    merged = grid.select(
        "day_id", "bucket", F.max("reg").over(wm).alias("reg")
    )
    est = _hll_estimate(spark, days, merged, key="day_id")
    return est.select("day_id", "r_max", "n_empty", "hll_est")


@register(
    "graph_hits_bipartite",
    # MATERIALIZED on the edge list and every state table referenced by
    # both the next half-round and its MAX-normalizer — DuckDB 1.0
    # inlines CTEs per reference, so the unrolled four-half-round chain
    # re-ran the orders-lineitem join exponentially (>300s at sf1; ~3s
    # materialized). The SQL-side twin of the lineage-cut rule the
    # Spark operator applies via localCheckpoint.
    oracle="""
WITH e AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS c, l_partkey AS p
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
a0 AS (SELECT DISTINCT p, CAST(1000 AS BIGINT) AS score FROM e),
h1s AS MATERIALIZED (SELECT e.c, SUM(a0.score) AS s FROM e JOIN a0 ON a0.p = e.p GROUP BY 1),
h1m AS (SELECT GREATEST(MAX(s), 1) AS m FROM h1s),
h1 AS MATERIALIZED (SELECT c, CAST((s * 1000) // h1m.m AS BIGINT) AS score FROM h1s, h1m),
a1s AS MATERIALIZED (SELECT e.p, SUM(h1.score) AS s FROM e JOIN h1 ON h1.c = e.c GROUP BY 1),
a1m AS (SELECT GREATEST(MAX(s), 1) AS m FROM a1s),
a1 AS MATERIALIZED (SELECT p, CAST((s * 1000) // a1m.m AS BIGINT) AS score FROM a1s, a1m),
h2s AS MATERIALIZED (SELECT e.c, SUM(a1.score) AS s FROM e JOIN a1 ON a1.p = e.p GROUP BY 1),
h2m AS (SELECT GREATEST(MAX(s), 1) AS m FROM h2s),
h2 AS MATERIALIZED (SELECT c, CAST((s * 1000) // h2m.m AS BIGINT) AS score FROM h2s, h2m),
a2s AS MATERIALIZED (SELECT e.p, SUM(h2.score) AS s FROM e JOIN h2 ON h2.c = e.c GROUP BY 1),
a2m AS (SELECT GREATEST(MAX(s), 1) AS m FROM a2s),
a2 AS (SELECT p, CAST((s * 1000) // a2m.m AS BIGINT) AS score FROM a2s, a2m)
SELECT 'hub' AS side, c AS id, score AS score_milli FROM h2
UNION ALL
SELECT 'authority' AS side, p AS id, score AS score_milli FROM a2
""",
    doc="HITS hubs & authorities over the BIPARTITE customer→part "
    "purchase graph, two mutual-reinforcement rounds — twelfth member "
    "of the iterative graph family and a different fixpoint structure "
    "again: two coupled score vectors on disjoint id spaces (hubs = "
    "customers who buy widely and well, authorities = parts bought by "
    "strong hubs — the bipartite recommendation primitive), versus "
    "PageRank's single vector. operators.graph.bipartite_hits_rounds: "
    "each half-round is one src- or dst-keyed join + integer SUM with "
    "max-renormalization to milli-units (non-negative floor division, "
    "engine-exact) and a lineage-cut localCheckpoint per state table — "
    "the PageRank-family round discipline applied from day one rather "
    "than retrofitted. Oracle unrolls all four half-rounds as "
    "join+aggregate CTE chains.",
    tags=("graph", "iterative", "join", "agg"),
)
def graph_hits_bipartite(spark: SparkSession, sf_dir: str):
    from ..operators.graph import bipartite_hits_rounds

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("src"), F.col("l_partkey").alias("dst"))
        .distinct()
    )
    return bipartite_hits_rounds(edges, n_rounds=2)


_KMV_K = 64
_KMV_SPACE = 1 << 48


def _hex48_sql(h: str) -> str:
    """First 12 hex chars of md5 column ``h`` as a 48-bit integer —
    the same instr() parse the portable HLL uses."""
    terms = " + ".join(
        f"(instr('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1) * {16 ** (11 - i)}"
        for i in range(12)
    )
    return f"CAST({terms} AS BIGINT)"


@register(
    "kmv_set_intersection",
    oracle=f"""
WITH u AS (
  SELECT DISTINCT event_type, user_id FROM events
),
dv AS MATERIALIZED (
  SELECT DISTINCT event_type,
         {_hex48_sql("md5(CAST(user_id AS VARCHAR))")} AS v
  FROM u
),
ranked AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn
  FROM dv
),
kmv AS MATERIALIZED (SELECT event_type, v FROM ranked WHERE rn <= {_KMV_K}),
stats AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
         CAST(max(v) AS BIGINT) AS vk
  FROM kmv GROUP BY 1
),
est1 AS (
  SELECT event_type,
         CASE WHEN n_kept < {_KMV_K} THEN n_kept
              ELSE ({_KMV_K - 1} * CAST({_KMV_SPACE} AS HUGEINT))
                   // greatest(vk, 1) END AS est
  FROM stats
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM (SELECT DISTINCT event_type FROM dv) a,
       (SELECT DISTINCT event_type FROM dv) b
  WHERE a.event_type < b.event_type
),
merged AS (
  SELECT p.type_a, p.type_b, k.v,
         row_number() OVER (PARTITION BY p.type_a, p.type_b ORDER BY k.v) AS rn
  FROM pairs p
  JOIN kmv k ON k.event_type = p.type_a OR k.event_type = p.type_b
  GROUP BY 1, 2, 3
),
ustats AS (
  SELECT type_a, type_b,
         CAST(count(*) AS BIGINT) AS n_merged,
         CAST(max(CASE WHEN rn <= {_KMV_K} THEN v END) AS BIGINT) AS vku
  FROM merged WHERE rn <= {_KMV_K} GROUP BY 1, 2
),
estu AS (
  SELECT type_a, type_b,
         CASE WHEN n_merged < {_KMV_K} THEN n_merged
              ELSE ({_KMV_K - 1} * CAST({_KMV_SPACE} AS HUGEINT))
                   // greatest(vku, 1) END AS est_union
  FROM ustats
),
exact_i AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS exact_inter
  FROM u a JOIN u b ON b.user_id = a.user_id
                   AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b,
       CAST(ea.est AS BIGINT) AS est_a,
       CAST(eb.est AS BIGINT) AS est_b,
       CAST(eu.est_union AS BIGINT) AS est_union,
       CAST(greatest(ea.est + eb.est - eu.est_union, 0) AS BIGINT) AS est_inter,
       COALESCE(x.exact_inter, 0) AS exact_inter
FROM pairs p
JOIN est1 ea ON ea.event_type = p.type_a
JOIN est1 eb ON eb.event_type = p.type_b
JOIN estu eu ON eu.type_a = p.type_a AND eu.type_b = p.type_b
LEFT JOIN exact_i x ON x.type_a = p.type_a AND x.type_b = p.type_b
""",
    doc="K-Minimum-Values sketch with SET-INTERSECTION estimation "
    "(Bar-Yossef et al. 2002; the theta-sketch family's core idea) — "
    "the fourth portable sketch beside Bloom (membership), CMS "
    "(frequency) and HLL (distinct count): HLL registers can union "
    "but cannot INTERSECT, while two KMV lists merge by 'union the "
    "k-smallest lists, re-take the k smallest' (provably the KMV of "
    "the union, since each side's k-minima contain every candidate) "
    "— giving |A u B|, and |A n B| by inclusion-exclusion. Values "
    "are 48-bit md5 slices (lexicographic uniformity, the same "
    "instr-parse integers as the portable HLL); the estimator "
    "(k-1) * 2^48 / v_k is one truncating integer division, exact on "
    "both engines, and sets with fewer than k values are counted "
    "exactly (their list IS the set). Per event-type pair the query "
    "reports both single-set estimates, the merged-union estimate, "
    "the intersection estimate, and the exact intersection as the "
    "audit column (the eval pattern of cms_heavy_hitters). Scale "
    "shape: per-key state is k 8-byte values — map-side combinable "
    "top-k per partition then k-merge, 512 bytes per set at any "
    "cardinality; the pair stage runs on #types^2 x k driver-sized "
    "rows. The exact-intersection audit column is the only "
    "data-sized join and exists to grade the sketch, not to run at "
    "100 TB.",
    tags=("agg", "sketch", "approx", "eval"),
)
def kmv_set_intersection(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    K, SPACE = _KMV_K, _KMV_SPACE
    u = t(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    v48 = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    dv = u.select("event_type", v48.alias("v")).distinct().persist()
    ranked = dv.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("event_type").orderBy("v")),
    )
    kmv = ranked.filter(F.col("rn") <= K).select("event_type", "v").persist()
    est_expr = F.when(
        F.col("n_kept") < K, F.col("n_kept").cast("decimal(38,0)")
    ).otherwise(
        F.expr(
            f"CAST({K - 1} AS DECIMAL(38,0)) * {SPACE} div greatest(vk, 1)"
        )
    )
    est1 = (
        kmv.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.max("v").alias("vk"),
        )
        .select("event_type", est_expr.cast("bigint").alias("est"))
    )
    types = dv.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .crossJoin(types.select(F.col("event_type").alias("type_b")))
        .filter(F.col("type_a") < F.col("type_b"))
    )
    # pair membership as an explode + equi-join (a disjunctive join
    # condition compiles to BroadcastNestedLoopJoin; the exploded form
    # is a hash join and stays one even with a huge type inventory)
    pair_members = pairs.select(
        "type_a", "type_b",
        F.explode(F.array("type_a", "type_b")).alias("event_type"),
    )
    merged = (
        F.broadcast(pair_members)
        .join(kmv, "event_type")
        .select("type_a", "type_b", "v")
        .distinct()
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("type_a", "type_b").orderBy("v")
            ),
        )
        .filter(F.col("rn") <= K)
    )
    estu_expr = F.when(
        F.col("n_merged") < K, F.col("n_merged").cast("decimal(38,0)")
    ).otherwise(
        F.expr(
            f"CAST({K - 1} AS DECIMAL(38,0)) * {SPACE} div greatest(vku, 1)"
        )
    )
    estu = (
        merged.groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_merged"),
            F.max("v").alias("vku"),
        )
        .select("type_a", "type_b", estu_expr.cast("bigint").alias("est_union"))
    )
    a = u.select(F.col("event_type").alias("type_a"), "user_id")
    b = u.select(F.col("event_type").alias("type_b"), "user_id")
    exact_i = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_inter"))
    )
    ea = est1.select(F.col("event_type").alias("type_a"), F.col("est").alias("est_a"))
    eb = est1.select(F.col("event_type").alias("type_b"), F.col("est").alias("est_b"))
    return (
        pairs.join(F.broadcast(ea), "type_a")
        .join(F.broadcast(eb), "type_b")
        .join(F.broadcast(estu), ["type_a", "type_b"])
        .join(F.broadcast(exact_i), ["type_a", "type_b"], "left")
        .select(
            "type_a", "type_b", "est_a", "est_b", "est_union",
            F.greatest(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), F.lit(0)
            ).cast("bigint").alias("est_inter"),
            F.coalesce(F.col("exact_inter"), F.lit(0)).cast("bigint")
            .alias("exact_inter"),
        )
    )


@register(
    "parts_skyline_2d",
    oracle="""
WITH sky AS (
  SELECT p_retailprice AS price, p_size AS size
  FROM part p
  WHERE NOT EXISTS (
    SELECT 1 FROM part q
    WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
  )
)
SELECT price, size, CAST(COUNT(*) AS BIGINT) AS n_parts
FROM sky GROUP BY 1, 2
""",
    doc="2-D SKYLINE (Pareto frontier) over parts: cheaper price AND "
    "larger size are both better; a part survives iff no other part "
    "weakly dominates it (<= price, >= size, strict somewhere). The "
    "naive plan is the O(n^2) NOT-EXISTS self-join the oracle runs; "
    "the engine's plan is the classic sort-scan: collapse to one row "
    "per distinct price (max size — same-price smaller sizes are "
    "dominated in-group), then a STRICT prefix-max of size over the "
    "ascending price order — a price survives iff its best size "
    "strictly exceeds every cheaper price's best. The prefix-max runs "
    "on operators.prefixsum.distributed_cummax (percentile-fenced "
    "buckets + per-bucket window + bucket-offset composition), so "
    "there is no single-partition window and no pair blowup at any "
    "row count: cost is one groupBy shuffle on price + one bounded "
    "window pass — the 100 TB shape, vs the oracle's quadratic one. "
    "Output is the frontier (price, best size, part count at that "
    "exact point), small by construction.",
    tags=("analytics", "skyline", "prefixsum", "window"),
)
def parts_skyline_2d(spark: SparkSession, sf_dir: str):
    from ..operators.prefixsum import distributed_cummax

    p = t(spark, sf_dir, "part").select(
        F.col("p_retailprice").alias("price"), F.col("p_size").alias("size")
    )
    # One row per price: same-price, smaller-size parts are dominated by
    # the in-group max (strictly larger size at equal price); count how
    # many parts sit exactly ON the candidate point.
    per_price = p.groupBy("price").agg(
        F.max("size").alias("size"),
        F.sum(F.when(F.col("size") == F.lit(0), 0).otherwise(0)).alias("__z"),
    ).drop("__z")
    at_point = p.groupBy("price", "size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts")
    )
    ranked = distributed_cummax(
        per_price, order_col="price", value_col="size", tiebreak=[],
        out_col="prev_best", inclusive=False,
    )
    frontier = ranked.filter(
        F.col("size") > F.coalesce(F.col("prev_best"), F.lit(-1))
    ).drop("prev_best")
    return frontier.join(at_point, ["price", "size"]).select(
        "price", "size", "n_parts"
    )


@register(
    "regression_theilsen_slope",
    oracle="""
WITH daily AS MATERIALIZED (
  SELECT o_orderpriority AS priority, o_orderdate AS d,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 100 AS BIGINT))
              AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1, 2
),
pairs AS (
  SELECT a.priority,
         CAST(b.rev_cents - a.rev_cents AS HUGEINT) AS dy,
         CAST(date_diff('day', a.d, b.d) AS BIGINT) AS dx
  FROM daily a JOIN daily b
    ON b.priority = a.priority AND b.d > a.d
),
slopes AS (
  SELECT priority,
         CAST(CASE WHEN dy < 0 THEN -(((-dy) * 1000000) // dx)
              ELSE (dy * 1000000) // dx END AS BIGINT) AS slope_micro
  FROM pairs
)
SELECT s.priority,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM daily d
        WHERE d.priority = s.priority) AS n_days,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY slope_micro)
            AS BIGINT) AS theilsen_slope_micro
FROM slopes s GROUP BY 1
""",
    doc="THEIL-SEN robust trend: per order priority, the median of all "
    "pairwise day-to-day slopes of the daily-revenue series — the "
    "estimator that shrugs off the outlier days OLS (see "
    "regression_trend_by_priority) gets dragged by, with a 29.3% "
    "breakdown point. Exactness end-to-end: revenue in integer cents "
    "(decimal-exact money sum), slopes as SIGN-SPLIT truncated "
    "integer micro-units (dy*1e6 div dx routed through "
    "DECIMAL(38,0)/HUGEINT — truncation-vs-floor never disagrees on "
    "non-negative operands, the cross-engine '//' trap), and the "
    "median as PERCENTILE_DISC element selection — no float ever "
    "crosses an aggregation. Scale shape: the O(n^2) pair stage runs "
    "over the per-(priority, day) AGGREGATE, whose cardinality is "
    "bounded by the DATE DOMAIN (~2.4k days) regardless of fact-table "
    "row count — at 100 TB the quadratic blowup lands on ~3M bounded "
    "pairs per priority while the unbounded fact table only ever "
    "passes through one map-side-combinable groupBy.",
    tags=("analytics", "stats", "regression", "robust"),
)
def regression_theilsen_slope(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    daily = (
        o.select(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").alias("d"),
            (F.col("o_totalprice").cast("decimal(18,6)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("priority", "d")
        .agg(F.sum(F.col("cents").cast("decimal(25,0)")).cast("bigint")
             .alias("rev_cents"))
    )
    a = daily.select(
        "priority", F.col("d").alias("d_a"), F.col("rev_cents").alias("rev_a")
    )
    # AQE coalesces the ~12k-row daily aggregate to ONE post-shuffle
    # partition (it sizes by the agg output, ~200 KB), which would run
    # the 14.45M-pair broadcast-join explode, the slope division and
    # the selection pass's cache materialization on a single task — a
    # guaranteed straggler whose cost grows with the date domain
    # (measured: pair stage partitions = 1 before this). Re-spreading
    # the tiny stream side costs a 12k-row exchange and buys full
    # parallelism for everything date-domain-quadratic downstream.
    a = a.repartition(
        a.sparkSession.sparkContext.defaultParallelism, "priority", "d_a"
    )
    b = daily.select(
        "priority", F.col("d").alias("d_b"), F.col("rev_cents").alias("rev_b")
    )
    # Explicit broadcast: b is the bounded date-domain aggregate (~12k
    # rows); an SMJ fallback would re-shuffle `a` on the 5-value
    # priority key and undo the spread above.
    pairs = a.join(F.broadcast(b), "priority").filter(
        F.col("d_b") > F.col("d_a")
    ).select(
        "priority",
        (F.col("rev_b") - F.col("rev_a")).alias("dy"),
        F.datediff(F.col("d_b"), F.col("d_a")).cast("bigint").alias("dx"),
    )
    # Sign-split truncated integer division, evaluated once per pair —
    # the hot expression of the whole query (the pair stage runs it
    # date-domain² times). DECIMAL(38,0) arithmetic is BigDecimal-backed
    # per row (precision > 18 leaves Spark's compact-long Decimal
    # representation), which the r11 SQL-graph profile showed as the
    # pair stage's CPU+GC wall. |dy| * 1e6 fits a BIGINT whenever
    # |dy| <= (2^63-1) div 1e6 = 9_223_372_036_854 — daily revenue
    # deltas in cents sit orders of magnitude below that at any
    # realistic scale — so the common case runs as pure codegen long
    # arithmetic and only the overflow-risk tail pays the exact
    # DECIMAL(38,0) path (identical truncated quotient on non-negative
    # operands in both arms; equivalence pinned over the boundary in
    # tests/test_percentiles_exact.py).
    slopes = pairs.select(
        "priority",
        F.expr(
            "CASE WHEN dy BETWEEN -9223372036854 AND 9223372036854 THEN"
            " CASE WHEN dy < 0 THEN -(((-dy) * CAST(1000000 AS BIGINT))"
            " DIV dx) ELSE (dy * CAST(1000000 AS BIGINT)) DIV dx END"
            " ELSE CAST(CASE WHEN dy < 0 THEN"
            " -(((-CAST(dy AS DECIMAL(38,0))) * 1000000) DIV dx)"
            " ELSE (CAST(dy AS DECIMAL(38,0)) * 1000000) DIV dx END"
            " AS BIGINT) END"
        ).alias("slope_micro"),
    )
    n_days = daily.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    # Median slope via bucketed distributed selection
    # (operators.percentiles; equality to grouped percentile_disc
    # pinned in tests/test_percentiles_exact.py). The ObjectAggregate
    # form buffered all ~2.9M pair slopes per priority into one final
    # task (+46s over the 17s pair pipeline at sf0.1); the slopes are
    # ~100% distinct, so the histogram form compresses nothing — the
    # selection form persists the pair join ONCE (bounded: pairs are
    # date-domain², ~3M/priority at any fact size) and sorts only the
    # 1/32 bucket containing the median. Also keeps the median as an
    # EXACT BIGINT element (percentile_disc returns DOUBLE, lossy past
    # 2^53 — the exact element is what the DuckDB oracle selects).
    from ..operators.percentiles import grouped_disc_percentile_bucketed

    med = grouped_disc_percentile_bucketed(
        slopes,
        "priority",
        "slope_micro",
        0.5,
        "theilsen_slope_micro",
        n_col="n_pairs",
    )
    return med.join(F.broadcast(n_days), "priority").select(
        "priority", "n_days", "n_pairs", "theilsen_slope_micro"
    )


@register(
    "graph_degree_assortativity",
    oracle=f"""
WITH e0 AS MATERIALIZED ({_COPURCHASE_EDGES}),
ed AS MATERIALIZED (
  SELECT u AS src, v AS dst FROM e0
  UNION ALL SELECT v AS src, u AS dst FROM e0
), deg AS MATERIALIZED (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM ed GROUP BY 1
), pairs AS (
  SELECT d1.deg AS du, d2.deg AS dv
  FROM ed
  JOIN deg d1 ON d1.node = ed.src
  JOIN deg d2 ON d2.node = ed.dst
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(du) AS BIGINT) AS sx,
         CAST(SUM(dv) AS BIGINT) AS sy,
         SUM(du::HUGEINT * dv) AS sxy,
         SUM(du::HUGEINT * du) AS sxx,
         SUM(dv::HUGEINT * dv) AS syy
  FROM pairs
)
SELECT m,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
       CAST(CAST(m::HUGEINT * sxy - sx::HUGEINT * sy AS VARCHAR) AS DOUBLE)
         / (sqrt(CAST(CAST(m::HUGEINT * sxx - sx::HUGEINT * sx
                           AS VARCHAR) AS DOUBLE))
            * sqrt(CAST(CAST(m::HUGEINT * syy - sy::HUGEINT * sy
                             AS VARCHAR) AS DOUBLE))) AS assortativity
FROM s
""",
    doc="Degree assortativity of the co-purchase graph (Newman 2002, "
    "Phys. Rev. Lett. 89.208701): the Pearson correlation of endpoint "
    "degrees over the directed edge multiset (both orientations, so "
    "the coefficient is the undirected one) — positive means hub "
    "parts co-purchase with hubs (assortative mixing), negative means "
    "hub-leaf structure; the one-number topology summary that tells a "
    "graph pipeline whether degree-based partitioning will skew. "
    "Shape: degrees are one groupBy over the shared persisted edge "
    "table (src-partitioned, exchange elided), one broadcast-free "
    "hash join per endpoint, exact bigint/decimal(38,0) sufficient "
    "statistics, and ONE fixed IEEE tree (string-routed decimal to "
    "double, two correctly-rounded sqrts) mirrored verbatim. No "
    "windows, no iteration — a single-pass statistic at any scale.",
    tags=("graph", "stats", "agg"),
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str):
    edges = t_copurchase_edges(spark, sf_dir).select("src", "dst")
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    n_nodes = F.broadcast(
        deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    )
    pairs = (
        edges.join(deg.withColumnRenamed("deg", "du"), "src")
        .join(
            deg.select(
                F.col("src").alias("dst"), F.col("deg").alias("dv")
            ).hint("shuffle_hash"),
            "dst",
        )
        .select("du", "dv")
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    s = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("du").cast("bigint").alias("sx"),
        F.sum("dv").cast("bigint").alias("sy"),
        F.sum(d19("du") * d19("dv")).cast("decimal(38,0)").alias("sxy"),
        F.sum(d19("du") * d19("du")).cast("decimal(38,0)").alias("sxx"),
        F.sum(d19("dv") * d19("dv")).cast("decimal(38,0)").alias("syy"),
    )
    big = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = big("m") * F.col("sxy") - big("sx") * big("sy")
    dx = big("m") * F.col("sxx") - big("sx") * big("sx")
    dy = big("m") * F.col("syy") - big("sy") * big("sy")
    as_dbl = lambda c: c.cast("decimal(38,0)").cast("string").cast("double")  # noqa: E731
    return s.crossJoin(n_nodes).select(
        "m",
        "n_nodes",
        (
            as_dbl(num) / (F.sqrt(as_dbl(dx)) * F.sqrt(as_dbl(dy)))
        ).alias("assortativity"),
    )


@register(
    "supply_bullwhip_ratio",
    oracle="""
WITH om AS (
  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1
), sm AS (
  SELECT date_trunc('month', CAST(l_shipdate AS DATE)) AS m,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1
), oa AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s,
         SUM(c::HUGEINT * c) AS ss
  FROM om
), sa AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s,
         SUM(c::HUGEINT * c) AS ss
  FROM sm
)
SELECT oa.n AS n_months_orders, sa.n AS n_months_ship,
       CAST(CAST(oa.n::HUGEINT * oa.ss - oa.s::HUGEINT * oa.s
                 AS VARCHAR) AS DOUBLE)
         / (CAST(oa.s AS DOUBLE) * oa.s) AS cv2_orders,
       CAST(CAST(sa.n::HUGEINT * sa.ss - sa.s::HUGEINT * sa.s
                 AS VARCHAR) AS DOUBLE)
         / (CAST(sa.s AS DOUBLE) * sa.s) AS cv2_ship,
       (CAST(CAST(oa.n::HUGEINT * oa.ss - oa.s::HUGEINT * oa.s
                  AS VARCHAR) AS DOUBLE)
          / (CAST(oa.s AS DOUBLE) * oa.s))
         / (CAST(CAST(sa.n::HUGEINT * sa.ss - sa.s::HUGEINT * sa.s
                      AS VARCHAR) AS DOUBLE)
            / (CAST(sa.s AS DOUBLE) * sa.s)) AS bullwhip
FROM oa CROSS JOIN sa
""",
    doc="Bullwhip-effect ratio (Lee, Padmanabhan & Whang 1997): the "
    "squared coefficient of variation of MONTHLY ORDER PLACEMENTS "
    "over that of MONTHLY SHIPMENTS — >1 means demand variability "
    "amplifies upstream, the classic supply-chain instability signal "
    "a demand-planning layer monitors. CV^2 = (n*sum(c^2) - S^2) / "
    "S^2 from exact bigint/decimal(38,0) monthly-count moments "
    "(scale-free, so the two series' different magnitudes don't "
    "distort the ratio); the division tree is fixed IEEE over "
    "string-routed exact decimals, mirrored verbatim. Shape: two "
    "independent map-side-combinable month aggregates (orders, "
    "lineitem) to ~84 rows each, one cross join of two 1-row "
    "moment tables — no joins on data, no windows, at any scale.",
    tags=("analytics", "timeseries", "agg"),
)
def supply_bullwhip_ratio(spark: SparkSession, sf_dir: str):
    om = (
        t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("m"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    sm = (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("m"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )

    def moments(df):
        d19 = F.col("c").cast("decimal(19,0)")
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("c").cast("bigint").alias("s"),
            F.sum(d19 * d19).cast("decimal(38,0)").alias("ss"),
        )

    def cv2(n, s, ss):
        num = (
            F.col(n).cast("decimal(38,0)") * F.col(ss)
            - F.col(s).cast("decimal(38,0)") * F.col(s)
        )
        return (
            num.cast("decimal(38,0)").cast("string").cast("double")
            / (F.col(s).cast("double") * F.col(s))
        )

    oa = moments(om).select(
        F.col("n").alias("n_o"), F.col("s").alias("s_o"),
        F.col("ss").alias("ss_o"),
    )
    sa = moments(sm).select(
        F.col("n").alias("n_s"), F.col("s").alias("s_s"),
        F.col("ss").alias("ss_s"),
    )
    co = cv2("n_o", "s_o", "ss_o")
    cs = cv2("n_s", "s_s", "ss_s")
    return oa.crossJoin(sa).select(
        F.col("n_o").alias("n_months_orders"),
        F.col("n_s").alias("n_months_ship"),
        co.alias("cv2_orders"),
        cs.alias("cv2_ship"),
        (co / cs).alias("bullwhip"),
    )


@register(
    "stats_cramers_v",
    oracle="""
WITH obs AS (
  SELECT o_orderstatus AS status, o_orderpriority AS priority,
         COUNT(*) AS o
  FROM orders GROUP BY 1, 2
), r AS (SELECT status, SUM(o) AS r_tot FROM obs GROUP BY 1),
c AS (SELECT priority, SUM(o) AS c_tot FROM obs GROUP BY 1),
n AS (SELECT SUM(o) AS n_tot FROM obs),
terms AS (
  SELECT obs.status, obs.priority,
         ((obs.o - CAST(r.r_tot * c.c_tot AS DOUBLE) / n.n_tot)
          * (obs.o - CAST(r.r_tot * c.c_tot AS DOUBLE) / n.n_tot))
         / (CAST(r.r_tot * c.c_tot AS DOUBLE) / n.n_tot) AS chi2_term
  FROM obs
  JOIN r ON r.status = obs.status
  JOIN c ON c.priority = obs.priority
  CROSS JOIN n
), folded AS (
  SELECT CAST((SELECT COUNT(*) FROM r) AS BIGINT) AS n_rows,
         CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_cols,
         CAST((SELECT n_tot FROM n) AS BIGINT) AS n,
         list_reduce(
           list(chi2_term ORDER BY status, priority),
           (a, b) -> a + b) AS chi2
  FROM terms
)
SELECT n, n_rows, n_cols, chi2,
       sqrt(chi2 / (n * LEAST(n_rows - 1, n_cols - 1))) AS cramers_v
FROM folded
""",
    doc="Cramér's V effect size for the status-x-priority association — "
    "the [0,1]-normalized companion to contingency_chi2_cells' raw "
    "chi-square terms (a chi2 that looks huge at 1.5M orders can be a "
    "trivial V; effect sizes, not p-values, are what a monitoring "
    "layer should alert on). Reuses the cell formulation verbatim; "
    "the ONE order-sensitive reduction — summing the bounded r*c "
    "cell terms — is an ORDERED FOLD over the cell list sorted by "
    "(status, priority) (Spark F.aggregate over sort_array, DuckDB "
    "list_reduce over list(ORDER BY)), the registry's prescription "
    "for doubles crossing an aggregation; V = sqrt(chi2 / "
    "(n*min(r-1,c-1))) is one more fixed IEEE step. Shape: one count "
    "aggregate + two groups-sized rollups broadcast back, fold over "
    "<=15 rows.",
    tags=("stats", "inference", "agg"),
)
def stats_cramers_v(spark: SparkSession, sf_dir: str):
    obs = (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
    )
    r = obs.groupBy("status").agg(F.sum("o").alias("r_tot"))
    c = obs.groupBy("priority").agg(F.sum("o").alias("c_tot"))
    n = obs.agg(F.sum("o").alias("n_tot"))
    e = (F.col("r_tot") * F.col("c_tot")).cast("double") / F.col("n_tot")
    term = (((F.col("o") - e) * (F.col("o") - e)) / e).alias("chi2_term")
    terms = (
        obs.join(F.broadcast(r), "status")
        .join(F.broadcast(c), "priority")
        .crossJoin(F.broadcast(n))
        .select("status", "priority", term)
    )
    nr = F.broadcast(r.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows")))
    nc = F.broadcast(c.agg(F.count(F.lit(1)).cast("bigint").alias("n_cols")))
    nt = F.broadcast(n.select(F.col("n_tot").cast("bigint").alias("n")))
    folded = terms.agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(F.struct("status", "priority", "chi2_term"))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["chi2_term"],
        ).alias("chi2")
    )
    return (
        folded.crossJoin(nr)
        .crossJoin(nc)
        .crossJoin(nt)
        .select(
            "n",
            "n_rows",
            "n_cols",
            "chi2",
            F.sqrt(
                F.col("chi2")
                / (
                    F.col("n")
                    * F.least(F.col("n_rows") - 1, F.col("n_cols") - 1)
                )
            ).alias("cramers_v"),
        )
    )
