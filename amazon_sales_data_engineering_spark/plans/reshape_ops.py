"""Reshaping and distribution-profiling plans: unpivot (wide→long melt),
windowed distribution statistics (percent_rank / cume_dist / ntile
binning), and heavy-hitter key-skew profiling.

The reference's consumption layer pivots metrics into wide reports
(/root/reference/step_5_curated_to_consumption.py:460-591 builds
column-per-measure fact tables); the inverse melt and the distribution
profile are the missing halves of that reshaping surface, and the skew
profile is the planning input for the salting/bucketing operators
(operators/skew.py) — at 100 TB you profile key skew BEFORE choosing a
join strategy, not after the stage straggles.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import decimal_sum
from .registry import register
from .util import t


@register(
    "unpivot_status_metrics",
    oracle="""
WITH wide AS (
  SELECT o_orderstatus,
         CAST(COUNT(*) AS DOUBLE) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price,
         MAX(o_totalprice) AS max_price
  FROM orders GROUP BY 1
)
SELECT o_orderstatus, metric, value
FROM wide
UNPIVOT (value FOR metric IN (n_orders, total_price, max_price))
""",
    doc="Wide→long melt via DataFrame.unpivot (SQL UNPIVOT / pandas melt): "
    "the inverse of the consumption layer's pivoted reports. Spark lowers "
    "unpivot to a per-row Expand (each input row emits one row per value "
    "column) — a narrow, map-side operation with no shuffle beyond the "
    "upstream aggregate. total_price goes through the exact decimal-sum "
    "idiom before melting so the three metrics share one DOUBLE type "
    "deterministically.",
    tags=("reshape", "unpivot"),
)
def unpivot_status_metrics(spark: SparkSession, sf_dir: str):
    wide = (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_orders"),
            decimal_sum("o_totalprice", alias="total_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )
    return wide.unpivot(
        ids=["o_orderstatus"],
        values=["n_orders", "total_price", "max_price"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "window_rank_distribution",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd,
       CAST(ntile(10) OVER (PARTITION BY o_orderstatus
                       ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS decile
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice)
""",
    doc="Distribution ranks per status: percent_rank ((rank-1)/(n-1)) and "
    "cume_dist (peers_cum/n) are single IEEE divisions of exact integers "
    "— deterministic across engines without any float idiom; ntile gets "
    "the full (price, key) tiebreak because bucket assignment depends on "
    "ROW order, not value order. One sort shuffle on the status key "
    "serves all three window functions (same partitioning, compatible "
    "ordering).",
    tags=("window", "rank"),
)
def window_rank_distribution(spark: SparkSession, sf_dir: str):
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    wt = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(10).over(wt).alias("decile"),
    )


@register(
    "key_skew_profile",
    oracle="""
WITH freq AS (
  SELECT l_partkey AS key, COUNT(*) AS cnt FROM lineitem GROUP BY 1
), tot AS (
  SELECT COUNT(*) AS total, COUNT(DISTINCT l_partkey) AS n_keys FROM lineitem
)
SELECT f.key, f.cnt,
       (f.cnt * 1000000) // t.total AS share_ppm,
       (f.cnt * t.n_keys * 100) // t.total AS x_avg_pct
FROM freq f CROSS JOIN tot t
ORDER BY f.cnt DESC, f.key
LIMIT 20
""",
    doc="Heavy-hitter key-skew profile of the lineitem join key: top-20 "
    "keys by frequency with integer-exact share (ppm) and multiple-of-"
    "average (pct) — the planning input that decides between plain "
    "shuffle join, AQE skew split, and operators.skew.salted_join. All "
    "arithmetic is 64-bit integer multiply/floor-divide (bit-identical "
    "across engines). Shape at scale: one map-side-combinable count "
    "aggregate + a global top-k (Spark TakeOrdered — per-partition heap, "
    "no full sort); the totals row broadcasts.",
    tags=("profile", "skew", "agg"),
)
def key_skew_profile(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    freq = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = li.agg(
        F.count(F.lit(1)).alias("total"),
        F.countDistinct("l_partkey").alias("n_keys"),
    )
    return (
        freq.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "cnt",
            # `div` is Spark's INTEGER division — bit-identical to DuckDB's
            # `//` on positives; float `/`-then-cast could round across an
            # integer boundary.
            F.expr("(cnt * 1000000) div total").alias("share_ppm"),
            F.expr("(cnt * n_keys * 100) div total").alias("x_avg_pct"),
        )
        .orderBy(F.col("cnt").desc(), "key")
        .limit(20)
    )


@register(
    "winsorize_by_status",
    oracle="""
WITH bounds AS (
  SELECT o_orderstatus,
         PERCENTILE_DISC(0.05) WITHIN GROUP (ORDER BY o_totalprice) AS p05,
         PERCENTILE_DISC(0.95) WITHIN GROUP (ORDER BY o_totalprice) AS p95
  FROM orders GROUP BY 1
)
SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice,
       LEAST(GREATEST(o.o_totalprice, b.p05), b.p95) AS winsorized,
       o.o_totalprice < b.p05 OR o.o_totalprice > b.p95 AS was_clipped
FROM orders o JOIN bounds b ON b.o_orderstatus = o.o_orderstatus
""",
    doc="Winsorized robust scaling: per-status p05/p95 fences via exact "
    "PERCENTILE_DISC (fence values are actual data members — zero "
    "interpolation arithmetic, engine-exact by construction), outliers "
    "clamped with least/greatest (pure selection, no float math at "
    "all). The groups-sized bounds table broadcasts back onto the scan; "
    "one aggregate shuffle total.",
    tags=("agg", "profile", "corpus"),
)
def winsorize_by_status(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    bounds = o.groupBy("o_orderstatus").agg(
        F.expr(
            "percentile_disc(0.05) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("p05"),
        F.expr(
            "percentile_disc(0.95) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("p95"),
    )
    return o.join(F.broadcast(bounds), "o_orderstatus").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.least(
            F.greatest(F.col("o_totalprice"), F.col("p05")), F.col("p95")
        ).alias("winsorized"),
        (
            (F.col("o_totalprice") < F.col("p05"))
            | (F.col("o_totalprice") > F.col("p95"))
        ).alias("was_clipped"),
    )


@register(
    "ratio_to_report",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       o_totalprice
         / CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                     OVER (PARTITION BY o_orderstatus) AS VARCHAR) AS DOUBLE)
         AS share_of_status
FROM orders
""",
    doc="Ratio-to-report: each order's share of its status group's total — "
    "the percent-of-total window idiom. The group total goes through the "
    "exact decimal window SUM and leaves via the string route "
    "(bit-identical double in both engines); the share is then one IEEE "
    "division. One window shuffle on the group key, no second pass.",
    tags=("window", "agg"),
)
def ratio_to_report(spark: SparkSession, sf_dir: str):
    w = Window.partitionBy("o_orderstatus")
    total = (
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w)
        .cast("string")
        .cast("double")
    )
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_totalprice") / total).alias("share_of_status"),
    )


@register(
    "outliers_mad_by_status",
    oracle="""
WITH med AS (
  SELECT o_orderstatus,
         PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS med
  FROM orders GROUP BY 1
), dev AS (
  SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice, m.med,
         abs(o.o_totalprice - m.med) AS adev
  FROM orders o JOIN med m ON m.o_orderstatus = o.o_orderstatus
), mad AS (
  SELECT o_orderstatus,
         PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY adev) AS mad
  FROM dev GROUP BY 1
)
SELECT d.o_orderkey, d.o_orderstatus, d.o_totalprice, d.med, m.mad,
       d.adev > 3.0 * m.mad AS is_outlier
FROM dev d JOIN mad m ON m.o_orderstatus = d.o_orderstatus
""",
    doc="Robust outlier flags via median absolute deviation: per-status "
    "median and MAD both come from exact PERCENTILE_DISC (actual data "
    "members, zero interpolation), the deviation is one IEEE subtraction "
    "and the 3-MAD fence one multiply — fully deterministic robust "
    "statistics, immune to the outliers that poison mean/stddev fences "
    "(complementing zscore_by_group and winsorize_by_status). Two "
    "groups-sized aggregates broadcast back; the fact table is scanned "
    "twice but shuffled never.",
    tags=("agg", "profile", "stats"),
)
def outliers_mad_by_status(spark: SparkSession, sf_dir: str):
    # Both medians via the per-group value histogram
    # (operators.percentiles; equality to the grouped percentile_disc
    # aggregate pinned in tests/test_percentiles_exact.py): the
    # ObjectAggregate form buffered every one of the ~500k rows per
    # status group into its single final task — the measured 15s sf0.1
    # wall. The histogram form shuffles one row per distinct (status,
    # value) and streams a running count. o_totalprice is never NULL,
    # so the all-NULL-group contract difference cannot arise.
    from ..operators.percentiles import grouped_disc_percentile

    o = t(spark, sf_dir, "orders")
    med = grouped_disc_percentile(o, "o_orderstatus", "o_totalprice", 0.5, "med")
    dev = o.join(F.broadcast(med), "o_orderstatus").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        "med",
        F.abs(F.col("o_totalprice") - F.col("med")).alias("adev"),
    )
    mad = grouped_disc_percentile(dev, "o_orderstatus", "adev", 0.5, "mad")
    return dev.join(F.broadcast(mad), "o_orderstatus").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        "med",
        "mad",
        (F.col("adev") > F.lit(3.0) * F.col("mad")).alias("is_outlier"),
    )


@register(
    "histogram_equidepth_price",
    oracle="""
WITH b AS (
  SELECT [PERCENTILE_DISC(0.1) WITHIN GROUP (ORDER BY l_extendedprice),
          PERCENTILE_DISC(0.2) WITHIN GROUP (ORDER BY l_extendedprice),
          PERCENTILE_DISC(0.3) WITHIN GROUP (ORDER BY l_extendedprice),
          PERCENTILE_DISC(0.4) WITHIN GROUP (ORDER BY l_extendedprice),
          PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY l_extendedprice),
          PERCENTILE_DISC(0.6) WITHIN GROUP (ORDER BY l_extendedprice),
          PERCENTILE_DISC(0.7) WITHIN GROUP (ORDER BY l_extendedprice),
          PERCENTILE_DISC(0.8) WITHIN GROUP (ORDER BY l_extendedprice),
          PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY l_extendedprice)]
           AS bnds
  FROM lineitem
)
SELECT CAST(len(list_filter(b.bnds, x -> x < l_extendedprice)) AS INT)
         AS bucket,
       COUNT(*) AS n_rows,
       MIN(l_extendedprice) AS bucket_min,
       MAX(l_extendedprice) AS bucket_max
FROM lineitem, b
GROUP BY 1
""",
    doc="Equi-DEPTH decile histogram, the scale-honest way: a global "
    "ntile(10) would funnel the whole table through ONE sorted "
    "partition; instead the 9 decile fences come from exact "
    "PERCENTILE_DISC (actual data members) and bucket assignment is a "
    "map-side count of fences strictly below the value (higher-order "
    "filter, whole-stage codegen) with the fence array broadcast. "
    "Bucket populations are approximately equal (exact up to fence "
    "ties — deterministically resolved since both engines use the "
    "identical strict comparison against identical fence values). "
    "Complements the equi-width histogram_extendedprice.",
    tags=("agg", "profile"),
)
def histogram_equidepth_price(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    # The 9 decile fences are a bounded scalar row; compute them via
    # the value HISTOGRAM (operators.percentiles — groupBy + prefix
    # scan + conditional min; equality to percentile_disc pinned in
    # tests/test_percentiles_exact.py) instead of the 9-buffer
    # percentile_disc ObjectAggregate that funnels every row into one
    # task (measured: the remaining 19s of this query's sf0.1 wall
    # after the fence-literal rewrite), then collect ONCE per run as
    # double literals so bucket assignment compiles to 9 codegen
    # compares per row instead of an interpreted 9-element lambda
    # filter per row (HOFs are not codegen'd). Same integers out: the
    # count of fences strictly below the value.
    from ..operators.percentiles import collect_disc_percentiles

    fences = collect_disc_percentiles(
        li, "l_extendedprice", [p / 10 for p in range(1, 10)]
    )
    bucket = sum(
        F.when(F.lit(v) < F.col("l_extendedprice"), 1).otherwise(0)
        for v in fences
    ).cast("int")
    return li.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_extendedprice").alias("bucket_min"),
        F.max("l_extendedprice").alias("bucket_max"),
    )


@register(
    "yoy_growth_by_priority",
    oracle="""
WITH yearly AS (
  SELECT o_orderpriority,
         CAST(year(o_orderdate) AS INT) AS yr,
         COUNT(*) AS n_orders,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR)
              AS DOUBLE) AS revenue
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, yr, n_orders, revenue,
       lag(revenue) OVER w AS prev_revenue,
       (revenue - lag(revenue) OVER w) / lag(revenue) OVER w AS yoy_growth
FROM yearly
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY yr)
""",
    doc="Year-over-year growth per priority: yearly revenue through the "
    "exact decimal sum + string route (bit-identical doubles), then lag "
    "+ one fixed (a-b)/b IEEE chain. First year yields NULL growth, "
    "SQL lag semantics. One aggregate shuffle + one tiny window over "
    "groups×years rows.",
    tags=("window", "agg", "reporting"),
)
def yoy_growth_by_priority(spark: SparkSession, sf_dir: str):
    yearly = (
        t(spark, sf_dir, "orders")
        .groupBy(
            "o_orderpriority",
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("string")
            .cast("double")
            .alias("revenue"),
        )
    )
    w = Window.partitionBy("o_orderpriority").orderBy("yr")
    prev = F.lag("revenue").over(w)
    return yearly.select(
        "o_orderpriority",
        "yr",
        "n_orders",
        "revenue",
        prev.alias("prev_revenue"),
        ((F.col("revenue") - prev) / prev).alias("yoy_growth"),
    )


@register(
    "customer_rfm_segments",
    oracle="""
WITH base AS (
  SELECT o_custkey,
         CAST(date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                        DATE '1999-01-01') AS BIGINT) AS recency_days,
         COUNT(*) AS frequency,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR)
              AS DOUBLE) AS monetary
  FROM orders GROUP BY 1
), fences AS (
  SELECT [PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY recency_days),
          PERCENTILE_DISC(0.50) WITHIN GROUP (ORDER BY recency_days),
          PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY recency_days)] AS rf,
         [PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY frequency),
          PERCENTILE_DISC(0.50) WITHIN GROUP (ORDER BY frequency),
          PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY frequency)] AS ff,
         [PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY monetary),
          PERCENTILE_DISC(0.50) WITHIN GROUP (ORDER BY monetary),
          PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY monetary)] AS mf
  FROM base
)
SELECT b.o_custkey, b.recency_days, b.frequency, b.monetary,
       CAST(4 - len(list_filter(f.rf, x -> x < b.recency_days)) AS INT) AS r_score,
       CAST(1 + len(list_filter(f.ff, x -> x < b.frequency)) AS INT) AS f_score,
       CAST(1 + len(list_filter(f.mf, x -> x < b.monetary)) AS INT) AS m_score
FROM base b CROSS JOIN fences f
""",
    doc="RFM customer segmentation: per-customer recency (days to a FIXED "
    "anchor — never now(), reruns are deterministic), frequency, and "
    "exact-decimal monetary total; quartile scores assigned map-side by "
    "counting broadcast PERCENTILE_DISC fences below the value (recency "
    "inverted: recent = high score). Same scale-honest fence pattern as "
    "histogram_equidepth_price — no global-sort ntile. One customer-"
    "keyed aggregate + one 1-row fence aggregate.",
    tags=("agg", "profile", "reporting"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    base = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("1999-01-01").cast("date"),
            F.max(F.col("o_orderdate").cast("date")),
        )
        .cast("bigint")
        .alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("string")
        .cast("double")
        .alias("monetary"),
    )
    def fence3(col: str):
        return F.array(
            *[
                F.expr(
                    f"percentile_disc(0.{q}) WITHIN GROUP (ORDER BY {col})"
                )
                for q in (25, 50, 75)
            ]
        )

    fences = base.agg(
        fence3("recency_days").alias("rf"),
        fence3("frequency").alias("ff"),
        fence3("monetary").alias("mf"),
    )
    below = lambda arr, v: F.size(  # noqa: E731
        F.filter(F.col(arr), lambda x: x < F.col(v))
    )
    return base.crossJoin(F.broadcast(fences)).select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        (F.lit(4) - below("rf", "recency_days")).cast("int").alias("r_score"),
        (F.lit(1) + below("ff", "frequency")).cast("int").alias("f_score"),
        (F.lit(1) + below("mf", "monetary")).cast("int").alias("m_score"),
    )


@register(
    "pareto_abc_parts",
    oracle="""
WITH rev AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS revenue_dec
  FROM lineitem GROUP BY 1
), tot AS (SELECT SUM(revenue_dec) AS total FROM rev),
cum AS (
  SELECT l_partkey, revenue_dec,
         SUM(revenue_dec) OVER (ORDER BY revenue_dec DESC, l_partkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_dec
  FROM rev
)
SELECT c.l_partkey,
       CAST(CAST(c.revenue_dec AS VARCHAR) AS DOUBLE) AS revenue,
       CAST(CAST(c.cum_dec AS VARCHAR) AS DOUBLE)
         / CAST(CAST(t.total AS VARCHAR) AS DOUBLE) AS cum_share,
       CASE WHEN CAST(CAST(c.cum_dec AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(t.total AS VARCHAR) AS DOUBLE) <= 0.8 THEN 'A'
            WHEN CAST(CAST(c.cum_dec AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(t.total AS VARCHAR) AS DOUBLE) <= 0.95 THEN 'B'
            ELSE 'C' END AS abc_class
FROM cum c CROSS JOIN tot t
""",
    doc="ABC/Pareto classification of parts by revenue: global cumulative "
    "share over the revenue-descending order, computed with operators."
    "prefixsum.distributed_cumsum — the two-phase bucket scan "
    "(deterministic PERCENTILE_DISC fences → parallel in-bucket windows "
    "→ broadcast bucket offsets) instead of the single-partition global "
    "window the oracle uses; exact-decimal partials make the two plans "
    "bit-identical. Shares leave the decimal domain via the string "
    "route; class fences compare identical doubles. The cumulative-"
    "distribution shape behind inventory ABC, revenue Pareto, and "
    "cost-coverage reports.",
    tags=("window", "agg", "reporting", "prefixsum"),
)
def pareto_abc_parts(spark: SparkSession, sf_dir: str):
    from ..operators.prefixsum import distributed_cumsum

    rev = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(28,6)")).alias(
                "revenue_dec"
            )
        )
    )
    tot = rev.agg(F.sum("revenue_dec").alias("total"))
    cum = distributed_cumsum(
        rev,
        order_col="revenue_dec",
        value_col="revenue_dec",
        tiebreak=["l_partkey"],
        n_buckets=16,
        descending=True,
        out_col="cum_dec",
    )
    share = F.col("cum_dec").cast("string").cast("double") / F.col(
        "total"
    ).cast("string").cast("double")
    return cum.crossJoin(F.broadcast(tot)).select(
        "l_partkey",
        F.col("revenue_dec").cast("string").cast("double").alias("revenue"),
        share.alias("cum_share"),
        F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C").alias(
            "abc_class"
        ),
    )


@register(
    "order_items_nested_export",
    oracle="""
SELECT l_orderkey,
       list(l_partkey ORDER BY l_partkey) AS item_keys,
       string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_partkey)
         AS item_csv,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY 1
""",
    doc="Nested denormalized export: one row per order carrying its part "
    "keys as a SORTED array and a CSV string — the document-assembly "
    "shape for JSON/feature exports. collect_list order is partition-"
    "nondeterministic, so the engine ALWAYS array_sorts before "
    "emitting (and builds the string from the sorted array), making "
    "nested exports reproducible across runs, retries, and engines. "
    "One map-side-combinable aggregate.",
    tags=("reshape", "export", "agg"),
)
def order_items_nested_export(spark: SparkSession, sf_dir: str):
    keys = F.array_sort(F.collect_list("l_partkey"))
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            keys.alias("item_keys"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "l_orderkey",
            "item_keys",
            F.array_join(
                F.transform(F.col("item_keys"), lambda x: x.cast("string")),
                ",",
            ).alias("item_csv"),
            "n_items",
        )
    )


@register(
    "schema_evolution_audit",
    oracle="""
WITH g1 AS (
  SELECT o_orderkey, o_totalprice, 1 AS generation
  FROM orders WHERE year(CAST(o_orderdate AS DATE)) < 1995
), g2 AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority, 2 AS generation
  FROM orders WHERE year(CAST(o_orderdate AS DATE)) >= 1995
), u AS (
  SELECT * FROM g1 UNION ALL BY NAME SELECT * FROM g2
)
SELECT generation,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(o_orderstatus) AS BIGINT) AS n_status_present,
       CAST(COUNT(*) FILTER (WHERE o_orderpriority IS NULL) AS BIGINT)
         AS n_priority_nulls,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM u GROUP BY generation
""",
    doc="Schema-evolution union audit — the mergeSchema shape every "
    "long-lived lake table hits: an old file generation lacking later "
    "columns (here: pre-1995 orders without o_orderstatus / o_orderpriority) "
    "unioned BY NAME with the evolved generation, missing columns "
    "null-filled, then a per-generation provenance report (rows, "
    "evolved-column presence/null counts, exact-decimal revenue). "
    "Engine: unionByName(allowMissingColumns=True) — the DataFrame "
    "twin of spark.read.option('mergeSchema', true); the audit is one "
    "map-side-combinable aggregate over the union, no shuffle beyond "
    "the 2-group agg. Oracle: DuckDB UNION ALL BY NAME (its native "
    "schema-evolution union).",
    tags=("reshape", "schema-evolution", "audit"),
)
def schema_evolution_audit(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    yr = F.year(F.col("o_orderdate").cast("date"))
    g1 = o.filter(yr < 1995).select(
        "o_orderkey", "o_totalprice", F.lit(1).alias("generation")
    )
    g2 = o.filter(yr >= 1995).select(
        "o_orderkey",
        "o_totalprice",
        "o_orderstatus",
        "o_orderpriority",
        F.lit(2).alias("generation"),
    )
    u = g1.unionByName(g2, allowMissingColumns=True)
    return u.groupBy("generation").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderstatus").alias("n_status_present"),
        F.count(F.when(F.col("o_orderpriority").isNull(), 1)).alias(
            "n_priority_nulls"
        ),
        decimal_sum("o_totalprice", alias="revenue"),
    )


@register(
    "join_size_estimate",
    oracle="""
WITH freq AS (
  SELECT l_partkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1
), top AS (
  SELECT key, cnt FROM freq ORDER BY cnt DESC, key LIMIT 20
), tail AS (
  SELECT f.cnt FROM freq f WHERE f.key NOT IN (SELECT key FROM top)
), hh AS (SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS hh_pairs FROM top),
tl AS (
  SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS tail_total,
         CAST(COUNT(*) AS BIGINT) AS tail_keys
  FROM tail
), act AS (
  SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS actual_pairs,
         CAST(COUNT(*) AS BIGINT) AS n_keys
  FROM freq
)
SELECT act.n_keys, hh.hh_pairs,
       CASE WHEN tl.tail_keys = 0 THEN 0
            ELSE (tl.tail_total * tl.tail_total) // tl.tail_keys
       END AS tail_est_pairs,
       hh.hh_pairs + (CASE WHEN tl.tail_keys = 0 THEN 0
            ELSE (tl.tail_total * tl.tail_total) // tl.tail_keys END)
         AS est_pairs,
       act.actual_pairs,
       abs(hh.hh_pairs + (CASE WHEN tl.tail_keys = 0 THEN 0
            ELSE (tl.tail_total * tl.tail_total) // tl.tail_keys END)
           - act.actual_pairs) * 1000000 // act.actual_pairs
         AS abs_err_ppm
FROM act, hh, tl
""",
    doc="Pre-flight join/self-join SIZE ESTIMATION — the cost-based-"
    "optimizer (and LSH-bucket pre-flight) calculation: predict "
    "Σ cnt(k)² for the l_partkey self-join from a bounded summary "
    "(top-20 exact heavy hitters + uniform-tail assumption "
    "tail_total²/tail_keys) and report it against the exact second "
    "frequency moment with an integer ppm error. This is the number "
    "that decides whether a candidate-pair stage will blow up BEFORE "
    "running it. Shape at scale: one map-side-combinable count, a "
    "TakeOrdered top-20 (per-partition heaps), a broadcast anti-join "
    "for the tail, three 1-row aggregates cross-joined broadcast — the "
    "summary is O(20), never the key set. All 64-bit integer "
    "multiply/floor-divide on non-negative terms (engine-exact).",
    tags=("profile", "planner", "estimate"),
)
def join_size_estimate(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    freq = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    top = freq.orderBy(F.col("cnt").desc(), "key").limit(20)
    tail = freq.join(F.broadcast(top.select("key")), "key", "left_anti")
    hh = top.agg(F.sum(F.col("cnt") * F.col("cnt")).alias("hh_pairs"))
    tl = tail.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("tail_total"),
        F.count(F.lit(1)).alias("tail_keys"),
    )
    act = freq.agg(
        F.sum(F.col("cnt") * F.col("cnt")).alias("actual_pairs"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    tail_est = F.when(F.col("tail_keys") == 0, F.lit(0).cast("bigint")).otherwise(
        F.expr("(tail_total * tail_total) div tail_keys")
    )
    return (
        act.crossJoin(F.broadcast(hh))
        .crossJoin(F.broadcast(tl))
        .select(
            "n_keys",
            "hh_pairs",
            tail_est.alias("tail_est_pairs"),
            (F.col("hh_pairs") + tail_est).alias("est_pairs"),
            "actual_pairs",
            F.expr(
                "abs(hh_pairs + (CASE WHEN tail_keys = 0 THEN 0"
                " ELSE (tail_total * tail_total) div tail_keys END)"
                " - actual_pairs) * 1000000 div actual_pairs"
            ).alias("abs_err_ppm"),
        )
    )
