"""Gated queries for MERGE/upsert and SCD type-2 maintenance
(operators/merge.py). Target/source/change sets are derived
deterministically from the customer table with modular-arithmetic
predicates, so both engines construct identical inputs and the merge
result is exactly comparable.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.merge import scd2_apply, upsert
from .registry import register
from .util import t


@register(
    "merge_upsert_customers",
    oracle="""
WITH target AS (
  SELECT c_custkey, c_name, c_mktsegment, c_acctbal
  FROM customer WHERE c_custkey % 3 <> 0
), source AS (
  SELECT c_custkey, c_name, 'UPDATED' AS c_mktsegment,
         c_acctbal + 1000.0 AS c_acctbal
  FROM customer WHERE c_custkey % 2 = 0
)
SELECT * FROM target
WHERE c_custkey NOT IN (SELECT c_custkey FROM source)
UNION ALL
SELECT * FROM source
""",
    doc="MERGE / SCD1 upsert: source rows overwrite key-matched target "
    "rows, unmatched source rows append, untouched target rows survive. "
    "Compiled as ONE anti join + union (no full outer): copy-on-write "
    "MERGE, the same strategy Delta executes on parquet. The anti join "
    "broadcasts when the delta is small — the daily-dimension-update "
    "case. Inputs derived from customer via modular predicates on both "
    "engines (ref's append-only delta loads never update; this is the "
    "idiom users need next — SURVEY §2.6 J4/J5 extension).",
    tags=("merge", "upsert", "join"),
)
def merge_upsert_customers(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    target = c.filter(F.col("c_custkey") % 3 != 0).select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )
    source = c.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey",
        "c_name",
        F.lit("UPDATED").alias("c_mktsegment"),
        (F.col("c_acctbal") + F.lit(1000.0)).alias("c_acctbal"),
    )
    return upsert(target, source, ["c_custkey"])


@register(
    "scd2_customer_segments",
    oracle="""
WITH dim AS (
  SELECT c_custkey, c_mktsegment, DATE '2020-01-01' AS valid_from,
         CAST(NULL AS DATE) AS valid_to, 'Y' AS is_current
  FROM customer
), chg AS (
  SELECT c_custkey, 'MOVED' AS c_mktsegment
  FROM customer WHERE c_custkey % 5 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 'NEW' FROM customer WHERE c_custkey % 7 = 0
)
SELECT d.c_custkey, d.c_mktsegment, d.valid_from,
       CASE WHEN c.c_custkey IS NOT NULL AND c.c_mktsegment <> d.c_mktsegment
            THEN DATE '2020-06-01' ELSE d.valid_to END AS valid_to,
       CASE WHEN c.c_custkey IS NOT NULL AND c.c_mktsegment <> d.c_mktsegment
            THEN 'N' ELSE d.is_current END AS is_current
FROM dim d LEFT JOIN chg c ON c.c_custkey = d.c_custkey
UNION ALL
SELECT c.c_custkey, c.c_mktsegment, DATE '2020-06-01', NULL, 'Y'
FROM chg c LEFT JOIN dim d ON d.c_custkey = c.c_custkey
WHERE d.c_custkey IS NULL OR d.c_mktsegment <> c.c_mktsegment
""",
    doc="SCD type-2: changed keys close their current version (valid_to "
    "stamped, is_current → 'N') and insert a new current version; "
    "brand-new keys insert as current; unchanged rows pass through. One "
    "broadcast join against the change set + narrow unions — the "
    "history-preserving dimension idiom the reference's is_active flags "
    "gesture at but never maintain "
    "(/root/reference/Snowflake Worksheets/8. Consumption Layer.sql:14). "
    "eff_date is an explicit parameter, never now() — reruns are "
    "deterministic.",
    tags=("merge", "scd2", "join"),
)
def scd2_customer_segments(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    dim = c.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("2020-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit("Y").alias("is_current"),
    )
    changes = (
        c.filter(F.col("c_custkey") % 5 == 0)
        .select("c_custkey", F.lit("MOVED").alias("c_mktsegment"))
        .unionByName(
            c.filter(F.col("c_custkey") % 7 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                F.lit("NEW").alias("c_mktsegment"),
            )
        )
    )
    return scd2_apply(
        dim,
        changes,
        key="c_custkey",
        tracked=["c_mktsegment"],
        eff_date="2020-06-01",
    )


@register(
    "rollup_incremental_merge",
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_month,
       o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
         AS total_price
FROM orders
GROUP BY 1, 2, 3
""",
    doc="Incremental materialized-aggregate maintenance: the standing "
    "rollup (orders before 1997-01-01) and the new batch (orders on/"
    "after) are each reduced to PARTIAL aggregates — count + exact "
    "DECIMAL sum, never cast to double — then merged by re-aggregating "
    "the union of partials. Because (count, decimal-sum) is a "
    "commutative monoid, merge-of-partials ≡ full recompute, which is "
    "exactly what the oracle computes from scratch. This is the 100 TB "
    "pattern for refreshing a rollup from a daily partition without "
    "touching history: the standing side reads a groups-sized table, "
    "only the batch scans raw rows. The double conversion happens ONCE, "
    "after the merge — converting per-part then summing doubles would "
    "break associativity and the engine hash.",
    tags=("merge", "agg", "incremental"),
)
def rollup_incremental_merge(spark: SparkSession, sf_dir: str):
    from .util import ts_lit

    o = t(spark, sf_dir, "orders")
    split = ts_lit(o, "o_orderdate", "1997-01-01")
    keys = [
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.col("o_orderpriority"),
    ]

    def partial(df):
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias(
                "total_dec"
            ),
        )

    standing = partial(o.filter(F.col("o_orderdate") < split))
    batch = partial(o.filter(F.col("o_orderdate") >= split))
    return (
        standing.unionAll(batch)
        .groupBy("order_year", "order_month", "o_orderpriority")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("total_dec").cast("double").alias("total_price"),
        )
    )


@register(
    "delta_join_view",
    oracle="""
SELECT o.o_orderkey, l.l_linenumber, o.o_custkey, o.o_orderpriority,
       l.l_extendedprice
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
""",
    doc="Incremental JOIN-view maintenance (insert-only deltas on BOTH "
    "sides): orders split at 1997-01-01 order date, lineitem split at "
    "1997-03-01 ship date; the maintained view is "
    "V_old ∪ (ΔO⋈L_old ∪ O_old⋈ΔL ∪ ΔO⋈ΔL) via operators.delta."
    "delta_join, with deltas broadcast so the big old sides are scanned "
    "but never shuffled. The oracle is the from-scratch full join — "
    "proving the delta algebra neither duplicates nor drops a pair. "
    "Complements rollup_incremental_merge (aggregate views) with the "
    "join-view half of incremental materialization.",
    tags=("merge", "incremental", "join"),
)
def delta_join_view(spark: SparkSession, sf_dir: str):
    from ..operators.delta import delta_join
    from .util import ts_lit

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate"
    )
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_linenumber",
        "l_extendedprice",
        "l_shipdate",
    )
    o_split = ts_lit(o, "o_orderdate", "1997-01-01")
    l_split = ts_lit(li, "l_shipdate", "1997-03-01")
    o_old = o.filter(F.col("o_orderdate") < o_split)
    o_new = o.filter(F.col("o_orderdate") >= o_split)
    l_old = li.filter(F.col("l_shipdate") < l_split)
    l_new = li.filter(F.col("l_shipdate") >= l_split)
    cols = [
        "o_orderkey", "l_linenumber", "o_custkey", "o_orderpriority",
        "l_extendedprice",
    ]
    v_old = o_old.join(l_old, "o_orderkey").select(*cols)
    dv = delta_join(
        o_old, o_new, l_old, l_new, on=["o_orderkey"], broadcast_deltas=True
    ).select(*cols)
    return v_old.unionByName(dv)


@register(
    "delete_cascade_audit",
    oracle="""
WITH del AS (
  SELECT c_custkey FROM customer WHERE c_custkey % 13 = 0
), del_orders AS (
  SELECT o.o_orderkey FROM orders o
  JOIN del d ON d.c_custkey = o.o_custkey
)
SELECT 'customer' AS tbl,
       (SELECT COUNT(*) FROM del) AS n_deleted,
       (SELECT COUNT(*) FROM customer) - (SELECT COUNT(*) FROM del)
         AS n_remaining
UNION ALL
SELECT 'orders',
       (SELECT COUNT(*) FROM del_orders),
       (SELECT COUNT(*) FROM orders) - (SELECT COUNT(*) FROM del_orders)
UNION ALL
SELECT 'lineitem',
       (SELECT COUNT(*) FROM lineitem l
        WHERE l.l_orderkey IN (SELECT o_orderkey FROM del_orders)),
       (SELECT COUNT(*) FROM lineitem l
        WHERE l.l_orderkey NOT IN (SELECT o_orderkey FROM del_orders))
""",
    doc="Right-to-be-forgotten cascade audit: a deletion list of customers "
    "(every 13th) propagated through the FK chain customer → orders → "
    "lineitem, reporting deleted/remaining counts per table — the "
    "compliance-report shape run BEFORE executing a GDPR erasure. Each "
    "hop is a semi/anti join on the parent's surviving keys (broadcast "
    "when the delete list is small, AQE otherwise); nothing is "
    "rewritten, so the audit is safely re-runnable. Counts are exact "
    "integers.",
    tags=("merge", "join", "compliance"),
)
def delete_cascade_audit(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    del_c = c.filter(F.col("c_custkey") % 13 == 0).select("c_custkey")
    del_o = o.join(
        F.broadcast(del_c), o.o_custkey == del_c.c_custkey, "left_semi"
    ).select("o_orderkey")
    del_li = li.join(
        F.broadcast(del_o), li.l_orderkey == del_o.o_orderkey, "left_semi"
    )

    def counts(tbl_name, total_df, deleted_df):
        nd = deleted_df.agg(F.count(F.lit(1)).alias("n_deleted"))
        nt = total_df.agg(F.count(F.lit(1)).alias("n_total"))
        return nd.crossJoin(nt).select(
            F.lit(tbl_name).alias("tbl"),
            "n_deleted",
            (F.col("n_total") - F.col("n_deleted")).alias("n_remaining"),
        )

    return (
        counts("customer", c, del_c)
        .unionByName(counts("orders", o, del_o))
        .unionByName(counts("lineitem", li, del_li))
    )
