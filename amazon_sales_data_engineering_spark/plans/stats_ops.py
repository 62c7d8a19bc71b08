"""Distributed statistical inference operators.

Nonparametric two-sample tests (Kolmogorov-Smirnov, Mann-Whitney U),
survival analysis (Kaplan-Meier), and resampling inference — the
statistics a data-quality / experimentation layer runs next to the
training-data pipeline (is this source's price distribution drifting?
did the curation change shift quality scores? what is the churn curve?).

Determinism discipline (plans.registry docstring): every test statistic
here is either EXACT 64-bit integer arithmetic end to end (KS, MWU —
rank/ECDF statistics are counts, so the classic formulas have exact
rational forms) or a fixed-parenthesization fold over exact inputs
mirrored verbatim in the oracle (Kaplan-Meier's product-limit). No float
ever crosses an aggregation boundary; transcendental functions are never
used (no ln/exp — the same rule that shaped phrase_pmi_top50's
lift-ratio form).

Scale discipline: the only per-row work is one map-side-combinable
groupBy on the value domain; cumulative counts run on
operators.prefixsum.distributed_cumsum (percentile-fenced buckets — no
single-partition window over the value domain, which at 100 TB is as
large as the fact table for near-continuous measures like prices).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.prefixsum import distributed_cumsum
from .registry import register
from .util import t

# Two fixed strata for the two-sample tests: the extreme order
# priorities. Any pair of predicates would do; these are stable TPC-H
# values present at every sf.
_GRP_A = "1-URGENT"
_GRP_B = "5-LOW"

#: Packing radix for the fused two-group cumulative count: one
#: distributed prefix-sum pass carries BOTH groups' running ECDF counts
#: as ca*2^32 + cb. Requires n_b < 2^32 and n_a*2^32 inside the
#: prefix-sum's decimal(28,6) integer headroom (n_a < ~2.5e12) — far
#: above the gate corpora; a 100 TB deployment with more than 4e9 rows
#: in one stratum widens the radix (or runs two passes).
_RADIX = 4_294_967_296


def _two_sample_ecdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per distinct o_totalprice of the pooled two-group sample: the
    group counts at that value (ca, cb) and the inclusive running counts
    (cca, ccb) over ascending price, plus the group totals (n_a, n_b).

    Shape: one map-side-combinable groupBy on the value, ONE fused
    distributed prefix-sum (radix-packed — see _RADIX), and a broadcast
    of the 1-row totals. Nothing here is a single-partition window.
    """
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin(_GRP_A, _GRP_B)
    )
    s = o.select(
        F.col("o_totalprice").alias("price"),
        F.when(F.col("o_orderpriority") == _GRP_A, F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("ia"),
        F.when(F.col("o_orderpriority") == _GRP_B, F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("ib"),
    )
    g = s.groupBy("price").agg(
        F.sum("ia").alias("ca"), F.sum("ib").alias("cb")
    )
    packed = g.withColumn(
        "__packed", F.col("ca") * F.lit(_RADIX) + F.col("cb")
    )
    cum = distributed_cumsum(
        packed, order_col="price", value_col="__packed", tiebreak=[],
        out_col="__cum",
    ).withColumn("__cum_b", F.col("__cum").cast("bigint"))
    unpacked = cum.select(
        "price",
        "ca",
        "cb",
        F.expr(f"__cum_b DIV {_RADIX}").alias("cca"),
        (F.col("__cum_b") % F.lit(_RADIX)).alias("ccb"),
    )
    tot = F.broadcast(
        s.agg(
            F.sum("ia").alias("n_a"), F.sum("ib").alias("n_b")
        )
    )
    return unpacked.crossJoin(tot)


_ECDF_SQL = f"""
s AS (
  SELECT o_totalprice AS price,
         CASE WHEN o_orderpriority = '{_GRP_A}' THEN 1 ELSE 0 END AS ia,
         CASE WHEN o_orderpriority = '{_GRP_B}' THEN 1 ELSE 0 END AS ib
  FROM orders
  WHERE o_orderpriority IN ('{_GRP_A}', '{_GRP_B}')
), g AS (
  SELECT price, CAST(SUM(ia) AS BIGINT) AS ca, CAST(SUM(ib) AS BIGINT) AS cb
  FROM s GROUP BY 1
), c AS (
  SELECT price, ca, cb,
         CAST(SUM(ca) OVER (ORDER BY price
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cca,
         CAST(SUM(cb) OVER (ORDER BY price
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS ccb
  FROM g
), n AS (
  SELECT CAST(SUM(ia) AS BIGINT) AS n_a, CAST(SUM(ib) AS BIGINT) AS n_b
  FROM s
)
"""


@register(
    "stats_ks_two_sample",
    oracle=f"""
WITH {_ECDF_SQL}
SELECT n_a, n_b,
       CAST(MAX(ABS(cca * n_b - ccb * n_a)) AS BIGINT) AS d_num,
       CAST(MAX(ABS(cca * n_b - ccb * n_a)) AS DOUBLE) / (n_a * n_b)
         AS ks_d
FROM c CROSS JOIN n
GROUP BY n_a, n_b
""",
    doc="Two-sample Kolmogorov-Smirnov statistic between the URGENT and "
    "LOW order-priority price distributions — the standard "
    "distribution-drift test a data-quality layer runs between corpus "
    "snapshots. D = max |ECDF_a - ECDF_b| is computed EXACTLY as the "
    "integer max of |cca*n_b - ccb*n_a| over the pooled distinct "
    "values (both ECDFs share every jump point), leaving the integer "
    "domain once, in ONE final division mirrored verbatim in the "
    "oracle. Shape: groupBy on the value domain, one radix-packed "
    "distributed prefix-sum (percentile-fenced buckets, no "
    "single-partition window — the value domain of a near-continuous "
    "measure grows with the data), one max. The oracle's window "
    "cumsum is the small-scale formulation; the engine's bucket scan "
    "is the 100 TB one.",
    tags=("stats", "inference", "prefixsum"),
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str):
    e = _two_sample_ecdf(spark, sf_dir)
    d = F.abs(
        F.col("cca") * F.col("n_b") - F.col("ccb") * F.col("n_a")
    )
    return e.groupBy("n_a", "n_b").agg(
        F.max(d).cast("bigint").alias("d_num"),
        (
            F.max(d).cast("double") / (F.col("n_a") * F.col("n_b"))
        ).alias("ks_d"),
    ).select("n_a", "n_b", "d_num", "ks_d")


@register(
    "stats_mannwhitney_u",
    oracle=f"""
WITH {_ECDF_SQL}
SELECT n_a, n_b,
       CAST(SUM(ca * (2 * (ccb - cb) + cb)) AS BIGINT) AS u2_a,
       CAST(2 * n_a * n_b - SUM(ca * (2 * (ccb - cb) + cb)) AS BIGINT)
         AS u2_b
FROM c CROSS JOIN n
GROUP BY n_a, n_b
""",
    doc="Mann-Whitney U (rank-sum) statistic between the URGENT and LOW "
    "price distributions, tie-corrected, in EXACT integer arithmetic: "
    "U_a counts (a,b) pairs where a wins, ties worth 1/2 — doubled to "
    "stay integral, U2_a = sum over distinct values v of "
    "ca_v * (2*B_less(v) + cb_v) where B_less is the exclusive "
    "cumulative b-count below v; U2_a + U2_b = 2*n_a*n_b by "
    "construction (the identity is property-tested). Same "
    "radix-packed distributed-prefix-sum shape as the KS statistic — "
    "one value-domain groupBy, one bucket-fenced cumulative pass, no "
    "O(n_a*n_b) pair join and no single-partition window at any "
    "scale.",
    tags=("stats", "inference", "prefixsum"),
)
def stats_mannwhitney_u(spark: SparkSession, sf_dir: str):
    e = _two_sample_ecdf(spark, sf_dir)
    contrib = F.col("ca") * (
        F.lit(2) * (F.col("ccb") - F.col("cb")) + F.col("cb")
    )
    return e.groupBy("n_a", "n_b").agg(
        F.sum(contrib).cast("bigint").alias("u2_a"),
        (
            F.lit(2) * F.col("n_a") * F.col("n_b") - F.sum(contrib)
        ).cast("bigint").alias("u2_b"),
    ).select("n_a", "n_b", "u2_a", "u2_b")


@register(
    "survival_kaplan_meier",
    oracle="""
WITH fo AS (
  SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS fd
  FROM orders GROUP BY 1
), nx AS (
  SELECT f.o_custkey, MIN(CAST(o.o_orderdate AS DATE)) AS sd
  FROM fo f JOIN orders o
    ON o.o_custkey = f.o_custkey AND CAST(o.o_orderdate AS DATE) > f.fd
  GROUP BY 1
), horizon AS (
  SELECT MAX(CAST(o_orderdate AS DATE)) AS maxd FROM orders
), durs AS (
  SELECT CASE WHEN n.sd IS NULL
              THEN date_diff('day', f.fd, h.maxd)
              ELSE date_diff('day', f.fd, n.sd) END AS dur,
         CASE WHEN n.sd IS NULL THEN 0 ELSE 1 END AS ev
  FROM fo f
  LEFT JOIN nx n ON n.o_custkey = f.o_custkey
  CROSS JOIN horizon h
), km AS (
  SELECT CAST(dur AS BIGINT) AS dur,
         CAST(SUM(ev) AS BIGINT) AS d_events,
         CAST(SUM(1 - ev) AS BIGINT) AS c_censored
  FROM durs GROUP BY 1
), risk AS (
  SELECT dur, d_events, c_censored,
         CAST((SELECT COUNT(*) FROM fo)
           - COALESCE(SUM(d_events + c_censored) OVER (
               ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_risk
  FROM km
), fac AS (
  SELECT *, CAST(n_risk - d_events AS DOUBLE) / n_risk AS factor
  FROM risk
), arr AS (
  SELECT list(factor ORDER BY dur) AS fl, list(dur ORDER BY dur) AS dl
  FROM fac
)
SELECT dur, n_risk, d_events, c_censored,
       list_reduce(fl[1:len(list_filter(dl, x -> x <= fac.dur))],
                   (a, b) -> a * b) AS survival
FROM fac CROSS JOIN arr
""",
    doc="Kaplan-Meier product-limit estimator of time-to-repeat-purchase: "
    "per customer, the event is the first order strictly after the "
    "first order date; customers with no repeat are right-CENSORED at "
    "the corpus horizon (max order date). Output: one row per "
    "distinct duration with the at-risk count, events, censored, and "
    "the survival curve S(t) = prod_{u<=t} (n_u - d_u)/n_u. "
    "Determinism: per-step factors are single divisions of exact "
    "integers (bit-identical both engines); S(t) is a LEFT FOLD over "
    "the duration-ascending factor array — Spark F.aggregate over "
    "sort_array(collect_list), DuckDB list_reduce over list(ORDER BY) "
    "— same association order, so bit-identical products (the "
    "ordered-fold alternative the registry prescribes for unbounded "
    "doubles crossing an aggregation; no ln/exp round-trip). Scale "
    "shape: two map-side-combinable aggregates over orders collapse "
    "the fact table to one row per distinct DURATION — bounded by the "
    "date-domain span (~2.5k) regardless of row count (the theilsen "
    "bounded-domain argument), so the running at-risk window and the "
    "O(T^2) fold both run on a ~2.5k-row table at any corpus size.",
    tags=("stats", "survival", "inference"),
)
def survival_kaplan_meier(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    first = o.groupBy("cust").agg(F.min("d").alias("fd"))
    nxt = (
        o.join(first, "cust")
        .filter(F.col("d") > F.col("fd"))
        .groupBy("cust")
        .agg(F.min("d").alias("sd"))
    )
    horizon = F.broadcast(o.agg(F.max("d").alias("maxd")))
    durs = (
        first.join(nxt, "cust", "left")
        .crossJoin(horizon)
        .select(
            F.when(
                F.col("sd").isNull(), F.datediff(F.col("maxd"), F.col("fd"))
            )
            .otherwise(F.datediff(F.col("sd"), F.col("fd")))
            .cast("bigint")
            .alias("dur"),
            F.when(F.col("sd").isNull(), F.lit(0))
            .otherwise(F.lit(1))
            .cast("bigint")
            .alias("ev"),
        )
    )
    km = durs.groupBy("dur").agg(
        F.sum("ev").cast("bigint").alias("d_events"),
        F.sum(F.lit(1) - F.col("ev")).cast("bigint").alias("c_censored"),
    )
    n_total = F.broadcast(first.agg(F.count(F.lit(1)).alias("__n")))
    # Running at-risk count: exclusive prefix over the per-duration
    # table, which is BOUNDED by the date-domain span (~2.5k rows at any
    # corpus size — see docstring), so a plain single window is the
    # right plan here, not the bucket scan.
    w = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    risk = (
        km.crossJoin(n_total)
        .withColumn(
            "n_risk",
            (
                F.col("__n")
                - F.coalesce(
                    F.sum(F.col("d_events") + F.col("c_censored")).over(w),
                    F.lit(0),
                )
            ).cast("bigint"),
        )
        .drop("__n")
    )
    fac = risk.withColumn(
        "factor",
        (F.col("n_risk") - F.col("d_events")).cast("double")
        / F.col("n_risk"),
    )
    arr = F.broadcast(
        fac.agg(
            F.sort_array(
                F.collect_list(F.struct("dur", "factor"))
            ).alias("__fl")
        )
    )
    surv = F.aggregate(
        F.filter(F.col("__fl"), lambda x: x["dur"] <= F.col("dur")),
        F.lit(1.0),
        lambda acc, x: acc * x["factor"],
    )
    return (
        fac.crossJoin(arr)
        .select(
            "dur",
            "n_risk",
            "d_events",
            "c_censored",
            surv.alias("survival"),
        )
    )
