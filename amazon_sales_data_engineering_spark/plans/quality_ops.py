"""Warehouse-operations queries: declarative data-quality auditing,
snapshot reconciliation, and the semi-join-reducer join pattern.

These are the operations a table owner runs continuously at 100 TB:
Deequ-style constraint checks (one pass, no per-rule scans), checksum
table diffs between snapshots (the anti-entropy primitive behind
replication checks and CDC backfills), and runtime pre-filtering of a
big probe side by a compact digest of the build side (what Spark's own
runtime bloom filter / Trino's dynamic filtering do — expressed here as
an explicit, engine-portable plan).

Determinism: counts and booleans are integers; row fingerprints hash
string/integer renderings only (never floats — double formatting is the
one place engines disagree, see plans.registry).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .registry import register
from .util import t

# Revenue idiom (see plans.registry): exact decimal sum, then one
# deterministic decimal->double conversion.
_REVENUE_SQL = (
    "CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,8)))"
    " AS DECIMAL(25,6)) AS DOUBLE)"
)


def _revenue_sum():
    return (
        F.sum(
            (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
                "decimal(25,8)"
            )
        )
        .cast("decimal(25,6)")
        .cast("double")
    )


@register(
    "dq_constraint_audit",
    oracle="""
WITH scan AS (
  SELECT CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS v_null,
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v_pk,
         CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                  THEN 1 ELSE 0 END) AS BIGINT) AS v_domain,
         CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS v_range
  FROM orders
), ri AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v_ri
  FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
)
SELECT rule, n_violations, n_violations = 0 AS passed FROM (
  SELECT 'not_null_custkey' AS rule, v_null AS n_violations FROM scan
  UNION ALL SELECT 'pk_unique_orderkey', v_pk FROM scan
  UNION ALL SELECT 'domain_orderstatus', v_domain FROM scan
  UNION ALL SELECT 'range_totalprice_positive', v_range FROM scan
  UNION ALL SELECT 'ri_orders_customer', v_ri FROM ri
)
""",
    doc="Declarative data-quality audit (the Deequ/expectations pattern): "
    "not-null, primary-key uniqueness, value domain, numeric range, and "
    "referential integrity, reported as one (rule, violations, passed) "
    "row each. Shape at 100 TB: the four scan rules share ONE pass over "
    "the table (a single aggregate computing all four counters — never "
    "a scan per rule); RI is the only rule that needs a second input "
    "and runs as a left-anti count against the dimension (broadcast "
    "when small). Integer counters only.",
    tags=("quality", "audit", "agg"),
)
def dq_constraint_audit(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    scan = o.agg(
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("v_null"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("bigint")
        .alias("v_pk"),
        F.sum(F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0))
        .cast("bigint")
        .alias("v_domain"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("bigint")
        .alias("v_range"),
    )
    scan_rules = scan.select(
        F.expr(
            "stack(4, "
            "'not_null_custkey', v_null, "
            "'pk_unique_orderkey', v_pk, "
            "'domain_orderstatus', v_domain, "
            "'range_totalprice_positive', v_range) AS (rule, n_violations)"
        )
    )
    ri = (
        o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
        .select(F.lit("ri_orders_customer").alias("rule"), "n_violations")
    )
    return scan_rules.unionByName(ri).select(
        "rule", "n_violations", (F.col("n_violations") == 0).alias("passed")
    )


# Synthetic snapshot pair derived deterministically from orders:
#   v1 drops keys ≡ 4 (mod 5)  — rows "removed" in v1's view
#   v2 drops keys ≡ 0 (mod 5)  — those count as removed vs v1
#   v2 rewrites o_orderpriority for keys ≡ 0 (mod 3) — "changed"
# The fingerprint hashes string/integer columns only.
_FP_SQL = (
    "md5(CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus || '|' || {prio}"
    " || '|' || CAST(CAST(o_orderdate AS DATE) AS VARCHAR))"
)


@register(
    "table_diff_reconcile",
    oracle=f"""
WITH v1 AS (
  SELECT o_orderkey AS k, {_FP_SQL.format(prio="o_orderpriority")} AS fp
  FROM orders WHERE o_orderkey % 5 <> 4
), v2 AS (
  SELECT o_orderkey AS k,
         {_FP_SQL.format(prio="CASE WHEN o_orderkey % 3 = 0 THEN 'CHANGED' ELSE o_orderpriority END")} AS fp
  FROM orders WHERE o_orderkey % 5 <> 0
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n_rows FROM (
  SELECT CASE WHEN v2.k IS NULL THEN 'removed'
              WHEN v1.k IS NULL THEN 'added'
              WHEN v1.fp <> v2.fp THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
)
GROUP BY status
""",
    doc="Snapshot reconciliation (anti-entropy table diff): two versions "
    "of a table are compared by primary key with a per-row md5 "
    "fingerprint — one full-outer join classifies every key as added / "
    "removed / changed / unchanged, without ever comparing columns "
    "pairwise. This is the primitive behind replication verification, "
    "CDC backfill validation, and migration sign-off. At 100 TB the "
    "join is the only shuffle, and disappears entirely when both "
    "snapshots are written bucketed by key (operators.skew."
    "write_bucketed); fingerprints hash string/integer renderings only "
    "— doubles never enter the hash (engine formatting differs).",
    tags=("quality", "diff", "join", "outer"),
)
def table_diff_reconcile(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")

    def fingerprint(prio):
        return F.md5(
            F.concat_ws(
                "|",
                F.col("o_orderkey").cast("string"),
                F.col("o_orderstatus"),
                prio,
                F.col("o_orderdate").cast("date").cast("string"),
            )
        )

    v1 = o.filter(F.col("o_orderkey") % 5 != 4).select(
        F.col("o_orderkey").alias("k"),
        fingerprint(F.col("o_orderpriority")).alias("fp"),
    )
    v2 = o.filter(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey").alias("k"),
        fingerprint(
            F.when(F.col("o_orderkey") % 3 == 0, F.lit("CHANGED")).otherwise(
                F.col("o_orderpriority")
            )
        ).alias("fp"),
    )
    status = (
        F.when(v2["k"].isNull(), "removed")
        .when(v1["k"].isNull(), "added")
        .when(v1["fp"] != v2["fp"], "changed")
        .otherwise("unchanged")
    )
    return (
        v1.join(v2, v1["k"] == v2["k"], "outer")
        .select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )


@register(
    "dynamic_filter_join",
    oracle=f"""
SELECT p_brand AS brand, {_REVENUE_SQL} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_size = 1
GROUP BY 1
""",
    doc="Semi-join reducer (dynamic filtering / runtime bloom filter, "
    "expressed as an explicit plan): the selective build side "
    "(p_size = 1, ~2% of part) is digested to its DISTINCT hash "
    "buckets — a fixed-size set (<= 8192 values) that broadcasts no "
    "matter how large the dimension grows — and the fact scan is "
    "pre-filtered by a broadcast join on bucket BEFORE the real "
    "shuffle join, so ~98% of probe rows never enter the exchange. "
    "False positives (bucket collisions) are removed by the exact join "
    "that follows; false negatives are impossible (same hash both "
    "sides) — which is precisely what the oracle proves, since it "
    "computes the PLAIN join with no filter logic. Same aggregate "
    "idiom as the star queries.",
    tags=("join", "runtime-filter", "broadcast", "agg"),
    bench=True,
)
def dynamic_filter_join(spark: SparkSession, sf_dir: str):
    dim = t(spark, sf_dir, "part").filter(F.col("p_size") == 1)

    def bucket(key):
        return (key * F.lit(2654435761)) % F.lit(8192)

    buckets = dim.select(bucket(F.col("p_partkey")).alias("bucket")).distinct()
    fact = t(spark, sf_dir, "lineitem").withColumn(
        "bucket", bucket(F.col("l_partkey"))
    )
    prefiltered = fact.join(F.broadcast(buckets), "bucket").drop("bucket")
    return (
        prefiltered.join(dim, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            _revenue_sum().alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )


@register(
    "privacy_k_anonymity",
    oracle="""
WITH cells AS (
  SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
         CAST(floor(c_acctbal / 2000) AS BIGINT) AS balband,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2, 3
)
SELECT nationkey, mktsegment, balband, n,
       n < 5 AS violates_k5,
       CASE WHEN n < 5 THEN n ELSE CAST(0 AS BIGINT) END AS n_suppressed
FROM cells
""",
    doc="k-anonymity audit over the (nationkey, mktsegment, "
    "acctbal-band) quasi-identifier: every equivalence class with "
    "fewer than k=5 members is flagged — its rows are re-"
    "identifiable by a combination of innocuous attributes (both "
    "verdict classes are populated at every gate scale, so the flag "
    "genuinely discriminates) "
    "— and its suppression cost counted — the release-readiness "
    "check that sits next to text_scrub_pii (column-level redaction) "
    "and delete_cascade_audit (row-level erasure) in the compliance "
    "family: scrubbing handles WHAT a row says, k-anonymity handles "
    "WHO a row's attribute combination points at. One "
    "map-side-combinable aggregate over the quasi-identifier — the "
    "same audit runs unchanged on a 100 TB table; generalization "
    "ladders (coarsen attributes until every class passes) iterate "
    "exactly this query.",
    tags=("quality", "privacy", "compliance", "agg"),
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str):
    cells = (
        t(spark, sf_dir, "customer")
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("mktsegment"),
            F.floor(F.col("c_acctbal") / 2000).cast("bigint").alias("balband"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return cells.select(
        "nationkey", "mktsegment", "balband", "n",
        (F.col("n") < 5).alias("violates_k5"),
        F.when(F.col("n") < 5, F.col("n"))
        .otherwise(F.lit(0).cast("bigint"))
        .alias("n_suppressed"),
    )


@register(
    "partition_backfill_plan",
    oracle="""
WITH bounds AS (
  SELECT MIN(o_orderdate) AS lo, MAX(o_orderdate) AS hi FROM orders
), spine AS (
  SELECT CAST(unnest(range(CAST(lo AS DATE), CAST(hi AS DATE) + 1,
                           INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
), daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1
), grid AS (
  SELECT s.day, COALESCE(d.c, 0) AS c
  FROM spine s LEFT JOIN daily d ON d.day = s.day
), trail7 AS (
  SELECT day, c,
         CAST(SUM(c) OVER (ORDER BY day
              ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS t7,
         CAST(COUNT(*) OVER (ORDER BY day
              ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS w
  FROM grid
)
SELECT day, c, t7, w,
       CASE WHEN c = 0 THEN 'missing'
            WHEN w = 7 AND c * w * 2 < t7 THEN 'anomalous_low'
            ELSE 'ok' END AS verdict
FROM trail7
WHERE c = 0 OR (w = 7 AND c * w * 2 < t7)
""",
    doc="Partition backfill planner — the data-ops audit that turns a "
    "gap into a work list: a complete day spine (date_dim_spine's "
    "distributed sequence idiom) left-joins the per-day partition row "
    "counts, and every day that is MISSING (zero rows — a failed "
    "load) or ANOMALOUSLY LOW (count under half the trailing-7-day "
    "mean, compared by integer cross-multiplication c*w*2 < sum7 — "
    "no float division) is emitted with its evidence. The trailing "
    "window is a bounded ROWS frame over the day-grained spine "
    "(thousands of rows at any corpus size — the series, not the "
    "data, is the window's domain), so the plan is spine-sized "
    "regardless of table size; the heavy side is one "
    "map-side-combinable count per partition, which is exactly the "
    "metadata a lakehouse manifest already holds.",
    tags=("quality", "monitoring", "datespine", "window"),
)
def partition_backfill_plan(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders").select(F.col("o_orderdate").cast("date").alias("day"))
    bounds = o.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    daily = o.groupBy("day").agg(F.count(F.lit(1)).alias("c"))
    grid = spine.join(daily, "day", "left").select(
        "day", F.coalesce(F.col("c"), F.lit(0).cast("bigint")).alias("c")
    )
    w7 = Window.orderBy("day").rowsBetween(-7, -1)
    trailing = grid.select(
        "day", "c",
        F.sum("c").over(w7).cast("bigint").alias("t7"),
        F.count(F.lit(1)).over(w7).cast("bigint").alias("w"),
    )
    verdict = (
        F.when(F.col("c") == 0, F.lit("missing"))
        .when(
            (F.col("w") == 7) & (F.col("c") * F.col("w") * 2 < F.col("t7")),
            F.lit("anomalous_low"),
        )
        .otherwise(F.lit("ok"))
    )
    return (
        trailing.withColumn("verdict", verdict)
        .filter(
            (F.col("c") == 0)
            | ((F.col("w") == 7) & (F.col("c") * F.col("w") * 2 < F.col("t7")))
        )
        .select("day", "c", "t7", "w", "verdict")
    )


#: Benford first-digit expectation, permille: round(1000*log10(1+1/d)).
_BENFORD = [301, 176, 125, 97, 79, 67, 58, 51, 46]


@register(
    "benford_digit_audit",
    oracle=f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS INT) AS digit
  FROM orders WHERE o_totalprice >= 1
), counted AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY 1
), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counted)
SELECT c.digit, c.n,
       CAST(c.n * 1000 // t.total AS BIGINT) AS observed_permille,
       CAST(({_BENFORD})[c.digit] AS BIGINT) AS benford_permille,
       CAST(abs(c.n * 1000 // t.total - ({_BENFORD})[c.digit]) AS BIGINT)
         AS abs_dev_permille
FROM counted c, tot t
""",
    doc="Benford's-law first-digit audit on order totals — the "
    "classic forensic screen for fabricated or double-counted "
    "financial data: naturally-occurring multiplicative amounts "
    "follow P(d) = log10(1+1/d), and a per-digit deviation table "
    "flags synthetic or tampered partitions (TPC-H's uniform price "
    "generator deliberately FAILS Benford — the audit shows exactly "
    "how, which is the point: the op reports, a policy layer "
    "decides). First digit extracted by explicit floor + string "
    "head (no logs, no floats); expectations are precomputed "
    "permille literals shared by both engines; deviations are "
    "truncating integer arithmetic. One map-side-combinable "
    "aggregate at any scale.",
    tags=("quality", "audit", "fraud", "agg"),
)
def benford_digit_audit(spark: SparkSession, sf_dir: str):
    digits = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
            )
            .cast("int")
            .alias("digit")
        )
    )
    counted = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = counted.agg(F.sum("n").cast("bigint").alias("total"))
    bt = F.array(*[F.lit(v).cast("bigint") for v in _BENFORD])
    return counted.crossJoin(F.broadcast(tot)).select(
        "digit", "n",
        F.expr("n * 1000 DIV total").cast("bigint").alias("observed_permille"),
        F.element_at(bt, F.col("digit")).alias("benford_permille"),
        F.abs(
            F.expr("n * 1000 DIV total") - F.element_at(bt, F.col("digit"))
        ).cast("bigint").alias("abs_dev_permille"),
    )


@register(
    "data_freshness_audit",
    oracle="""
WITH maxes AS (
  SELECT 'orders' AS tbl,
         CAST(MAX(o_orderdate) AS DATE) AS max_date FROM orders
  UNION ALL
  SELECT 'lineitem', CAST(MAX(l_shipdate) AS DATE) FROM lineitem
  UNION ALL
  SELECT 'events', CAST(MAX(ts) AS DATE) FROM events
), anchor AS (
  SELECT MAX(max_date) AS freshest FROM maxes
)
SELECT m.tbl, m.max_date,
       CAST(date_diff('day', m.max_date, a.freshest) AS BIGINT)
         AS lag_days_behind_freshest
FROM maxes m, anchor a
""",
    doc="Cross-table freshness audit: every time-bearing table's max "
    "business date, and each table's lag behind the freshest one — "
    "the first thing an on-call checks when a dashboard looks stale "
    "(did the FACT load but not the EVENTS feed?). Anchoring to the "
    "freshest table instead of wall-clock now() keeps the audit "
    "deterministic and environment-independent; per-table maxes are "
    "metadata-cheap scans (parquet footers answer MAX for sorted "
    "layouts). Three one-row aggregates unioned — the shape extends "
    "to a manifest-driven loop over hundreds of tables.",
    tags=("quality", "monitoring", "audit", "agg"),
)
def data_freshness_audit(spark: SparkSession, sf_dir: str):
    rows = [
        t(spark, sf_dir, "orders").agg(
            F.lit("orders").alias("tbl"),
            F.max(F.col("o_orderdate").cast("date")).alias("max_date"),
        ),
        t(spark, sf_dir, "lineitem").agg(
            F.lit("lineitem").alias("tbl"),
            F.max(F.col("l_shipdate").cast("date")).alias("max_date"),
        ),
        t(spark, sf_dir, "events").agg(
            F.lit("events").alias("tbl"),
            F.max(F.col("ts").cast("date")).alias("max_date"),
        ),
    ]
    maxes = rows[0].unionByName(rows[1]).unionByName(rows[2])
    anchor = maxes.agg(F.max("max_date").alias("freshest"))
    return maxes.crossJoin(F.broadcast(anchor)).select(
        "tbl", "max_date",
        F.datediff(F.col("freshest"), F.col("max_date")).cast("bigint")
        .alias("lag_days_behind_freshest"),
    )


@register(
    "privacy_l_diversity",
    oracle="""
WITH joined AS (
  SELECT c.c_nationkey AS nationkey, c.c_mktsegment AS mktsegment,
         o.o_orderpriority AS sensitive
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
),
cells AS (
  SELECT nationkey, mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT sensitive) AS BIGINT) AS l_distinct
  FROM joined GROUP BY 1, 2
)
SELECT nationkey, mktsegment, n, l_distinct,
       l_distinct < 3 AS violates_l3
FROM cells
""",
    doc="l-diversity audit (Machanavajjhala et al. 2007), the k-anonymity "
    "companion: a quasi-identifier class can satisfy k-anonymity yet "
    "still leak — if all k rows share the SAME sensitive value, knowing "
    "someone is in the class reveals their attribute (homogeneity "
    "attack). Here the QI is (nationkey, mktsegment) on the joined "
    "customer-orders release and the sensitive attribute is the order "
    "priority: every class must carry at least l=3 distinct sensitive "
    "values. Sits beside privacy_k_anonymity (class size) in the "
    "compliance family; together they gate a release the way "
    "text_scrub_pii gates a column. One join + one aggregate with an "
    "exact COUNT(DISTINCT) over a 5-value domain — Spark plans the "
    "distinct as a two-level Expand aggregate, map-side combinable, "
    "and the QI key is the shuffle key, so the audit runs unchanged "
    "on a 100 TB fact table.",
    tags=("quality", "privacy", "compliance", "agg"),
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str):
    joined = (
        t(spark, sf_dir, "customer")
        .join(
            t(spark, sf_dir, "orders"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("mktsegment"),
            F.col("o_orderpriority").alias("sensitive"),
        )
    )
    return (
        joined.groupBy("nationkey", "mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct("sensitive").cast("bigint").alias("l_distinct"),
        )
        .select(
            "nationkey", "mktsegment", "n", "l_distinct",
            (F.col("l_distinct") < 3).alias("violates_l3"),
        )
    )


#: Truncated discrete-Laplace (two-sided geometric) inverse-CDF
#: thresholds for epsilon = 1, support z in [-8, 8], renormalized after
#: truncation: a uniform 32-bit value u maps to z = (#thresholds <= u)
#: - 8. Precomputed ONCE in Python floats and shared VERBATIM by both
#: engines (the hll_portable_distinct linear-counting-table idiom), so
#: no libm exp() ever runs inside a query.
_DP_THRESHOLDS = [
    665939, 2476148, 7396809, 20772552, 57131592, 155965707, 424624687,
    1154915510, 3140051785, 3870342608, 4139001588, 4237835703,
    4274194743, 4287570486, 4292491147, 4294301356,
]
_DP_U32_SQL = (
    "CAST(("
    + " + ".join(
        f"(instr('0123456789abcdef', substr(__h, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    + ") AS BIGINT)"
)


@register(
    "privacy_dp_noisy_counts",
    oracle=f"""
WITH cells AS (
  SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2
),
hashed AS (
  SELECT nationkey, mktsegment, n,
         md5(CAST(nationkey AS VARCHAR) || '|' || mktsegment) AS __h
  FROM cells
),
noise AS (
  SELECT nationkey, mktsegment, n,
         ({" + ".join(f"(CASE WHEN {_DP_U32_SQL} >= {t} THEN 1 ELSE 0 END)" for t in _DP_THRESHOLDS)})
           - 8 AS z
  FROM hashed
)
SELECT nationkey, mktsegment, n, CAST(z AS BIGINT) AS z,
       CAST(greatest(n + z, 0) AS BIGINT) AS noisy_n,
       CAST(1000 AS BIGINT) AS epsilon_milli
FROM noise
""",
    doc="Differentially-private count release — the mechanism side of "
    "the privacy family (k-anonymity/l-diversity audit the release, "
    "DP perturbs it): per quasi-identifier cell, add discrete-Laplace "
    "noise calibrated to epsilon = 1 (sensitivity 1 for counting "
    "queries) and clamp at zero. The noise draw is an inverse-CDF "
    "walk over a 16-threshold integer table (truncated two-sided "
    "geometric, support ±8, precomputed once in Python and embedded "
    "verbatim in both engines — the hll_portable_distinct table "
    "idiom, so no libm exp() runs in-query), driven by a uniform "
    "32-bit md5 slice of the CELL KEY. The keyed-hash draw is a "
    "DETERMINISTIC STAND-IN for the gate (reproducible, retry-safe — "
    "the multimodal-stub convention): production DP swaps exactly "
    "this one expression for a SecureRandom draw per release and "
    "keeps everything else, including the epsilon accounting column "
    "downstream budget trackers consume. Scale shape: one map-side-"
    "combinable aggregate + a pure map — the release costs the same "
    "as the raw GROUP BY at any table size.",
    tags=("quality", "privacy", "compliance", "agg"),
)
def privacy_dp_noisy_counts(spark: SparkSession, sf_dir: str):
    cells = (
        t(spark, sf_dir, "customer")
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    h = F.md5(
        F.concat_ws("|", F.col("nationkey").cast("string"), F.col("mktsegment"))
    )
    u32 = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
    z = (
        sum(
            (
                F.when(u32 >= t, 1).otherwise(0)
                for t in _DP_THRESHOLDS
            ),
            start=F.lit(0),
        )
        - 8
    )
    return cells.select(
        "nationkey", "mktsegment", "n",
        z.cast("bigint").alias("z"),
        F.greatest(F.col("n") + z, F.lit(0)).cast("bigint").alias("noisy_n"),
        F.lit(1000).cast("bigint").alias("epsilon_milli"),
    )


@register(
    "privacy_t_closeness",
    oracle="""
WITH joined AS (
  SELECT c.c_nationkey AS nationkey, c.c_mktsegment AS mktsegment,
         o.o_orderpriority AS sensitive
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
),
cells AS (
  SELECT nationkey, mktsegment, sensitive,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM joined GROUP BY 1, 2, 3
),
gdist AS (
  SELECT sensitive, CAST(COUNT(*) AS BIGINT) AS gcnt FROM joined GROUP BY 1
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM joined),
sizes AS (
  SELECT nationkey, mktsegment, CAST(SUM(cnt) AS BIGINT) AS n
  FROM cells GROUP BY 1, 2
),
present AS (
  SELECT ce.nationkey, ce.mktsegment,
         SUM(abs(CAST(ce.cnt AS HUGEINT) * t.n_total
                 - CAST(g.gcnt AS HUGEINT) * s.n)) AS num_present,
         CAST(SUM(g.gcnt) AS BIGINT) AS gsum_present
  FROM cells ce
  JOIN gdist g ON g.sensitive = ce.sensitive
  JOIN sizes s ON s.nationkey = ce.nationkey AND s.mktsegment = ce.mktsegment
  CROSS JOIN tot t
  GROUP BY 1, 2
)
SELECT p.nationkey, p.mktsegment, s.n,
       CAST((p.num_present
             + CAST(t.n_total - p.gsum_present AS HUGEINT) * s.n) * 1000000
            // (2 * CAST(s.n AS HUGEINT) * t.n_total) AS BIGINT) AS tvd_ppm,
       CAST((p.num_present
             + CAST(t.n_total - p.gsum_present AS HUGEINT) * s.n) * 1000000
            // (2 * CAST(s.n AS HUGEINT) * t.n_total) AS BIGINT)
         > 60000 AS violates_t
FROM present p
JOIN sizes s ON s.nationkey = p.nationkey AND s.mktsegment = p.mktsegment
CROSS JOIN tot t
""",
    doc="t-closeness audit (Li et al. 2007) — the third leg of the "
    "privacy-release triad beside privacy_k_anonymity (class size) and "
    "privacy_l_diversity (distinct sensitive values): a class can be "
    "large AND diverse yet still leak if its sensitive-value "
    "DISTRIBUTION deviates from the global one (skewness attack — 95% "
    "'1-URGENT' in one zip code is a disclosure even with all 5 values "
    "present). Per quasi-identifier class (nationkey, mktsegment) over "
    "the joined customer-orders release, the distance between the "
    "class and global order-priority distributions is the exact total "
    "variation distance, computed entirely in integer cross-"
    "multiplication: TVD = sum_v |cnt_v*N - gcnt_v*n| / (2*n*N), with "
    "sensitive values ABSENT from a class contributing gcnt_v*n via "
    "the (N - sum present gcnt_v)*n closed form — no dense domain "
    "join, no floats until never (the result is truncated ppm of "
    "non-negative integers, so floor==trunc cross-engine). Scale "
    "shape: two map-side-combinable fact aggregates (QI x v cells, "
    "global v counts) + broadcast-joined bounded summaries; the "
    "products route through DECIMAL(38,0)/HUGEINT so row counts to "
    "~1e15 never overflow. Threshold t = 0.06 (60000 ppm) populates "
    "both verdict classes at gate scale.",
    tags=("quality", "privacy", "compliance", "agg"),
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str):
    joined = (
        t(spark, sf_dir, "customer")
        .join(
            t(spark, sf_dir, "orders"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("mktsegment"),
            F.col("o_orderpriority").alias("sensitive"),
        )
    )
    cells = joined.groupBy("nationkey", "mktsegment", "sensitive").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    glob = joined.groupBy("sensitive").agg(
        F.count(F.lit(1)).cast("bigint").alias("gcnt")
    )
    tot = joined.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    sizes = cells.groupBy("nationkey", "mktsegment").agg(
        F.sum("cnt").cast("bigint").alias("n")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    present = (
        cells.join(F.broadcast(glob), "sensitive")
        .join(F.broadcast(sizes), ["nationkey", "mktsegment"])
        .crossJoin(F.broadcast(tot))
        .groupBy("nationkey", "mktsegment")
        .agg(
            F.sum(
                F.abs(dec("cnt") * dec("n_total") - dec("gcnt") * dec("n"))
            ).alias("num_present"),
            F.sum("gcnt").cast("bigint").alias("gsum_present"),
        )
    )
    numer = (
        F.col("num_present")
        + (dec("n_total") - dec("gsum_present")) * dec("n")
    )
    tvd_ppm = F.expr(
        "CAST((num_present + (CAST(n_total AS DECIMAL(38,0)) - gsum_present)"
        " * n) * 1000000"
        " DIV (2 * CAST(n AS DECIMAL(38,0)) * n_total) AS BIGINT)"
    )
    _ = numer
    return (
        present.join(F.broadcast(sizes), ["nationkey", "mktsegment"])
        .crossJoin(F.broadcast(tot))
        .select(
            "nationkey", "mktsegment", "n",
            tvd_ppm.alias("tvd_ppm"),
            (tvd_ppm > F.lit(60000)).alias("violates_t"),
        )
    )


_DP_CLIP_CENTS = 100_000_000  # per-user contribution cap: $1M in cents


@register(
    "privacy_dp_clipped_mean",
    oracle=f"""
WITH per_user AS (
  SELECT c.c_mktsegment AS mktsegment,
         least(CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,6)) * 100
                             AS BIGINT)) AS BIGINT),
               {_DP_CLIP_CENTS}) AS clipped
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY o.o_custkey, c.c_mktsegment
), cells AS (
  SELECT mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(clipped) AS BIGINT) AS clipped_sum
  FROM per_user GROUP BY 1
), hs AS (
  SELECT *, md5(mktsegment || '|sum') AS __h FROM cells
), zs AS (
  SELECT mktsegment, n_users, clipped_sum,
         ({" + ".join(f"(CASE WHEN {_DP_U32_SQL} >= {t} THEN 1 ELSE 0 END)" for t in _DP_THRESHOLDS)})
           - 8 AS z_sum
  FROM hs
), hc AS (
  SELECT *, md5(mktsegment || '|cnt') AS __h FROM zs
), zc AS (
  SELECT mktsegment, n_users, clipped_sum, z_sum,
         ({" + ".join(f"(CASE WHEN {_DP_U32_SQL} >= {t} THEN 1 ELSE 0 END)" for t in _DP_THRESHOLDS)})
           - 8 AS z_cnt
  FROM hc
)
SELECT mktsegment, n_users, clipped_sum,
       CAST(z_sum AS BIGINT) AS z_sum, CAST(z_cnt AS BIGINT) AS z_cnt,
       CAST(greatest(clipped_sum + z_sum * {_DP_CLIP_CENTS}, 0) AS BIGINT)
         AS noisy_sum_cents,
       CAST(greatest(n_users + z_cnt, 1) AS BIGINT) AS noisy_n,
       CAST(greatest(clipped_sum + z_sum * {_DP_CLIP_CENTS}, 0) AS DOUBLE)
         / greatest(n_users + z_cnt, 1) AS dp_mean_cents,
       CAST(2000 AS BIGINT) AS epsilon_milli,
       CAST({_DP_CLIP_CENTS} AS BIGINT) AS clip_cents
FROM zc
""",
    doc="Differentially-private MEAN release with per-user contribution "
    "clipping — the second standard DP mechanism next to the noisy "
    "count (privacy_dp_noisy_counts): per customer, total spend is "
    "CLIPPED at C cents (bounding any one user's influence, the step "
    "that makes the sum's sensitivity C instead of unbounded), then "
    "per market segment the release is (sum + C*z1) / (count + z2) "
    "with two independent discrete-Laplace draws from the embedded "
    "epsilon=1 inverse-CDF threshold table — total budget epsilon = 2 "
    "(basic composition), recorded in the epsilon_milli accounting "
    "column. Noise draws are keyed-hash DETERMINISTIC STAND-INS for "
    "the gate, same convention and swap-point as the count release. "
    "Arithmetic: exact integers end to end; the mean leaves through "
    "ONE division. Shape: two map-side-combinable aggregates "
    "(user-level clip, then segment rollup) + a pure map — no scan "
    "beyond the raw GROUP BY at any size.",
    tags=("quality", "privacy", "compliance", "agg"),
)
def privacy_dp_clipped_mean(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    per_user = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_custkey", F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.least(
                F.sum(
                    (F.col("o_totalprice").cast("decimal(18,6)") * 100)
                    .cast("bigint")
                ).cast("bigint"),
                F.lit(_DP_CLIP_CENTS).cast("bigint"),
            ).alias("clipped")
        )
    )
    cells = per_user.groupBy("mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("clipped").cast("bigint").alias("clipped_sum"),
    )

    def draw(tag: str):
        h = F.md5(F.concat(F.col("mktsegment"), F.lit(f"|{tag}")))
        u32 = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
        return (
            sum(
                (F.when(u32 >= thr, 1).otherwise(0) for thr in _DP_THRESHOLDS),
                start=F.lit(0),
            )
            - 8
        ).cast("bigint")

    noisy = cells.withColumn("z_sum", draw("sum")).withColumn(
        "z_cnt", draw("cnt")
    )
    noisy_sum = F.greatest(
        F.col("clipped_sum") + F.col("z_sum") * F.lit(_DP_CLIP_CENTS),
        F.lit(0),
    ).cast("bigint")
    noisy_n = F.greatest(F.col("n_users") + F.col("z_cnt"), F.lit(1)).cast(
        "bigint"
    )
    return noisy.select(
        "mktsegment",
        "n_users",
        "clipped_sum",
        "z_sum",
        "z_cnt",
        noisy_sum.alias("noisy_sum_cents"),
        noisy_n.alias("noisy_n"),
        (noisy_sum.cast("double") / noisy_n).alias("dp_mean_cents"),
        F.lit(2000).cast("bigint").alias("epsilon_milli"),
        F.lit(_DP_CLIP_CENTS).cast("bigint").alias("clip_cents"),
    )


#: Randomized-response coin: portable 32-bit uniform hash of doc_id in
#: pure int64 arithmetic (same two-round Knuth mix as the bootstrap /
#: permutation ladders in stats_ops, distinct constants for an
#: independent stream). P(report truth) = 3/4 <=> coin u32 % 4 < 3.
_RR_U32 = (
    "((((doc_id % 2147483648) + 1 * 374761393)"
    " % 2147483648) * 3266489917) % 4294967296"
)


@register(
    "privacy_randomized_response",
    oracle=f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS truth,
         CASE WHEN ({_RR_U32}) % 4 < 3 THEN 1 ELSE 0 END AS keep
  FROM documents
), reported AS (
  SELECT truth,
         CASE WHEN keep = 1 THEN truth ELSE 1 - truth END AS resp
  FROM base
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(truth) AS BIGINT) AS n_true,
         CAST(SUM(resp) AS BIGINT) AS n_reported
  FROM reported
)
SELECT n, n_true, n_reported,
       CAST(4 * n_reported - n AS DOUBLE) / (2 * n) AS est_pi,
       CAST(n_true AS DOUBLE) / n AS true_pi
FROM agg
""",
    doc="Warner's randomized response (JASA 1965) — the local-DP "
    "mechanism that predates the term: each respondent reports its "
    "sensitive bit (document language = 'en') truthfully with "
    "probability p = 3/4, flipped otherwise (epsilon = ln 3 local "
    "DP), and the aggregate debiases via pi_hat = (p_hat - (1-p)) / "
    "(2p - 1) = (4R - n) / (2n). The coin is the house DETERMINISTIC "
    "hash ladder (two-round Knuth mix on doc_id, distinct constants "
    "from the bootstrap/permutation streams), so the mechanism is "
    "reproducible cross-engine and the oracle verifies BOTH the "
    "noisy channel and the debiasing identity; true_pi sits beside "
    "est_pi as the audit column a privacy layer tracks for estimator "
    "bias. Exact integer counts, two single divisions. Shape: one "
    "map-side classify + one global aggregate — no joins, no "
    "windows, at any corpus size.",
    tags=("privacy", "corpus", "agg"),
)
def privacy_randomized_response(spark: SparkSession, sf_dir: str):
    base = t(spark, sf_dir, "documents").select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("truth"),
        F.when(F.expr(f"({_RR_U32}) % 4 < 3"), 1).otherwise(0).alias("keep"),
    )
    reported = base.select(
        "truth",
        F.when(F.col("keep") == 1, F.col("truth"))
        .otherwise(1 - F.col("truth"))
        .alias("resp"),
    )
    agg = reported.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("truth").cast("bigint").alias("n_true"),
        F.sum("resp").cast("bigint").alias("n_reported"),
    )
    return agg.select(
        "n",
        "n_true",
        "n_reported",
        (
            (F.lit(4) * F.col("n_reported") - F.col("n")).cast("double")
            / (F.lit(2) * F.col("n"))
        ).alias("est_pi"),
        (F.col("n_true").cast("double") / F.col("n")).alias("true_pi"),
    )
