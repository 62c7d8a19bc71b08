"""Data-layout queries: the driver-gated proof for the Z-order
(Morton-curve) clustering key in ``operators.layout``.

The write-side layout operators (range-sorted files, compaction,
Z-order writes) are proven by plan/pruning pytest assertions
(tests/test_layout.py asserts that the scan actually skips files /
row-groups). This module gates the *key arithmetic itself*: the curve
is only useful if the interleave is exactly the documented integer
function, so the oracle re-derives the full normalize-and-interleave
pipeline in SQL (24 explicit shift/mask terms) and compares bucket
populations and per-bucket dimension envelopes.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .registry import register
from .util import t

_BITS = 12
_TOP = (1 << _BITS) - 1  # 4095


def _norm_sql(col: str, lo: str, hi: str) -> str:
    """Mirror operators.layout.zorder_value's normalization exactly:
    multiply-first while rng*top fits 63 bits, else divide-first."""
    d = f"(CAST({col} AS BIGINT) - CAST({lo} AS BIGINT))"
    rng = f"greatest(CAST({hi} AS BIGINT) - CAST({lo} AS BIGINT), CAST(1 AS BIGINT))"
    return (
        f"(CASE WHEN {rng} <= {(1 << 62) // _TOP} "
        f"THEN ({d} * CAST({_TOP} AS BIGINT)) // {rng} "
        f"ELSE {d} // (({rng} // {_TOP + 1}) + 1) END)"
    )


def _interleave_sql(norm_even: str, norm_odd: str) -> str:
    """Morton interleave, column 0 on even bits (matches zorder_value's
    ``b * k + i`` shift with k=2)."""
    terms = []
    for b in range(_BITS):
        terms.append(f"((({norm_even} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({norm_odd} >> {b}) & 1) << {2 * b + 1})")
    return " + ".join(terms)


_NP = _norm_sql("l_partkey", "lo_p", "hi_p")
_NS = _norm_sql("l_suppkey", "lo_s", "hi_s")


@register(
    "zorder_curve_locality",
    oracle=f"""
WITH bounds AS (
  SELECT MIN(l_partkey) AS lo_p, MAX(l_partkey) AS hi_p,
         MIN(l_suppkey) AS lo_s, MAX(l_suppkey) AS hi_s
  FROM lineitem
), z AS (
  SELECT l_partkey, l_suppkey,
         ({_interleave_sql("np", "ns")}) AS zval
  FROM (
    SELECT l_partkey, l_suppkey, {_NP} AS np, {_NS} AS ns
    FROM lineitem, bounds
  )
)
SELECT CAST(zval >> {2 * _BITS - 10} AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max,
       MIN(l_suppkey) AS sk_min, MAX(l_suppkey) AS sk_max
FROM z
GROUP BY 1
""",
    doc="Z-order key correctness + locality profile (operators.layout."
    "zorder_value): every lineitem row gets the 24-bit Morton key over "
    "(l_partkey, l_suppkey), rows are grouped by the key's top-10-bit "
    "curve bucket, and each bucket reports its population and its "
    "min/max envelope on BOTH dimensions — narrow envelopes on every "
    "dimension at once are exactly the property that makes Z-order "
    "file stats prunable on any clustered column. All arithmetic is "
    "explicit 64-bit integer (normalize = multiply-first div, "
    "interleave = 24 shift/mask terms), so the oracle replays it "
    "bit-for-bit in SQL. Shape at scale: one global min/max aggregate "
    "broadcast back, then a map-side key computation + one bucket "
    "aggregate — the same two-exchange shape the actual clustered "
    "write pays (plus its range sort).",
    tags=("layout", "zorder", "agg"),
)
def zorder_curve_locality(spark: SparkSession, sf_dir: str):
    from ..operators.layout import zorder_value

    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    out, zcol = zorder_value(li, ["l_partkey", "l_suppkey"], bits=_BITS)
    return (
        out.select("l_partkey", "l_suppkey", zcol)
        .groupBy(
            F.shiftright(F.col("__z"), 2 * _BITS - 10).cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("pk_min"),
            F.max("l_partkey").alias("pk_max"),
            F.min("l_suppkey").alias("sk_min"),
            F.max("l_suppkey").alias("sk_max"),
        )
    )


@register(
    "compaction_binpack_plan",
    oracle="""
WITH inv AS (
  SELECT CAST(EXTRACT(year FROM l_shipdate) * 100
              + EXTRACT(month FROM l_shipdate) AS BIGINT) AS file_key,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM lineitem GROUP BY 1
), planned AS (
  SELECT file_key, n_rows,
         CAST(COALESCE(SUM(n_rows) OVER (ORDER BY file_key
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              0) AS BIGINT) // 5000 AS bin
  FROM inv
)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(n_rows) AS BIGINT) AS bin_rows,
       MIN(file_key) AS file_lo, MAX(file_key) AS file_hi
FROM planned GROUP BY 1
""",
    doc="Order-preserving compaction planning (operators.layout."
    "compaction_plan): the file inventory (here one 'file' per lineitem "
    "ship-month, sized by row count — the shape a table-format manifest "
    "provides) is assigned to contiguous target-sized merge groups by "
    "first-fit on the running size total. Contiguity is the point: "
    "merged files still cover disjoint key ranges, so compaction "
    "composes with the range/Z-order layouts instead of undoing them. "
    "Scale shape: the running total is the two-phase distributed scan "
    "(operators.prefixsum) because at 100 TB the inventory itself is "
    "millions of manifest rows — no single-partition window anywhere. "
    "All-integer arithmetic (counts, truncating DIV) keeps the plan "
    "bit-deterministic; the oracle replays it with a window cumsum.",
    tags=("layout", "compaction", "prefixsum", "window"),
    bench=True,
)
def compaction_binpack_plan(spark: SparkSession, sf_dir: str):
    from ..operators.layout import compaction_plan

    li = t(spark, sf_dir, "lineitem").select("l_shipdate")
    inv = li.groupBy(
        (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
        .cast("bigint")
        .alias("file_key")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    planned = compaction_plan(inv, "file_key", "n_rows", target=5000)
    return planned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("n_rows").alias("bin_rows"),
        F.min("file_key").alias("file_lo"),
        F.max("file_key").alias("file_hi"),
    )
