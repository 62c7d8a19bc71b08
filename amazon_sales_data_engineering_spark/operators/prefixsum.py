"""Distributed prefix sums — global cumulative aggregates without the
global-window cliff.

A cumulative sum over a TOTAL order (`SUM(x) OVER (ORDER BY k)`) plans as
ONE unpartitioned window: every row flows through a single task — the
same scalability cliff `sequences.dense_keys` documents. The scalable
shape is the classic two-phase scan:

1. bucket rows by DETERMINISTIC value fences over the order key
   (broadcast back — not ``spark_partition_id``, which is
   plan/scheduling-dependent and would break retry determinism);
2. run the cumulative window INSIDE each bucket (parallel, bounded);
3. add each bucket's offset = sum of all earlier buckets' totals (a
   groups-sized aggregate joined back by broadcast).

Totals are EXACT decimal sums, so bucket offsets are associative and the
result is bit-identical to the single-window answer regardless of how
many buckets the fences produce — fence PLACEMENT only affects balance,
never values. That freedom is what makes the fence pass cheap (r11):

- Fences come from a deterministic HASH-SAMPLE of the input
  (``xxhash64(order_col) % FENCE_SAMPLE_MOD == 0``): the sample is a
  pure function of the VALUES, so retries/scheduling reproduce it
  exactly, and the percentile_disc fence aggregate — an ObjectAggregate
  that buffers every input row per fence expression, measured at 99s
  over a 583k-row histogram (spearman's y domain) when run over the
  FULL input — now buffers ~1/64 of the rows. A sparse/empty sample
  just yields fewer distinct fences → fewer, fatter buckets: small
  inputs degrade toward one bucket, which is exactly where parallelism
  doesn't matter.
- Bucket assignment is a statically UNROLLED chain of array-index
  comparisons (whole-stage codegen) instead of the interpreted
  higher-order ``size(filter(...))`` lambda per row (HOFs are not
  codegen'd — the BH/equidepth lesson of this round).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: 1-in-N deterministic value-hash sampling rate for the fence pass.
FENCE_SAMPLE_MOD = 64


def _fence_sample(df: DataFrame, order_col: str) -> DataFrame:
    """Deterministic ~1/FENCE_SAMPLE_MOD subset of rows, keyed on the
    ORDER VALUE's hash only (never partition ids or rand())."""
    return df.where(
        F.pmod(F.xxhash64(F.col(order_col)), F.lit(FENCE_SAMPLE_MOD)) == 0
    )


def _bucket_count_expr(
    n_fences: int, order_col: str, descending: bool
) -> Column:
    """Codegen bucket id: the count of fences strictly below the value
    (ascending) / at-or-above it (descending), unrolled over the
    broadcast ``__fences`` array. NULL fences (empty sample) compare
    NULL → contribute 0 → every row lands in bucket 0, the degenerate
    single-bucket shape. Equal keys always compare identically, so ties
    never split across buckets."""
    terms = []
    for i in range(n_fences):
        el = F.col("__fences")[i]
        cond = (el >= F.col(order_col)) if descending else (
            el < F.col(order_col)
        )
        terms.append(F.when(cond, 1).otherwise(0))
    out = terms[0]
    for term in terms[1:]:
        out = out + term
    return out.cast("int")


def distributed_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    tiebreak: list[str],
    n_buckets: int = 16,
    descending: bool = False,
    out_col: str = "cum",
) -> DataFrame:
    """Append ``out_col``: exact-decimal cumulative sum of ``value_col``
    over the global (order_col, *tiebreak) order, computed with the
    two-phase bucket scan (no single-partition window). ``descending``
    orders high-to-low (the Pareto direction).

    The input is referenced by THREE subtrees of the one result plan —
    the fence percentiles, the per-bucket local window, and the bucket
    totals — so an uncached upstream (typically a scan + aggregate,
    e.g. compaction_binpack_plan's 600k-row file inventory build)
    would execute three times inside the same job (the round-4
    double-reference trap, triple form). The input is persisted here
    (r11, guide §1.2): the inventory is manifest-sized (narrow key +
    size columns) by this module's own scale contract, so the cache is
    node-safe and the upstream builds exactly once."""
    df = df.persist()
    q = [p / n_buckets for p in range(1, n_buckets)]
    dirn = "DESC" if descending else "ASC"
    if not q:
        # n_buckets <= 1: no fences to compute — an agg with ZERO
        # aggregate children (array() of nothing) produces a plan
        # Catalyst miscompiles (ATTRIBUTE_NOT_FOUND at execution).
        # Degenerate single bucket = the plain single-window scan.
        with_b = df.withColumn("__fences", F.lit(None))
        bucket = F.lit(0).cast("int")
    else:
        fences = _fence_sample(df, order_col).agg(
            F.array(
                *[
                    F.expr(
                        f"percentile_disc({p}) WITHIN GROUP "
                        f"(ORDER BY {order_col})"
                    )
                    for p in q
                ]
            ).alias("__fences")
        )
        with_b = df.crossJoin(F.broadcast(fences))
        # bucket 0 = highest values when descending: the count of
        # (ascending) fences >= v is 0 for the largest v and len(q)
        # for the smallest.
        bucket = _bucket_count_expr(len(q), order_col, descending)
    dec = F.col(value_col).cast("decimal(28,6)")
    w_local = (
        Window.partitionBy("__bucket")
        .orderBy(
            F.col(order_col).desc() if descending else F.col(order_col),
            *tiebreak,
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bucketed = with_b.withColumn("__bucket", bucket).drop("__fences")
    local = bucketed.withColumn("__local_cum", F.sum(dec).over(w_local))
    totals = (
        bucketed.groupBy("__bucket")
        .agg(F.sum(dec).alias("__btot"))
    )
    w_off = (
        Window.orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # The offsets window IS global — over n_buckets rows, not the data.
    offsets = totals.select(
        "__bucket",
        F.coalesce(F.sum("__btot").over(w_off), F.lit(0).cast("decimal(28,6)"))
        .alias("__offset"),
    )
    _ = dirn
    return (
        local.join(F.broadcast(offsets), "__bucket")
        .withColumn(out_col, F.col("__local_cum") + F.col("__offset"))
        .drop("__bucket", "__local_cum", "__offset")
    )


def distributed_cummax(
    df: DataFrame,
    order_col: str,
    value_col: str,
    tiebreak: list[str],
    n_buckets: int = 16,
    out_col: str = "cummax",
    inclusive: bool = True,
) -> DataFrame:
    """Append ``out_col``: running MAX of ``value_col`` over the global
    ascending (order_col, *tiebreak) order, via the same two-phase bucket
    scan as :func:`distributed_cumsum` (max is associative, so the
    bucket-offset composition is exact for any fence placement).

    ``inclusive=False`` gives the STRICT prefix (rows strictly earlier in
    the total order) — the skyline/dominance primitive. The first row of
    the global order gets NULL (empty prefix); callers needing
    "strictly smaller order_col" semantics must pass unique order keys
    (pre-aggregate first), since equal keys are prefix-visible to each
    other through the tiebreak order.

    Input persisted for the same triple-reference reason as
    :func:`distributed_cumsum` (r11).
    """
    df = df.persist()
    q = [p / n_buckets for p in range(1, n_buckets)]
    if not q:
        # Same zero-children-agg trap as distributed_cumsum: degenerate
        # to one bucket without the fence crossJoin.
        with_b = df.withColumn("__fences", F.lit(None))
        bucket = F.lit(0).cast("int")
    else:
        fences = _fence_sample(df, order_col).agg(
            F.array(
                *[
                    F.expr(
                        f"percentile_disc({p}) WITHIN GROUP "
                        f"(ORDER BY {order_col})"
                    )
                    for p in q
                ]
            ).alias("__fences")
        )
        with_b = df.crossJoin(F.broadcast(fences))
        bucket = _bucket_count_expr(len(q), order_col, descending=False)
    w_local = (
        Window.partitionBy("__bucket")
        .orderBy(F.col(order_col), *tiebreak)
        .rowsBetween(
            Window.unboundedPreceding,
            Window.currentRow if inclusive else -1,
        )
    )
    bucketed = with_b.withColumn("__bucket", bucket).drop("__fences")
    local = bucketed.withColumn(
        "__local_max", F.max(F.col(value_col)).over(w_local)
    )
    totals = bucketed.groupBy("__bucket").agg(
        F.max(F.col(value_col)).alias("__btot")
    )
    # Offset = max over STRICTLY earlier buckets (n_buckets rows — the
    # global window here is over the bucket table, not the data), so the
    # exclusive local frame composes to the exclusive global prefix.
    w_off = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__bucket", F.max("__btot").over(w_off).alias("__offset")
    )
    # greatest() skips NULLs unless all args are NULL — exactly the
    # empty-prefix semantics both halves need.
    return (
        local.join(F.broadcast(offsets), "__bucket")
        .withColumn(out_col, F.greatest(F.col("__local_max"), F.col("__offset")))
        .drop("__bucket", "__local_max", "__offset")
    )


def distributed_lead(
    df: DataFrame,
    order_col: str,
    n_buckets: int = 16,
    out_col: str = "lead",
) -> DataFrame:
    """Append ``out_col``: the NEXT value of ``order_col`` in the global
    ascending order (NULL for the global maximum), without a
    single-partition window — the neighbor primitive the exact
    1-Wasserstein integral needs (ECDF step widths over the pooled value
    domain, which for a near-continuous measure grows with the data).

    Same two-phase shape as :func:`distributed_cumsum`: percentile-disc
    fences bucket the rows deterministically, ``lead()`` runs INSIDE each
    bucket (parallel, bounded), and the last row of each bucket takes the
    minimum of all LATER buckets' minima (an exclusive reversed running
    min over the groups-sized bucket table, broadcast back). Requires
    DISTINCT ``order_col`` values (pre-aggregate first): with duplicates,
    "next value" is ill-defined across a bucket fence because equal keys
    never split buckets but do share local-lead visibility.

    Input persisted for the same triple-reference reason as
    :func:`distributed_cumsum` (r11).
    """
    df = df.persist()
    q = [p / n_buckets for p in range(1, n_buckets)]
    if not q:
        with_b = df.withColumn("__fences", F.lit(None))
        bucket = F.lit(0).cast("int")
    else:
        fences = _fence_sample(df, order_col).agg(
            F.array(
                *[
                    F.expr(
                        f"percentile_disc({p}) WITHIN GROUP "
                        f"(ORDER BY {order_col})"
                    )
                    for p in q
                ]
            ).alias("__fences")
        )
        with_b = df.crossJoin(F.broadcast(fences))
        bucket = _bucket_count_expr(len(q), order_col, descending=False)
    bucketed = with_b.withColumn("__bucket", bucket).drop("__fences")
    w_local = Window.partitionBy("__bucket").orderBy(F.col(order_col))
    local = bucketed.withColumn(
        "__local_lead", F.lead(F.col(order_col)).over(w_local)
    )
    mins = bucketed.groupBy("__bucket").agg(
        F.min(F.col(order_col)).alias("__bmin")
    )
    # Fill for bucket b = min over buckets STRICTLY later than b: an
    # exclusive running min over the bucket table in DESCENDING bucket
    # order (n_buckets rows — the global window is over the bucket
    # table, not the data). The last bucket's fill is NULL (empty
    # suffix), which is exactly the global-maximum semantics.
    w_fill = Window.orderBy(F.col("__bucket").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    fills = mins.select(
        "__bucket", F.min("__bmin").over(w_fill).alias("__fill")
    )
    return (
        local.join(F.broadcast(fills), "__bucket")
        .withColumn(out_col, F.coalesce(F.col("__local_lead"), F.col("__fill")))
        .drop("__bucket", "__local_lead", "__fill")
    )
