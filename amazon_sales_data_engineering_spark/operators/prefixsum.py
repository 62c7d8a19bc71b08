"""Distributed prefix sums — global cumulative aggregates without the
global-window cliff.

A cumulative sum over a TOTAL order (`SUM(x) OVER (ORDER BY k)`) plans as
ONE unpartitioned window: every row flows through a single task — the
same scalability cliff `sequences.dense_keys` documents. The scalable
shape is the classic two-phase scan:

1. bucket rows by DETERMINISTIC value fences over the order key (exact
   PERCENTILE_DISC members broadcast back — not ``spark_partition_id``,
   which is plan/scheduling-dependent and would break retry determinism);
2. run the cumulative window INSIDE each bucket (parallel, bounded);
3. add each bucket's offset = sum of all earlier buckets' totals (a
   groups-sized aggregate joined back by broadcast).

Totals are EXACT decimal sums, so bucket offsets are associative and the
result is bit-identical to the single-window answer regardless of how
many buckets the fences produce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


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
        fences = df.agg(
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
        cmp: Column
        with_b = df.crossJoin(F.broadcast(fences))
        if descending:
            # bucket 0 = highest values: the count of (ascending) fences
            # >= v is 0 for the largest v and len(q) for the smallest.
            # Ties with a fence value compare identically for every
            # duplicate, so equal keys never split across buckets.
            cmp = F.size(
                F.filter(F.col("__fences"), lambda x: x >= F.col(order_col))
            )
            bucket = cmp.cast("int")
        else:
            bucket = F.size(
                F.filter(F.col("__fences"), lambda x: x < F.col(order_col))
            ).cast("int")
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
        fences = df.agg(
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
        bucket = F.size(
            F.filter(F.col("__fences"), lambda x: x < F.col(order_col))
        ).cast("int")
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
        fences = df.agg(
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
        bucket = F.size(
            F.filter(F.col("__fences"), lambda x: x < F.col(order_col))
        ).cast("int")
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
