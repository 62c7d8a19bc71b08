"""Exact discrete percentiles without the value-buffering aggregate.

Spark's ``percentile_disc`` is an ObjectAggregate: every expression
buffers EVERY input value into the (single, per-group) final task and
sorts there — k fences over an n-row input cost k·n buffer inserts plus
a k·(n log n) driver-of-one-task sort. For fact-sized inputs that is the
measured wall (histogram_equidepth_price: 19s of its 19.3s sf0.1 run was
the 9-fence buffering pass), and at 100 TB it is a straight OOM.

The scalable identity (SQL standard, verified bit-equal to Spark's
``percentile_disc`` over adversarial tie/edge cases in
tests/test_percentiles_exact.py): with n input rows,

    percentile_disc(p) = MIN v such that cum_count(v) >= ceil(p * n)

where cum_count is the cumulative count over the VALUE HISTOGRAM
(groupBy(value).count() — map-side combinable, shuffles one row per
distinct value) and ceil(p * n) uses the same IEEE double product Spark
evaluates internally (p is the same double literal; both sides compute
``ceil`` of the identical product, so fence selection is bit-identical
even when p*n grazes an integer).

Shapes:
- ``collect_disc_percentiles``: ungrouped fences for literal embedding —
  histogram → distributed prefix-scan (operators.prefixsum, no global
  single-partition window) → one conditional-min aggregate. The collect
  is of len(ps) scalars, bounded by construction.
- ``grouped_disc_percentile``: per-group fence as a DataFrame — the
  cumulative count runs inside each group's histogram partition (a
  running O(n) frame, frame-guard-safe). Selection joins the broadcast
  group totals. Parallelism equals the group count, same as the
  aggregate it replaces, but streaming sort instead of object buffering.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def collect_disc_percentiles(
    df: DataFrame, value_col: str, ps: list[float]
) -> list:
    """Exact ``percentile_disc(p) WITHIN GROUP (ORDER BY value_col)``
    for every p in ``ps``, computed via the value histogram and
    returned as driver literals (len(ps) scalars — bounded; runs inside
    the caller's timed region, never cached across runs)."""
    from .prefixsum import distributed_cumsum

    n = df.where(F.col(value_col).isNotNull()).count()
    if n == 0:
        return [None] * len(ps)
    h = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    hc = distributed_cumsum(h, value_col, "__c", tiebreak=[], out_col="__cum")
    # ceil(p * n) in Python IEEE doubles == Spark's ceil(p * n): same
    # double literal, same product, same ceil (property-tested).
    ks = [max(int(math.ceil(p * n)), 1) for p in ps]
    row = hc.agg(
        *[
            F.min(
                F.when(F.col("__cum") >= F.lit(k), F.col(value_col))
            ).alias(f"__f{i}")
            for i, k in enumerate(ks)
        ]
    ).collect()[0]
    return [row[f"__f{i}"] for i in range(len(ps))]


def grouped_disc_percentile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p: float,
    out_col: str,
    n_col: str | None = None,
) -> DataFrame:
    """Per-group exact ``percentile_disc(p)`` as (group_col, out_col).

    Histogram per (group, value) → running count over each group's
    value-ordered histogram → first histogram row whose cumulative
    count reaches ceil(p * n_group). Identical element selection to the
    grouped percentile_disc aggregate (same rule as
    ``collect_disc_percentiles``), with the value buffering replaced by
    a streaming sort window over the (smaller) histogram."""
    nn = F.col(value_col).isNotNull()
    # The histogram is referenced by BOTH the running-count window and
    # the group totals; persist it so the upstream (for theilsen, a
    # quadratic pair join) builds exactly once, and derive the group
    # totals from the histogram instead of re-scanning the input
    # (identical counts: both exclude NULL values).
    h = (
        df.where(nn)
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
        .persist()
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hc = h.select(
        group_col,
        value_col,
        F.sum("__c").over(w).cast("bigint").alias("__cum"),
    )
    ng = h.groupBy(group_col).agg(
        F.sum("__c").cast("bigint").alias("__n")
    )
    # ceil with the same IEEE double product Spark's aggregate uses.
    k = F.greatest(
        F.ceil(F.lit(float(p)) * F.col("__n")).cast("bigint"), F.lit(1)
    )
    sel = (
        hc.join(F.broadcast(ng), group_col)
        .where(F.col("__cum") >= k)
        .groupBy(group_col)
        .agg(F.min(value_col).alias(out_col))
    )
    if n_col is None:
        return sel
    # Per-group non-NULL count from the SAME histogram (no extra scan
    # of the — possibly expensive — input).
    return sel.join(
        F.broadcast(ng.select(group_col, F.col("__n").alias(n_col))),
        group_col,
    )


def grouped_disc_percentile_bucketed(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p: float,
    out_col: str,
    n_col: str | None = None,
    n_buckets: int = 32,
    sample_mod: int = 256,
) -> DataFrame:
    """Per-group exact ``percentile_disc(p)`` for DISTINCT-HEAVY value
    domains (theilsen's pairwise slopes: 14.45M distinct of 14.45M),
    where :func:`grouped_disc_percentile`'s histogram compresses
    nothing and its per-group window sort IS the full sort.

    Classic two-pass distributed selection instead:

    1. persist the (possibly expensive — a quadratic pair join) input
       once; fences per group from a deterministic value-hash sample
       (same recipe as operators.prefixsum r11 — retry-safe, and fence
       placement affects only balance, never the selected element);
    2. count rows per (group, bucket); a groups×buckets-sized running
       window finds, per group, the ONE bucket containing the
       ceil(p·n)-th value and the residual rank inside it;
    3. sort ONLY that bucket (~1/n_buckets of the group) and take the
       residual-rank row. Equal values are interchangeable under the
       value-only sort, so the selected VALUE is deterministic.

    Selection rule (k = max(ceil(p*n), 1), 1-based k-th smallest) is
    identical to :func:`collect_disc_percentiles` / Spark's
    ``percentile_disc`` — pinned in tests/test_percentiles_exact.py.
    """
    src = df.where(F.col(value_col).isNotNull()).persist()
    qs = [i / n_buckets for i in range(1, n_buckets)]
    sample = src.where(
        F.pmod(F.xxhash64(F.col(value_col)), F.lit(sample_mod)) == 0
    )
    # The fences table is joined by BOTH downstream passes (bucket
    # counts and the target-bucket selection); without a persist the
    # whole sample subtree — a full cache scan plus the
    # value-buffering percentile aggregate — executes once per
    # consumer (measured in theilsen's SQL graph: the 56k-row sample
    # filter and its ObjectHashAggregate appeared twice). The table is
    # at most one row per group, so the cache is a handful of rows.
    fences = sample.groupBy(group_col).agg(
        F.array(
            *[
                F.expr(
                    f"percentile_disc({q}) WITHIN GROUP "
                    f"(ORDER BY {value_col})"
                )
                for q in qs
            ]
        ).alias("__fences")
    ).persist()
    # Left join: a group too small to sample gets NULL fences → every
    # comparison NULL → bucket 0 → pass 3 sorts the whole (small) group.
    terms = [
        F.when(F.col("__fences")[i] < F.col(value_col), 1).otherwise(0)
        for i in range(len(qs))
    ]
    bucket = terms[0]
    for term in terms[1:]:
        bucket = bucket + term
    bucketed = src.join(F.broadcast(fences), group_col, "left").select(
        group_col, value_col, bucket.cast("int").alias("__b")
    )
    counts = bucketed.groupBy(group_col, "__b").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    w_run = (
        Window.partitionBy(group_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(group_col)
    cum = counts.select(
        group_col,
        "__b",
        "__c",
        F.sum("__c").over(w_run).cast("bigint").alias("__cum"),
        F.sum("__c").over(w_tot).cast("bigint").alias("__n"),
    )
    k = F.greatest(
        F.ceil(F.lit(float(p)) * F.col("__n")).cast("bigint"), F.lit(1)
    )
    target = (
        cum.withColumn("__k", k)
        .where(
            (F.col("__cum") >= F.col("__k"))
            & (F.col("__cum") - F.col("__c") < F.col("__k"))
        )
        .select(
            group_col,
            "__b",
            (F.col("__k") - (F.col("__cum") - F.col("__c"))).alias("__kk"),
            "__n",
        )
    )
    w_rn = Window.partitionBy(group_col).orderBy(value_col)
    picked = (
        bucketed.join(F.broadcast(target), [group_col, "__b"])
        .withColumn("__rn", F.row_number().over(w_rn))
        .where(F.col("__rn") == F.col("__kk"))
    )
    cols = [group_col, F.col(value_col).alias(out_col)]
    if n_col is not None:
        cols.append(F.col("__n").alias(n_col))
    return picked.select(*cols)
