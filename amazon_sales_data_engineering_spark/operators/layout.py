"""Data-layout operators: range-sorted parquet for stats-based file
skipping.

At 100 TB the cheapest scan is the one that never happens: a table
written with `repartitionByRange(range_cols) + sortWithinPartitions`
produces files whose per-file min/max on the range columns are narrow
and (up to range-boundary ties) pairwise disjoint. Any stats-aware
reader then prunes:

- parquet row-group stats: Spark's own scan skips row groups whose
  [min,max] misses the pushed predicate — no table format needed;
- file-level stats (Delta/Iceberg/Hudi collect the same min/max per
  file): entire files are dropped at planning time.

Without the layout pass, every file spans the full value range (writes
arrive in arrival order) and NO file can ever be skipped — the layout is
the difference between "scan 100 TB" and "scan the 2 files that overlap
the predicate". This is the Spark-native analogue of warehouse
clustering keys (SURVEY.md §4: the reference outsources clustering to
Snowflake; on Spark the layout is ours to write).

The sort is a one-time cost paid at write: one range-exchange (sampled
boundaries, so output files are also size-balanced against value skew)
plus a per-partition sort — exactly what a nightly compaction job does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_sorted_layout(
    df: DataFrame,
    path: str,
    range_cols: list[str],
    sort_cols: list[str] | None = None,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet range-partitioned and sorted on
    ``range_cols`` (plus optional secondary ``sort_cols`` within files).

    ``num_files`` bounds the file count (defaults to the cluster's
    parallelism); range boundaries are sampled, so files come out
    size-balanced even under value skew.
    """
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    out = df.repartitionByRange(n, *range_cols).sortWithinPartitions(
        *(list(range_cols) + list(sort_cols or []))
    )
    out.write.mode(mode).parquet(path)


def parquet_file_stats(path: str, column: str) -> list[tuple[str, object, object]]:
    """Per-file (file, min, max) for ``column`` from parquet footers —
    the same statistics a file-skipping planner consults. Reads metadata
    only, no data pages."""
    import pyarrow.dataset as ds

    stats: list[tuple[str, object, object]] = []
    for frag in ds.dataset(path, format="parquet").get_fragments():
        md = frag.metadata
        idx = md.schema.names.index(column)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                continue
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            stats.append((frag.path, min(mins), max(maxs)))
    return stats


def files_overlapping(
    stats: list[tuple[str, object, object]], lo: object, hi: object
) -> list[str]:
    """Files whose [min,max] intersects [lo,hi] — what a stats-aware
    planner would actually read for a between-predicate."""
    return [f for f, mn, mx in stats if not (mx < lo or mn > hi)]


def compact_small_files(
    spark,
    src_path: str,
    dst_path: str,
    target_rows_per_file: int,
    sort_cols: list[str] | None = None,
) -> int:
    """Compact a directory of many small parquet files into few
    right-sized ones — the small-files maintenance pass every long-lived
    table needs (streaming sinks and per-batch appends produce files far
    below the efficient scan size; metadata and task-scheduling overhead
    then dominate reads at scale).

    Row-count based sizing keeps the op deterministic without sampling
    byte sizes: n_files = ceil(total_rows / target_rows_per_file).
    With ``sort_cols`` the rewrite also applies the range-sorted
    clustering layout (see write_sorted_layout), folding compaction and
    re-clustering into one pass — what a nightly OPTIMIZE job does.
    Returns the output file count."""
    import math

    df = spark.read.parquet(src_path)
    total = df.count()
    n_files = max(1, math.ceil(total / target_rows_per_file))
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst_path)
    return n_files


def zorder_value(df: DataFrame, cols: list[str], bits: int = 12):
    """Z-order (Morton) key over integral ``cols``: each column is
    linearly normalized to ``bits`` bits against its global min/max, then
    the bit strings are interleaved — locality on the curve preserves
    locality on EVERY input dimension at once.

    Returns ``(df_with_bounds, zcol)`` where ``zcol`` is the key
    expression; all arithmetic is explicit 64-bit integer (shift/mask/
    sum), inside whole-stage codegen — inputs are cast to BIGINT before
    the scaling multiply, so IntegerType columns cannot wrap in 32-bit.
    Wide-range columns (hi - lo > 2^62/top) switch to an equivalent
    divide-first normalization that cannot overflow the multiply; the
    only precondition is that each column's span hi - lo itself fits in
    int64. Linear scaling assumes roughly uniform domains; for heavily
    skewed columns substitute a rank/ntile normalization before calling
    (the interleave is agnostic to how the ``bits``-wide values were
    produced). k*bits must fit in 63 bits.
    """
    from pyspark.sql import functions as F

    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a 64-bit key")
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    bounds = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(bounds))
    top = (1 << bits) - 1
    z = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        d = f"(cast({c} as bigint) - cast(__lo_{c} as bigint))"
        rng = (
            f"greatest(cast(__hi_{c} as bigint) - cast(__lo_{c} as bigint),"
            " cast(1 as bigint))"
        )
        # multiply-first keeps full bits-precision while rng*top fits in
        # 63 bits; beyond that, divide-first with bucket width
        # floor(rng/(top+1))+1 > rng/(top+1) guarantees norm <= top.
        norm = F.expr(
            f"CASE WHEN {rng} <= {(1 << 62) // top} "
            f"THEN ({d} * cast({top} as bigint)) div {rng} "
            f"ELSE {d} div (({rng} div {top + 1}) + 1) END"
        ).cast("bigint")
        for b in range(bits):
            bit = F.shiftright(norm, b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * k + i)
    return out, z.alias("__z")


def write_zorder_layout(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int = 12,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of
    ``zorder_cols`` — the multi-dimensional generalization of
    ``write_sorted_layout``: per-file min/max stay narrow on EVERY
    clustered column, so stats-based pruning works for predicates on any
    of them (a single-column sort prunes only its leading column; every
    file spans the full range of the others).

    Same one-time write cost as the range layout: one sampled
    range-exchange on the z-key + per-partition sort. This is the
    Spark-native analogue of Delta/Iceberg OPTIMIZE ZORDER BY.
    """
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    with_bounds, z = zorder_value(df, zorder_cols, bits=bits)
    out = (
        with_bounds.withColumn("__z", z)
        .repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__lo_{c}" for c in zorder_cols],
              *[f"__hi_{c}" for c in zorder_cols])
    )
    out.write.mode(mode).parquet(path)


def compaction_plan(
    inventory: DataFrame,
    order_col: str,
    size_col: str,
    target: int,
    tiebreak: list[str] | None = None,
    out_col: str = "bin",
) -> DataFrame:
    """Assign every file in ``inventory`` to a compaction group such
    that (a) groups are CONTIGUOUS in ``order_col`` — compaction never
    destroys an existing clustering order, merged files still cover
    disjoint key ranges — and (b) each group's total ``size_col`` is
    ~``target`` (first-fit on the running total: a file starting at
    cumulative offset s joins group ``s DIV target``).

    This is the *planning* half of compaction (``compact_small_files``
    is the rewrite half): at 100 TB the inventory itself is millions of
    rows (one per file from the table-format manifest), so the running
    total uses operators.prefixsum.distributed_cumsum — two bounded
    shuffles, no single-partition global window. All arithmetic is
    integer (sizes are counts/bytes; the cumsum's decimal is
    integer-valued), so the plan is deterministic and engine-portable.
    """
    from pyspark.sql import functions as F

    from .prefixsum import distributed_cumsum

    if int(target) <= 0:
        raise ValueError(
            f"compaction_plan target must be a positive byte/row count; got {target}"
        )
    inv = distributed_cumsum(
        inventory,
        order_col=order_col,
        value_col=size_col,
        tiebreak=list(tiebreak or []),
        out_col="__cum",
    )
    start = (F.col("__cum") - F.col(size_col)).cast("bigint")
    return (
        inv.withColumn("__start", start)
        .withColumn(out_col, F.expr(f"__start DIV {int(target)}"))
        .drop("__cum", "__start")
    )
