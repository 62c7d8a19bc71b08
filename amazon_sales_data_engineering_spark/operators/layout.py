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
