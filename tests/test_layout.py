"""Sorted-layout writer: prove the file-skipping property from parquet
footer statistics — the honest, reader-independent way to verify a
clustering layout (any stats-aware planner consults exactly these
min/max values).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_sales_data_engineering_spark.operators.layout import (
    files_overlapping,
    parquet_file_stats,
    write_sorted_layout,
)
from amazon_sales_data_engineering_spark.tables import table

from .conftest import SF_DIR_MID


def test_sorted_layout_skips_files(spark, tmp_path):
    li = table(spark, SF_DIR_MID, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_quantity", "l_extendedprice"
    )
    sorted_path = str(tmp_path / "sorted")
    plain_path = str(tmp_path / "plain")

    write_sorted_layout(li, sorted_path, ["l_shipdate"], num_files=8)
    li.repartition(8).write.mode("overwrite").parquet(plain_path)

    s_stats = parquet_file_stats(sorted_path, "l_shipdate")
    p_stats = parquet_file_stats(plain_path, "l_shipdate")
    assert len(s_stats) == 8 and len(p_stats) == 8

    # Sorted files tile the value range: ranges are pairwise disjoint up
    # to boundary ties (a boundary value may close one file and open the
    # next), so sorting by min also sorts by max and consecutive overlap
    # is at most the shared boundary value.
    s_sorted = sorted(s_stats, key=lambda t: (t[1], t[2]))
    for (_, _, prev_max), (_, nxt_min, _) in zip(s_sorted, s_sorted[1:]):
        assert prev_max <= nxt_min

    # A one-month predicate on a ~7-year corpus: the sorted layout reads
    # ≤2 files; the arrival-order layout cannot skip anything.
    lo, hi = s_sorted[2][1], s_sorted[2][2]  # exactly one file's range
    assert len(files_overlapping(s_stats, lo, hi)) <= 3
    assert len(files_overlapping(p_stats, lo, hi)) == 8

    # Layout changed, data didn't: full read-back matches.
    back = spark.read.parquet(sorted_path)
    assert back.count() == li.count()
    orig_sum = li.agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
    ).collect()[0][0]
    back_sum = back.agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
    ).collect()[0][0]
    assert orig_sum == back_sum


def test_sorted_layout_rowgroup_pruning_in_scan(spark, tmp_path):
    """Spark's own parquet reader prunes row groups from the same stats:
    a tight filter on the sorted layout must not degrade to a full scan.
    Verified via the scan's reported number of output rows after
    row-group pruning + predicate evaluation."""
    li = table(spark, SF_DIR_MID, "lineitem").select("l_orderkey", "l_shipdate")
    path = str(tmp_path / "sorted2")
    write_sorted_layout(li, path, ["l_shipdate"], num_files=8)

    stats = sorted(parquet_file_stats(path, "l_shipdate"), key=lambda t: t[1])
    lo, hi = stats[0][1], stats[0][2]
    df = spark.read.parquet(path).filter(F.col("l_shipdate").between(lo, hi))
    n_sel = df.count()
    n_all = li.count()
    # The predicate covers ~1/8 of the range; pruned scan returns only
    # that slice, proving the pushed filter + stats actually bite.
    assert 0 < n_sel < n_all / 4


def test_compact_small_files(spark, tmp_path):
    from amazon_sales_data_engineering_spark.operators.layout import (
        compact_small_files,
    )

    li = table(spark, SF_DIR_MID, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    src = str(tmp_path / "fragmented")
    li.repartition(64).write.parquet(src)  # the streaming-sink pathology
    import glob

    assert len(glob.glob(src + "/*.parquet")) == 64

    dst = str(tmp_path / "compacted")
    n = compact_small_files(
        spark, src, dst, target_rows_per_file=20000, sort_cols=["l_shipdate"]
    )
    files = glob.glob(dst + "/*.parquet")
    assert len(files) == n < 8

    back = spark.read.parquet(dst)
    assert back.count() == li.count()
    a = li.agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))).collect()[0][0]
    b = back.agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))).collect()[0][0]
    assert a == b

    # compaction also restored the clustering layout
    stats = sorted(parquet_file_stats(dst, "l_shipdate"), key=lambda t: t[1])
    for (_, _, prev_max), (_, nxt_min, _) in zip(stats, stats[1:]):
        assert prev_max <= nxt_min


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    from amazon_sales_data_engineering_spark.operators.layout import (
        write_zorder_layout,
    )

    li = table(spark, SF_DIR_MID, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    z_path = str(tmp_path / "zorder")
    s_path = str(tmp_path / "single")

    write_zorder_layout(li, z_path, ["l_partkey", "l_suppkey"], num_files=16)
    write_sorted_layout(li, s_path, ["l_partkey"], num_files=16)

    # A thin slab on either clustered dimension: the z-layout reads a
    # minority of files for BOTH; the single-column sort prunes only its
    # leading column and must read every file for the other.
    bounds = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).collect()[0]
    pk_lo, pk_hi, sk_lo, sk_hi = bounds
    pk_slab = (pk_lo, pk_lo + (pk_hi - pk_lo) // 10)
    sk_slab = (sk_lo, sk_lo + (sk_hi - sk_lo) // 10)

    zp = parquet_file_stats(z_path, "l_partkey")
    zs = parquet_file_stats(z_path, "l_suppkey")
    sp = parquet_file_stats(s_path, "l_partkey")
    ss = parquet_file_stats(s_path, "l_suppkey")
    n = len(zp)
    assert n >= 12  # range exchange may merge a couple of tiny partitions

    z_pk = len(files_overlapping(zp, *pk_slab))
    z_sk = len(files_overlapping(zs, *sk_slab))
    s_pk = len(files_overlapping(sp, *pk_slab))
    s_sk = len(files_overlapping(ss, *sk_slab))

    # Z-order: real pruning on both dimensions.
    assert z_pk <= n // 2, (z_pk, n)
    assert z_sk <= n // 2, (z_sk, n)
    # Single sort: great on the leading column, useless on the other.
    assert s_pk <= 3
    assert s_sk >= len(sp) - 1

    # Layout changed, data didn't.
    back = spark.read.parquet(z_path)
    assert back.count() == li.count()
    assert set(back.columns) == set(li.columns)
    orig = li.agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))).collect()[0][0]
    new = back.agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))).collect()[0][0]
    assert orig == new


def test_zorder_value_wide_ranges_no_overflow(spark):
    """Regression: the scaling multiply must not wrap for IntegerType
    spans > ~524k (32-bit overflow at bits=12) nor for BIGINT spans too
    wide to multiply by `top` — z-keys stay monotone in each column."""
    from amazon_sales_data_engineering_spark.operators.layout import (
        zorder_value,
    )

    # int32 column spanning 0..2M (would wrap in 32-bit multiply) and a
    # bigint column spanning 0..2^60 (would overflow 64-bit multiply).
    rows = [(i * 200_000, (i * (1 << 57))) for i in range(11)]
    df = spark.createDataFrame(rows, "a int, b long")
    out, z = zorder_value(df, ["a"], bits=12)
    vals = [r["__z"] for r in out.select(z).orderBy("a").collect()]
    assert vals == sorted(vals) and len(set(vals)) > 1
    assert all(0 <= v <= (1 << 12) - 1 for v in vals)

    out, z = zorder_value(df, ["b"], bits=12)
    vals = [r["__z"] for r in out.select(z).orderBy("b").collect()]
    assert vals == sorted(vals) and len(set(vals)) > 1
    assert all(0 <= v <= (1 << 12) - 1 for v in vals)
