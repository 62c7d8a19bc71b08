"""Custom Python Data Source (sources/pysource.py): batch partitioned
read and streaming offset-tracked read, each checked against the
deterministic row formula."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from amazon_sales_data_engineering_spark.sources.pysource import (
    _MOD,
    _MULT,
    register_synthetic_source,
)


def _expected(n_rows: int, n_buckets: int = 10):
    rows = set()
    for i in range(n_rows):
        h = (i * _MULT) % _MOD
        rows.add((i, h % n_buckets, h % 100000))
    return rows


def test_batch_read_partitioned(spark):
    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_rows")
        .option("n_rows", 1234)
        .option("n_parts", 7)
        .load()
    )
    got = {(r.id, r.bucket, r.amount_cents) for r in df.collect()}
    assert got == _expected(1234)
    # the read genuinely fans out: one task per declared partition
    assert df.rdd.getNumPartitions() == 7


def test_stream_restart_no_duplicate_emission():
    """Post-restart offset regression (round-4 ADVICE): with committed
    offset 500 journaled, a fresh reader's latestOffset() starts behind
    (100 < 500); Spark journals that 100 as a batch end and then uses it
    as the NEXT batch's start. The high-water mark must clamp the planned
    (100, 600) range to emit exactly (500, 600) — not re-emit 100-500."""
    from amazon_sales_data_engineering_spark.sources.pysource import (
        SyntheticRowsStreamReader,
    )

    r = SyntheticRowsStreamReader({"n_rows": 1000, "rows_per_batch": 100})
    # Engine restarts from checkpoint: start = committed {pos: 500};
    # fresh cursor yields latestOffset {pos: 100}.
    assert r.latestOffset() == {"pos": 100}
    assert r.partitions({"pos": 500}, {"pos": 100}) == []  # catch-up batch
    r.commit({"pos": 100})  # engine commits the (empty) catch-up batch
    # Next batch: journaled end 100 becomes the start; cursor (clamped to
    # 500 by the catch-up planning) advances to 600.
    assert r.latestOffset() == {"pos": 600}
    parts = r.partitions({"pos": 100}, {"pos": 600})
    assert [(p.start, p.end) for p in parts] == [(500, 600)]
    # Replay of a journaled-but-uncommitted batch on a FRESH reader (the
    # actual recovery path) still emits the full range.
    r2 = SyntheticRowsStreamReader({"n_rows": 1000, "rows_per_batch": 100})
    parts2 = r2.partitions({"pos": 500}, {"pos": 600})
    assert [(p.start, p.end) for p in parts2] == [(500, 600)]


def test_stream_read_offsets(spark):
    register_synthetic_source(spark)
    q = (
        spark.readStream.format("synthetic_rows")
        .option("n_rows", 500)
        .option("rows_per_batch", 200)
        .load()
        .writeStream.format("memory")
        .queryName("pysource_stream_t")
        .outputMode("append")
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        while (
            time.time() < deadline
            and spark.table("pysource_stream_t").count() < 500
        ):
            time.sleep(1)
    finally:
        q.stop()
    out = spark.table("pysource_stream_t")
    got = {(r.id, r.bucket, r.amount_cents) for r in out.collect()}
    # exactly the declared row space, no duplicates across micro-batches
    # (offset ranges [start, end) partition the cursor line)
    assert got == _expected(500)
    assert out.count() == 500
    assert out.select(F.count_distinct("id")).first()[0] == 500
