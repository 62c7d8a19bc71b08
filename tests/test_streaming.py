"""Structured Streaming tests: bounded file streams drained with
Trigger.AvailableNow + maxFilesPerTrigger=1, so the watermark genuinely
advances between micro-batches and append-mode close semantics are
exercised. A far-future sentinel event (user_id=-1) pushes the watermark
past every real session/window so they all emit; sentinel output rows are
filtered before asserting.

Values are multiples of 0.25 (exact doubles), so streaming vs batch sums
compare bit-for-bit regardless of aggregation order.
"""

from __future__ import annotations

import datetime as dt
import os
import time

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from amazon_sales_data_engineering_spark.streaming import (
    hourly_agg_stream,
    incremental_append,
    run_available_now,
    sessionize_session_window,
    sessionize_stateful,
    stream_source,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)

T0 = dt.datetime(2024, 3, 1, 10, 0, 0)


def _mk(eid, uid, etype, minutes, value):
    return (eid, uid, etype, T0 + dt.timedelta(minutes=minutes), value)

def _mks(eid, uid, etype, seconds, value):
    return (eid, uid, etype, T0 + dt.timedelta(seconds=seconds), value)

# user 1: two sessions (gap > 30 min between minute 20 and 70)
# user 2: one session
# user 3: gap of EXACTLY 30:00 — Spark's session_window treats the
#   session interval end as CLOSED, so a touching event MERGES (one
#   session); the custom stateful path (`s[0] <= last_end + gap`)
#   must agree. This boundary was caught by the sf1 oracle sweep
#   (~10 exact-1800s gaps per 1M events; zero at smaller scales).
# user 4: gap of 30:01 — one second past the boundary SPLITS.
EVENTS = [
    _mk(1, 1, "click", 0, 1.0),
    _mk(2, 1, "click", 20, 0.5),
    _mk(3, 1, "view", 70, 2.0),
    _mk(4, 2, "click", 5, 0.25),
    _mk(5, 2, "view", 25, 0.25),
    _mks(7, 3, "click", 0, 0.25),
    _mks(8, 3, "view", 1800, 0.5),
    _mks(9, 4, "click", 0, 0.25),
    _mks(10, 4, "view", 1801, 0.5),
]
SENTINEL = [_mk(99, -1, "eos", 60 * 24 * 30, 0.0)]


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    """Two parquet files with distinct mtimes: real events, then sentinel."""
    d = tmp_path_factory.mktemp("events-stream")
    for i, batch in enumerate([EVENTS, SENTINEL]):
        spark.createDataFrame(batch, SCHEMA).coalesce(1).write.parquet(
            str(d / f"batch{i}")
        )
        time.sleep(1.1)  # file-source ordering is by modification time
    # flatten: file source wants one directory of files
    flat = tmp_path_factory.mktemp("events-flat")
    n = 0
    for i in range(2):
        for f in sorted(os.listdir(d / f"batch{i}")):
            if f.endswith(".parquet"):
                src = d / f"batch{i}" / f
                dst = flat / f"{i:02d}-{f}"
                os.rename(src, dst)
                os.utime(dst, (time.time() + i, time.time() + i))
                n += 1
    assert n == 2
    return str(flat)


def _source(spark, stream_dir):
    return stream_source(
        spark, stream_dir, SCHEMA, fmt="parquet", max_files_per_trigger=1
    )


def test_hourly_agg_stream_matches_batch(spark, stream_dir):
    out = run_available_now(
        hourly_agg_stream(_source(spark, stream_dir), watermark="0 seconds"),
        "hourly_stream",
    )
    got = {
        (r.hour_ts, r.event_type): (r.n_events, r.total_value)
        for r in out
        if r.event_type != "eos"
    }
    batch = (
        spark.createDataFrame(EVENTS, SCHEMA)
        .groupBy(F.date_trunc("hour", "ts").alias("hour_ts"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    )
    want = {(r.hour_ts, r.event_type): (r.n, r.v) for r in batch}
    assert got == want


def _assert_sessions(rows):
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, r.total_value)
        for r in rows
        if r.user_id != -1
    )
    m = lambda minutes: T0 + dt.timedelta(minutes=minutes)  # noqa: E731
    s = lambda seconds: T0 + dt.timedelta(seconds=seconds)  # noqa: E731
    assert got == [
        (1, m(0), m(20), 2, 1.5),
        (1, m(70), m(70), 1, 2.0),
        (2, m(5), m(25), 2, 0.5),
        # exact-gap (1800 s) MERGES: one session spanning both events
        (3, s(0), s(1800), 2, 0.75),
        # one past the gap (1801 s) SPLITS: two singleton sessions
        (4, s(0), s(0), 1, 0.25),
        (4, s(1801), s(1801), 1, 0.5),
    ]


def test_sessionize_session_window(spark, stream_dir):
    rows = run_available_now(
        sessionize_session_window(_source(spark, stream_dir)), "sess_native"
    )
    _assert_sessions(rows)


def test_sessionize_stateful(spark, stream_dir):
    rows = run_available_now(
        sessionize_stateful(_source(spark, stream_dir)), "sess_stateful"
    )
    _assert_sessions(rows)


def test_incremental_append_checkpoint_idempotent(spark, stream_dir, tmp_path):
    """foreachBatch + checkpoint = streaming form of the batch file ledger:
    a restarted query re-processes nothing."""
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(bdf, batch_id):
        bdf.write.mode("append").parquet(sink)

    for _ in range(2):  # second run: checkpoint says all files seen
        q = incremental_append(_source(spark, stream_dir), write_batch, ckpt)
        q.awaitTermination(120)
    total = spark.read.parquet(sink).count()
    assert total == len(EVENTS) + len(SENTINEL)


@pytest.fixture(scope="module")
def dup_stream_dir(spark, tmp_path_factory):
    """Three files in mtime order: originals, an at-least-once re-delivery
    of two of them (same event_id, same payload) plus one new event, then
    the sentinel. maxFilesPerTrigger=1 makes each file its own micro-batch,
    so the re-delivery arrives AFTER the originals were committed to state."""
    redelivery = [EVENTS[0], EVENTS[3], _mk(6, 2, "click", 40, 0.75)]
    d = tmp_path_factory.mktemp("events-dup")
    flat = tmp_path_factory.mktemp("events-dup-flat")
    for i, batch in enumerate([EVENTS, redelivery, SENTINEL]):
        spark.createDataFrame(batch, SCHEMA).coalesce(1).write.parquet(
            str(d / f"batch{i}")
        )
    for i in range(3):
        for f in sorted(os.listdir(d / f"batch{i}")):
            if f.endswith(".parquet"):
                dst = flat / f"{i:02d}-{f}"
                os.rename(d / f"batch{i}" / f, dst)
                os.utime(dst, (time.time() + i, time.time() + i))
    return str(flat)


def test_dedup_stream_within_watermark(spark, dup_stream_dir):
    """Re-delivered events inside the horizon are dropped; the stream's
    output equals the batch distinct-by-event_id result."""
    from amazon_sales_data_engineering_spark.streaming import dedup_stream

    src = stream_source(
        spark, dup_stream_dir, SCHEMA, fmt="parquet", max_files_per_trigger=1
    )
    rows = run_available_now(
        dedup_stream(src, horizon="1 hour"), "dedup_wm", timeout_sec=180
    )
    got = sorted((r.event_id, r.user_id, r.ts) for r in rows if r.user_id != -1)
    want = sorted(
        (e[0], e[1], e[3]) for e in EVENTS + [_mk(6, 2, "click", 40, 0.75)]
    )
    assert got == want  # each event exactly once, duplicate file absorbed


def test_dedup_stream_exact(spark, dup_stream_dir):
    from amazon_sales_data_engineering_spark.streaming import dedup_stream_exact

    src = stream_source(
        spark, dup_stream_dir, SCHEMA, fmt="parquet", max_files_per_trigger=1
    )
    rows = run_available_now(dedup_stream_exact(src), "dedup_exact_s", timeout_sec=180)
    ids = sorted(r.event_id for r in rows if r.user_id != -1)
    assert ids == sorted({e[0] for e in EVENTS} | {6})


@pytest.fixture(scope="module")
def attrib_stream_dir(spark, tmp_path_factory):
    """Clicks + purchases for attribution: user 1's purchase at minute 30
    follows both clicks within the hour; the minute-85 purchase follows
    neither within it. User 2 converts once."""
    events = [
        _mk(1, 1, "click", 0, 0.0),
        _mk(2, 1, "click", 20, 0.0),
        _mk(3, 1, "purchase", 30, 5.0),
        _mk(4, 1, "purchase", 85, 7.0),
        _mk(5, 2, "click", 5, 0.0),
        _mk(6, 2, "purchase", 50, 3.0),
    ]
    d = tmp_path_factory.mktemp("events-attrib")
    flat = tmp_path_factory.mktemp("events-attrib-flat")
    for i, batch in enumerate([events, SENTINEL]):
        spark.createDataFrame(batch, SCHEMA).coalesce(1).write.parquet(
            str(d / f"batch{i}")
        )
    for i in range(2):
        for f in sorted(os.listdir(d / f"batch{i}")):
            if f.endswith(".parquet"):
                dst = flat / f"{i:02d}-{f}"
                os.rename(d / f"batch{i}" / f, dst)
                os.utime(dst, (time.time() + i, time.time() + i))
    return str(flat)


def test_attribute_stream_event_time_window(spark, attrib_stream_dir):
    from amazon_sales_data_engineering_spark.streaming import attribute_stream

    src = stream_source(
        spark, attrib_stream_dir, SCHEMA, fmt="parquet", max_files_per_trigger=1
    )
    clicks = src.filter(F.col("event_type") == "click")
    purchases = src.filter(
        (F.col("event_type") == "purchase") | (F.col("event_type") == "eos")
    )
    rows = run_available_now(
        attribute_stream(clicks, purchases, attribution_window="1 hour"),
        "attrib",
        timeout_sec=180,
    )
    got = sorted((r.click_id, r.purchase_id) for r in rows if r.user_id != -1)
    # purchase 3 ← clicks 1 and 2; purchase 6 ← click 5; purchase 4 ← none
    assert got == [(1, 3), (2, 3), (5, 6)]


def test_attribute_stream_requires_streams(spark):
    from amazon_sales_data_engineering_spark.streaming import attribute_stream

    batch = spark.createDataFrame(EVENTS, SCHEMA)
    with pytest.raises(ValueError, match="two streaming"):
        attribute_stream(batch, batch)


def test_enrich_stream_static_dim(spark, stream_dir):
    from amazon_sales_data_engineering_spark.streaming import enrich_stream

    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], ["user_id", "segment"]
    )
    src = _source(spark, stream_dir)
    rows = run_available_now(
        enrich_stream(src, dim, ["user_id"]), "enriched"
    )
    segs = {r.user_id: r.segment for r in rows if r.user_id > 0}
    assert segs == {1: "gold", 2: "silver", 3: None, 4: None}
    n_null = sum(1 for r in rows if r.user_id == -1 and r.segment is None)
    assert n_null == 1  # left join: unmatched sentinel passes through


def test_enrich_stream_rejects_streaming_dim(spark, stream_dir):
    from amazon_sales_data_engineering_spark.streaming import enrich_stream

    src = _source(spark, stream_dir)
    with pytest.raises(ValueError, match="static"):
        enrich_stream(src, src, ["user_id"])


def test_cdc_apply_stream_matches_batch_compaction(spark, stream_dir):
    """Streaming last-writer-wins state (complete mode, drained with
    AvailableNow so later files arrive in later micro-batches) must equal
    the batch window compaction over the same events."""
    from amazon_sales_data_engineering_spark.streaming import cdc_apply_stream

    from pyspark.sql import Window

    out = cdc_apply_stream(_source(spark, stream_dir))
    rows = run_available_now(out, "cdc_state", output_mode="complete")
    got = {
        r.user_id: (r.last_type, r.last_value, r.updated_at)
        for r in rows
        if r.user_id > 0
    }

    batch = spark.read.schema(SCHEMA).parquet(stream_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    want = {
        r.user_id: (r.event_type, r.value, r.ts)
        for r in batch.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1 AND event_type <> 'error' AND user_id > 0")
        .collect()
    }
    assert got == want


def test_windowed_distinct_stream_matches_batch(spark, stream_dir):
    """Streaming exact distinct-users-per-hour (watermark-bounded
    dropDuplicates + window count) must equal the batch computation."""
    from amazon_sales_data_engineering_spark.streaming import (
        windowed_distinct_stream,
    )

    out = windowed_distinct_stream(_source(spark, stream_dir))
    rows = run_available_now(out, "win_distinct")
    got = {r.hour_ts: r.n_users for r in rows}

    batch = spark.read.schema(SCHEMA).parquet(stream_dir).filter("user_id > 0")
    want = {
        r.h: r.n
        for r in batch.groupBy(
            F.date_trunc("hour", "ts").alias("h")
        ).agg(F.count_distinct("user_id").alias("n")).collect()
    }
    for h, n in want.items():
        assert got.get(h) == n, (h, n, got)


def test_windowed_distinct_state_evicted(spark, stream_dir):
    """The dedup state must be watermark-bounded, not all-time: after the
    far-future sentinel advances the watermark past every real window, the
    deduplicate operator's state should hold only the sentinel's own
    (window, user) pair — every expired pair evicted. This is exactly what
    deduping on a derived hour column (no event-time metadata) silently
    breaks: output stays equal while state grows without bound."""
    from amazon_sales_data_engineering_spark.streaming import (
        windowed_distinct_stream,
    )

    out = windowed_distinct_stream(_source(spark, stream_dir))
    q = (
        out.writeStream.format("memory")
        .queryName("wd_evict")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    dedup_ops = [
        op
        for p in q.recentProgress
        for op in p["stateOperators"]
        if "dedupe" in op["operatorName"]
    ]
    assert dedup_ops, "no deduplicate state operator in progress"
    # 4 distinct (window, user) pairs ever existed (3 real + sentinel);
    # only the sentinel's open window may remain in state.
    assert dedup_ops[-1]["numRowsTotal"] <= 1, dedup_ops[-1]
    assert sum(op["numRowsRemoved"] for op in dedup_ops) >= 3


def test_incremental_append_resumes_for_new_files_only(spark, tmp_path):
    """Stop-and-resume WITH new data: run the checkpointed foreachBatch
    load over the first files, stop, land a new file, restart the SAME
    checkpoint — the resumed query must process ONLY the new file
    (ledger semantics) and the sink must hold every event exactly once
    (exactly-once effect across restarts)."""
    d = tmp_path / "land"
    os.makedirs(d)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def land(batch, stamp, name):
        spark.createDataFrame(batch, SCHEMA).coalesce(1).write.parquet(
            str(tmp_path / name)
        )
        for f in sorted(os.listdir(tmp_path / name)):
            if f.endswith(".parquet"):
                dst = d / f"{name}-{f}"
                os.rename(tmp_path / name / f, dst)
                os.utime(dst, (stamp, stamp))

    now = time.time()
    land(EVENTS[:3], now, "a")
    land(EVENTS[3:], now + 1, "b")

    seen_batches: list[int] = []

    def write_batch(bdf, batch_id):
        seen_batches.append(bdf.count())
        bdf.write.mode("append").parquet(sink)

    q = incremental_append(_source(spark, str(d)), write_batch, ckpt)
    q.awaitTermination(120)
    assert sum(seen_batches) == len(EVENTS)

    late = [_mk(11, 2, "click", 90, 0.5), _mk(12, 1, "view", 95, 0.25)]
    land(late, now + 2, "c")
    seen_batches.clear()
    q = incremental_append(_source(spark, str(d)), write_batch, ckpt)
    q.awaitTermination(120)
    # the resumed run saw exactly the late file's rows, nothing replayed
    assert sum(seen_batches) == len(late)

    out = spark.read.parquet(sink)
    assert out.count() == len(EVENTS) + len(late)
    assert out.select("event_id").distinct().count() == len(EVENTS) + len(late)


def test_stream_session_clone_isolated(spark):
    """_stream_session must reduce state partitions on a CLONE and leave
    the caller's session conf untouched (concurrent-runner contract)."""
    from amazon_sales_data_engineering_spark.plans.streaming_ops import (
        _stream_session,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    clone = _stream_session(spark)
    assert clone is not spark
    assert clone.conf.get("spark.sql.shuffle.partitions") == "8"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    # shared context, isolated SQLConf
    assert clone.sparkContext is spark.sparkContext

    os.environ["SPARK_GRAFT_STREAM_STATE_PARTITIONS"] = "5"
    try:
        assert (_stream_session(spark)
                .conf.get("spark.sql.shuffle.partitions") == "5")
    finally:
        del os.environ["SPARK_GRAFT_STREAM_STATE_PARTITIONS"]
