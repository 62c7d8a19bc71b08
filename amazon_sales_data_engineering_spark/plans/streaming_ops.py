"""Driver-gated streaming queries: batch-equivalence proofs.

The ``streaming/`` twins are exercised by pytest with synthetic bounded
streams; this module closes the loop with the external correctness gate by
replaying a REAL testdata table through the actual Structured Streaming
path (file source -> watermark -> stateful operator -> AvailableNow drain)
and oracling the final table against plain batch SQL.

Determinism: the replay is split into three time-ordered files (ascending
mtimes, so the file source feeds micro-batches in event-time order and the
watermark genuinely advances between batches without ever declaring a
not-yet-seen row late). Three gates cover the three stateful shapes, each
micro-batching-proof a different way:

- **dedup** (streaming_windowed_dedup): append-mode output is the set of
  first-seen keys — identical however the input is batched.
- **aggregate** (streaming_hourly_counts): COMPLETE mode emits the whole
  state at the end; integer counts make it order-proof.
- **session windows** (streaming_sessionize_gap): append mode plus a
  far-future sentinel that pushes the watermark past every real session,
  so they all emit before the stream drains.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .events_ops import _TVD_ORACLE
from .registry import register
from .util import t


def _replay_dir(sf_dir: str) -> str:
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return os.path.join(tempfile.gettempdir(), f"asde_stream_replay_{tag}")


#: schema of the replay files written by _write_replay (and therefore the
#: readStream schema of every gated streaming query).
_REPLAY_SCHEMA = "event_id bigint, user_id bigint, event_type string, sec bigint"


def _write_replay(
    spark: SparkSession, sf_dir: str, sentinel: bool = False,
    n_sentinels: int | None = None,
    sentinel_kinds: tuple[str, ...] = ("eos",),
    owner: str = "",
) -> str:
    """Materialize the events table as three time-ordered parquet files
    (ascending mtimes) under /tmp and return the directory.

    Integer epoch seconds (``sec``) travel instead of the timestamp: the
    stream rebuilds an LTZ event time with ``timestamp_seconds`` — an
    absolute instant, immune to the session timezone. Time-ordered slices
    mean the watermark (lagging by its delay) can never declare a
    not-yet-seen row late, so replay results are micro-batching-proof.

    ``sentinel=True`` appends a fourth file holding one far-future event
    (user_id = -1): its arrival pushes the watermark past every real
    window/session, so append-mode AGGREGATES emit all real groups
    before the stream drains (the standard bounded-replay trick —
    callers filter ``user_id >= 0`` from the output).

    ``n_sentinels=2`` appends a SECOND far-future file after the first:
    needed by operators whose watermark-driven emission happens while a
    DATA batch runs (outer-join null flushes) — with AvailableNow the
    watermark advanced by the last file is otherwise never followed by
    another batch that could emit against it. Distinct sentinel secs
    keep each file's arrival advancing the watermark.

    ``sentinel_kinds``: each sentinel file holds ONE ROW PER KIND (all
    user_id < 0). Multi-watermark queries (stream-stream joins) split
    the source by event_type BEFORE their per-side watermark nodes, and
    each node only tracks rows that pass ITS side's filter — a single
    'eos' row advances one side while the global (min-policy) watermark
    stays pinned by the other. One sentinel row per joined kind
    advances every node.
    """
    n_sent = (1 if sentinel else 0) if n_sentinels is None else n_sentinels
    sec = F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    # Persisted: the min/max probe materializes the narrow projection
    # once; the three slice writes below then read the cache instead
    # of re-running the events scan + NANOS timestamp rebuild.
    e = t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", sec.alias("sec")
    ).persist()
    lo, hi = e.agg(F.min("sec"), F.max("sec")).first()
    b1 = lo + (hi - lo) // 3
    b2 = lo + 2 * (hi - lo) // 3

    tag = "" if (n_sent <= 1 and sentinel_kinds == ("eos",)) else (
        f"_s{n_sent}_{'_'.join(sentinel_kinds)}"
    )
    # per-gate ``owner`` tag: each gated query replays into its OWN
    # directory, so a runner executing queries concurrently can never
    # have one gate rewrite the files another is mid-stream on.
    base = _replay_dir(sf_dir) + tag + (f"_{owner}" if owner else "")
    shutil.rmtree(base, ignore_errors=True)
    s = F.col("sec")
    slices = [s < b1, (s >= b1) & (s < b2), s >= b2]
    # repartition(1), NOT coalesce(1): coalesce collapses the whole
    # upstream (events scan + NANOS timestamp rebuild + filter) into
    # the single writer task — measured 37s per replay landing at
    # sf0.1, serializing three full single-core scans, and every
    # streaming gate pays it. The exchange keeps the scan parallel and
    # leaves only the (slice-sized) write single-task.
    # sortWithinPartitions keeps the file content deterministic (a
    # post-shuffle partition has arrival order) — within-file order is
    # otherwise free: watermarks advance on the per-batch max, and
    # every gate's oracle comparison is order-insensitive.
    for i, pred in enumerate(slices):
        (
            e.filter(pred)
            .repartition(1)
            .sortWithinPartitions("sec", "event_id")
            .write.parquet(f"{base}/b{i}")
        )
    e.unpersist()
    n_files = len(slices)
    for j in range(n_sent):
        rows = [
            (-1 - j * len(sentinel_kinds) - k, -1 - k, kind,
             hi + (j + 1) * 10**9)
            for k, kind in enumerate(sentinel_kinds)
        ]
        spark.createDataFrame(rows, _REPLAY_SCHEMA).coalesce(1).write.parquet(
            f"{base}/b{n_files}"
        )
        n_files += 1
    flat = f"{base}/flat"
    os.makedirs(flat)
    now = time.time()
    for i in range(n_files):
        for f in sorted(os.listdir(f"{base}/b{i}")):
            if f.endswith(".parquet"):
                dst = f"{flat}/{i:02d}-{f}"
                os.rename(f"{base}/b{i}/{f}", dst)
                # file-source batch order follows modification time
                os.utime(dst, (now + i, now + i))
    return flat


#: Per-phase wall timings of the most recent run of each lifecycle
#: composition gate, keyed query name → {phase: sec} (round-10 verdict
#: #3: ann_index_lifecycle_e2e is the largest absolute sf1 seat — a
#: 109-stage composite whose regressions couldn't localize). The gate
#: functions reset their entry on invocation and record each EAGER
#: phase (replay landing, stream drain, compaction, append); the final
#: probe is lazy, so ``bench.py --sf1`` reports it as the residual of
#: the measured wall and copies the whole dict into the BENCH_SF1
#: sidecar next to the plan metrics.
LAST_PHASE_TIMINGS: dict[str, dict[str, float]] = {}


class _phase:
    """Context manager recording one eager phase's wall into
    ``LAST_PHASE_TIMINGS[query]`` (additive on repeated phases)."""

    def __init__(self, query: str, phase: str):
        self.query, self.phase = query, phase

    def __enter__(self):
        self.t0 = time.perf_counter()

    def __exit__(self, *exc):
        d = LAST_PHASE_TIMINGS.setdefault(self.query, {})
        d[self.phase] = round(
            d.get(self.phase, 0.0) + time.perf_counter() - self.t0, 4
        )
        return False


def _await_drained(q, timeout_sec: int | None = None) -> None:
    """Await an AvailableNow replay and ASSERT it actually drained
    before the caller reads the result (round-10 ADVICE: on a loaded
    host an undrained replay silently yields a partially built
    index/table — the sweep's oracle would surface it only as a
    confusing value mismatch, and ``bench.py --sf1`` (no oracle) would
    record a green wall number over wrong state). Always stops the
    query. Default 180s covers sf1 with 4x headroom (measured 45s
    drain); bigger probe corpora override via
    $ASDE_STREAM_DRAIN_TIMEOUT — drain work is data-proportional."""
    if timeout_sec is None:
        timeout_sec = int(os.environ.get("ASDE_STREAM_DRAIN_TIMEOUT", "180"))
    try:
        drained = q.awaitTermination(timeout_sec)
        assert drained, (
            f"streaming replay did not drain within {timeout_sec}s"
        )
    finally:
        q.stop()


def _stream_session(spark: SparkSession) -> SparkSession:
    """Session CLONE with state-store-sized shuffle partitions for the
    streaming gates.

    Every stateful streaming operator keys its state store count to the
    session's ``spark.sql.shuffle.partitions`` at query start, and pays
    a fixed per-partition-per-micro-batch cost (one HDFS-backed store
    open + delta file write + commit per store per partition per batch
    — AQE never coalesces streaming exchanges). The gates replay small
    bounded slices (maxFilesPerTrigger=1), so at 32 host-sized
    partitions that fixed cost dominates the wall 2-3x over the actual
    join/aggregate work (r11 A/B: stream_join_outer 36-51s -> 17-18s,
    watermark_drops 34.8 -> 10.6s at 8 partitions, same JVM).

    ``newSession()`` shares the SparkContext but owns its SQLConf, so
    the reduced partition count NEVER leaks into the caller's session —
    safe under the repo's concurrent-runner contract (gate functions
    must not mutate the session they are handed). Builder-time conf
    (UTC timezone, AQE, pushdown) lives in the SparkContext conf and is
    inherited by the clone; under the driver's vanilla session the
    clone simply inherits the vanilla defaults, which the gates already
    tolerate.

    Sizing: state partitions should track per-micro-batch volume (the
    replay slices), not host cores — a production stream sizes them to
    steady-state throughput via $SPARK_GRAFT_STREAM_STATE_PARTITIONS;
    the default 8 covers the gate corpora (sf0.01-sf1) with partitions
    well above the guide-§2.2 floor. Result identity is unaffected:
    state partitioning changes WHERE rows are buffered, never the
    emitted set (all 16 gates oracle-verified at both SFs on this
    change).
    """
    env = os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "")
    n = int(env) if env.isdigit() and int(env) > 0 else 8
    s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", str(n))
    return s


def _drain(stream_df: DataFrame, output_mode: str) -> DataFrame:
    """Run a bounded stream to completion through a memory sink
    (Trigger.AvailableNow) and return the final table."""
    spark = stream_df.sparkSession
    qname = f"asde_stream_gate_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q)
    return spark.table(qname)


@register(
    "streaming_windowed_dedup",
    oracle="""
SELECT DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour_id, user_id
FROM events
""",
    doc="Streaming/batch equivalence, driver-gated: the events table is "
    "replayed as a genuine bounded file stream (three time-ordered files, "
    "maxFilesPerTrigger=1, so the watermark advances across micro-"
    "batches), run through withWatermark + dropDuplicates on the "
    "(window, user) key — the window() column carries the event-time "
    "metadata, so state is evicted as hours expire — drained with "
    "Trigger.AvailableNow into a memory sink, and the FINAL TABLE is "
    "compared against batch SELECT DISTINCT. Append-mode dedup output is "
    "the first-seen key set: identical to the batch distinct no matter "
    "how the input was micro-batched, which is what makes a streaming "
    "query hash-gateable at all. streaming/ingest.py holds the "
    "production twins; this is the gate-visible proof that the streaming "
    "path computes the batch answer.",
    tags=("streaming", "dedup", "events"),
)
def streaming_windowed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark = _stream_session(spark)
    from ..streaming.ingest import stream_source

    src = stream_source(
        spark,
        _write_replay(spark, sf_dir, owner="dedup"),
        _REPLAY_SCHEMA,
        fmt="parquet",
        max_files_per_trigger=1,
    )
    deduped = (
        src.select("user_id", F.timestamp_seconds("sec").alias("evt_ts"))
        .withWatermark("evt_ts", "1 hour")
        .select(F.window("evt_ts", "1 hour").alias("win"), "user_id")
        .dropDuplicates(["win", "user_id"])
        # epoch hour of the window start: TZ-independent bigint output
        .select(
            (F.unix_timestamp(F.col("win.start")) / F.lit(3600))
            .cast("bigint")
            .alias("hour_id"),
            "user_id",
        )
    )
    return _drain(deduped, "append")


@register(
    "streaming_hourly_counts",
    oracle="""
SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour_id,
       event_type,
       COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
""",
    doc="Streaming/batch equivalence #2 — the AGGREGATION path: the same "
    "three-file replay runs through a streaming groupBy on (epoch hour, "
    "event_type) in COMPLETE output mode, whose final memory-sink table "
    "is the whole aggregate state after the last micro-batch. Integer "
    "counts make the result micro-batching-proof (a float sum would "
    "re-order across batches); complete mode sidesteps append-mode's "
    "emission coupling (the final open window never closes), which is "
    "why the dedup twin — not this — is the append-mode proof. Together "
    "they gate both stateful paths: StreamingDeduplicate and stateful "
    "HashAggregate.",
    tags=("streaming", "agg", "events"),
)
def streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark = _stream_session(spark)
    from ..streaming.ingest import stream_source

    src = stream_source(
        spark,
        _write_replay(spark, sf_dir, owner="hourly"),
        _REPLAY_SCHEMA,
        fmt="parquet",
        max_files_per_trigger=1,
    )
    counts = (
        src.select((F.col("sec") / F.lit(3600)).cast("bigint").alias("hour_id"),
                   "event_type")
        .groupBy("hour_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return _drain(counts, "complete")


@register(
    "streaming_sessionize_gap",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
), g AS (
  SELECT user_id, sec,
         lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id)
           AS prev_sec
  FROM e
), flagged AS (
  SELECT user_id, sec,
         CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM g
), sessions AS (
  SELECT user_id, sec,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY sec
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_idx
  FROM flagged
)
SELECT user_id,
       MIN(sec) AS sess_start_sec,
       MAX(sec) AS sess_last_sec,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_idx
""",
    doc="Streaming/batch equivalence #3 — SESSION WINDOWS: the replay "
    "(plus a far-future sentinel that pushes the watermark past every "
    "real session) runs through a streaming session_window(30 min) "
    "aggregate in append mode; the emitted sessions must equal batch "
    "gaps-islands sessionization. The oracle uses session_window's "
    "TOUCHING-MERGE boundary — a gap of exactly 30:00 MERGES (`>`, "
    "not `>=`, splits): Spark extends a session whose [t, t+gap] "
    "closed end an arriving event touches (verified empirically: "
    "events at 0 and 1800 form ONE session [0, 3600), at 0 and 1801 "
    "two). The sf1 sweep caught this — ~10 exact-1800 gaps exist in "
    "1M events, zero at the gate scales — on integer epoch seconds so "
    "the comparison is timezone-proof and engine-exact. Gates Spark's "
    "native stateful session operator end-to-end: merge, watermark "
    "close, and emission — the one streaming shape the dedup and "
    "complete-mode gates don't touch.",
    tags=("streaming", "sessionize", "events"),
)
def streaming_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark = _stream_session(spark)
    from ..streaming.ingest import stream_source

    src = stream_source(
        spark,
        _write_replay(spark, sf_dir, sentinel=True, owner="sess"),
        _REPLAY_SCHEMA,
        fmt="parquet",
        max_files_per_trigger=1,
    )
    sessions = (
        src.select("user_id", F.timestamp_seconds("sec").alias("evt_ts"))
        .withWatermark("evt_ts", "1 hour")
        .groupBy(
            F.session_window("evt_ts", "30 minutes").alias("win"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("win.start")).alias("sess_start_sec"),
            # session_window end = last event + gap; recover the last
            # event time so the output is pure session content, not
            # gap-padded bounds.
            (F.unix_timestamp(F.col("win.end")) - F.lit(1800)).alias(
                "sess_last_sec"
            ),
            "n_events",
        )
    )
    out = _drain(sessions, "append")
    return out.filter(F.col("user_id") >= 0)


def _write_replay_stragglers(spark: SparkSession, sf_dir: str) -> str:
    """Replay variant for the watermark-DROP gate: the three time-ordered
    slices, then a fourth file of deterministic STRAGGLERS — copies of
    (a) early events (windows hours closed: must be dropped) and
    (b) last-half-hour events (window still open: must be double-counted)
    — then the far-future sentinel. Separate directory tag so it never
    races the plain replay."""
    sec = F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    # Persist + repartition(1) for the same reason as _write_replay:
    # coalesce(1) serialized the whole scan+rebuild into one task per
    # slice (4 single-core passes here).
    e = t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", sec.alias("sec")
    ).persist()
    lo, hi = e.agg(F.min("sec"), F.max("sec")).first()
    b1 = lo + (hi - lo) // 3
    b2 = lo + 2 * (hi - lo) // 3

    base = _replay_dir(sf_dir) + "_strag"
    shutil.rmtree(base, ignore_errors=True)
    s = F.col("sec")
    # dropped probes are thinned (%10) — plenty of early events exist;
    # kept probes take EVERY last-half-hour event, the tail is sparse.
    strag = e.filter(
        ((s < b1) & (F.col("event_id") % 10 == 0)) | (s >= hi - 1800)
    )
    parts = [
        e.filter(s < b1),
        e.filter((s >= b1) & (s < b2)),
        e.filter(s >= b2),
        strag,
        spark.createDataFrame([(-1, -1, "eos", hi + 10**9)], _REPLAY_SCHEMA),
    ]
    for i, df in enumerate(parts):
        (
            df.repartition(1)
            .sortWithinPartitions("sec", "event_id")
            .write.parquet(f"{base}/b{i}")
        )
    e.unpersist()
    flat = f"{base}/flat"
    os.makedirs(flat)
    now = time.time()
    for i in range(len(parts)):
        for f in sorted(os.listdir(f"{base}/b{i}")):
            if f.endswith(".parquet"):
                dst = f"{flat}/{i:02d}-{f}"
                os.rename(f"{base}/b{i}/{f}", dst)
                os.utime(dst, (now + i, now + i))
    return flat


@register(
    "streaming_watermark_drops",
    oracle="""
WITH e AS (
  SELECT event_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
), bounds AS (
  SELECT MIN(sec) AS lo, MAX(sec) AS hi FROM e
), kept_extra AS (
  SELECT e.sec, e.event_type
  FROM e, bounds
  WHERE e.sec >= bounds.hi - 1800
), allrows AS (
  SELECT sec, event_type FROM e
  UNION ALL
  SELECT sec, event_type FROM kept_extra
)
SELECT sec // 3600 AS hour_id, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM allrows
GROUP BY 1, 2
""",
    doc="Streaming/batch equivalence #4 — WATERMARK DROP SEMANTICS: the "
    "replay carries a deliberate straggler file after the time-ordered "
    "slices, holding copies of (a) early events whose hour windows "
    "closed long before the straggler batch (watermark = max seen - "
    "1 h is days past their window end -> the stateful aggregate MUST "
    "drop them) and (b) last-half-hour events whose window is still "
    "open (window end > watermark -> MUST be double-counted). The "
    "append-mode hourly aggregate drains after a far-future sentinel "
    "closes every window; the oracle is the batch aggregate over base "
    "events + ONLY the kept stragglers. If the stream failed to drop "
    "the closed-window copies, early-hour counts inflate; if it "
    "wrongly dropped the open-window copies, last-hour counts deflate "
    "— the hash discriminates both failure directions. This gates the "
    "one watermark behavior the time-ordered gates can never exercise: "
    "state-eviction-driven data drop, the semantics that bound state "
    "at 100 TB.",
    tags=("streaming", "agg", "events", "watermark"),
)
def streaming_watermark_drops(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark = _stream_session(spark)
    from ..streaming.ingest import stream_source

    src = stream_source(
        spark,
        _write_replay_stragglers(spark, sf_dir),
        _REPLAY_SCHEMA,
        fmt="parquet",
        max_files_per_trigger=1,
    )
    counts = (
        src.select(
            F.timestamp_seconds("sec").alias("evt_ts"), "event_type"
        )
        .withWatermark("evt_ts", "1 hour")
        .groupBy(F.window("evt_ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            (F.unix_timestamp(F.col("win.start")) / F.lit(3600))
            .cast("bigint")
            .alias("hour_id"),
            "event_type",
            "n_events",
        )
    )
    out = _drain(counts, "append")
    return out.filter(F.col("event_type") != "eos")

@register(
    "streaming_stream_join",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
)
SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id,
       p.sec - v.sec AS delta_sec
FROM e v JOIN e p ON v.user_id = p.user_id
WHERE v.event_type = 'view' AND p.event_type = 'purchase'
  AND p.sec >= v.sec AND p.sec <= v.sec + 7200
""",
    doc="Streaming/batch equivalence #5 — STREAM-STREAM JOIN: two "
    "streams (views, purchases) split from the replayed file source "
    "are inner-joined on user_id with the event-time range condition "
    "purchase IN [view, view + 2 h], both sides watermarked 1 h. "
    "Inner-join output is the SET of matching pairs — identical "
    "however the input is micro-batched — provided no buffered row is "
    "evicted before its partner arrives; the time-ordered replay "
    "guarantees that: a partner arriving in a later slice has "
    "sec >= the slice boundary, so the watermark (boundary - 1 h) is "
    "always behind view_time + tolerance when the match is attempted. "
    "The time bound is what makes this runnable at all at scale — it "
    "lets the join evict view-side state once the watermark passes "
    "view_time + 2 h, so state is O(events per 3 h), not O(stream). "
    "Gates Spark's StreamingSymmetricHashJoin end-to-end: buffering, "
    "range-condition state bounds, and eviction — the one stateful "
    "operator the dedup/aggregate/session gates don't touch.",
    tags=("streaming", "join", "events", "watermark"),
)
def streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark = _stream_session(spark)
    from ..streaming.ingest import stream_source

    # ONE file source self-joined: both sides share the micro-batch
    # boundaries, so neither can run ahead of the other's watermark.
    src = stream_source(
        spark, _write_replay(spark, sf_dir, owner="ssj"), _REPLAY_SCHEMA,
        fmt="parquet", max_files_per_trigger=1,
    )

    def side(kind: str, alias: str) -> DataFrame:
        return (
            src.filter(F.col("event_type") == kind)
            .select(
                F.col("event_id").alias(f"{alias}_id"),
                F.col("user_id").alias(f"{alias}_user"),
                F.timestamp_seconds("sec").alias(f"{alias}_ts"),
            )
            .withWatermark(f"{alias}_ts", "1 hour")
        )

    views, purchases = side("view", "v"), side("purchase", "p")
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 2 HOURS")),
        "inner",
    ).select(
        F.col("v_id").alias("view_id"),
        F.col("p_id").alias("purchase_id"),
        F.col("v_user").alias("user_id"),
        (F.unix_timestamp("p_ts") - F.unix_timestamp("v_ts")).alias("delta_sec"),
    )
    return _drain(joined, "append")

@register(
    "streaming_stream_join_outer",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
), v AS (SELECT * FROM e WHERE event_type = 'view'),
   p AS (SELECT * FROM e WHERE event_type = 'purchase')
SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id,
       p.sec - v.sec AS delta_sec
FROM v LEFT JOIN p ON v.user_id = p.user_id
  AND p.sec >= v.sec AND p.sec <= v.sec + 7200
""",
    doc="Streaming/batch equivalence #6 — OUTER stream-stream join: "
    "same views/purchases interval join, LEFT OUTER. Unmatched views "
    "can only emit (with nulls) once the watermark proves no partner "
    "can still arrive — i.e. passes view_time + tolerance — so this "
    "gate needs TWO far-future sentinel files, each holding one row "
    "PER JOINED KIND: a per-side watermark node only tracks rows that "
    "pass its side's filter, so a single-kind sentinel advances one "
    "node while the min-policy global watermark stays pinned by the "
    "other (measured — the last 3 h of views never flushed); and the "
    "null flush only runs inside a DATA batch under AvailableNow, so "
    "the second sentinel provides the batch that emits under the "
    "first one's watermark. The oracle is the plain batch LEFT JOIN: "
    "every view appears exactly once per match or once with nulls. "
    "This is the strongest eviction proof in the streaming family — "
    "a join that never evicted state would pass the inner gate but "
    "hang matched-only here (missing null rows), and one that "
    "evicted too early would emit false nulls AND lose matches; the "
    "hash discriminates both.",
    tags=("streaming", "join", "events", "watermark", "outer"),
)
def streaming_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark = _stream_session(spark)
    from ..streaming.ingest import stream_source

    src = stream_source(
        spark,
        _write_replay(
            spark, sf_dir, n_sentinels=2,
            sentinel_kinds=("view", "purchase"), owner="ssjo",
        ),
        _REPLAY_SCHEMA, fmt="parquet", max_files_per_trigger=1,
    )

    def side(kind: str, alias: str) -> DataFrame:
        return (
            src.filter(F.col("event_type") == kind)
            .select(
                F.col("event_id").alias(f"{alias}_id"),
                F.col("user_id").alias(f"{alias}_user"),
                F.timestamp_seconds("sec").alias(f"{alias}_ts"),
            )
            .withWatermark(f"{alias}_ts", "1 hour")
        )

    views, purchases = side("view", "v"), side("purchase", "p")
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 2 HOURS")),
        "left_outer",
    ).select(
        F.col("v_id").alias("view_id"),
        F.col("p_id").alias("purchase_id"),
        F.col("v_user").alias("user_id"),
        (F.unix_timestamp("p_ts") - F.unix_timestamp("v_ts")).alias("delta_sec"),
    )
    out = _drain(joined, "append")
    return out.filter(F.col("user_id") >= 0)

@register(
    "streaming_foreachbatch_upsert",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
), ranked AS (
  SELECT user_id, event_type, sec, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY sec DESC, event_id DESC) AS rn
  FROM e
)
SELECT user_id, event_type AS last_type, sec AS last_sec,
       event_id AS last_event_id
FROM ranked WHERE rn = 1
""",
    doc="Streaming/batch equivalence #7 — the SINK side: the replay "
    "runs through writeStream.foreachBatch, each micro-batch UPSERTING "
    "its per-user latest event into a persistent state table "
    "(last-writer-wins MERGE on the (sec, event_id) total order; the "
    "table is parquet swapped atomically per batch — the dependency-"
    "free stand-in for a Delta/Iceberg MERGE target). The gate reads "
    "the FINAL table and compares against the batch per-user argmax. "
    "Two properties carried by the structure: the upsert is an "
    "idempotent merge (re-delivering any batch converges to the same "
    "state — exactly-once effect from at-least-once delivery), and "
    "the checkpoint's file ledger means a restart re-processes "
    "nothing (the streaming form of the batch COPY ledger, SURVEY "
    "§2.1 S8). Completes the streaming family: gates 1-6 prove the "
    "transform operators, this one proves the load path a production "
    "pipeline hangs off foreachBatch.",
    tags=("streaming", "sink", "merge", "events"),
)
def streaming_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark = _stream_session(spark)
    import tempfile

    from pyspark.sql import Window

    from ..streaming.ingest import incremental_append, stream_source

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    state = os.path.join(tempfile.gettempdir(), f"asde_fbu_state_{tag}")
    ckpt = os.path.join(tempfile.gettempdir(), f"asde_fbu_ckpt_{tag}")
    shutil.rmtree(state, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        latest = (
            batch_df.groupBy("user_id")
            .agg(
                F.max_by(
                    F.struct("event_type", "sec", "event_id"),
                    F.struct("sec", "event_id"),
                ).alias("s")
            )
            .select(
                "user_id",
                F.col("s.event_type").alias("last_type"),
                F.col("s.sec").alias("last_sec"),
                F.col("s.event_id").alias("last_event_id"),
            )
        )
        if os.path.exists(state):
            cur = sess.read.parquet(state)
            merged = (
                cur.unionByName(latest)
                .groupBy("user_id")
                .agg(
                    F.max_by(
                        F.struct("last_type", "last_sec", "last_event_id"),
                        F.struct("last_sec", "last_event_id"),
                    ).alias("s")
                )
                .select(
                    "user_id",
                    F.col("s.last_type").alias("last_type"),
                    F.col("s.last_sec").alias("last_sec"),
                    F.col("s.last_event_id").alias("last_event_id"),
                )
            )
        else:
            merged = latest
        tmp = state + f"_b{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        old = state + "_old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(state):
            os.rename(state, old)
        os.rename(tmp, state)
        shutil.rmtree(old, ignore_errors=True)

    src = stream_source(
        spark, _write_replay(spark, sf_dir, owner="fbu"), _REPLAY_SCHEMA,
        fmt="parquet", max_files_per_trigger=1,
    )
    q = incremental_append(src, upsert, ckpt)
    _await_drained(q)
    _ = Window  # (imported for symmetry with the oracle's formulation)
    return spark.read.parquet(state)


@register(
    "streaming_quantile_sketch",
    oracle="""
WITH h AS (
  SELECT ((event_id % 2147483648) * 2654435761) % 51200 AS vfix FROM events
),
hist AS (
  SELECT vfix // 200 AS bin, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM h GROUP BY 1
),
cum AS (
  SELECT bin, cnt, CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum
  FROM hist
),
n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM hist),
qs AS (SELECT unnest([500, 900, 950, 990]) AS q_permille),
j AS (
  SELECT q.q_permille, c.bin, c.cnt, c.cum,
         ((q.q_permille * n.n) + 999) // 1000 AS target_rank
  FROM qs q, cum c, n
  WHERE c.cum >= ((q.q_permille * n.n) + 999) // 1000
),
pick AS (SELECT q_permille, MIN(bin) AS bin FROM j GROUP BY 1)
SELECT CAST(p.q_permille AS INT) AS q_permille,
       CAST(j.target_rank AS BIGINT) AS target_rank,
       CAST(p.bin AS INT) AS bin,
       CAST(p.bin * 200 AS BIGINT) AS est_fix,
       j.cnt AS bin_count,
       j.cum AS cum_le
FROM pick p JOIN j ON j.q_permille = p.q_permille AND j.bin = p.bin
""",
    doc="Streaming/batch equivalence #8 — the MERGEABLE-SKETCH path: the "
    "fixed-domain 256-bin histogram (quantile_sketch_binned's state, "
    "but with the domain declared A PRIORI, as a streaming sketch must "
    "be — there is no second pass over a stream to learn min/max) "
    "accumulates across the three-file replay in COMPLETE mode, and "
    "the quantiles read from the drained state must equal the batch "
    "oracle's. This is the property the batch twin claims ('partials "
    "merge by addition') proven under real micro-batched execution: "
    "Spark's stateful HashAggregate IS the sketch merge, batch "
    "boundaries are merge boundaries, and integer bin counts make the "
    "result batching-proof. The binned value is a Knuth-hash surrogate "
    "of event_id (the replay schema carries ids, not amounts) — "
    "deterministic on both engines, uniform over the declared [0, "
    "51200) fixed-point domain; p50/p90/p95/p99 selection over the "
    "256-row drained state is driver-scale arithmetic.",
    tags=("streaming", "sketch", "quantile", "agg"),
)
def streaming_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark = _stream_session(spark)
    from pyspark.sql import Window

    from ..streaming.ingest import stream_source

    src = stream_source(
        spark,
        _write_replay(spark, sf_dir, owner="qsketch"),
        _REPLAY_SCHEMA,
        fmt="parquet",
        max_files_per_trigger=1,
    )
    hist = (
        src.select(
            F.expr(
                "(((event_id % 2147483648) * 2654435761) % 51200) div 200"
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    final = _drain(hist, "complete")
    n = final.agg(F.sum("cnt").cast("bigint").alias("n"))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = final.withColumn("cum", F.sum("cnt").over(w).cast("bigint"))
    qs = F.broadcast(
        spark.range(1).select(
            F.explode(
                F.array(*[F.lit(x) for x in (500, 900, 950, 990)])
            ).alias("q_permille")
        )
    )
    j = (
        cum.crossJoin(F.broadcast(n))
        .join(qs)
        .withColumn(
            "target_rank", F.expr("((q_permille * n) + 999) div 1000")
        )
        .filter(F.col("cum") >= F.col("target_rank"))
    )
    picked = j.groupBy("q_permille").agg(
        F.min("bin").alias("bin"),
        F.min_by("cnt", "bin").alias("bin_count"),
        F.min_by("cum", "bin").alias("cum_le"),
        F.max("target_rank").alias("target_rank"),
    )
    return picked.select(
        F.col("q_permille").cast("int").alias("q_permille"),
        F.col("target_rank").cast("bigint").alias("target_rank"),
        F.col("bin").cast("int").alias("bin"),
        (F.col("bin") * F.lit(200)).cast("bigint").alias("est_fix"),
        F.col("bin_count").cast("bigint").alias("bin_count"),
        F.col("cum_le").cast("bigint").alias("cum_le"),
    )


@register(
    "streaming_cms_heavy_hitters",
    oracle="""
WITH keys AS (SELECT user_id AS k FROM events),
counters AS (
  SELECT 0 AS d, (((k % 2147483647) * 2654435761) % 2147483647) % 4092 % 1024
         AS idx, CAST(COUNT(*) AS BIGINT) AS c FROM keys GROUP BY 2
  UNION ALL
  SELECT 1 AS d, (((k % 2147483647) * 2246822519) % 2147483647) % 4092 % 1024
         AS idx, CAST(COUNT(*) AS BIGINT) AS c FROM keys GROUP BY 2
  UNION ALL
  SELECT 2 AS d, (((k % 2147483647) * 3266489917) % 2147483647) % 4092 % 1024
         AS idx, CAST(COUNT(*) AS BIGINT) AS c FROM keys GROUP BY 2
),
merged AS (SELECT d, idx, CAST(SUM(c) AS BIGINT) AS c FROM counters GROUP BY 1, 2),
exact AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS true_cnt FROM keys GROUP BY 1),
top AS (SELECT k, true_cnt FROM exact ORDER BY true_cnt DESC, k ASC LIMIT 20),
probe AS (
  SELECT k, true_cnt, 0 AS d,
         (((k % 2147483647) * 2654435761) % 2147483647) % 4092 % 1024 AS idx
  FROM top
  UNION ALL
  SELECT k, true_cnt, 1 AS d,
         (((k % 2147483647) * 2246822519) % 2147483647) % 4092 % 1024 AS idx
  FROM top
  UNION ALL
  SELECT k, true_cnt, 2 AS d,
         (((k % 2147483647) * 3266489917) % 2147483647) % 4092 % 1024 AS idx
  FROM top
),
est AS (
  SELECT p.k, p.true_cnt, CAST(MIN(m.c) AS BIGINT) AS cms_est
  FROM probe p JOIN merged m ON m.d = p.d AND m.idx = p.idx
  GROUP BY 1, 2
)
SELECT k AS user_id, true_cnt, cms_est,
       cms_est - true_cnt AS overestimate
FROM est
""",
    doc="Streaming/batch equivalence #9 — heavy hitters over a live "
    "stream: the events table replays as a bounded file stream "
    "(3 time-ordered files, maxFilesPerTrigger=1) and each micro-batch "
    "folds its user_id keys into the SAME depth-3 x width-1024 "
    "count-min grid cms_heavy_hitters builds in batch (identical "
    "multiplicative hashes) — a streaming groupBy on the 3072 "
    "(row, col) cells in complete mode, i.e. fixed 24 KB of state no "
    "matter how long the stream runs, the production shape for "
    "'top talkers right now' dashboards (vs streaming_windowed_dedup's "
    "per-key state, which grows with distinct keys until the "
    "watermark evicts). The drained registers are then probed by the "
    "exact top-20 keys (computed batch-side from the same rows) and "
    "the query reports estimate vs truth per key — the CMS one-sided "
    "guarantee (est >= true) as auditable integers, and the DuckDB "
    "oracle rebuilds the identical grid from the batch table, proving "
    "incremental register folding == one-shot construction (sketch "
    "mergeability, the property that also makes the grid "
    "shard-mergeable at 1000-executor scale).",
    tags=("streaming", "sketch", "heavy-hitters"),
)
def streaming_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark = _stream_session(spark)
    from ..streaming.ingest import stream_source
    from .analytics_ops import _BLOOM_BITS, _BLOOM_HASHES, _CMS_W

    def cms_cells(df):
        cells = [
            F.struct(
                F.lit(d).alias("d"),
                (
                    F.pmod(
                        F.pmod(F.col("k"), F.lit(2147483647)) * F.lit(a),
                        F.lit(2147483647),
                    )
                    % F.lit(_BLOOM_BITS) % F.lit(_CMS_W)
                ).alias("idx"),
            )
            for d, a in enumerate(_BLOOM_HASHES)
        ]
        return df.select("*", F.explode(F.array(*cells)).alias("cell")).select(
            *df.columns, F.col("cell.d").alias("d"), F.col("cell.idx").alias("idx")
        )

    src = stream_source(
        spark,
        _write_replay(spark, sf_dir, owner="cms"),
        _REPLAY_SCHEMA,
        fmt="parquet",
        max_files_per_trigger=1,
    )
    registers = (
        cms_cells(src.select(F.col("user_id").alias("k")))
        .groupBy("d", "idx")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    merged = _drain(registers, "complete")

    keys = t(spark, sf_dir, "events").select(F.col("user_id").alias("k"))
    exact = keys.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("true_cnt"))
    top = exact.orderBy(F.col("true_cnt").desc(), F.col("k").asc()).limit(20)
    est = (
        cms_cells(top)
        .join(merged, ["d", "idx"])
        .groupBy("k", "true_cnt")
        .agg(F.min("c").cast("bigint").alias("cms_est"))
    )
    return est.select(
        F.col("k").alias("user_id"),
        "true_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("true_cnt")).alias("overestimate"),
    )


@register(
    "streaming_drift_tvd",
    oracle=_TVD_ORACLE,  # the batch op's oracle VERBATIM
    doc="Streaming/batch equivalence #10 — the drift monitor run where "
    "it actually runs in production, ON the stream: the replayed event "
    "stream folds per-(event_type, window) counts incrementally "
    "(streaming groupBy, complete mode — state is #types x 2 counters, "
    "fixed at any stream length), the drained counts feed the SAME "
    "exact-integer TVD tail as events_drift_tvd (shared tvd_report "
    "helper), and the DuckDB oracle is the batch op's oracle VERBATIM "
    "— proving stream-folded window counts == batch counts == the "
    "same drift number. The reference/comparison window split is "
    "computed timezone-free from the replay's integer epoch seconds "
    "(days-since-epoch date arithmetic, no session-zone dayofmonth "
    "on an LTZ value — the NTZ trap the hostile-TZ gate exists to "
    "catch).",
    tags=("streaming", "drift", "monitoring"),
)
def streaming_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark = _stream_session(spark)
    from ..streaming.ingest import stream_source
    from .events_ops import tvd_report

    src = stream_source(
        spark,
        _write_replay(spark, sf_dir, owner="drift"),
        _REPLAY_SCHEMA,
        fmt="parquet",
        max_files_per_trigger=1,
    )
    dom = F.dayofmonth(
        F.date_add(F.to_date(F.lit("1970-01-01")), (F.col("sec") / 86400).cast("int"))
    )
    counts = (
        src.select(
            "event_type",
            F.when(dom <= 15, "a").otherwise("b").alias("w"),
        )
        .groupBy("event_type", "w")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    final = _drain(counts, "complete")
    c = final.groupBy("event_type").agg(
        F.sum(F.when(F.col("w") == "a", F.col("k")).otherwise(0))
        .cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("w") == "b", F.col("k")).otherwise(0))
        .cast("bigint").alias("n_b"),
    )
    return tvd_report(c)



from .dedup_ops import LSH_FULL_PAIRS_ORACLE as _LSH_FULL_PAIRS  # noqa: E402


@register(
    "streaming_index_dedup",
    oracle=_LSH_FULL_PAIRS,  # shared with dedup_index_maintained_equiv
    doc="Streaming twin of the PERSISTED incremental dedup index (round-6 "
    "verdict #7): the documents table replays as three mtime-ordered "
    "parquet files (doc_id % 3), a foreachBatch sink maintains the SAME "
    "MinHashDedupIndex the batch gate uses — one apply_batch per "
    "micro-batch, seq = streaming batch_id, per-batch pairs persisted "
    "next to the index — and the answer is the union of every "
    "micro-batch's pairs. Oracle: the from-scratch full-corpus LSH pair "
    "set, shared VERBATIM with dedup_index_maintained_equiv, proving "
    "stream-folded maintenance == batch maintenance == from-scratch. "
    "Exactly-once across restarts: the checkpoint dedupes input files, "
    "and idx.completed(batch_id) skips an epoch whose summaries dir "
    "(the commit marker, written last) already exists — a crashed "
    "epoch's partial writes are overwritten on retry and never read "
    "(committed-batch filtering in _dirs). Restart behavior is pinned "
    "by tests/test_streaming_ledger.py.",
    tags=("streaming", "dedup", "incremental", "index", "sink"),
)
def streaming_index_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark = _stream_session(spark)
    import tempfile

    from ..operators.dedup_index import MinHashDedupIndex
    from ..streaming.ingest import incremental_append, stream_source
    from .util import t_cpu

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tmp = tempfile.gettempdir()
    replay = os.path.join(tmp, f"asde_docs_replay_{tag}")
    root = os.path.join(tmp, f"asde_stream_idx_{tag}")
    ckpt = os.path.join(tmp, f"asde_stream_idx_ckpt_{tag}")
    for d in (replay, root, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    # persist + repartition(1): the coalesce(1) form serialized the
    # whole documents scan into the single writer task, three times
    # (the _write_replay lesson, r11).
    docs = t_cpu(spark, sf_dir, "documents").select("doc_id", "text").persist()
    os.makedirs(replay)
    now = time.time()
    for i in range(3):
        part = os.path.join(replay, f"part_{i}")
        (
            docs.filter(F.col("doc_id") % 3 == i)
            .repartition(1)
            .sortWithinPartitions("doc_id")
            .write.parquet(part)
        )
        for fn in sorted(os.listdir(part)):
            if fn.endswith(".parquet"):
                dst = os.path.join(replay, f"{i:02d}-{fn}")
                os.rename(os.path.join(part, fn), dst)
                os.utime(dst, (now + i, now + i))
        shutil.rmtree(part)
    docs.unpersist()

    idx = MinHashDedupIndex(root)
    pairs_root = os.path.join(root, "pairs")

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty() or idx.completed(batch_id):
            return
        idx.apply_batch(
            batch_df.sparkSession, batch_df, "text", "doc_id",
            seq=batch_id,
            pairs_dir=os.path.join(pairs_root, f"batch_{batch_id:05d}"),
        )

    src = stream_source(
        spark, replay, "doc_id bigint, text string",
        fmt="parquet", max_files_per_trigger=1,
    )
    q = incremental_append(src, apply, ckpt)
    _await_drained(q)
    return spark.read.parquet(f"{pairs_root}/batch_*")


from .similarity_ops import IVF_TOPK_ORACLE as _IVF_TOPK  # noqa: E402
from .similarity_ops import _ivf_centroid_modulus  # noqa: E402


@register(
    "streaming_index_ann",
    oracle=_IVF_TOPK,  # shared with ann_ivf_topk / ann_ivf_incremental_equiv
    doc="Streaming twin of the PERSISTED IVF ANN index (round-7 verdict "
    "#3 — completes IVFIndex's parity with the dedup index): the "
    "embeddings table replays as three mtime-ordered parquet files "
    "(vec_id % 3), a foreachBatch sink maintains the SAME IVFIndex the "
    "batch gates use — one apply_batch per micro-batch, seq = streaming "
    "batch_id, each a |delta| x k broadcast assignment appended to the "
    "inverted lists — and the answer is top-k over the persisted lists "
    "after the drain. Oracle: ann_ivf_topk's from-scratch formulation "
    "VERBATIM, proving stream-folded maintenance == batch maintenance "
    "== from-scratch (assignment is a pure per-vector function of the "
    "fixed centroids, so ANY micro-batch partitioning folds to the "
    "same inverted file). Exactly-once across restarts: the checkpoint "
    "dedupes input files and idx.completed(batch_id) skips an epoch "
    "whose assignments _SUCCESS (job-commit marker) already exists; a "
    "crashed epoch's partial writes are never read (committed-batch "
    "filtering) and the retry overwrites them. Restart behavior is "
    "pinned by tests/test_streaming_ledger.py.",
    tags=("streaming", "similarity", "ivf", "incremental", "index", "sink"),
)
def streaming_index_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark = _stream_session(spark)
    import tempfile

    from ..operators.ann_index import IVFIndex
    from ..streaming.ingest import incremental_append, stream_source
    from .util import t_cpu

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tmp = tempfile.gettempdir()
    replay = os.path.join(tmp, f"asde_emb_replay_{tag}")
    root = os.path.join(tmp, f"asde_stream_ivf_{tag}")
    ckpt = os.path.join(tmp, f"asde_stream_ivf_ckpt_{tag}")
    for d in (replay, root, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    # persist + repartition(1): same single-writer-task scan fix as the
    # documents replay above (r11); v also feeds the centroid seed.
    v = t_cpu(spark, sf_dir, "embeddings").select("vec_id", "embedding").persist()
    os.makedirs(replay)
    now = time.time()
    for i in range(3):
        part = os.path.join(replay, f"part_{i}")
        (
            v.filter(F.col("vec_id") % 3 == i)
            .repartition(1)
            .sortWithinPartitions("vec_id")
            .write.parquet(part)
        )
        for fn in sorted(os.listdir(part)):
            if fn.endswith(".parquet"):
                dst = os.path.join(replay, f"{i:02d}-{fn}")
                os.rename(os.path.join(part, fn), dst)
                os.utime(dst, (now + i, now + i))
        shutil.rmtree(part)

    m = _ivf_centroid_modulus(sf_dir)
    idx = IVFIndex(root).create(
        v.filter(F.col("vec_id") % m == 0), "vec_id", "embedding"
    )
    v.unpersist()

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty() or idx.completed(batch_id):
            return
        idx.apply_batch(
            batch_df.sparkSession, batch_df, "vec_id", "embedding",
            seq=batch_id,
        )

    src = stream_source(
        spark, replay, "vec_id bigint, embedding array<float>",
        fmt="parquet", max_files_per_trigger=1,
    )
    q = incremental_append(src, apply, ckpt)
    _await_drained(q)
    return idx.topk(
        spark,
        t_cpu(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 100 == 0),
        "vec_id", "embedding", k=5, nprobe=2,
    )


def _land_replay_file(df: DataFrame, replay: str, i: int) -> None:
    """Land ``df`` as the ``i``-th mtime-ordered replay file under
    ``replay`` (single parquet file, mtime = now + i so the file source
    feeds micro-batches in landing order with maxFilesPerTrigger=1)."""
    part = os.path.join(replay, f"_part_{i}")
    # repartition(1), not coalesce(1): keep the upstream scan parallel
    # (r11); sort on all columns for a deterministic file byte order.
    df.repartition(1).sortWithinPartitions(*df.columns).write.parquet(part)
    now = time.time()
    for fn in sorted(os.listdir(part)):
        if fn.endswith(".parquet"):
            dst = os.path.join(replay, f"{i:02d}-{fn}")
            os.rename(os.path.join(part, fn), dst)
            os.utime(dst, (now + i, now + i))
    shutil.rmtree(part)


from .dedup_ops import _DELETE_EQUIV_FILTER as _DEL_FILTER  # noqa: E402


@register(
    "streaming_index_dedup_cdc",
    oracle=_LSH_FULL_PAIRS + _DEL_FILTER,
    doc="CDC DELETES through the streaming dedup-index twin (round-9 "
    "verdict #2): the replay is a change stream with op in {I,D} — "
    "three insert epochs land the doc_id % 4 in 0..2 slices, a DELETE "
    "epoch carries op=D tombstones for the doc_id % 5 == 0 slice of "
    "the indexed corpus, and a final insert epoch applies the held-out "
    "% 4 == 3 delta. streaming.cdc.cdc_index_sink routes each epoch: "
    "op=D ids -> idx.delete(seq=batch_id), op=I rows -> apply_batch, "
    "deletes first so an epoch's inserts verify against the "
    "tombstone-filtered corpus. The answer is the FINAL epoch's pairs, "
    "sharing dedup_index_delete_equiv's oracle VERBATIM (from-scratch "
    "full-corpus pairs restricted to delta-touching pairs with no "
    "deleted member) — proving stream-routed retractions == batch "
    "delete == fresh build over survivors. Exactly-once: each half of "
    "an epoch skips independently on its own _SUCCESS marker "
    "(completed / completed_delete), so a redelivered delete epoch is "
    "a no-op and a crashed mixed epoch retries only its uncommitted "
    "half — pinned by test_cdc_delete_epoch_restart_exactly_once.",
    tags=("streaming", "dedup", "incremental", "index", "sink", "delete",
          "cdc"),
)
def streaming_index_dedup_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark = _stream_session(spark)
    import glob as _glob
    import tempfile

    from ..operators.dedup_index import MinHashDedupIndex
    from ..streaming.cdc import cdc_index_sink
    from ..streaming.ingest import incremental_append, stream_source
    from .util import t_cpu

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tmp = tempfile.gettempdir()
    replay = os.path.join(tmp, f"asde_docs_cdc_replay_{tag}")
    root = os.path.join(tmp, f"asde_stream_idx_cdc_{tag}")
    ckpt = os.path.join(tmp, f"asde_stream_idx_cdc_ckpt_{tag}")
    for d in (replay, root, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(replay)

    docs = t_cpu(spark, sf_dir, "documents").select("doc_id", "text")

    def ins(b: int) -> DataFrame:
        return docs.filter(F.col("doc_id") % 4 == b).select(
            F.lit("I").alias("op"), "doc_id", "text"
        )

    dels = docs.filter(
        (F.col("doc_id") % 4 < 3) & (F.col("doc_id") % 5 == 0)
    ).select(
        F.lit("D").alias("op"), "doc_id",
        F.lit(None).cast("string").alias("text"),
    )
    for i, df in enumerate((ins(0), ins(1), ins(2), dels, ins(3))):
        _land_replay_file(df, replay, i)

    idx = MinHashDedupIndex(root)
    pairs_root = os.path.join(root, "pairs")
    apply = cdc_index_sink(
        idx,
        lambda d, seq: idx.apply_batch(
            d.sparkSession, d, "text", "doc_id", seq=seq,
            pairs_dir=os.path.join(pairs_root, f"batch_{seq:05d}"),
        ),
        "doc_id",
    )
    src = stream_source(
        spark, replay, "op string, doc_id bigint, text string",
        fmt="parquet", max_files_per_trigger=1,
    )
    q = incremental_append(src, apply, ckpt)
    _await_drained(q)
    last = sorted(_glob.glob(os.path.join(pairs_root, "batch_*")))[-1]
    return spark.read.parquet(last)


@register(
    "streaming_index_ann_cdc",
    oracle=_IVF_TOPK,  # shared with ann_ivf_topk / ann_ivf_delete_equiv
    doc="CDC DELETES through the streaming IVF-index twin (round-9 "
    "verdict #2, the similarity half): the replay is a change stream "
    "with op in {I,D} — two insert epochs land the real corpus "
    "(vec_id % 2), a third inserts a full set of cosine-1.0 CLONES "
    "(ids offset by max(vec_id)+1, data-derived per the sf1 collision "
    "lesson), and a DELETE epoch retracts every clone. "
    "streaming.cdc.cdc_index_sink routes op=D ids to "
    "idx.delete(seq=batch_id); top-k over the drained index shares "
    "ann_ivf_topk's clone-free from-scratch oracle VERBATIM — sharp, "
    "because one surviving clone would sit at rank 1 of its probe and "
    "shift every true neighbor down. Exactly-once: delete epochs skip "
    "on their own tombstone _SUCCESS marker (completed_delete), "
    "independent of assignment commits — pinned by "
    "test_cdc_delete_epoch_restart_exactly_once.",
    tags=("streaming", "similarity", "ivf", "incremental", "index",
          "sink", "delete", "cdc"),
)
def streaming_index_ann_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark = _stream_session(spark)
    import tempfile

    from ..operators.ann_index import IVFIndex
    from ..streaming.cdc import cdc_index_sink
    from ..streaming.ingest import incremental_append, stream_source
    from .util import t_cpu

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tmp = tempfile.gettempdir()
    replay = os.path.join(tmp, f"asde_emb_cdc_replay_{tag}")
    root = os.path.join(tmp, f"asde_stream_ivf_cdc_{tag}")
    ckpt = os.path.join(tmp, f"asde_stream_ivf_cdc_ckpt_{tag}")
    for d in (replay, root, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(replay)

    v = t_cpu(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    off = v.agg(F.max("vec_id")).first()[0] + 1  # clear of every real id
    clones = v.select(
        (F.col("vec_id") + F.lit(off)).alias("vec_id"), "embedding"
    )

    def as_op(df: DataFrame, op: str) -> DataFrame:
        emb = (
            F.col("embedding") if op == "I"
            else F.lit(None).cast("array<float>")
        )
        return df.select(
            F.lit(op).alias("op"), "vec_id", emb.alias("embedding")
        )

    files = (
        as_op(v.filter(F.col("vec_id") % 2 == 0), "I"),
        as_op(v.filter(F.col("vec_id") % 2 == 1), "I"),
        as_op(clones, "I"),
        as_op(clones, "D"),
    )
    for i, df in enumerate(files):
        _land_replay_file(df, replay, i)

    m = _ivf_centroid_modulus(sf_dir)
    idx = IVFIndex(root).create(
        v.filter(F.col("vec_id") % m == 0), "vec_id", "embedding"
    )
    apply = cdc_index_sink(
        idx,
        lambda d, seq: idx.apply_batch(
            d.sparkSession, d, "vec_id", "embedding", seq=seq
        ),
        "vec_id",
    )
    src = stream_source(
        spark, replay, "op string, vec_id bigint, embedding array<float>",
        fmt="parquet", max_files_per_trigger=1,
    )
    q = incremental_append(src, apply, ckpt)
    _await_drained(q)
    return idx.topk(
        spark, v.filter(F.col("vec_id") % 100 == 0),
        "vec_id", "embedding", k=5, nprobe=2,
    )


@register(
    "dedup_index_lifecycle_e2e",
    oracle=_LSH_FULL_PAIRS + _DEL_FILTER,
    doc="ONE end-to-end lifecycle gate for the maintained dedup index "
    "(round-9 verdict #3 — the composition the ~12 piecewise *_equiv "
    "gates prove separately): a CDC replay streams three insert epochs "
    "(doc_id % 4 in 0..2) and a delete epoch (op=D tombstones for the "
    "doc_id % 5 == 0 slice of the indexed corpus) through "
    "streaming.cdc.cdc_index_sink; the drained index is then COMPACTED "
    "copy-on-write to a fresh root (tombstones applied physically — "
    "asserted: the new generation starts tombstone-free); finally the "
    "held-out % 4 == 3 delta applies as a batch against the compacted "
    "generation. The answer is that final delta's pairs, sharing "
    "dedup_index_delete_equiv's from-scratch oracle VERBATIM: "
    "stream-routed ingest -> CDC retraction -> physical compaction -> "
    "incremental probe must land byte-identical to a fresh build over "
    "the survivors. This is the full production maintenance loop of a "
    "100 TB dedup index in one registered, oracle-gated query.",
    tags=("streaming", "dedup", "incremental", "index", "delete", "cdc",
          "layout", "lifecycle"),
)
def dedup_index_lifecycle_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark = _stream_session(spark)
    import tempfile

    from ..operators.dedup_index import MinHashDedupIndex
    from ..streaming.cdc import cdc_index_sink
    from ..streaming.ingest import incremental_append, stream_source
    from .util import t_cpu

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tmp = tempfile.gettempdir()
    replay = os.path.join(tmp, f"asde_lifec_dedup_replay_{tag}")
    root = os.path.join(tmp, f"asde_lifec_dedup_idx_{tag}")
    croot = os.path.join(tmp, f"asde_lifec_dedup_cmp_{tag}")
    ckpt = os.path.join(tmp, f"asde_lifec_dedup_ckpt_{tag}")
    for d in (replay, root, croot, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(replay)

    docs = t_cpu(spark, sf_dir, "documents").select("doc_id", "text")

    def ins(b: int) -> DataFrame:
        return docs.filter(F.col("doc_id") % 4 == b).select(
            F.lit("I").alias("op"), "doc_id", "text"
        )

    dels = docs.filter(
        (F.col("doc_id") % 4 < 3) & (F.col("doc_id") % 5 == 0)
    ).select(
        F.lit("D").alias("op"), "doc_id",
        F.lit(None).cast("string").alias("text"),
    )
    LAST_PHASE_TIMINGS["dedup_index_lifecycle_e2e"] = {}
    with _phase("dedup_index_lifecycle_e2e", "land_replay"):
        for i, df in enumerate((ins(0), ins(1), ins(2), dels)):
            _land_replay_file(df, replay, i)

    idx = MinHashDedupIndex(root)
    apply = cdc_index_sink(
        idx,
        lambda d, seq: idx.apply_batch(
            d.sparkSession, d, "text", "doc_id", seq=seq
        ),
        "doc_id",
    )
    src = stream_source(
        spark, replay, "op string, doc_id bigint, text string",
        fmt="parquet", max_files_per_trigger=1,
    )
    with _phase("dedup_index_lifecycle_e2e", "replay_drain"):
        q = incremental_append(src, apply, ckpt)
        _await_drained(q)

    with _phase("dedup_index_lifecycle_e2e", "compact"):
        compacted = idx.compact_to(spark, croot)
    assert not compacted._tomb_dirs(), (
        "lifecycle e2e: compaction must apply tombstones physically"
    )
    return compacted.apply_batch(
        spark, docs.filter(F.col("doc_id") % 4 == 3), "text", "doc_id"
    )


@register(
    "ann_index_lifecycle_e2e",
    oracle=_IVF_TOPK,  # shared with ann_ivf_topk and every *_equiv gate
    doc="ONE end-to-end lifecycle gate for the maintained IVF ANN index "
    "(round-9 verdict #3, the similarity half): a CDC replay streams an "
    "insert epoch (vec_id % 2 == 0), an epoch of cosine-1.0 CLONES (ids "
    "offset by max(vec_id)+1 — data-derived per the sf1 collision "
    "lesson), and a delete epoch retracting every clone through "
    "streaming.cdc.cdc_index_sink; the drained index is COMPACTED "
    "copy-on-write (tombstones dropped physically, lists re-laid "
    "hive-partitioned by centroid_id); then the held-out % 2 == 1 half "
    "APPENDS post-compaction with apply_batch(partitioned=True) so the "
    "final probe prunes at the scan of every generation (DPP plan "
    "pinned in tests/test_plan_quality.py); top-k runs against the "
    "compacted+appended index. Oracle: ann_ivf_topk's clone-free "
    "from-scratch formulation VERBATIM — one surviving clone would sit "
    "at rank 1 of its probe, one lost survivor would promote a wrong "
    "neighbor. Ingest -> retraction -> physical reclaim -> partitioned "
    "growth -> pruned probe: the full index lifecycle in one "
    "oracle-gated query.",
    tags=("streaming", "similarity", "ivf", "incremental", "index",
          "delete", "cdc", "layout", "lifecycle"),
)
def ann_index_lifecycle_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark = _stream_session(spark)
    import tempfile

    from ..operators.ann_index import IVFIndex
    from ..streaming.cdc import cdc_index_sink
    from ..streaming.ingest import incremental_append, stream_source
    from .util import t_cpu

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tmp = tempfile.gettempdir()
    replay = os.path.join(tmp, f"asde_lifec_ivf_replay_{tag}")
    root = os.path.join(tmp, f"asde_lifec_ivf_idx_{tag}")
    croot = os.path.join(tmp, f"asde_lifec_ivf_cmp_{tag}")
    ckpt = os.path.join(tmp, f"asde_lifec_ivf_ckpt_{tag}")
    for d in (replay, root, croot, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(replay)

    v = t_cpu(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    off = v.agg(F.max("vec_id")).first()[0] + 1  # clear of every real id
    clones = v.select(
        (F.col("vec_id") + F.lit(off)).alias("vec_id"), "embedding"
    )

    def as_op(df: DataFrame, op: str) -> DataFrame:
        emb = (
            F.col("embedding") if op == "I"
            else F.lit(None).cast("array<float>")
        )
        return df.select(
            F.lit(op).alias("op"), "vec_id", emb.alias("embedding")
        )

    files = (
        as_op(v.filter(F.col("vec_id") % 2 == 0), "I"),
        as_op(clones, "I"),
        as_op(clones, "D"),
    )
    LAST_PHASE_TIMINGS["ann_index_lifecycle_e2e"] = {}
    with _phase("ann_index_lifecycle_e2e", "land_replay"):
        for i, df in enumerate(files):
            _land_replay_file(df, replay, i)

    m = _ivf_centroid_modulus(sf_dir)
    with _phase("ann_index_lifecycle_e2e", "create_index"):
        idx = IVFIndex(root).create(
            v.filter(F.col("vec_id") % m == 0), "vec_id", "embedding"
        )
    apply = cdc_index_sink(
        idx,
        lambda d, seq: idx.apply_batch(
            d.sparkSession, d, "vec_id", "embedding", seq=seq
        ),
        "vec_id",
    )
    src = stream_source(
        spark, replay, "op string, vec_id bigint, embedding array<float>",
        fmt="parquet", max_files_per_trigger=1,
    )
    with _phase("ann_index_lifecycle_e2e", "replay_drain"):
        q = incremental_append(src, apply, ckpt)
        _await_drained(q)

    with _phase("ann_index_lifecycle_e2e", "compact"):
        compacted = idx.compact_to(spark, croot)
    assert compacted.tombstones(spark) is None, (
        "lifecycle e2e: compaction must drop tombstones physically"
    )
    with _phase("ann_index_lifecycle_e2e", "append_partitioned"):
        compacted.apply_batch(
            spark, v.filter(F.col("vec_id") % 2 == 1), "vec_id",
            "embedding", partitioned=True,
        )
    return compacted.topk(
        spark, v.filter(F.col("vec_id") % 100 == 0),
        "vec_id", "embedding", k=5, nprobe=2,
    )
