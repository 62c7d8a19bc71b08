"""Driver-gated streaming queries: batch-equivalence proofs.

The ``streaming/`` twins are exercised by pytest with synthetic bounded
streams; this module closes the loop with the external correctness gate by
replaying a REAL testdata table through the actual Structured Streaming
path (file source -> watermark -> stateful operator -> AvailableNow drain)
and oracling the final table against plain batch SQL.

Determinism: the replay is split into three time-ordered files (ascending
mtimes, so the file source feeds micro-batches in event-time order and the
watermark genuinely advances between batches without ever declaring a
not-yet-seen row late), and the streamed operator is a DEDUPLICATION —
its append-mode output is the set of first-seen keys, which is the same
row set regardless of how the input was micro-batched. An aggregation
would instead couple emission to watermark passage (the final open window
never emits in append mode); dedup sidesteps that while still driving
StreamingDeduplicate state + eviction for real.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register
from .util import t


def _replay_dir(sf_dir: str) -> str:
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return os.path.join(tempfile.gettempdir(), f"asde_stream_replay_{tag}")


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
    # Integer epoch seconds end-to-end: TZ-proof (watermarks demand an LTZ
    # event-time column, and epoch seconds -> timestamp_seconds() is an
    # absolute instant, immune to the session timezone — an NTZ wall clock
    # or LTZ literal would shift under the hostile-TZ gate).
    sec = F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    e = t(spark, sf_dir, "events").select(
        "event_id", "user_id", sec.alias("sec")
    )
    lo, hi = e.agg(F.min("sec"), F.max("sec")).first()
    b1 = lo + (hi - lo) // 3
    b2 = lo + 2 * (hi - lo) // 3

    base = _replay_dir(sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    s = F.col("sec")
    slices = [s < b1, (s >= b1) & (s < b2), s >= b2]
    for i, pred in enumerate(slices):
        e.filter(pred).coalesce(1).write.parquet(f"{base}/b{i}")
    flat = f"{base}/flat"
    os.makedirs(flat)
    now = time.time()
    for i in range(len(slices)):
        for f in sorted(os.listdir(f"{base}/b{i}")):
            if f.endswith(".parquet"):
                dst = f"{flat}/{i:02d}-{f}"
                os.rename(f"{base}/b{i}/{f}", dst)
                # file-source batch order follows modification time
                os.utime(dst, (now + i, now + i))

    from ..streaming.ingest import stream_source

    src = stream_source(
        spark,
        flat,
        "event_id bigint, user_id bigint, sec bigint",
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
    qname = f"streaming_windowed_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
    return spark.table(qname)
