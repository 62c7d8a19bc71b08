"""Streaming ingest: file sources, watermarked window aggs, foreachBatch.

Batch twins live in ``plans.events_ops`` (hourly agg) and
``pipeline.ingest`` (ledger-idempotent loads). At scale the file source
tracks seen files in the checkpoint (the streaming equivalent of the batch
loaded-file ledger), watermarks bound state store size, and the windowed
agg is a map-side-partial shuffle exactly like its batch twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

DEFAULT_WATERMARK = "1 hour"


def stream_source(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """File-source ``readStream`` over a directory. Schema is mandatory for
    streaming file sources (no inference at plan time); reader options mirror
    the batch presets in ``sources.readers``."""
    r = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    for k, v in (options or {}).items():
        r = r.option(k, v)
    return r.load(path)


def hourly_agg_stream(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Watermarked tumbling 1-hour window agg — the streaming twin of
    ``events_hourly_agg``. Append-mode output: a window row is emitted once,
    when the watermark passes its end (late rows beyond the watermark are
    dropped, the streaming trade-off the batch twin doesn't have)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("hour_ts"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def incremental_append(
    stream_df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
) -> "DataFrame":
    """``foreachBatch`` incremental load: each micro-batch runs ``batch_fn``
    (e.g. the batch pipeline's curated transform + delta load). The
    checkpoint tracks processed files — restarting the query re-processes
    nothing, which is the streaming form of the batch ledger's idempotency
    (SURVEY.md §4.3 COPY idempotency)."""
    return (
        stream_df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_available_now(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "append",
    timeout_sec: int = 120,
) -> list[Row]:
    """Drain a bounded stream through a memory sink with AvailableNow and
    return the emitted rows. Test/dev helper — watermarks advance between
    micro-batches exactly as in a live run."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        drained = q.awaitTermination(timeout_sec)
        assert drained, (
            f"stream did not drain within {timeout_sec}s — rows read "
            "now would reflect a partially replayed input"
        )
    finally:
        q.stop()
    spark = stream_df.sparkSession
    return spark.table(query_name).collect()


def windowed_distinct_stream(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Watermarked EXACT distinct users per tumbling hour — the streaming
    twin of the batch sliding/exact-distinct profile. Two stateful steps,
    both watermark-bounded: ``dropDuplicates`` on (window, user) keeps one
    state row per distinct pair until the watermark passes, and the window
    count then aggregates the survivors — so state is O(distinct users per
    open window), not O(events). The dedup key MUST be the ``window()``
    column, not a derived ``date_trunc`` hour: window columns retain the
    event-time/watermark metadata, so StreamingDeduplicate actually evicts
    expired pairs (a plain derived column would accumulate all-time state).
    At unbounded user cardinality the right tool is approx_count_distinct
    (sketch state, constant size); this is the exactness profile for
    bounded windows."""
    return (
        events.withWatermark(ts_col, watermark)
        .select(F.window(F.col(ts_col), "1 hour").alias("win"), F.col("user_id"))
        .dropDuplicates(["win", "user_id"])
        .groupBy("win")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.col("win.start").alias("hour_ts"), "n_users")
    )
