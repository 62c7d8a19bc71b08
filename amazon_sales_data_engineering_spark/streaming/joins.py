"""Streaming joins: stream-static enrichment and watermarked
stream-stream attribution.

Completes the Structured Streaming surface (SURVEY.md §2.9 extensions)
with the two join shapes every event pipeline needs:

- **Stream-static**: enrich each micro-batch with a dimension table. The
  static side is planned per micro-batch (so a refreshed dim parquet is
  picked up on the next trigger) and broadcast when small — identical to
  the batch star join's dim broadcast, paid per trigger instead of per
  query. Stateless: no watermark needed, no state store.
- **Stream-stream**: event-time attribution (e.g. purchase ← click
  within an hour, same user). BOTH sides carry watermarks and the join
  predicate bounds event time on BOTH ends; that pair of constraints is
  what lets Spark evict state — click state older than the attribution
  window + watermark is dropped, so state is O(window), not O(stream).
  Without the time bound the state store grows forever: this module
  refuses to build that join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static join: per-micro-batch dimension enrichment.

    ``dim`` must be a batch DataFrame (static side); Spark broadcasts it
    under the session's auto-broadcast threshold. Left join by default:
    an unmatched event passes through with NULL dims rather than being
    dropped mid-stream."""
    if dim.isStreaming:
        raise ValueError("dim must be a static DataFrame (got a stream)")
    return stream.join(F.broadcast(dim), on, how)


def attribute_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    attribution_window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: each purchase attributed to every click
    by the same ``key`` within ``attribution_window`` BEFORE it.

    Both inputs must be streams; both get the same watermark, and the
    join condition bounds purchase time to [click.ts, click.ts + window]
    — the two-sided constraint Structured Streaming needs to bound the
    state store (clicks are evicted once the purchase-side watermark
    passes click.ts + window)."""
    if not (clicks.isStreaming and purchases.isStreaming):
        raise ValueError("attribute_stream needs two streaming DataFrames")
    c = clicks.select(
        F.col(key).alias("c_key"),
        F.col("event_id").alias("click_id"),
        F.col(ts_col).alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col(key).alias("p_key"),
        F.col("event_id").alias("purchase_id"),
        F.col(ts_col).alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_key") == F.col("p_key"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {attribution_window}")
        )
    )
    return c.join(p, cond, "inner").select(
        F.col("c_key").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )
