"""Surrogate-key generation — the Spark answer to Snowflake sequences.

The reference creates 10 server-side sequences and consumes them with
``NEXTVAL`` on every load (/root/reference/Snowflake Worksheets/3. Source
Tables.sql:6-19, 8. Consumption Layer.sql:9-83; consumed at
step_3_load_from_stage_to_source.py:27,57,87 and
step_5_curated_to_consumption.py:88,178,239,304,363,443,569).

Spark has no sequence object, so two profiles (SURVEY.md §4.3):

- ``dense_keys``: ``row_number()`` over a global window + offset. Gap-free
  and deterministic given a total ordering, but the global window is a
  single-partition exchange — correct at any size, a throughput cliff at
  100 TB. Use for dimensions (small by construction).
- ``unique_keys``: ``monotonically_increasing_id()`` + offset. Fully
  parallel, unique but sparse and non-reproducible across runs. Use for
  facts at scale, where only uniqueness matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dense_keys(
    df: DataFrame, key_col: str, order_by: list[Column | str], start: int = 1
) -> DataFrame:
    """Gap-free surrogate keys: start, start+1, ... in ``order_by`` order.
    Deterministic iff ``order_by`` is a total order. Single-partition window
    — reserve for dimension-sized inputs."""
    w = Window.orderBy(*order_by)
    return df.withColumn(
        key_col, (F.row_number().over(w) + F.lit(start - 1)).cast("bigint")
    )


def unique_keys(df: DataFrame, key_col: str, start: int = 1) -> DataFrame:
    """Unique (not dense) surrogate keys, fully parallel: partition-prefixed
    ids from ``monotonically_increasing_id`` shifted by ``start``."""
    return df.withColumn(
        key_col, (F.monotonically_increasing_id() + F.lit(start)).cast("bigint")
    )


def next_start(spark, table_name: str, key_col: str) -> int:
    """max(existing key) + 1 — the NEXTVAL continuation point for
    incremental loads into an existing table (0-row table → 1)."""
    if not spark.catalog.tableExists(table_name):
        return 1
    row = spark.table(table_name).agg(F.max(key_col).alias("m")).first()
    return int(row["m"] or 0) + 1
