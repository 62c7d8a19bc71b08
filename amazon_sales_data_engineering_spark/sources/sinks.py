"""Table sinks (SURVEY.md §2.1 S14/S15).

``save_table`` = Snowpark ``df.write.save_as_table(name, mode="append")``
(/root/reference/step_4_source_to_curated.py:167-169). The conditional sink
(/root/reference/step_5_curated_to_consumption.py:51-67) guards on count>0
before appending; Spark's ``isEmpty()`` does that without a full count job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def save_table(df: DataFrame, name: str, mode: str = "append") -> None:
    df.write.mode(mode).format("parquet").saveAsTable(name)


def save_table_if_nonempty(df: DataFrame, name: str) -> bool:
    """Append only when there are rows (S15). Returns True if written.
    The isEmpty() probe stops at the first non-empty partition — cheaper
    than the reference's full count() (its count is an accidental extra
    action, SURVEY §2.1 S19)."""
    if df.isEmpty():
        return False
    save_table(df, name)
    return True


def save_table_partitioned(
    df: DataFrame,
    name: str,
    partition_cols: list[str],
    mode: str = "append",
) -> None:
    """Hive-partitioned table sink — the layout the source data itself uses
    (source=/format=/date= dirs, SURVEY §1.4) and the right one for big
    facts: queries filtering on the partition columns prune whole
    directories at plan time (PartitionFilters) instead of reading and
    discarding. Choose low-cardinality, commonly-filtered columns (load
    date, country); high-cardinality partitioning creates a small-file
    explosion at scale."""
    df.write.mode(mode).format("parquet").partitionBy(*partition_cols).saveAsTable(
        name
    )
