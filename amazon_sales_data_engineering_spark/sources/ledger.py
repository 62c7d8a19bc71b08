"""Loaded-file ledger: COPY INTO idempotency for Spark.

Snowflake tracks which staged files each table has already COPYed, so
re-running the reference's step_3 is a no-op. Naive Spark appends would
duplicate (SURVEY.md §4.3). The ledger is a small catalog table in the
``audit`` namespace (declared-but-unused in the reference,
/root/reference/Snowflake Worksheets/2. Database and Schema.sql:11):

    audit.load_ledger(target_table string, file_path string, loaded_at ts)

New-file detection is a broadcast left-anti join on ``_metadata.file_path``
— the ledger stays tiny relative to the data (one row per file ever
loaded), so this costs one broadcast regardless of data size. Semantics are
at-least-once under concurrent writers (no transactional catalog here);
pair with downstream dedup or a Delta-backed catalog for exactly-once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LEDGER_TABLE = "audit.load_ledger"


def _ledger_exists(spark: SparkSession) -> bool:
    return spark.catalog.tableExists(LEDGER_TABLE)


def filter_new_files(
    spark: SparkSession, df: DataFrame, target_table: str, file_col: str = "_metadata_file_name"
) -> DataFrame:
    """Drop rows whose source file was already loaded into ``target_table``."""
    if not _ledger_exists(spark):
        return df
    loaded = (
        spark.table(LEDGER_TABLE)
        .filter(F.col("target_table") == target_table)
        .select(F.col("file_path").alias(file_col))
    )
    return df.join(F.broadcast(loaded), [file_col], "left_anti")


def record_loaded_files(
    spark: SparkSession, df: DataFrame, target_table: str, file_col: str = "_metadata_file_name"
) -> None:
    """Append the distinct file paths of ``df`` to the ledger."""
    entry = df.select(
        F.lit(target_table).alias("target_table"),
        F.col(file_col).alias("file_path"),
    ).dropDuplicates(["file_path"]).withColumn(
        "loaded_at", F.current_timestamp().cast("timestamp_ntz")
    )
    entry.write.mode("append").saveAsTable(LEDGER_TABLE)
