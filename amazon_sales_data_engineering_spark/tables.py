"""Loaders for the driver's deterministic testdata corpus (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under the sf dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _has_nanos_ts(path: str) -> bool:
    """True if the parquet file stores ``ts`` as TIMESTAMP(NANOS) (checked
    from the footer — cheap, driver-side, no Spark job)."""
    try:
        import pyarrow.parquet as pq

        field = pq.read_schema(path).field("ts")
        return str(getattr(field.type, "unit", "")) == "ns"
    except Exception:
        return False


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Plain parquet scan: Catalyst handles column
    pruning and predicate pushdown from whatever the caller selects."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown testdata table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        return _read_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ``ts`` as TIMESTAMP(NANOS), which Spark's
    vectorized parquet reader rejects ([PARQUET_TYPE_ILLEGAL]). Public
    escape hatch: read nanos as raw int64
    (``spark.sql.legacy.parquet.nanosAsLong``) and rebuild a
    TIMESTAMP_NTZ with pure integer arithmetic — truncate nanos→micros
    (floor, matching DuckDB's TIMESTAMP_NS→µs behavior) and add the epoch
    offset as day-time intervals. No timezone enters at any point, so the
    result is identical under any session timezone."""
    path = f"{sf_dir}/events.parquet"
    if not _has_nanos_ts(path):
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes)["ts"] != "bigint":
        return df  # conf ignored → reader handled nanos natively
    us = F.expr("ts div 1000")
    secs = us - (us % F.lit(1_000_000))
    rem_us = us % F.lit(1_000_000)
    zero = F.lit(0)
    ntz = (
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        + F.make_dt_interval(zero, zero, zero, (secs / F.lit(1_000_000)).cast("decimal(18,0)"))
        + F.make_dt_interval(zero, zero, zero, (rem_us / F.lit(1_000_000.0)).cast("decimal(16,6)"))
    )
    return df.withColumn("ts", ntz)
