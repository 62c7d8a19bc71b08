"""Shared helpers for query plans."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return table(spark, sf_dir, name)


def t_cpu(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Table scan for CPU-bound downstream chains (regex/shingle/hash over
    text). A small table arrives as one input split, which would pin the
    whole narrow chain to one core; repartition up to the cluster's
    parallelism ONLY in that case. At scale (thousands of splits) this is
    a no-op — no shuffle is added."""
    df = table(spark, sf_dir, name)
    target = spark.sparkContext.defaultParallelism
    # len(inputFiles) is a metadata-only proxy for split count — unlike
    # df.rdd.getNumPartitions() it doesn't force an RDD conversion at
    # plan-build time. Small tables are single-file, which is exactly the
    # under-parallelized case this guards.
    if len(df.inputFiles()) < target:
        return df.repartition(target)
    return df


def ts_lit(df: DataFrame, col: str, value: str) -> Column:
    """Literal cast to the *actual* runtime type of ``df[col]`` (parquet
    timestamps may surface as TIMESTAMP or TIMESTAMP_NTZ depending on
    writer metadata / reader conf) — keeps comparisons pushdown-friendly
    and timezone-independent."""
    return F.lit(value).cast(dict(df.dtypes)[col])
