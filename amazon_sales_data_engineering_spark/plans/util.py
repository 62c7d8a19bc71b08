"""Shared helpers for query plans."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return table(spark, sf_dir, name)


def ts_lit(df: DataFrame, col: str, value: str) -> Column:
    """Literal cast to the *actual* runtime type of ``df[col]`` (parquet
    timestamps may surface as TIMESTAMP or TIMESTAMP_NTZ depending on
    writer metadata / reader conf) — keeps comparisons pushdown-friendly
    and timezone-independent."""
    return F.lit(value).cast(dict(df.dtypes)[col])
