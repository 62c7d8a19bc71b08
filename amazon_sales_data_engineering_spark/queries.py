"""Public query surface: the registry plus the flagship query."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .plans import REGISTRY, Query  # noqa: F401  (re-export)

FLAGSHIP = "star_join_enriched"


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end showcase: full star-join assembly + rollup."""
    return REGISTRY[FLAGSHIP].spark_fn(spark, sf_dir)


def bench_queries() -> dict[str, Query]:
    return {name: q for name, q in REGISTRY.items() if q.bench}
