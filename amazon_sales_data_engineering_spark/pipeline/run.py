"""End-to-end pipeline driver (reference steps 2→5 in one call).

The reference runs five sequential scripts against a remote warehouse; here
one function takes raw files to the star schema on the Spark catalog.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..sources.readers import forex_table
from ..sources.sinks import save_table
from .config import ensure_namespaces
from .consumption import run_consumption
from .curated import run_curated
from .ingest import ingest_all


def load_forex(spark: SparkSession, data_root: str, faithful: bool = True) -> None:
    fx = forex_table(spark, f"{data_root}/exchange-rate-data.csv", faithful)
    save_table(fx, "common.exchange_rate", mode="overwrite")


def run_pipeline(
    spark: SparkSession,
    data_root: str,
    faithful: bool = True,
    dense_fact_keys: bool = True,
    incremental: bool = False,
) -> dict[str, int]:
    """raw files → source → curated → consumption. Returns per-country
    loaded-file counts (0s on a re-run — ledger idempotency).

    ``incremental=True`` makes the curated and fact appends high-water-mark
    guarded, so the pipeline can be re-run as new files arrive without
    duplicating earlier rows (the reference re-run duplicates, §2.11.8).
    Pair with ``faithful=False``; surrogate keys stay dense but their exact
    values depend on batch boundaries, as with warehouse sequences."""
    ensure_namespaces(spark)
    load_forex(spark, data_root, faithful)
    loaded = ingest_all(spark, data_root)
    if any(loaded.values()):
        run_curated(spark, faithful, incremental)
        run_consumption(spark, faithful, dense_fact_keys, incremental)
    return loaded
