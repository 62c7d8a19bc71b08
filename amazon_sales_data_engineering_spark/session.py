"""SparkSession factory.

Analogue of the reference's session builders (``get_snowpark_session``,
/root/reference/step_1_check_connection.py:24-36 and
/root/reference/step_3_load_from_stage_to_source.py:117-129) which read
.env config and open a Snowflake session. Here the "warehouse sizing"
(/root/reference/Snowflake Worksheets/1. Setup.sql:3-10) maps to Spark conf.

Defaults are chosen to scale: AQE (runtime coalesce + skew-join), parquet
filter pushdown, Arrow for any pandas interchange, UTC session timezone so
date/timestamp semantics never depend on the host.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 10 MB default is conservative; dims in this workload are tiny and the
    # star joins (SURVEY.md §2.3 J6) should always broadcast.
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    # One shuffle partition per local core; a real cluster overrides this
    # (or relies on AQE coalescing from a higher initial value). r11:
    # derived from $SPARK_GRAFT_CPUS when the harness pins the core
    # count — the bench driver also runs at REDUCED core counts to
    # measure scaling, and a partition count frozen at the full-host
    # value is exactly the "constant tuned for local mode" the
    # optimization contract bans (guide §2.2: partition count should
    # track available parallelism, with AQE coalescing above it).
    "spark.sql.shuffle.partitions": (
        os.environ.get("SPARK_GRAFT_CPUS")
        if str(os.environ.get("SPARK_GRAFT_CPUS", "")).isdigit()
        else str(os.cpu_count() or 32)
    ),
    # Spark's 1g local-mode default heap starves 32 concurrent tasks
    # (aggregate spill-readers alone OOM it on graph-sized shuffles); size
    # the single local JVM like the executor it stands in for. Only takes
    # effect when this factory launches the JVM — a cluster submit's
    # --driver-memory/--executor-memory override it.
    "spark.driver.memory": "8g",
}


def get_spark(
    app_name: str = "amazon-sales-data-engineering-spark",
    master: str | None = None,
    conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    ``SPARK_MASTER`` / ``SPARK_GRAFT_CPUS`` env vars override the master;
    explicit ``conf`` entries override ``DEFAULT_CONF``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = SparkSession.builder.appName(app_name).master(master)
    for key, value in {**DEFAULT_CONF, **(conf or {})}.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
