#!/usr/bin/env python
"""Headline-query benchmark.

Runs every registry query tagged ``bench`` against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``, forcing full execution through the noop sink
(no driver collect). Prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def _run() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from amazon_sales_data_engineering_spark.queries import bench_queries
    from amazon_sales_data_engineering_spark.session import get_spark

    spark = get_spark(app_name="asde-bench")
    spark.sparkContext.setLogLevel("WARN")

    def canary() -> float:
        """Fixed data-independent probe (32-task modular-sum over
        spark.range): measures raw scheduling+compute throughput of THIS
        sitting. Emitted first and last so a contended host is visible
        in the bench JSON itself — round 4 measured a ~1.2x uniform
        inflation from host contention that initially read as a
        regression. Compare canary values across rounds before trusting
        any whole-run ratio."""
        from pyspark.sql import functions as F

        def once() -> float:
            t0 = time.perf_counter()
            (
                spark.range(0, 20_000_000, 1, 32)
                .select((F.col("id") % 7).alias("m"))
                .groupBy("m")
                .count()
                .write.format("noop").mode("overwrite").save()
            )
            return time.perf_counter() - t0

        once()
        return round(min(once(), once()), 4)

    canary_first = canary()
    timings: dict[str, float] = {}
    for name, q in sorted(bench_queries().items()):
        # warm-up once (JIT/codegen/file listing), then best-of-2 measured.
        def run_once() -> float:
            t0 = time.perf_counter()
            q.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        run_once()
        timings[name] = round(min(run_once(), run_once()), 4)

    canary_last = canary()
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "canary_first_sec": canary_first,
                "canary_last_sec": canary_last,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(_run())
