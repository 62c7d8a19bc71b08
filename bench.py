#!/usr/bin/env python
"""Headline-query benchmark.

Runs every registry query tagged ``bench`` against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``, forcing full execution through the noop sink
(no driver collect). Prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``

Besides wall-clock the line carries ``plan_metrics`` — per-query SHUFFLE
WRITE BYTES/RECORDS and SCAN BYTES/RECORDS summed from the Spark stage
API over the final measured execution (round-7 verdict #6). Wall-clock
on a shared host swings ±20% with contention (the round-7 variance
saga: 44-50s sittings that A/B-flipped against the same code); the
plan-cost numbers are DETERMINISTIC for a fixed plan and data, so a
plan regression (lost pushdown, broadcast fell back to shuffle, an
extra exchange) is detectable from ONE run on a noisy host:
``python tools/bench_gate.py BENCH_rPREV.json <new>.json`` diffs them.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import urllib.request


def _stages(spark) -> list[dict]:
    """Completed stages from the local UI's REST API ([] if the UI is
    off or unreachable — plan metrics then degrade to absent, never
    wrong)."""
    base = spark.sparkContext.uiWebUrl
    if not base:
        return []
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    try:
        with urllib.request.urlopen(url, timeout=10) as r:
            return json.loads(r.read())
    except Exception:  # noqa: BLE001
        return []


def _max_stage_id(spark) -> int:
    return max((s["stageId"] for s in _stages(spark)), default=-1)


def _metrics_since(spark, watermark: int) -> dict[str, int] | None:
    new = [s for s in _stages(spark) if s["stageId"] > watermark]
    if not new:
        return None
    return {
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in new),
        "shuffle_write_records": sum(
            s.get("shuffleWriteRecords", 0) for s in new
        ),
        "input_bytes": sum(s.get("inputBytes", 0) for s in new),
        "input_records": sum(s.get("inputRecords", 0) for s in new),
        "n_stages": len(new),
    }


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
    plan_metrics: dict[str, dict] = {}
    for name, q in sorted(bench_queries().items()):
        # warm-up once (JIT/codegen/file listing), then best-of-2 measured.
        def run_once() -> float:
            t0 = time.perf_counter()
            q.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        run_once()
        t1 = run_once()
        # plan metrics from exactly the FINAL execution: stage-id
        # watermark before, stage-sum after (AQE replans identically on
        # identical data/conf, so these are per-plan constants)
        w = _max_stage_id(spark)
        t2 = run_once()
        timings[name] = round(min(t1, t2), 4)
        pm = _metrics_since(spark, w)
        if pm is not None:
            plan_metrics[name] = pm

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
                "plan_metrics": plan_metrics,
                "plan_totals": {
                    k: sum(pm[k] for pm in plan_metrics.values())
                    for k in (
                        "shuffle_write_bytes",
                        "shuffle_write_records",
                        "input_bytes",
                        "input_records",
                    )
                }
                if plan_metrics
                else {},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(_run())
