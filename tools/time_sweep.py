#!/usr/bin/env python
"""Spark-only wall timing of registry queries at an arbitrary SF.

Measurement aid for the r11 optimization round (guide §1): times each
named query (default: EVERY registry query) through the noop sink in one
long-lived JVM — no DuckDB oracle, no warm-up, one run per query — and
writes ``{"name": sec, ...}`` JSON to --out. The point is triage (find
the wall hogs outside the bench set), not a benchmark: single-run walls
on a shared host carry ±20% noise, so anything flagged here gets a
proper same-sitting A/B before and after a change.

Usage:
    python tools/time_sweep.py --out /tmp/times.json [name1 name2 ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/time_sweep.json")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from amazon_sales_data_engineering_spark.plans import REGISTRY
    from amazon_sales_data_engineering_spark.session import get_spark

    names = args.names or sorted(REGISTRY)
    missing = [n for n in names if n not in REGISTRY]
    assert not missing, f"not in registry: {missing}"

    spark = get_spark(app_name="asde-time-sweep")
    spark.sparkContext.setLogLevel("WARN")

    out: dict[str, float] = {}
    for i, name in enumerate(names):
        spark.sparkContext.setJobDescription(f"time_sweep: {name}")
        t0 = time.perf_counter()
        err = None
        try:
            (REGISTRY[name].spark_fn(spark, args.sf_dir)
             .write.format("noop").mode("overwrite").save())
        except Exception as e:  # noqa: BLE001 — triage tool, record and go on
            err = f"{type(e).__name__}: {e}"
        sec = round(time.perf_counter() - t0, 3)
        out[name] = sec
        print(f"[{i + 1}/{len(names)}] {name}: {sec}s"
              + (f" ERR {err[:200]}" if err else ""), flush=True)
        if err:
            out[name + "__err"] = err[:500]
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    spark.stop()
    print(f"total {round(sum(v for k, v in out.items() if not k.endswith('__err')), 1)}s over {len(names)} queries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
