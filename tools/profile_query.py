#!/usr/bin/env python
"""Profile one (or more) registry queries via the live UI REST API.

Runs each named query through the noop sink (warm-up + measured run,
same protocol as bench.py), then pulls the EXECUTED plan graph from
``/api/v1/applications/{app}/sql`` — the only place the *final* AQE
plan and per-node metrics (rows, data size, time in exchange/join/agg
nodes) are visible, since ``explain()`` on checkpoint-terminated
operators shows just ``Scan ExistingRDD`` (r11 verdict "What's wrong
#3"). Prints, per SQL execution inside the measured run:

- wall duration and description;
- every plan node with its non-zero metrics, indented by graph depth.

Usage: python tools/profile_query.py QUERY [QUERY...] [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}", timeout=20) as r:
        return json.loads(r.read())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--max-nodes", type=int, default=200)
    args = ap.parse_args()

    from amazon_sales_data_engineering_spark.plans import REGISTRY
    from amazon_sales_data_engineering_spark.session import get_spark

    spark = get_spark(app_name="asde-profile")
    spark.sparkContext.setLogLevel("WARN")
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    for name in args.queries:
        q = REGISTRY[name]

        def run() -> float:
            t0 = time.perf_counter()
            q.spark_fn(spark, args.sf).write.format("noop").mode(
                "overwrite").save()
            return time.perf_counter() - t0

        if not args.no_warmup:
            spark.sparkContext.setJobDescription(f"profile-warmup {name}")
            run()
        before = {e["id"] for e in _get(
            base, f"/api/v1/applications/{app}/sql?length=10000")}
        spark.sparkContext.setJobDescription(f"profile {name}")
        wall = run()
        spark.sparkContext.setJobDescription(None)
        execs = [e for e in _get(
            base,
            f"/api/v1/applications/{app}/sql?details=true"
            f"&planDescription=false&length=10000")
            if e["id"] not in before]
        print(f"\n===== {name}: wall {wall:.3f}s, "
              f"{len(execs)} SQL execution(s) =====")
        for e in sorted(execs, key=lambda x: x["id"]):
            print(f"\n-- exec {e['id']}: {e.get('duration', 0)/1000.0:.3f}s "
                  f"{e.get('description', '')[:100]!r}")
            nodes = e.get("nodes") or []
            for n in nodes[: args.max_nodes]:
                metrics = {
                    m["name"]: m["value"]
                    for m in n.get("metrics", [])
                    if m.get("value") not in ("", "0", None)
                }
                if not metrics and n["nodeName"].startswith(
                        ("WholeStageCodegen", "InputAdapter")):
                    continue
                compact = ", ".join(
                    f"{k}={v}" for k, v in list(metrics.items())[:8])
                print(f"   [{n['nodeId']:>3}] {n['nodeName'][:60]:60s} "
                      f"{compact[:160]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
