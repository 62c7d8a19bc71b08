#!/usr/bin/env python
"""Dump .explain('formatted') for named queries into plans/r12/<name>_<tag>.txt.

Round-11 verdict "What's wrong #3": checkpoint-terminated operators
(LPA, triangle counts, SSSP, CC) explain as a bare ``Scan ExistingRDD``
— the committed dump showed nothing. This dumper additionally hooks
``operators.graph.PLAN_OBSERVER`` so every iterative round-body frame
handed to the checkpoint is captured PRE-CUT; those inner frames are
appended to the same dump file. Building the round frames requires
running the query's driver loop, so the query is EXECUTED (noop sink)
when --run is passed; without it only the lazily built outer frame(s)
are dumped.

Usage: python tools/dump_r12_plans.py before q1 q2 ...
       python tools/dump_r12_plans.py --run after graph_sssp_weighted
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r12")


def _explain(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> None:
    args = sys.argv[1:]
    run = "--run" in args
    args = [a for a in args if a != "--run"]
    tag, names = args[0], args[1:]
    os.makedirs(OUT, exist_ok=True)
    from amazon_sales_data_engineering_spark.operators import graph
    from amazon_sales_data_engineering_spark.queries import REGISTRY
    from amazon_sales_data_engineering_spark.session import get_spark

    spark = get_spark(app_name="dump-r12-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        captures: list[tuple[str, str]] = []
        graph.PLAN_OBSERVER = (
            lambda t, df: captures.append((t, _explain(df)))
        )
        try:
            df = REGISTRY[name].spark_fn(spark, SF_DIR)
            if run:
                df.write.format("noop").mode("overwrite").save()
            parts = [f"== OUTER FRAME ==\n{_explain(df)}"]
            parts += [
                f"\n\n== INNER ROUND FRAME [{i}] {t} "
                f"(pre-localCheckpoint) ==\n{p}"
                for i, (t, p) in enumerate(captures)
            ]
        finally:
            graph.PLAN_OBSERVER = None
        plan = "\n".join(parts)
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars, "
              f"{len(captures)} inner frames)")
    spark.stop()


if __name__ == "__main__":
    main()
