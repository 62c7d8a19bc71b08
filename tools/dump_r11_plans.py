#!/usr/bin/env python
"""Dump .explain('formatted') for named queries into plans/r11/<name>_<tag>.txt.

Usage: python tools/dump_r11_plans.py before q1_pricing_summary q3_...
       python tools/dump_r11_plans.py after  q1_pricing_summary ...
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r11")


def main() -> None:
    tag, names = sys.argv[1], sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    from amazon_sales_data_engineering_spark.queries import REGISTRY
    from amazon_sales_data_engineering_spark.session import get_spark

    spark = get_spark(app_name="dump-r11-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].spark_fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
