#!/usr/bin/env python
"""Fixed-delta maintenance-cost probe for the persisted dedup index
(round-6 verdict #1 part b): apply the SAME 200-doc delta to a
maintained MinHashDedupIndex built over the sf0.1 corpus and over the
10x sf1 corpus. If maintenance cost scales with the delta (the design
claim), the two wall-clocks are comparable; a from-scratch rebuild
would show ~10x. Prints one JSON line:

    {"probe": {"index_delta_apply": {"sf0.1": s, "sf1": s,
               "ratio": r, "build_sf0.1": s, "build_sf1": s,
               "pairs_sf0.1": n, "pairs_sf1": n}}}

Usage: python tools/index_delta_probe.py   (builds /tmp/asde_sf1 via
tools/scale_probe.py machinery if missing)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import DST, SRC, build_sf1  # noqa: E402


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from amazon_sales_data_engineering_spark.operators.dedup_index import (
        MinHashDedupIndex,
    )
    from amazon_sales_data_engineering_spark.plans.util import t_cpu

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(DST):
        build_sf1(spark)

    # The delta is IDENTICAL at both scales: the 200 lowest-id sf0.1
    # docs, re-labelled far above any corpus id (uniqueness contract).
    delta_src = (
        t_cpu(spark, SRC, "documents")
        .orderBy("doc_id")
        .limit(200)
        .select((F.col("doc_id") + 1_000_000_000).alias("doc_id"), "text")
        .localCheckpoint(eager=True)
    )

    # The tombstone set is also IDENTICAL at both scales: 200 ids from
    # the indexed corpus's low range (delete cost must scale with
    # |tombstones|, never |corpus| — round-7 verdict #1's delete probe).
    tomb_ids = list(range(0, 2000, 10))

    out: dict[str, dict] = {"index_delta_apply": {}, "index_delete": {}}
    row = out["index_delta_apply"]
    drow = out["index_delete"]
    for label, sf_dir in (("sf0.1", SRC), ("sf1", DST)):
        root = os.path.join(tempfile.gettempdir(), f"asde_idx_probe_{label}")
        shutil.rmtree(root, ignore_errors=True)
        idx = MinHashDedupIndex(root)
        t0 = time.monotonic()
        idx.apply_batch(
            spark, t_cpu(spark, sf_dir, "documents"), "text", "doc_id"
        ).count()
        row[f"build_{label}"] = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        n = idx.apply_batch(spark, delta_src, "text", "doc_id").count()
        row[label] = round(time.monotonic() - t0, 2)
        row[f"pairs_{label}"] = n
        # fixed 200-id tombstone batch: one tiny parquet write,
        # independent of how much index state sits under the root
        t0 = time.monotonic()
        idx.delete(spark, tomb_ids)
        drow[label] = round(time.monotonic() - t0, 2)
    row["ratio"] = round(row["sf1"] / max(row["sf0.1"], 1e-9), 2)
    drow["ratio"] = round(drow["sf1"] / max(drow["sf0.1"], 1e-9), 2)
    print(json.dumps({"probe": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
