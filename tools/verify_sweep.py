#!/usr/bin/env python
"""Driver-contract verification sweep (see .claude/skills/verify/SKILL.md).

Simulates the external driver: a VANILLA SparkSession (not
session.get_spark()) in a hostile timezone, comparing every registered
query against its DuckDB oracle at sf0.01 (row count + schema +
order-insensitive value hash — the exact gate comparison).

Usage:
    python tools/verify_sweep.py            # full sweep (~1-2 min)
    python tools/verify_sweep.py name1 ...  # only the named queries
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings"


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e
    from tests.oracle_util import compare

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    duck = duckdb.connect()
    for tb in TABLES.split():
        p = f"{SF_DIR}/{tb}.parquet"
        if os.path.isdir(p):  # Spark-written table = directory of parts
            p = f"{p}/*.parquet"
        if os.path.exists(f"{SF_DIR}/{tb}.parquet"):
            duck.sql(f"CREATE VIEW {tb} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = e.queries(), e.oracle_sql()
    names = sys.argv[1:] or sorted(qs)
    df = e.entry(spark)
    assert df.count() >= 0, "entry() returned no result"

    failed: list[str] = []
    for name in names:
        t0 = time.perf_counter()
        try:
            if name not in oracles:
                n = qs[name](spark, SF_DIR).count()
                print(f"  rows-only {name}: {n} rows", flush=True)
                continue
            compare(qs[name](spark, SF_DIR), duck, oracles[name])
            print(f"  ok {name} ({time.perf_counter() - t0:.1f}s)", flush=True)
        except Exception as ex:  # noqa: BLE001
            failed.append(name)
            print(f"  FAIL {name}: {ex}", flush=True)
    print(f"{len(names) - len(failed)}/{len(names)} green; failed: {failed}")
    if not sys.argv[1:]:
        # Full sweep: journal per-query verdicts so COVERAGE.md's sweep
        # column reflects the latest local gate run, not just the
        # (sampled, possibly stale) driver rounds.
        import json

        with open(os.path.join(os.path.dirname(__file__), "..",
                               "SWEEP_RESULTS.json"), "w") as fh:
            json.dump(
                {n: {"ok": n not in failed} for n in names},
                fh, indent=0, sort_keys=True,
            )
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
