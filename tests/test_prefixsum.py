"""Unit tests for operators.prefixsum — the distributed scan primitives.

The consumers (orders_open_backlog, score_auc_exact, parts_skyline_2d, …)
are oracle-gated end-to-end; these tests pin the primitives themselves
against the single-window reference on adversarial shapes: duplicate
order keys, skewed value runs, and bucket counts that force both the
one-bucket degenerate case and fence-straddling splits.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from amazon_sales_data_engineering_spark.operators.prefixsum import (
    distributed_cummax,
    distributed_cumsum,
)


def _corpus(spark, seed: int, n: int = 500):
    rng = random.Random(seed)
    rows = [
        # duplicate-heavy order keys (k % 37) exercise ties-at-fences;
        # id is the unique tiebreak.
        (i, rng.randrange(37), rng.randrange(-50, 1000))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id INT, k INT, v INT")


@pytest.mark.parametrize("n_buckets", [1, 4, 16])
def test_cummax_inclusive_matches_single_window(spark, n_buckets):
    df = _corpus(spark, seed=n_buckets)
    got = distributed_cummax(
        df, order_col="k", value_col="v", tiebreak=[F.col("id")],
        n_buckets=n_buckets, out_col="m", inclusive=True,
    )
    w = Window.orderBy("k", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("m", F.max("v").over(w))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


@pytest.mark.parametrize("n_buckets", [1, 4, 16])
def test_cummax_exclusive_matches_single_window(spark, n_buckets):
    df = _corpus(spark, seed=100 + n_buckets)
    got = distributed_cummax(
        df, order_col="k", value_col="v", tiebreak=[F.col("id")],
        n_buckets=n_buckets, out_col="m", inclusive=False,
    )
    w = Window.orderBy("k", "id").rowsBetween(Window.unboundedPreceding, -1)
    want = df.withColumn("m", F.max("v").over(w))
    # First row of the global order: NULL on both sides.
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.filter(F.col("m").isNull()).count() == 1


def test_cummax_exclusive_unique_keys_strict_prefix(spark):
    # The skyline contract: with UNIQUE order keys, exclusive cummax is
    # the max over strictly-smaller keys.
    rows = [(k, (k * 7919) % 101) for k in range(200)]
    df = spark.createDataFrame(rows, "k INT, v INT")
    got = {
        r["k"]: r["m"]
        for r in distributed_cummax(
            df, order_col="k", value_col="v", tiebreak=[],
            n_buckets=8, out_col="m", inclusive=False,
        ).collect()
    }
    best = None
    for k, v in rows:  # rows generated in ascending-k order
        assert got[k] == best, f"k={k}"
        best = v if best is None else max(best, v)


def test_cumsum_matches_single_window(spark):
    df = _corpus(spark, seed=7)
    got = distributed_cumsum(
        df, order_col="k", value_col="v", tiebreak=[F.col("id")],
        n_buckets=4, out_col="c",
    )
    w = Window.orderBy("k", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn(
        "c", F.sum(F.col("v").cast("decimal(28,6)")).over(w)
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_distributed_lead_matches_global(spark):
    from amazon_sales_data_engineering_spark.operators.prefixsum import (
        distributed_lead,
    )

    df = spark.range(200).selectExpr(
        "cast(id * 13 % 211 as bigint) as v"
    ).distinct()
    vals = sorted(r.v for r in df.collect())
    expected = {
        v: (vals[i + 1] if i + 1 < len(vals) else None)
        for i, v in enumerate(vals)
    }
    for nb in (1, 4, 16, 64):
        out = distributed_lead(df, "v", n_buckets=nb, out_col="nxt").collect()
        assert len(out) == len(vals)
        assert all(expected[r.v] == r.nxt for r in out), nb
