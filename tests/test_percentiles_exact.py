"""Equivalence gate for operators.percentiles: the histogram-based
exact discrete percentiles must match Spark's ``percentile_disc``
bit-for-bit on every adversarial shape that could split the two —
ties, fence-grazing p*n products, negative values, single rows,
all-equal columns, NULLs, and IEEE-double edge values.

Selection rule under test (confirmed empirically against Spark 4.1's
PercentileDisc over these same cases): the fence is the 1-based
``sorted[max(ceil(p * n), 1)]`` element, where ``p * n`` and ``ceil``
are IEEE double ops — the operator reproduces the rule via
``cum_count(v) >= ceil(p * n)`` over the value histogram.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from amazon_sales_data_engineering_spark.operators.percentiles import (
    collect_disc_percentiles,
    grouped_disc_percentile,
    grouped_disc_percentile_bucketed,
)

PS = [0.1, 0.25, 1 / 3, 0.5, 0.6, 2 / 3, 0.75, 0.9, 0.999, 1.0]


def _spark_disc(spark, df, col, ps):
    row = df.agg(
        *[
            F.expr(
                f"percentile_disc({p!r}) WITHIN GROUP (ORDER BY {col})"
            ).alias(f"f{i}")
            for i, p in enumerate(ps)
        ]
    ).collect()[0]
    return [row[f"f{i}"] for i in range(len(ps))]


CASES = {
    # n chosen so p*n grazes integers for several p in PS (e.g. 0.1*10,
    # 0.5*10, 1/3*9, 0.25*8) — the ceil-boundary class.
    "ties_heavy": [1.0] * 5 + [2.0] * 3 + [3.0] * 2,
    "all_equal": [7.5] * 9,
    "single": [42.0],
    "two": [-1.0, 1.0],
    "negative_money": [-10.01, -0.01, 0.0, 0.01, 10.01, -10.01, 0.01, 0.0],
    "cents_grid": [round(c / 100, 2) for c in range(-250, 251, 7)],
    "ieee_edges": [0.1, 0.2, 0.3, 0.1 + 0.2, 1e-308, 1e308, -1e308, 0.0,
                   -0.0, 2.0 ** 53, 2.0 ** 53 + 2],
}
_rng = random.Random(11)
CASES["uniform_60"] = [_rng.uniform(-1e6, 1e6) for _ in range(60)]
CASES["zipf_ties"] = [float(min(int(_rng.paretovariate(1.1)), 50))
                      for _ in range(97)]


@pytest.mark.parametrize("name", sorted(CASES))
def test_collect_matches_percentile_disc(spark, name):
    vals = CASES[name]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = collect_disc_percentiles(df, "v", PS)
    want = _spark_disc(spark, df, "v", PS)
    assert got == want, f"{name}: {got} != {want}"


def test_collect_ignores_nulls_and_empty(spark):
    df = spark.createDataFrame(
        [(None,), (3.0,), (None,), (1.0,), (2.0,)], "v double"
    )
    assert collect_disc_percentiles(df, "v", [0.5]) == _spark_disc(
        spark, df, "v", [0.5]
    )
    empty = spark.createDataFrame([], "v double")
    assert collect_disc_percentiles(empty, "v", [0.5, 0.9]) == [None, None]


def test_collect_bigint_domain(spark):
    # Long inputs: Spark's percentile_disc RETURNS DOUBLE (lossy above
    # 2^53); the histogram operator keeps the exact long — which is
    # what the DuckDB oracles' exact PERCENTILE_DISC selects, and what
    # the consumers' `.cast("bigint")` needs. Pin the selection rule
    # against the Python reference (sorted[max(ceil(p*n),1)], 1-based),
    # and agreement with Spark wherever the double round-trip is exact.
    import math

    vals = [2**62, 2**62 + 1, -(2**62), 5, 5, 7]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = collect_disc_percentiles(df, "v", PS)
    sv = sorted(vals)
    want = [sv[max(int(math.ceil(p * len(vals))), 1) - 1] for p in PS]
    assert got == want
    small = [5, 5, 7, -3, 2**52, 0]
    df2 = spark.createDataFrame([(v,) for v in small], "v long")
    got2 = collect_disc_percentiles(df2, "v", PS)
    assert [float(v) for v in got2] == _spark_disc(spark, df2, "v", PS)


@pytest.mark.parametrize("p", [0.1, 0.5, 2 / 3, 0.999, 1.0])
def test_grouped_matches_percentile_disc(spark, p):
    rng = random.Random(7)
    rows = []
    for g, n in [("A", 1), ("B", 2), ("C", 37), ("D", 100), ("E", 9)]:
        base = [round(rng.uniform(-500, 500), 2) for _ in range(n)]
        # plant ties inside each group
        rows += [(g, v) for v in base + base[: n // 3]]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r["g"]: r["out"]
        for r in grouped_disc_percentile(df, "g", "v", p, "out").collect()
    }
    want = {
        r["g"]: r["m"]
        for r in df.groupBy("g")
        .agg(
            F.expr(
                f"percentile_disc({p!r}) WITHIN GROUP (ORDER BY v)"
            ).alias("m")
        )
        .collect()
    }
    assert got == want


@pytest.mark.parametrize("p", [0.1, 0.5, 2 / 3, 0.999, 1.0])
def test_bucketed_matches_percentile_disc(spark, p):
    # Distinct-heavy long domain (the theilsen shape) + tiny groups
    # that the fence sample misses entirely, + planted ties straddling
    # likely fence values.
    rng = random.Random(23)
    rows = []
    for g, n in [("A", 1), ("B", 3), ("C", 811), ("D", 2000)]:
        vals = [rng.randrange(-(10**12), 10**12) for _ in range(n)]
        vals += vals[: n // 5]  # ties
        rows += [(g, v) for v in vals]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        (r["g"]): (r["out"], r["nn"])
        for r in grouped_disc_percentile_bucketed(
            df, "g", "v", p, "out", n_col="nn", n_buckets=8, sample_mod=16
        ).collect()
    }
    want_m = {
        r["g"]: r["m"]
        for r in df.groupBy("g")
        .agg(
            F.expr(
                f"percentile_disc({p!r}) WITHIN GROUP (ORDER BY v)"
            ).alias("m")
        )
        .collect()
    }
    want_n = {r["g"]: r["n"] for r in df.groupBy("g").count()
              .withColumnRenamed("count", "n").collect()}
    assert set(got) == set(want_m)
    for g in got:
        assert got[g][1] == want_n[g], f"n mismatch for {g}"
        # percentile_disc returns double for long input; the operator
        # returns the exact long element
        assert float(got[g][0]) == want_m[g], f"median mismatch for {g}"


def test_bucketed_and_histogram_agree(spark):
    rng = random.Random(5)
    rows = [
        ("G" + str(rng.randrange(3)), round(rng.uniform(-100, 100), 1))
        for _ in range(5000)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    a = {
        r["g"]: r["out"]
        for r in grouped_disc_percentile(df, "g", "v", 0.5, "out").collect()
    }
    b = {
        r["g"]: r["out"]
        for r in grouped_disc_percentile_bucketed(
            df, "g", "v", 0.5, "out"
        ).collect()
    }
    assert a == b


def test_grouped_drops_null_values_like_the_aggregate(spark):
    df = spark.createDataFrame(
        [("A", None), ("A", 2.0), ("A", 1.0), ("B", None)],
        "g string, v double",
    )
    got = {
        r["g"]: r["out"]
        for r in grouped_disc_percentile(df, "g", "v", 0.5, "out").collect()
    }
    # Group B is all-NULL: the aggregate yields a NULL median row; the
    # histogram form yields no row. Consumers join on the group key, so
    # "no row" and "NULL median" must only differ for all-NULL groups —
    # assert exactly that contract.
    assert got == {"A": 1.0}


def test_theilsen_slope_fast_path_matches_decimal(spark):
    """The r11 guarded-bigint slope expression (plans/analytics_ops.py
    regression_theilsen_slope) must equal the pure DECIMAL(38,0) form it
    replaced for every (dy, dx), including both sides of the
    |dy| <= (2^63-1) div 1e6 guard where the expression switches from
    long arithmetic to the decimal fallback."""
    lim = 9_223_372_036_854  # (2**63 - 1) // 1_000_000
    rng = random.Random(11)
    dys = [
        0, 1, -1, 999_999, -999_999, lim, -lim, lim + 1, -(lim - 1),
        -(lim + 1), lim * 1000, -(lim * 1000), 10**17, -(10**17),
    ] + [rng.randrange(-(10**15), 10**15) for _ in range(60)]
    rows = [(dy, dx) for dy in dys for dx in (1, 2, 3, 7, 365, 2400)]
    df = spark.createDataFrame(rows, "dy long, dx long")
    fast = (
        "CASE WHEN dy BETWEEN -9223372036854 AND 9223372036854 THEN"
        " CASE WHEN dy < 0 THEN -(((-dy) * CAST(1000000 AS BIGINT))"
        " DIV dx) ELSE (dy * CAST(1000000 AS BIGINT)) DIV dx END"
        " ELSE CAST(CASE WHEN dy < 0 THEN"
        " -(((-CAST(dy AS DECIMAL(38,0))) * 1000000) DIV dx)"
        " ELSE (CAST(dy AS DECIMAL(38,0)) * 1000000) DIV dx END"
        " AS BIGINT) END"
    )
    slow = (
        "CAST(CASE WHEN CAST(dy AS DECIMAL(38,0)) < 0 THEN"
        " -(((-CAST(dy AS DECIMAL(38,0))) * 1000000) DIV dx)"
        " ELSE (CAST(dy AS DECIMAL(38,0)) * 1000000) DIV dx END"
        " AS BIGINT)"
    )
    bad = df.select(
        "dy", "dx", F.expr(fast).alias("f"), F.expr(slow).alias("s")
    ).where("f IS DISTINCT FROM s")
    assert bad.count() == 0, bad.limit(5).collect()
