"""Equivalence pin for ``fast_decimal_sum_expr`` (r11 optimization).

The fast path replaces the per-row double→DECIMAL cast (a BigDecimal
string round-trip inside Spark's Cast) with unscaled-integer arithmetic:
``floor(x*10^s + 0.5)`` summed as DECIMAL, divided back exactly after the
aggregate. Its precondition is that the true value of ``x`` is an exact
decimal of at most ``s`` fractional digits with ``|x|*10^s < 2^52`` — the
money/quantity domain every caller draws from.

These tests prove BIT-IDENTICAL results against the slow idioms the
callers replaced (``decimal_sum`` / ``sum(cast(decimal(25,8)))`` →
``decimal(25,6)`` → double), over an adversarial sample of the domain:
2-dp money values (including .x5/.99 tails), TPC-H-shaped discount/tax
grids, integral quantities, negative profit differences, and the q8
CASE-0.0 branch. The oracle sweep independently re-proves equivalence on
the real corpus (DuckDB computes the original decimal formulation).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from amazon_sales_data_engineering_spark.functions.hashing import (
    decimal_sum,
    fast_decimal_sum_expr,
)

N_ROWS = 60_000
N_GROUPS = 37


@pytest.fixture(scope="module")
def money_df(spark):
    """TPC-H-shaped adversarial sample: exact 2-dp money, 2-dp rates,
    integral quantities — the entire fast-path caller domain."""
    rng = random.Random(0xA5DE11)
    rows = []
    for i in range(N_ROWS):
        # cents-exact money up to ~110k (lineitem eprice magnitude);
        # force .x5 / .99 / .00 / .01 tails often (rounding boundaries)
        cents = rng.choice(
            [
                rng.randrange(90_000, 11_000_000),
                rng.randrange(1, 1_000) * 100 + rng.choice([0, 1, 5, 50, 95, 99]),
            ]
        )
        price = cents / 100.0
        disc = rng.randrange(0, 11) / 100.0  # 0.00 .. 0.10
        tax = rng.randrange(0, 9) / 100.0  # 0.00 .. 0.08
        qty = float(rng.randrange(1, 51))
        retail = rng.randrange(90_000, 200_000) / 100.0
        rows.append((i % N_GROUPS, price, disc, tax, qty, retail))
    return spark.createDataFrame(
        rows, "g int, price double, disc double, tax double, qty double, retail double"
    ).cache()


def _pairs(df, exprs: dict[str, tuple]):
    """Aggregate fast/slow expression pairs per group, return mismatches."""
    aggs = []
    for name, (fast, slow) in exprs.items():
        aggs.append(fast.alias(f"{name}_fast"))
        aggs.append(slow.alias(f"{name}_slow"))
    out = df.groupBy("g").agg(*aggs).collect()
    bad = []
    for r in out:
        for name in exprs:
            f_, s_ = r[f"{name}_fast"], r[f"{name}_slow"]
            if f_ != s_:
                bad.append((r["g"], name, repr(f_), repr(s_)))
    return bad


def test_simple_columns_match_decimal_sum(money_df):
    """scale-6 fast path == decimal_sum for raw money / qty columns
    (q1 sum_qty/sum_base_price, full_outer_daily_totals order_value)."""
    bad = _pairs(
        money_df,
        {
            "qty": (fast_decimal_sum_expr(F.col("qty")), decimal_sum("qty")),
            "price": (fast_decimal_sum_expr(F.col("price")), decimal_sum("price")),
            "disc": (fast_decimal_sum_expr(F.col("disc")), decimal_sum("disc")),
        },
    )
    assert not bad, bad[:5]


def test_revenue_charge_profit_match_decimal_pin(money_df):
    """scale-8/final-6 fast path == sum(cast(decimal(25,8)))→(25,6)→double
    for the computed expressions q1/q3/q5/q7/q8/q9/q15/star use."""
    revenue = F.col("price") * (F.lit(1.0) - F.col("disc"))
    charge = revenue * (F.lit(1.0) + F.col("tax"))
    profit = revenue - F.col("retail") * F.col("qty")  # signed
    case0 = F.when(F.col("g") % 3 == 0, revenue).otherwise(F.lit(0.0))

    def slow(e):
        return F.sum(e.cast("decimal(25,8)")).cast("decimal(25,6)").cast("double")

    def slow_noresc(e):
        return F.sum(e.cast("decimal(25,8)")).cast("double")

    bad = _pairs(
        money_df,
        {
            "revenue": (
                fast_decimal_sum_expr(revenue, scale=8, final_scale=6),
                slow(revenue),
            ),
            "charge": (
                fast_decimal_sum_expr(charge, scale=8, final_scale=6),
                slow(charge),
            ),
            "profit": (
                fast_decimal_sum_expr(profit, scale=8, final_scale=6),
                slow(profit),
            ),
            # q8 market-share: CASE-0.0 branch, no final rescale
            "case0": (
                fast_decimal_sum_expr(case0, scale=8),
                slow_noresc(case0),
            ),
        },
    )
    assert not bad, bad[:5]


def test_boundary_values_rowwise(spark):
    """Single-row groups: every row's conversion is individually visible
    (no cancellation across a sum can mask a per-row mismatch)."""
    vals = [
        0.0,
        0.01,
        -0.01,
        104949.5,  # .5 at scale 1 (exact in both paths at scale>=1)
        999999.99,
        -999999.99,
        0.05,
        123.45,
        67.89 * 0.95,  # computed product, ~4 dp true value
        999999999.99,  # 1e9-magnitude money: x*1e6 = 1e15 < 2^52, in-domain
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "g int, x double"
    )
    bad = _pairs(
        df,
        {
            "x6": (fast_decimal_sum_expr(F.col("x")), decimal_sum("x")),
        },
    )
    assert not bad, bad
