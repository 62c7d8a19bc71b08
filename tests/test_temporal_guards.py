"""Guards on the temporal operators: the asof_join global-window cliff and
range_join's date-vs-timestamp cell units (ADVICE round 1)."""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

from amazon_sales_data_engineering_spark.operators.temporal import (
    asof_join,
    range_join,
)


def test_asof_join_empty_by_raises(spark):
    left = spark.createDataFrame([(1,)], "t int")
    right = spark.createDataFrame([(1, "x")], "t int, v string")
    with pytest.raises(ValueError, match="single-partition"):
        asof_join(left, right, "t", "t")


def test_asof_join_empty_by_allowed_explicitly(spark):
    left = spark.createDataFrame([(5,), (1,)], "t int")
    right = spark.createDataFrame([(2, "a"), (4, "b")], "t int, v string")
    out = asof_join(left, right, "t", "t", allow_global_window=True)
    got = {r.t: r.v for r in out.collect()}
    assert got == {1: None, 5: "b"}


def test_range_join_date_columns_use_day_cells(spark):
    d = datetime.date
    points = spark.createDataFrame(
        [(1, d(2020, 1, 5)), (2, d(2020, 3, 1))], "pid int, t date"
    )
    intervals = spark.createDataFrame(
        [("w1", d(2020, 1, 1), d(2020, 1, 10)), ("w2", d(2020, 2, 1), d(2020, 3, 15))],
        "iv string, s date, e date",
    )
    out = range_join(points, intervals, "t", "s", "e", bucket=30)
    got = {(r.pid, r.iv) for r in out.collect()}
    assert got == {(1, "w1"), (2, "w2")}
    # day-width cells: each ~40-day interval explodes into at most 3 cells
    # of width 30 days, never 86400x. Count the exploded rows directly.
    from pyspark.sql import types as T

    epoch = F.lit("1970-01-01").cast("date")
    n_cells = (
        intervals.select(
            F.explode(
                F.sequence(
                    (F.datediff("s", epoch) / 30).cast("long"),
                    (F.datediff("e", epoch) / 30).cast("long"),
                )
            )
        ).count()
    )
    assert n_cells <= 2 * 3


def test_range_join_mixed_types_raise(spark):
    points = spark.createDataFrame(
        [(1, datetime.datetime(2020, 1, 5))], "pid int, t timestamp"
    )
    intervals = spark.createDataFrame(
        [("w1", datetime.date(2020, 1, 1), datetime.date(2020, 1, 10))],
        "iv string, s date, e date",
    )
    with pytest.raises(ValueError, match="mix"):
        range_join(points, intervals, "t", "s", "e", bucket=30)
