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


def test_asof_join_forward_direction(spark):
    left = spark.createDataFrame([(5,), (1,), (10,)], "t int")
    right = spark.createDataFrame([(2, "a"), (5, "b"), (8, "c")], "t int, v string")
    out = asof_join(
        left, right, "t", "t", allow_global_window=True, direction="forward"
    )
    got = {r.t: r.v for r in out.collect()}
    # forward: smallest right >= left; inclusive at equality; none after 10
    assert got == {1: "a", 5: "b", 10: None}


def test_asof_join_bad_direction_raises(spark):
    left = spark.createDataFrame([(1,)], "t int")
    right = spark.createDataFrame([(1, "x")], "t int, v string")
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, "t", "t", direction="sideways")


def test_asof_join_nearest_direction(spark):
    left = spark.createDataFrame([(1,), (4,), (5,), (7,), (20,)], "t int")
    right = spark.createDataFrame(
        [(2, "a"), (5, "b"), (8, "c")], "t int, v string"
    )
    out = asof_join(
        left, right, "t", "t", allow_global_window=True, direction="nearest"
    )
    got = {r.t: r.v for r in out.collect()}
    # 1 -> 2 ("a", only forward in range beats nothing behind... backward
    # none, forward 2); 4 -> gap back 2 ("a") vs forward 1 ("b") -> "b";
    # 5 -> exact ("b"); 7 -> back 2 ("b") vs forward 1 ("c") -> "c";
    # 20 -> only backward ("c").
    assert got == {1: "a", 4: "b", 5: "b", 7: "c", 20: "c"}


def test_asof_join_nearest_tie_breaks_backward(spark):
    left = spark.createDataFrame([(5,)], "t int")
    right = spark.createDataFrame([(3, "b"), (7, "f")], "t int, v string")
    out = asof_join(
        left, right, "t", "t", allow_global_window=True, direction="nearest"
    )
    assert out.collect()[0].v == "b"


def test_asof_join_nearest_tolerance(spark):
    left = spark.createDataFrame([(10,), (30,)], "t int")
    right = spark.createDataFrame([(12, "x")], "t int, v string")
    out = asof_join(
        left,
        right,
        "t",
        "t",
        allow_global_window=True,
        direction="nearest",
        tolerance=5,
    )
    got = {r.t: r.v for r in out.collect()}
    # 10 matches 12 (gap 2 <= 5); 30's nearest is 12 (gap 18) -> nulled,
    # row survives (merge_asof tolerance semantics).
    assert got == {10: "x", 30: None}


def test_asof_join_date_tolerance(spark):
    d = datetime.date
    left = spark.createDataFrame(
        [(1, d(2020, 1, 10)), (2, d(2020, 1, 20))], "k int, t date"
    )
    right = spark.createDataFrame(
        [(d(2020, 1, 8), "a"), (d(2020, 1, 1), "b")], "t date, v string"
    )
    out = asof_join(
        left, right, "t", "t", allow_global_window=True, tolerance=5
    )
    got = {r.k: r.v for r in out.collect()}
    # k=1 matches Jan 8 (2 days back, within 5); k=2's nearest is Jan 8
    # (12 days back) -> nulled by tolerance, row survives
    assert got == {1: "a", 2: None}


def test_asof_join_timestamp_tolerance_forward(spark):
    ts = datetime.datetime
    left = spark.createDataFrame(
        [(1, ts(2020, 1, 1, 10, 0)), (2, ts(2020, 1, 1, 12, 0))],
        "k int, t timestamp",
    )
    right = spark.createDataFrame(
        [(ts(2020, 1, 1, 10, 30), "q1"), (ts(2020, 1, 1, 18, 0), "q2")],
        "t timestamp, v string",
    )
    out = asof_join(
        left, right, "t", "t",
        allow_global_window=True, direction="forward", tolerance="2 hours",
    )
    got = {r.k: r.v for r in out.collect()}
    # k=1 -> 10:30 (30 min ahead, ok); k=2 -> 18:00 is 6h out -> nulled
    assert got == {1: "q1", 2: None}


def test_asof_join_date_tolerance_type_guard(spark):
    d = datetime.date
    left = spark.createDataFrame([(1, d(2020, 1, 10))], "k int, t date")
    right = spark.createDataFrame([(d(2020, 1, 8), "a")], "t date, v string")
    with pytest.raises(ValueError, match="day count"):
        asof_join(
            left, right, "t", "t",
            allow_global_window=True, tolerance="5 days",
        )


def test_asof_join_null_right_attr_not_backfilled(spark):
    """A legitimately-NULL right attribute must survive the as-of fill:
    filling each column separately with last(ignorenulls) would bleed the
    PREVIOUS version's value through (the SCD2 open-ended valid_to bug)."""
    from pyspark.sql import functions as F

    from amazon_sales_data_engineering_spark.operators.temporal import asof_join

    right = spark.createDataFrame(
        [(1, 10, "v1", 20), (1, 20, "v2", None)],
        "k int, t int, tag string, closes int",
    )
    left = spark.createDataFrame([(1, 15), (1, 25)], "k int, t int")
    got = {
        r.t: (r.tag, r.closes)
        for r in asof_join(
            left, right, left_time="t", right_time="t", by=["k"],
            right_cols=["tag", "closes"],
        ).collect()
    }
    assert got[15] == ("v1", 20)
    assert got[25] == ("v2", None)  # NOT ("v2", 20)


def test_quantized_topk_strict_missing_probe_raises(spark):
    """quantized_topk silently yields no rows for probe ids absent from
    the vector table (inner-join contract); strict=True must surface
    them as an error instead."""
    import pytest

    from amazon_sales_data_engineering_spark.operators.similarity import (
        quantized_topk,
    )

    vectors = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id int, embedding array<double>",
    )
    probes = spark.createDataFrame([(1,), (99,)], "vec_id int")
    # default: unknown probe vanishes, known probe still answered
    out = quantized_topk(vectors, probes, k=2).collect()
    assert {r.probe_id for r in out} == {1}
    with pytest.raises(ValueError, match="99"):
        quantized_topk(vectors, probes, k=2, strict=True)


def test_asof_join_duplicate_right_times_deterministic(spark):
    """Round-9 ADVICE: multiple right rows sharing the same (by, time)
    must attach a DETERMINISTIC payload — the fill breaks ties on a
    hash of the packed right payload, so re-runs and different right
    partitionings agree. All three directions."""
    left = spark.createDataFrame(
        [("k", 10), ("k", 3)], "by string, t int"
    )
    dup_rows = [("k", 5, f"v{i}") for i in range(8)]
    expected = {}
    for direction in ("backward", "forward", "nearest"):
        picks = set()
        for n_parts in (1, 3, 8):
            right = spark.createDataFrame(
                dup_rows, "by string, t int, v string"
            ).repartition(n_parts)
            out = asof_join(
                left, right, "t", "t", by=["by"], direction=direction
            )
            picks.add(tuple(sorted((r.t, r.v) for r in out.collect())))
        assert len(picks) == 1, f"{direction}: nondeterministic {picks}"
        expected[direction] = picks.pop()
    # directions differ in WHICH left rows match (backward can't match
    # t=3, forward can't match t=10) but every matched row must attach
    # the SAME duplicate — the hash order is direction-independent.
    chosen = {v for pick in expected.values() for _, v in pick if v is not None}
    assert len(chosen) == 1, f"directions disagree on the duplicate: {chosen}"


def test_asof_join_map_payload(spark):
    """Round-10 review: Spark's hash expressions reject MapType, so the
    tie-break must hash only non-map payload fields — a map-carrying
    right side must still work (it did before the tie-break landed) and
    stay deterministic via the remaining fields."""
    left = spark.createDataFrame([("k", 10)], "by string, t int")
    rows = [("k", 5, f"v{i}", {"m": f"x{i}"}) for i in range(4)]
    picks = set()
    for n_parts in (1, 4):
        right = spark.createDataFrame(
            rows, "by string, t int, v string, extra map<string,string>"
        ).repartition(n_parts)
        out = asof_join(left, right, "t", "t", by=["by"]).collect()
        assert len(out) == 1 and out[0].v is not None
        picks.add((out[0].v, out[0].extra["m"]))
    # deterministic pick via the hashable (non-map) fields, and the map
    # travels with its own row's value
    assert len(picks) == 1
    v, m = picks.pop()
    assert m == "x" + v[1:]
