"""Mechanical enforcement of the no-suffix-window-frame rule (round-9
verdict #1): any frame ending at unboundedFollowing that doesn't start
at unboundedPreceding is executed by Spark as
UnboundedFollowingWindowFunctionFrame — O(partition²), a measured
15-minute hang at 1.5M rows/key that no gate below sf1 could see.

Layer 1 (this file): static AST scan of all repo source for
rowsBetween/rangeBetween calls that build the bad frame.
Layer 2: plans.frame_guard.assert_no_quadratic_frames on optimized
plans — applied here to seeded good/bad frames and wired into
tools/verify_sweep.py for every registered query, catching frames the
AST can't see (SQL strings, aliased bounds, future helpers).

A deliberate, justified suffix frame can opt out with a trailing
``# frame-guard: allow`` comment on the call line (none exist today).
"""

from __future__ import annotations

import ast
import os

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from amazon_sales_data_engineering_spark.plans.frame_guard import (
    assert_no_quadratic_frames,
    find_quadratic_frames,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_BIG = 2**31


def _is_unbounded_following(node: ast.expr) -> bool:
    if isinstance(node, ast.Attribute) and node.attr == "unboundedFollowing":
        return True
    return (
        isinstance(node, ast.Constant)
        and isinstance(node.value, int)
        and node.value >= _BIG
    )


def _is_unbounded_preceding(node: ast.expr) -> bool:
    if isinstance(node, ast.Attribute) and node.attr == "unboundedPreceding":
        return True
    if (
        isinstance(node, ast.UnaryOp)
        and isinstance(node.op, ast.USub)
        and isinstance(node.operand, ast.Constant)
        and isinstance(node.operand.value, int)
        and node.operand.value >= _BIG
    ):
        return True
    return (
        isinstance(node, ast.Constant)
        and isinstance(node.value, int)
        and node.value <= -_BIG
    )


def suffix_frame_sites(src: str, path: str = "<str>") -> list[str]:
    """``path:line`` of every rowsBetween/rangeBetween call whose end
    bound is unboundedFollowing (or an equivalent huge literal) and
    whose start bound is not unboundedPreceding — the quadratic class.
    Lines carrying a ``# frame-guard: allow`` marker are skipped."""
    lines = src.splitlines()
    out = []
    for node in ast.walk(ast.parse(src)):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr in ("rowsBetween", "rangeBetween")
            and len(node.args) == 2
            and _is_unbounded_following(node.args[1])
            and not _is_unbounded_preceding(node.args[0])
        ):
            line = lines[node.lineno - 1] if node.lineno <= len(lines) else ""
            if "frame-guard: allow" not in line:
                out.append(f"{path}:{node.lineno}")
    return out


def _repo_sources():
    roots = [
        os.path.join(REPO, "amazon_sales_data_engineering_spark"),
        os.path.join(REPO, "tools"),
    ]
    files = [os.path.join(REPO, "bench.py"), os.path.join(REPO, "__spark_entry__.py")]
    for root in roots:
        for dirpath, _dirs, names in os.walk(root):
            files += [
                os.path.join(dirpath, n) for n in names if n.endswith(".py")
            ]
    return files


def test_package_source_has_no_suffix_frames():
    bad: list[str] = []
    for path in _repo_sources():
        with open(path) as fh:
            bad += suffix_frame_sites(fh.read(), os.path.relpath(path, REPO))
    assert not bad, (
        "O(partition^2) suffix window frame(s) — rewrite as a RUNNING "
        f"frame over the reversed sort order: {bad}"
    )


def test_static_guard_flags_seeded_bad_frames():
    bad = """
from pyspark.sql import Window
w1 = Window.orderBy("t").rowsBetween(Window.currentRow, Window.unboundedFollowing)
w2 = Window.orderBy("t").rangeBetween(0, Window.unboundedFollowing)
w3 = Window.orderBy("t").rowsBetween(-3, 9223372036854775807)
"""
    assert suffix_frame_sites(bad) == ["<str>:3", "<str>:4", "<str>:5"]

    good = """
from pyspark.sql import Window
w1 = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
w2 = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
w3 = Window.orderBy("t").rowsBetween(-9223372036854775807, 9223372036854775807)
w4 = Window.orderBy("t").rowsBetween(-5, 5)
w5 = Window.orderBy("t").rowsBetween(Window.currentRow, Window.unboundedFollowing)  # frame-guard: allow
"""
    assert suffix_frame_sites(good) == []


def test_plan_guard_flags_seeded_bad_frame(spark):
    df = spark.createDataFrame([(1, 2), (1, 3)], "k int, t int")
    bad = df.withColumn(
        "x",
        F.last("t", ignorenulls=True).over(
            Window.partitionBy("k")
            .orderBy("t")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)  # frame-guard: allow
        ),
    )
    with pytest.raises(AssertionError, match="unboundedFollowing"):
        assert_no_quadratic_frames(bad, context="seeded")

    running = df.withColumn(
        "x",
        F.last("t", ignorenulls=True).over(
            Window.partitionBy("k")
            .orderBy(F.col("t").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    assert_no_quadratic_frames(running)

    full = df.withColumn(
        "x",
        F.max("t").over(
            Window.partitionBy("k").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    assert_no_quadratic_frames(full)
    assert find_quadratic_frames("no windows here at all") == []


def test_fixed_round9_sites_stay_clean(spark):
    """The two sites the round-9 bug was hand-fixed at — asof nearest
    and linear-interpolate resampling — must keep O(n) running frames."""
    from amazon_sales_data_engineering_spark.plans import REGISTRY

    from .conftest import SF_DIR

    for name in ("asof_join_nearest", "resample_linear_interpolate"):
        df = REGISTRY[name].spark_fn(spark, SF_DIR)
        assert_no_quadratic_frames(df, context=name)


def test_plan_regex_handles_comma_bounds_and_adjacent_frames():
    """Round-10 review: the lower-bound group must cross commas (a
    computed RangeFrame bound renders as e.g. coalesce(x, 1)) without
    splicing two adjacent frame literals into one false positive."""
    # comma-bearing computed lower bound -> still caught
    assert find_quadratic_frames(
        "specifiedwindowframe(RangeFrame, coalesce(x#1, 1), "
        "unboundedfollowing$())"
    ) == ["coalesce(x#1, 1)"]
    # adjacent frames, both benign (running + full) -> no false positive
    clean = (
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())"
        " ... "
        "specifiedwindowframe(RangeFrame, unboundedpreceding$(), "
        "unboundedfollowing$())"
    )
    assert find_quadratic_frames(clean) == []
    # adjacent frames, second one quadratic -> exactly that one flagged
    mixed = (
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())"
        " ... "
        "specifiedwindowframe(RowFrame, currentrow$(), unboundedfollowing$())"
    )
    assert find_quadratic_frames(mixed) == ["currentrow$()"]


def test_plan_guard_sees_past_tostring_truncation(spark):
    """Round-10 ADVICE (medium): toString elides expression lists past
    spark.sql.debug.maxToStringFields (default 25) as '... N more
    fields' — a bad frame positioned past the 25th expression of a wide
    node used to vanish from the rendered text and the guard read the
    plan as clean. The guard must now render untruncated (and fail
    loudly if the marker survives)."""
    df = spark.createDataFrame([(1, 2), (1, 3)], "k int, t int")
    wide = df.select(
        "k", "t", *[F.lit(i).alias(f"pad{i}") for i in range(40)]
    )
    bad = wide.withColumn(
        "x",
        F.sum("t").over(
            Window.partitionBy("k")
            .orderBy("t")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)  # frame-guard: allow
        ),
    )
    # pre-fix sanity: the default render really does truncate this plan
    default_text = bad._jdf.queryExecution().optimizedPlan().toString()
    assert "more fields" in default_text, (
        "fixture no longer truncates at default maxToStringFields; "
        "widen the pad column count"
    )
    with pytest.raises(AssertionError, match="unboundedFollowing"):
        assert_no_quadratic_frames(bad, context="wide-seeded")
    # conf restored after the guard ran
    assert (
        spark.conf.get("spark.sql.debug.maxToStringFields") != "100000"
    )
