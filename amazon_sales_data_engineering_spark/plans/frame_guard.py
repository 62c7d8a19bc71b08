"""Mechanical guard against the O(partition²) window-frame class.

Spark executes any window frame that ENDS at ``unboundedFollowing`` but
does not START at ``unboundedPreceding`` (e.g. ``currentRow ..
unboundedFollowing``) with ``UnboundedFollowingWindowFunctionFrame``,
which recomputes the aggregate FROM SCRATCH for every row — O(partition²)
work. The round-9 forward-fill bug built exactly that frame: it passed
every sf0.001/sf0.01/sf0.1 gate and then hung 15+ minutes at sf1
(1.5M rows/key). Full-partition frames
(``unboundedPreceding .. unboundedFollowing``) are fine — Spark computes
those ONCE per partition (``UnboundedWindowFunctionFrame``) — and every
suffix aggregation has an O(n) formulation as a RUNNING frame over the
reversed sort order (see operators/temporal.py's nearest fill).

Two enforcement layers use this module:

- ``tests/test_frame_quality.py`` — static AST scan of the package
  source for ``rowsBetween``/``rangeBetween`` calls that build the bad
  frame, so the pattern can't be committed at all.
- ``tools/verify_sweep.py`` + plan tests — ``assert_no_quadratic_frames``
  on the OPTIMIZED plan of every registered query, so a bad frame that
  sneaks in through SQL strings, ``F.expr`` window specs, or a future
  helper still fails the gate before it can reach a large corpus.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# specifiedwindowframe(RowFrame, <lower>, unboundedfollowing$()) — only
# a full-partition frame (lower == unboundedpreceding$()) may end
# unbounded. The lower bound can itself contain commas and parens (a
# computed RangeFrame bound like coalesce(x, 1) renders inline), so the
# group is a tempered non-greedy scan that may cross commas but never
# into the NEXT frame literal — a plain [^,]+? would silently skip any
# comma-bearing quadratic frame, and a bare .*? could splice two
# adjacent frames into one false positive.
_FRAME_RE = re.compile(
    r"specifiedwindowframe\((?:Row|Range)Frame,\s*"
    r"((?:(?!specifiedwindowframe\().)*?),\s*"
    r"unboundedfollowing\$\(\)\)"
)


def find_quadratic_frames(plan_text: str) -> list[str]:
    """Return the offending lower bounds of every window frame in
    ``plan_text`` that ends at unboundedFollowing without starting at
    unboundedPreceding (the per-row-recompute class). Empty list means
    the plan is clean."""
    return [
        m.group(1)
        for m in _FRAME_RE.finditer(plan_text)
        if m.group(1) != "unboundedpreceding$()"
    ]


#: truncatedString's elision marker ("... N more fields"). A rendered
#: plan containing it may have dropped the very frame literal this guard
#: matches on, so truncation must never read as clean.
_TRUNCATION_RE = re.compile(r"\.\.\.\s*\d+\s+more fields")

#: High enough that no real plan in this repo truncates; finite so a
#: pathological million-column plan still renders in bounded memory.
_MAX_FIELDS = "100000"


def _full_plan_text(df: DataFrame) -> str:
    """Render the optimized plan WITHOUT field-list truncation.

    ``toString`` elides expression lists past
    ``spark.sql.debug.maxToStringFields`` (default 25) as
    "... N more fields" — a quadratic frame positioned past the 25th
    expression of a wide Project/Window node would vanish from the
    rendered text and the guard would silently pass (round-10 ADVICE,
    verified empirically). Raise the conf around the render, restore it
    after, and fail loudly if the marker still appears so truncation can
    never read as clean."""
    conf = df.sparkSession.conf
    key = "spark.sql.debug.maxToStringFields"
    prev = conf.get(key)
    try:
        conf.set(key, _MAX_FIELDS)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    finally:
        conf.set(key, prev)
    if _TRUNCATION_RE.search(plan):
        raise AssertionError(
            "frame guard: optimized plan still truncated ('... N more "
            f"fields') with {key}={_MAX_FIELDS} — cannot certify the plan "
            "frame-clean; widen _MAX_FIELDS."
        )
    return plan


def assert_no_quadratic_frames(df: DataFrame, context: str = "") -> None:
    """Fail fast if ``df``'s optimized plan contains a suffix window
    frame (start != unboundedPreceding, end == unboundedFollowing) —
    Spark executes those O(partition²). Rewrite as a running frame over
    the reversed sort order instead."""
    plan = _full_plan_text(df)
    bad = find_quadratic_frames(plan)
    if bad:
        raise AssertionError(
            f"O(partition^2) window frame{' in ' + context if context else ''}: "
            f"frame ends at unboundedFollowing with lower bound(s) {bad} — "
            "Spark recomputes the aggregate per row "
            "(UnboundedFollowingWindowFunctionFrame). Use a RUNNING frame "
            "(unboundedPreceding..currentRow) over the REVERSED sort order; "
            "see operators/temporal.py's nearest fill."
        )
