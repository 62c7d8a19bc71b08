"""Temporal join operators Spark lacks natively: as-of and range joins.

Not in the reference surface (SURVEY.md §2.3 "Not present: theta/range/
as-of joins") — these are the custom-operator extensions, built as
compositions of existing DataFrame ops (the preferred strategy: no UDFs,
no driver loops).

- ``asof_join``: for each left row, the most recent right row with
  time ≤ left time (per optional key columns). The naive formulation is a
  per-row correlated subquery / inequality join (quadratic); the scalable
  formulation used here is the UNION + LAST(ignorenulls) OVER window
  trick: one union, one window over (keys, time) — a single sort-shuffle,
  linear in rows, no pair blowup. Same algorithm pandas' merge_asof uses,
  distributed.
- ``range_join``: left points joined to right intervals containing them.
  Spark plans a bare inequality join as BroadcastNestedLoop (quadratic);
  the scalable formulation buckets time into fixed-width cells, explodes
  each interval to the cells it spans, and equi-joins on the cell before
  verifying the exact predicate — shuffle keys are (cell), work is
  O(points + interval-cells + true matches).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    allow_global_window: bool = False,
    direction: str = "backward",
    tolerance: str | int | None = None,
) -> DataFrame:
    """As-of join (inclusive): attach to each left row the nearest right
    row matching ``by`` keys — ``direction="backward"`` takes the greatest
    ``right_time`` <= ``left_time``; ``"forward"`` the smallest
    ``right_time`` >= ``left_time``; ``"nearest"`` whichever of the two is
    closer in time (ties break backward, pandas merge_asof semantics).
    Left rows keep NULL right columns when no match exists.

    ``tolerance`` bounds the match distance (pandas merge_asof
    semantics: a match farther than the tolerance yields NULLs, the left
    row survives). For TIMESTAMP time columns pass an interval string
    (e.g. ``"3 hours"``); for DATE columns an integer day count.

    ``right_cols`` defaults to every right column except the time and keys.

    With no ``by`` keys the window has no partitioning — EVERY row flows
    through a single partition, a scalability cliff, so empty ``by``
    raises unless ``allow_global_window=True`` is passed explicitly
    (acceptable only when left+right fit one executor's memory).

    Both directions are the same single sort-shuffle: forward just
    reverses the window order, and tolerance is a post-window filter on
    the matched time carried through the fill — no extra join, no extra
    shuffle.

    When multiple right rows share the same (by, time), the attached
    payload is deterministic: the fill order breaks ties on a 64-bit hash
    of the packed right payload's non-map fields (largest hash wins —
    Spark's hash expressions reject MapType), so repeated runs and
    different partitionings pick the same duplicate.
    """
    by = by or []
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    if not by and not allow_global_window:
        raise ValueError(
            "asof_join with no 'by' keys builds a single-partition global "
            "window (all rows on one task). Pass by=[...] partition keys, "
            "or allow_global_window=True if the data is small enough."
        )
    if not set(by) <= set(left.columns) or not set(by) <= set(right.columns):
        raise ValueError("by keys must exist on both sides")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != right_time]
    non_key_left = [c for c in left.columns if c not in by]

    from pyspark.sql import types as T

    rt_type = right.schema[right_time].dataType
    lt_type = left.schema[left_time].dataType
    # DATE tolerance validation lives ABOVE the direction split so the
    # nearest and directional paths can't drift (round-9 ADVICE).
    if (
        tolerance is not None
        and isinstance(lt_type, T.DateType)
        and not isinstance(tolerance, int)
    ):
        raise ValueError(
            "tolerance for DATE time columns is an integer day count"
        )

    # Right-row attributes travel as ONE struct, non-null exactly when the
    # row IS a right row: last(ignorenulls) over the struct then skips
    # only left rows — filling each attribute separately would let a
    # legitimately-NULL right value (e.g. an open-ended valid_to) bleed
    # the PREVIOUS right row's value through.

    pack_type = T.StructType(
        [T.StructField("__rt", rt_type)]
        + [
            T.StructField(f"__r_{c}", right.schema[c].dataType)
            for c in right_cols
        ]
    )
    l_tag = left.select(
        *by,
        *non_key_left,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(pack_type).alias("__rpack"),
    )
    r_tag = right.select(
        *by,
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in non_key_left
        ],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(
            F.col(right_time).alias("__rt"),
            *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        ).alias("__rpack"),
    )
    merged = l_tag.unionByName(r_tag)

    # Deterministic tie-break for right rows sharing the same (by, time):
    # last(ignorenulls) picks whichever duplicate the in-partition sort
    # places last, so without a third sort key the attached payload is
    # nondeterministic across runs (round-9 ADVICE). A 64-bit hash of the
    # packed payload is stable, cheap, and orderable. Spark's hash
    # expressions REJECT MapType inputs (DATATYPE_MISMATCH.HASH_MAP_TYPE
    # under the default conf), so map-bearing payload fields are
    # excluded from the hash — the tie-break is deterministic modulo
    # rows identical in every non-map field (and degrades to the old
    # arbitrary-pick behavior only when NO field is hashable). Left rows
    # all hash the null pack to one constant — their relative order
    # never matters (each carries its own distinct output row).
    def _has_map(dt: T.DataType) -> bool:
        if isinstance(dt, T.MapType):
            return True
        if isinstance(dt, T.ArrayType):
            return _has_map(dt.elementType)
        if isinstance(dt, T.StructType):
            return any(_has_map(f.dataType) for f in dt.fields)
        return False

    hashable = [
        f.name for f in pack_type.fields if not _has_map(f.dataType)
    ]
    tie = (
        F.xxhash64(*[F.col("__rpack")[n] for n in hashable])
        if hashable
        else F.lit(0)
    ).alias("__tie")
    merged = merged.select(*merged.columns, tie)

    if direction == "nearest":
        # Both fills over the SAME union and the SAME by-key exchange:
        # backward = running last(ignorenulls) over ascending time,
        # forward = running last(ignorenulls) over DESCENDING time (the
        # identical trick the plain forward direction uses) — right rows
        # sort before left rows at an equal timestamp in BOTH orders, so
        # equality stays inclusive. Two in-partition sorts, one shuffle,
        # never a second join. Both frames are RUNNING
        # (unboundedPreceding..currentRow): a currentRow..unboundedFollowing
        # frame looks equivalent for the forward fill but Spark's
        # UnboundedFollowingWindowFunctionFrame recomputes the aggregate
        # from scratch per row — O(partition²), a measured hang at 1.5M
        # rows/key — while running frames stream in O(partition).
        wb = (
            Window.partitionBy(*by)
            .orderBy(F.col("__t"), F.col("__is_left"), F.col("__tie"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy(*by)
            .orderBy(F.col("__t").desc(), F.col("__is_left"), F.col("__tie"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = merged.select(
            *merged.columns,
            F.last(F.col("__rpack"), ignorenulls=True).over(wb).alias("__bp"),
            F.last(F.col("__rpack"), ignorenulls=True).over(wf).alias("__fp"),
        )
        rows = filled.filter(F.col("__is_left") == 1)
        if isinstance(lt_type, T.DateType):
            bgap = F.datediff(F.col("__t"), F.col("__bp.__rt"))
            fgap = F.datediff(F.col("__fp.__rt"), F.col("__t"))
        elif isinstance(lt_type, T.NumericType):
            bgap = F.col("__t") - F.col("__bp.__rt")
            fgap = F.col("__fp.__rt") - F.col("__t")
        else:
            # timestampdiff handles TIMESTAMP and TIMESTAMP_NTZ alike.
            bgap = F.expr("timestampdiff(MICROSECOND, __bp.__rt, __t)")
            fgap = F.expr("timestampdiff(MICROSECOND, __t, __fp.__rt)")
        choose_b = F.col("__fp").isNull() | (
            F.col("__bp").isNotNull() & (bgap <= fgap)
        )
        chosen = F.when(choose_b, F.col("__bp")).otherwise(F.col("__fp"))
        gap = F.when(choose_b, bgap).otherwise(fgap)
        if tolerance is None:
            ok = F.lit(True)
        elif isinstance(lt_type, (T.DateType, T.NumericType)):
            ok = gap <= F.lit(tolerance)
        else:
            iv = F.expr(f"INTERVAL {tolerance}")
            rt = chosen["__rt"]
            ok = (rt >= F.col("__t") - iv) & (rt <= F.col("__t") + iv)
        picked = rows.select(
            *rows.columns, chosen.alias("__np"), ok.alias("__ok")
        )
        return picked.select(
            *[F.col(c) for c in left.columns],
            *[
                F.when(F.col("__ok"), F.col(f"__np.__r_{c}")).alias(c)
                for c in right_cols
            ],
        )

    # right row sorts BEFORE a left row at the same timestamp → inclusive
    # (in both directions: forward reverses the time order but keeps
    # right-first within a timestamp).
    order = (
        [F.col("__t"), F.col("__is_left"), F.col("__tie")]
        if direction == "backward"
        else [F.col("__t").desc(), F.col("__is_left"), F.col("__tie")]
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        *merged.columns,
        F.last(F.col("__rpack"), ignorenulls=True).over(w).alias("__fpack"),
    )
    out_left = filled.filter(F.col("__is_left") == 1).select(
        *filled.columns,
        F.col("__fpack.__rt").alias("__f___rt"),
        *[
            F.col(f"__fpack.__r_{c}").alias(f"__f___r_{c}")
            for c in right_cols
        ],
    )

    if tolerance is None:
        ok = F.lit(True)
    else:
        matched = F.col("__f___rt")
        if isinstance(lt_type, T.DateType):
            gap = (
                F.datediff(F.col("__t"), matched)
                if direction == "backward"
                else F.datediff(matched, F.col("__t"))
            )
            ok = gap <= F.lit(tolerance)
        else:
            iv = F.expr(f"INTERVAL {tolerance}")
            ok = (
                (matched >= F.col("__t") - iv)
                if direction == "backward"
                else (matched <= F.col("__t") + iv)
            )

    return out_left.select(
        *[F.col(c) for c in left.columns],
        *[
            F.when(ok, F.col(f"__f___r_{c}")).alias(c)
            for c in right_cols
        ],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_time: str,
    start_col: str,
    end_col: str,
    bucket: Column | int,
    extra_condition: Column | None = None,
) -> DataFrame:
    """Join points to the intervals containing them
    (start <= t < end), scalably: equi-join on fixed-width time cells,
    then verify the exact predicate. ``bucket`` is the cell width in the
    time column's NATIVE units — SECONDS for timestamp columns, DAYS for
    date columns (the implementation branches on the column type, so a
    date caller passing a day-count width gets day-wide cells, not an
    86400× cell explosion). It must be >= the typical interval length for
    ~1 cell per interval. Point and interval time columns must be the same
    type family (all dates or all timestamps)."""
    from pyspark.sql import types as T

    def _is_date(df: DataFrame, c: str) -> bool:
        return isinstance(df.schema[c].dataType, T.DateType)

    kinds = {
        _is_date(points, point_time),
        _is_date(intervals, start_col),
        _is_date(intervals, end_col),
    }
    if len(kinds) != 1:
        raise ValueError(
            "range_join: point/start/end time columns mix DATE and "
            "TIMESTAMP types; cast them to one family first"
        )
    if kinds.pop():
        # days since epoch — bucket is a day count
        epoch = F.lit("1970-01-01").cast("date")
        to_units = lambda c: F.datediff(F.col(c), epoch)
    else:
        to_units = lambda c: F.unix_timestamp(F.col(c))

    width = F.lit(bucket) if isinstance(bucket, int) else bucket
    t_cell = (to_units(point_time) / width).cast("long")
    p = points.withColumn("__cell", t_cell)
    s_cell = (to_units(start_col) / width).cast("long")
    e_cell = (to_units(end_col) / width).cast("long")
    iv = intervals.withColumn(
        "__cell", F.explode(F.sequence(s_cell, e_cell))
    )
    cond = (F.col(point_time) >= F.col(start_col)) & (
        F.col(point_time) < F.col(end_col)
    )
    if extra_condition is not None:
        cond = cond & extra_condition
    return p.join(iv, "__cell").filter(cond).drop("__cell")


def interval_union_length(
    df: DataFrame,
    by: list[str],
    start_col: str,
    end_col: str,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Per-key total length of the UNION of (possibly overlapping)
    integer intervals [start, end) — "how many distinct seconds was this
    user active" — plus the count of maximal merged islands.

    Classic sweep as two windows over ONE sort shuffle on the key:
    running max of interval ends over preceding rows detects island
    starts (start > max end so far ⇒ gap), a running sum of those flags
    numbers the islands; per-island length is max(end) - min(start).
    All integer arithmetic. Empty ``by`` is rejected — it would degrade
    to a single-partition global window (same guard as asof_join).

    Output: by + (covered_len, n_islands, n_intervals).
    """
    if not by:
        raise ValueError(
            "interval_union_length(by=[]) would run one global "
            "single-partition window; partition by a key, or add a "
            "constant bucket column deliberately"
        )
    tie = order_tiebreak or []
    w_prev = (
        Window.partitionBy(*by)
        .orderBy(start_col, *tie)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(*by)
        .orderBy(start_col, *tie)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_max_end = F.max(end_col).over(w_prev)
    new_island = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    islands = df.withColumn("__island", F.sum(new_island).over(w_run))
    per_island = islands.groupBy(*by, "__island").agg(
        (F.max(end_col) - F.min(start_col)).alias("__len"),
        F.count(F.lit(1)).alias("__n"),
    )
    return per_island.groupBy(*by).agg(
        F.sum("__len").alias("covered_len"),
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("__n").alias("n_intervals"),
    )
