"""Incremental (delta) load detection — left-anti joins.

The reference detects new dimension rows with left-anti joins before every
dim append (SURVEY.md §2.3 J4/J5):
- region: ``Country`` only (a quirk — Region ignored;
  /root/reference/step_5_curated_to_consumption.py:107-111),
- product/promo/customer/payment/date: USING-style column lists
  (/root/reference/step_5_curated_to_consumption.py:169-173, 232-236,
  297-301, 356-360, 435-439).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def new_rows(incoming: DataFrame, existing: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of ``incoming`` whose ``keys`` don't appear in ``existing``.
    ``existing`` is projected to the key columns so Spark can broadcast it
    when it is dim-sized (the common case for delta loads)."""
    probe = existing.select(*keys).dropDuplicates(keys)
    return incoming.join(F.broadcast(probe), keys, "left_anti")


def delta_join(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list[str] | F.Column,
    broadcast_deltas: bool = False,
) -> DataFrame:
    """View delta for the join view V = A ⋈ B under inserts on BOTH sides:

        ΔV = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    The three terms partition the new output pairs by which side each row
    came from, so V_old ∪ ΔV equals the full recompute exactly — no row
    duplicated, none lost (the standard incremental view-maintenance
    algebra for insert-only deltas).

    At 100 TB this is the difference between touching |Δ|-proportional
    data and re-joining two full tables: with ``broadcast_deltas`` the two
    cross terms broadcast the (daily-increment-sized) delta against the
    big old side, which is scanned but never shuffled; the Δ⋈Δ term is
    delta-sized on both sides.
    """
    da = F.broadcast(a_delta) if broadcast_deltas else a_delta
    db = F.broadcast(b_delta) if broadcast_deltas else b_delta
    return (
        da.join(b_old, on)
        .unionByName(a_old.join(db, on))
        .unionByName(da.join(b_delta, on))
    )
