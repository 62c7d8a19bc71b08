"""Skew- and shuffle-management operators for the 100 TB path.

The reference outsources all physical concerns to Snowflake (SURVEY.md §4);
on Spark they are ours. Two tools beyond AQE's built-in skew-join split:

- ``salted_join``: explicit salting for joins whose hot keys overwhelm even
  AQE (AQE splits oversized *partitions*, but a single key's rows always
  hash to one partition; salting splits the key itself). The skewed side
  gets a deterministic salt in [0, salt); the compact side is replicated
  ``salt`` times. Result is row-identical to the plain join.
- ``write_bucketed`` / co-located reads: pre-shuffle once at write time so
  every later join/aggregate on the bucket keys runs shuffle-free
  (SortMergeJoin with no Exchange). This is the Spark analogue of the
  warehouse's clustered tables, and the right layout for fact tables that
  are joined on the same key by every query.

Salting is deterministic from ROW CONTENT (xxhash64 over every column of
the skewed side, not ``rand()`` and not ``monotonically_increasing_id`` —
the latter depends on partition layout and intra-partition order, which a
stage retry or AQE replan can change) so task retries and speculative
execution cannot produce divergent salts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    compact: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with the skewed side's keys split across ``salt`` shuffle
    partitions and the compact side replicated to match.

    Use when one side has hot keys (power-law key frequency) and the other
    is too big to broadcast but small enough to replicate ``salt``×.
    Supported ``how``: inner / left (semantics preserved because every
    skewed-side row carries exactly one salt and matches exactly one
    replica row per underlying match)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if SALT_COL in skewed.columns or SALT_COL in compact.columns:
        raise ValueError(f"{SALT_COL} column already present")
    # Deterministic pseudo-random spread: hash EVERY column of the row, so
    # a hot key's rows (which differ in payload) land on all salts while
    # the salt stays a pure function of row content — stable across task
    # retries, speculative duplicates, and AQE replans. Fully-duplicate
    # rows share a salt; they are interchangeable, so the join result is
    # still row-identical to the plain join.
    s = skewed.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt)).cast(
            "int"
        ),
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias(SALT_COL)
    c = compact.select("*", salts)
    out = s.join(c, on + [SALT_COL], how)
    return out.drop(SALT_COL)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``bucket_cols``.
    Joins/aggregations between tables bucketed the same way on the same
    keys need no Exchange — the shuffle was paid once at write time."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
