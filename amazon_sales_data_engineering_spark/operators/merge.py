"""Upsert (MERGE) and slowly-changing-dimension maintenance as pure
DataFrame transforms.

The reference maintains dimensions by append-only delta loads
(left-anti new-rows, /root/reference/step_5_curated_to_consumption.py —
rows never change once written, and its is_active flags are set at insert
and never updated). Real warehouse dimension maintenance needs the two
idioms Snowflake users reach for next, neither of which Spark-on-parquet
has natively (they are one-liners on Delta/Iceberg):

- **upsert** (MERGE / SCD type 1): source rows overwrite matching target
  rows, unmatched source rows append. Expressed as target-anti-join ∪
  source — ONE anti join, no full-outer: the result is written as a new
  table version (parquet is immutable; rewrite-on-merge is the
  copy-on-write strategy Delta uses under the hood).
- **SCD type 2**: history-preserving — a changed row CLOSES the current
  version (valid_to stamped, is_current flipped) and INSERTS a new
  current version. Expressed as one join against the change set + a
  union of (kept ∪ closed ∪ inserted), all narrow after the single
  key-partitioned join.

Scale: both shapes shuffle once on the merge key (or zero times when the
change set broadcasts — the common case: daily deltas are small relative
to the dimension). Rewrite cost is bounded by partitioning the target
table on a key prefix and rewriting only touched partitions (dynamic
partition overwrite); noted here, exercised via the partitioned sink in
sources.sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE semantics (SCD1): ``source`` wins on key collision, target
    rows without a matching source key survive, unmatched source rows
    append. Column sets must match (enforced via unionByName)."""
    kept = target.join(source.select(*keys), keys, "left_anti")
    return kept.unionByName(source)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    tracked: list[str],
    eff_date_col: str = "valid_from",
    end_date_col: str = "valid_to",
    current_col: str = "is_current",
    eff_date=None,
) -> DataFrame:
    """Type-2 SCD: apply ``changes`` (one row per key: the new attribute
    values) to the versioned ``dim``.

    ``dim`` carries (key, tracked..., valid_from, valid_to, is_current);
    ``changes`` carries (key, tracked...). For each change key whose
    tracked values differ from the CURRENT dim row: the current row is
    closed (valid_to = eff_date, is_current = 'N') and a new current row
    (valid_from = eff_date, valid_to = NULL, is_current = 'Y') is
    emitted. No-op changes (identical tracked values) and unknown keys
    (not in dim) are appended as new current rows only if unknown.
    History rows (is_current = 'N') pass through untouched."""
    if eff_date is None:
        raise ValueError("scd2_apply: eff_date is required (no implicit now())")
    eff = F.lit(eff_date).cast("date")

    # Change detection joins ONLY current rows against the change set.
    cur = dim.filter(F.col(current_col) == "Y")
    hist = dim.filter(F.col(current_col) != "Y")

    chg = changes.select(
        F.col(key),
        F.lit(True).alias("__chg_match"),
        *[F.col(c).alias(f"__new_{c}") for c in tracked],
    )
    joined = cur.join(F.broadcast(chg), key, "left")
    # A row is "changed" only when a change row MATCHED and its tracked
    # values differ. eqNullSafe compares structs three-valued-safely, but
    # an UNMATCHED row compares (values) vs (all-NULL struct) to plain
    # False — not NULL — so the match marker, not coalesce, must gate it.
    differs = ~F.struct(*[F.col(c) for c in tracked]).eqNullSafe(
        F.struct(*[F.col(f"__new_{c}") for c in tracked])
    )
    matched = joined.withColumn(
        "__changed", F.coalesce(F.col("__chg_match"), F.lit(False)) & differs
    )

    unchanged_cur = matched.filter(~F.col("__changed")).select(*dim.columns)
    closed = (
        matched.filter(F.col("__changed"))
        .withColumn(end_date_col, eff)
        .withColumn(current_col, F.lit("N"))
        .select(*dim.columns)
    )
    new_current = (
        matched.filter(F.col("__changed"))
        .select(
            F.col(key),
            *[F.col(f"__new_{c}").alias(c) for c in tracked],
        )
        .withColumn(eff_date_col, eff)
        .withColumn(end_date_col, F.lit(None).cast("date"))
        .withColumn(current_col, F.lit("Y"))
        .select(*dim.columns)
    )
    # Keys appearing in changes but absent from dim entirely: brand-new
    # members, inserted as current.
    inserts = (
        changes.join(dim.select(key).distinct(), key, "left_anti")
        .select(F.col(key), *[F.col(c) for c in tracked])
        .withColumn(eff_date_col, eff)
        .withColumn(end_date_col, F.lit(None).cast("date"))
        .withColumn(current_col, F.lit("Y"))
        .select(*dim.columns)
    )
    return hist.unionByName(unchanged_cur).unionByName(closed).unionByName(
        new_current
    ).unionByName(inserts)
