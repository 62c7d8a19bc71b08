"""Distributed date-dimension spine.

The reference builds its date dim **in pandas on the driver** — collect
min/max, ``pd.date_range``, per-column date math, upload
(/root/reference/step_5_curated_to_consumption.py:386-425) — and that
function is also broken as written (SURVEY.md §2.11.4). The Spark-native
form keeps everything distributed: aggregate min/max, ``sequence()`` +
``explode`` to generate one row per day, built-in date functions for the
parts (SURVEY.md §2.8 F7-F13). No driver round-trip, no pandas.

Day-of-week is exposed as ISO (Mon=1..Sun=7) via ``weekday()+1`` — the
portable formulation (DuckDB: ``isodow``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def date_spine(df: DataFrame, date_col: Column | str) -> DataFrame:
    """One row per calendar day between min and max of ``date_col``, with
    the reference's date-dim attributes (clean column names; the faithful
    typo'd names live in pipeline.consumption)."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    bounds = df.agg(
        F.min(c.cast("date")).alias("mn"), F.max(c.cast("date")).alias("mx")
    )
    spine = bounds.select(
        F.col("mn"),
        F.explode(F.expr("sequence(mn, mx, interval 1 day)")).alias("order_dt"),
    )
    d = F.col("order_dt")
    isodow = (F.weekday(d) + F.lit(1)).cast("int")
    return spine.select(
        d,
        F.year(d).cast("int").alias("order_year"),
        F.month(d).cast("int").alias("order_month"),
        F.quarter(d).cast("int").alias("order_quarter"),
        F.dayofmonth(d).cast("int").alias("order_day"),
        isodow.alias("order_isodow"),
        F.date_format(d, "EEEE").alias("order_dayname"),
        (F.datediff(d, F.col("mn")) + F.lit(1)).cast("int").alias("day_counter"),
        F.when(isodow >= 6, F.lit("Weekend")).otherwise(F.lit("Weekday")).alias("order_daytype"),
    )
