"""Scalar-function breadth: string manipulation, date arithmetic, and
conditional expressions exercised together under the gate.

Extends the reference's F-family (SURVEY.md §2.7 — lit/cast/split/
division/min/max are its whole scalar surface) with the everyday scalar
toolbox a user porting Snowflake worksheets reaches for next. Everything
is a JVM-side built-in inside whole-stage codegen — the point of the
query is proving the SEMANTICS match ANSI/DuckDB exactly (padding,
translate, month-end clamping, null-propagation corners), since these
are the functions where engines classically diverge.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .registry import register
from .util import t


@register(
    "scalar_functions_showcase",
    oracle="""
SELECT c_custkey,
       lpad(c_name, 22, '*') AS name_lpad,
       rpad(c_mktsegment, 12, '.') AS seg_rpad,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
       reverse(c_name) AS name_rev,
       repeat('-', CAST(c_custkey % 4 AS INT)) AS dashes,
       nullif(c_nationkey, 10) AS nation_or_null,
       coalesce(nullif(c_nationkey, 10), -1) AS nation_defaulted,
       greatest(c_acctbal, 0.0) AS bal_floor,
       least(c_acctbal, 1000.0) AS bal_cap
FROM customer
""",
    doc="String/conditional scalar breadth in one gated pass: lpad/rpad "
    "(pad-or-truncate semantics), translate (char map), reverse, repeat "
    "with a data-driven count, nullif/coalesce null algebra, greatest/"
    "least (both engines skip NULL operands). All whole-stage-codegen "
    "built-ins; the gate proves semantic corners (padding beyond "
    "length, repeat(0) = empty string, NULL propagation) are identical "
    "to ANSI behavior.",
    tags=("scalar", "functions"),
)
def scalar_functions_showcase(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    nation_or_null = F.nullif(F.col("c_nationkey"), F.lit(10))
    return c.select(
        "c_custkey",
        F.lpad("c_name", 22, "*").alias("name_lpad"),
        F.rpad("c_mktsegment", 12, ".").alias("seg_rpad"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_translated"),
        F.reverse("c_name").alias("name_rev"),
        F.repeat(F.lit("-"), (F.col("c_custkey") % 4).cast("int")).alias(
            "dashes"
        ),
        nation_or_null.alias("nation_or_null"),
        F.coalesce(nation_or_null, F.lit(-1)).alias("nation_defaulted"),
        F.greatest("c_acctbal", F.lit(0.0)).alias("bal_floor"),
        F.least("c_acctbal", F.lit(1000.0)).alias("bal_cap"),
    )


@register(
    "date_functions_showcase",
    oracle="""
SELECT o_orderkey,
       date_trunc('month', CAST(o_orderdate AS DATE)) AS month_start,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS plus_3m,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
            AS INT) AS days_since_epoch95,
       CAST(isodow(CAST(o_orderdate AS DATE)) AS INT) AS iso_weekday,
       CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INT) AS iso_week,
       CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS qtr
FROM orders
""",
    doc="Date-arithmetic breadth: month truncation, month-end, add_months "
    "(month-end clamping — the corner where naive day-arithmetic "
    "diverges), day diffs against an anchor, ISO weekday (DuckDB "
    "dayofweek is Sunday=0, so the portable form is isodow = Spark "
    "((dayofweek+5)%7)+1), ISO week number, quarter. All DATE-typed "
    "wall-clock arithmetic — no session-timezone dependence.",
    tags=("scalar", "functions", "temporal"),
)
def date_functions_showcase(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.trunc(d, "month").alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.add_months(d, 3).cast("timestamp_ntz").alias("plus_3m"),
        F.datediff(d, F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch95"),
        (((F.dayofweek(d) + 5) % 7) + 1).cast("int").alias("iso_weekday"),
        F.weekofyear(d).cast("int").alias("iso_week"),
        F.quarter(d).cast("int").alias("qtr"),
    )
