"""Registry of named queries with DuckDB oracles.

Every operator the engine claims (SURVEY.md §2 and the LLM-data-pipeline
extensions) is registered here as a named query: a Spark callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an equivalent
ANSI/DuckDB SQL string run against the same parquet tables. The driver's
correctness gate compares the two at sf=0.01 (row count + schema +
order-insensitive value hash), so:

- every computed column is aliased identically on both sides;
- float aggregations are made order-independent by casting to DECIMAL
  per-element before SUM (exact, associative), then casting the result to
  DOUBLE (deterministic nearest-double) — never summing raw doubles;
- single arithmetic ops on doubles (a/b, a*b with fixed parenthesisation)
  are IEEE-deterministic and safe to compare bit-for-bit;
- casts BETWEEN double and decimal route through a string in BOTH engines
  when the decimal scale could force rounding: double→string prints the
  shortest round-trip repr and string→double parses correctly-rounded in
  both engines, while direct double↔decimal conversions round differently
  (Spark HALF_UP on shortest-repr vs DuckDB on the exact binary value;
  DuckDB's 128-bit DECIMAL→DOUBLE is not correctly rounded at all);
- CAVEAT on the string route: it needs the printed reprs to be CHARACTER-
  identical, not merely round-trip-equal. Java 17's Double.toString is
  shortest-UNIQUE but not always shortest (pre-JDK-19 algorithm); for a
  small fraction of arbitrary computed doubles it emits an extra digit vs
  DuckDB's Ryū output — both parse back to the same double, but as
  DECIMALs they differ, and exact decimal SUMs then diverge in the last
  ulp. The route is safe for values with bounded significant digits
  (float32-derived: ≤9; money-typed data: scale ≤ 6) and was bitten by
  unbounded doubles exactly once (PageRank draft). For unbounded doubles
  crossing an aggregation, use fixed-point integers (pagerank_rounds) or
  a sorted per-group fold instead;
- no LIMIT without a total ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # DuckDB SQL, or None → driver runs rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default=())
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a Spark query under ``name`` with its oracle."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name=name, spark_fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""),
            tags=tuple(tags), bench=bench,
        )
        return fn

    return wrap
