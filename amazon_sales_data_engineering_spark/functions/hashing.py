"""Portable, engine-agnostic hashing and numeric helpers.

The correctness gate compares Spark results against DuckDB, so every hash
used in a gated query must produce *identical* values in both engines.
``md5`` (lowercase hex) is the only hash both implement identically, so all
sketches (MinHash, SimHash, fingerprints) are built from it:

- MinHash: lexicographic MIN over md5 hex strings (total order on strings is
  engine-independent; no hex→int conversion needed).
- SimHash: per-bit counts extracted from md5 hex chars via
  ``instr('0123456789abcdef', ch) - 1`` + integer div/mod (both engines).

``decimal_sum`` implements the order-independent float aggregation idiom:
cast each element to DECIMAL (exact, associative addition — immune to
partition order), sum, then cast the total to DOUBLE (deterministic
nearest-double conversion). Never SUM raw doubles in a gated query.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = "0123456789abcdef"


def md5_hex(*cols: Column | str) -> Column:
    """md5 of the '|'-joined string forms of ``cols`` (lowercase hex)."""
    parts = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.md5(F.concat_ws("|", *[p.cast("string") for p in parts]))


def seeded_md5(seed: int, col: Column | str) -> Column:
    """Family of independent hash functions indexed by integer seed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.concat_ws("|", F.lit(str(seed)), c.cast("string")))


def hex_char_value(ch: Column) -> Column:
    """Value 0..15 of a single lowercase hex character. Spark: conv(ch,16,10);
    DuckDB oracle twin: ``instr('0123456789abcdef', ch) - 1``."""
    return F.conv(ch, 16, 10).cast("int")


def decimal_sum(col: Column | str, scale: int = 6, alias: str | None = None) -> Column:
    """Order-independent SUM of a double column: per-element DECIMAL(18,s)
    cast → exact sum → DOUBLE. DuckDB oracle equivalent:
    ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)``."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(f"decimal(18,{scale})")).cast("double")
    return out.alias(alias) if alias else out


def decimal_sum_expr(expr: Column, precision: int = 25, scale: int = 4) -> Column:
    """Same idiom for a computed per-row double expression (e.g. price *
    (1 - discount)): the row-level arithmetic is a fixed-parenthesisation
    IEEE op (deterministic), the cast pins it to an exact decimal, the sum
    is then associative.

    Scale is kept low on purpose: the final DECIMAL→DOUBLE conversion is
    only engine-identical while the *unscaled* total stays below 2^53
    (DuckDB converts int128→double then divides by 10^scale; Spark rounds
    the exact decimal) — at scale 4 a 10^11-magnitude total is still safe."""
    return F.sum(expr.cast(f"decimal({precision},{scale})")).cast("double")
