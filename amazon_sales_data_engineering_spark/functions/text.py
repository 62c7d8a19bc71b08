"""Text-analysis column expressions (LLM-data-pipeline extensions).

All pure built-in ``pyspark.sql.functions`` — JVM-side, codegen-friendly,
no Python UDFs — and each has an exact DuckDB-SQL twin used by the oracle
queries in ``plans.text_ops``. Token counting deliberately uses the
"whitespace counting" formulation (length diff) rather than split(), so the
same integer arithmetic is expressible in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small deterministic stopword list (subset of the corpus vocabulary).
STOPWORDS = ("the", "a", "and", "of")


def normalized_text(col: Column | str) -> Column:
    """Lowercase, whitespace-collapsed, trimmed — the canonical form used
    for fingerprinting and exact dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalized_text(col))


def token_count(col: Column | str) -> Column:
    """Whitespace-token count via length arithmetic (portable, exact).
    Assumes single-space separation after ``normalized_text``."""
    c = normalized_text(col)
    n = F.length(c) - F.length(F.regexp_replace(c, " ", "")) + F.lit(1)
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(n).cast("bigint")


def tokens(col: Column | str) -> Column:
    """Array of whitespace tokens of the normalized text."""
    return F.split(normalized_text(col), " ")


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(col))).cast("bigint")


def stopword_count(col: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """Number of tokens that are stopwords (exact-match on tokens)."""
    toks = tokens(col)
    return F.size(F.filter(toks, lambda t: t.isin(*stopwords))).cast("bigint")
