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


def mojibake_markers(col: Column | str) -> Column:
    """Count of UTF-8-read-as-Latin-1 artifact lead chars: every 2-byte
    UTF-8 sequence for U+0080..U+07FF misdecoded as Latin-1 starts with
    U+00C2 'Â' or U+00C3 'Ã' (0xC2/0xC3 lead bytes) — the classic
    mojibake signature ('é' -> 'Ã©', NBSP -> 'Â '). Exact integer count
    via length deltas; pure map-side."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.length(c)
        - F.length(F.replace(c, F.lit("Ã"), F.lit("")))
        + F.length(c)
        - F.length(F.replace(c, F.lit("Â"), F.lit("")))
    ).cast("bigint")


def repair_mojibake(col: Column | str) -> Column:
    """ftfy-style single-pass mojibake repair, entirely JVM-side: text
    that was UTF-8-encoded but decoded as Latin-1 round-trips back
    through ``decode(encode(text, 'ISO-8859-1'), 'UTF-8')``. Applied
    only when the marker count is positive AND every character is in
    the Latin-1 range (Spark 4's ``encode`` throws on unmappable
    characters — emoji/CJK alongside a marker means mixed content, not
    pure mojibake) AND the re-encoded bytes are valid UTF-8
    (``decode`` throws on malformed input) — clean text, mixed
    content, and false-positive markers pass through untouched, making
    the repair safe to run corpus-wide and idempotent (repaired text
    has no markers left)."""
    c = F.col(col) if isinstance(col, str) else col
    as_bytes = F.encode(c, "ISO-8859-1")
    # Sequential CaseWhen branches, each evaluated only when the prior
    # guards fell through: Spark 4's encode THROWS
    # MALFORMED_CHARACTER_CODING on characters outside Latin-1 (emoji,
    # CJK, em-dashes — ubiquitous in web text), so the Latin-1-domain
    # check must pass BEFORE any branch touches encode. True mojibake is
    # Latin-1-only by construction (it came out of a Latin-1 decoder);
    # mixed content with markers passes through untouched.
    return (
        F.when(mojibake_markers(c) == 0, c)
        .when(c.rlike("[^\\x00-\\xff]"), c)
        .when(F.is_valid_utf8(as_bytes), F.decode(as_bytes, "UTF-8"))
        .otherwise(c)
    )
