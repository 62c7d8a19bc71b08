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


#: Mojibake lead chars: the Latin-1/cp1252 renderings of the UTF-8 lead
#: bytes that dominate real web text. 0xC2/0xC3 ('Â'/'Ã') lead every
#: 2-byte sequence for U+0080..U+07FF (accented Latin), 0xE2 ('â') leads
#: the U+2000..U+2FFF 3-byte block (curly quotes, dashes, ellipsis, €:
#: '’' -> 'â€™'), 0xF0 ('ð') leads the 4-byte astral plane (emoji:
#: '😊' -> 'ðŸ˜Š'). Counting these is the repair TRIGGER only — the
#: valid-UTF-8 round-trip guard decides whether a repair actually
#: happens, so a legit French 'â' or Icelandic 'ð' costs a guard
#: evaluation, not a mangled string.
_MARKER_CHARS = ("Ã", "Â", "â", "ð")


def mojibake_markers(col: Column | str) -> Column:
    """Count of UTF-8-misdecoded artifact lead chars (``_MARKER_CHARS``:
    'Ã'/'Â' 2-byte leads, 'â' 3-byte punctuation lead, 'ð' 4-byte emoji
    lead) — the classic mojibake signatures ('é' -> 'Ã©', NBSP -> 'Â ',
    '’' -> 'â€™', '😊' -> 'ðŸ˜Š'). Exact integer count via length
    deltas; pure map-side."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.lit(0)
    for ch in _MARKER_CHARS:
        n = n + (F.length(c) - F.length(F.replace(c, F.lit(ch), F.lit(""))))
    return n.cast("bigint")


#: The 27 codepoints Windows-1252 assigns to bytes 0x80–0x9F (where
#: Latin-1 has C1 control characters) and those C1 bytes, as parallel
#: strings for F.translate. UTF-8-read-as-cp1252 mojibake (the most
#: common real-world profile: '’' -> 'â€™') contains these codepoints —
#: mapping them back to the C1 chars reduces the cp1252 profile to the
#: Latin-1 round-trip. Bytes 0x81/0x8D/0x8F/0x90/0x9D are undefined in
#: cp1252; lenient decoders emit the C1 control for them, which the
#: Latin-1 path already handles unchanged.
_CP1252_ONLY = (
    "€‚ƒ„…†‡ˆ‰Š"
    "‹ŒŽ‘’“”•–—"
    "˜™š›œžŸ"
)
_C1_CONTROLS = (
    "\x80\x82\x83\x84\x85\x86\x87\x88\x89\x8a"
    "\x8b\x8c\x8e\x91\x92\x93\x94\x95\x96\x97"
    "\x98\x99\x9a\x9b\x9c\x9e\x9f"
)
assert len(_CP1252_ONLY) == len(_C1_CONTROLS) == 27


def _repair_mojibake_once(c: Column) -> Column:
    """One repair pass: undo UTF-8 text mis-decoded as Latin-1 OR as
    Windows-1252. The cp1252-only codepoints are first translated back
    to the C1 bytes they came from, after which both profiles are the
    same ``decode(encode(t, 'ISO-8859-1'), 'UTF-8')`` round-trip.

    Sequential CaseWhen branches, each evaluated only when the prior
    guards fell through: Spark 4's ``encode`` THROWS
    MALFORMED_CHARACTER_CODING on characters outside Latin-1 (emoji,
    CJK — ubiquitous in web text), so the post-translate Latin-1-domain
    check must pass BEFORE any branch touches encode. Text whose
    cp1252-only punctuation is LEGITIMATE (a real '’' next to a marker)
    fails the valid-UTF-8 guard (a lone continuation byte) and passes
    through untouched — same safety posture as the marker==0 branch."""
    translated = F.translate(c, _CP1252_ONLY, _C1_CONTROLS)
    as_bytes = F.encode(translated, "ISO-8859-1")
    return (
        F.when(mojibake_markers(c) == 0, c)
        .when(translated.rlike("[^\\x00-\\xff]"), c)
        .when(F.is_valid_utf8(as_bytes), F.decode(as_bytes, "UTF-8"))
        .otherwise(c)
    )


def repair_mojibake(col: Column | str, passes: int = 2) -> Column:
    """ftfy-style mojibake repair, entirely JVM-side: text that was
    UTF-8-encoded but decoded as Latin-1 ('é' -> 'Ã©') or as
    Windows-1252 ('’' -> 'â€™') round-trips back through
    ``decode(encode(t, 'ISO-8859-1'), 'UTF-8')`` (cp1252-only
    codepoints first translated back to their C1 source bytes).

    Fixed-point iteration over ``passes`` (default 2) repair passes
    covers DOUBLE-encoded text — ftfy's other common case, where the
    mojibake itself was re-encoded and mis-decoded again
    ('é' -> 'ÃƒÂ©', '’' -> 'Ã¢â‚¬â„¢'): the first pass peels the outer
    layer, the second lands the original. Each pass repairs only when
    the marker count is positive AND the text (post-translate) is pure
    Latin-1 AND the re-encoded bytes are valid UTF-8 — clean text,
    mixed content, and false-positive markers pass through untouched,
    so the whole thing is a safe corpus-wide map and idempotent once
    markers are gone."""
    c = F.col(col) if isinstance(col, str) else col
    for _ in range(passes):
        c = _repair_mojibake_once(c)
    return c
