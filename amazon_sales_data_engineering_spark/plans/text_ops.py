"""Text-analysis queries over the ``documents`` table — the LLM-data-
pipeline extension (BASELINE.json north_star). All built-in functions,
no Python UDFs; each has an exact DuckDB twin.

Shared normalization (must stay in lockstep with functions.text):
Spark  ``trim(regexp_replace(lower(text), '\\s+', ' '))``
DuckDB ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))``  — note
DuckDB replaces only the first match unless the 'g' flag is given.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    distinct_token_count,
    fingerprint,
    normalized_text,
    stopword_count,
    token_count,
)
from .registry import register
from .util import t_cpu

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_NTOK = f"(length({_NORM}) - length(replace({_NORM}, ' ', '')) + 1)"
# Guarded token count: an empty/whitespace-only document has 0 tokens, not
# the 1 the raw arithmetic yields — mirrors functions.text.token_count.
_NTOK_G = f"(CASE WHEN length({_NORM}) = 0 THEN 0 ELSE {_NTOK} END)"


@register(
    "text_token_stats",
    oracle=f"""
SELECT doc_id,
       CAST(CASE WHEN length({_NORM}) = 0 THEN 0 ELSE {_NTOK} END AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split({_NORM}, ' '))) AS BIGINT) AS n_distinct,
       CAST(len(list_distinct(string_split({_NORM}, ' '))) AS DOUBLE)
         / CAST(CASE WHEN length({_NORM}) = 0 THEN 1 ELSE {_NTOK} END AS DOUBLE) AS ttr
FROM documents
""",
    doc="Token counting: whitespace arithmetic + distinct tokens + type-"
    "token ratio (BPE-ish counting is pipeline.multimodal's job; this is "
    "the exact whitespace baseline).",
    tags=("text",),
    bench=True,
)
def text_token_stats(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents")
    ntok = token_count("text")
    ndis = distinct_token_count("text")
    safe_ntok = F.when(ntok == 0, F.lit(1)).otherwise(ntok)
    return d.select(
        "doc_id",
        ntok.alias("n_tokens"),
        ndis.alias("n_distinct"),
        (ndis.cast("double") / safe_ntok.cast("double")).alias("ttr"),
    )


@register(
    "text_quality_score",
    oracle=f"""
WITH m AS (
  SELECT doc_id,
         CAST(length({_NORM}) AS BIGINT) AS n_chars_norm,
         CAST({_NTOK_G} AS BIGINT) AS n_tokens,
         CAST(length(replace({_NORM}, ' ', '')) AS BIGINT) AS n_nonspace,
         CAST(len(list_filter(string_split({_NORM}, ' '),
                              x -> x IN ('the', 'a', 'and', 'of'))) AS BIGINT) AS n_stop
  FROM documents
)
SELECT doc_id, n_chars_norm, n_tokens,
       CASE WHEN n_tokens = 0 THEN NULL
            ELSE CAST(floor((n_nonspace * 1000.0) / n_tokens) AS BIGINT) END AS avg_token_len_milli,
       CASE WHEN n_tokens = 0 THEN NULL
            ELSE CAST(floor((n_stop * 1000.0) / n_tokens) AS BIGINT) END AS stopword_milli,
       CASE
         WHEN n_tokens >= 20 AND n_tokens <= 1000
              AND floor((n_stop * 1000.0) / n_tokens) >= 20 THEN 'good'
         WHEN n_tokens >= 5 THEN 'fair'
         ELSE 'poor'
       END AS quality
FROM m
""",
    doc="Quality scoring from length/stopword-density signals — integer "
    "arithmetic only, so scores are engine-exact.",
    tags=("text",),
    bench=True,
)
def text_quality_score(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents")
    norm = normalized_text("text")
    ntok = token_count("text")
    nonspace = F.length(F.regexp_replace(norm, " ", "")).cast("bigint")
    nstop = stopword_count("text")
    # Explicit NULL for empty docs: never divide by zero (ANSI mode would
    # throw; non-ANSI would silently NULL only on the Spark side).
    denom = F.when(ntok == 0, F.lit(None)).otherwise(ntok)
    avg_milli = F.floor((nonspace * F.lit(1000.0)) / denom).cast("bigint")
    stop_milli = F.floor((nstop * F.lit(1000.0)) / denom).cast("bigint")
    quality = (
        F.when(
            (ntok >= 20) & (ntok <= 1000) & (stop_milli >= 20), F.lit("good")
        )
        .when(ntok >= 5, F.lit("fair"))
        .otherwise(F.lit("poor"))
    )
    return d.select(
        "doc_id",
        F.length(norm).cast("bigint").alias("n_chars_norm"),
        ntok.alias("n_tokens"),
        avg_milli.alias("avg_token_len_milli"),
        stop_milli.alias("stopword_milli"),
        quality.alias("quality"),
    )


@register(
    "text_langid",
    oracle=f"""
WITH m AS (
  SELECT doc_id, lang,
         CAST({_NTOK_G} AS BIGINT) AS n_tokens,
         CAST(len(list_filter(string_split({_NORM}, ' '),
                              x -> x IN ('the', 'a', 'and', 'of'))) AS BIGINT) AS n_stop
  FROM documents
)
SELECT doc_id, lang,
       CASE
         WHEN n_tokens = 0 THEN 'unknown'
         WHEN floor((n_stop * 1000.0) / n_tokens) >= 100 THEN 'en'
         WHEN floor((n_stop * 1000.0) / n_tokens) >= 40 THEN 'mixed'
         ELSE 'unknown'
       END AS pred_lang
FROM m
""",
    doc="Language-ID n-gram/stopword-density heuristic. Deterministic "
    "integer thresholds; emitted next to the labeled lang column.",
    tags=("text",),
)
def text_langid(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents")
    ntok = token_count("text")
    nstop = stopword_count("text")
    denom = F.when(ntok == 0, F.lit(None)).otherwise(ntok)
    milli = F.floor((nstop * F.lit(1000.0)) / denom)
    pred = (
        F.when(milli >= 100, F.lit("en"))
        .when(milli >= 40, F.lit("mixed"))
        .otherwise(F.lit("unknown"))
    )
    return d.select("doc_id", "lang", pred.alias("pred_lang"))


@register(
    "doc_fingerprint",
    oracle=f"""
SELECT doc_id, md5({_NORM}) AS fingerprint, source
FROM documents
""",
    doc="Document fingerprinting: md5 over normalized text (the rolling-"
    "hash/content-address primitive under exact dedup).",
    tags=("text", "dedup"),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str):
    return t_cpu(spark, sf_dir, "documents").select(
        "doc_id", fingerprint("text").alias("fingerprint"), "source"
    )


@register(
    "text_bpe_tokens",
    oracle=r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT)
         AS n_bpe_tokens,
       CAST(len(regexp_extract_all(lower(text), '[0-9]+')) AS BIGINT) AS n_number_runs,
       CAST(len(regexp_extract_all(lower(text), '[^a-z0-9\s]')) AS BIGINT) AS n_punct
FROM documents
""",
    doc="BPE-ish tokenization via regex (letter runs | digit runs | single "
    "punctuation — the pre-tokenizer split BPE vocabularies start from), "
    "counted entirely JVM-side with regexp_extract_all. Complements the "
    "whitespace count in text_token_stats.",
    tags=("text", "tokenize"),
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents")
    lower = F.lower(F.col("text"))
    n = lambda pat: F.size(F.regexp_extract_all(lower, F.lit(pat), F.lit(0))).cast("bigint")
    return d.select(
        "doc_id",
        n(r"[a-z]+|[0-9]+|[^a-z0-9\s]").alias("n_bpe_tokens"),
        n(r"[0-9]+").alias("n_number_runs"),
        n(r"[^a-z0-9\s]").alias("n_punct"),
    )
