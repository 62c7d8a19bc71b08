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


@register(
    "ngram_lm_counts",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents
), tri AS (
  SELECT ws[i] AS w1, ws[i+1] AS w2, ws[i+2] AS w3
  FROM toks,
       unnest(CASE WHEN len(ws) >= 3 THEN range(1, len(ws) - 1)
                   ELSE [] END) AS t(i)
), tc AS (
  SELECT w1, w2, w3, COUNT(*) AS n_tri FROM tri GROUP BY 1, 2, 3
), cc AS (
  SELECT w1, w2, CAST(SUM(n_tri) AS BIGINT) AS n_ctx FROM tc GROUP BY 1, 2
)
SELECT tc.w1, tc.w2, tc.w3, tc.n_tri, cc.n_ctx,
       CAST(tc.n_tri AS DOUBLE) / cc.n_ctx AS cond_p
FROM tc JOIN cc ON cc.w1 = tc.w1 AND cc.w2 = tc.w2
WHERE tc.n_tri >= 3
""",
    doc="Trigram language-model counts: occurrence counts per trigram, "
    "bigram-context totals, and the MLE conditional probability "
    "P(w3|w1,w2) as one exact-integer IEEE division. The context total "
    "is derived from the SAME trigram aggregate (sum over w3) so the "
    "two counts are consistent by construction. Shape at scale: two "
    "map-side-combinable aggregates + one context-keyed join — the "
    "n-gram-counting backbone of data-quality LMs (KenLM-style), "
    "min-count 3 bounds the output to the frequent tail.",
    tags=("text", "corpus", "lm"),
)
def ngram_lm_counts(spark: SparkSession, sf_dir: str):
    from ..functions.text import normalized_text

    # tokens behind a projection boundary — `toks` sits INSIDE the
    # trigram lambda body, where an inline split(normalize) re-runs per
    # trigram (round-11 probe catch; see operators.dedup.passage_windows)
    d = t_cpu(spark, sf_dir, "documents").select(
        F.split(normalized_text("text"), " ").alias("__toks")
    )
    toks = F.col("__toks")
    n = F.size(toks)
    idx = F.when(n >= 3, F.sequence(F.lit(1), n - F.lit(2))).otherwise(
        F.array().cast("array<int>")
    )
    tris = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(toks, i).alias("w1"),
            F.element_at(toks, i + 1).alias("w2"),
            F.element_at(toks, i + 2).alias("w3"),
        ),
    )
    tri = d.select(F.explode(tris).alias("t")).select("t.w1", "t.w2", "t.w3")
    tc = tri.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("n_tri"))
    cc = tc.groupBy("w1", "w2").agg(F.sum("n_tri").alias("n_ctx"))
    return (
        tc.filter(F.col("n_tri") >= 3)
        .join(cc, ["w1", "w2"])
        .select(
            "w1", "w2", "w3", "n_tri", "n_ctx",
            (F.col("n_tri").cast("double") / F.col("n_ctx")).alias("cond_p"),
        )
    )


@register(
    "bpe_merge_step",
    oracle="""
WITH words AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents
), wf AS (
  SELECT w, COUNT(*) AS f FROM words GROUP BY 1
), pairs AS (
  SELECT substr(wf.w, i, 2) AS pair, CAST(SUM(wf.f) AS BIGINT) AS n
  FROM wf, unnest(CASE WHEN length(wf.w) >= 2
                       THEN range(1, length(wf.w)) ELSE [] END) AS t(i)
  GROUP BY 1
)
SELECT pair, n FROM pairs
ORDER BY n DESC, pair
LIMIT 20
""",
    doc="One BPE-training merge step: adjacent character-pair frequencies "
    "over the word distribution (pairs counted once per word occurrence "
    "via the word-frequency weight — the classic BPE optimization of "
    "aggregating unique words first). The top pair is the next merge "
    "rule. Integer counts, (count, pair) total order for the "
    "deterministic top-20. Shape: word-frequency aggregate (vocab-"
    "bounded) + per-unique-word pair explode + one aggregate + global "
    "top-k — the inner loop of tokenizer training as three "
    "map-side-combinable passes.",
    tags=("text", "corpus", "tokenize"),
)
def bpe_merge_step(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), F.lit(0))
        ).alias("w")
    )
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    ln = F.length("w")
    idx = F.when(ln >= 2, F.sequence(F.lit(1), ln - 1)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = wf.select(
        F.explode(idx).alias("i"), "w", "f"
    ).select(F.expr("substring(w, i, 2)").alias("pair"), "f")
    return (
        pairs.groupBy("pair")
        .agg(F.sum("f").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(20)
    )


@register(
    "text_ngram_novelty",
    oracle=f"""
WITH sh AS (
  SELECT doc_id,
         unnest(list_distinct(
           CASE WHEN len(ws) >= 3
                THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                      FOR i IN range(1, len(ws) - 1)]
                ELSE [] END)) AS shingle
  FROM (SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents)
), first_seen AS (
  SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY 1
)
SELECT s.doc_id,
       COUNT(*) AS n_shingles,
       COUNT(*) FILTER (WHERE f.first_doc = s.doc_id) AS n_novel,
       (COUNT(*) FILTER (WHERE f.first_doc = s.doc_id) * 1000000)
         // COUNT(*) AS novelty_ppm
FROM sh s JOIN first_seen f ON f.shingle = s.shingle
GROUP BY 1
""",
    doc="N-gram novelty scoring: per document, the fraction of its "
    "distinct 3-word shingles FIRST seen in it (min-doc_id attribution "
    "— deterministic, order-free). Low novelty = the doc mostly repeats "
    "earlier corpus content; the streaming-curation signal behind "
    "'keep only documents adding new n-grams'. Shape: one "
    "map-side-combinable MIN aggregate over shingles + an equi-join "
    "back + one count aggregate — hot shingles cost one row each, "
    "never a pair blow-up. Integer ppm arithmetic.",
    tags=("text", "corpus", "dedup"),
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str):
    from ..operators.dedup import shingles

    sh = shingles(
        t_cpu(spark, sf_dir, "documents"), "text", "doc_id", k=3
    ).persist()
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1)).alias(
                "n_novel"
            ),
        )
        .withColumn(
            "novelty_ppm", F.expr("(n_novel * 1000000) div n_shingles")
        )
    )


@register(
    "langid_confusion_matrix",
    oracle=f"""
WITH m AS (
  SELECT doc_id, lang,
         CAST({_NTOK_G} AS BIGINT) AS n_tokens,
         CAST(len(list_filter(string_split({_NORM}, ' '),
                              x -> x IN ('the', 'a', 'and', 'of'))) AS BIGINT)
           AS n_stop
  FROM documents
), pred AS (
  SELECT lang AS true_lang,
         CASE
           WHEN n_tokens = 0 THEN 'unknown'
           WHEN floor((n_stop * 1000.0) / n_tokens) >= 100 THEN 'en'
           WHEN floor((n_stop * 1000.0) / n_tokens) >= 40 THEN 'mixed'
           ELSE 'unknown'
         END AS pred_lang
  FROM m
), tot AS (SELECT COUNT(*) AS n_total FROM pred)
SELECT p.true_lang, p.pred_lang, COUNT(*) AS n_docs,
       (COUNT(*) * 1000000) // t.n_total AS cell_ppm,
       p.pred_lang = 'en' AND p.true_lang = 'en'
         OR p.pred_lang <> 'en' AND p.true_lang <> 'en' AS en_detector_correct
FROM pred p CROSS JOIN tot t
GROUP BY p.true_lang, p.pred_lang, t.n_total
""",
    doc="In-engine model evaluation: confusion matrix of the stopword-"
    "density language classifier against the labeled lang column, with "
    "integer ppm cell shares and an en-vs-rest correctness flag per "
    "cell — the eval step a data-quality pipeline runs BEFORE trusting "
    "a heuristic filter at 100 TB. One aggregate over the scored "
    "stream; the totals row broadcasts. Demonstrates that classifier "
    "evaluation (not just application) lives in the engine.",
    tags=("text", "ml", "eval"),
)
def langid_confusion_matrix(spark: SparkSession, sf_dir: str):
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
    scored = d.select(F.col("lang").alias("true_lang"), pred.alias("pred_lang"))
    tot = scored.agg(F.count(F.lit(1)).alias("n_total"))
    correct = (
        (F.col("pred_lang") == "en") & (F.col("true_lang") == "en")
    ) | ((F.col("pred_lang") != "en") & (F.col("true_lang") != "en"))
    return (
        scored.crossJoin(F.broadcast(tot))
        .groupBy("true_lang", "pred_lang", "n_total")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "true_lang",
            "pred_lang",
            "n_docs",
            F.expr("(n_docs * 1000000) div n_total").alias("cell_ppm"),
            correct.alias("en_detector_correct"),
        )
    )


@register(
    "tokenizer_oov_rate",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS w
  FROM documents WHERE length({_NORM}) > 0
), vocab AS (
  SELECT w FROM (
    SELECT w, COUNT(*) AS c FROM toks GROUP BY 1
    ORDER BY c DESC, w LIMIT 20
  )
)
SELECT t.doc_id,
       COUNT(*) AS n_tokens,
       CAST(COUNT(*) FILTER (WHERE v.w IS NULL) AS BIGINT) AS n_oov,
       CAST((COUNT(*) FILTER (WHERE v.w IS NULL)) * 1000 // COUNT(*)
            AS BIGINT) AS oov_milli
FROM toks t LEFT JOIN vocab v ON v.w = t.w
GROUP BY 1
""",
    doc="Tokenizer vocabulary coverage: the per-document out-of-vocabulary "
    "rate against a frequency-truncated vocab (top-20 words by count, "
    "ties broken lexicographically — a deterministic total order, which "
    "is what makes a truncated vocab gate-able at all). The vocab is a "
    "corpus-derived driver table: one map-side-combinable word count, "
    "top-k, then BROADCAST against the token stream — the exact shape "
    "of a real tokenizer-coverage audit at 100 TB, where the vocab "
    "(50k-200k entries) always broadcasts and the corpus never "
    "shuffles. Integer milli-rates: engine-exact.",
    tags=("text", "tokenize", "corpus"),
    bench=True,
)
def tokenizer_oov_rate(spark: SparkSession, sf_dir: str):
    # r11 restructure (guide §2.3/§2.4): `toks` fed both the vocab build
    # and the coverage join — two documents scans, each re-running the
    # normalize+split+explode chain, with the join+groupBy shuffling the
    # full token-OCCURRENCE stream. Reduce to per-(doc, word) counts
    # ONCE (map-side combinable, per-doc-distinct sized), persist; the
    # vocab is a rollup of the cache and the per-doc coverage weighs
    # each distinct word by its count — identical totals, one scan, and
    # the shuffles carry distinct words instead of occurrences.
    d = t_cpu(spark, sf_dir, "documents")
    norm = normalized_text("text")
    wc = (
        d.filter(F.length(norm) > 0)
        .select("doc_id", F.explode(F.split(norm, " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("k"))
        .persist()
    )
    vocab = (
        wc.groupBy("w")
        .agg(F.sum("k").alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(20)
        .select("w", F.lit(1).alias("__v"))
    )
    return (
        wc.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("__v").isNull(), F.col("k")).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.expr("(n_oov * 1000) div n_tokens").alias("oov_milli"),
        )
    )


@register(
    "phrase_pmi_top50",
    oracle=f"""
WITH toks AS (
  SELECT string_split({_NORM}, ' ') AS ws
  FROM documents WHERE length({_NORM}) > 0
), uni AS (
  SELECT w, COUNT(*) AS c FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY 1
), bi AS (
  SELECT ws[i] AS w1, ws[i+1] AS w2, COUNT(*) AS n_ab
  FROM toks, unnest(CASE WHEN len(ws) >= 2 THEN range(1, len(ws))
                         ELSE [] END) AS t(i)
  GROUP BY 1, 2
), tot AS (
  SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM uni) AS n_uni,
         (SELECT CAST(SUM(n_ab) AS BIGINT) FROM bi) AS n_bi
)
SELECT w1, w2, n_ab, ca.c AS c_a, cb.c AS c_b,
       ((CAST(n_ab AS DOUBLE) * n_uni / ca.c)
        * (CAST(n_uni AS DOUBLE) / n_bi)) / cb.c AS pmi_ratio
FROM bi
JOIN uni ca ON ca.w = bi.w1
JOIN uni cb ON cb.w = bi.w2
CROSS JOIN tot
WHERE n_ab >= 5
ORDER BY pmi_ratio DESC, w1, w2
LIMIT 50
""",
    doc="Phrase mining by pointwise mutual information: adjacent-bigram "
    "lift over independence, p(ab)/(p(a)p(b)) — the word2vec-style "
    "collocation detector. All aggregates are integer counts; the ratio "
    "is ONE fixed expression tree of exactly-rounded IEEE ops over exact "
    "integers, mirrored verbatim in the oracle, so both engines produce "
    "bit-identical doubles (no float ever crosses an aggregation "
    "boundary — the registry determinism rule). Min-count 5 prunes the "
    "noise tail; (ratio, w1, w2) is a total order for the top-50. "
    "Shape: two map-side-combinable counts + two vocab-keyed joins "
    "(left to AQE: broadcast when the vocab is small, shuffle when a "
    "real corpus makes it millions of rows — a forced broadcast here "
    "would be the 100 TB trap) + global top-k.",
    tags=("text", "corpus", "lm"),
    bench=True,
)
def phrase_pmi_top50(spark: SparkSession, sf_dir: str):
    # r11 restructure (guide §2.4): the original computed `uni` and `bi`
    # as independent explodes over the token stream, and referenced
    # `uni` three times (c_a, c_b, n_uni) and `bi` twice — Catalyst
    # re-executed the normalize+split+explode chain per reference:
    # FIVE documents scans. One ordinal explode emitting (w1 = ws[i],
    # w2 = ws[i+1] | NULL-at-end) carries both count families: every
    # token occurs exactly once as w1, so uni = sum over w1; bigrams
    # are the non-null-w2 rows. Aggregated once into a vocab²-bounded
    # pair-count table and persisted — uni/bi/totals are cheap rollups
    # of the cache. Counts (and therefore every output value) are
    # identical.
    d = t_cpu(spark, sf_dir, "documents")
    norm = normalized_text("text")
    toks = d.filter(F.length(norm) > 0).select(F.split(norm, " ").alias("ws"))
    pairs = (
        toks.select(
            F.explode(F.sequence(F.lit(1), F.size("ws"))).alias("i"), "ws"
        )
        .select(
            F.element_at("ws", F.col("i")).alias("w1"),
            F.when(
                F.col("i") < F.size("ws"),
                F.element_at("ws", F.col("i") + 1),
            ).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .persist()
    )
    uni = pairs.groupBy(F.col("w1").alias("w")).agg(
        F.sum("n_ab").cast("bigint").alias("c")
    )
    bi = pairs.filter(F.col("w2").isNotNull())
    tot = uni.agg(F.sum("c").cast("bigint").alias("n_uni")).crossJoin(
        bi.agg(F.sum("n_ab").cast("bigint").alias("n_bi"))
    )
    ca = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    cb = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    ratio = (
        (F.col("n_ab").cast("double") * F.col("n_uni") / F.col("c_a"))
        * (F.col("n_uni").cast("double") / F.col("n_bi"))
    ) / F.col("c_b")
    return (
        bi.filter(F.col("n_ab") >= 5)
        .join(ca, "w1")
        .join(cb, "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "n_ab", "c_a", "c_b", ratio.alias("pmi_ratio"))
        .orderBy(F.col("pmi_ratio").desc(), "w1", "w2")
        .limit(50)
    )


@register(
    "udtf_run_length",
    oracle="""
WITH s AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), w AS (
  SELECT doc_id, words[i] AS word, i
  FROM s, UNNEST(range(1, len(words) + 1)) AS t(i)
), f AS (
  SELECT doc_id, word, i,
         CASE WHEN lag(word) OVER (PARTITION BY doc_id ORDER BY i)
                   IS DISTINCT FROM word
              THEN 1 ELSE 0 END AS brk
  FROM w
), runs AS (
  SELECT doc_id,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run_id
  FROM f
), r AS (
  SELECT doc_id, run_id, COUNT(*) AS run_len FROM runs GROUP BY 1, 2
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_runs,
       CAST(MAX(run_len) AS BIGINT) AS max_run_len,
       CAST(SUM(run_len) AS BIGINT) AS n_tokens
FROM r GROUP BY 1
""",
    doc="Python UDTF surface (Spark 4 user-defined TABLE function, "
    "LATERAL-joined): a run-length encoder over each document's token "
    "stream — one input row fans out to one row per run, the "
    "row-to-relation shape scalar UDFs cannot express. This gates the "
    "third engine-extension surface next to the Python Data Source "
    "(pysource_partitioned_read) and native VARIANT "
    "(json_variant_native). Deliberate scope note: UDTFs execute "
    "Python per row — the HOT text paths in this repo stay on in-row "
    "built-ins (text_repetition_stats computes run stats with an "
    "aggregate() fold); the UDTF is the right tool when the fan-out "
    "logic genuinely needs Python (external tokenizers, parsers). The "
    "oracle replays the RLE relationally: ordinal unnest + lag-break "
    "islands + per-run counts must reconcile exactly, including "
    "n_tokens = sum of run lengths.",
    tags=("text", "udtf", "extension", "agg"),
)
def udtf_run_length(spark: SparkSession, sf_dir: str):
    from pyspark.sql.functions import udtf

    @udtf(returnType="run_idx int, token string, run_len int")
    class RunLengthEncode:
        def eval(self, text: str):
            if text is None:
                return
            run_idx, prev, n = 0, None, 0
            for word in text.split(" "):
                if prev is None or word == prev:
                    n += 1
                else:
                    yield (run_idx, prev, n)
                    run_idx, n = run_idx + 1, 1
                prev = word
            if prev is not None:
                yield (run_idx, prev, n)

    spark.udtf.register("rle_udtf", RunLengthEncode)
    t_cpu(spark, sf_dir, "documents").createOrReplaceTempView("v_docs_rle")
    return spark.sql(
        """
        SELECT d.doc_id, COUNT(*) AS n_runs,
               CAST(MAX(r.run_len) AS BIGINT) AS max_run_len,
               SUM(r.run_len) AS n_tokens
        FROM v_docs_rle d, LATERAL rle_udtf(d.text) r
        GROUP BY d.doc_id
        """
    )


@register(
    "text_simpson_concentration",
    oracle="""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), c AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM w GROUP BY 1, 2
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(SUM(c * c) AS BIGINT) AS ssq
FROM c GROUP BY 1
""",
    doc="Token-concentration (Simpson index) per document in EXACT "
    "integers: n_distinct, n_tokens and the sum of squared token "
    "counts — ssq/n_tokens^2 is the probability two random tokens "
    "coincide, the repetition-concentration signal that complements "
    "text_repetition_stats' run/top-share heuristics (a doc can pass "
    "both run-length and top-word gates yet be pathologically "
    "concentrated across MANY repeated types; Simpson catches that). "
    "Emitting the integer numerators instead of the ratio keeps the "
    "gate bit-exact and lets the caller pick the diversity transform "
    "(Simpson, inverse-Simpson, Herfindahl) without re-scanning. "
    "Shape: explode -> two map-side-combinable integer aggregates — "
    "the canonical token-statistics shuffle, skew-free (keys are "
    "(doc, token)).",
    tags=("text", "corpus", "quality", "agg"),
)
def text_simpson_concentration(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    counts = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    return counts.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum("c").alias("n_tokens"),
        F.sum(F.col("c") * F.col("c")).alias("ssq"),
    )


@register(
    "search_inverted_index",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term
  FROM documents WHERE length({_NORM}) > 0
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
), df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
), q AS (
  SELECT unnest(['table', 'hash', 'merge']) AS term
), weighted AS (
  SELECT q.term, CAST(1000000 // df.df AS BIGINT) AS w
  FROM q JOIN df ON df.term = q.term
), scored AS (
  SELECT tf.doc_id,
         CAST(SUM(tf.tf * w.w) AS BIGINT) AS score,
         CAST(COUNT(*) AS BIGINT) AS n_terms_hit
  FROM tf JOIN weighted w ON w.term = tf.term
  GROUP BY 1
)
SELECT doc_id, score, n_terms_hit
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT 10
""",
    doc="Inverted-index keyword retrieval — the search-engine shape: a "
    "3-term query joins the (term -> doc, tf) posting table through "
    "per-term integer IDF weights (1e6 DIV df — truncated inverse "
    "document frequency; an integer PER-TERM weight makes the "
    "per-doc score an exact integer SUM, order-independent where "
    "float idf summation would depend on aggregation order), and the "
    "top-10 documents come back by (score, id). Scale shape: the "
    "postings build is the same two map-side-combinable aggregates "
    "as TF-IDF; the 3-row weighted query-term table broadcasts onto "
    "the postings (never the reverse), so per-query work is "
    "proportional to the query terms' posting lists — the property "
    "that makes inverted search sublinear; the global top-10 is "
    "TakeOrderedAndProject. n_terms_hit doubles as an AND/OR "
    "semantics hook (filter = 3 gives conjunctive retrieval).",
    tags=("text", "search", "inverted-index", "topk"),
)
def search_inverted_index(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents")
    norm = normalized_text("text")
    toks = (
        d.select("doc_id", norm.alias("norm"))
        .filter(F.length("norm") > 0)
        .select("doc_id", F.explode(F.split(F.col("norm"), " ")).alias("term"))
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    q = spark.createDataFrame(
        [("table",), ("hash",), ("merge",)], "term string"
    )
    weighted = q.join(df_, "term").select(
        "term", F.expr("1000000 DIV df").cast("bigint").alias("w")
    )
    scored = (
        tf.join(F.broadcast(weighted), "term")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("tf") * F.col("w")).cast("bigint").alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(10)


@register(
    "search_phrase_positions",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS l
  FROM documents WHERE length({_NORM}) > 0
), pos AS (
  SELECT doc_id, CAST(g.p AS BIGINT) AS pos, l[g.p] AS term
  FROM toks, unnest(generate_series(1, len(l))) AS g(p)
  WHERE l[g.p] IN ('hash', 'table')
), agg AS (
  SELECT doc_id,
         list(pos) FILTER (WHERE term = 'hash') AS hp,
         list(pos) FILTER (WHERE term = 'table') AS tp
  FROM pos GROUP BY doc_id
), m AS (
  SELECT doc_id,
         list_intersect(list_transform(hp, x -> x + 1), tp) AS mt
  FROM agg
)
SELECT doc_id, CAST(len(mt) AS BIGINT) AS n_phrase_hits,
       CAST(list_min(mt) - 1 AS BIGINT) AS first_pos
FROM m WHERE len(mt) > 0
ORDER BY n_phrase_hits DESC, doc_id ASC LIMIT 20
""",
    doc="POSITIONAL inverted-index phrase search — the capability the "
    "doc-level index (search_inverted_index) lacks: find documents "
    "containing the exact phrase 'hash table' (adjacent tokens, in "
    "order), with hit counts and the first match position. Engine: the "
    "postings stream is filtered to the query's terms BEFORE any "
    "shuffle (work ∝ the two posting lists, the property that keeps "
    "phrase queries sublinear), then ONE groupBy(doc_id) collects each "
    "term's position set and adjacency is resolved IN-ROW as "
    "array_intersect(hash_positions+1, table_positions) — no positional "
    "self-join, no pair blowup; set ops are order-insensitive so the "
    "nondeterministic collect_list order never surfaces. first_pos is "
    "the position of 'hash' (min matched successor − 1). Oracle: "
    "1-based list indexing + list_intersect over the same integer "
    "positions.",
    tags=("text", "search", "inverted-index", "positions"),
    bench=True,
)
def search_phrase_positions(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents")
    norm = normalized_text("text")
    toks = (
        d.select("doc_id", norm.alias("nt"))
        .filter(F.length("nt") > 0)
        .select(
            "doc_id",
            F.posexplode(F.split(F.col("nt"), " ")).alias("p0", "term"),
        )
        .filter(F.col("term").isin("hash", "table"))
        .select(
            "doc_id",
            (F.col("p0") + 1).cast("bigint").alias("pos"),
            "term",
        )
    )
    agg = toks.groupBy("doc_id").agg(
        F.collect_list(
            F.when(F.col("term") == "hash", F.col("pos"))
        ).alias("hp"),
        F.collect_list(
            F.when(F.col("term") == "table", F.col("pos"))
        ).alias("tp"),
    )
    mt = F.array_intersect(
        F.transform(F.col("hp"), lambda x: x + 1), F.col("tp")
    )
    out = (
        agg.select(
            "doc_id",
            F.size(mt).cast("bigint").alias("n_phrase_hits"),
            (F.array_min(mt) - 1).cast("bigint").alias("first_pos"),
        )
        .filter(F.col("n_phrase_hits") > 0)
    )
    return out.orderBy(
        F.col("n_phrase_hits").desc(), F.col("doc_id")
    ).limit(20)


@register(
    "search_query_expansion",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term
  FROM documents WHERE length({_NORM}) > 0
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
), df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
seed AS (SELECT unnest(['table', 'hash', 'merge']) AS term),
w1 AS (
  SELECT seed.term, CAST(1000000 // df.df AS BIGINT) AS w
  FROM seed JOIN df ON df.term = seed.term
), round1 AS (
  SELECT tf.doc_id FROM tf JOIN w1 ON w1.term = tf.term
  GROUP BY tf.doc_id
  ORDER BY SUM(tf.tf * w1.w) DESC, tf.doc_id ASC LIMIT 3
), fb_tf AS (
  SELECT tf.term, CAST(SUM(tf.tf) AS BIGINT) AS total_tf
  FROM tf JOIN round1 USING (doc_id)
  WHERE tf.term NOT IN (SELECT term FROM seed)
  GROUP BY 1
), expansion AS (
  SELECT term FROM (
    SELECT fb_tf.term,
           CAST(fb_tf.total_tf * n.n_docs AS DOUBLE) / df.df AS sc
    FROM fb_tf JOIN df ON df.term = fb_tf.term, n
  ) ORDER BY sc DESC, term ASC LIMIT 2
), full_q AS (
  SELECT term FROM seed UNION SELECT term FROM expansion
), w2 AS (
  SELECT full_q.term, CAST(1000000 // df.df AS BIGINT) AS w
  FROM full_q JOIN df ON df.term = full_q.term
)
SELECT doc_id, score, n_terms_hit FROM (
  SELECT tf.doc_id, CAST(SUM(tf.tf * w2.w) AS BIGINT) AS score,
         CAST(COUNT(*) AS BIGINT) AS n_terms_hit
  FROM tf JOIN w2 ON w2.term = tf.term
  GROUP BY 1
) ORDER BY score DESC, doc_id ASC LIMIT 10
""",
    doc="Pseudo-relevance-feedback query expansion (Rocchio's loop, "
    "deterministic): the seed query retrieves its top-3 documents, "
    "their 2 strongest non-seed terms (feedback tf AGGREGATED to an "
    "integer before the single idf division — summing per-doc float "
    "scores would be order-dependent) join the query, and the "
    "expanded 5-term query re-retrieves — the zero-model recall "
    "booster between plain keyword search and dense retrieval. Every "
    "ranking in the chain is integer-scored or single-division with "
    "id/term tiebreaks, so the full two-round trace is "
    "engine-reproducible; each round's cost stays proportional to "
    "the (broadcast) query's posting lists.",
    tags=("text", "search", "inverted-index", "feedback", "topk"),
)
def search_query_expansion(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents")
    norm = normalized_text("text")
    toks = (
        d.select("doc_id", norm.alias("norm"))
        .filter(F.length("norm") > 0)
        .select("doc_id", F.explode(F.split(F.col("norm"), " ")).alias("term"))
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    seed = spark.createDataFrame(
        [("table",), ("hash",), ("merge",)], "term string"
    )
    w1 = seed.join(df_, "term").select(
        "term", F.expr("1000000 DIV df").cast("bigint").alias("w")
    )
    round1 = (
        tf.join(F.broadcast(w1), "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("w")).alias("s"))
        .orderBy(F.col("s").desc(), F.col("doc_id"))
        .limit(3)
        .select("doc_id")
    )
    fb_tf = (
        tf.join(F.broadcast(round1), "doc_id")
        .join(seed, "term", "left_anti")
        .groupBy("term")
        .agg(F.sum("tf").cast("bigint").alias("total_tf"))
    )
    expansion = (
        fb_tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "term",
            ((F.col("total_tf") * F.col("n_docs")).cast("double") / F.col("df"))
            .alias("sc"),
        )
        .orderBy(F.col("sc").desc(), F.col("term"))
        .limit(2)
        .select("term")
    )
    full_q = seed.unionByName(expansion).distinct()
    w2 = full_q.join(df_, "term").select(
        "term", F.expr("1000000 DIV df").cast("bigint").alias("w")
    )
    return (
        tf.join(F.broadcast(w2), "term")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("tf") * F.col("w")).cast("bigint").alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(10)
    )


@register(
    "text_zipf_profile",
    oracle=f"""
WITH toks AS (
  SELECT unnest(string_split({_NORM}, ' ')) AS tok
  FROM documents WHERE length({_NORM}) > 0
), freq AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS f FROM toks GROUP BY 1
), ranked AS (
  SELECT tok, f,
         CAST(row_number() OVER (ORDER BY f DESC, tok ASC) AS BIGINT) AS rnk
  FROM freq
), top1 AS (SELECT MAX(f) AS f1 FROM freq)
SELECT r.rnk, r.tok, r.f,
       r.rnk * r.f AS rank_x_freq,
       CAST(r.f * 1000 // t.f1 AS BIGINT) AS of_top1_permille
FROM ranked r, top1 t
WHERE r.rnk <= 30
ORDER BY r.rnk
""",
    doc="Zipf rank-frequency profile of the corpus vocabulary: top-30 "
    "tokens with rank, frequency, the rank*frequency product (constant "
    "under an ideal Zipf law — its drift IS the deviation measure) and "
    "frequency as permille of the top token. The one-glance corpus "
    "health check: natural language bends toward a straight rank*freq "
    "line, boilerplate-polluted or template-generated corpora show a "
    "flat head or stepped plateaus — and it doubles as the stopword-"
    "cutoff picker for the prefix-filter/decontamination caps. One "
    "token aggregate + a top-30 rank (WindowGroupLimit-sized); all "
    "integer.",
    tags=("text", "corpus", "profile", "topk"),
)
def text_zipf_profile(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    d = t_cpu(spark, sf_dir, "documents")
    norm = normalized_text("text")
    toks = (
        d.select(norm.alias("norm"))
        .filter(F.length("norm") > 0)
        .select(F.explode(F.split(F.col("norm"), " ")).alias("tok"))
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    top1 = freq.agg(F.max("f").alias("f1"))
    # global top-30 FIRST (TakeOrderedAndProject), THEN rank within the
    # bounded 30-row result — never a vocabulary-sized unpartitioned
    # window.
    top30 = freq.orderBy(F.col("f").desc(), F.col("tok")).limit(30)
    w = Window.orderBy(F.col("f").desc(), F.col("tok"))
    ranked = top30.withColumn("rnk", F.row_number().over(w).cast("bigint"))
    return (
        ranked.crossJoin(F.broadcast(top1))
        .select(
            "rnk", "tok", "f",
            (F.col("rnk") * F.col("f")).alias("rank_x_freq"),
            F.expr("f * 1000 DIV f1").cast("bigint")
            .alias("of_top1_permille"),
        )
        .orderBy("rnk")
    )


@register(
    "keyphrase_rake",
    oracle=f"""
WITH cand AS (
  SELECT trim(p) AS phrase
  FROM (
    SELECT unnest(string_split(
             regexp_replace({_NORM}, '\\b(the|a|and|of)\\b', '|', 'g'),
             '|')) AS p
    FROM documents WHERE length({_NORM}) > 0
  )
  WHERE length(trim(p)) > 0 AND contains(trim(p), ' ')
), words AS (
  SELECT phrase, unnest(string_split(phrase, ' ')) AS w,
         CAST(len(string_split(phrase, ' ')) AS BIGINT) AS plen
  FROM cand
), stats AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(plen) AS BIGINT) AS deg
  FROM words GROUP BY 1
), occ AS (
  SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences
  FROM cand GROUP BY 1
), dwords AS (
  SELECT DISTINCT phrase, w FROM words
), scored AS (
  SELECT dw.phrase,
         CAST(SUM((s.deg * 1000000) // s.freq) AS BIGINT) AS score
  FROM dwords dw JOIN stats s ON s.w = dw.w
  GROUP BY 1
)
SELECT sc.phrase, o.n_occurrences, sc.score
FROM scored sc JOIN occ o ON o.phrase = sc.phrase
ORDER BY sc.score DESC, sc.phrase ASC
LIMIT 20
""",
    doc="RAKE keyphrase extraction: stopwords act as phrase DELIMITERS "
    "(the co-occurrence insight — content words that travel together "
    "between stopwords form the candidate phrases), word stats come "
    "from every candidate occurrence, and each DISTINCT phrase scores "
    "the sum of its words' ratios — kept integer as deg*1e6 DIV freq "
    "per word so the sum is exact and order-free (float RAKE sums "
    "diverge by aggregation order). Top-20 distinct phrases with "
    "occurrence counts: the zero-model document-tagging/topic-surface "
    "op next to c-TF-IDF (which needs cluster labels; RAKE needs "
    "nothing). Shapes: regex delimiter pass is a narrow map; word "
    "stats and phrase scores are two map-side-combinable aggregates; "
    "the global top-20 is TakeOrderedAndProject.",
    tags=("text", "corpus", "keyphrase", "topk"),
)
def keyphrase_rake(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents")
    norm = normalized_text("text")
    cand = (
        d.select(norm.alias("norm"))
        .filter(F.length("norm") > 0)
        .select(
            F.explode(
                F.split(
                    F.regexp_replace(
                        F.col("norm"), r"\b(the|a|and|of)\b", "|"
                    ),
                    r"\|",
                )
            ).alias("p")
        )
        .select(F.trim(F.col("p")).alias("phrase"))
        .filter((F.length("phrase") > 0) & F.col("phrase").contains(" "))
    )
    words = cand.select(
        "phrase",
        F.explode(F.split(F.col("phrase"), " ")).alias("w"),
        F.size(F.split(F.col("phrase"), " ")).cast("bigint").alias("plen"),
    )
    stats = words.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").cast("bigint").alias("deg"),
    )
    occ = cand.groupBy("phrase").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    dwords = words.select("phrase", "w").distinct()
    scored = (
        dwords.join(F.broadcast(stats), "w")
        .groupBy("phrase")
        .agg(
            F.sum(F.expr("(deg * 1000000) DIV freq")).cast("bigint")
            .alias("score")
        )
    )
    return (
        scored.join(occ, "phrase")
        .select("phrase", "n_occurrences", "score")
        .orderBy(F.col("score").desc(), F.col("phrase"))
        .limit(20)
    )


@register(
    "text_hapax_richness",
    oracle=f"""
WITH toks AS (
  SELECT source, unnest(string_split({_NORM}, ' ')) AS tok
  FROM documents WHERE length({_NORM}) > 0
), freq AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS f
  FROM toks GROUP BY 1, 2
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS vocab,
       CAST(SUM(f) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) * 1000 // COUNT(*)
            AS BIGINT) AS hapax_vocab_permille
FROM freq GROUP BY 1
""",
    doc="Hapax-legomena vocabulary richness per source: the share of "
    "the vocabulary appearing exactly once — high hapax rate means "
    "productive/creative text (or OCR noise), low means templated or "
    "heavily duplicated content; tracked per source it is the "
    "lexical-diversity axis of corpus composition next to the length "
    "drift (corpus_source_drift) and Zipf head (text_zipf_profile) "
    "views. One token aggregate, one per-source rollup, integer "
    "permille — the full vocabulary never leaves the executors.",
    tags=("text", "corpus", "profile", "agg"),
)
def text_hapax_richness(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents")
    norm = normalized_text("text")
    toks = (
        d.select("source", norm.alias("norm"))
        .filter(F.length("norm") > 0)
        .select("source", F.explode(F.split(F.col("norm"), " ")).alias("tok"))
    )
    freq = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("f"))
    return freq.groupBy("source").agg(
        F.count(F.lit(1)).alias("vocab"),
        F.sum("f").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).cast("bigint")
        .alias("hapax"),
        F.expr(
            "SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) * 1000 DIV COUNT(*)"
        ).cast("bigint").alias("hapax_vocab_permille"),
    )


@register(
    "tokenizer_fertility_by_lang",
    oracle=f"""
WITH per_doc AS (
  SELECT lang,
         CAST(len(regexp_extract_all(lower(text),
                  '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_bpe,
         CAST(CASE WHEN length({_NORM}) = 0 THEN 0
              ELSE length({_NORM})
                   - length(replace({_NORM}, ' ', '')) + 1 END
              AS BIGINT) AS n_words
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bpe) AS BIGINT) AS bpe_tokens,
       CAST(SUM(n_words) AS BIGINT) AS ws_words,
       CAST(CASE WHEN SUM(n_words) = 0 THEN 0
            ELSE (SUM(n_bpe) * 1000) // SUM(n_words) END AS BIGINT)
         AS fertility_milli
FROM per_doc
GROUP BY 1
""",
    doc="Tokenizer FERTILITY per language — BPE-ish tokens emitted per "
    "whitespace word (the standard multilingual-tokenizer QA metric: "
    "fertility far above the English baseline means the vocabulary "
    "under-serves that language, inflating sequence lengths and "
    "training cost; the mT5/XLM-R papers track exactly this ratio "
    "when sizing multilingual vocabularies). Numerator reuses "
    "text_bpe_tokens' pre-tokenizer split (letter runs | digit runs | "
    "single punctuation), denominator text_token_stats' whitespace "
    "count, both computed in the same narrow scan; the per-language "
    "roll-up is one map-side-combinable aggregate with the ratio as "
    "exact integer milli-units (floor division) — engine-portable, no "
    "float crosses the aggregation. Pairs with tokenizer_oov_rate "
    "(coverage) to give the two halves of tokenizer QA.",
    tags=("text", "tokenize", "agg"),
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents")
    lower = F.lower(F.col("text"))
    norm = F.trim(F.regexp_replace(lower, r"\s+", " "))
    n_bpe = F.size(
        F.regexp_extract_all(
            lower, F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0)
        )
    ).cast("bigint")
    n_words = (
        F.when(F.length(norm) == 0, F.lit(0))
        .otherwise(
            F.length(norm) - F.length(F.regexp_replace(norm, " ", "")) + 1
        )
        .cast("bigint")
    )
    return (
        d.select("lang", n_bpe.alias("n_bpe"), n_words.alias("n_words"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bpe").alias("bpe_tokens"),
            F.sum("n_words").alias("ws_words"),
        )
        .select(
            "lang",
            "n_docs",
            "bpe_tokens",
            "ws_words",
            F.when(F.col("ws_words") == 0, F.lit(0).cast("bigint"))
            .otherwise(
                F.expr("(bpe_tokens * 1000) div ws_words").cast("bigint")
            )
            .alias("fertility_milli"),
        )
    )


@register(
    "search_bm25_rational",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term
  FROM documents WHERE length({_NORM}) > 0
), dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY 1
), tot AS (
  SELECT CAST(SUM(dl) AS BIGINT) AS t_tokens,
         CAST(COUNT(*) AS BIGINT) AS d_docs
  FROM dl
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
), q AS (SELECT unnest(['hash', 'merge', 'window']) AS term),
df AS (
  SELECT tf.term, CAST(COUNT(*) AS BIGINT) AS df
  FROM tf JOIN q ON q.term = tf.term GROUP BY 1
), idf AS (
  SELECT df.term,
         ((2 * (tot.d_docs - df.df) + 1) * 1000000) // (2 * df.df + 1)
           AS idf_ppm
  FROM df, tot
), per_term AS (
  SELECT tf.doc_id, tf.term,
         (idf.idf_ppm
          * ((44 * tf.tf * 1000000)
             // (20 * tf.tf * 1000000 + 6000000
                 + 18 * ((dl.dl * 1000000)
                         // (tot.t_tokens // tot.d_docs)))))
         // 1000000 AS term_score_ppm
  FROM tf
  JOIN idf ON idf.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN tot
), scored AS (
  SELECT doc_id,
         CAST(SUM(term_score_ppm) AS BIGINT) AS score_ppm,
         CAST(COUNT(*) AS BIGINT) AS n_terms_hit
  FROM per_term GROUP BY 1
)
SELECT doc_id, score_ppm, n_terms_hit
FROM scored
ORDER BY score_ppm DESC, doc_id ASC
LIMIT 10
""",
    doc="BM25 ranking in EXACT RATIONAL arithmetic — the IR-standard "
    "lexical scorer with both of its signature mechanics intact: tf "
    "SATURATION (k1 = 6/5: a term's 50th occurrence adds almost "
    "nothing) and document-LENGTH normalization (b = 3/4: long docs "
    "don't win by volume), neither of which the plain idf-weighted "
    "scorer (search_inverted_index) has. With k1, b as exact "
    "fractions the saturation factor tf*(k1+1) / (tf + k1*(1-b+"
    "b*dl/avgdl)) clears to the integer ratio 44*tf*1e6 / (20*tf*1e6 "
    "+ 6e6 + 18*dl_rel_ppm) where dl_rel_ppm = dl*D*1e6 div T — all "
    "64-bit integer multiplies and floor divisions, bit-identical on "
    "any engine. The idf factor is the raw Robertson odds ratio "
    "(N-df+0.5)/(df+0.5) in ppm (fraction-cleared to (2(N-df)+1)/"
    "(2df+1)) WITHOUT the log: log is libm territory (not gate-"
    "comparable, see plans/registry.py) — per-term ranking is "
    "unchanged (log is monotone) and multi-term sums weight rare "
    "terms more sharply than log-BM25, a documented, deterministic "
    "tradeoff. Shape at scale: posting-list tf aggregate, 3-row "
    "broadcast idf, doc-keyed length join, global top-10 as "
    "TakeOrderedAndProject (per-partition top-k + driver merge of "
    "k*partitions rows).",
    tags=("text", "search", "topk"),
    bench=True,
)
def search_bm25_rational(spark: SparkSession, sf_dir: str):
    scored = _bm25_scored(spark, sf_dir).select(
        "doc_id", "score_ppm", F.col("rel").alias("n_terms_hit")
    )
    return scored.orderBy(F.col("score_ppm").desc(), F.col("doc_id")).limit(10)


#: The fixed 3-term query both BM25 consumers score against.
_BM25_TERMS = ("hash", "merge", "window")


def _bm25_scored(spark: SparkSession, sf_dir: str):
    """Per-doc BM25 scores (doc_id, score_ppm, rel) for the fixed 3-term
    query, from ONE documents scan (r11 guide §2.4/§2.3 restructure).

    The original shape recomputed the normalize+split+explode token
    stream FIVE times (tf over ALL terms, distinct-term df, d_docs, and
    dl twice — 5 parquet scans, 8 exchanges). With a 3-term query every
    derived quantity folds into one doc-keyed aggregate over the token
    stream: dl = count, tf_t = conditional count per query term. From
    that per-doc table (persisted, doc-count-sized): df_t / t_tokens /
    d_docs are one global aggregate row (broadcast), and each doc's
    score is the same integer expression as the per-(doc,term)
    formulation, summed over the <= 3 terms in-row — identical values,
    identical tie semantics, one scan, one doc-keyed exchange.
    """
    d = t_cpu(spark, sf_dir, "documents")
    norm = normalized_text("text")
    toks = (
        d.select("doc_id", norm.alias("norm"))
        .filter(F.length("norm") > 0)
        .select("doc_id", F.explode(F.split(F.col("norm"), " ")).alias("term"))
    )
    per_doc = (
        toks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("dl"),
            *[
                F.sum(F.when(F.col("term") == w, 1).otherwise(0))
                .cast("bigint")
                .alias(f"tf_{i}")
                for i, w in enumerate(_BM25_TERMS)
            ],
        )
        .persist()
    )
    consts = per_doc.agg(
        F.sum("dl").cast("bigint").alias("t_tokens"),
        F.count(F.lit(1)).alias("d_docs"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    ).select(
        "t_tokens",
        "d_docs",
        *[
            F.expr(f"((2 * (d_docs - df_{i}) + 1) * 1000000) div (2 * df_{i} + 1)")
            .alias(f"idf_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    term_score = " + ".join(
        f"(CASE WHEN tf_{i} > 0 THEN"
        f" (idf_{i} * ((44 * tf_{i} * 1000000)"
        f" div (20 * tf_{i} * 1000000 + 6000000"
        f" + 18 * ((dl * 1000000) div (t_tokens div d_docs)))))"
        f" div 1000000 ELSE 0 END)"
        for i in range(len(_BM25_TERMS))
    )
    n_hit = " + ".join(
        f"(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)"
        for i in range(len(_BM25_TERMS))
    )
    return (
        per_doc.filter(F.expr(n_hit) > 0)
        .crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            F.expr(term_score).cast("bigint").alias("score_ppm"),
            F.expr(n_hit).cast("bigint").alias("rel"),
        )
    )


#: round(1000 / log2(rank+1)) for rank 1..10 — the nDCG position
#: discount as an embedded integer table (log2 itself is libm territory,
#: not gate-comparable; a 10-literal table is bit-identical everywhere —
#: the privacy_dp_noisy_counts inverse-CDF trick applied to ranking).
_NDCG_DISCOUNT_MILLI = [1000, 631, 500, 431, 387, 356, 333, 315, 301, 289]


@register(
    "search_ndcg_eval",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term
  FROM documents WHERE length({_NORM}) > 0
), dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY 1
), tot AS (
  SELECT CAST(SUM(dl) AS BIGINT) AS t_tokens,
         CAST(COUNT(*) AS BIGINT) AS d_docs
  FROM dl
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
), q AS (SELECT unnest(['hash', 'merge', 'window']) AS term),
df AS (
  SELECT tf.term, CAST(COUNT(*) AS BIGINT) AS df
  FROM tf JOIN q ON q.term = tf.term GROUP BY 1
), idf AS (
  SELECT df.term,
         ((2 * (tot.d_docs - df.df) + 1) * 1000000) // (2 * df.df + 1)
           AS idf_ppm
  FROM df, tot
), per_term AS (
  SELECT tf.doc_id, tf.term,
         (idf.idf_ppm
          * ((44 * tf.tf * 1000000)
             // (20 * tf.tf * 1000000 + 6000000
                 + 18 * ((dl.dl * 1000000)
                         // (tot.t_tokens // tot.d_docs)))))
         // 1000000 AS term_score_ppm
  FROM tf
  JOIN idf ON idf.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN tot
), scored AS (
  SELECT doc_id,
         CAST(SUM(term_score_ppm) AS BIGINT) AS score_ppm,
         CAST(COUNT(*) AS BIGINT) AS rel
  FROM per_term GROUP BY 1
), disc AS (
  SELECT generate_subscripts(l, 1) AS rnk, unnest(l) AS d_milli
  FROM (SELECT {_NDCG_DISCOUNT_MILLI} AS l)
), ranked AS (
  SELECT rel, row_number() OVER (ORDER BY score_ppm DESC, doc_id ASC) AS rnk
  FROM scored
), ideal AS (
  SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id ASC) AS rnk
  FROM scored
), dcg AS (
  SELECT CAST(SUM(r.rel * d.d_milli) AS BIGINT) AS dcg_milli
  FROM ranked r JOIN disc d ON d.rnk = r.rnk
), idcg AS (
  SELECT CAST(SUM(i.rel * d.d_milli) AS BIGINT) AS idcg_milli
  FROM ideal i JOIN disc d ON d.rnk = i.rnk
)
SELECT dcg.dcg_milli, idcg.idcg_milli,
       CAST((1000 * dcg.dcg_milli) // idcg.idcg_milli AS BIGINT)
         AS ndcg_milli,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM scored) AS n_matched
FROM dcg, idcg
""",
    doc="Ranking-quality EVAL for the lexical retrieval stack: exact "
    "integer nDCG@10 of the BM25 ranking (search_bm25_rational's "
    "scoring verbatim) against graded relevance labels rel = number "
    "of distinct query terms matched (0..3, deterministic). The "
    "1/log2(rank+1) position discount — libm territory, not gate-"
    "comparable — is an embedded round(1000/log2(i+1)) table for "
    "ranks 1..10, so DCG, ideal DCG (best permutation of the SAME "
    "graded labels over all matched docs) and ndcg_milli = "
    "1000*DCG div IDCG are all 64-bit integer arithmetic, bit-"
    "identical cross-engine. Completes the retrieval eval family "
    "(recall@k for ANN, AUC for classifiers, nDCG for rankers). "
    "Scale shape: the two row_number windows are global top-10 "
    "consumers over the ~query-matched subset (posting-list sized, "
    "not corpus sized); everything else is the gated BM25 chain.",
    tags=("text", "search", "eval"),
)
def search_ndcg_eval(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window as W

    # Shared single-scan BM25 chain (see _bm25_scored): identical scores
    # and rel = n_terms_hit, from the persisted per-doc stats table —
    # the three downstream consumers (ranked / ideal / n_matched)
    # re-read the cache instead of replaying the corpus chain.
    scored = _bm25_scored(spark, sf_dir)
    disc = spark.createDataFrame(
        [(i + 1, m) for i, m in enumerate(_NDCG_DISCOUNT_MILLI)],
        "rnk int, d_milli bigint",
    )
    # row_number() is already int; an extra cast on it would hide the
    # rank filter from the RankLimit rewrite
    ranked = scored.withColumn(
        "rnk",
        F.row_number().over(
            W.orderBy(F.col("score_ppm").desc(), F.col("doc_id").asc())
        ),
    )
    ideal = scored.withColumn(
        "rnk",
        F.row_number().over(
            W.orderBy(F.col("rel").desc(), F.col("doc_id").asc())
        ),
    )
    # explicit rank<=10 filters (semantically implied by the 10-row
    # discount join) let Catalyst rewrite each global window's input to
    # TakeOrderedAndProject(limit=10) — per-partition top-10 + a 10-row
    # driver merge instead of a one-partition corpus sort (plan pinned
    # in tests/test_plan_quality.py)
    ranked = ranked.filter(F.col("rnk") <= 10)
    ideal = ideal.filter(F.col("rnk") <= 10)
    dcg = ranked.join(F.broadcast(disc), "rnk").agg(
        F.sum(F.col("rel") * F.col("d_milli")).cast("bigint").alias("dcg_milli")
    )
    idcg = ideal.join(F.broadcast(disc), "rnk").agg(
        F.sum(F.col("rel") * F.col("d_milli"))
        .cast("bigint")
        .alias("idcg_milli")
    )
    n = scored.agg(F.count(F.lit(1)).cast("bigint").alias("n_matched"))
    return (
        dcg.crossJoin(F.broadcast(idcg))
        .crossJoin(F.broadcast(n))
        .select(
            "dcg_milli",
            "idcg_milli",
            F.expr("CAST((1000 * dcg_milli) div idcg_milli AS BIGINT)").alias(
                "ndcg_milli"
            ),
            "n_matched",
        )
    )


@register(
    "search_sparse_cosine_join",
    oracle=f"""
WITH sh AS (
  SELECT doc_id,
         unnest(list_distinct(
           CASE WHEN len(ws) >= 3
                THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN range(1, len(ws) - 1)]
                ELSE [] END
         )) AS shingle
  FROM (SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents)
),
tot AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS d_docs FROM sh),
idf AS (
  SELECT shingle,
         LEAST(((2 * (tot.d_docs - COUNT(*)) + 1) * 1000)
               // (2 * COUNT(*) + 1), 300000) AS w
  FROM sh, tot GROUP BY shingle, tot.d_docs
  HAVING COUNT(*) <= 50
),
posting AS (
  SELECT sh.doc_id, sh.shingle, idf.w FROM sh JOIN idf USING (shingle)
),
norms AS (
  SELECT doc_id, SUM(CAST(w AS HUGEINT) * w) AS n2 FROM posting GROUP BY 1
),
num AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         SUM(CAST(a.w AS HUGEINT) * a.w) AS dot,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM posting a
  JOIN posting b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT n.id_a, n.id_b, n.n_shared,
       CAST(n.dot AS DECIMAL(38,0)) AS dot,
       CAST((n.dot * n.dot * 1000000) // (na.n2 * nb.n2) AS BIGINT)
         AS cos2_ppm
FROM num n
JOIN norms na ON na.doc_id = n.id_a
JOIN norms nb ON nb.doc_id = n.id_b
ORDER BY cos2_ppm DESC, id_a ASC, id_b ASC
LIMIT 50
""",
    doc="SPARSE-VECTOR cosine similarity join — the lexical complement "
    "of the dense ANN family: documents as binary idf-weighted "
    "3-shingle vectors, top-50 most-cosine-similar pairs via "
    "inverted-index self-join. Exactness: weights are the Robertson "
    "rational idf in milli (the search_bm25_rational log-free trick), "
    "CAPPED at 300000 so the score arithmetic is CORPUS-SIZE-"
    "INDEPENDENT — dot <= doc_len * w_cap^2 ~ 1.3e13 and the ranking "
    "value (dot^2 * 1e6) div (n2_a * n2_b) stays inside "
    "DECIMAL(38,0)/HUGEINT at any corpus size (uncapped df=1 idf "
    "grows with D and overflows the square at ~5e7 docs). Binary tf "
    "(distinct shingles) keeps w_a = w_b per matched feature, so the "
    "dot product is a sum of idf^2 — one self-join + one aggregate. "
    "Scale shape: the feature space is PRUNED to shingles with "
    "df <= 50 (stop-shingle removal, consistently applied to norms "
    "AND dots, so the score is exactly cosine in the pruned space) — "
    "per-shingle join fan-out is bounded by 50*49/2 pairs, making "
    "candidate volume linear in corpus size; ranking ties at equal "
    "truncated ppm break on (id_a, id_b); top-50 plans as "
    "TakeOrderedAndProject, never a global sort.",
    tags=("text", "search", "similarity", "join", "topk"),
)
def search_sparse_cosine_join(spark: SparkSession, sf_dir: str):
    from ..operators.dedup import shingles

    d = t_cpu(spark, sf_dir, "documents")
    # NOTE (r11, measured and REJECTED): persisting the shingle
    # inventory and/or the posting table here measured wash-to-slower
    # across 5 alternating fresh-JVM A/Bs at sf0.1 (V 7.0-8.9s vs
    # B 6.6-8.6s) — tot prunes to doc_id and idf to shingle, so the
    # recomputed branches are narrower codegen pipelines than the
    # two-column cache materialization (the export_labeled_pairs /
    # keyphrase_rake lesson).
    sh = shingles(d, "text", "doc_id", k=3)
    tot = sh.agg(F.countDistinct("doc_id").cast("bigint").alias("d_docs"))
    idf = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= 50)
        .crossJoin(F.broadcast(tot))
        .select(
            "shingle",
            F.expr(
                "LEAST(((2 * (d_docs - df) + 1) * 1000) DIV (2 * df + 1),"
                " 300000)"
            ).alias("w"),
        )
    )
    posting = sh.join(idf.hint("shuffle_hash"), "shingle")
    norms = posting.groupBy("doc_id").agg(
        F.sum(F.col("w").cast("decimal(19,0)") * F.col("w"))
        .cast("decimal(38,0)")
        .alias("n2")
    )
    a = posting.select(
        F.col("doc_id").alias("id_a"), "shingle", F.col("w").alias("w_a")
    )
    b = posting.select(
        F.col("doc_id").alias("id_b"), "shingle", F.col("w").alias("w_b")
    )
    num = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(F.col("w_a").cast("decimal(19,0)") * F.col("w_b"))
            .cast("decimal(38,0)")
            .alias("dot"),
            F.count(F.lit(1)).cast("bigint").alias("n_shared"),
        )
    )
    na = norms.select(F.col("doc_id").alias("id_a"), F.col("n2").alias("n2_a"))
    nb = norms.select(F.col("doc_id").alias("id_b"), F.col("n2").alias("n2_b"))
    scored = (
        num.join(na.hint("shuffle_hash"), "id_a")
        .join(nb.hint("shuffle_hash"), "id_b")
        .select(
            "id_a", "id_b", "n_shared",
            F.col("dot").cast("decimal(38,0)").alias("dot"),
            F.expr("CAST((dot * dot * 1000000) DIV (n2_a * n2_b) AS BIGINT)")
            .alias("cos2_ppm"),
        )
    )
    return scored.orderBy(
        F.col("cos2_ppm").desc(), F.col("id_a"), F.col("id_b")
    ).limit(50)


@register(
    "keyphrase_textrank",
    oracle=f"""
WITH toks AS (
  SELECT string_split({_NORM}, ' ') AS ws
  FROM documents WHERE length({_NORM}) > 0
), bi AS (
  SELECT ws[i] AS w1, ws[i+1] AS w2
  FROM toks, unnest(CASE WHEN len(ws) >= 2 THEN range(1, len(ws))
                         ELSE [] END) AS t(i)
  WHERE ws[i] <> ws[i+1]
), e AS MATERIALIZED (
  SELECT w1 AS src, w2 AS dst FROM bi
  UNION
  SELECT w2, w1 FROM bi
), nodes AS MATERIALIZED (
  SELECT src AS node FROM e UNION SELECT dst FROM e
), deg AS MATERIALIZED (
  SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1
), n AS (
  SELECT COUNT(*) AS n_nodes FROM nodes
), pr0 AS MATERIALIZED (
  SELECT node, CAST(1000000000000000 AS BIGINT) // n.n_nodes AS pf
  FROM nodes, n
), c1 AS MATERIALIZED (
  SELECT e.dst AS node, SUM(p.pf // d.outdeg) AS s
  FROM e JOIN pr0 p ON p.node = e.src JOIN deg d ON d.src = e.src
  GROUP BY 1
), pr1 AS MATERIALIZED (
  SELECT nodes.node,
         (15 * CAST(1000000000000000 AS BIGINT)) // (100 * n.n_nodes)
         + (85 * COALESCE(c1.s, 0)) // 100 AS pf
  FROM nodes CROSS JOIN n LEFT JOIN c1 ON c1.node = nodes.node
), c2 AS MATERIALIZED (
  SELECT e.dst AS node, SUM(p.pf // d.outdeg) AS s
  FROM e JOIN pr1 p ON p.node = e.src JOIN deg d ON d.src = e.src
  GROUP BY 1
), pr2 AS (
  SELECT nodes.node,
         (15 * CAST(1000000000000000 AS BIGINT)) // (100 * n.n_nodes)
         + (85 * COALESCE(c2.s, 0)) // 100 AS pf
  FROM nodes CROSS JOIN n LEFT JOIN c2 ON c2.node = nodes.node
)
SELECT node AS word, CAST(pf AS BIGINT) AS pr_fixed,
       CAST(pf AS DOUBLE) / CAST(1000000000000000 AS DOUBLE) AS pr
FROM pr2
ORDER BY pr_fixed DESC, word
LIMIT 50
""",
    doc="TextRank keyword extraction: PageRank over the corpus word "
    "co-occurrence graph (window = 2 — DISTINCT symmetric adjacent-token "
    "pairs from the normalized text), two synchronous rounds, top-50 "
    "words by rank. Third keyphrase surface next to RAKE (degree/freq "
    "heuristic) and c-TF-IDF (needs labels) — TextRank is the "
    "graph-centrality one. Reuses operators.graph.pagerank_rounds "
    "verbatim: ranks are FIXED-POINT integers in 1e-15 units, every "
    "step 64-bit multiply/divide/sum, bit-identical across engines "
    "with zero float-order exposure, aggregates map-side combinable. "
    "(pr_fixed, word) totally orders the top-50. Scale shape: the "
    "token explosion is a narrow map over documents; the edge list is "
    "bounded by DISTINCT adjacent vocabulary pairs (vocab-squared "
    "worst case, Zipf-sparse in practice — it grows sub-linearly in "
    "corpus size, unlike the document count); per round one src-keyed "
    "shuffle-hash join + one dst-keyed integer aggregate, the "
    "billion-edge-safe step pagerank_copurchase already proved.",
    tags=("text", "keyphrase", "graph", "iterative", "topk"),
)
def keyphrase_textrank(spark: SparkSession, sf_dir: str):
    from ..operators.graph import pagerank_rounds

    d = t_cpu(spark, sf_dir, "documents")
    norm = normalized_text("text")
    toks = d.filter(F.length(norm) > 0).select(F.split(norm, " ").alias("ws"))
    n = F.size("ws")
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    bi = (
        toks.select(F.explode(idx).alias("i"), "ws")
        .select(
            F.element_at("ws", F.col("i")).alias("w1"),
            F.element_at("ws", F.col("i") + 1).alias("w2"),
        )
        .filter(F.col("w1") != F.col("w2"))
    )
    edges = (
        bi.select(F.col("w1").alias("src"), F.col("w2").alias("dst"))
        .unionAll(bi.select(F.col("w2").alias("src"), F.col("w1").alias("dst")))
        .distinct()
    )
    pr = pagerank_rounds(edges, n_rounds=2, damping_pct=85)
    return (
        pr.select(F.col("node").alias("word"), "pr_fixed", "pr")
        .orderBy(F.col("pr_fixed").desc(), "word")
        .limit(50)
    )


@register(
    "search_query_likelihood",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term
  FROM documents WHERE length({_NORM}) > 0
), dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY 1
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS t_tokens FROM toks
), cf AS (
  SELECT
    CAST(SUM(CASE WHEN term = 'hash' THEN 1 ELSE 0 END) AS BIGINT)
      AS cf_hash,
    CAST(SUM(CASE WHEN term = 'merge' THEN 1 ELSE 0 END) AS BIGINT)
      AS cf_merge,
    CAST(SUM(CASE WHEN term = 'window' THEN 1 ELSE 0 END) AS BIGINT)
      AS cf_window
  FROM toks
), tfp AS (
  SELECT doc_id,
    CAST(SUM(CASE WHEN term = 'hash' THEN 1 ELSE 0 END) AS BIGINT)
      AS tf_hash,
    CAST(SUM(CASE WHEN term = 'merge' THEN 1 ELSE 0 END) AS BIGINT)
      AS tf_merge,
    CAST(SUM(CASE WHEN term = 'window' THEN 1 ELSE 0 END) AS BIGINT)
      AS tf_window
  FROM toks
  WHERE term IN ('hash', 'merge', 'window')
  GROUP BY 1
)
SELECT t.doc_id,
  CAST((CASE WHEN tf_hash > 0 THEN 1 ELSE 0 END)
     + (CASE WHEN tf_merge > 0 THEN 1 ELSE 0 END)
     + (CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_terms_hit,
  (CAST(tf_hash * t_tokens + 2000 * cf_hash AS DOUBLE)
     / CAST(t_tokens * (dl + 2000) AS DOUBLE))
  * (CAST(tf_merge * t_tokens + 2000 * cf_merge AS DOUBLE)
     / CAST(t_tokens * (dl + 2000) AS DOUBLE))
  * (CAST(tf_window * t_tokens + 2000 * cf_window AS DOUBLE)
     / CAST(t_tokens * (dl + 2000) AS DOUBLE)) AS ql_score
FROM tfp t
JOIN dl ON dl.doc_id = t.doc_id
CROSS JOIN tot CROSS JOIN cf
ORDER BY ql_score DESC, t.doc_id ASC
LIMIT 20
""",
    doc="Query-likelihood retrieval with Dirichlet smoothing (mu = 2000, "
    "Zhai & Lafferty) for the fixed query {{hash, merge, window}}: "
    "score(d) = prod_t (tf + mu*cf_t/T)/(dl + mu), the LM-based "
    "ranking function next to BM25 (search_bm25_rational) — smoothing "
    "lets a doc missing one term still rank, which pure-tf scorers "
    "cannot. Fraction-cleared per term to (tf*T + mu*cf_t)/(T*(dl+"
    "mu)): numerator and denominator are exact 64-bit integers, each "
    "factor is ONE division, and the 3-factor product is a fixed "
    "multiplication order written identically on both sides — no logs "
    "(libm is not gate-comparable; the product form is rank-identical "
    "for a fixed-length query). Candidates = docs hitting >= 1 query "
    "term, ranked with smoothed factors for their misses; "
    "(score, doc_id) totally orders the top-20. Shape: tf/cf/dl are "
    "map-side-combinable aggregates; candidate pivot is a 3-column "
    "conditional aggregate (no per-term join fan-out); global top-k "
    "is TakeOrderedAndProject. Integer headroom: tf*T <= 1e3 * 1e12 "
    "at 100 TB corpus scale.",
    tags=("text", "search", "topk"),
)
def search_query_likelihood(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents")
    norm = normalized_text("text")
    toks = (
        d.select("doc_id", norm.alias("norm"))
        .filter(F.length("norm") > 0)
        .select("doc_id", F.explode(F.split(F.col("norm"), " ")).alias("term"))
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("dl"))
    tot = F.broadcast(
        toks.agg(F.count(F.lit(1)).cast("bigint").alias("t_tokens"))
    )
    cf = F.broadcast(
        toks.agg(
            *[
                F.sum(F.when(F.col("term") == q, 1).otherwise(0))
                .cast("bigint")
                .alias(f"cf_{q}")
                for q in ("hash", "merge", "window")
            ]
        )
    )
    tfp = (
        toks.filter(F.col("term").isin("hash", "merge", "window"))
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(F.when(F.col("term") == q, 1).otherwise(0))
                .cast("bigint")
                .alias(f"tf_{q}")
                for q in ("hash", "merge", "window")
            ]
        )
    )
    hits = sum(
        F.when(F.col(f"tf_{q}") > 0, 1).otherwise(0)
        for q in ("hash", "merge", "window")
    ).cast("bigint")
    den = (F.col("t_tokens") * (F.col("dl") + 2000)).cast("double")
    factor = lambda q: (  # noqa: E731
        F.col(f"tf_{q}") * F.col("t_tokens") + 2000 * F.col(f"cf_{q}")
    ).cast("double") / den
    score = factor("hash") * factor("merge") * factor("window")
    return (
        tfp.join(dl, "doc_id")
        .crossJoin(tot)
        .crossJoin(cf)
        .select(
            "doc_id",
            hits.alias("n_terms_hit"),
            score.alias("ql_score"),
        )
        .orderBy(F.col("ql_score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


@register(
    "text_heaps_vocab_growth",
    oracle=f"""
WITH docs AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS ws
  FROM documents WHERE length({_NORM}) > 0
), mx AS (
  SELECT MAX(doc_id) AS max_id FROM documents
), per_doc AS (
  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tok FROM docs
), toks AS (
  SELECT doc_id, unnest(ws) AS term FROM docs
), firsts AS (
  SELECT term, MIN(doc_id) AS first_doc FROM toks GROUP BY 1
), vb AS (
  SELECT CAST(first_doc * 20 // (max_id + 1) AS INT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS new_vocab
  FROM firsts, mx GROUP BY 1
), db AS (
  SELECT CAST(doc_id * 20 // (max_id + 1) AS INT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS n_tokens
  FROM per_doc, mx GROUP BY 1
), spine AS (
  SELECT CAST(unnest(generate_series(0, 19)) AS INT) AS bucket
)
SELECT s.bucket,
       CAST(SUM(COALESCE(db.n_docs, 0)) OVER w AS BIGINT) AS docs_cum,
       CAST(SUM(COALESCE(db.n_tokens, 0)) OVER w AS BIGINT) AS tokens_cum,
       CAST(SUM(COALESCE(vb.new_vocab, 0)) OVER w AS BIGINT) AS vocab_cum
FROM spine s
LEFT JOIN db ON db.bucket = s.bucket
LEFT JOIN vb ON vb.bucket = s.bucket
WINDOW w AS (ORDER BY s.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    doc="Heaps'-law vocabulary-growth curve over the document corpus: "
    "cumulative distinct-token count (and token/doc counts) at 20 "
    "equal-width checkpoints of the doc_id range — the sublinearity "
    "diagnostic (V ~ K*N^b, b<1) a tokenizer-training pipeline reads "
    "before sizing a vocabulary, and a dedup-health signal (a corpus "
    "whose vocab grows LINEARLY is full of unique noise; one that "
    "flattens too fast is boilerplate). The curve needs no global "
    "scan order: a token's first occurrence is just MIN(doc_id) per "
    "term (one map-side-combinable aggregate over the exploded "
    "tokens), bucketed into checkpoints derived from MAX(doc_id)+1 "
    "(data-derived, never a fixed offset — the synthetic-id rule), "
    "and the only window is the running sum over the 20-row bucket "
    "spine. All counts exact bigint.",
    tags=("text", "corpus", "tokenizer"),
)
def text_heaps_vocab_growth(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window as W

    d = t_cpu(spark, sf_dir, "documents")
    norm = normalized_text("text")
    docs = (
        d.select("doc_id", F.split(norm, " ").alias("ws"), norm.alias("nrm"))
        .filter(F.length("nrm") > 0)
        .drop("nrm")
    )
    mx = F.broadcast(
        t_cpu(spark, sf_dir, "documents").agg(
            F.max("doc_id").alias("max_id")
        )
    )
    bucket_of = lambda c: F.expr(f"CAST({c} * 20 DIV (max_id + 1) AS INT)")  # noqa: E731
    per_doc = docs.select(
        "doc_id", F.size("ws").cast("bigint").alias("n_tok")
    )
    toks = docs.select("doc_id", F.explode("ws").alias("term"))
    firsts = toks.groupBy("term").agg(F.min("doc_id").alias("first_doc"))
    vb = (
        firsts.crossJoin(mx)
        .groupBy(bucket_of("first_doc").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_vocab"))
    )
    db = (
        per_doc.crossJoin(mx)
        .groupBy(bucket_of("doc_id").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
    )
    spine = spark.range(20).select(F.col("id").cast("int").alias("bucket"))
    # The running window is over the 20-row checkpoint spine, not the
    # data — bounded constant regardless of corpus size.
    w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        spine.join(F.broadcast(db), "bucket", "left")
        .join(F.broadcast(vb), "bucket", "left")
        .select(
            "bucket",
            F.sum(F.coalesce(F.col("n_docs"), F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("docs_cum"),
            F.sum(F.coalesce(F.col("n_tokens"), F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("tokens_cum"),
            F.sum(F.coalesce(F.col("new_vocab"), F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("vocab_cum"),
        )
    )


#: Fixed two-term query set for the MRR eval — common corpus vocabulary
#: (same domain as search_ndcg_eval's query terms), so every query has
#: relevant (both-term) documents at every gate scale.
_MRR_QUERIES = (
    ("q_hash_merge", "hash", "merge"),
    ("q_window_sort", "window", "sort"),
    ("q_scan_filter", "scan", "filter"),
    ("q_spark_table", "spark", "table"),
    ("q_vector_batch", "vector", "batch"),
)

_MRR_Q_SQL = " UNION ALL ".join(
    f"SELECT '{qid}' AS qid, '{t1}' AS term FROM (VALUES (1)) "
    f"UNION ALL SELECT '{qid}', '{t2}' FROM (VALUES (1))"
    for qid, t1, t2 in _MRR_QUERIES
)


@register(
    "search_mrr_eval",
    oracle=f"""
WITH q AS ({_MRR_Q_SQL}),
toks AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term
  FROM documents WHERE length({_NORM}) > 0
), tf AS MATERIALIZED (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY 1, 2
), cand AS MATERIALIZED (
  SELECT q.qid, tf.doc_id,
         CAST(SUM(tf.tf) AS BIGINT) AS score,
         CAST(COUNT(*) AS BIGINT) AS n_terms
  FROM tf JOIN q ON q.term = tf.term
  GROUP BY 1, 2
), bmax AS (
  SELECT qid, MAX(score) AS s_star, CAST(COUNT(*) AS BIGINT) AS n_rel
  FROM cand WHERE n_terms = 2 GROUP BY 1
), best AS (
  SELECT b.qid, b.s_star, b.n_rel, MIN(c.doc_id) AS d_star
  FROM bmax b
  JOIN cand c ON c.qid = b.qid AND c.n_terms = 2 AND c.score = b.s_star
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT b.qid, b.n_rel, b.s_star, b.d_star,
         1 + CAST(COUNT(c.doc_id) AS BIGINT) AS first_rank
  FROM best b
  LEFT JOIN cand c ON c.qid = b.qid
    AND (c.score > b.s_star
         OR (c.score = b.s_star AND c.doc_id < b.d_star))
  GROUP BY 1, 2, 3, 4
), per_q AS (
  SELECT q.qid,
         CAST(COALESCE(cn.n_cand, 0) AS BIGINT) AS n_cand,
         CAST(COALESCE(r.n_rel, 0) AS BIGINT) AS n_rel,
         r.first_rank,
         CAST(COALESCE(1000000 // r.first_rank, 0) AS BIGINT) AS rr_ppm
  FROM (SELECT DISTINCT qid FROM q) q
  LEFT JOIN ranked r ON r.qid = q.qid
  LEFT JOIN (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_cand
             FROM cand GROUP BY 1) cn ON cn.qid = q.qid
), mrr AS (
  SELECT CAST(SUM(rr_ppm) // COUNT(*) AS BIGINT) AS mrr_ppm FROM per_q
)
SELECT per_q.qid, per_q.n_cand, per_q.n_rel, per_q.first_rank,
       per_q.rr_ppm, mrr.mrr_ppm
FROM per_q CROSS JOIN mrr
""",
    doc="Mean-reciprocal-rank EVAL for the lexical retrieval stack: five "
    "fixed two-term queries, documents ranked by summed term "
    "frequency (score DESC, doc_id ASC — fully deterministic), "
    "relevant = documents matching BOTH terms. The first relevant "
    "rank is computed WITHOUT materializing the ranking: it is 1 + "
    "the count of candidates strictly better than the best relevant "
    "document (max_by over (score, -doc_id)), so no global "
    "row_number window exists at any scale — candidate sets are "
    "posting-list sized, not corpus sized. Reciprocal ranks are "
    "exact integer ppm (1000000 div rank); MRR is their integer-ppm "
    "mean over the fixed query set — no float crosses any "
    "aggregation. Completes the retrieval-eval family next to "
    "search_ndcg_eval (graded DCG) and ann_recall_eval (vector "
    "recall).",
    tags=("text", "search", "eval"),
)
def search_mrr_eval(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents")
    norm = normalized_text("text")
    toks = (
        d.select("doc_id", norm.alias("nrm"))
        .filter(F.length("nrm") > 0)
        .select("doc_id", F.explode(F.split(F.col("nrm"), " ")).alias("term"))
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    qrows = [(qid, term) for qid, t1, t2 in _MRR_QUERIES for term in (t1, t2)]
    q = spark.createDataFrame(qrows, "qid string, term string")
    cand = (
        tf.join(F.broadcast(q), "term")
        .groupBy("qid", "doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("score"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        )
    )
    # cand feeds three consumers (best, better-count, per-query size);
    # persist the posting-list-sized intermediate once.
    cand = cand.persist()
    key = F.struct(F.col("score"), (-F.col("doc_id")).alias("negd"))
    best = (
        cand.filter(F.col("n_terms") == 2)
        .groupBy("qid")
        .agg(
            F.max_by("score", key).alias("s_star"),
            F.max_by("doc_id", key).alias("d_star"),
            F.count(F.lit(1)).cast("bigint").alias("n_rel"),
        )
    )
    better = (
        best.alias("b")
        .join(
            cand.alias("c"),
            (F.col("c.qid") == F.col("b.qid"))
            & (
                (F.col("c.score") > F.col("b.s_star"))
                | (
                    (F.col("c.score") == F.col("b.s_star"))
                    & (F.col("c.doc_id") < F.col("b.d_star"))
                )
            ),
            "left",
        )
        .groupBy("b.qid", "b.n_rel")
        .agg(
            (F.lit(1) + F.count(F.col("c.doc_id"))).cast("bigint")
            .alias("first_rank")
        )
        .select(F.col("qid"), F.col("n_rel"), F.col("first_rank"))
    )
    ncand = cand.groupBy("qid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cand")
    )
    spine = spark.createDataFrame(
        [(qid,) for qid, _, _ in _MRR_QUERIES], "qid string"
    )
    per_q = (
        spine.join(F.broadcast(better), "qid", "left")
        .join(F.broadcast(ncand), "qid", "left")
        .select(
            "qid",
            F.coalesce(F.col("n_cand"), F.lit(0)).cast("bigint")
            .alias("n_cand"),
            F.coalesce(F.col("n_rel"), F.lit(0)).cast("bigint")
            .alias("n_rel"),
            F.col("first_rank"),
            F.coalesce(
                F.expr("1000000 DIV first_rank"), F.lit(0)
            ).cast("bigint").alias("rr_ppm"),
        )
    )
    mrr = F.broadcast(
        per_q.agg(
            F.expr("CAST(SUM(rr_ppm) DIV COUNT(*) AS BIGINT)").alias(
                "mrr_ppm"
            )
        )
    )
    return per_q.crossJoin(mrr).select(
        "qid", "n_cand", "n_rel", "first_rank", "rr_ppm", "mrr_ppm"
    )


@register(
    "text_readability_fk_bands",
    oracle=f"""
WITH feat AS (
  SELECT CAST({_NTOK_G} AS BIGINT) AS n_words,
         CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
              AS BIGINT) AS n_sents,
         CAST(GREATEST(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
              AS BIGINT) AS n_syll
  FROM documents
), graded AS (
  SELECT CAST(FLOOR(
           CAST(0.39 AS DOUBLE) * (CAST(n_words AS DOUBLE) / n_sents)
           + CAST(11.8 AS DOUBLE) * (CAST(n_syll AS DOUBLE) / n_words)
           - CAST(15.59 AS DOUBLE)) AS BIGINT) AS grade
  FROM feat WHERE n_words > 0
)
SELECT LEAST(GREATEST(grade, 0), 18) AS grade_band,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM graded GROUP BY 1 ORDER BY 1
""",
    doc="Flesch-Kincaid grade-level distribution of the corpus (Kincaid "
    "et al. 1975): per document, grade = 0.39*(words/sentences) + "
    "11.8*(syllables/words) - 15.59 with the standard counting "
    "heuristics — sentences as [.!?]+ runs, syllables as [aeiouy]+ "
    "vowel runs, both GREATEST(...,1)-guarded — then a histogram over "
    "the integer grade clamped to [0, 18]. Readability is a stock "
    "pretraining quality-filter dimension (too-low grade = fragment "
    "soup, too-high = OCR noise / jargon); banding to integer grades "
    "keeps the gated output free of any float aggregation: the only "
    "float math is the per-row fixed IEEE tree (constants cast to "
    "DOUBLE on both engines — DuckDB would otherwise stay DECIMAL), "
    "pinned to an exact bigint by FLOOR, and the rest is exact "
    "grouped counting. Shape: one narrow projection with three "
    "regexp counters (JVM codegen, no UDFs), one map-side-combinable "
    "groupBy over <=19 bands.",
    tags=("text", "quality", "corpus", "agg"),
)
def text_readability_fk_bands(spark: SparkSession, sf_dir: str):
    from ..functions.text import token_count

    d = t_cpu(spark, sf_dir, "documents")
    n_words = token_count(F.col("text")).cast("bigint")
    n_sents = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), F.lit(0))),
        F.lit(1),
    ).cast("bigint")
    n_syll = F.greatest(
        F.size(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit("[aeiouy]+"), F.lit(0)
            )
        ),
        F.lit(1),
    ).cast("bigint")
    feat = d.select(
        n_words.alias("n_words"),
        n_sents.alias("n_sents"),
        n_syll.alias("n_syll"),
    ).filter(F.col("n_words") > 0)
    grade = F.floor(
        F.lit(0.39) * (F.col("n_words").cast("double") / F.col("n_sents"))
        + F.lit(11.8) * (F.col("n_syll").cast("double") / F.col("n_words"))
        - F.lit(15.59)
    ).cast("bigint")
    return (
        feat.select(
            F.least(F.greatest(grade, F.lit(0).cast("bigint")),
                    F.lit(18).cast("bigint")).alias("grade_band")
        )
        .groupBy("grade_band")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("grade_band")
    )
