"""Corpus-preparation operators for LLM training-data pipelines:
deterministic sampling, TF-IDF term scoring, n-gram frequency, PII/URL
scrubbing, and embedding centroids.

These extend the dedup/similarity/text families with the remaining
operations a 100 TB pre-training pipeline runs between "raw crawl" and
"training shards". Design rules at scale:

- **Sampling never uses rand().** A multiplicative integer hash of the
  document id gives a deterministic, retry-safe, engine-reproducible
  keep/drop decision — re-running the job (or a recomputed partition
  after an executor loss) selects the identical sample. Pure map-side,
  zero shuffle.
- **No log() in scored rankings.** Cross-engine libm (Java StrictMath vs
  C libm) may differ in the last ulp, which flips near-tie ranks; the
  idf factor is kept as the exact rational tf·N/df (one IEEE division).
- **Global top-k is TakeOrderedAndProject**, not a single-partition
  window: each partition keeps its local top-k and the driver merges k
  rows per partition — the only scalable global-ranking shape.
- **Float aggregation goes through exact decimals** via the
  string-routed cast (see plans/parity.py): both engines print the same
  shortest-repr string of the same IEEE double, and DECIMAL(38,20)
  holds every such string for |x| ≥ 1e-11 exactly (float shortest repr
  has ≤9 significant digits), so the per-dimension sums are exact and
  order-independent.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from .registry import register
from .util import t, t_cpu

# Whitespace-normalized text + single-space tokenization — the same
# contract text_ops uses (Spark regexp_replace is global by default;
# DuckDB needs the 'g' flag).
_NORM_SPARK = lambda c: F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))  # noqa: E731
_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@register(
    "sample_stratified_hash",
    oracle="""
SELECT doc_id, lang
FROM documents
WHERE ((doc_id % 2147483648) * 2654435761) % 4294967296
      < CASE WHEN lang = 'en' THEN 1073741824 ELSE 2147483648 END
""",
    doc="Deterministic stratified sampling: keep 25% of English docs and "
    "50% of everything else (down-sampling the over-represented "
    "stratum), decided by a Knuth multiplicative hash of doc_id — no "
    "rand(), so task retries, speculation, and re-runs select the "
    "identical sample, and the decision is reproducible in any engine "
    "with 64-bit integer arithmetic. Pure map-side filter: zero "
    "shuffle, pushes nothing but a scan. The doc_id % 2^31 pre-fold "
    "keeps the product within int64 for arbitrarily large ids.",
    tags=("corpus", "sampling"),
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    h = ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)) % F.lit(
        4294967296
    )
    threshold = F.when(F.col("lang") == "en", F.lit(1073741824)).otherwise(
        F.lit(2147483648)
    )
    return d.filter(h < threshold).select("doc_id", "lang")


@register(
    "tfidf_top_terms",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term
  FROM documents
  WHERE length({_NORM_SQL}) > 0
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
)
SELECT doc_id, term, CAST(rn AS INT) AS rank,
       CAST(tf * n_docs AS DOUBLE) / df AS tfidf_ratio
FROM (
  SELECT tf.doc_id, tf.term, tf.tf, df.df, n.n_docs,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf * n.n_docs AS DOUBLE) / df.df DESC, tf.term ASC
         ) AS rn
  FROM tf JOIN df ON df.term = tf.term, n
)
WHERE rn <= 5
""",
    doc="TF-IDF-style top-5 terms per document. Term frequency and "
    "document frequency are two map-side-combinable aggregates; the "
    "document-frequency table is broadcast back onto the term table; "
    "ranking partitions by doc_id (no global window). The score is the "
    "exact rational tf*N/df — one integer multiply + one IEEE division "
    "— instead of tf*log(N/df): libm log differs across engines in the "
    "last ulp and flips near-tie ranks, while the log-free score is "
    "rank-equivalent for fixed N (log is monotone) and bit-stable. "
    "Ties break on term ASC.",
    tags=("corpus", "text", "tfidf"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    d = t_cpu(spark, sf_dir, "documents")
    norm = _NORM_SPARK(F.col("text"))
    toks = (
        d.select("doc_id", norm.alias("norm"))
        .filter(F.length("norm") > 0)
        .select("doc_id", F.explode(F.split(F.col("norm"), " ")).alias("term"))
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = t(spark, sf_dir, "documents").agg(F.count(F.lit(1)).alias("n_docs"))
    score = (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")
    w = Window.partitionBy("doc_id").orderBy(score.desc(), F.col("term").asc())
    return (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("doc_id", "term", "rank", score.alias("tfidf_ratio"))
    )


@register(
    "ngram_bigram_top50",
    oracle=f"""
WITH toks AS (
  SELECT string_split({_NORM_SQL}, ' ') AS tk FROM documents
  WHERE length({_NORM_SQL}) > 0
), grams AS (
  SELECT unnest(list_transform(range(1, len(tk)),
                               i -> tk[i] || ' ' || tk[i + 1])) AS bigram
  FROM toks WHERE len(tk) >= 2
)
SELECT bigram, COUNT(*) AS cnt
FROM grams GROUP BY 1
ORDER BY cnt DESC, bigram ASC
LIMIT 50
""",
    doc="Corpus-wide top-50 word bigrams. Bigram construction is a "
    "JVM-side zip_with over two array slices (no Python, no explode "
    "before pairing); counting is one map-side-combinable aggregate; "
    "the global top-50 compiles to TakeOrderedAndProject — each "
    "partition keeps a local top-50 and the driver merges 50 rows per "
    "partition, never a single-partition global sort. Deterministic "
    "LIMIT via the (cnt DESC, bigram ASC) total order.",
    tags=("corpus", "text", "ngram"),
)
def ngram_bigram_top50(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents")
    norm = _NORM_SPARK(F.col("text"))
    grams = (
        d.select(norm.alias("norm"))
        .filter(F.length("norm") > 0)
        .select(F.split(F.col("norm"), " ").alias("tk"))
        .filter(F.size("tk") >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("tk"), 1, F.size("tk") - 1),
                    F.slice(F.col("tk"), 2, F.size("tk") - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("bigram")
        )
    )
    return (
        grams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("bigram").asc())
        .limit(50)
    )


@register(
    "text_scrub_pii",
    oracle="""
WITH enriched AS (
  SELECT doc_id,
         text || ' contact user' || doc_id ||
         '@mail.example.com or https://host' || (doc_id % 7) ||
         '.example.org/p/' || doc_id || ' ref 1234567890' AS raw
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(raw,
            '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(raw, 'https?://[^ ]+')) AS BIGINT)
         AS n_urls,
       md5(regexp_replace(regexp_replace(regexp_replace(raw,
             '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+', '<EMAIL>', 'g'),
             'https?://[^ ]+', '<URL>', 'g'),
             '[0-9][0-9][0-9][0-9][0-9][0-9]+', '<NUM>', 'g'))
         AS scrub_md5,
       CAST(length(regexp_replace(regexp_replace(regexp_replace(raw,
             '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+', '<EMAIL>', 'g'),
             'https?://[^ ]+', '<URL>', 'g'),
             '[0-9][0-9][0-9][0-9][0-9][0-9]+', '<NUM>', 'g')) AS BIGINT)
         AS scrub_len
FROM enriched
""",
    doc="PII/URL scrubbing: emails → <EMAIL>, URLs → <URL>, 6+-digit runs "
    "→ <NUM>, applied in that order (emails before digit runs so ids "
    "inside addresses don't get half-masked). The corpus has no natural "
    "PII, so deterministic synthetic contact strings are appended per "
    "doc_id on BOTH engines and the scrubbed result is proven by md5 + "
    "length — full-string parity, not just counts. Patterns stay in the "
    "Java∩RE2 regex subset (no lookaround, no bounded-repeat syntax "
    "divergence) so both engines match identically. Pure map-side "
    "narrow transform — the shape of a trillion-row cleaning pass.",
    tags=("corpus", "text", "scrub"),
)
def text_scrub_pii(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or https://host"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.org/p/"),
        F.col("doc_id").cast("string"),
        F.lit(" ref 1234567890"),
    )
    email = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+"
    url = r"https?://[^ ]+"
    digits = "[0-9][0-9][0-9][0-9][0-9][0-9]+"
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(raw, email, "<EMAIL>"), url, "<URL>"
        ),
        digits,
        "<NUM>",
    )
    return d.select(
        "doc_id",
        F.regexp_count(raw, F.lit(email)).cast("bigint").alias("n_emails"),
        F.regexp_count(raw, F.lit(url)).cast("bigint").alias("n_urls"),
        F.md5(scrubbed.cast("binary")).alias("scrub_md5"),
        F.length(scrubbed).cast("bigint").alias("scrub_len"),
    )


@register(
    "embedding_centroids",
    oracle="""
SELECT e.label, CAST(g.i AS INTEGER) AS dim,
       CAST(CAST(SUM(CAST(CAST(CAST(e.embedding[g.i] AS DOUBLE) AS VARCHAR)
                          AS DECIMAL(38,20))) AS VARCHAR) AS DOUBLE)
         / COUNT(*) AS centroid,
       COUNT(*) AS n_vectors
FROM embeddings e, (SELECT unnest(range(1, 65)) AS i) g
GROUP BY 1, 2
""",
    doc="Per-label centroid of the 64-dim embedding column — the reduce "
    "step of k-means / class prototypes. posexplode flattens to (label, "
    "dim, x); each float routes through DOUBLE→string→DECIMAL(38,20) "
    "(string-route idiom: identical shortest-repr strings parse to "
    "identical decimals, and scale 20 holds every float shortest-repr "
    "for |x| ≥ 1e-11 without rounding) so the per-dimension sum is "
    "exact and partition-order independent; the final /count is one "
    "IEEE division. One map-side-combinable aggregate over a 64× "
    "explode — at 100 TB this is the textbook centroid shuffle: 64 "
    "rows per vector in, (labels × 64) rows out. Dim index is 1-based "
    "to match SQL array subscripts.",
    tags=("corpus", "embedding", "agg"),
)
def embedding_centroids(spark: SparkSession, sf_dir: str):
    e = t_cpu(spark, sf_dir, "embeddings")
    exploded = e.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "x")
    ).select(
        "label",
        (F.col("pos") + 1).alias("dim"),
        F.col("x")
        .cast("double")
        .cast("string")
        .cast("decimal(38,20)")
        .alias("xd"),
    )
    # The DECIMAL sum ALSO leaves the decimal domain through a string:
    # DuckDB's direct DECIMAL(38,·)→DOUBLE conversion is not correctly
    # rounded for 128-bit decimals (it divides two separately-rounded
    # doubles), while string→double parsing is correctly rounded in both
    # engines — so print exact digits, then parse.
    return exploded.groupBy("label", "dim").agg(
        (F.sum("xd").cast("string").cast("double") / F.count(F.lit(1))).alias(
            "centroid"
        ),
        F.count(F.lit(1)).alias("n_vectors"),
    )


@register(
    "corpus_quality_filter",
    oracle=f"""
WITH m AS (
  SELECT doc_id,
         CAST(CASE WHEN length({_NORM_SQL}) = 0 THEN 0
              ELSE length({_NORM_SQL})
                   - length(replace({_NORM_SQL}, ' ', '')) + 1 END AS BIGINT)
           AS n_tokens,
         CAST(len(list_distinct(string_split({_NORM_SQL}, ' '))) AS BIGINT)
           AS n_distinct,
         CAST(len(list_filter(string_split({_NORM_SQL}, ' '),
                              x -> x IN ('the', 'a', 'and', 'of'))) AS BIGINT)
           AS n_stop
  FROM documents
), scored AS (
  SELECT doc_id, n_tokens,
         CASE WHEN n_tokens = 0 THEN 0
              ELSE CAST(floor((n_stop * 1000.0) / n_tokens) AS BIGINT) END
           AS stop_milli,
         CASE WHEN n_tokens = 0 THEN 0
              ELSE CAST(floor((n_distinct * 1000.0) / n_tokens) AS BIGINT) END
           AS ttr_milli
  FROM m
)
SELECT doc_id,
       CASE
         WHEN n_tokens < 20 THEN 'too_short'
         WHEN n_tokens > 1000 THEN 'too_long'
         WHEN stop_milli < 20 THEN 'low_stopword'
         WHEN ttr_milli < 300 THEN 'repetitive'
         ELSE 'kept'
       END AS verdict,
       (n_tokens >= 20 AND n_tokens <= 1000
        AND stop_milli >= 20 AND ttr_milli >= 300) AS keep
FROM scored
""",
    doc="The corpus FILTER step: length bounds + stopword density + "
    "type-token ratio composed into a keep/drop verdict with the FIRST "
    "failing rule as the reason — what actually gates documents into "
    "training shards (composition of the text_* signal family). All "
    "milli-ratios are floor'd integer arithmetic, so verdicts are "
    "engine-exact; empty docs short-circuit to 0 so no division by "
    "zero on either engine. Pure map-side narrow pass.",
    tags=("corpus", "text", "filter", "composition"),
)
def corpus_quality_filter(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents")
    norm = _NORM_SPARK(F.col("text"))
    toks = F.split(norm, " ")
    ntok = (
        F.when(F.length(norm) == 0, F.lit(0))
        .otherwise(
            F.length(norm) - F.length(F.regexp_replace(norm, " ", "")) + 1
        )
        .cast("bigint")
    )
    ndis = F.size(F.array_distinct(toks)).cast("bigint")
    nstop = F.size(
        F.filter(toks, lambda x: x.isin("the", "a", "and", "of"))
    ).cast("bigint")
    stop_milli = (
        F.when(ntok == 0, F.lit(0))
        .otherwise(F.floor((nstop * F.lit(1000.0)) / ntok))
        .cast("bigint")
    )
    ttr_milli = (
        F.when(ntok == 0, F.lit(0))
        .otherwise(F.floor((ndis * F.lit(1000.0)) / ntok))
        .cast("bigint")
    )
    verdict = (
        F.when(ntok < 20, F.lit("too_short"))
        .when(ntok > 1000, F.lit("too_long"))
        .when(stop_milli < 20, F.lit("low_stopword"))
        .when(ttr_milli < 300, F.lit("repetitive"))
        .otherwise(F.lit("kept"))
    )
    keep = (
        (ntok >= 20)
        & (ntok <= 1000)
        & (stop_milli >= 20)
        & (ttr_milli >= 300)
    )
    return d.select("doc_id", verdict.alias("verdict"), keep.alias("keep"))


@register(
    "cv_folds_content_keyed",
    oracle="""
WITH fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS f
  FROM documents
), v AS (
  SELECT doc_id,
         (instr('0123456789abcdef', substr(f, 1, 1)) - 1) * 4096
       + (instr('0123456789abcdef', substr(f, 2, 1)) - 1) * 256
       + (instr('0123456789abcdef', substr(f, 3, 1)) - 1) * 16
       + (instr('0123456789abcdef', substr(f, 4, 1)) - 1) AS h
  FROM fp
)
SELECT doc_id, CAST(h % 5 AS INT) AS fold,
       CASE WHEN h % 5 = 0 THEN 'test' ELSE 'train' END AS split
FROM v
""",
    doc="Leakage-safe cross-validation fold assignment: the fold is a "
    "function of the CONTENT fingerprint (md5 of normalized text, first "
    "16 bits mod 5), not the row id — exact duplicates land in the same "
    "fold by construction, so a dup can never sit in train while its "
    "twin sits in test (the classic eval-contamination bug id-keyed "
    "splits have). Deterministic across engines, retries, and re-runs; "
    "pure map-side projection, zero shuffle. The 2^16 mod 5 bias is "
    "~0.002% — irrelevant for splitting.",
    tags=("corpus", "sampling", "ml"),
)
def cv_folds_content_keyed(spark: SparkSession, sf_dir: str):
    from ..functions.text import fingerprint

    d = t(spark, sf_dir, "documents")
    h = F.conv(F.substring(fingerprint("text"), 1, 4), 16, 10).cast("bigint")
    fold = (h % 5).cast("int")
    return d.select(
        "doc_id",
        fold.alias("fold"),
        F.when(fold == 0, F.lit("test")).otherwise(F.lit("train")).alias("split"),
    )


@register(
    "sample_per_group_topn",
    oracle="""
SELECT doc_id, lang
FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rn
  FROM documents
)
WHERE rn <= 50
""",
    doc="Exact-N per-group deterministic sample: 50 docs per language, "
    "selected by md5-of-id order — reproducible across engines, "
    "retries, and re-runs (no rand()), and unbiased w.r.t. any data "
    "ordering. Spark plans the rank<=k filter as WindowGroupLimit: a "
    "per-partition top-k heap BEFORE the shuffle, so each group moves "
    "only k rows per input partition — not a full per-group sort of a "
    "100 TB table.",
    tags=("corpus", "sampling", "window"),
)
def sample_per_group_topn(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        t(spark, sf_dir, "documents")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .select("doc_id", "lang")
    )


@register(
    "corpus_source_drift",
    oracle="""
WITH b AS (
  SELECT source, CAST(n_chars // 50 AS BIGINT) AS bucket FROM documents
), src_tot AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM b GROUP BY 1
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM b
), grid AS (
  SELECT s.source, g.bucket
  FROM (SELECT DISTINCT source FROM b) s
  CROSS JOIN (SELECT DISTINCT bucket FROM b) g
), src_cnt AS (
  SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY 1, 2
), all_cnt AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c_all FROM b GROUP BY 1
), shares AS (
  SELECT g.source, g.bucket,
         COALESCE(s.c, 0) * 1000 * tot.n_all AS lhs,
         a.c_all * 1000 * st.n_docs AS rhs,
         st.n_docs, tot.n_all
  FROM grid g
  LEFT JOIN src_cnt s ON s.source = g.source AND s.bucket = g.bucket
  JOIN all_cnt a ON a.bucket = g.bucket
  JOIN src_tot st ON st.source = g.source
  CROSS JOIN tot
)
SELECT source, n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(abs(lhs - rhs)) // (n_docs * n_all) AS BIGINT) AS l1_milli
FROM shares
GROUP BY source, n_docs, n_all
""",
    doc="Per-source distribution drift vs the whole corpus: the document-"
    "length histogram (width-50 char buckets) of each source is compared "
    "to the corpus marginal by L1 distance, computed as EXACT INTEGERS "
    "via cross-multiplication — sum|c_s/n_s - c/n| becomes "
    "sum|c_s*1000*n - c*1000*n_s| / (n_s*n), so no per-bucket float "
    "share ever rounds before the sum (summing floor'd permilles would "
    "accumulate up to one milli of error PER BUCKET). The monitoring "
    "pass that catches a source whose crawl shifted under the mix "
    "weights. Shape at scale: two small aggregates + a (sources x "
    "buckets) grid join — all keyed on bounded-cardinality columns; "
    "the corpus scan happens once.",
    tags=("corpus", "profile", "drift", "agg"),
)
def corpus_source_drift(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    b = d.select("source", (F.col("n_chars") / 50).cast("bigint").alias("bucket"))
    # integer floor-div: n_chars >= 0, so cast-after-divide equals // only
    # for non-negatives; make it explicit floor to be safe
    b = d.select(
        "source", F.floor(F.col("n_chars") / F.lit(50)).cast("bigint").alias("bucket")
    )
    src_tot = b.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    tot = b.agg(F.count(F.lit(1)).cast("bigint").alias("n_all"))
    grid = (
        b.select("source").distinct().crossJoin(b.select("bucket").distinct())
    )
    src_cnt = b.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    all_cnt = b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_all")
    )
    shares = (
        grid.join(src_cnt, ["source", "bucket"], "left")
        .join(all_cnt, "bucket")
        .join(src_tot, "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "bucket",
            "n_docs",
            "n_all",
            (F.coalesce(F.col("c"), F.lit(0)) * 1000 * F.col("n_all")).alias("lhs"),
            (F.col("c_all") * 1000 * F.col("n_docs")).alias("rhs"),
        )
    )
    return (
        shares.groupBy("source", "n_docs", "n_all")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.floor(
                F.sum(F.abs(F.col("lhs") - F.col("rhs")))
                / (F.col("n_docs") * F.col("n_all"))
            ).cast("bigint").alias("l1_milli"),
        )
        .select("source", "n_docs", "n_buckets", "l1_milli")
    )


@register(
    "sample_weighted_priority",
    oracle="""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         ((doc_id % 2147483647) * 2654435761) % 4294967296 AS h
  FROM documents
), prio AS (
  SELECT doc_id, source, n_chars,
         CAST((h * 1000000) // GREATEST(n_chars, 1) AS BIGINT) AS priority
  FROM keyed
)
SELECT doc_id, source, n_chars, priority
FROM prio
ORDER BY priority, doc_id
LIMIT 100
""",
    doc="Deterministic weighted sampling: longer documents are "
    "proportionally more likely to be kept — the corpus-composition "
    "knob for token-weighted (rather than document-weighted) training "
    "mixes. Priority-sampling formulation: every doc gets an integer "
    "priority u/w where u is a multiplicative-hash uniform of doc_id "
    "and w = n_chars; the global smallest-k by priority IS the "
    "weighted sample. All-integer arithmetic (hash, *1e6, truncating "
    "DIV) makes it seedless, retry-safe, and bit-identical across "
    "engines — rerunning a recomputed partition after executor loss "
    "selects the same documents, which rand()-based sampling cannot "
    "guarantee. Scale shape: the keying is pure map-side; the global "
    "smallest-k plans as TakeOrderedAndProject (per-partition top-k + "
    "driver merge of k rows/partition), never a global sort.",
    tags=("corpus", "sampling", "weighted", "topk"),
    bench=True,
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    h = F.pmod(
        F.pmod(F.col("doc_id"), F.lit(2147483647)) * F.lit(2654435761),
        F.lit(4294967296),
    )
    prio = F.expr("(h * 1000000) DIV GREATEST(n_chars, CAST(1 AS BIGINT))")
    return (
        d.select("doc_id", "source", "n_chars", h.alias("h"))
        .select("doc_id", "source", "n_chars", prio.cast("bigint").alias("priority"))
        .orderBy("priority", "doc_id")
        .limit(100)
    )


@register(
    "corpus_stride_interleave",
    oracle="""
WITH ranked AS (
  SELECT doc_id, source,
         CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
              AS BIGINT) AS rnk
  FROM documents
), sized AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_src FROM documents GROUP BY 1
), prioritized AS (
  SELECT r.doc_id, r.source, r.rnk,
         (r.rnk * 1000000) // s.n_src AS priority
  FROM ranked r JOIN sized s ON s.source = r.source
)
SELECT doc_id, source, rnk AS rank_in_source,
       CAST(priority AS BIGINT) AS priority
FROM prioritized
ORDER BY priority, source, rnk
LIMIT 60
""",
    doc="Stride-scheduled corpus interleaving — the deterministic "
    "fair-queuing order a training loader consumes a multi-source mix "
    "in: each source's k-th document gets priority k/|source| (scaled "
    "to integers, k * 1e6 DIV n_src), so merging by priority emits "
    "sources proportionally to their size at EVERY prefix — no "
    "source starves early, no source floods the warmup epochs, and "
    "unlike shuffle-based mixing the order is seedless and identical "
    "on every rerun/resume. corpus_mix_apply decides HOW MUCH of "
    "each source to take; this decides WHEN each survivor is seen. "
    "All-integer priorities with a (source, rank) tiebreak make the "
    "order total; the emitted prefix plans as TakeOrderedAndProject.",
    tags=("corpus", "sampling", "composition", "topk"),
)
def corpus_stride_interleave(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    ranked = d.withColumn(
        "rnk",
        F.row_number()
        .over(Window.partitionBy("source").orderBy("doc_id"))
        .cast("bigint"),
    )
    sized = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    prioritized = ranked.join(sized, "source").select(
        "doc_id", "source", "rnk",
        F.expr("(rnk * 1000000) DIV n_src").cast("bigint").alias("priority"),
    )
    return (
        prioritized.orderBy("priority", "source", "rnk")
        .limit(60)
        .select(
            "doc_id", "source", F.col("rnk").alias("rank_in_source"),
            "priority",
        )
    )


@register(
    "ctfidf_label_terms",
    oracle=f"""
WITH joined AS (
  SELECT e.label, d.text
  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
), toks AS (
  SELECT label, unnest(string_split({_NORM_SQL}, ' ')) AS term
  FROM joined WHERE length({_NORM_SQL}) > 0
), ctf AS (
  SELECT label, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
), csize AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_l FROM toks GROUP BY 1
), cdf AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM ctf GROUP BY 1
), n AS (
  SELECT CAST(COUNT(DISTINCT label) AS BIGINT) AS n_labels FROM ctf
)
SELECT label, term, CAST(rn AS INT) AS rank, score
FROM (
  SELECT ctf.label, ctf.term,
         CAST(ctf.tf * n.n_labels AS DOUBLE) / (cdf.df * csize.n_l) AS score,
         row_number() OVER (
           PARTITION BY ctf.label
           ORDER BY CAST(ctf.tf * n.n_labels AS DOUBLE)
                    / (cdf.df * csize.n_l) DESC,
                    ctf.term ASC
         ) AS rn
  FROM ctf
  JOIN cdf ON cdf.term = ctf.term
  JOIN csize ON csize.label = ctf.label, n
)
WHERE rn <= 5
""",
    doc="c-TF-IDF cluster labeling (the BERTopic topic-naming step): "
    "documents joined to their embedding CLUSTER label, token counts "
    "aggregated per CLASS instead of per document, and each class "
    "ranked by class-tf x inverse-class-frequency, length-normalized "
    "by class token mass — the top-5 terms ARE the human-readable "
    "name of each embedding cluster, closing the loop between the "
    "similarity family (which finds clusters) and the text family "
    "(which describes them). Score = (tf*n_labels)/(df*n_l) as ONE "
    "integer multiply pair + ONE IEEE division (the log-free idiom "
    "of tfidf_top_terms — rank-equivalent and bit-stable; libm log "
    "would flip near-ties across engines). Class aggregates are "
    "map-side combinable; the class-df table is broadcast; ranking "
    "partitions by label.",
    tags=("corpus", "text", "tfidf", "embedding", "ml"),
)
def ctfidf_label_terms(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    d = t_cpu(spark, sf_dir, "documents")
    e = t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    norm = _NORM_SPARK(F.col("text"))
    toks = (
        d.join(e, "doc_id")
        .select("label", norm.alias("norm"))
        .filter(F.length("norm") > 0)
        .select("label", F.explode(F.split(F.col("norm"), " ")).alias("term"))
    )
    ctf = toks.groupBy("label", "term").agg(F.count(F.lit(1)).alias("tf"))
    csize = toks.groupBy("label").agg(F.count(F.lit(1)).alias("n_l"))
    cdf = ctf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = ctf.agg(F.count_distinct("label").alias("n_labels"))
    score = (F.col("tf") * F.col("n_labels")).cast("double") / (
        F.col("df") * F.col("n_l")
    )
    w = Window.partitionBy("label").orderBy(score.desc(), F.col("term").asc())
    return (
        ctf.join(F.broadcast(cdf), "term")
        .join(F.broadcast(csize), "label")
        .crossJoin(F.broadcast(n))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("label", "term", "rank", score.alias("score"))
    )


@register(
    "target_encode_oof",
    oracle="""
WITH base AS (
  SELECT c.c_mktsegment AS segment,
         ((c.c_custkey % 2147483647) * 2654435761) % 2147483647 % 4 AS fold,
         CAST(o.o_totalprice AS DECIMAL(18,6)) AS y
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
), per_fold AS (
  SELECT segment, fold, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(y) AS s
  FROM base GROUP BY 1, 2
), per_seg AS (
  SELECT segment, CAST(SUM(n) AS BIGINT) AS n_tot, SUM(s) AS s_tot
  FROM per_fold GROUP BY 1
)
SELECT f.segment, CAST(f.fold AS INT) AS fold, f.n,
       CAST(CAST(p.s_tot - f.s AS DOUBLE) / (p.n_tot - f.n) AS DOUBLE)
         AS oof_encoding
FROM per_fold f JOIN per_seg p ON p.segment = f.segment
""",
    doc="Out-of-fold target encoding — the leakage-safe categorical "
    "encoder: each (segment, fold) cell is encoded with the target "
    "mean computed over the OTHER folds only ((total - fold) sums), "
    "so no row's own label leaks into its feature — the difference "
    "between a valid encoder and a train-only mirage. Folds are the "
    "deterministic multiplicative customer hash (retry/rerun-stable, "
    "same fold assignment as the CV-folds family). Numerics: sums "
    "are exact decimals (order-independent), the subtraction is "
    "exact, and the single decimal->double division is correctly "
    "rounded on both engines — the one-division idiom that keeps "
    "float encodings gate-comparable. Two map-side-combinable "
    "aggregates, a broadcast-sized per-segment table joined back: "
    "unchanged at 100 TB.",
    tags=("corpus", "ml", "encoding", "agg"),
)
def target_encode_oof(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = o.join(c, F.col("c_custkey") == F.col("o_custkey")).select(
        F.col("c_mktsegment").alias("segment"),
        (
            F.pmod(
                F.pmod(F.col("c_custkey"), F.lit(2147483647))
                * F.lit(2654435761),
                F.lit(2147483647),
            )
            % 4
        ).alias("fold"),
        F.col("o_totalprice").cast("decimal(18,6)").alias("y"),
    )
    per_fold = base.groupBy("segment", "fold").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    per_seg = per_fold.groupBy("segment").agg(
        F.sum("n").cast("bigint").alias("n_tot"), F.sum("s").alias("s_tot")
    )
    return per_fold.join(F.broadcast(per_seg), "segment").select(
        "segment",
        F.col("fold").cast("int").alias("fold"),
        "n",
        (
            (F.col("s_tot") - F.col("s")).cast("double")
            / (F.col("n_tot") - F.col("n"))
        ).alias("oof_encoding"),
    )


@register(
    "ml_time_split_embargo",
    oracle="""
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
), b AS (
  SELECT MIN(sec) AS lo,
         MIN(sec) + ((MAX(sec) - MIN(sec)) * 7) // 10 AS t1
  FROM e
), tagged AS (
  SELECT e.user_id, e.sec,
         CASE WHEN e.sec < b.t1 THEN 'train'
              WHEN e.sec < b.t1 + 172800 THEN 'embargo'
              ELSE 'valid' END AS split
  FROM e, b
)
SELECT split, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       MIN(sec) AS first_sec, MAX(sec) AS last_sec
FROM tagged GROUP BY 1
""",
    doc="Temporal train/validation split with an EMBARGO gap — the "
    "time-series ML split that content-keyed CV folds "
    "(cv_folds_content_keyed) cannot replace: the cut is at the 70% "
    "point of the time range, and the 48 hours after it are DROPPED "
    "from both sides, so label windows or delayed features computed "
    "near the boundary cannot straddle it (the purged/embargoed "
    "split from financial ML, where boundary leakage inflates "
    "validation scores). Split boundaries are integer epoch "
    "arithmetic off one broadcast min/max aggregate — deterministic, "
    "rerun-stable, and the same map-side tagging at any scale; the "
    "per-split census (rows, distinct users, time extent) is the "
    "artifact reviewers sign off on.",
    tags=("corpus", "ml", "temporal", "sampling"),
)
def ml_time_split_embargo(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events").select(
        "user_id",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("sec"),
    )
    b = e.agg(
        F.min("sec").alias("lo"),
        (F.min("sec") + F.expr("((MAX(sec) - MIN(sec)) * 7) DIV 10")).alias(
            "t1"
        ),
    )
    tagged = e.crossJoin(F.broadcast(b)).select(
        "user_id", "sec",
        F.when(F.col("sec") < F.col("t1"), "train")
        .when(F.col("sec") < F.col("t1") + 172800, "embargo")
        .otherwise("valid")
        .alias("split"),
    )
    return tagged.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("user_id").alias("n_users"),
        F.min("sec").alias("first_sec"),
        F.max("sec").alias("last_sec"),
    )


@register(
    "split_neardup_safe",
    oracle="""
WITH RECURSIVE
sh AS (
  SELECT doc_id,
         unnest(list_distinct(
           CASE WHEN len(ws) >= 3
                THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN range(1, len(ws) - 1)]
                ELSE [] END
         )) AS shingle
  FROM (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
        FROM documents)
),
sig AS (
  SELECT doc_id,
         MIN(md5('0|' || shingle)) AS h0, MIN(md5('1|' || shingle)) AS h1,
         MIN(md5('2|' || shingle)) AS h2, MIN(md5('3|' || shingle)) AS h3,
         MIN(md5('4|' || shingle)) AS h4, MIN(md5('5|' || shingle)) AS h5
  FROM sh GROUP BY doc_id
),
buckets AS (
  SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS band_key FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band, md5(h2 || '|' || h3) AS band_key FROM sig
  UNION ALL
  SELECT doc_id, 2 AS band, md5(h4 || '|' || h5) AS band_key FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a
  JOIN buckets b ON a.band = b.band AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN inter ON inter.id_a = c.id_a AND inter.id_b = c.id_b
  JOIN sz sa ON sa.doc_id = c.id_a
  JOIN sz sb ON sb.doc_id = c.id_b
  WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.5
),
und AS (SELECT id_a AS u, id_b AS v FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
reach(a, b) AS (
  SELECT u, u FROM und
  UNION
  SELECT r.a, n.v FROM reach r JOIN und n ON r.b = n.u
),
comp AS (SELECT a AS doc_id, MIN(b) AS component FROM reach GROUP BY a),
tagged AS (
  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster
  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
),
long AS (
  SELECT doc_id, cluster, 'cluster_keyed' AS method,
         CASE WHEN h < 8 THEN 'train' WHEN h = 8 THEN 'valid' ELSE 'test' END AS split
  FROM (SELECT doc_id, cluster,
               ((cluster % 2147483648) * 2654435761) % 4294967296 % 10 AS h
        FROM tagged)
  UNION ALL
  SELECT doc_id, cluster, 'id_keyed' AS method,
         CASE WHEN h < 8 THEN 'train' WHEN h = 8 THEN 'valid' ELSE 'test' END AS split
  FROM (SELECT doc_id, cluster,
               ((doc_id % 2147483648) * 2654435761) % 4294967296 % 10 AS h
        FROM tagged)
),
census AS (
  SELECT method, split, COUNT(*) AS n_docs,
         COUNT(DISTINCT cluster) AS n_clusters
  FROM long GROUP BY 1, 2
),
leaks AS (
  SELECT method,
         CAST(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS leaked_clusters
  FROM (SELECT method, cluster, COUNT(DISTINCT split) AS ns
        FROM long GROUP BY 1, 2)
  GROUP BY 1
)
SELECT c.method, c.split, c.n_docs, c.n_clusters, l.leaked_clusters
FROM census c JOIN leaks l ON l.method = c.method
""",
    doc="NEAR-dup-cluster-safe train/valid/test split — the leakage guard "
    "content-fingerprint folds (cv_folds_content_keyed) cannot give: a "
    "paraphrased near-duplicate has a different md5 fingerprint and an "
    "id-keyed or fingerprint-keyed split will happily put it in train "
    "while its twin sits in test, silently inflating eval. Pipeline: "
    "MinHash-LSH verified near-dup pairs -> connected components -> "
    "every doc keyed by its CLUSTER representative -> split = Knuth "
    "multiplicative hash of the cluster id (80/10/10). The output is "
    "the reviewer artifact: per-split census for BOTH methods plus the "
    "method's global leaked-cluster count — structurally 0 for the "
    "cluster-keyed split, measurably positive for the naive id-keyed "
    "split on any corpus with near-dups (pytest pins both, so the "
    "guarantee is proven non-vacuous, not 0=0). Scale: the pair graph "
    "is the banded-LSH shuffle (no all-pairs), components are the "
    "one-job-per-round iterative operator, the split itself is a pure "
    "map-side hash — no new shuffle class beyond the dedup family; the "
    "census re-scans documents once per aggregate consumer rather than "
    "checkpointing a corpus-sized intermediate. Oracle: same chain in "
    "DuckDB with a recursive-CTE transitive closure.",
    tags=("corpus", "ml", "dedup", "sampling", "graph"),
)
def split_neardup_safe(spark: SparkSession, sf_dir: str):
    from ..operators.dedup import minhash_dedup_pairs
    from ..operators.graph import connected_components

    pairs = minhash_dedup_pairs(
        t_cpu(spark, sf_dir, "documents"), "text", "doc_id",
        k=3, num_hashes=6, bands=3, threshold=0.5,
    ).select("id_a", "id_b")
    comp = connected_components(pairs, "id_a", "id_b").withColumnRenamed(
        "node", "doc_id"
    )
    tagged = (
        t(spark, sf_dir, "documents")
        .select("doc_id")
        .join(F.broadcast(comp), "doc_id", "left")
        .select(
            "doc_id", F.coalesce("component", "doc_id").alias("cluster")
        )
    )

    def _split(key):
        h = (
            ((key % F.lit(2147483648)) * F.lit(2654435761))
            % F.lit(4294967296)
        ) % F.lit(10)
        return (
            F.when(h < 8, F.lit("train"))
            .when(h == 8, F.lit("valid"))
            .otherwise(F.lit("test"))
        )

    long = tagged.select(
        "doc_id",
        "cluster",
        _split(F.col("cluster")).alias("split_cluster"),
        _split(F.col("doc_id")).alias("split_id"),
    ).selectExpr(
        "doc_id",
        "cluster",
        "stack(2, 'cluster_keyed', split_cluster, 'id_keyed', split_id)"
        " AS (method, split)",
    )
    census = long.groupBy("method", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("cluster").alias("n_clusters"),
    )
    leaks = (
        long.groupBy("method", "cluster")
        .agg(F.count_distinct("split").alias("ns"))
        .groupBy("method")
        .agg(
            F.sum(F.when(F.col("ns") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("leaked_clusters")
        )
    )
    return census.join(F.broadcast(leaks), "method").select(
        "method", "split", "n_docs", "n_clusters", "leaked_clusters"
    )


@register(
    "corpus_dedup_inflation",
    oracle="""
WITH fp AS (
  SELECT doc_id, source,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS f,
         CAST(CASE WHEN length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) = 0 THEN 0
              ELSE length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                   - length(replace(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ', ''))
                   + 1 END AS BIGINT) AS n_tok
  FROM documents
), keep AS (
  SELECT f, MIN(doc_id) AS keep_id FROM fp GROUP BY 1
)
SELECT fp.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN fp.doc_id = k.keep_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_keepers,
       CAST(SUM(fp.n_tok) AS BIGINT) AS tokens_total,
       CAST(SUM(CASE WHEN fp.doc_id = k.keep_id THEN fp.n_tok ELSE 0 END)
            AS BIGINT) AS tokens_kept,
       CAST(CASE WHEN SUM(fp.n_tok) = 0 THEN 0
            ELSE ((SUM(fp.n_tok)
                   - SUM(CASE WHEN fp.doc_id = k.keep_id THEN fp.n_tok
                         ELSE 0 END)) * 1000000) // SUM(fp.n_tok) END
            AS BIGINT) AS dup_overhead_ppm
FROM fp JOIN keep k ON k.f = fp.f
GROUP BY 1
""",
    doc="Dedup-savings census per source — the budget artifact a corpus "
    "owner signs off on before a training run: how many tokens each "
    "source contributes RAW vs after GLOBAL exact dedup (keeper = "
    "min-id per content fingerprint, the dedup_exact rule), and the "
    "duplicate overhead in ppm. Because clusters are global while the "
    "census is per-source, cross-source syndication shows up exactly "
    "where it burns budget: a source whose docs lose keeper elections "
    "to earlier ids in another source reports high overhead — the "
    "signal for re-ordering ingestion priority or dropping a mirror. "
    "Shape: the dedup_exact aggregate (fingerprint-keyed, map-side "
    "combinable), one fingerprint-keyed join back, one source-keyed "
    "roll-up — no new shuffle class; all-integer outputs (token "
    "counts + floor-div ppm).",
    tags=("corpus", "dedup", "agg", "reporting"),
)
def corpus_dedup_inflation(spark: SparkSession, sf_dir: str):
    from ..functions.text import fingerprint

    d = t_cpu(spark, sf_dir, "documents")
    norm = _NORM_SPARK(F.col("text"))
    ntok = (
        F.when(F.length(norm) == 0, F.lit(0))
        .otherwise(
            F.length(norm) - F.length(F.regexp_replace(norm, " ", "")) + 1
        )
        .cast("bigint")
    )
    fp = d.select(
        "doc_id",
        "source",
        fingerprint("text").alias("f"),
        ntok.alias("n_tok"),
    )
    keep = fp.groupBy("f").agg(F.min("doc_id").alias("keep_id"))
    joined = fp.join(keep.hint("shuffle_hash"), "f")
    is_keep = (F.col("doc_id") == F.col("keep_id")).cast("int")
    agg = joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(is_keep).cast("bigint").alias("n_keepers"),
        F.sum("n_tok").alias("tokens_total"),
        F.sum(F.col("n_tok") * is_keep).cast("bigint").alias("tokens_kept"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_keepers",
        "tokens_total",
        "tokens_kept",
        F.when(F.col("tokens_total") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.expr(
                "((tokens_total - tokens_kept) * 1000000) div tokens_total"
            ).cast("bigint")
        )
        .alias("dup_overhead_ppm"),
    )


@register(
    "corpus_epoch_plan",
    oracle=f"""
WITH toks AS (
  SELECT source, CAST(SUM(len(string_split(nrm, ' '))) AS BIGINT) AS tokens
  FROM (SELECT source, {_NORM_SQL} AS nrm FROM documents)
  WHERE length(nrm) > 0 GROUP BY 1
),
tot AS (SELECT CAST((5 * SUM(tokens)) // 2 AS BIGINT) AS budget FROM toks),
steps AS (
  SELECT source, tokens, CAST(e AS INT) AS e,
         tokens * (1::BIGINT << (4 - e)) AS marginal_x8
  FROM toks, (SELECT unnest(range(1, 5)) AS e)
),
ordered AS (
  SELECT *, SUM(tokens) OVER (ORDER BY marginal_x8 DESC, source ASC, e ASC
                              ROWS UNBOUNDED PRECEDING) AS cum
  FROM steps
),
sel AS (SELECT * FROM ordered, tot WHERE cum <= budget)
SELECT t.source, t.tokens,
       CAST(count(s.e) AS BIGINT) AS epochs,
       CAST(COALESCE(SUM(s.marginal_x8), 0) AS BIGINT) AS effective_x8,
       (SELECT budget FROM tot) AS budget_tokens
FROM toks t LEFT JOIN sel s USING (source)
GROUP BY 1, 2
""",
    doc="Data-constrained epoch/repeat planning (Muennighoff et al. 2023, "
    "arXiv:2305.16264 'Scaling Data-Constrained Language Models'): when "
    "the token budget exceeds the unique corpus, sources are REPEATED, "
    "but each extra epoch is worth less — their fitted decay is modeled "
    "here as marginal value halving per epoch (epoch e of a source is "
    "worth tokens * 2^(4-e) in x8 fixed-point), capped at 4 epochs "
    "(their R* ~ 4 'repeats are as good as new data up to ~4 epochs' "
    "regime boundary). The plan is the exact greedy optimum for a "
    "budget of floor(2.5x total unique tokens): explode every (source, "
    "epoch<=4) step, order globally by marginal value (ties: source, "
    "epoch — fully pinned), take the running-cost prefix under budget — "
    "within a source marginals strictly decrease, so the greedy prefix "
    "always buys epoch e before e+1 and the per-source epoch count is "
    "well-formed. Everything after the per-source token count (one "
    "map-side-combinable aggregate over the corpus) runs on a "
    "#sources x 4 row table — driver-tiny at any corpus scale, so the "
    "single-partition ordering window is safe by construction; the "
    "integer x8 fixed-point keeps both engines bit-identical.",
    tags=("corpus", "sampling", "composition"),
)
def corpus_epoch_plan(spark: SparkSession, sf_dir: str):
    nrm = _NORM_SPARK(F.col("text"))
    toks = (
        t_cpu(spark, sf_dir, "documents")
        .filter(F.length(nrm) > 0)
        .select("source", F.size(F.split(nrm, " ")).alias("nw"))
        .groupBy("source")
        .agg(F.sum("nw").cast("bigint").alias("tokens"))
    )
    tot = toks.agg(
        F.expr("CAST((5 * SUM(tokens)) div 2 AS BIGINT)").alias("budget")
    )
    steps = toks.select(
        "source",
        "tokens",
        F.explode(F.array([F.lit(e) for e in (1, 2, 3, 4)])).alias("e"),
    ).withColumn(
        "marginal_x8",
        F.expr("tokens * shiftleft(CAST(1 AS BIGINT), 4 - e)"),
    )
    w = (
        Window.orderBy(F.desc("marginal_x8"), F.asc("source"), F.asc("e"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sel = (
        steps.withColumn("cum", F.sum("tokens").over(w))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cum") <= F.col("budget"))
    )
    agg = sel.groupBy("source").agg(
        F.count("e").cast("bigint").alias("epochs"),
        F.sum("marginal_x8").cast("bigint").alias("effective_x8"),
    )
    return (
        toks.join(agg, "source", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "tokens",
            F.coalesce(F.col("epochs"), F.lit(0)).cast("bigint").alias("epochs"),
            F.coalesce(F.col("effective_x8"), F.lit(0))
            .cast("bigint")
            .alias("effective_x8"),
            F.col("budget").alias("budget_tokens"),
        )
    )


@register(
    "corpus_curation_e2e",
    oracle=f"""
WITH mx AS (SELECT MAX(doc_id) + 1 AS off FROM documents),
base AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT mx.off + doc_id AS doc_id, text, 'mirror' AS source
  FROM documents, mx WHERE doc_id % 37 = 0
),
m AS (
  SELECT doc_id, source, {_NORM_SQL} AS nt,
         CAST(CASE WHEN length({_NORM_SQL}) = 0 THEN 0
              ELSE len(string_split({_NORM_SQL}, ' ')) END AS BIGINT) AS ntok,
         CAST(len(list_filter(string_split({_NORM_SQL}, ' '),
                              x -> x IN ('the', 'a', 'and', 'of')))
              AS BIGINT) AS nstop
  FROM base
),
q AS (
  SELECT * FROM m
  WHERE ntok BETWEEN 10 AND 2000 AND (nstop * 1000) // ntok >= 10
),
k AS (
  SELECT *, row_number() OVER (PARTITION BY md5(nt) ORDER BY doc_id) AS rn
  FROM q
),
agg AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS docs_quality,
         CAST(COUNT(*) FILTER (WHERE rn = 1) AS BIGINT) AS docs_final,
         CAST(COALESCE(SUM(ntok) FILTER (WHERE rn = 1), 0) AS BIGINT)
           AS tokens_final
  FROM k GROUP BY source
),
din AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS docs_in FROM base GROUP BY source
)
SELECT d.source, d.docs_in,
       CAST(COALESCE(a.docs_quality, 0) AS BIGINT) AS docs_quality,
       CAST(COALESCE(a.docs_final, 0) AS BIGINT) AS docs_final,
       CAST(COALESCE(a.tokens_final, 0) AS BIGINT) AS tokens_final
FROM din d LEFT JOIN agg a USING (source)
""",
    doc="END-TO-END curation pipeline — the 'raw crawl → training corpus' "
    "composition a user actually runs, as ONE declarative plan: quality "
    "gate (token-count band + integer stopword-density floor, pure "
    "map) → exact dedup (md5 fingerprint window, min-id keeper — one "
    "shuffle) → per-source yield report (docs in/after-quality/"
    "after-dedup, surviving token budget). Non-vacuity is SEEDED: every "
    "37th document is mirrored under source='mirror' with a DATA-DERIVED "
    "id offset (max(doc_id)+1 — never a fixed constant, the sf1 "
    "collision rule), so the dedup stage provably removes the whole "
    "mirror source (docs_final = 0 on the mirror row) while real "
    "sources pass through. Scale shape: the quality gate prunes before "
    "the dedup exchange; both report aggregates are map-side "
    "combinable; the 1-row max offset broadcasts. The SQL oracle replays "
    "all three stages in CTEs.",
    tags=("corpus", "dedup", "pipeline", "composition"),
    bench=True,
)
def corpus_curation_e2e(spark: SparkSession, sf_dir: str):
    from ..functions.text import normalized_text, stopword_count, token_count

    d = t_cpu(spark, sf_dir, "documents").select("doc_id", "text", "source")
    mx = d.agg((F.max("doc_id") + 1).alias("off"))
    clones = (
        d.filter(F.col("doc_id") % 37 == 0)
        .crossJoin(F.broadcast(mx))
        .select(
            (F.col("off") + F.col("doc_id")).alias("doc_id"),
            "text",
            F.lit("mirror").alias("source"),
        )
    )
    base = d.unionByName(clones)
    m = base.select(
        "doc_id",
        "source",
        normalized_text("text").alias("nt"),
        token_count("text").alias("ntok"),
        stopword_count("text").alias("nstop"),
    )
    q = m.filter(
        (F.col("ntok") >= 10)
        & (F.col("ntok") <= 2000)
        & (F.expr("(nstop * 1000) div ntok") >= 10)
    )
    w = Window.partitionBy(F.md5("nt")).orderBy("doc_id")
    k = q.withColumn("rn", F.row_number().over(w))
    agg = k.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs_quality"),
        F.count(F.when(F.col("rn") == 1, 1)).alias("docs_final"),
        F.coalesce(F.sum(F.when(F.col("rn") == 1, F.col("ntok"))), F.lit(0))
        .cast("bigint")
        .alias("tokens_final"),
    )
    din = base.groupBy("source").agg(F.count(F.lit(1)).alias("docs_in"))
    return din.join(agg, "source", "left").select(
        "source",
        "docs_in",
        F.coalesce("docs_quality", F.lit(0)).cast("bigint").alias("docs_quality"),
        F.coalesce("docs_final", F.lit(0)).cast("bigint").alias("docs_final"),
        F.coalesce("tokens_final", F.lit(0)).cast("bigint").alias("tokens_final"),
    )


@register(
    "text_mojibake_repair",
    oracle="""
WITH seeded AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN replace(text, ' the ', ' th' || chr(233) || ' ')
              ELSE text END AS t
  FROM documents
), corrupted AS (
  SELECT doc_id, t, replace(t, chr(233), chr(195) || chr(169)) AS c
  FROM seeded
)
SELECT doc_id,
       CAST(length(c) - length(replace(c, chr(195), '')) AS BIGINT)
         AS n_markers,
       length(c) <> length(t) AS repaired,
       CAST(length(c) - length(t) AS BIGINT) AS len_delta,
       md5(t) AS repaired_hash
FROM corrupted
""",
    doc="ftfy-style ENCODING REPAIR — the corpus-cleaning pass a web "
    "crawl needs before any text op (quality scores, shingles and "
    "tokenizers all read mojibake as distinct garbage tokens): text "
    "that was UTF-8-encoded but decoded as Latin-1 ('é' -> 'Ã©', "
    "NBSP -> 'Â ') round-trips back through Spark's JVM-side "
    "decode(encode(t,'ISO-8859-1'),'UTF-8'), applied only when the "
    "0xC2/0xC3 marker count is positive and the round-trip produces "
    "no U+FFFD (functions.text.repair_mojibake — safe corpus-wide, "
    "idempotent). The corpus is ASCII, so the query SEEDS ground "
    "truth the clones way: every 7th doc gets ' the ' -> ' thé ', is "
    "then corrupted through the exact UTF-8-bytes-as-Latin-1 "
    "transform, and the engine must repair it back. The oracle never "
    "runs charset code: it PREDICTS the repaired text as the seeded "
    "pre-corruption string by pure string algebra — md5(repaired) "
    "must equal md5(ground truth) byte-for-byte, so a repair that "
    "mangles one char hash-fails. Pure codegen map, zero shuffles, "
    "zero UDFs — encode/decode are Catalyst expressions.",
    tags=("corpus", "text", "scrub"),
)
def text_mojibake_repair(spark: SparkSession, sf_dir: str):
    from ..functions.text import mojibake_markers, repair_mojibake

    docs = t_cpu(spark, sf_dir, "documents").select("doc_id", "text")
    accented = F.when(
        F.col("doc_id") % 7 == 0,
        F.replace(F.col("text"), F.lit(" the "), F.lit(" thé ")),
    ).otherwise(F.col("text"))
    seeded = docs.select(
        "doc_id",
        F.replace(accented, F.lit("é"), F.lit("Ã©")).alias("__c"),
    )
    repaired = repair_mojibake(F.col("__c"))
    n_markers = mojibake_markers(F.col("__c"))
    return seeded.select(
        "doc_id",
        n_markers.alias("n_markers"),
        (n_markers > 0).alias("repaired"),
        (F.length("__c") - F.length(repaired)).cast("bigint").alias("len_delta"),
        F.md5(repaired).alias("repaired_hash"),
    )


@register(
    "text_mojibake_repair_deep",
    oracle="""
WITH seeded AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN replace(
                CASE WHEN doc_id % 7 = 0
                     THEN replace(text, ' the ', ' th' || chr(233) || ' ')
                     ELSE text END,
                ' and ', ' and' || chr(8217) || ' ')
              ELSE CASE WHEN doc_id % 7 = 0
                        THEN replace(text, ' the ', ' th' || chr(233) || ' ')
                        ELSE text END END AS t
  FROM documents
), corrupted AS (
  SELECT doc_id, t,
    CASE doc_id % 3
      WHEN 0 THEN replace(replace(t,
                    chr(233), chr(195) || chr(169)),
                    chr(8217), chr(226) || chr(8364) || chr(8482))
      WHEN 1 THEN replace(replace(t,
                    chr(233), chr(195) || chr(402) || chr(194) || chr(169)),
                    chr(8217), chr(195) || chr(162) || chr(226) || chr(8218)
                              || chr(172) || chr(226) || chr(8222) || chr(162))
      ELSE t END AS c
  FROM seeded
)
SELECT doc_id,
       CAST((length(c) - length(replace(c, chr(195), '')))
          + (length(c) - length(replace(c, chr(194), '')))
          + (length(c) - length(replace(c, chr(226), '')))
          + (length(c) - length(replace(c, chr(240), ''))) AS BIGINT)
         AS n_markers,
       c <> t AS repaired,
       CAST(length(c) - length(t) AS BIGINT) AS len_delta,
       md5(t) AS repaired_hash
FROM corrupted
""",
    doc="DEEP encoding repair (round-10 verdict #8 + ADVICE): the "
    "cp1252 mojibake profile ('’' -> 'â€™' — UTF-8 read by a "
    "Windows-1252 decoder, THE most common real-world variant) and "
    "DOUBLE-encoded text ('é' -> 'ÃƒÂ©', '’' -> 'Ã¢â‚¬â„¢') repaired "
    "by functions.text.repair_mojibake's ≤2-pass fixed point: each "
    "pass translates the 27 cp1252-only codepoints back to their C1 "
    "source bytes, then round-trips decode(encode(t,'ISO-8859-1'),"
    "'UTF-8') under the marker/domain/valid-UTF-8 guards. Seeding "
    "mirrors text_mojibake_repair: every 7th doc gains ' thé ', every "
    "5th ' and’ ', then doc_id%3 picks the corruption depth (0=single "
    "cp1252-display, 1=double, 2=clean control group). The oracle "
    "never runs charset code — it PREDICTS the corrupted string AND "
    "the repaired string by chr() algebra, so md5(repaired) must land "
    "byte-identical to the pre-corruption ground truth and the clean "
    "third must hash unchanged. Pure codegen map, zero shuffles, zero "
    "UDFs.",
    tags=("corpus", "text", "scrub"),
)
def text_mojibake_repair_deep(spark: SparkSession, sf_dir: str):
    from ..functions.text import mojibake_markers, repair_mojibake

    docs = t_cpu(spark, sf_dir, "documents").select("doc_id", "text")
    accented = F.when(
        F.col("doc_id") % 7 == 0,
        F.replace(F.col("text"), F.lit(" the "), F.lit(" thé ")),
    ).otherwise(F.col("text"))
    quoted = F.when(
        F.col("doc_id") % 5 == 0,
        F.replace(accented, F.lit(" and "), F.lit(" and’ ")),
    ).otherwise(accented)
    single = F.replace(
        F.replace(quoted, F.lit("é"), F.lit("Ã©")),
        F.lit("’"), F.lit("â€™"),
    )
    double = F.replace(
        F.replace(quoted, F.lit("é"), F.lit("ÃƒÂ©")),
        F.lit("’"), F.lit("Ã¢â‚¬â„¢"),
    )
    seeded = docs.select(
        "doc_id",
        quoted.alias("__t"),
        F.when(F.col("doc_id") % 3 == 0, single)
        .when(F.col("doc_id") % 3 == 1, double)
        .otherwise(quoted)
        .alias("__c"),
    )
    repaired = repair_mojibake(F.col("__c"))
    return seeded.select(
        "doc_id",
        mojibake_markers(F.col("__c")).alias("n_markers"),
        (repaired != F.col("__c")).alias("repaired"),
        (F.length("__c") - F.length(repaired)).cast("bigint").alias("len_delta"),
        F.md5(repaired).alias("repaired_hash"),
    )
