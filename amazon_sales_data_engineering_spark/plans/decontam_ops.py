"""Decontamination + repetition-quality + mixture-reweighting operators.

The three remaining corpus-hygiene steps a pre-training pipeline runs
before cutting shards:

- **Benchmark decontamination**: flag training documents that share long
  n-grams with a held-out eval split (the standard 13-gram-overlap test,
  scaled here to 5-grams because the synthetic docs are ~30 tokens). The
  scalable shape is an inverted-index equi-join on the n-gram — never a
  doc×doc comparison — with a hot-gram frequency cap so a degenerate
  n-gram ("the the the the the") cannot produce a quadratic fanout.
- **Repetition signals** (Gopher-style): most-frequent-word fraction and
  duplicate-bigram fraction. Top-word is the two-level aggregate
  (doc,term)→doc, both levels map-side combinable; the bigram signal
  never leaves the row (array ops), so it rides along for free.
- **Mixture reweighting**: per-source token shares → per-source sampling
  weight to hit a target mixture — the tiny driver table that a
  downstream hash-sampler (see corpus_ops.sample_stratified_hash) joins
  back against.

Determinism rules follow plans/registry: ratios are floor'd integer
milli-units, no floats cross an aggregation boundary.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .registry import register
from .util import t, t_cpu

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_NORM = lambda c: F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))  # noqa: E731

# Eval split: a deterministic ~1% carve-out by doc_id. 101 is coprime to
# the id stride so the split is spread across files/partitions.
_EVAL_PRED_SQL = "doc_id % 101 = 0"
_GRAM_N = 5
# A 5-gram present in more than this many *eval* documents is a stock
# phrase, not a contamination signal; dropping it bounds the join fanout
# per gram. (Cap on the broadcast eval side — the small side — so the
# train-side scan stays a pure map.)
_HOT_GRAM_CAP = 50


@register(
    "decontaminate_ngram_overlap",
    oracle=f"""
WITH corpus AS (
  -- Seeded contamination probe: re-inject every eval doc as a *training*
  -- doc (id + 1000000 leaves the eval residue class: 1000000 % 101 = 100)
  -- so the gate provably returns >= |eval split| true positives instead
  -- of vacuously matching on an empty result.
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 101 = 0
), toks AS (
  SELECT doc_id, doc_id % 101 = 0 AS is_eval,
         string_split({_NORM_SQL}, ' ') AS tk
  FROM corpus
  WHERE length({_NORM_SQL}) > 0
), grams AS (
  SELECT DISTINCT doc_id, is_eval, gram
  FROM (
    SELECT doc_id, is_eval,
           unnest(list_transform(range(1, len(tk) - {_GRAM_N - 2}),
                  i -> array_to_string(list_slice(tk, i, i + {_GRAM_N - 1}),
                                       ' '))) AS gram
    FROM toks WHERE len(tk) >= {_GRAM_N}
  )
), eval_grams AS (
  SELECT gram, COUNT(*) AS n_eval_docs
  FROM grams WHERE is_eval
  GROUP BY 1
  HAVING COUNT(*) <= {_HOT_GRAM_CAP}
)
SELECT g.doc_id,
       COUNT(*) AS n_shared_grams,
       CAST(SUM(e.n_eval_docs) AS BIGINT) AS n_eval_doc_hits,
       COUNT(*) >= 3 AS severe
FROM grams g JOIN eval_grams e ON g.gram = e.gram
WHERE NOT g.is_eval
GROUP BY 1
""",
    doc="Benchmark decontamination by n-gram overlap: flag every training "
    "document sharing a 5-gram with the deterministic eval split "
    "(doc_id % 101 = 0). Shape at 100 TB: per-doc DISTINCT grams are "
    "built map-side from the token array (no explode-then-distinct "
    "shuffle of duplicate grams); the eval-side gram set — small by "
    "construction — is aggregated, frequency-capped (grams in > "
    f"{_HOT_GRAM_CAP} eval docs are stock phrases, dropped to bound "
    "per-gram fanout), and broadcast; the train side then needs ONE "
    "shuffle-free broadcast-hash join + one (doc_id) aggregate. "
    "Never doc-by-doc comparison. Counts are integers — engine-exact. "
    "The corpus is seeded with a copy of each eval doc under a shifted "
    "train id (+1000000, which leaves the eval residue class) so the "
    "gate demonstrably catches contamination — a 0-row result would "
    "hash-match any always-empty plan.",
    tags=("corpus", "decontam", "join", "ngram"),
    bench=True,
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str):
    # r11 restructure (guide §2.4/§2.3): the original built one
    # union-all corpus (originals + re-injected eval copies) and derived
    # `grams` from it, referencing it twice (eval aggregate + train
    # join side) — Catalyst replayed the union + normalize + gram
    # explode per reference: FOUR documents scans. But the branches are
    # disjoint by construction: the eval side is exactly the ~1% residue
    # class (the +1000000 shift leaves it), and the injected train
    # copies carry the SAME text as the eval docs — so compute the
    # per-eval-doc distinct gram set ONCE (filter the 1% residue class
    # BEFORE the normalize/explode chain, persist the small result) and
    # reuse it both as the capped eval gram table and, re-keyed by
    # +1000000, as the injected train rows. One full-corpus normalize
    # pass (non-eval docs) + one 1% pass. Identical rows out.
    def doc_grams(df):
        norm = _NORM(F.col("text"))
        toks = (
            df.select("doc_id", norm.alias("norm"))
            .filter(F.length("norm") > 0)
            .select("doc_id", F.split(F.col("norm"), " ").alias("tk"))
            .filter(F.size("tk") >= _GRAM_N)
        )
        # Per-doc distinct grams, built inside the row: transform over
        # start positions + array_distinct, THEN explode — duplicates
        # never hit the exchange.
        return toks.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size("tk") - F.lit(_GRAM_N - 1)),
                        lambda i: F.array_join(F.slice("tk", i, _GRAM_N), " "),
                    )
                )
            ).alias("gram"),
        )

    base = t_cpu(spark, sf_dir, "documents").select("doc_id", "text")
    eg = doc_grams(base.filter(F.col("doc_id") % 101 == 0)).persist()
    eval_grams = (
        eg.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_eval_docs"))
        .filter(F.col("n_eval_docs") <= _HOT_GRAM_CAP)
    )
    train_grams = doc_grams(base.filter(F.col("doc_id") % 101 != 0)).unionByName(
        eg.select((F.col("doc_id") + F.lit(1000000)).alias("doc_id"), "gram")
    )
    return (
        train_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shared_grams"),
            F.sum("n_eval_docs").alias("n_eval_doc_hits"),
        )
        .select(
            "doc_id",
            "n_shared_grams",
            "n_eval_doc_hits",
            (F.col("n_shared_grams") >= 3).alias("severe"),
        )
    )


@register(
    "text_repetition_stats",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM_SQL}, ' ') AS tk
  FROM documents
  WHERE length({_NORM_SQL}) > 0
), bi AS (
  SELECT doc_id, tk,
         CASE WHEN len(tk) >= 2
              THEN list_transform(range(1, len(tk)),
                                  i -> tk[i] || ' ' || tk[i + 1])
              ELSE [] END AS bigrams
  FROM toks
), term_counts AS (
  SELECT doc_id, term, COUNT(*) AS cnt
  FROM (SELECT doc_id, unnest(tk) AS term FROM toks)
  GROUP BY 1, 2
), word_stats AS (
  SELECT doc_id, MAX(cnt) AS top_cnt, CAST(SUM(cnt) AS BIGINT) AS n_tokens
  FROM term_counts GROUP BY 1
)
SELECT w.doc_id, w.n_tokens,
       CAST(floor((w.top_cnt * 1000.0) / w.n_tokens) AS BIGINT)
         AS top_word_milli,
       CAST(CASE WHEN len(b.bigrams) = 0 THEN 0
            ELSE floor(((len(b.bigrams) - len(list_distinct(b.bigrams)))
                        * 1000.0) / len(b.bigrams)) END AS BIGINT)
         AS dup_bigram_milli,
       (floor((w.top_cnt * 1000.0) / w.n_tokens) >= 200
        OR (len(b.bigrams) > 0
            AND floor(((len(b.bigrams) - len(list_distinct(b.bigrams)))
                       * 1000.0) / len(b.bigrams)) >= 300)) AS repetitive
FROM word_stats w JOIN bi b ON b.doc_id = w.doc_id
""",
    doc="Gopher-style repetition signals: most-frequent-word fraction and "
    "duplicate-bigram fraction (both floor'd milli-units), composed into "
    "a repetitive flag (top word ≥ 20% of tokens OR ≥ 30% of bigrams "
    "duplicated). Both signals are computed INSIDE the row: the top-word "
    "count is the longest equal-run of the sorted token array (one "
    "aggregate() fold — max multiplicity by construction), the bigram "
    "signal zip_with + array_distinct; the whole query is one narrow "
    "map pass with zero shuffles. All-integer arithmetic: engine-exact.",
    tags=("corpus", "text", "filter"),
    bench=True,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents")
    norm = _NORM(F.col("text"))
    toks = (
        d.select("doc_id", norm.alias("norm"))
        .filter(F.length("norm") > 0)
        .select("doc_id", F.split(F.col("norm"), " ").alias("tk"))
    )
    bigrams = F.when(
        F.size("tk") >= 2,
        F.zip_with(
            F.slice(F.col("tk"), 1, F.size("tk") - 1),
            F.slice(F.col("tk"), 2, F.size("tk") - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # r11 rewrite (guide §2.4 — remove shuffles outright): the top-word
    # count is the maximum token multiplicity, which equals the longest
    # equal-run in the SORTED token array — computable in-row with one
    # aggregate() fold, exactly like the bigram signal. The previous
    # shape exploded the token stream through a two-level aggregate and
    # joined the per-doc halves back: 2 documents scans + 3 exchanges
    # for values that never needed to leave the row. Now the whole
    # query is ONE narrow map pass: zero exchanges, zero joins. Counts
    # are identical integers, so every output value is unchanged.
    run = F.aggregate(
        F.array_sort("tk"),
        F.struct(
            F.lit(None).cast("string").alias("p"),
            F.lit(0).cast("bigint").alias("r"),
            F.lit(0).cast("bigint").alias("b"),
        ),
        lambda acc, x: F.struct(
            x.alias("p"),
            F.when(x.eqNullSafe(acc.getField("p")), acc.getField("r") + 1)
            .otherwise(F.lit(1))
            .alias("r"),
            F.greatest(
                acc.getField("b"),
                F.when(
                    x.eqNullSafe(acc.getField("p")), acc.getField("r") + 1
                ).otherwise(F.lit(1)),
            ).alias("b"),
        ),
        lambda acc: acc.getField("b"),
    )
    stats = toks.select(
        "doc_id",
        F.size("tk").cast("bigint").alias("n_tokens"),
        run.alias("top_cnt"),
        F.size(bigrams).alias("n_bi"),
        F.size(F.array_distinct(bigrams)).alias("n_bi_distinct"),
    )
    top_milli = F.floor((F.col("top_cnt") * F.lit(1000.0)) / F.col("n_tokens"))
    dup_milli = F.when(F.col("n_bi") == 0, F.lit(0)).otherwise(
        F.floor(
            ((F.col("n_bi") - F.col("n_bi_distinct")) * F.lit(1000.0))
            / F.col("n_bi")
        )
    )
    return stats.select(
        "doc_id",
        "n_tokens",
        top_milli.cast("bigint").alias("top_word_milli"),
        dup_milli.cast("bigint").alias("dup_bigram_milli"),
        (
            (top_milli >= 200) | ((F.col("n_bi") > 0) & (dup_milli >= 300))
        ).alias("repetitive"),
    )


@register(
    "corpus_mix_weights",
    oracle=f"""
WITH per_source AS (
  SELECT source,
         CAST(SUM(CASE WHEN length({_NORM_SQL}) = 0 THEN 0
                  ELSE length({_NORM_SQL})
                       - length(replace({_NORM_SQL}, ' ', '')) + 1 END)
              AS BIGINT) AS src_tokens,
         COUNT(*) AS n_docs
  FROM documents
  GROUP BY 1
), tot AS (
  SELECT CAST(SUM(src_tokens) AS BIGINT) AS total_tokens,
         COUNT(*) AS n_sources
  FROM per_source
)
SELECT p.source, p.n_docs, p.src_tokens,
       CAST(floor((p.src_tokens * 1000.0) / t.total_tokens) AS BIGINT)
         AS share_milli,
       CAST(CASE WHEN p.src_tokens = 0 THEN 0
            ELSE floor((t.total_tokens * 1000.0)
                       / (t.n_sources * p.src_tokens)) END AS BIGINT)
         AS weight_milli
FROM per_source p, tot t
""",
    doc="Domain-mixture reweighting: per-source token shares and the "
    "sampling weight (in milli-units) that equalizes the mixture — "
    "weight = target_share / actual_share with a uniform target. The "
    "output is a sources-sized driver table that a deterministic "
    "hash-sampler joins back against (broadcast) to enforce the mix; "
    "computing it is ONE map-side-combinable aggregate over the corpus "
    "plus a broadcast total. floor'd integer milli-units: engine-exact.",
    tags=("corpus", "sampling", "agg"),
)
def corpus_mix_weights(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    norm = _NORM(F.col("text"))
    ntok = (
        F.when(F.length(norm) == 0, F.lit(0))
        .otherwise(
            F.length(norm) - F.length(F.regexp_replace(norm, " ", "")) + 1
        )
        .cast("bigint")
    )
    per_source = d.groupBy("source").agg(
        F.sum(ntok).alias("src_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    tot = per_source.agg(
        F.sum("src_tokens").cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    share = F.floor(
        (F.col("src_tokens") * F.lit(1000.0)) / F.col("total_tokens")
    )
    weight = F.when(F.col("src_tokens") == 0, F.lit(0)).otherwise(
        F.floor(
            (F.col("total_tokens") * F.lit(1000.0))
            / (F.col("n_sources") * F.col("src_tokens"))
        )
    )
    return per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "src_tokens",
        share.cast("bigint").alias("share_milli"),
        weight.cast("bigint").alias("weight_milli"),
    )


@register(
    "corpus_mix_apply",
    oracle=f"""
WITH per_source AS (
  SELECT source,
         CAST(SUM(CASE WHEN length({_NORM_SQL}) = 0 THEN 0
                  ELSE length({_NORM_SQL})
                       - length(replace({_NORM_SQL}, ' ', '')) + 1 END)
              AS BIGINT) AS src_tokens
  FROM documents GROUP BY 1
), tot AS (
  SELECT CAST(SUM(src_tokens) AS BIGINT) AS total_tokens,
         COUNT(*) AS n_sources
  FROM per_source
), weights AS (
  SELECT p.source,
         CAST(CASE WHEN p.src_tokens = 0 THEN 0
              ELSE floor((t.total_tokens * 1000.0)
                         / (t.n_sources * p.src_tokens)) END AS BIGINT)
           AS w_milli
  FROM per_source p, tot t
), planned AS (
  SELECT d.doc_id, d.source,
         (w.w_milli // 1000)
         + CASE WHEN ((d.doc_id % 2147483648) * 2654435761) % 1000
                     < (w.w_milli % 1000) THEN 1 ELSE 0 END AS n_copies
  FROM documents d JOIN weights w ON w.source = d.source
)
SELECT source,
       CAST(SUM(n_copies) AS BIGINT) AS n_rows_out,
       CAST(COUNT(*) AS BIGINT) AS n_docs_in
FROM planned
GROUP BY 1
""",
    doc="Apply the mixture weights end-to-end: every document is "
    "replicated floor(w) times plus one stochastic copy decided by a "
    "deterministic multiplicative hash of doc_id against the fractional "
    "part — upsampling AND downsampling from the same rule (w<1 keeps "
    "a hash-selected fraction), no rand(), retry-safe. The engine "
    "genuinely materializes the copies (sequence+explode — the "
    "distributed row-replication idiom) and counts the result; the "
    "oracle computes the same counts arithmetically, so the gate proves "
    "explode(sequence(1, n_copies)) emits exactly n_copies rows per "
    "doc. Weight table is sources-sized and broadcast; the scan side "
    "stays narrow until the final count.",
    tags=("corpus", "sampling", "composition"),
)
def corpus_mix_apply(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    norm = _NORM(F.col("text"))
    ntok = (
        F.when(F.length(norm) == 0, F.lit(0))
        .otherwise(
            F.length(norm) - F.length(F.regexp_replace(norm, " ", "")) + 1
        )
        .cast("bigint")
    )
    per_source = d.groupBy("source").agg(F.sum(ntok).alias("src_tokens"))
    tot = per_source.agg(
        F.sum("src_tokens").cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    w_milli = (
        F.when(F.col("src_tokens") == 0, F.lit(0))
        .otherwise(
            F.floor(
                (F.col("total_tokens") * F.lit(1000.0))
                / (F.col("n_sources") * F.col("src_tokens"))
            )
        )
        .cast("bigint")
    )
    weights = per_source.crossJoin(F.broadcast(tot)).select(
        "source", w_milli.alias("w_milli")
    )
    h = ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)) % F.lit(1000)
    n_copies = (F.col("w_milli") / F.lit(1000)).cast("bigint") + F.when(
        h < F.col("w_milli") % 1000, F.lit(1)
    ).otherwise(F.lit(0))
    planned = d.select("doc_id", "source").join(
        F.broadcast(weights), "source"
    ).select("doc_id", "source", n_copies.alias("n_copies"))
    # Materialize the replicas for real: one output row per copy.
    replicated = planned.filter(F.col("n_copies") > 0).select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("__copy"),
    )
    # Left join from the planned side: a fully-downsampled source (zero
    # replicas) must still report n_rows_out = 0, not vanish.
    return (
        planned.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs_in"))
        .join(
            replicated.groupBy("source").agg(
                F.count(F.lit(1)).alias("n_rows_out")
            ),
            "source",
            "left",
        )
        .select(
            "source",
            F.coalesce(F.col("n_rows_out"), F.lit(0)).alias("n_rows_out"),
            "n_docs_in",
        )
    )


@register(
    "corpus_temperature_mix",
    oracle=f"""
WITH per_source AS (
  SELECT source,
         CAST(SUM(CASE WHEN length({_NORM_SQL}) = 0 THEN 0
                  ELSE length({_NORM_SQL})
                       - length(replace({_NORM_SQL}, ' ', '')) + 1 END)
              AS BIGINT) AS src_tokens,
         COUNT(*) AS n_docs
  FROM documents
  GROUP BY 1
), rooted AS (
  SELECT source, n_docs, src_tokens,
         CAST(floor(sqrt(CAST(src_tokens AS DOUBLE)) * 1000.0) AS BIGINT)
           AS sqrt_milli
  FROM per_source
), tot AS (
  SELECT CAST(SUM(src_tokens) AS BIGINT) AS total_tokens,
         CAST(SUM(sqrt_milli) AS BIGINT) AS total_sqrt
  FROM rooted
)
SELECT r.source, r.n_docs, r.src_tokens,
       CAST(floor((r.src_tokens * 1000000.0) / t.total_tokens) AS BIGINT)
         AS p_ppm,
       CAST(floor((r.sqrt_milli * 1000000.0) / t.total_sqrt) AS BIGINT)
         AS q_ppm,
       CAST(CASE WHEN r.src_tokens = 0 THEN 0
            ELSE floor(((r.sqrt_milli * 1000000.0) / t.total_sqrt)
                       * t.total_tokens / r.src_tokens) END AS BIGINT)
         AS boost_ppm
FROM rooted r, tot t
""",
    doc="Temperature-scaled mixture reweighting at tau = 1/2 — the "
    "multilingual/multi-domain sampling rule (q_i proportional to "
    "p_i^tau) that up-weights low-resource sources less aggressively "
    "than full equalization (corpus_mix_weights' uniform target) and "
    "more than natural sampling: the standard knob for multilingual "
    "pre-training mixes. tau = 1/2 is chosen deliberately: p^0.5 is "
    "sqrt, the ONE power IEEE-754 requires to be correctly rounded — "
    "bit-identical on any engine — whereas arbitrary pow()/log() "
    "routes through libm and is not gate-comparable. Each source's "
    "sqrt(tokens) is fixed-point quantized (floor(sqrt*1000), exact "
    "multiply + floor) BEFORE the normalizing sum, so the denominator "
    "is an exact integer and natural share p_ppm, tempered share "
    "q_ppm, and the per-source sampling boost (q/p) are deterministic "
    "integer/single-division arithmetic. One map-side-combinable "
    "aggregate over the corpus + a broadcast 1-row total — the "
    "sources-sized output joins back (broadcast) against a "
    "hash-sampler to enforce the mix, exactly like corpus_mix_apply.",
    tags=("corpus", "sampling", "agg"),
)
def corpus_temperature_mix(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    norm = _NORM(F.col("text"))
    ntok = (
        F.when(F.length(norm) == 0, F.lit(0))
        .otherwise(
            F.length(norm) - F.length(F.regexp_replace(norm, " ", "")) + 1
        )
        .cast("bigint")
    )
    rooted = (
        d.groupBy("source")
        .agg(
            F.sum(ntok).alias("src_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .withColumn(
            "sqrt_milli",
            F.floor(F.sqrt(F.col("src_tokens").cast("double")) * F.lit(1000.0))
            .cast("bigint"),
        )
    )
    tot = rooted.agg(
        F.sum("src_tokens").alias("total_tokens"),
        F.sum("sqrt_milli").alias("total_sqrt"),
    )
    q_ppm = F.floor(
        (F.col("sqrt_milli") * F.lit(1000000.0)) / F.col("total_sqrt")
    ).cast("bigint")
    return rooted.join(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "src_tokens",
        F.floor(
            (F.col("src_tokens") * F.lit(1000000.0)) / F.col("total_tokens")
        )
        .cast("bigint")
        .alias("p_ppm"),
        q_ppm.alias("q_ppm"),
        F.when(F.col("src_tokens") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.floor(
                (
                    (F.col("sqrt_milli") * F.lit(1000000.0))
                    / F.col("total_sqrt")
                )
                * F.col("total_tokens")
                / F.col("src_tokens")
            ).cast("bigint")
        )
        .alias("boost_ppm"),
    )


_SIGN_BUCKET_SQL = """CAST((CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
            + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
            + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
            + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END)
            + (CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END)
            + (CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END)
            + (CASE WHEN embedding[7] >= 0 THEN 64 ELSE 0 END)
            + (CASE WHEN embedding[8] >= 0 THEN 128 ELSE 0 END) AS INT)"""


@register(
    "decontaminate_embedding",
    oracle=f"""
WITH raw AS (
  SELECT vec_id, {_SIGN_BUCKET_SQL} AS bucket,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
ev AS (SELECT vec_id AS eval_id, bucket, e AS pe FROM raw WHERE vec_id % 50 = 0),
tr AS (SELECT vec_id, bucket, e FROM raw WHERE vec_id % 50 <> 0),
scored AS (
  SELECT tr.vec_id, ev.eval_id,
         list_sum(list_transform(range(1, len(pe) + 1), i -> pe[i] * e[i]))
         / (sqrt(list_sum(list_transform(pe, x -> x * x)))
            * sqrt(list_sum(list_transform(e, x -> x * x)))) AS cos_sim
  FROM tr JOIN ev USING (bucket)
),
flagged AS (
  SELECT vec_id, eval_id, cos_sim,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos_sim DESC, eval_id ASC) AS rn
  FROM scored WHERE cos_sim >= 0.2
)
SELECT vec_id, eval_id, cos_sim FROM flagged WHERE rn = 1
""",
    doc="SEMANTIC decontamination — the embedding-space twin of "
    "decontaminate_ngram_overlap: n-gram overlap misses paraphrased or "
    "translated benchmark leakage, so modern pipelines (e.g. the "
    "GPT-4/Llama-3 eval-hygiene reports, and Yang et al. 2023 "
    "arXiv:2311.04850 on rephrased contamination) additionally flag "
    "training items whose EMBEDDING sits too close to any held-out "
    "eval item. Eval split: vec_id % 50 = 0 (deterministic ~2% "
    "carve-out, same idiom as the n-gram op's doc_id % 101). Candidate "
    "generation is sign-bucket LSH on the first 8 dims (the "
    "ann_lsh_buckets hyperplane family) — train x eval pairs meet only "
    "inside a bucket, never as a cartesian — then exact cosine at "
    "threshold 0.2 (the highest threshold with flagged pairs at every "
    "gate scale — 0.4 returned zero rows everywhere, a trivially-"
    "passing gate), keeping each train vector's single closest eval "
    "neighbor (ties: lower eval_id). Scale shape: the eval side is "
    "tiny by construction (benchmarks are thousands of rows, the "
    "corpus billions) and BROADCASTS; the train side stays a pure "
    "map-side scan — per-bucket eval lists bound the per-row work, so "
    "the pass is one narrow stage at any corpus size. Determinism: "
    "cosines are the registry's sequential left-folds; ties resolved "
    "by id before any float leaves the row.",
    tags=("corpus", "decontam", "similarity", "embedding"),
    bench=True,
)
def decontaminate_embedding(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    from ..operators.similarity import cosine

    emb = F.col("embedding")
    bucket = sum(
        (
            F.when(F.element_at(emb, j + 1) >= 0, F.lit(1 << j)).otherwise(0)
            for j in range(8)
        ),
        start=F.lit(0),
    ).cast("int")
    raw = t_cpu(spark, sf_dir, "embeddings").select(
        "vec_id",
        bucket.alias("bucket"),
        F.transform(emb, lambda x: x.cast("double")).alias("e"),
    )
    ev = raw.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("eval_id"),
        "bucket",
        F.col("e").alias("pe"),
    )
    tr = raw.filter(F.col("vec_id") % 50 != 0)
    scored = tr.join(F.broadcast(ev), "bucket").select(
        "vec_id",
        "eval_id",
        cosine(F.col("pe"), F.col("e")).alias("cos_sim"),
    )
    flagged = scored.filter(F.col("cos_sim") >= 0.2).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("vec_id").orderBy(
                F.desc("cos_sim"), F.asc("eval_id")
            )
        ),
    )
    return flagged.filter(F.col("rn") == 1).select("vec_id", "eval_id", "cos_sim")
