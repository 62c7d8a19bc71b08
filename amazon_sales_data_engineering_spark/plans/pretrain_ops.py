"""Pre-training data-curation operators from the published LLM-pipeline
literature, each re-expressed Spark-first and DuckDB-oracled:

- ``semdedup_prune``       — SemDeDup (Abbas et al. 2023): k-means
  clustering + intra-cluster cosine pruning.
- ``dsir_importance_ppm``  — DSIR (Xie et al. 2023): hashed-n-gram
  importance weighting + deterministic weighted resampling.
- ``ccnet_perplexity_buckets`` — CCNet (Wenzek et al. 2020): per-language
  head/middle/tail LM-score bucketing.
- ``bpe_train_merges``     — BPE tokenizer TRAINING (Sennrich et al.
  2016): iterative most-frequent-pair merges over the word-frequency
  table.

Every op follows the registry's determinism contract (exact integer /
fixed-point arithmetic, identical IEEE fold orders, pinned tie-breaks)
so the DuckDB oracle is value-identical at any scale factor.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..operators.similarity import norm
from .registry import register
from .util import parquet_num_rows, t_cpu

_NORM_SPARK = lambda c: F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))  # noqa: E731
_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

#: Rolling polynomial hash parameters shared by the Spark and SQL sides:
#: h = fold over char codes of ((h * 31 + code) mod _HASH_P); both engines
#: see pure-ASCII lowercase words, so ascii()/ord() agree, and the fold's
#: zero seed equals DuckDB list_reduce's first-element seed because
#: (0 * 31 + c) mod p == c for c < p.
_HASH_P = 1000003
_N_BUCKETS = 1024


def _auto_centroid_modulus(n: int) -> int:
    """Same √n-scaled modulus ann_ivf_topk uses: the smallest power-of-4
    cap >= n gives m = max(50, 2^k), so both centroid count (n/m) and
    mean cluster size (m) grow as √n — intra-cluster pair work stays
    O(n^1.5), never quadratic. Computed from parquet footer metadata
    (zero Spark jobs) and replayed exactly by the oracle's integer CTE."""
    k, cap = 0, 1
    while cap < n:
        cap <<= 2
        k += 1
    return max(50, 1 << k)


_SEMDEDUP_M_SQL = """
nn AS (SELECT count(*) AS n FROM embeddings),
par AS (
  SELECT greatest(50, 1::BIGINT << (
    SELECT min(k) FROM range(0, 32) t(k)
    WHERE (1::BIGINT << (2 * k)) >= (SELECT n FROM nn))) AS m
  FROM nn
)"""


@register(
    "semdedup_prune",
    oracle=f"""
WITH {_SEMDEDUP_M_SQL},
m0 AS MATERIALIZED (
  SELECT vec_id, e,
         sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
  FROM (SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings)
),
cent AS MATERIALIZED (
  SELECT vec_id AS cid, e AS cvec, nrm AS cnrm
  FROM m0 WHERE vec_id % (SELECT m FROM par) = 0
),
asg AS MATERIALIZED (
  SELECT m0.vec_id, m0.e, m0.nrm,
         CAST((min([
           -(list_sum(list_transform(range(1, len(m0.e) + 1),
                                     j -> m0.e[j] * c.cvec[j]))
             / (m0.nrm * c.cnrm)),
           CAST(c.cid AS DOUBLE)]))[2] AS BIGINT) AS cid
  FROM m0, cent c
  GROUP BY 1, 2, 3
),
dup AS (
  SELECT b.vec_id AS vec_id, min(a.vec_id) AS dup_of
  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE list_sum(list_transform(range(1, len(a.e) + 1),
                                j -> a.e[j] * b.e[j]))
        / (a.nrm * b.nrm) >= 0.3
  GROUP BY 1
)
SELECT v.vec_id, v.cid, d.dup_of,
       d.dup_of IS NULL AS keep
FROM asg v LEFT JOIN dup d USING (vec_id)
""",
    doc="SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the "
    "embedding table, then inside each cluster drop every vector whose "
    "cosine similarity to an earlier-kept vector exceeds tau = 0.3 "
    "(p99 of the corpus pairwise-cosine distribution) — semantic "
    "near-duplicate pruning, the step AFTER MinHash catches lexical "
    "dups. Deterministic variant: one Lloyd assignment round against "
    "√n-scaled id-modulus centroids (the ann_ivf_topk formula, sized "
    "job-free from parquet footers and replayed by the oracle's "
    "integer CTE), 'earlier' = lower vec_id, so keepers are unique and "
    "reproducible — no random cluster seeds. Scale shape: centroids "
    "broadcast (k x d), assignment is one narrow map pass, and the "
    "only join is cluster-keyed with √n-bounded clusters → O(n^1.5) "
    "pair work, never a cartesian; cosines are identical left-to-right "
    "IEEE folds with norms computed once per vector on both engines.",
    tags=("dedup", "similarity", "embedding"),
    bench=True,
)
def semdedup_prune(spark: SparkSession, sf_dir: str):
    m = _auto_centroid_modulus(parquet_num_rows(sf_dir, "embeddings"))
    v = t_cpu(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    m0 = v.select("vec_id", "e", norm(F.col("e")).alias("nrm"))
    cent = m0.filter(F.col("vec_id") % m == 0).select(
        F.col("vec_id").alias("cid"),
        F.col("e").alias("cvec"),
        F.col("nrm").alias("cnrm"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("e"), F.col("cvec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    asg = (
        m0.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "cid",
            F.array(
                -(dot / (F.col("nrm") * F.col("cnrm"))),
                F.col("cid").cast("double"),
            ).alias("rank_key"),
        )
        .groupBy("vec_id")
        .agg(F.min_by("cid", "rank_key").alias("cid"))
        .join(m0, "vec_id")
        # referenced three times (both pair sides + the final projection):
        # without a persist the n×√n assignment cross-join re-executes per
        # reference — the round-4 double-reference trap.
        .persist()
    )
    a = asg.select(
        F.col("vec_id").alias("id_a"), "cid",
        F.col("e").alias("ea"), F.col("nrm").alias("na"),
    )
    b = asg.select(
        F.col("vec_id").alias("id_b"), "cid",
        F.col("e").alias("eb"), F.col("nrm").alias("nb"),
    )
    pair_dot = F.aggregate(
        F.zip_with(F.col("ea"), F.col("eb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dup = (
        a.join(b, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(pair_dot / (F.col("na") * F.col("nb")) >= 0.3)
        .groupBy(F.col("id_b").alias("vec_id"))
        .agg(F.min("id_a").alias("dup_of"))
    )
    return asg.join(dup, "vec_id", "left").select(
        "vec_id",
        "cid",
        "dup_of",
        F.col("dup_of").isNull().alias("keep"),
    )


_WORD_HASH_SQL = (
    "list_reduce(list_transform(range(1, length(w) + 1), "
    "i -> CAST(ord(substr(w, i, 1)) AS BIGINT)), "
    f"(a, b) -> (a * 31 + b) % {_HASH_P})"
)


def _word_hash_spark(w):
    codes = F.transform(
        F.sequence(F.lit(1), F.length(w)),
        lambda i: F.ascii(F.substr(w, i, F.lit(1))).cast("bigint"),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * F.lit(31) + c) % F.lit(_HASH_P),
    )


@register(
    "dsir_importance_ppm",
    oracle=f"""
WITH docs AS (
  SELECT doc_id, lang, string_split({_NORM_SQL}, ' ') AS ws
  FROM documents WHERE length({_NORM_SQL}) > 0
),
hs AS (
  SELECT doc_id, lang,
         list_transform(ws, w -> {_WORD_HASH_SQL}) AS h
  FROM docs
),
feats AS MATERIALIZED (
  SELECT doc_id, lang,
         unnest(list_concat(
           list_transform(h, x -> x % {_N_BUCKETS}),
           list_transform(range(1, len(h)),
             i -> ((h[i] * 131 + h[i + 1]) % {_HASH_P}) % {_N_BUCKETS})
         )) AS b
  FROM hs
),
cnts AS MATERIALIZED (
  SELECT b,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS cs
  FROM feats GROUP BY 1
),
tot AS (SELECT SUM(ct) AS tt, SUM(cs) AS ts FROM cnts),
ratio AS (
  SELECT b,
         CAST((1000000::HUGEINT * (ct + 1) * (ts + {_N_BUCKETS}))
              // ((cs + 1)::HUGEINT * (tt + {_N_BUCKETS})) AS BIGINT) AS rp
  FROM cnts, tot
),
sc AS (
  SELECT f.doc_id, f.lang,
         CAST(count(*) AS BIGINT) AS n_feats,
         CAST(SUM(rp) AS BIGINT) AS score
  FROM feats f JOIN ratio USING (b)
  WHERE f.lang <> 'en'
  GROUP BY 1, 2
),
mx AS (SELECT max(score) AS ms FROM sc)
SELECT doc_id, lang, n_feats, score,
       CAST((score::HUGEINT * 1000000) // ms AS BIGINT) AS accept_ppm,
       ((doc_id % 2147483648) * 2654435761) % 4294967296 % 1000000
         < CAST((score::HUGEINT * 1000000) // ms AS BIGINT) AS selected
FROM sc, mx
""",
    doc="DSIR (Xie et al. 2023, arXiv:2302.03169): score every pool "
    "document by how much its hashed-n-gram profile resembles a target "
    "domain (here lang='en' is the target, everything else the raw "
    "pool), then resample proportional to the importance weight. "
    "Features are word unigrams + bigrams hashed into 1024 buckets "
    "(rolling 31-polynomial over char codes mod 1000003 — identical "
    "integer fold on both engines); per-feature weight is the add-1 "
    "smoothed frequency ratio in ppm, floor((c_t+1)(T_s+B)*1e6 / "
    "((c_s+1)(T_t+B))) in exact >int64 arithmetic (DECIMAL(38,0) div / "
    "HUGEINT //), the gate-exact surrogate for the log-ratio (per-"
    "feature monotone, log-free — the same trick search_bm25_rational "
    "uses for idf); a document's score sums the weight per feature "
    "OCCURRENCE. Resampling is deterministic: accept when a Knuth "
    "multiplicative hash of doc_id (mod 1e6) falls below the doc's "
    "score/max_score in ppm — probability proportional to weight, "
    "reproducible under retries, no rand(). Scale shape: the feature "
    "table is <= 1024 rows (broadcast), totals are one 1-row cross "
    "join, per-doc scoring is one map-side-combinable aggregate — no "
    "global sort, no quadratic stage.",
    tags=("corpus", "sampling", "text"),
    bench=True,
)
def dsir_importance_ppm(spark: SparkSession, sf_dir: str):
    from ..functions.wordhash import feature_bucket_counts

    nrm = _NORM_SPARK(F.col("text"))
    docs = (
        t_cpu(spark, sf_dir, "documents")
        .filter(F.length(nrm) > 0)
        .select("doc_id", "lang", F.split(nrm, " ").alias("ws"))
    )
    # Per-doc bucket counts in ONE vectorized Arrow projection (r12,
    # guide §4.2/§2.3): the interpreted per-char hash fold, the bigram
    # HOF, the ~40-occurrences-per-doc explode AND the (doc, b)
    # hash-aggregate exchange all collapse into a numpy batch pass that
    # emits the identical (b -> k) map per doc — exploding it yields
    # bit-for-bit the rows of the replaced
    # feats.groupBy(doc, lang, b).count() (pinned in
    # tests/test_wordhash_arrow.py; same-sitting A/B of the fc build:
    # 1.18 -> 0.58s at sf0.1). Persisted because the counts feed BOTH
    # the global target/source totals and the per-doc scoring join.
    fc = (
        docs.select(
            "doc_id", "lang",
            F.explode(feature_bucket_counts("ws")).alias("b", "k"),
        )
        .persist()
    )
    cnts = fc.groupBy("b").agg(
        F.sum(F.when(F.col("lang") == "en", F.col("k")).otherwise(0))
        .cast("bigint").alias("ct"),
        F.sum(F.when(F.col("lang") != "en", F.col("k")).otherwise(0))
        .cast("bigint").alias("cs"),
    )
    tot = cnts.agg(F.sum("ct").alias("tt"), F.sum("cs").alias("ts"))
    ratio = cnts.join(F.broadcast(tot)).select(
        "b",
        F.expr(
            f"CAST((CAST(1000000 AS DECIMAL(38,0)) * (ct + 1) * (ts + {_N_BUCKETS}))"
            f" div ((cs + 1) * (tt + {_N_BUCKETS})) AS BIGINT)"
        ).alias("rp"),
    )
    sc = (
        fc.filter(F.col("lang") != "en")
        .join(F.broadcast(ratio), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("k").cast("bigint").alias("n_feats"),
            F.sum(F.col("k") * F.col("rp")).cast("bigint").alias("score"),
        )
    )
    mx = sc.agg(F.max("score").alias("ms"))
    accept = F.expr(
        "CAST((CAST(score AS DECIMAL(38,0)) * 1000000) div ms AS BIGINT)"
    )
    return sc.join(F.broadcast(mx)).select(
        "doc_id", "lang", "n_feats", "score",
        accept.alias("accept_ppm"),
        (
            ((F.col("doc_id") % 2147483648) * 2654435761) % 4294967296
            % 1000000
            < accept
        ).alias("selected"),
    )


@register(
    "ccnet_perplexity_buckets",
    oracle=f"""
WITH n0 AS (
  SELECT doc_id, lang, {_NORM_SQL} AS s
  FROM documents WHERE length({_NORM_SQL}) >= 3
),
tg AS MATERIALIZED (
  SELECT doc_id, lang,
         unnest(list_transform(range(1, length(s) - 1),
                               i -> substr(s, i, 3))) AS g
  FROM n0
),
cg AS MATERIALIZED (
  SELECT g, CAST(count(*) AS BIGINT) AS c FROM tg GROUP BY 1
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS tt FROM cg),
sc AS (
  SELECT tg.doc_id, tg.lang,
         CAST(count(*) AS BIGINT) AS n_tri,
         CAST(SUM(c) AS BIGINT) AS sum_c
  FROM tg JOIN cg USING (g)
  GROUP BY 1, 2
),
scored AS (
  SELECT doc_id, lang, n_tri,
         CAST((sum_c * 1000000) // ((SELECT tt FROM tot) * n_tri) AS BIGINT)
           AS score_ppm
  FROM sc
)
SELECT doc_id, lang, n_tri, score_ppm,
       CASE NTILE(3) OVER (PARTITION BY lang
                           ORDER BY score_ppm DESC, doc_id ASC)
         WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM scored
""",
    doc="CCNet-style LM bucketing (Wenzek et al. 2020, arXiv:1911.00359): "
    "score every document by a corpus character-trigram language model "
    "and split each language into head / middle / tail terciles — the "
    "filtering signal CCNet derives from a KenLM perplexity, here the "
    "gate-exact log-free twin: score_ppm = floor(mean corpus-frequency "
    "of the doc's trigrams, in ppm of the trigram total) — higher = "
    "more typical = head (low perplexity), all integer arithmetic "
    "(sum_c*1e6 and tt*n_tri both bounded well inside int64 at any "
    "tested sf). Docs shorter than 3 normalized chars carry no trigram "
    "and are excluded, matching CCNet's empty-after-cleanup drop. "
    "Scale shape: the trigram vocabulary is bounded by the normalized "
    "alphabet (|Σ|³), so counts BROADCAST back to the stream — two "
    "map-side-combinable aggregates total; the tercile is a per-"
    "language NTILE with a doc_id tie-break (identical semantics both "
    "engines; at extreme scale the cutoffs would come from a quantile "
    "sketch, cf. quantile_sketch_binned).",
    tags=("corpus", "text", "quality"),
    bench=True,
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str):
    from ..functions.wordhash import trigram_counts

    nrm = _NORM_SPARK(F.col("text"))
    n0 = (
        t_cpu(spark, sf_dir, "documents")
        .filter(F.length(nrm) >= 3)
        .select("doc_id", "lang", nrm.alias("s"))
    )
    # Per-doc trigram counts in ONE vectorized Arrow projection (r12,
    # guide §4.2/§2.3), trigrams PACKED as c1·2^42 + c2·2^21 + c3
    # (injective over all code points; g never reaches the output, so
    # swapping the 3-char string key for a bigint changes nothing
    # downstream — full-query equality pinned in
    # tests/test_wordhash_arrow.py and the oracle hash). Replaces the
    # interpreted substr HOF + ~140-occurrences-per-doc explode + the
    # (doc, g) hash-aggregate exchange; same-sitting full-query A/B
    # 1.51 -> 1.18s at sf0.1. Persisted: the counts feed BOTH the
    # global vocabulary counts and the per-doc scores (round-4
    # double-reference rule).
    tgc = (
        n0.select(
            "doc_id", "lang",
            F.explode(trigram_counts("s")).alias("g", "k"),
        )
        .persist()
    )
    cg = tgc.groupBy("g").agg(F.sum("k").cast("bigint").alias("c"))
    tot = cg.agg(F.sum("c").cast("bigint").alias("tt"))
    sc = (
        tgc.join(F.broadcast(cg), "g")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("k").cast("bigint").alias("n_tri"),
            F.sum(F.col("k") * F.col("c")).cast("bigint").alias("sum_c"),
        )
    )
    scored = sc.join(F.broadcast(tot)).select(
        "doc_id", "lang", "n_tri",
        F.expr("(sum_c * 1000000) div (tt * n_tri)").alias("score_ppm"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("score_ppm"), F.asc("doc_id")
    )
    nt = F.ntile(3).over(w)
    return scored.select(
        "doc_id", "lang", "n_tri", "score_ppm",
        F.when(nt == 1, "head")
        .when(nt == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


_BPE_ROUNDS = 6
_SEP = "\x1f"


def _bpe_cte_chain(rounds: int, carry_word: bool = False) -> str:
    """Unrolled BPE-training CTE chain: one (pairs, best, state) trio per
    round, every CTE MATERIALIZED — DuckDB inlines multiply-referenced
    CTEs, and the round chain references each state twice (pair counts +
    merge apply): the SQL twin of the Spark-side per-round lineage cut.
    With ``carry_word`` the word column rides along every state, so the
    final state doubles as the word → token-sequence encoding table."""
    sep2 = "chr(31) || chr(31)"
    wcol = "word, " if carry_word else ""
    parts = [
        f"""WITH w AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split({_NORM_SQL}, ' ')) AS word
        FROM documents WHERE length({_NORM_SQL}) > 0)
  GROUP BY 1
),
s0 AS MATERIALIZED (
  SELECT {wcol}cnt,
         chr(31) || array_to_string(list_append(string_split(word, ''), '$'),
                                    {sep2}) || chr(31) AS s
  FROM w
)"""
    ]
    for r in range(1, rounds + 1):
        prev = f"s{r - 1}"
        parts.append(
            f"""p{r} AS MATERIALIZED (
  SELECT tk[i] AS lhs, tk[i + 1] AS rhs, CAST(SUM(cnt) AS BIGINT) AS pair_cnt
  FROM (SELECT cnt, tk, unnest(range(1, len(tk))) AS i
        FROM (SELECT cnt,
                     string_split(substr(s, 2, length(s) - 2), {sep2}) AS tk
              FROM {prev}))
  GROUP BY 1, 2
),
b{r} AS MATERIALIZED (
  SELECT lhs, rhs, pair_cnt FROM p{r}
  ORDER BY pair_cnt DESC, lhs ASC, rhs ASC LIMIT 1
),
s{r} AS MATERIALIZED (
  SELECT {wcol}cnt,
         replace(s, chr(31) || lhs || {sep2} || rhs || chr(31),
                 chr(31) || lhs || rhs || chr(31)) AS s
  FROM {prev}, b{r}
)"""
        )
        if r < rounds:
            parts.append("")  # keep commas regular via join below
    return ",\n".join(p for p in parts if p)


def _bpe_oracle(rounds: int) -> str:
    finals = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, lhs, rhs, pair_cnt FROM b{r}"
        for r in range(1, rounds + 1)
    )
    return f"{_bpe_cte_chain(rounds)}\n{finals}"


@register(
    "bpe_train_merges",
    oracle=_bpe_oracle(_BPE_ROUNDS),
    doc="BPE tokenizer TRAINING (Sennrich et al. 2016, arXiv:1508.07909): "
    "learn the first 6 merge rules over the corpus — per round, count "
    "every adjacent symbol pair weighted by word frequency, merge the "
    "most frequent pair (ties: lexicographic lhs, rhs — fully pinned) "
    "in all words, repeat. Classic trainers run on exactly this "
    "aggregated word-frequency representation, so the engine does too: "
    "the state is one vocabulary-sized table (word count + symbol "
    "sequence), each round is one map-side-combinable pair aggregate + "
    "a global top-1 (TakeOrderedAndProject) + a broadcast 1-row merge "
    "applied as a narrow map — per round one shuffle, nothing scales "
    "with corpus size after the initial word count. The symbol "
    "sequence is encoded as unit-separator-wrapped tokens "
    "('\\x1fa\\x1f\\x1fb\\x1f...') so the merge is a plain string "
    "replace: both engines scan leftmost, non-overlapping, continuing "
    "after each replacement — exactly BPE's greedy left-to-right pass "
    "(verified on the 'aaa'/'aaaa' overlap cases). Each round's state "
    "is referenced twice (pair counts + merge apply), so the Spark "
    "side cuts lineage per round (localCheckpoint) and the oracle "
    "MATERIALIZEs every CTE — the two engines' instances of the same "
    "double-reference re-execution trap (round-4 rule / round-5 sf1 "
    "sweep finding). End-of-word marker '$' cannot collide: corpus "
    "words are lowercase alphanumerics.",
    tags=("text", "tokenizer", "iterative"),
    bench=True,
)
def bpe_train_merges(spark: SparkSession, sf_dir: str):
    merges, _ = _bpe_train(spark, sf_dir, _BPE_ROUNDS)
    out = merges[0]
    for mdf in merges[1:]:
        out = out.unionByName(mdf)
    return out


#: (applicationId, sf_dir, rounds) -> (merges, word-carrying state):
#: bpe_train_merges and bpe_encode_fertility learn the SAME merge table,
#: so the 6-round training loop runs once per session and both queries
#: reuse it (the t_copurchase_edges amortization pattern — round-5
#: verdict #2 applied to the tokenizer family). Safe to cache: every
#: round's state and merge row is eagerly localCheckpointed. Entries
#: for DEAD sessions are evicted on each lookup (any cached key whose
#: applicationId differs from the caller's) so a long-lived process
#: that cycles Spark sessions doesn't retain checkpointed DataFrames
#: for sessions that no longer exist.
_BPE_CACHE: dict = {}


def _bpe_train(
    spark: SparkSession, sf_dir: str, rounds: int, keep_word: bool = False
):
    """Run ``rounds`` BPE merge rounds over the corpus word-frequency
    table (cached per session+sf_dir+rounds). Returns ``(merges,
    state)``: one 1-row DataFrame per learned rule, and the final state
    — each word's symbol sequence after all merges, i.e. the trained
    tokenizer's encoding of the vocabulary (``word`` column projected
    away unless ``keep_word``; merges are independent of it)."""
    app_id = spark.sparkContext.applicationId
    for stale in [k for k in _BPE_CACHE if k[0] != app_id]:
        del _BPE_CACHE[stale]
    key = (app_id, sf_dir, rounds)
    hit = _BPE_CACHE.get(key)
    if hit is None:
        hit = _bpe_train_impl(spark, sf_dir, rounds)
        _BPE_CACHE[key] = hit
    merges, state = hit
    if not keep_word:
        state = state.drop("word")
    return merges, state


def _bpe_train_impl(spark: SparkSession, sf_dir: str, rounds: int):
    nrm = _NORM_SPARK(F.col("text"))
    sep2 = _SEP + _SEP
    keep = ["word"]
    w = (
        t_cpu(spark, sf_dir, "documents")
        .filter(F.length(nrm) > 0)
        .select(F.explode(F.split(nrm, " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    state = w.select(
        *keep,
        "cnt",
        F.concat(
            F.lit(_SEP),
            F.array_join(
                F.concat(F.split("word", ""), F.array(F.lit("$"))), sep2
            ),
            F.lit(_SEP),
        ).alias("s"),
    ).localCheckpoint(eager=True)

    merges = []
    for r in range(1, rounds + 1):
        toks = F.split(F.expr("substring(s, 2, length(s) - 2)"), sep2)
        tk = state.select("cnt", toks.alias("tk"))
        pairs = tk.select(
            "cnt",
            F.explode(
                F.when(
                    F.size("tk") < 2,
                    F.array().cast("array<struct<lhs:string,rhs:string>>"),
                ).otherwise(
                    F.transform(
                        F.sequence(F.lit(1), F.size("tk") - 1),
                        lambda i: F.struct(
                            F.element_at("tk", i).alias("lhs"),
                            F.element_at("tk", i + 1).alias("rhs"),
                        ),
                    )
                )
            ).alias("p"),
        ).select("cnt", "p.lhs", "p.rhs")
        best = (
            pairs.groupBy("lhs", "rhs")
            .agg(F.sum("cnt").cast("bigint").alias("pair_cnt"))
            .orderBy(F.desc("pair_cnt"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .localCheckpoint(eager=True)
        )
        merges.append(best.select(F.lit(r).alias("round"), "lhs", "rhs", "pair_cnt"))
        state = (
            state.crossJoin(F.broadcast(best.select("lhs", "rhs")))
            .select(
                *keep,
                "cnt",
                F.replace(
                    F.col("s"),
                    F.concat(
                        F.lit(_SEP), F.col("lhs"), F.lit(sep2),
                        F.col("rhs"), F.lit(_SEP),
                    ),
                    F.concat(
                        F.lit(_SEP), F.col("lhs"), F.col("rhs"), F.lit(_SEP)
                    ),
                ).alias("s"),
            )
            .localCheckpoint(eager=True)
        )
    return merges, state


@register(
    "bpe_encode_fertility",
    oracle=f"""
{_bpe_cte_chain(_BPE_ROUNDS, carry_word=True)},
enc AS MATERIALIZED (
  SELECT word,
         CAST(len(string_split(substr(s, 2, length(s) - 2),
                               chr(31) || chr(31))) AS BIGINT) AS n_tok
  FROM s{_BPE_ROUNDS}
),
dw AS (
  SELECT doc_id, lang, unnest(string_split({_NORM_SQL}, ' ')) AS word
  FROM documents WHERE length({_NORM_SQL}) > 0
)
SELECT dw.doc_id, dw.lang,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST((SUM(n_tok) * 1000000) // count(*) AS BIGINT) AS fertility_ppm
FROM dw JOIN enc USING (word)
GROUP BY 1, 2
""",
    doc="BPE ENCODING with the trained merges (the inference half of "
    "bpe_train_merges): after the 6 training rounds, the training "
    "state is exactly each vocabulary word's token sequence under the "
    "learned tokenizer — classic trainers exploit the same identity, "
    "so encoding costs zero extra merge passes. Per document: word "
    "count, BPE token count, and fertility (tokens per word, integer "
    "ppm) — THE tokenizer-quality metric data teams track per corpus "
    "slice (cf. tokenizer_fertility_by_lang, which proxies fertility "
    "from a fixed regex rather than a trained tokenizer). Scale shape: "
    "training state is vocabulary-bounded; the doc-side join "
    "broadcasts the word → token-count table (vocab is Zipf-bounded; "
    "at web scale the tail would hash-join by word — same plan minus "
    "the broadcast hint); one map-side-combinable per-doc aggregate. "
    "Determinism: all integer; fertility uses bigint `div`, operands "
    "non-negative so Spark truncation == DuckDB floor.",
    tags=("text", "tokenizer", "corpus"),
    bench=True,
)
def bpe_encode_fertility(spark: SparkSession, sf_dir: str):
    _, state = _bpe_train(spark, sf_dir, _BPE_ROUNDS, keep_word=True)
    sep2 = _SEP + _SEP
    toks = F.split(F.expr("substring(s, 2, length(s) - 2)"), sep2)
    vocab = state.select(
        "word", F.size(toks).cast("bigint").alias("n_tok")
    )
    nrm = _NORM_SPARK(F.col("text"))
    dw = (
        t_cpu(spark, sf_dir, "documents")
        .filter(F.length(nrm) > 0)
        .select("doc_id", "lang", F.explode(F.split(nrm, " ")).alias("word"))
    )
    return (
        dw.join(F.broadcast(vocab), "word")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
        .select(
            "doc_id", "lang", "n_words", "n_tokens",
            F.expr("(n_tokens * 1000000) div n_words").alias("fertility_ppm"),
        )
    )


@register(
    "quality_classifier_logodds",
    oracle=f"""
WITH docs AS (
  SELECT doc_id, source,
         source IN ('src0', 'src1', 'src2', 'src3') AS pos,
         string_split({_NORM_SQL}, ' ') AS ws
  FROM documents WHERE length({_NORM_SQL}) > 0
),
dw AS MATERIALIZED (
  SELECT doc_id, source, pos, word, CAST(count(*) AS BIGINT) AS k
  FROM (SELECT doc_id, source, pos, unnest(ws) AS word FROM docs)
  GROUP BY 1, 2, 3, 4
),
wc AS MATERIALIZED (
  SELECT word,
         CAST(SUM(CASE WHEN pos THEN k ELSE 0 END) AS BIGINT) AS cp,
         CAST(SUM(CASE WHEN pos THEN 0 ELSE k END) AS BIGINT) AS cn
  FROM dw GROUP BY 1
),
tot AS (SELECT CAST(SUM(cp) AS BIGINT) AS tp, CAST(SUM(cn) AS BIGINT) AS tn,
               CAST(count(*) AS BIGINT) AS v
        FROM wc),
wt AS (
  SELECT word, CAST((1000000::HUGEINT * (cp + 1) * (tn + v))
                    // ((cn + 1)::HUGEINT * (tp + v)) AS BIGINT) AS wt_ppm
  FROM wc, tot
),
scored AS (
  SELECT dw.doc_id, dw.source, dw.word, dw.k, wt.wt_ppm,
         row_number() OVER (PARTITION BY dw.doc_id
                            ORDER BY wt.wt_ppm DESC, dw.word ASC) AS rn
  FROM dw JOIN wt USING (word)
),
ds AS (
  SELECT doc_id, source,
         CAST(SUM(k) AS BIGINT) AS n_tokens,
         CAST(SUM(k * wt_ppm) AS BIGINT) AS score,
         max(CASE WHEN rn = 1 THEN word END) AS top_token
  FROM scored GROUP BY 1, 2
),
gl AS (SELECT CAST(count(*) AS BIGINT) AS nd,
              CAST(SUM(score) AS HUGEINT) AS ts
       FROM ds)
SELECT doc_id, source, n_tokens, score, top_token,
       score::HUGEINT * nd >= ts AS above_mean
FROM ds, gl
""",
    doc="Quality-classifier filtering, the GPT-3/PaLM recipe (Brown et "
    "al. 2020 §A appendix; popularized as the fastText linear "
    "classifier of Joulin et al. 2016, arXiv:1607.01759): train a "
    "bag-of-words classifier where the POSITIVE class is a trusted "
    "curated slice (here sources src0-src3, standing in for "
    "WebText/Wikipedia/books) and the negative class is the raw rest, "
    "then score every document and keep the high scorers. Linear "
    "text classifiers reduce to per-token weights; here the weight is "
    "the add-1-smoothed Naive-Bayes frequency ratio in exact integer "
    "ppm — floor(1e6*(cp+1)(Tn+V) / ((cn+1)(Tp+V))), the same "
    "log-free monotone surrogate dsir_importance_ppm uses (per-token "
    "monotone in the NB log-odds; no libm ln can drift a rank). "
    "Output per doc: token count, additive score (sum of occurrence-"
    "weighted token weights), the top discriminative token (the "
    "classifier's 'why' — interpretability column), and the keep "
    "decision above_mean, computed by exact cross-multiplication "
    "(score*N >= total) so no float mean exists anywhere. Scale "
    "shape: vocabulary table broadcasts (Zipf-bounded; hash-join by "
    "word past driver size); two map-side-combinable aggregates + one "
    "per-doc window over per-doc-distinct rows; weights stay in "
    "int64 while corpus tokens*1e6 fits 2^63 (~9e12 tokens), past "
    "which the decimal(38,0) form both engines already compute in "
    "stays exact.",
    tags=("corpus", "quality", "text", "ml"),
)
def quality_classifier_logodds(spark: SparkSession, sf_dir: str):
    nrm = _NORM_SPARK(F.col("text"))
    pos = F.col("source").isin("src0", "src1", "src2", "src3")
    docs = (
        t_cpu(spark, sf_dir, "documents")
        .filter(F.length(nrm) > 0)
        .select("doc_id", "source", pos.alias("pos"), F.split(nrm, " ").alias("ws"))
    )
    dw = (
        docs.select("doc_id", "source", "pos", F.explode("ws").alias("word"))
        .groupBy("doc_id", "source", "pos", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k"))
        # feeds the vocabulary counts AND the per-doc scoring join —
        # persist the reduced form (round-4 double-reference rule)
        .persist()
    )
    wc = dw.groupBy("word").agg(
        F.sum(F.when(F.col("pos"), F.col("k")).otherwise(0))
        .cast("bigint").alias("cp"),
        F.sum(F.when(F.col("pos"), 0).otherwise(F.col("k")))
        .cast("bigint").alias("cn"),
    )
    tot = wc.agg(
        F.sum("cp").cast("bigint").alias("tp"),
        F.sum("cn").cast("bigint").alias("tn"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    wt = wc.crossJoin(F.broadcast(tot)).select(
        "word",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * (cp + 1) * (tn + v))"
            " div (CAST(cn + 1 AS DECIMAL(38,0)) * (tp + v)) AS BIGINT)"
        ).alias("wt_ppm"),
    )
    scored = dw.join(F.broadcast(wt), "word").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(
                F.desc("wt_ppm"), F.asc("word")
            )
        ),
    )
    ds = scored.groupBy("doc_id", "source").agg(
        F.sum("k").cast("bigint").alias("n_tokens"),
        F.sum(F.col("k") * F.col("wt_ppm")).cast("bigint").alias("score"),
        F.max(F.when(F.col("rn") == 1, F.col("word"))).alias("top_token"),
    )
    gl = ds.agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.sum(F.col("score").cast("decimal(38,0)")).alias("ts"),
    )
    return ds.crossJoin(F.broadcast(gl)).select(
        "doc_id", "source", "n_tokens", "score", "top_token",
        F.expr("CAST(score AS DECIMAL(38,0)) * nd >= ts").alias("above_mean"),
    )


_KC_ROUNDS = 8
_SQD_SQL = (
    "list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> ({a}[i] - {c}[i]) * ({a}[i] - {c}[i])))"
)


def _kcenter_cte_chain(rounds: int) -> str:
    """The WITH-chain portion (v, c1..ck, s1..s{k-1}) of the k-center
    oracle, reusable by sample_coreset_coverage_eval."""
    return _kcenter_oracle_parts(rounds)[0]


def _kcenter_oracle(rounds: int) -> str:
    chain, finals = _kcenter_oracle_parts(rounds)
    return chain + "\n" + finals


def _kcenter_oracle_parts(rounds: int):
    parts = [
        """WITH v AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
c1 AS MATERIALIZED (
  SELECT vec_id AS cid, e AS ce FROM v ORDER BY vec_id ASC LIMIT 1
),
s1 AS MATERIALIZED (
  SELECT v.vec_id, v.e, """
        + _SQD_SQL.format(a="v.e", c="ce")
        + """ AS d
  FROM v, c1
)"""
    ]
    for r in range(2, rounds + 1):
        parts.append(
            f"""c{r} AS MATERIALIZED (
  SELECT vec_id AS cid, e AS ce, d FROM s{r - 1}
  ORDER BY d DESC, vec_id ASC LIMIT 1
)"""
        )
        if r < rounds:
            parts.append(
                f"""s{r} AS MATERIALIZED (
  SELECT s.vec_id, s.e, least(s.d, """
                + _SQD_SQL.format(a="s.e", c="c.ce")
                + f""") AS d
  FROM s{r - 1} s, c{r} c
)"""
            )
    finals = "\nUNION ALL\n".join(
        ["SELECT CAST(1 AS INT) AS round, cid AS center_id, CAST(0.0 AS DOUBLE) AS radius FROM c1"]
        + [
            f"SELECT CAST({r} AS INT) AS round, cid AS center_id, d AS radius FROM c{r}"
            for r in range(2, rounds + 1)
        ]
    )
    return ",\n".join(parts), finals


@register(
    "sample_kcenter_coreset",
    oracle=_kcenter_oracle(_KC_ROUNDS),
    doc="Greedy k-center CORESET selection over the embedding table "
    "(Gonzalez 1985 farthest-point traversal; Sener & Savarese 2018, "
    "arXiv:1708.00489, as the data-selection strategy): pick the "
    "point farthest (squared L2) from all chosen centers, repeat — "
    "the classic 2-approximation of the k-center cover, used in "
    "curation to pick a maximally-diverse training subset instead of "
    "a uniform sample (cf. semdedup_prune, which REMOVES the "
    "redundant points this op would never pick). Deterministic: seed "
    "= lowest vec_id, ties on distance broken by vec_id, so the "
    "8-center trace (center id + covering radius at selection, the "
    "k-center objective value per k) is unique. Scale shape per "
    "round: broadcast ONE center vector, one narrow map updates each "
    "point's min-distance in place (no shuffle at all), and the "
    "argmax is a TakeOrderedAndProject (per-partition top-1, driver "
    "merge) — O(k) passes over the corpus, the optimal exact shape; "
    "the state is re-referenced every round, so each round cuts "
    "lineage (localCheckpoint), and the oracle MATERIALIZEs every "
    "CTE (the engines' twin double-reference traps). Distances are "
    "identical left-fold IEEE sums; least() and max-compare are "
    "exact, so ranks never drift.",
    tags=("corpus", "sampling", "embedding", "iterative"),
    bench=True,
)
def sample_kcenter_coreset(spark: SparkSession, sf_dir: str):
    from ..operators.similarity import kcenter_trace

    return kcenter_trace(
        t_cpu(spark, sf_dir, "embeddings"), "vec_id", "embedding", k=_KC_ROUNDS
    )


_UNI_MAX_LEN = 12


def _unigram_oracle(max_len: int) -> str:
    """Unrolled per-position Viterbi DP: dp{i} holds, for every vocabulary
    word of length >= i, the lexicographic-best (piece_count, -score) over
    segmentations of the first i characters. Each dp{i} joins dp{i-j} for
    piece lengths j=1..4 — all MATERIALIZED (multiply-referenced CTEs)."""
    head = f"""WITH w AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split({_NORM_SQL}, ' ')) AS word
        FROM documents WHERE length({_NORM_SQL}) > 0)
  WHERE length(word) <= {max_len}
  GROUP BY 1
),
cand AS MATERIALIZED (
  SELECT word, cnt, CAST(i AS INT) AS e, CAST(j AS INT) AS l,
         substr(word, CAST(i - j + 1 AS INT), CAST(j AS INT)) AS piece
  FROM (SELECT word, cnt, unnest(range(1, length(word) + 1)) AS i FROM w),
       (SELECT unnest([1, 2, 3, 4]) AS j)
  WHERE j <= i
),
inv AS MATERIALIZED (
  SELECT piece, CAST(SUM(cnt) AS BIGINT) AS pc FROM cand GROUP BY 1
),
tot AS (SELECT CAST(SUM(pc) AS BIGINT) AS total FROM inv),
keep AS MATERIALIZED (
  SELECT piece, pc FROM inv, tot
  WHERE length(piece) = 1 OR pc * 1000 >= total
),
edges AS MATERIALIZED (
  SELECT cand.word, cand.e, cand.l, keep.pc
  FROM cand JOIN keep USING (piece)
),
dp0 AS MATERIALIZED (
  SELECT word, CAST(0 AS INT) AS np, CAST(0 AS BIGINT) AS nsc FROM w
)"""
    parts = [head]
    for i in range(1, max_len + 1):
        branches = "\n      UNION ALL\n".join(
            f"""      SELECT d.word, {{'np': d.np + 1, 'nsc': d.nsc - ed.pc}} AS s
      FROM dp{i - j} d JOIN edges ed
        ON ed.word = d.word AND ed.e = {i} AND ed.l = {j}"""
            for j in range(1, 5)
            if j <= i
        )
        parts.append(
            f"""dp{i} AS MATERIALIZED (
  SELECT word, struct_extract(m, 'np') AS np, struct_extract(m, 'nsc') AS nsc
  FROM (
    SELECT word, min(s) AS m FROM (
{branches}
    ) GROUP BY word
  )
)"""
        )
    finals = "\nUNION ALL\n".join(
        f"SELECT w.word, w.cnt, CAST(dp{i}.np AS BIGINT) AS n_pieces,"
        f" CAST(-dp{i}.nsc AS BIGINT) AS piece_score"
        f" FROM dp{i} JOIN w USING (word) WHERE length(w.word) = {i}"
        for i in range(1, max_len + 1)
    )
    return ",\n".join(parts) + "\n" + finals


@register(
    "tokenizer_unigram_viterbi",
    oracle=_unigram_oracle(_UNI_MAX_LEN),
    doc="Unigram-LM / WordPiece-style Viterbi SEGMENTATION (Kudo 2018, "
    "arXiv:1804.10959 'Subword Regularization'; SentencePiece's unigram "
    "trainer runs exactly this DP in its E-step): given a piece "
    "inventory scored by corpus frequency, segment every vocabulary "
    "word into the optimal piece sequence. Inventory: all substrings "
    "of length 1-4 weighted by word frequency, pruned to pieces "
    "carrying >= 0.1% of the total substring mass (single characters "
    "always kept, so every word stays segmentable — SentencePiece's "
    "required-character rule). Objective, made integer-exact instead "
    "of the usual sum of log-probs (libm ln is banned by the registry "
    "determinism contract): lexicographic (minimize piece count, then "
    "maximize total piece frequency) — the same shape WordPiece's "
    "longest-match-first greedy approximates, solved exactly by "
    "forward DP over (min_pieces, -sum_freq) pairs; dp values are "
    "unique even when argmax segmentations tie, so the output (word, "
    "count, n_pieces, piece_score) is fully pinned. Spark side: one "
    "fold — aggregate() over the position sequence threading an "
    "array<struct> DP table, edges pre-joined per word (<= 4L rows) "
    "and carried as an in-row array, so the whole DP is a narrow "
    "JVM-side map over the VOCABULARY (not the corpus): two "
    "map-side-combinable aggregates + one broadcast join feed it, and "
    "nothing downstream scales with corpus size. Oracle: the same DP "
    "unrolled as 12 chained MATERIALIZED CTEs (per-position min over "
    "length-1..4 back-references). Words longer than 12 chars are "
    "excluded by contract on BOTH sides (corpus max is 8; a real "
    "tokenizer bounds candidate word length the same way).",
    tags=("text", "tokenizer", "corpus"),
    bench=True,
)
def tokenizer_unigram_viterbi(spark: SparkSession, sf_dir: str):
    nrm = _NORM_SPARK(F.col("text"))
    w = (
        t_cpu(spark, sf_dir, "documents")
        .filter(F.length(nrm) > 0)
        .select(F.explode(F.split(nrm, " ")).alias("word"))
        .filter(F.length("word") <= _UNI_MAX_LEN)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    cand = (
        w.select(
            "word",
            "cnt",
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(1), F.length("word")),
                        lambda i: F.filter(
                            F.transform(
                                F.sequence(F.lit(1), F.lit(4)),
                                lambda j: F.when(
                                    j <= i,
                                    F.struct(
                                        i.cast("int").alias("e"),
                                        j.cast("int").alias("l"),
                                        F.substring(
                                            F.col("word"), (i - j + 1), j
                                        ).alias("piece"),
                                    ),
                                ),
                            ),
                            lambda x: x.isNotNull(),
                        ),
                    )
                )
            ).alias("c"),
        )
        .select("word", "cnt", "c.e", "c.l", "c.piece")
        # feeds the inventory aggregate AND the edge join-back
        # (round-4 double-reference rule)
        .persist()
    )
    inv = cand.groupBy("piece").agg(F.sum("cnt").cast("bigint").alias("pc"))
    tot = inv.agg(F.sum("pc").cast("bigint").alias("total"))
    keep = inv.crossJoin(F.broadcast(tot)).filter(
        (F.length("piece") == 1) | (F.col("pc") * 1000 >= F.col("total"))
    ).select("piece", "pc")
    edges = (
        cand.join(F.broadcast(keep), "piece")
        .groupBy("word", "cnt")
        .agg(
            F.collect_list(F.struct("e", "l", "pc")).alias("edges")
        )
    )

    def step(acc, i):
        def back(e):
            prev = F.element_at(acc, (i - e["l"] + 1).cast("int"))
            return F.struct(
                (prev["np"] + F.lit(1)).cast("int").alias("np"),
                (prev["nsc"] - e["pc"]).cast("bigint").alias("nsc"),
            )

        best = F.array_min(
            F.transform(
                F.filter(F.col("edges"), lambda e: e["e"] == i), back
            )
        )
        return F.concat(acc, F.array(best))

    dp = F.aggregate(
        F.sequence(F.lit(1), F.length("word")),
        F.array(
            F.struct(
                F.lit(0).cast("int").alias("np"),
                F.lit(0).cast("bigint").alias("nsc"),
            )
        ),
        step,
    )
    final = F.element_at(dp, F.length("word") + 1)
    return edges.select(
        "word",
        "cnt",
        final["np"].cast("bigint").alias("n_pieces"),
        (-final["nsc"]).cast("bigint").alias("piece_score"),
    )


_COVERAGE_THRESHOLDS = (1.0, 1.4, 1.8, 2.2)


@register(
    "sample_coreset_coverage_eval",
    oracle=f"""
{_kcenter_cte_chain(_KC_ROUNDS)},
cent AS ({" UNION ALL ".join(f"SELECT cid FROM c{r}" for r in range(1, _KC_ROUNDS + 1))}),
cvec AS (SELECT v.e AS ce FROM cent JOIN v ON v.vec_id = cent.cid),
dk AS (
  SELECT v.vec_id, min({_SQD_SQL.format(a="v.e", c="ce")}) AS d
  FROM v, cvec GROUP BY 1
),
r8 AS (SELECT vec_id FROM v ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {_KC_ROUNDS}),
rvec AS (SELECT v.e AS ce FROM r8 JOIN v ON v.vec_id = r8.vec_id),
dr AS (
  SELECT v.vec_id, min({_SQD_SQL.format(a="v.e", c="ce")}) AS d
  FROM v, rvec GROUP BY 1
),
thr AS (SELECT CAST(unnest([{", ".join(str(t) for t in _COVERAGE_THRESHOLDS)}]) AS DOUBLE) AS thr),
ck AS (
  SELECT 'kcenter' AS method, thr,
         CAST(SUM(CASE WHEN d <= thr THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
         CAST(count(*) AS BIGINT) AS n_total
  FROM dk, thr GROUP BY 1, 2
),
cr AS (
  SELECT 'hash8' AS method, thr,
         CAST(SUM(CASE WHEN d <= thr THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
         CAST(count(*) AS BIGINT) AS n_total
  FROM dr, thr GROUP BY 1, 2
)
SELECT method, thr, n_covered, n_total,
       CAST((n_covered * 1000000) // n_total AS BIGINT) AS covered_ppm
FROM (SELECT * FROM ck UNION ALL SELECT * FROM cr)
""",
    doc="Coverage evaluation of the k-center coreset — the audit that "
    "justifies paying for farthest-point selection over a cheap "
    "sample: for every corpus point, squared L2 distance to its "
    "nearest of the 8 k-center picks vs the 8 hash-picked baseline "
    "points (deterministic 'random': lowest md5(vec_id) — the "
    "registry's rand()-free sampling idiom), then coverage counts at "
    "fixed radius thresholds. k-center's guarantee is exactly a "
    "covering-radius bound, so its coverage curve must dominate at "
    "tight radii — materialized here as auditable integer counts and "
    "ppm (no float means anywhere; threshold comparisons are exact "
    "IEEE on identically-folded distances). The eval pattern of "
    "cms_heavy_hitters / dedup_lsh_recall_eval applied to the "
    "sampling family. Scale shape: both distance passes broadcast 8 "
    "vectors and stay narrow; the count is one map-side-combinable "
    "aggregate per method — the eval costs two corpus scans at any "
    "size.",
    tags=("corpus", "sampling", "eval", "embedding"),
)
def sample_coreset_coverage_eval(spark: SparkSession, sf_dir: str):
    from ..operators.similarity import kcenter_trace

    def sqd(a, c):
        return F.aggregate(
            F.zip_with(a, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    v = t_cpu(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    ).persist()
    trace = kcenter_trace(v, "vec_id", "e", k=_KC_ROUNDS).select(
        F.col("center_id").alias("cid")
    )
    r8 = (
        v.orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(_KC_ROUNDS)
        .select(F.col("vec_id").alias("cid"))
    )

    def min_dist(picks):
        cs = picks.join(v, picks.cid == v.vec_id).select(F.col("e").alias("ce"))
        carr = cs.agg(F.collect_list("ce").alias("cs"))
        return v.crossJoin(F.broadcast(carr)).select(
            "vec_id",
            F.array_min(
                F.transform(F.col("cs"), lambda c: sqd(F.col("e"), c))
            ).alias("d"),
        )

    thr = F.broadcast(
        t_cpu(spark, sf_dir, "embeddings")
        .sparkSession.range(1)
        .select(
            F.explode(
                F.array(*[F.lit(t) for t in _COVERAGE_THRESHOLDS])
            ).alias("thr")
        )
    )

    def coverage(dists, method):
        return (
            dists.crossJoin(thr)
            .groupBy("thr")
            .agg(
                F.sum(F.when(F.col("d") <= F.col("thr"), 1).otherwise(0))
                .cast("bigint").alias("n_covered"),
                F.count(F.lit(1)).cast("bigint").alias("n_total"),
            )
            .select(
                F.lit(method).alias("method"), "thr", "n_covered", "n_total",
                F.expr("CAST((n_covered * 1000000) div n_total AS BIGINT)")
                .alias("covered_ppm"),
            )
        )

    return coverage(min_dist(trace), "kcenter").unionByName(
        coverage(min_dist(r8), "hash8")
    )


from .registry import REGISTRY as _REGISTRY  # noqa: E402

#: The classifier chain reused by the calibration eval below — the
#: registered oracle text, nested as a subquery so the two stay in
#: lockstep by construction.
_QC_ORACLE = _REGISTRY["quality_classifier_logodds"].oracle


@register(
    "quality_brier_reliability",
    oracle=f"""
WITH cls AS MATERIALIZED (
  SELECT doc_id, source, score,
         CASE WHEN source IN ('src0', 'src1', 'src2', 'src3')
              THEN 1 ELSE 0 END AS y
  FROM ({_QC_ORACLE})
), nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM cls),
sg AS (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS c FROM cls GROUP BY 1
), sc AS (
  SELECT score,
         CAST(SUM(c) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM sg
), pp AS (
  SELECT cls.doc_id, cls.y,
         CAST(1000000 * sc.cum // nd.nd AS BIGINT) AS p_ppm
  FROM cls JOIN sc ON sc.score = cls.score CROSS JOIN nd
), binned AS (
  SELECT LEAST(p_ppm // 100000, 9) AS bin, y, p_ppm FROM pp
), agg AS (
  SELECT CAST(bin AS INT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(y) AS BIGINT) AS n_pos,
         CAST(SUM(p_ppm) AS BIGINT) AS sum_p_ppm,
         SUM((p_ppm - y * 1000000)::HUGEINT
             * (p_ppm - y * 1000000)) AS brier_e12
  FROM binned GROUP BY 1
), spine AS (
  SELECT CAST(unnest(generate_series(0, 9)) AS INT) AS bin
)
SELECT s.bin,
       CAST(COALESCE(a.n_docs, 0) AS BIGINT) AS n_docs,
       CAST(COALESCE(a.n_pos, 0) AS BIGINT) AS n_pos,
       CAST(a.sum_p_ppm AS DOUBLE) / a.n_docs / 1000000.0 AS mean_p,
       CAST(a.n_pos AS DOUBLE) / a.n_docs AS mean_y,
       CAST(CAST(a.brier_e12 AS VARCHAR) AS DOUBLE) / a.n_docs / 1e12
         AS brier
FROM spine s LEFT JOIN agg a ON a.bin = s.bin
""",
    doc="Calibration / reliability diagram for the corpus quality "
    "classifier (quality_classifier_logodds, composed verbatim — the "
    "oracle nests the registered SQL so the chains cannot drift): "
    "the classifier's additive score is rank-normalized to an exact "
    "integer probability surrogate p_ppm = 1e6 * cume_count(score) "
    "div n_docs (a value-domain groupBy + one distributed prefix-sum "
    "— no global cume_dist window over a score domain that grows "
    "with the corpus), bucketed into 10 reliability bins. Per bin: "
    "document count, positive count (label = the classifier's own "
    "trusted-source definition), mean predicted p, observed rate, "
    "and the Brier contribution sum((p_ppm - y*1e6)^2) in EXACT "
    "integer e12 units. A well-calibrated filter has mean_p ~ "
    "mean_y per bin; the Brier column is the decomposable "
    "mean-squared error a curation pipeline tracks release to "
    "release. Every float is a single division of exact integers.",
    tags=("corpus", "quality", "eval", "prefixsum"),
)
def quality_brier_reliability(spark: SparkSession, sf_dir: str):
    from ..operators.prefixsum import distributed_cumsum

    cls = (
        _REGISTRY["quality_classifier_logodds"]
        .spark_fn(spark, sf_dir)
        .select(
            "doc_id",
            "score",
            F.when(
                F.col("source").isin("src0", "src1", "src2", "src3"), 1
            )
            .otherwise(0)
            .cast("bigint")
            .alias("y"),
        )
        # feeds the score-domain histogram AND the per-doc join
        .persist()
    )
    nd = F.broadcast(cls.agg(F.count(F.lit(1)).cast("bigint").alias("nd")))
    sg = cls.groupBy("score").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    sc = distributed_cumsum(
        sg, order_col="score", value_col="c", tiebreak=[], out_col="cum"
    ).select("score", F.col("cum").cast("bigint").alias("cum"))
    pp = (
        cls.join(sc.hint("shuffle_hash"), "score")
        .crossJoin(nd)
        .select(
            "y",
            F.expr("CAST(1000000 * cum DIV nd AS BIGINT)").alias("p_ppm"),
        )
    )
    binned = pp.select(
        F.least(F.expr("p_ppm DIV 100000"), F.lit(9))
        .cast("int")
        .alias("bin"),
        "y",
        "p_ppm",
    )
    d19 = F.col("p_ppm") - F.col("y") * F.lit(1000000)
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("y").cast("bigint").alias("n_pos"),
        F.sum("p_ppm").cast("bigint").alias("sum_p_ppm"),
        F.sum(d19.cast("decimal(19,0)") * d19.cast("decimal(19,0)"))
        .cast("decimal(38,0)")
        .alias("brier_e12"),
    )
    spine = spark.range(10).select(F.col("id").cast("int").alias("bin"))
    return spine.join(F.broadcast(agg), "bin", "left").select(
        "bin",
        F.coalesce(F.col("n_docs"), F.lit(0)).cast("bigint").alias("n_docs"),
        F.coalesce(F.col("n_pos"), F.lit(0)).cast("bigint").alias("n_pos"),
        (
            F.col("sum_p_ppm").cast("double")
            / F.col("n_docs")
            / F.lit(1000000.0)
        ).alias("mean_p"),
        (F.col("n_pos").cast("double") / F.col("n_docs")).alias("mean_y"),
        (
            F.col("brier_e12").cast("string").cast("double")
            / F.col("n_docs")
            / F.lit(1e12)
        ).alias("brier"),
    )


@register(
    "quality_ece_eval",
    oracle=f"""
WITH bins AS (
  SELECT bin, n_docs, n_pos, mean_p, mean_y
  FROM ({_REGISTRY["quality_brier_reliability"].oracle})
  WHERE n_docs > 0
), tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM bins
), folded AS (
  SELECT tot.n,
         list_reduce(
           list(CAST(n_docs AS DOUBLE) / tot.n * ABS(mean_p - mean_y)
                ORDER BY bin),
           (a, b) -> a + b) AS ece,
         MAX(ABS(mean_p - mean_y)) AS mce
  FROM bins CROSS JOIN tot GROUP BY tot.n
)
SELECT n, ece, mce FROM folded
""",
    doc="Expected / Maximum Calibration Error of the corpus quality "
    "classifier (Naeini et al. 2015, the standard one-number "
    "calibration summaries): ECE = sum_b (n_b/N) * |mean_p - mean_y| "
    "over the 10 reliability bins, MCE the worst bin gap. Composes "
    "quality_brier_reliability verbatim (the oracle nests the "
    "registered SQL, so the three chains — classifier, bins, ECE — "
    "cannot drift). The one order-sensitive reduction, the 10-term "
    "weighted-gap sum, is an ORDERED FOLD over the bin list sorted "
    "by bin id (Spark F.aggregate over sort_array, DuckDB "
    "list_reduce over list(ORDER BY bin)) — the registry rule for "
    "doubles crossing an aggregation; each per-bin gap is a fixed "
    "IEEE tree over exact integers. Shape: everything above the "
    "10-row bin table is the gated classifier chain.",
    tags=("corpus", "quality", "eval", "agg"),
)
def quality_ece_eval(spark: SparkSession, sf_dir: str):
    bins = (
        _REGISTRY["quality_brier_reliability"]
        .spark_fn(spark, sf_dir)
        .filter(F.col("n_docs") > 0)
        .select("bin", "n_docs", "mean_p", "mean_y")
    )
    tot = F.broadcast(
        bins.agg(F.sum("n_docs").cast("bigint").alias("n"))
    )
    gap = F.abs(F.col("mean_p") - F.col("mean_y"))
    return (
        bins.crossJoin(tot)
        .select(
            "bin", "n",
            (F.col("n_docs").cast("double") / F.col("n") * gap).alias("w"),
            gap.alias("g"),
        )
        .groupBy("n")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("bin", "w"))),
                F.lit(0.0),
                lambda acc, x: acc + x["w"],
            ).alias("ece"),
            F.max("g").alias("mce"),
        )
        .select("n", "ece", "mce")
    )


#: Feature-hashing (Weinberger et al. 2009) bucket count: 16 bits of the
#: portable md5 hex prefix. 2^16 buckets is the common small-model budget
#: where collisions are material enough to audit.
_FH_BITS_HEX = 4
_FH_BUCKETS = 16 ** _FH_BITS_HEX


@register(
    "feature_hash_collision_audit",
    oracle=f"""
WITH words AS (
  SELECT unnest(string_split({_NORM_SQL}, ' ')) AS term
  FROM documents
), tf AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM words WHERE term <> '' GROUP BY 1
), bucketed AS (
  SELECT term, tf,
         ((instr('0123456789abcdef', substr(md5(term), 1, 1)) - 1) * 4096
          + (instr('0123456789abcdef', substr(md5(term), 2, 1)) - 1) * 256
          + (instr('0123456789abcdef', substr(md5(term), 3, 1)) - 1) * 16
          + (instr('0123456789abcdef', substr(md5(term), 4, 1)) - 1))
           AS bucket
  FROM tf
), loads AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS load,
         CAST(SUM(tf) AS BIGINT) AS mass
  FROM bucketed GROUP BY 1
)
SELECT CAST(SUM(load) AS BIGINT) AS n_terms,
       CAST(COUNT(*) AS BIGINT) AS buckets_used,
       CAST(SUM(CASE WHEN load >= 2 THEN load ELSE 0 END) AS BIGINT)
         AS colliding_terms,
       CAST(MAX(load) AS BIGINT) AS max_load,
       CAST(SUM(mass) AS BIGINT) AS total_tf,
       CAST(SUM(CASE WHEN load >= 2 THEN mass ELSE 0 END) AS BIGINT)
         AS collided_tf,
       CAST(SUM(CASE WHEN load >= 2 THEN load ELSE 0 END) AS DOUBLE)
         / SUM(load) AS term_collision_rate,
       CAST(SUM(CASE WHEN load >= 2 THEN mass ELSE 0 END) AS DOUBLE)
         / SUM(mass) AS tf_collision_rate
FROM loads
""",
    doc="Feature-hashing (hashing-trick, Weinberger et al. 2009) "
    "collision audit for the corpus vocabulary: every distinct "
    "whitespace token is hashed into 2^16 buckets via the first 4 hex "
    "chars of the portable md5 (functions/hashing.py — the one hash "
    "both engines compute identically; Spark conv(hex,16,10) == "
    "DuckDB's instr-digit polynomial), and the audit reports how much "
    "of the vocabulary and how much of the token MASS lands in shared "
    "buckets — the numbers that decide whether a hashed feature space "
    "is big enough for a bag-of-words quality model without storing a "
    "vocabulary (the 100 TB motivation for hashing features at all). "
    "All counts exact bigint; the two rates are single divisions of "
    "exact integers. Shape: explode to words, one map-side-combinable "
    "groupBy(term), one groupBy(bucket) (at most 2^16 rows cross the "
    "second shuffle), one final fold — no windows, no driver loops; "
    "the term-frequency table is the same first stage every "
    "vocabulary op shares.",
    tags=("corpus", "ml", "text", "agg"),
)
def feature_hash_collision_audit(spark: SparkSession, sf_dir: str):
    docs = t_cpu(spark, sf_dir, "documents").select(
        _NORM_SPARK(F.col("text")).alias("norm")
    )
    words = docs.select(
        F.explode(F.split(F.col("norm"), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = words.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    bucketed = tf.select(
        "tf",
        F.conv(F.substring(F.md5(F.col("term")), 1, _FH_BITS_HEX), 16, 10)
        .cast("bigint")
        .alias("bucket"),
    )
    loads = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("load"),
        F.sum("tf").cast("bigint").alias("mass"),
    )
    coll_load = F.when(F.col("load") >= 2, F.col("load")).otherwise(0)
    coll_mass = F.when(F.col("load") >= 2, F.col("mass")).otherwise(0)
    return loads.agg(
        F.sum("load").cast("bigint").alias("n_terms"),
        F.count(F.lit(1)).cast("bigint").alias("buckets_used"),
        F.sum(coll_load).cast("bigint").alias("colliding_terms"),
        F.max("load").cast("bigint").alias("max_load"),
        F.sum("mass").cast("bigint").alias("total_tf"),
        F.sum(coll_mass).cast("bigint").alias("collided_tf"),
        (F.sum(coll_load).cast("double") / F.sum("load")).alias(
            "term_collision_rate"
        ),
        (F.sum(coll_mass).cast("double") / F.sum("mass")).alias(
            "tf_collision_rate"
        ),
    )
