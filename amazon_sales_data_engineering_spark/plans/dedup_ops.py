"""Deduplication queries over the ``documents`` table — exact, MinHash+LSH,
SimHash, and n-gram Jaccard (BASELINE.json north_star). Implementations in
operators.dedup; oracles replicate the same math in DuckDB SQL (portable
md5-based sketches — see functions.hashing).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import (
    exact_dedup_groups,
    jaccard_pairs,
    minhash_dedup_pairs,
    shingles,
    simhash16,
)
from .registry import register
from .util import LSH_DYN_PAIR_CTES, parquet_num_rows, t, t_cpu

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

# k=3-word shingles; DuckDB list comprehension mirrors operators.dedup.shingles.
_SHINGLES = f"""
  SELECT doc_id,
         unnest(list_distinct(
           CASE WHEN len(ws) >= 3
                THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN range(1, len(ws) - 1)]
                ELSE [] END
         )) AS shingle
  FROM (SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents)
"""

_JACCARD_TAIL = """
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
"""


@register(
    "dedup_exact",
    oracle=f"""
SELECT md5({_NORM}) AS fingerprint,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS n_docs
FROM documents
GROUP BY 1
""",
    doc="Exact dedup: hash-groupBy on the normalized-text fingerprint; "
    "min-id canonical keeper. One map-side-combinable aggregate.",
    tags=("dedup",),
    bench=True,
)
def dedup_exact(spark: SparkSession, sf_dir: str):
    return exact_dedup_groups(t_cpu(spark, sf_dir, "documents"), "text", "doc_id")


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH sh_all AS ({_SHINGLES}),
hot AS (SELECT shingle FROM sh_all GROUP BY shingle HAVING COUNT(*) > 100),
sh AS (SELECT * FROM sh_all WHERE shingle NOT IN (SELECT shingle FROM hot)),
{_JACCARD_TAIL}
SELECT id_a, id_b,
       CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = id_a
JOIN sz sb ON sb.doc_id = id_b
WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.5
""",
    doc="Exact 3-word-shingle Jaccard near-dup pairs via inverted-index "
    "self-join (the quadratic-verify baseline for the sketches), with the "
    "df>100 stop-shingle cap that bounds the self-join at scale (a no-op "
    "on this corpus — max shingle df is 7 at sf0.01).",
    tags=("dedup",),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str):
    sh = shingles(t_cpu(spark, sf_dir, "documents"), "text", "doc_id", k=3)
    return jaccard_pairs(sh, "doc_id", threshold=0.5, max_shingle_freq=100)


@register(
    "dedup_minhash_lsh",
    oracle=f"""
WITH sh AS ({_SHINGLES}),
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
{_JACCARD_TAIL}
SELECT c.id_a, c.id_b,
       CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
FROM cand c
JOIN inter ON inter.id_a = c.id_a AND inter.id_b = c.id_b
JOIN sz sa ON sa.doc_id = c.id_a
JOIN sz sb ON sb.doc_id = c.id_b
WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.5
""",
    doc="MinHash (6 hashes = lexicographic-min seeded md5) + banded LSH "
    "(3 bands × 2 rows) candidate generation, exact-Jaccard verification "
    "at 0.5. The scale path: no all-pairs stage, shuffles only on "
    "(doc,band) keys.",
    tags=("dedup", "lsh"),
    bench=True,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str):
    return minhash_dedup_pairs(
        t_cpu(spark, sf_dir, "documents"), "text", "doc_id",
        k=3, num_hashes=6, bands=3, threshold=0.5,
    )


@register(
    "dedup_simhash",
    oracle=f"""
WITH norm AS (SELECT doc_id, {_NORM} AS nt FROM documents),
tok AS (SELECT doc_id, unnest(list_distinct(string_split(nt, ' '))) AS tok FROM norm),
h AS (SELECT doc_id, substring(md5(tok), 1, 4) AS h4 FROM tok),
bits AS (SELECT doc_id, h4, unnest(range(0, 16)) AS bit FROM h),
vals AS (
  SELECT doc_id, bit,
         CAST(instr('0123456789abcdef',
                    substring(h4, 4 - CAST(floor(bit / 4) AS INT), 1)) - 1 AS INT) AS val
  FROM bits
),
contrib AS (
  SELECT doc_id, bit,
         (CAST(floor(val / power(2, bit % 4)) AS INT) % 2) * 2 - 1 AS c
  FROM vals
),
sums AS (SELECT doc_id, bit, SUM(c) AS s FROM contrib GROUP BY 1, 2),
terms AS (
  SELECT doc_id,
         CASE WHEN s > 0 THEN CAST(power(2, bit) AS BIGINT) ELSE 0 END AS term
  FROM sums
)
SELECT doc_id, CAST(SUM(term) AS BIGINT) AS simhash FROM terms GROUP BY doc_id
""",
    doc="16-bit SimHash per document from per-token md5 bits — integer "
    "arithmetic only (engine-exact). Near-dup buckets = equal fingerprints.",
    tags=("dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str):
    return simhash16(t_cpu(spark, sf_dir, "documents"), "text", "doc_id")


@register(
    "dedup_connected_components",
    oracle=f"""
WITH RECURSIVE
{LSH_DYN_PAIR_CTES},
und AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach(a, b) AS (
  SELECT u, u FROM und
  UNION
  SELECT r.a, n.v FROM reach r JOIN und n ON r.b = n.u
)
SELECT a AS node, MIN(b) AS component FROM reach GROUP BY a
""",
    doc="Dedup clustering: connected components over the embedding near-dup "
    "pair graph (operators.graph — iterative min-label propagation, one "
    "shuffle per round, localCheckpoint lineage cuts). Oracle: DuckDB "
    "recursive-CTE transitive closure — a different algorithm entirely.",
    tags=("dedup", "graph", "iterative"),
    bench=True,
)
def dedup_connected_components(spark: SparkSession, sf_dir: str):
    from ..operators.graph import connected_components
    from ..operators.similarity import embedding_near_dup

    # target_bucket_rows auto-grows the LSH bits on bigger corpora
    # (in-bucket pair work is quadratic in bucket size — the round-4 sf1
    # probe measured 7.8x wall at 10x data under FIXED bits). n_rows from
    # parquet footer metadata: zero extra jobs (the round-4 verdict
    # measured the count() re-executing the upstream scan per call), and
    # the oracle replays the same integer sizing formula at any sf.
    pairs = embedding_near_dup(
        t_cpu(spark, sf_dir, "embeddings"), id_col="vec_id",
        vec_col="embedding", threshold=0.4, bits=4, target_bucket_rows=125,
        n_rows=parquet_num_rows(sf_dir, "embeddings"),
    ).select("id_a", "id_b")
    return connected_components(pairs, "id_a", "id_b")


@register(
    "dedup_resolve_keepers",
    oracle=f"""
WITH RECURSIVE
{LSH_DYN_PAIR_CTES},
und AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach(a, b) AS (
  SELECT u, u FROM und
  UNION
  SELECT r.a, n.v FROM reach r JOIN und n ON r.b = n.u
),
comp AS (SELECT a AS node, MIN(b) AS component FROM reach GROUP BY a)
SELECT e.vec_id,
       COALESCE(c.component, e.vec_id) AS keeper_id,
       (COALESCE(c.component, e.vec_id) = e.vec_id) AS is_keeper
FROM embeddings e LEFT JOIN comp c ON c.node = e.vec_id
""",
    doc="END-TO-END dedup resolution: near-dup pairs → connected "
    "components → canonical keeper (min id per cluster) → a keeper "
    "mapping for EVERY corpus row (singletons keep themselves via the "
    "left join + coalesce). This is the actual output a training "
    "pipeline consumes — filter is_keeper to materialize the deduped "
    "corpus, or join keeper_id to re-point references. One extra "
    "broadcast-ready join on top of the iterative component computation.",
    tags=("dedup", "graph", "composition"),
)
def dedup_resolve_keepers(spark: SparkSession, sf_dir: str):
    from ..operators.graph import connected_components
    from ..operators.similarity import embedding_near_dup

    emb = t_cpu(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup(
        emb, id_col="vec_id", vec_col="embedding", threshold=0.4, bits=4,
        target_bucket_rows=125,  # bits 4 at gate scales, grows beyond
        n_rows=parquet_num_rows(sf_dir, "embeddings"),  # footer — no job
    ).select("id_a", "id_b")
    comp = connected_components(pairs, "id_a", "id_b")
    keeper = F.coalesce(F.col("component"), F.col("vec_id"))
    return (
        emb.select("vec_id")
        .join(comp, emb.vec_id == comp.node, "left")
        .select(
            "vec_id",
            keeper.alias("keeper_id"),
            (keeper == F.col("vec_id")).alias("is_keeper"),
        )
    )


# 60-bit SimHash CTE (mirrors operators.dedup.simhash60: first 15 hex
# chars of per-token md5, bit b taken from hex char 15 - b//4).
_SIMHASH60_CTE = f"""
norm AS (SELECT doc_id, {_NORM} AS nt FROM documents),
tok AS (SELECT doc_id, unnest(list_distinct(string_split(nt, ' '))) AS tok FROM norm),
h AS (SELECT doc_id, substring(md5(tok), 1, 15) AS h15 FROM tok),
bits AS (SELECT doc_id, h15, unnest(range(0, 60)) AS bit FROM h),
vals AS (
  SELECT doc_id, bit,
         CAST(instr('0123456789abcdef',
                    substring(h15, 15 - CAST(floor(bit / 4) AS INT), 1)) - 1 AS INT) AS val
  FROM bits
),
contrib AS (
  SELECT doc_id, bit,
         (CAST(floor(val / power(2, bit % 4)) AS INT) % 2) * 2 - 1 AS c
  FROM vals
),
sums AS (SELECT doc_id, bit, SUM(c) AS s FROM contrib GROUP BY 1, 2),
terms AS (
  SELECT doc_id,
         CASE WHEN s > 0 THEN CAST(power(2, bit) AS BIGINT) ELSE 0 END AS term
  FROM sums
),
sig AS (SELECT doc_id, CAST(SUM(term) AS BIGINT) AS simhash FROM terms GROUP BY doc_id)
"""


@register(
    "dedup_simhash_hamming",
    oracle=f"""
WITH {_SIMHASH60_CTE},
bands AS (
  SELECT doc_id, simhash, b,
         (simhash >> (b * 15)) % 32768 AS band_val
  FROM sig, unnest([0, 1, 2, 3]) AS t(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS sig_a, b.simhash AS sig_b
  FROM bands a JOIN bands b
    ON a.b = b.b AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(sig_a, sig_b)) <= 3
""",
    doc="SimHash near-dup PAIRS at Hamming distance <= 3 via pigeonhole "
    "band blocking over a 60-BIT fingerprint (operators.dedup.simhash60 "
    "+ simhash_hamming_pairs): 4 x 15-bit bands -> 32768 buckets per "
    "band, so candidate fanout stays bounded as the corpus grows (the "
    "16-bit signature of dedup_simhash can only support equal-bucket "
    "grouping — its nibble bands would be a quadratic join in "
    "disguise). Distance 3 cannot touch all 4 bands, so the "
    "(band, value) equi-join has exact recall; bit_count(xor) verifies "
    "exactly. Band values via literal bit-shifts — integer end-to-end, "
    "no >2^53 doubles. The 64-bit production variant is the same shape "
    "with 4 x 16-bit bands.",
    tags=("dedup", "simhash", "lsh", "join"),
)
def dedup_simhash_hamming(spark: SparkSession, sf_dir: str):
    from ..operators.dedup import simhash60, simhash_hamming_pairs

    sig = simhash60(t_cpu(spark, sf_dir, "documents"), "text", "doc_id")
    return simhash_hamming_pairs(sig, id_col="doc_id", max_hamming=3)


@register(
    "dedup_prefix_jaccard",
    oracle=f"""
WITH sh AS ({_SHINGLES}),
{_JACCARD_TAIL}
SELECT id_a, id_b,
       CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = id_a
JOIN sz sb ON sb.doc_id = id_b
WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.5
""",
    doc="Set-similarity join with PPJoin-style prefix filtering (3-word "
    "shingles, Jaccard >= 0.5): candidates share at least one of each "
    "doc's rarest p = n - ceil(0.5n) + 1 shingles (exact recall by "
    "pigeonhole), then exact verification via operators.dedup."
    "jaccard_pairs. Third candidate strategy next to MinHash-LSH "
    "(probabilistic) and the capped inverted index (df-bounded): "
    "sub-quadratic AND exact. Shingle choice matters — prefix filtering "
    "needs a LARGE token universe so rarest-first prefixes have low df; "
    "on raw word tokens (small vocabulary, df in the hundreds) the "
    "prefix join degenerates toward all-pairs, measured 116s vs ~1s at "
    "sf0.1. The oracle is the UNFILTERED all-pairs inverted index — a "
    "genuinely different plan whose identical pair set also proves the "
    "prefix filter loses no pair (and it equals dedup_ngram_jaccard's "
    "answer, tying all three strategies together).",
    tags=("dedup", "similarity"),
    bench=True,
)
def dedup_prefix_jaccard(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    # Fused one-pass layout (the minhash_dedup_pairs trick applied to the
    # prefix strategy): ONE window pass ranks shingles by global df and a
    # single per-doc aggregate then yields BOTH the prefix array (rarest
    # p = n - ceil(0.5n) + 1 shingles) and the full shingle set, persisted
    # O(docs). Candidates come from exploding only the prefixes; the
    # exact-Jaccard verify is an in-row array_intersect of the stored
    # sets — the shingle stream is never re-shuffled for verification.
    #
    # Shingles are 64-bit-hashed IMMEDIATELY (round-4 sf1 probe: the
    # ~35-byte shingle strings were the payload of all four shuffles and
    # the per-doc sort — 10× data ran 10× wall; 8-byte keys restore
    # linearity). Correctness is unaffected: the prefix filter only
    # needs SOME consistent total order of the shingle universe shared
    # by every doc ((df, hash) is one), Jaccard is computed on the
    # hashed sets, and the final pairs are exact-verified — a 64-bit
    # collision (~1e-8 for this universe) is the only deviation from
    # the string computation, far below the gate's noise floor.
    sh = shingles(t_cpu(spark, sf_dir, "documents"), "text", "doc_id", k=3).select(
        "doc_id", F.xxhash64("shingle").alias("shingle")
    )
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "shingle")
    # ranked feeds both the per-doc summary and the prefix stream.
    ranked = (
        sh.join(freq, "shingle")
        .select("doc_id", "shingle", F.row_number().over(w).alias("pos"))
        .persist()
    )
    # r11 note: persisting docsets (it feeds three subtrees) was tried
    # and MEASURED 2.6x SLOWER same-sitting: unpersisted, Catalyst
    # prunes each branch — the prefix-length branch aggregates only the
    # count (never builds the arrays), and the two verify sides are the
    # only collect_set consumers; the materialized array cache lost to
    # those pruned aggregates. Deliberately left unpersisted.
    docsets = ranked.groupBy("doc_id").agg(
        F.collect_set("shingle").alias("sh_set"),
        F.count(F.lit(1)).alias("n"),
    )
    # prefix length p = n - ceil(n/2) + 1 = n div 2 + 1 (for t = 50%)
    prefix = ranked.join(
        docsets.select("doc_id", "n"), "doc_id"
    ).filter(F.col("pos") <= F.expr("n div 2 + 1"))
    a = prefix.select(
        F.col("doc_id").alias("id_a"), "shingle", F.col("n").alias("na")
    )
    b = prefix.select(
        F.col("doc_id").alias("id_b"), "shingle", F.col("n").alias("nb")
    )
    cand = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.lit(100) * F.least("na", "nb")
            >= F.lit(50) * F.greatest("na", "nb")
        )
        .select("id_a", "id_b")
        .distinct()
    )
    da = docsets.select(
        F.col("doc_id").alias("id_a"),
        F.col("sh_set").alias("set_a"),
        F.col("n").alias("na"),
    )
    db = docsets.select(
        F.col("doc_id").alias("id_b"),
        F.col("sh_set").alias("set_b"),
        F.col("n").alias("nb"),
    )
    inter = F.size(F.array_intersect("set_a", "set_b"))
    return (
        cand.join(da, "id_a")
        .join(db, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                inter.cast("double")
                / (F.col("na") + F.col("nb") - inter).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )


_WINDOWS8 = f"""
  SELECT doc_id,
         unnest(CASE WHEN len(ws) >= 8
                     THEN [array_to_string(ws[i:i+7], ' ')
                           FOR i IN range(1, len(ws) - 6)]
                     ELSE [] END) AS passage
  FROM (SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents)
"""


@register(
    "dedup_repeated_passages",
    oracle=f"""
WITH win AS ({_WINDOWS8})
SELECT md5(passage) AS passage_hash,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_occurrences,
       MIN(doc_id) AS first_doc
FROM win
GROUP BY 1
HAVING COUNT(DISTINCT doc_id) >= 2
""",
    doc="Cross-document repeated-passage mining (8-token windows, NOT "
    "deduplicated within a doc): the exact-substring dedup signal behind "
    "C4/Pile-style corpus cleaning. Pure aggregate on the passage hash — "
    "boilerplate passages yield one row with big counts, never a pair "
    "blow-up, so the shape survives any corpus skew.",
    tags=("dedup", "corpus"),
    bench=True,
)
def dedup_repeated_passages(spark: SparkSession, sf_dir: str):
    from ..operators.dedup import passage_windows, repeated_passages

    win = passage_windows(t_cpu(spark, sf_dir, "documents"), "text", "doc_id", k=8)
    return repeated_passages(win, "doc_id", min_docs=2)


@register(
    "dedup_passage_fraction",
    oracle=f"""
WITH win AS ({_WINDOWS8}),
hashed AS (SELECT doc_id, md5(passage) AS passage_hash FROM win),
dup AS (
  SELECT passage_hash FROM hashed
  GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
)
SELECT h.doc_id,
       COUNT(*) AS n_windows,
       COUNT(d.passage_hash) AS n_dup_windows,
       (COUNT(d.passage_hash) * 1000000) // COUNT(*) AS dup_ppm
FROM hashed h LEFT JOIN dup d ON d.passage_hash = h.passage_hash
GROUP BY 1
""",
    doc="Per-document duplicated-passage fraction (integer ppm) — the "
    "thresholdable filter signal ('drop docs more than 30% duplicated "
    "elsewhere'). Duplicated-passage set is an aggregate joined back by "
    "content hash; no pairwise stage anywhere.",
    tags=("dedup", "corpus", "quality"),
)
def dedup_passage_fraction(spark: SparkSession, sf_dir: str):
    from ..operators.dedup import passage_dup_fraction, passage_windows

    win = passage_windows(t_cpu(spark, sf_dir, "documents"), "text", "doc_id", k=8)
    return passage_dup_fraction(win, "doc_id", min_docs=2)


@register(
    "dedup_sorted_neighborhood",
    oracle="""
WITH ranked AS (
  SELECT p_brand, p_partkey, p_name,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_name, p_partkey) AS pos
  FROM part
)
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       a.p_name AS key_a, b.p_name AS key_b,
       CAST(b.pos - a.pos AS INT) AS pos_gap
FROM ranked a
JOIN ranked b ON b.p_brand = a.p_brand
             AND b.pos > a.pos AND b.pos <= a.pos + 3
WHERE levenshtein(a.p_name, b.p_name) <= 15
""",
    doc="Sorted-neighborhood ER candidates (operators.dedup."
    "sorted_neighborhood_pairs): within each brand block, names are "
    "sorted and every pair within 3 positions is a candidate — O(n·w) "
    "pairs per block with no similarity computation at the candidate "
    "stage (the fourth blocking strategy next to LSH, prefix filtering, "
    "and blocked all-pairs; it shines when near-duplicates sort "
    "adjacently, e.g. prefixed names and zero-padded codes). Candidates "
    "then pass a Levenshtein<=15 verify. One sort window + one "
    "position-band self-join.",
    tags=("dedup", "similarity", "fuzzy"),
)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str):
    from ..operators.dedup import sorted_neighborhood_pairs

    cand = sorted_neighborhood_pairs(
        t_cpu(spark, sf_dir, "part"),
        id_col="p_partkey",
        sort_key=F.col("p_name"),
        block_cols=["p_brand"],
        window=3,
    )
    return cand.filter(F.levenshtein("key_a", "key_b") <= 15)


@register(
    "dedup_incremental_minhash",
    oracle=f"""
WITH sh AS ({_SHINGLES}),
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
  SELECT DISTINCT n.doc_id AS id_new, o.doc_id AS id_other
  FROM buckets n
  JOIN buckets o ON o.band = n.band AND o.band_key = n.band_key
                AND o.doc_id <> n.doc_id
  WHERE n.doc_id % 10 = 0
    AND (o.doc_id % 10 <> 0 OR o.doc_id > n.doc_id)
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.id_new, c.id_other, COUNT(*) AS i
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_new
  JOIN sh b ON b.doc_id = c.id_other AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT i.id_new, i.id_other,
       CAST(i.i AS DOUBLE) / CAST(sa.n + sb.n - i.i AS DOUBLE) AS jaccard
FROM inter i
JOIN sz sa ON sa.doc_id = i.id_new
JOIN sz sb ON sb.doc_id = i.id_other
WHERE CAST(i.i AS DOUBLE) / CAST(sa.n + sb.n - i.i AS DOUBLE) >= 0.5
""",
    doc="Incremental corpus dedup — the daily-ingest shape: a new batch "
    "(doc_id % 10 = 0 stands in for today's delivery) is near-dup-"
    "checked against the WHOLE corpus without ever re-pairing the "
    "existing corpus with itself. MinHash band buckets are built for "
    "all docs (one aggregate — at steady state the old side's summaries "
    "are precomputed and persisted, see minhash_dedup_pairs), but the "
    "band self-join is RESTRICTED to pairs touching the new batch "
    "(new×old plus deduped new×new) — candidate volume scales with "
    "|Δ|·collision-rate, not |corpus|². Exact-Jaccard verify at 0.5, "
    "candidates-only (no cap needed).",
    tags=("dedup", "lsh", "incremental"),
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str):
    from ..operators.dedup import minhash_signatures

    sh = shingles(
        t_cpu(spark, sf_dir, "documents"), "text", "doc_id", k=3
    ).persist()
    sig = minhash_signatures(sh, "doc_id", num_hashes=6)
    # Band buckets exactly as minhash_lsh_pairs builds them — but the
    # candidate join's LEFT input is pre-filtered to the new batch, so
    # old×old pairs are never GENERATED (filtering minhash_lsh_pairs
    # output instead would still pay the full corpus self-join).
    bands = []
    for bi in range(3):
        cols = [F.col(f"h{bi * 2 + r}") for r in range(2)]
        bands.append(
            sig.select(
                "doc_id",
                F.lit(bi).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("band_key"),
            )
        )
    from functools import reduce as _reduce

    from pyspark.sql import DataFrame as _DF

    buckets = _reduce(_DF.unionByName, bands)
    new_b = buckets.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("id_new"), "band", "band_key"
    )
    other_b = buckets.select(
        F.col("doc_id").alias("id_other"), "band", "band_key"
    )
    oriented = (
        new_b.join(other_b, ["band", "band_key"])
        .filter(
            (F.col("id_other") != F.col("id_new"))
            & (
                (F.col("id_other") % 10 != 0)
                | (F.col("id_other") > F.col("id_new"))
            )
        )
        .select("id_new", "id_other")
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sh_a = sh.select(F.col("doc_id").alias("id_new"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("id_other"), "shingle")
    inter = (
        oriented.join(sh_a, "id_new")
        .join(sh_b, ["id_other", "shingle"])
        .groupBy("id_new", "id_other")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    na = sizes.select(F.col("doc_id").alias("id_new"), F.col("n").alias("na"))
    nb = sizes.select(
        F.col("doc_id").alias("id_other"), F.col("n").alias("nb")
    )
    return (
        inter.join(na, "id_new")
        .join(nb, "id_other")
        .select(
            "id_new",
            "id_other",
            (
                F.col("i").cast("double")
                / (F.col("na") + F.col("nb") - F.col("i")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )


#: From-scratch full-corpus LSH pair set — the shared oracle of the two
#: maintained-index gates (batch dedup_index_maintained_equiv here and
#: streaming_index_dedup in streaming_ops): equality proves a maintained
#: index over ANY disjoint batch partitioning of the corpus discovers
#: every pair exactly once.
LSH_FULL_PAIRS_ORACLE = f"""
WITH sh AS ({_SHINGLES}),
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
{_JACCARD_TAIL}
SELECT c.id_a, c.id_b,
       CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
FROM cand c
JOIN inter ON inter.id_a = c.id_a AND inter.id_b = c.id_b
JOIN sz sa ON sa.doc_id = c.id_a
JOIN sz sb ON sb.doc_id = c.id_b
WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.5
"""


@register(
    "dedup_index_maintained_equiv",
    oracle=LSH_FULL_PAIRS_ORACLE,
    doc="PERSISTED incremental dedup index (round-6 verdict #1): the "
    "corpus arrives as three batches (doc_id % 3) applied in sequence "
    "through operators.dedup_index.MinHashDedupIndex — per-doc MinHash "
    "summaries and LSH band rows are computed ONCE per document, "
    "appended to parquet table dirs, and each batch's pairs come from "
    "the delta's band rows joined against the MAINTAINED index (new x "
    "old + deduped new x new; old x old never generated; the corpus "
    "text is never re-shingled). The oracle is the FROM-SCRATCH "
    "full-corpus LSH pair set (dedup_minhash_lsh's formulation "
    "verbatim): equality proves the maintained index discovers every "
    "pair exactly once — in the batch where its later member arrives. "
    "Maintenance cost is append-only (delta-scaled, never a corpus "
    "rewrite); the fixed-delta 10x-corpus probe in "
    "tests/test_scale_probe.py gates the cost claim.",
    tags=("dedup", "lsh", "incremental", "index", "sink"),
)
def dedup_index_maintained_equiv(spark: SparkSession, sf_dir: str):
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from functools import reduce as _reduce

    from pyspark.sql import DataFrame as _DF

    from ..operators.dedup_index import MinHashDedupIndex

    tag = _hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = _os.path.join(_tempfile.gettempdir(), f"asde_dedup_idx_{tag}")
    _shutil.rmtree(root, ignore_errors=True)
    idx = MinHashDedupIndex(root)
    docs = t_cpu(spark, sf_dir, "documents")
    outs = [
        idx.apply_batch(
            spark, docs.filter(F.col("doc_id") % 3 == b), "text", "doc_id"
        )
        for b in range(3)
    ]
    return _reduce(_DF.unionByName, outs)


@register(
    "dedup_index_compacted_equiv",
    oracle=LSH_FULL_PAIRS_ORACLE
    + " AND (c.id_a % 4 = 3 OR c.id_b % 4 = 3)",
    doc="Index COMPACTION equivalence: three batches (doc_id % 4 in "
    "0..2) build the maintained index, compact_to merges them into one "
    "batch dir under a fresh root (copy-on-write, Delta OPTIMIZE "
    "semantics — band rows REDERIVED from the merged summaries so the "
    "two tables cannot drift), then the held-out fourth slice applies "
    "as a delta against the COMPACTED index. Oracle: the from-scratch "
    "full-corpus LSH pairs restricted to pairs touching the delta "
    "slice — exactly what an incremental batch must find, proving "
    "compaction loses/dups nothing. Compaction is the flip side of the "
    "append-only maintenance design: appends keep ingest delta-scaled, "
    "scheduled compaction bounds the read amplification that grows "
    "with batch count. File-count reduction and compacted==uncompacted "
    "delta equality are additionally pinned in "
    "tests/test_curation_ops.py.",
    tags=("dedup", "lsh", "incremental", "index", "layout"),
)
def dedup_index_compacted_equiv(spark: SparkSession, sf_dir: str):
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from ..operators.dedup_index import MinHashDedupIndex

    tag = _hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = _os.path.join(_tempfile.gettempdir(), f"asde_idx_precmp_{tag}")
    croot = _os.path.join(_tempfile.gettempdir(), f"asde_idx_cmp_{tag}")
    _shutil.rmtree(root, ignore_errors=True)
    _shutil.rmtree(croot, ignore_errors=True)
    idx = MinHashDedupIndex(root)
    docs = t_cpu(spark, sf_dir, "documents")
    for b in range(3):
        idx.apply_batch(
            spark, docs.filter(F.col("doc_id") % 4 == b), "text", "doc_id"
        )
    compacted = idx.compact_to(spark, croot)
    return compacted.apply_batch(
        spark, docs.filter(F.col("doc_id") % 4 == 3), "text", "doc_id"
    )


#: Oracle filter for the two tombstone-delete gates: the delta is the
#: doc_id % 4 == 3 slice and the deleted set is {doc_id % 5 == 0 among
#: the indexed % 4 < 3 slices}. Deleting docs can only REMOVE pairs
#: (band buckets are per-doc; survivors' jaccards are untouched), so the
#: expected answer is the from-scratch full-corpus pair set restricted
#: to pairs touching the delta with no deleted member.
_DELETE_EQUIV_FILTER = """
 AND (c.id_a % 4 = 3 OR c.id_b % 4 = 3)
 AND NOT (c.id_a % 5 = 0 AND c.id_a % 4 < 3)
 AND NOT (c.id_b % 5 = 0 AND c.id_b % 4 < 3)
"""


@register(
    "dedup_index_delete_equiv",
    oracle=LSH_FULL_PAIRS_ORACLE + _DELETE_EQUIV_FILTER,
    doc="TOMBSTONE DELETE on the maintained dedup index (round-7 verdict "
    "#1): three batches (doc_id % 4 in 0..2) build the index, delete() "
    "appends an O(|tombstones|) tombstone batch for the doc_id % 5 == 0 "
    "slice of the indexed corpus (the right-to-be-forgotten request the "
    "engine already audits for tables in delete_cascade_audit), then "
    "the held-out fourth slice applies as a delta. The delta's pairs "
    "must equal a FRESH index built over the surviving docs — i.e. the "
    "from-scratch full-corpus pair set restricted to delta-touching "
    "pairs with no deleted member — proving the broadcast anti-join "
    "removes every deleted doc's band rows AND summaries from candidate "
    "generation and verification without rebuilding anything. Delete "
    "cost scales with the tombstone set, never the corpus (probe: "
    "tools/index_delta_probe.py, gated in tests/test_scale_probe.py).",
    tags=("dedup", "lsh", "incremental", "index", "delete"),
)
def dedup_index_delete_equiv(spark: SparkSession, sf_dir: str):
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from ..operators.dedup_index import MinHashDedupIndex

    tag = _hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = _os.path.join(_tempfile.gettempdir(), f"asde_idx_del_{tag}")
    _shutil.rmtree(root, ignore_errors=True)
    idx = MinHashDedupIndex(root)
    docs = t_cpu(spark, sf_dir, "documents")
    for b in range(3):
        idx.apply_batch(
            spark, docs.filter(F.col("doc_id") % 4 == b), "text", "doc_id"
        )
    idx.delete(
        spark,
        docs.filter(
            (F.col("doc_id") % 4 < 3) & (F.col("doc_id") % 5 == 0)
        ).select("doc_id"),
    )
    return idx.apply_batch(
        spark, docs.filter(F.col("doc_id") % 4 == 3), "text", "doc_id"
    )


@register(
    "dedup_index_delete_compacted_equiv",
    oracle=LSH_FULL_PAIRS_ORACLE + _DELETE_EQUIV_FILTER,
    doc="COMPACTION APPLIES TOMBSTONES: same construction as "
    "dedup_index_delete_equiv, but the index is compacted AFTER the "
    "delete and BEFORE the delta — compact_to drops tombstoned rows "
    "physically and the new generation starts tombstone-free, so the "
    "delta against the compacted root must find exactly the same pairs "
    "the anti-join path finds (shared oracle). This is the physical "
    "right-to-be-forgotten reclaim: logical delete is an O(|tombstones|) "
    "append, physical removal rides the scheduled compaction — Delta/"
    "Iceberg DELETE + OPTIMIZE semantics. Together the two gates pin "
    "both halves of the lifecycle contract.",
    tags=("dedup", "lsh", "incremental", "index", "delete", "layout"),
)
def dedup_index_delete_compacted_equiv(spark: SparkSession, sf_dir: str):
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from ..operators.dedup_index import MinHashDedupIndex

    tag = _hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = _os.path.join(_tempfile.gettempdir(), f"asde_idx_delc_{tag}")
    croot = _os.path.join(_tempfile.gettempdir(), f"asde_idx_delcc_{tag}")
    _shutil.rmtree(root, ignore_errors=True)
    _shutil.rmtree(croot, ignore_errors=True)
    idx = MinHashDedupIndex(root)
    docs = t_cpu(spark, sf_dir, "documents")
    for b in range(3):
        idx.apply_batch(
            spark, docs.filter(F.col("doc_id") % 4 == b), "text", "doc_id"
        )
    idx.delete(
        spark,
        docs.filter(
            (F.col("doc_id") % 4 < 3) & (F.col("doc_id") % 5 == 0)
        ).select("doc_id"),
    )
    compacted = idx.compact_to(spark, croot)
    assert not compacted._tomb_dirs(), "compacted generation must start clean"
    return compacted.apply_batch(
        spark, docs.filter(F.col("doc_id") % 4 == 3), "text", "doc_id"
    )


@register(
    "dedup_index_bucketed_bands",
    oracle=f"""
WITH sh AS ({_SHINGLES}),
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
)
SELECT DISTINCT n.doc_id AS id_new, o.doc_id AS id_other
FROM buckets n
JOIN buckets o ON o.band = n.band AND o.band_key = n.band_key
WHERE n.doc_id % 10 = 0 AND o.doc_id % 10 <> 0
""",
    doc="BUCKETED layout for the maintained band index — the 100 TB "
    "co-location story made real: corpus band rows and delta band rows "
    "are both written as catalog tables bucketed by band_key "
    "(operators.skew.write_bucketed, 16 buckets, into a /tmp-rooted "
    "database so the driver's cwd stays clean), and the delta-vs-index "
    "candidate join then runs as a SortMergeJoin with NO Exchange on "
    "either side — the corpus-sized shuffle was paid once at write "
    "time, exactly what a daily-ingest index wants when every day's "
    "delta joins on the same key (plan pinned by "
    "tests/test_skew_bucketing.py::test_band_index_bucketed_join_has_no_exchange). "
    "Falls back to plain parquet dirs if the environment has no "
    "writable metastore — results identical, only the physical plan "
    "differs. Oracle: the banded new x old candidate set in plain SQL.",
    tags=("dedup", "index", "lsh", "layout", "bucketing"),
)
def dedup_index_bucketed_bands(spark: SparkSession, sf_dir: str):
    import hashlib as _hashlib

    from ..operators.dedup_index import MinHashDedupIndex

    tag = _hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    idx = MinHashDedupIndex("/nonexistent")  # band/summary math only
    docs = t_cpu(spark, sf_dir, "documents")
    corpus_b = idx._band_rows(
        idx._summaries(docs.filter(F.col("doc_id") % 10 != 0), "text", "doc_id")
    )
    delta_b = idx._band_rows(
        idx._summaries(docs.filter(F.col("doc_id") % 10 == 0), "text", "doc_id")
    )
    corpus_t, delta_t = _bucketed_band_tables(spark, tag, corpus_b, delta_b)
    return (
        delta_t.select(
            F.col("doc_id").alias("id_new"), "band", "band_key"
        )
        .join(
            corpus_t.select(
                F.col("doc_id").alias("id_other"), "band", "band_key"
            ),
            ["band", "band_key"],
        )
        .select("id_new", "id_other")
        .distinct()
    )


def _bucketed_band_tables(spark, tag, corpus_b, delta_b):
    """Write the two band-row tables bucketed by band_key into a
    /tmp-rooted database; fall back to plain parquet dirs when the
    session has no writable metastore (identical rows, unbucketed
    plan)."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from ..operators.skew import write_bucketed

    db = f"asde_bb_{tag}"
    loc = _os.path.join(_tempfile.gettempdir(), f"asde_bb_db_{tag}")
    try:
        # a PREVIOUS session's table dirs may survive under /tmp while
        # this session's metastore has never heard of them — managed-
        # table creation then dies with LOCATION_ALREADY_EXISTS; this
        # query is a fresh-build demo, so clear both sides first
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        _shutil.rmtree(loc, ignore_errors=True)
        spark.sql(f"CREATE DATABASE {db} LOCATION '{loc}'")
        # bucket on EXACTLY the join keys: v1 bucketed scans satisfy a
        # join's clustering only on a full key match (subset
        # co-partitioning is gated off by default)
        write_bucketed(
            corpus_b, f"{db}.corpus_bands", ["band", "band_key"], 16
        )
        write_bucketed(delta_b, f"{db}.delta_bands", ["band", "band_key"], 16)
        return spark.table(f"{db}.corpus_bands"), spark.table(f"{db}.delta_bands")
    except Exception:  # noqa: BLE001 — no writable metastore
        base = _os.path.join(_tempfile.gettempdir(), f"asde_bb_fallback_{tag}")
        _shutil.rmtree(base, ignore_errors=True)
        corpus_b.write.parquet(f"{base}/corpus")
        delta_b.write.parquet(f"{base}/delta")
        return (
            spark.read.parquet(f"{base}/corpus"),
            spark.read.parquet(f"{base}/delta"),
        )


@register(
    "dedup_cdc_segments",
    oracle=f"""
WITH norm AS (SELECT doc_id, {_NORM} AS nt FROM documents),
tok AS (SELECT doc_id, string_split(nt, ' ') AS ws FROM norm WHERE len(nt) > 0),
words AS (
  SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) - 1 AS pos
  FROM tok
),
segged AS (
  SELECT doc_id, pos, w,
         COALESCE(SUM(CASE WHEN substring(md5(w), 1, 1) IN ('0', '1')
                           THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS seg_idx
  FROM words
),
segs AS (
  SELECT doc_id, seg_idx,
         md5(string_agg(w, ' ' ORDER BY pos)) AS seg_hash,
         CAST(COUNT(*) AS BIGINT) AS n_words
  FROM segged GROUP BY 1, 2
)
SELECT seg_hash,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       MIN(n_words) AS n_words,
       MIN(doc_id) AS keep_doc
FROM segs
GROUP BY 1 HAVING COUNT(*) >= 2 AND MIN(n_words) >= 3
""",
    doc="Content-defined chunking dedup (operators.dedup.cdc_segments — "
    "the Rabin/gear-hash storage-dedup scheme at word granularity): "
    "chunk boundaries fall before words whose md5 starts with 0|1 "
    "(p=1/8, mean chunk ~8 words), so boundaries depend only on LOCAL "
    "content — an insertion re-chunks just its neighborhood, and "
    "identical passages across documents hash to identical chunks "
    "regardless of position (the property fixed-size chunking lacks; "
    "how LBFS/restic-lineage dedup stores). The query reports every "
    "chunk duplicated across the corpus (>= 2 copies, >= 3 words): "
    "copies, distinct docs, size, min-doc keeper — the storage-dedup "
    "ledger whose byte savings = sum((n_copies-1) * chunk bytes). "
    "Per-doc windows + one hash aggregate; never pairwise.",
    tags=("dedup", "cdc", "fingerprint"),
)
def dedup_cdc_segments(spark: SparkSession, sf_dir: str):
    from ..operators.dedup import cdc_segments

    segs = cdc_segments(
        t_cpu(spark, sf_dir, "documents"), "text", "doc_id"
    )
    return (
        segs.groupBy("seg_hash")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.min("n_words").alias("n_words"),
            F.min("doc_id").alias("keep_doc"),
        )
        .filter((F.col("n_copies") >= 2) & (F.col("n_words") >= 3))
    )


@register(
    "dedup_winnowing",
    oracle=f"""
WITH norm AS (SELECT doc_id, {_NORM} AS nt FROM documents),
tok AS (SELECT doc_id, string_split(nt, ' ') AS ws FROM norm WHERE len(nt) > 0),
hsl AS (
  SELECT doc_id,
         CASE WHEN len(ws) >= 4
              THEN [md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])
                    FOR i IN range(1, len(ws) - 2)]
              ELSE [] END AS hl
  FROM tok
),
sel AS (
  SELECT doc_id,
         list_distinct([
           list_aggregate(hl[s:least(s + 4, len(hl))], 'min')
           FOR s IN range(1, greatest(len(hl) - 4, 1) + 1)
         ]) AS fps
  FROM hsl WHERE len(hl) >= 1
),
fp AS (SELECT DISTINCT doc_id, f AS h FROM sel, unnest(fps) AS t(f)),
hot AS (SELECT h FROM fp GROUP BY h HAVING COUNT(*) > 100),
fpc AS (SELECT * FROM fp WHERE h NOT IN (SELECT h FROM hot))
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM fpc a JOIN fpc b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= 2
""",
    doc="Winnowing / MOSS local fingerprinting (Schleimer et al. 2003): "
    "4-word-gram hashes, window w=5, each window's minimum hash "
    "selected (rightmost on ties, operators.dedup.winnow_fingerprints "
    "— entirely in-row, no UDF), docs paired on sharing >= 2 distinct "
    "selected fingerprints via the winnowed inverted index with the "
    "same df>100 stop-hash cap as dedup_ngram_jaccard. The guarantee: "
    "any shared run of >= w+k-1 = 8 words contributes a common "
    "selected fingerprint, while the index joins on ~2/(w+1) of the "
    "gram hashes — the overlap-detector shape that shuffles a 3x-"
    "smaller index than the full shingle join at 100 TB. Fifth "
    "candidate-generation strategy beside LSH bands, prefix filter, "
    "sorted neighborhood and the capped inverted index. Oracle "
    "replays gram hashing + window minima with DuckDB list "
    "comprehensions; the rightmost-min POSITION rule (invisible to "
    "the hash-set gate) is pinned against a Python replica in "
    "tests/test_curation_ops.py.",
    tags=("dedup", "fingerprint", "similarity"),
)
def dedup_winnowing(spark: SparkSession, sf_dir: str):
    from ..operators.dedup import winnow_fingerprints

    fps = (
        winnow_fingerprints(
            t_cpu(spark, sf_dir, "documents"), "text", "doc_id", k=4, w=5
        )
        .select("doc_id", "h")
        .distinct()
    )
    hot = (
        fps.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > 100)
        .select("h")
    )
    cold = fps.join(F.broadcast(hot), "h", "left_anti")
    a = cold.select(F.col("doc_id").alias("id_a"), "h")
    b = cold.select(F.col("doc_id").alias("id_b"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


@register(
    "dedup_exact_salted_zipf",
    oracle=f"""
WITH z AS (
  SELECT doc_id,
         CASE WHEN doc_id % 100 < 50
              THEN 'viral boilerplate chain letter please forward'
              ELSE text END AS text
  FROM documents
),
f AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
  FROM z
),
s AS (
  SELECT fingerprint, MIN(doc_id) AS keep_id,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM f GROUP BY 1
)
SELECT f.doc_id, f.fingerprint, s.keep_id, s.n_docs,
       f.doc_id = s.keep_id AS is_keeper
FROM f JOIN s USING (fingerprint)
""",
    doc="Skew-hardened exact dedup on a DELIBERATELY Zipf-skewed corpus "
    "(round-6 verdict #8): half the documents are replaced by one viral "
    "boilerplate text, so a single fingerprint holds 50% of the corpus "
    "— the 10^8-copy chain-letter shape. operators.dedup."
    "salted_exact_dedup splits the hot key twice: a salted TWO-PHASE "
    "aggregate ((fingerprint, xxhash64(id)%16) partials, then a <=16-"
    "row-per-key merge — unconditional reducer bound where map-side "
    "partial aggregation can spill to pass-through on hot+high-"
    "cardinality mixes), and a salted JOIN-BACK of the 1-row cluster "
    "stats onto the per-doc rows (skew.salted_join: content-hashed "
    "salt on the fat side, 16x replication of the stats side). Result "
    "is row-identical to the unsalted plan — pinned by equivalence + "
    "plan-shape guards in tests/test_skew_bucketing.py and this "
    "oracle's plain-SQL formulation.",
    tags=("dedup", "skew", "salting"),
)
def dedup_exact_salted_zipf(spark: SparkSession, sf_dir: str):
    from ..operators.dedup import salted_exact_dedup

    z = t_cpu(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 100 < 50,
            F.lit("viral boilerplate chain letter please forward"),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return salted_exact_dedup(z, "text", "doc_id", salt=16)


@register(
    "dedup_rank_maxjoin_skew",
    oracle="""
WITH z AS (
  SELECT l_orderkey, l_linenumber, l_quantity,
         CASE WHEN l_orderkey % 2 = 0 THEN DATE '1995-06-17'
              ELSE CAST(l_shipdate AS DATE) END AS ship_dt
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, ship_dt,
       CAST(l_quantity AS BIGINT) AS qty
FROM (
  SELECT *, rank() OVER (PARTITION BY ship_dt
                         ORDER BY l_quantity DESC) AS rk
  FROM z
) WHERE rk = 1
""",
    doc="SKEW-PROOF W1 rank-dedup (round-10 verdict #1 — the last "
    "documented 100×-scale hazard): rank()==1 with ties over ORDER BY "
    "ts DESC is exactly 'rows whose ts equals the per-partition MAX', "
    "so operators.dedup.rank_dedup_maxjoin computes it as a map-side-"
    "combinable groupBy().agg(max) + BROADCAST equi-join back — "
    "identical tie semantics (null parity argued in the operator "
    "docstring, property-pinned vs the window form in "
    "tests/test_properties.py), ZERO fact-side shuffles, and a hot "
    "partition parallelizes across its input splits where AQE cannot "
    "split a fat window partition. The corpus is DELIBERATELY skewed "
    "the dedup_exact_salted_zipf way: half of lineitem (l_orderkey "
    "even) is collapsed onto one ship date, the shape that serializes "
    "the faithful window form onto a single task at 100×. The oracle "
    "is the WINDOW formulation verbatim — the two must land row-"
    "identical. Plan pinned window-free + broadcast in "
    "tests/test_skew_bucketing.py.",
    tags=("window", "dedup", "skew"),
    bench=True,
)
def dedup_rank_maxjoin_skew(spark: SparkSession, sf_dir: str):
    from ..operators.dedup import rank_dedup_maxjoin

    z = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.when(
            F.col("l_orderkey") % 2 == 0,
            F.lit("1995-06-17").cast("date"),
        )
        .otherwise(F.col("l_shipdate").cast("date"))
        .alias("ship_dt"),
    )
    out = rank_dedup_maxjoin(z, ["ship_dt"], "l_quantity", desc=True)
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "ship_dt",
        F.col("l_quantity").cast("bigint").alias("qty"),
    )


@register(
    "dedup_containment",
    oracle=f"""
WITH seeded_docs AS (
  -- Seeded containment probe: for a deterministic slice of long docs
  -- (doc_id % 17 = 0, >= 30 tokens) inject a 10-token-prefix excerpt
  -- under a shifted id, so the gate provably detects asymmetric
  -- containment instead of vacuously matching an empty result.
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, array_to_string(list_slice(ws, 1, 10), ' ')
  FROM (SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents)
  WHERE doc_id % 17 = 0 AND len(ws) >= 30
),
sh_all AS ({_SHINGLES.replace("FROM documents", "FROM seeded_docs")}),
hot AS (SELECT shingle FROM sh_all GROUP BY shingle HAVING COUNT(*) > 100),
sh AS (SELECT * FROM sh_all WHERE shingle NOT IN (SELECT shingle FROM hot)),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT inter.id_a AS contained_id, inter.id_b AS container_id,
       CAST(i AS DOUBLE) / sa.n AS containment
FROM inter
JOIN sz sa ON sa.doc_id = inter.id_a
WHERE CAST(i AS DOUBLE) / sa.n >= 0.8
  AND CAST(i AS DOUBLE) / CAST(sa.n + (SELECT n FROM sz WHERE doc_id = inter.id_b) - i AS DOUBLE) < 0.5
""",
    doc="Shingle CONTAINMENT detection (|A∩B| / |A| >= 0.8 while Jaccard "
    "< 0.5): finds documents mostly CONTAINED in a larger one — quotes, "
    "excerpts, wrapped boilerplate — which symmetric Jaccard dedup "
    "misses precisely because the container is much bigger. Directed "
    "pairs (contained, container); the Jaccard<0.5 guard excludes pairs "
    "the symmetric dedup already catches, so this op reports ONLY the "
    "asymmetric cases. Candidates via the ONE-SIDED prefix filter "
    "(contained side's rarest ceil(0.2n)+1 shingles vs the full index "
    "— exact recall at t=0.8 by pigeonhole, df-bounded join volume), "
    "then exact intersection verify. The corpus is seeded with "
    "10-token-prefix excerpts of a deterministic slice of long docs "
    "(shifted ids) so the gate demonstrably reports contained/container "
    "pairs — a 0-row result would hash-match any always-empty plan.",
    tags=("dedup", "containment"),
)
def dedup_containment(spark: SparkSession, sf_dir: str):
    from ..functions.text import normalized_text

    base = t_cpu(spark, sf_dir, "documents").select("doc_id", "text")
    ws = F.split(normalized_text("text"), " ")
    excerpts = (
        base.filter((F.col("doc_id") % 17 == 0) & (F.size(ws) >= 30))
        .select(
            (F.col("doc_id") + F.lit(2000000)).alias("doc_id"),
            F.array_join(F.slice(ws, 1, 10), " ").alias("text"),
        )
    )
    # 64-bit-hash the shingles immediately (same lever as
    # dedup_prefix_jaccard, round 4): every downstream exchange — the df
    # cap, the persisted stream, the inverted-index self-join — carries
    # 8-byte keys instead of ~35-byte strings; counts are unchanged
    # modulo a ~1e-8 collision, and no shingle is ever output.
    sh = shingles(base.unionByName(excerpts), "text", "doc_id", k=3).select(
        "doc_id", F.xxhash64("shingle").alias("shingle")
    )
    # Same df>100 stop-shingle cap as dedup_ngram_jaccard: bounds the
    # inverted-index self-join against viral shingles (a no-op on this
    # corpus), applied consistently to intersections AND sizes.
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") > 100)
        .select("shingle")
    )
    sh = sh.join(F.broadcast(hot), "shingle", "left_anti").persist()
    # One-sided prefix filter + in-row array verify (round-4 verdict
    # #5): candidates only need the contained side's rarest
    # ceil(0.2*n)+1 shingles probed against the full index — EXACT
    # recall at containment >= 0.8 (pigeonhole), so the oracle's full
    # inverted-index formulation is unchanged while the candidate join
    # drops from sum(df^2) to a df-bounded volume; the intersection is
    # computed in-row over per-doc df-sorted shingle arrays
    # (operators.dedup.containment_scores).
    from ..operators.dedup import containment_scores

    scored = containment_scores(sh, "doc_id", 80)
    cont = F.col("i").cast("double") / F.col("na")
    jac = F.col("i").cast("double") / (
        F.col("na") + F.col("nb") - F.col("i")
    ).cast("double")
    return (
        scored
        .filter((cont >= 0.8) & (jac < 0.5))
        .select("contained_id", "container_id", cont.alias("containment"))
    )


@register(
    "dedup_minhash_per_source",
    oracle=f"""
WITH sh AS ({_SHINGLES}),
src AS (SELECT doc_id, source FROM documents),
sig AS (
  SELECT doc_id,
         MIN(md5('0|' || shingle)) AS h0, MIN(md5('1|' || shingle)) AS h1,
         MIN(md5('2|' || shingle)) AS h2, MIN(md5('3|' || shingle)) AS h3,
         MIN(md5('4|' || shingle)) AS h4, MIN(md5('5|' || shingle)) AS h5
  FROM sh GROUP BY doc_id
),
buckets AS (
  SELECT s.doc_id, src.source, b.band, b.band_key
  FROM sig s JOIN src ON src.doc_id = s.doc_id,
  LATERAL (VALUES (0, md5(s.h0 || '|' || s.h1)),
                  (1, md5(s.h2 || '|' || s.h3)),
                  (2, md5(s.h4 || '|' || s.h5))) AS b(band, band_key)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.source
  FROM buckets a
  JOIN buckets b ON a.source = b.source AND a.band = b.band
                AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, c.source, COUNT(*) AS i
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2, 3
)
SELECT i.id_a, i.id_b, i.source,
       CAST(i.i AS DOUBLE) / CAST(sa.n + sb.n - i.i AS DOUBLE) AS jaccard
FROM inter i
JOIN sz sa ON sa.doc_id = i.id_a
JOIN sz sb ON sb.doc_id = i.id_b
WHERE CAST(i.i AS DOUBLE) / CAST(sa.n + sb.n - i.i AS DOUBLE) >= 0.5
""",
    doc="Domain-scoped near-dup detection: MinHash-LSH with a COMPOSITE "
    "blocking key (source, band, band_key) — candidates form only "
    "within a source, the 'dedup each domain before global dedup' "
    "staging every large corpus pipeline uses (within-domain dup rates "
    "dwarf cross-domain ones, and per-domain blocking shrinks every "
    "bucket). Demonstrates that the LSH blocking key COMPOSES with "
    "business partitions for free — same shuffle count as plain "
    "dedup_minhash_lsh, smaller buckets.",
    tags=("dedup", "lsh", "blocking"),
)
def dedup_minhash_per_source(spark: SparkSession, sf_dir: str):
    from functools import reduce as _reduce

    from pyspark.sql import DataFrame as _DF

    from ..operators.dedup import minhash_signatures

    d = t_cpu(spark, sf_dir, "documents")
    sh = shingles(d, "text", "doc_id", k=3).persist()
    sig = minhash_signatures(sh, "doc_id", num_hashes=6).join(
        d.select("doc_id", "source"), "doc_id"
    )
    bands = []
    for bi in range(3):
        cols = [F.col(f"h{bi * 2 + r}") for r in range(2)]
        bands.append(
            sig.select(
                "doc_id",
                "source",
                F.lit(bi).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("band_key"),
            )
        )
    buckets = _reduce(_DF.unionByName, bands)
    a = buckets.select(
        F.col("doc_id").alias("id_a"), "source", "band", "band_key"
    )
    b = buckets.select(
        F.col("doc_id").alias("id_b"), "source", "band", "band_key"
    )
    cand = (
        a.join(b, ["source", "band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "source")
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sh_a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        cand.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b", "source")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            "source",
            (
                F.col("i").cast("double")
                / (F.col("na") + F.col("nb") - F.col("i")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )


@register(
    "export_labeled_pairs",
    oracle=f"""
WITH sh_all AS ({_SHINGLES}),
hot AS (SELECT shingle FROM sh_all GROUP BY shingle HAVING COUNT(*) > 100),
sh AS (SELECT * FROM sh_all WHERE shingle NOT IN (SELECT shingle FROM hot)),
{_JACCARD_TAIL},
pos AS (
  SELECT id_a, id_b FROM inter
  JOIN sz sa ON sa.doc_id = id_a
  JOIN sz sb ON sb.doc_id = id_b
  WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.5
),
ids AS (SELECT doc_id FROM documents),
neg AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM ids a JOIN ids b ON b.doc_id = a.doc_id + 137
  WHERE NOT EXISTS (SELECT 1 FROM pos p
                    WHERE p.id_a = a.doc_id AND p.id_b = b.doc_id)
)
SELECT id_a, id_b, 1 AS label FROM pos
UNION ALL
SELECT id_a, id_b, 0 AS label FROM neg
""",
    doc="Similarity training-set export: near-dup pairs (capped exact "
    "Jaccard >= 0.5) become positives; deterministic stride-137 id "
    "pairs not in the positive set become negatives — the labeled-pair "
    "construction that distills the engine's dedup signal into "
    "contrastive training data (no rand(): reruns and retries emit the "
    "identical dataset). Negatives via one self-equi-join on a shifted "
    "key + an anti join against positives; complements "
    "contrastive_hard_negatives (embedding-space hard negatives) with "
    "lexical-space labels.",
    tags=("dedup", "corpus", "ml", "export"),
)
def export_labeled_pairs(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents")
    # NOTE (r11, measured and REJECTED): persisting the shingle
    # inventory here is 1.5-2x SLOWER (4.5-5.0s -> 7.7-10.0s A/B at
    # sf0.1) — jaccard_pairs' branches each prune to one column of the
    # explode chain (hot-filter: shingle; sizes: doc_id) and Catalyst
    # recomputes those narrow codegen pipelines faster than a full
    # two-column cache materializes; the dedup_prefix_jaccard /
    # keyphrase_rake lesson again.
    sh = shingles(d, "text", "doc_id", k=3)
    pos = jaccard_pairs(
        sh, "doc_id", threshold=0.5, max_shingle_freq=100
    ).select("id_a", "id_b")
    ids = d.select("doc_id")
    shifted = ids.select((F.col("doc_id") + 137).alias("doc_id"))
    neg = (
        ids.join(shifted, "doc_id", "left_semi")
        .select((F.col("doc_id") - 137).alias("id_a"), F.col("doc_id").alias("id_b"))
        .join(pos, ["id_a", "id_b"], "left_anti")
    )
    return pos.withColumn("label", F.lit(1)).unionByName(
        neg.withColumn("label", F.lit(0))
    )


@register(
    "dedup_lsh_recall_eval",
    oracle=f"""
WITH sh AS ({_SHINGLES}),
{_JACCARD_TAIL},
truth AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sz sa ON sa.doc_id = id_a
  JOIN sz sb ON sb.doc_id = id_b
  WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.5
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
hit AS (
  SELECT t.id_a FROM truth t JOIN cand c
    ON t.id_a = c.id_a AND t.id_b = c.id_b
),
m AS (
  SELECT (SELECT COUNT(*) FROM truth) AS n_truth,
         (SELECT COUNT(*) FROM cand) AS n_lsh_candidates,
         (SELECT COUNT(*) FROM hit) AS n_lsh_found
)
SELECT CAST(n_truth AS BIGINT) AS n_truth,
       CAST(n_lsh_candidates AS BIGINT) AS n_lsh_candidates,
       CAST(n_lsh_found AS BIGINT) AS n_lsh_found,
       CASE WHEN n_truth = 0 THEN NULL
            ELSE CAST(floor((n_lsh_found * 1000.0) / n_truth) AS BIGINT)
       END AS recall_milli,
       CASE WHEN n_lsh_candidates = 0 THEN NULL
            ELSE CAST(floor((n_lsh_found * 1000.0) / n_lsh_candidates) AS BIGINT)
       END AS cand_precision_milli
FROM m
""",
    doc="Sketch-quality evaluation: MinHash-LSH candidate recall and "
    "precision measured against EXACT ground truth from the prefix-"
    "filter strategy (exact recall by pigeonhole, sub-quadratic) — the "
    "in-engine answer to 'are 6 hashes x 3 bands enough for this "
    "corpus, and how much verify work do the candidates waste?'. "
    "Emits one row: |truth|, |LSH candidates|, |truth ∩ candidates|, "
    "recall and candidate-precision in exact integer permille. Every "
    "count is an integer and both pair generators are already gated "
    "queries (dedup_prefix_jaccard, dedup_minhash_lsh), so the eval "
    "composes two proven subplans and one semi-join; the oracle "
    "re-derives truth from the UNFILTERED inverted index — a "
    "different plan proving the same pair set. Shape at scale: the "
    "shingle inventory is computed once and feeds both strategies; "
    "no stage is all-pairs.",
    tags=("dedup", "lsh", "eval"),
)
def dedup_lsh_recall_eval(spark: SparkSession, sf_dir: str):
    from ..functions.hashing import seeded_md5
    from ..operators.dedup import minhash_lsh_pairs, prefix_filter_candidates

    d = t_cpu(spark, sf_dir, "documents")
    sh = shingles(d, "text", "doc_id", k=3).persist()
    exact_cand = prefix_filter_candidates(sh, "doc_id", threshold_pct=50)
    # truth and lsh_cand are each referenced TWICE (their own count +
    # the hit semi-join): uncached, both full candidate-generation
    # subtrees executed twice per run (r11 plan audit: 29 parquet
    # scans / 34 joins in one plan). Both are candidate-PAIR-sized
    # (banded/prefix-filtered, never all-pairs), so the caches are
    # bounded by construction.
    truth = jaccard_pairs(
        sh, "doc_id", threshold=0.5, candidates=exact_cand
    ).persist()

    aggs = [
        F.min(seeded_md5(s, F.col("shingle"))).alias(f"h{s}") for s in range(6)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    lsh_cand = minhash_lsh_pairs(sig, "doc_id", num_hashes=6, bands=3).persist()

    n_truth = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth"))
    n_cand = lsh_cand.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lsh_candidates")
    )
    n_hit = (
        truth.join(lsh_cand, ["id_a", "id_b"], "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_lsh_found"))
    )
    ratio = lambda num, den: F.when(  # noqa: E731
        F.col(den) == 0, F.lit(None).cast("bigint")
    ).otherwise(
        F.floor((F.col(num) * F.lit(1000.0)) / F.col(den)).cast("bigint")
    )
    return (
        n_truth.crossJoin(n_cand)
        .crossJoin(n_hit)
        .select(
            "n_truth",
            "n_lsh_candidates",
            "n_lsh_found",
            ratio("n_lsh_found", "n_truth").alias("recall_milli"),
            ratio("n_lsh_found", "n_lsh_candidates").alias("cand_precision_milli"),
        )
    )


# Embedding near-dup component CTE shared by the cluster-size report
# (same pairs/closure as dedup_connected_components' oracle, same
# scale-adaptive bit sizing).
_CC_COMP_CTE = f"""
WITH RECURSIVE
{LSH_DYN_PAIR_CTES},
und AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach(a, b) AS (
  SELECT u, u FROM und
  UNION
  SELECT r.a, n.v FROM reach r JOIN und n ON r.b = n.u
),
comp AS (SELECT a AS node, MIN(b) AS component FROM reach GROUP BY a)
"""


@register(
    "dedup_cluster_size_histogram",
    oracle=f"""
{_CC_COMP_CTE},
sizes AS (
  SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM comp GROUP BY 1
)
SELECT cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(COUNT(*) * cluster_size AS BIGINT) AS n_docs
FROM sizes GROUP BY 1
""",
    doc="Dedup impact report: the duplicate-cluster size distribution "
    "(how many 2-clusters, 3-clusters, ... the near-dup graph "
    "produced, and how many documents each size class holds) — the "
    "number a curation team actually reviews before committing a "
    "dedup pass, and the shape that exposes pathological "
    "over-clustering (one giant component = a threshold or blocking "
    "bug) that per-pair metrics hide. Two map-side-combinable "
    "aggregates on top of the gated iterative component computation; "
    "singleton documents are intentionally absent (they form no "
    "component) so the histogram is exactly the DUPLICATE clusters.",
    tags=("dedup", "graph", "eval", "agg"),
)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str):
    from ..operators.graph import connected_components
    from ..operators.similarity import embedding_near_dup

    pairs = embedding_near_dup(
        t_cpu(spark, sf_dir, "embeddings"), id_col="vec_id",
        vec_col="embedding", threshold=0.4, bits=4,
        target_bucket_rows=125,  # bits 4 at gate scales, grows beyond
        n_rows=parquet_num_rows(sf_dir, "embeddings"),  # footer — no job
    ).select("id_a", "id_b")
    comp = connected_components(pairs, "id_a", "id_b")
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        (F.count(F.lit(1)) * F.col("cluster_size")).cast("bigint").alias("n_docs"),
    )


@register(
    "dedup_suffix_spans",
    oracle=f"""
WITH wh AS MATERIALIZED (
  SELECT doc_id,
         CAST(unnest(CASE WHEN len(ws) >= 8 THEN range(1, len(ws) - 6)
                          ELSE [] END) AS BIGINT) AS pos,
         unnest(CASE WHEN len(ws) >= 8
                     THEN [md5(array_to_string(ws[i:i+7], ' '))
                           FOR i IN range(1, len(ws) - 6)]
                     ELSE [] END) AS h
  FROM (SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents)
),
dup AS (SELECT h FROM wh GROUP BY 1 HAVING count(*) >= 2),
hits AS (SELECT doc_id, pos FROM wh JOIN dup USING (h)),
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM hits
)
SELECT doc_id,
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + 7 AS BIGINT) AS span_end,
       CAST(max(pos) + 8 - min(pos) AS BIGINT) AS span_tokens,
       CAST(count(*) AS BIGINT) AS n_windows
FROM isl
GROUP BY doc_id, grp
""",
    doc="MAXIMAL duplicated-span extraction — the Spark-first shape of "
    "suffix-array exact-substring dedup (Lee et al. 2022, "
    "arXiv:2107.06499 'Deduplicating Training Data Makes Language "
    "Models Better'): any substring of >= k tokens that occurs twice "
    "anywhere in the corpus (INCLUDING within one document — the "
    "suffix-array semantics, vs dedup_repeated_passages' cross-doc-"
    "only count) is covered by duplicated k=8 windows; merging "
    "adjacent duplicated window START positions per document "
    "(pos - row_number islands trick) recovers each maximal span's "
    "[start, end] token range — the exact byte ranges ExactSubstr "
    "deletes. A true suffix array needs global suffix sort; the "
    "windowed form is the standard scalable surrogate: one hash "
    "aggregate for the duplicate set (never pairwise — a boilerplate "
    "window that occurs 1M times is ONE row with count 1M), one "
    "equi-join back, one per-doc window. All stages hash-partition "
    "on content or doc_id; nothing is corpus-quadratic, and span "
    "merging touches only duplicated positions (a small fraction of "
    "the corpus by construction).",
    tags=("dedup", "corpus", "window"),
    bench=True,
)
def dedup_suffix_spans(spark: SparkSession, sf_dir: str):
    from ..operators.dedup import suffix_dup_spans

    return suffix_dup_spans(
        t_cpu(spark, sf_dir, "documents"), "text", "doc_id", k=8
    )


@register(
    "dedup_suffix_apply",
    oracle=f"""
WITH wh AS MATERIALIZED (
  SELECT doc_id,
         CAST(unnest(CASE WHEN len(ws) >= 8 THEN range(1, len(ws) - 6)
                          ELSE [] END) AS BIGINT) AS pos,
         unnest(CASE WHEN len(ws) >= 8
                     THEN [md5(array_to_string(ws[i:i+7], ' '))
                           FOR i IN range(1, len(ws) - 6)]
                     ELSE [] END) AS h
  FROM (SELECT doc_id, string_split({_NORM}, ' ') AS ws
        FROM documents WHERE length({_NORM}) > 0)
),
agg AS MATERIALIZED (
  SELECT h, count(*) AS n,
         min(doc_id::HUGEINT * 4294967296 + pos) AS fk
  FROM wh GROUP BY 1
),
nonfirst AS (
  SELECT wh.doc_id, wh.pos
  FROM wh JOIN agg USING (h)
  WHERE agg.n >= 2
    AND wh.doc_id::HUGEINT * 4294967296 + wh.pos <> fk
),
removed AS (
  SELECT DISTINCT doc_id, pos + o AS tp
  FROM nonfirst, (SELECT unnest(range(0, 8)) AS o)
),
toks AS (
  SELECT doc_id,
         CAST(unnest(range(1, len(ws) + 1)) AS BIGINT) AS tp,
         unnest(ws) AS tok,
         CAST(len(ws) AS BIGINT) AS n_tokens
  FROM (SELECT doc_id, string_split({_NORM}, ' ') AS ws
        FROM documents WHERE length({_NORM}) > 0)
),
kept AS (
  SELECT t.doc_id, t.n_tokens, t.tp, t.tok
  FROM toks t LEFT JOIN removed r ON r.doc_id = t.doc_id AND r.tp = t.tp
  WHERE r.tp IS NULL
)
SELECT doc_id,
       CAST(min(n_tokens) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(min(n_tokens) - count(*) AS BIGINT) AS n_removed,
       md5(string_agg(tok, ' ' ORDER BY tp)) AS kept_hash
FROM kept GROUP BY doc_id
""",
    doc="APPLY side of exact-substring dedup (Lee et al. 2022, "
    "arXiv:2107.06499 — their ExactSubstr tool DELETES all but one "
    "occurrence of every duplicated span; dedup_suffix_spans only "
    "reports them): every corpus position covered by a duplicated "
    "k=8 window whose occurrence is NOT the canonical first one "
    "(first = lexicographic min (doc_id, pos) over the window's "
    "occurrences — fully pinned; the ORACLE packs the pair into one "
    "integer, min(doc_id*2^32 + pos), because DuckDB's struct-min "
    "aggregate took 83s and gigabytes at 2.3M groups where the packed "
    "min takes under a second — the Spark side keeps the struct min) is dropped, and each document is "
    "reassembled from its surviving tokens. Output per doc: original/"
    "kept/removed token counts and the md5 of the reassembled text — "
    "the content-addressable handle a downstream shard writer would "
    "dedup on. Docs left with zero tokens vanish entirely (they were "
    "pure duplicate) — correct corpus semantics on both engines. "
    "Scale shape: one content-hash aggregate carrying (count, argmin "
    "occurrence) — a struct-min, map-side combinable — one equi-join "
    "back, an 8-row bounded explode of only the non-canonical "
    "positions, one anti-join on (doc, position), one per-doc "
    "reassembly aggregate. Nothing pairwise anywhere: a span "
    "duplicated a million times is ONE aggregate row, and only its "
    "occurrences (the data to delete) ever travel.",
    tags=("dedup", "corpus", "composition"),
)
def dedup_suffix_apply(spark: SparkSession, sf_dir: str):
    from ..functions.text import normalized_text
    from ..operators.dedup import suffix_apply_dedup

    docs = t_cpu(spark, sf_dir, "documents").filter(
        F.length(normalized_text(F.col("text"))) > 0
    )
    return suffix_apply_dedup(docs, "text", "doc_id", k=8)


@register(
    "dedup_suffix_spans_chars",
    oracle=f"""
WITH wh AS MATERIALIZED (
  SELECT doc_id,
         CAST(unnest(CASE WHEN length(t) >= 24 THEN range(1, length(t) - 22)
                          ELSE [] END) AS BIGINT) AS pos,
         unnest(CASE WHEN length(t) >= 24
                     THEN [md5(substr(t, CAST(i AS INT), 24))
                           FOR i IN range(1, length(t) - 22)]
                     ELSE [] END) AS h
  FROM (SELECT doc_id, {_NORM} AS t FROM documents)
),
dup AS (SELECT h FROM wh GROUP BY 1 HAVING count(*) >= 2),
hits AS (SELECT doc_id, pos FROM wh JOIN dup USING (h)),
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM hits
)
SELECT doc_id,
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + 23 AS BIGINT) AS span_end,
       CAST(max(pos) + 24 - min(pos) AS BIGINT) AS span_chars,
       CAST(count(*) AS BIGINT) AS n_windows
FROM isl
GROUP BY doc_id, grp
""",
    doc="MAXIMAL duplicated-span extraction at CHARACTER granularity — "
    "the round-9 verdict #7 stricter ExactSubstr profile (Lee et al. "
    "2022, arXiv:2107.06499 match at byte level with a minimum span "
    "length; k=24 characters here — character positions are the "
    "cross-engine-deterministic byte surrogate: identical for ASCII, "
    "and Spark substring / DuckDB substr both count characters on any "
    "UTF-8 input). Unlike the k=8-TOKEN profile (dedup_suffix_spans), "
    "a duplicated run is detected wherever it starts — mid-token, "
    "across punctuation — and short exact quotes below 8 tokens still "
    "trip the gate. Same scalable shape, shared islands machinery "
    "(operators/dedup.py _merge_dup_islands): one content-hash "
    "aggregate (a million-fold-duplicated window is ONE row), one "
    "equi-join back, one per-doc window over only duplicated "
    "positions. Spans are [start, end] 1-based character ranges of "
    "the normalized text.",
    tags=("dedup", "corpus", "window"),
)
def dedup_suffix_spans_chars(spark: SparkSession, sf_dir: str):
    from ..operators.dedup import suffix_dup_spans_chars

    return suffix_dup_spans_chars(
        t_cpu(spark, sf_dir, "documents"), "text", "doc_id", k=24
    )


@register(
    "dedup_suffix_apply_chars",
    oracle=f"""
WITH wh AS MATERIALIZED (
  SELECT doc_id,
         CAST(unnest(CASE WHEN length(t) >= 24 THEN range(1, length(t) - 22)
                          ELSE [] END) AS BIGINT) AS pos,
         unnest(CASE WHEN length(t) >= 24
                     THEN [md5(substr(t, CAST(i AS INT), 24))
                           FOR i IN range(1, length(t) - 22)]
                     ELSE [] END) AS h
  FROM (SELECT doc_id, {_NORM} AS t FROM documents
        WHERE length({_NORM}) > 0)
),
agg AS MATERIALIZED (
  SELECT h, count(*) AS n,
         min(doc_id::HUGEINT * 4294967296 + pos) AS fk
  FROM wh GROUP BY 1
),
nonfirst AS (
  SELECT wh.doc_id, wh.pos
  FROM wh JOIN agg USING (h)
  WHERE agg.n >= 2
    AND wh.doc_id::HUGEINT * 4294967296 + wh.pos <> fk
),
removed AS (
  SELECT DISTINCT doc_id, pos + o AS tp
  FROM nonfirst, (SELECT unnest(range(0, 24)) AS o)
),
chars AS (
  SELECT doc_id,
         CAST(unnest(range(1, length(t) + 1)) AS BIGINT) AS tp,
         unnest(string_split(t, '')) AS c,
         CAST(length(t) AS BIGINT) AS n_chars
  FROM (SELECT doc_id, {_NORM} AS t FROM documents
        WHERE length({_NORM}) > 0)
),
kept AS (
  SELECT t.doc_id, t.n_chars, t.tp, t.c
  FROM chars t LEFT JOIN removed r ON r.doc_id = t.doc_id AND r.tp = t.tp
  WHERE r.tp IS NULL
)
SELECT doc_id,
       CAST(min(n_chars) AS BIGINT) AS n_chars,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(min(n_chars) - count(*) AS BIGINT) AS n_removed,
       md5(string_agg(c, '' ORDER BY tp)) AS kept_hash
FROM kept GROUP BY doc_id
""",
    doc="APPLY side of CHARACTER-granularity ExactSubstr (round-9 "
    "verdict #7): every character covered by a duplicated k=24-char "
    "window occurrence that is not the canonical first one "
    "(lexicographic min (doc_id, pos); the oracle packs the pair into "
    "min(doc_id*2^32 + pos) exactly like the token twin) is dropped, "
    "and each document is reassembled from its surviving characters — "
    "strictly more aggressive than the token profile because deletions "
    "start and end mid-token. Output per doc: original/kept/removed "
    "CHARACTER counts and the md5 of the reassembled text. Docs "
    "reduced to zero characters vanish (pure duplicates). Shares the "
    "delete/reassemble machinery with the token variant "
    "(operators/dedup.py _apply_dedup_from_units): one content-hash "
    "aggregate carrying (count, packed argmin), one equi-join back, a "
    "24-row bounded explode of only non-canonical positions, one "
    "anti-join on (doc, position), one per-doc reassembly aggregate — "
    "nothing pairwise, nothing corpus-quadratic.",
    tags=("dedup", "corpus", "composition"),
)
def dedup_suffix_apply_chars(spark: SparkSession, sf_dir: str):
    from ..functions.text import normalized_text
    from ..operators.dedup import suffix_apply_dedup_chars

    docs = t_cpu(spark, sf_dir, "documents").filter(
        F.length(normalized_text(F.col("text"))) > 0
    )
    return suffix_apply_dedup_chars(docs, "text", "doc_id", k=24)
