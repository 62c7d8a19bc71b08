"""Similarity-search queries over the ``embeddings`` table (array<float>,
64-dim). Brute-force cosine top-k is the exact baseline; sign-bucket LSH is
the approximate scale path. Implementations in operators.similarity.

Determinism: dot products are sequential left-folds in double precision on
both engines; outputs carry only (probe_id, neighbor_id, rank) so a
last-ulp disagreement can only matter on an exact score tie, which the
id-ascending tiebreak resolves identically.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    cosine_topk,
    embedding_near_dup,
    ivf_topk,
    lsh_bucket_topk,
)
from .registry import register
from .util import LSH_DYN_PAIR_CTES, parquet_num_rows, t_cpu

_V = """
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
"""

_COS = """
  list_sum(list_transform(range(1, len(pe) + 1), i -> pe[i] * e[i]))
  / (sqrt(list_sum(list_transform(pe, x -> x * x)))
     * sqrt(list_sum(list_transform(e, x -> x * x))))
"""


@register(
    "ann_cosine_topk",
    oracle=f"""
WITH v AS ({_V}),
p AS (SELECT vec_id AS probe_id, e AS pe FROM v WHERE vec_id % 100 = 0),
scored AS (
  SELECT probe_id, v.vec_id AS neighbor_id, {_COS} AS cos
  FROM p, v
  WHERE v.vec_id <> probe_id
)
SELECT probe_id, neighbor_id, CAST(rn AS INT) AS rank FROM (
  SELECT probe_id, neighbor_id,
         row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS rn
  FROM scored
) WHERE rn <= 5
""",
    doc="Brute-force cosine top-5 per probe (probe set: vec_id % 100 = 0): "
    "broadcast probes × streamed corpus, zip_with/aggregate JVM-side dot "
    "products, per-probe ranking. The exact ANN baseline — "
    "scale:baseline-only: probes×corpus work is quadratic BY DESIGN "
    "(sf1 probe 4.11x); it exists as the recall ground truth the "
    "LSH/IVF/PQ scale paths are judged against, not as a scale path.",
    tags=("similarity", "scale:baseline-only"),
    bench=True,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str):
    v = t_cpu(spark, sf_dir, "embeddings")
    probes = v.filter(F.col("vec_id") % 100 == 0)
    return cosine_topk(v, probes, id_col="vec_id", vec_col="embedding", k=5)


@register(
    "ann_lsh_buckets",
    oracle=f"""
WITH raw AS (
  SELECT vec_id, embedding,
         CAST((CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
            + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
            + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
            + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END)
            + (CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END)
            + (CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END)
            + (CASE WHEN embedding[7] >= 0 THEN 64 ELSE 0 END)
            + (CASE WHEN embedding[8] >= 0 THEN 128 ELSE 0 END) AS INT) AS bucket,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
p AS (SELECT vec_id AS probe_id, bucket, e AS pe FROM raw WHERE vec_id % 100 = 0),
scored AS (
  SELECT probe_id, raw.vec_id AS neighbor_id, {_COS} AS cos
  FROM p JOIN raw USING (bucket)
  WHERE raw.vec_id <> probe_id
)
SELECT probe_id, neighbor_id, CAST(rn AS INT) AS rank FROM (
  SELECT probe_id, neighbor_id,
         row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS rn
  FROM scored
) WHERE rn <= 3
""",
    doc="Sign-bucket LSH ANN (deterministic axis hyperplanes on the first 8 "
    "dims): candidates restricted to the probe's bucket (~corpus/256), then "
    "exact cosine top-3. The approximate scale path.",
    tags=("similarity", "lsh"),
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str):
    v = t_cpu(spark, sf_dir, "embeddings")
    probes = v.filter(F.col("vec_id") % 100 == 0)
    return lsh_bucket_topk(v, probes, id_col="vec_id", vec_col="embedding", k=3, bits=8)


@register(
    "dedup_embedding_cosine",
    oracle=f"""
WITH {LSH_DYN_PAIR_CTES}
SELECT id_a, id_b, cos_sim FROM pairs
""",
    doc="Embedding-cosine near-dup pairs at threshold 0.4: sign-bucket "
    "blocking replaces the quadratic all-pairs self-join; exact cosine "
    "verification within blocks. Bits auto-size with the corpus "
    "(4 at the gate scales, +1 per doubling past 125 rows/bucket) from "
    "parquet footer counts — zero extra jobs — and the oracle replays "
    "the same integer sizing formula, so the contract holds at any sf. "
    "Completes the dedup family (exact / Jaccard / MinHash-LSH / "
    "SimHash / embedding).",
    tags=("dedup", "similarity"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str):
    return embedding_near_dup(
        t_cpu(spark, sf_dir, "embeddings"), id_col="vec_id", vec_col="embedding",
        threshold=0.4, bits=4, target_bucket_rows=125,
        n_rows=parquet_num_rows(sf_dir, "embeddings"),
    )


#: From-scratch IVF top-k — shared verbatim by ann_ivf_topk and the
#: maintained-index gate ann_ivf_incremental_equiv: assignment is a pure
#: per-vector function of the fixed centroids, so an index built by ANY
#: batch partitioning must answer identically to the one-shot build.
IVF_TOPK_ORACLE = f"""
WITH v AS ({_V}),
nn AS (SELECT count(*) AS n FROM v),
par AS (
  SELECT CASE WHEN n <= 2000 THEN 50
         ELSE greatest(50, 1::BIGINT << (SELECT min(k) FROM range(0, 32) t(k)
                                         WHERE (1::BIGINT << (2 * k)) >= (SELECT n FROM nn)))
         END AS m
  FROM nn
),
cent AS (SELECT vec_id AS centroid_id, e AS ce FROM v
         WHERE vec_id % (SELECT m FROM par) = 0),
cscored AS (
  SELECT v.vec_id, v.e, centroid_id,
         row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY list_sum(list_transform(range(1, len(e) + 1), i -> e[i] * ce[i]))
                    / (sqrt(list_sum(list_transform(e, x -> x * x)))
                       * sqrt(list_sum(list_transform(ce, x -> x * x)))) DESC,
                    centroid_id ASC) AS crank
  FROM v CROSS JOIN cent
),
assigned AS (
  SELECT vec_id AS neighbor_id, e, centroid_id FROM cscored WHERE crank <= 1
),
probe_lists AS (
  SELECT vec_id AS probe_id, e AS pe, centroid_id
  FROM cscored WHERE vec_id % 100 = 0 AND crank <= 2
),
scored AS (
  SELECT p.probe_id, a.neighbor_id,
         list_sum(list_transform(range(1, len(pe) + 1), i -> pe[i] * a.e[i]))
         / (sqrt(list_sum(list_transform(pe, x -> x * x)))
            * sqrt(list_sum(list_transform(a.e, x -> x * x)))) AS cos
  FROM probe_lists p
  JOIN assigned a USING (centroid_id)
  WHERE a.neighbor_id <> p.probe_id
)
SELECT probe_id, neighbor_id, CAST(rn AS INT) AS rank FROM (
  SELECT probe_id, neighbor_id,
         row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS rn
  FROM scored
) WHERE rn <= 5
"""


@register(
    "ann_ivf_topk",
    oracle=IVF_TOPK_ORACLE,
    doc="IVF ANN: deterministic coarse centroids (vec_id % 50 = 0 at the "
    "gate scales), single-cluster assignment, probes search their "
    "nprobe=2 nearest lists, exact cosine top-5 within candidates. The "
    "partition-by-cluster scale path between brute force and sign-LSH. "
    "The centroid MODULUS auto-grows as ~sqrt(n) past the gate scales "
    "(round-4 sf1 probe: the fixed %50 rule makes the centroid count "
    "LINEAR in the corpus, so the n x k assignment pass goes quadratic "
    "— 7.4x wall at 10x data — and, worse, the centroid broadcast "
    "grows with the corpus, the actual 100 TB killer; sqrt keeps "
    "assignment n^1.5 and the broadcast driver-sized). The modulus "
    "comes from parquet footer counts (no count() job) via an exact "
    "integer formula the oracle replays, so the gate holds at any sf.",
    tags=("similarity", "ivf"),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str):
    v = t_cpu(spark, sf_dir, "embeddings")
    n = parquet_num_rows(sf_dir, "embeddings")
    # = 50 at sf0.01 (500 vecs) and sf0.1 (2000) — the oracle's exact
    # centroid set; smallest power of two >= sqrt(n) beyond (integer
    # form: 2^k with smallest k s.t. 4^k >= n — float-free so the SQL
    # replay can never drift by a libm ulp)
    if n <= 2000:
        m = 50
    else:
        k, cap = 0, 1
        while cap < n:
            cap <<= 2
            k += 1
        m = max(50, 1 << k)
    return ivf_topk(
        v,
        probes=v.filter(F.col("vec_id") % 100 == 0),
        centroids=v.filter(F.col("vec_id") % m == 0),
        id_col="vec_id", vec_col="embedding", k=5, nprobe=2,
    )


def _ivf_centroid_modulus(sf_dir: str) -> int:
    """Shared sqrt-growing centroid modulus (see ann_ivf_topk's docstring
    for the round-4 scale rationale): 50 at the gate scales, smallest
    power of two >= sqrt(n) beyond — integer form so the SQL replay can
    never drift by a libm ulp."""
    n = parquet_num_rows(sf_dir, "embeddings")
    if n <= 2000:
        return 50
    k, cap = 0, 1
    while cap < n:
        cap <<= 2
        k += 1
    return max(50, 1 << k)


@register(
    "ann_ivf_incremental_equiv",
    oracle=IVF_TOPK_ORACLE,
    doc="PERSISTED incremental IVF ANN index (operators/ann_index.IVFIndex "
    "— the similarity twin of the round-7 maintained dedup index): the "
    "coarse quantizer is fixed at creation, the corpus arrives as three "
    "batches (vec_id % 3) whose assignment runs as a |delta| x k "
    "broadcast pass and APPENDS inverted-list rows (a 100 TB corpus "
    "assigns each vector once, at ingest), and the query reads the "
    "persisted lists — probes pick nprobe=2 nearest centroids, exact "
    "cosine top-5 within those lists only. Oracle: ann_ivf_topk's "
    "from-scratch formulation VERBATIM — assignment is a pure "
    "per-vector function of the fixed centroids, so the maintained "
    "index must answer identically to the one-shot build over any "
    "batch partitioning.",
    tags=("similarity", "ivf", "incremental", "index"),
)
def ann_ivf_incremental_equiv(spark: SparkSession, sf_dir: str):
    import hashlib as _hashlib
    import os as _os
    import tempfile as _tempfile

    from ..operators.ann_index import IVFIndex

    v = t_cpu(spark, sf_dir, "embeddings")
    m = _ivf_centroid_modulus(sf_dir)
    tag = _hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = _os.path.join(_tempfile.gettempdir(), f"asde_ivf_idx_{tag}")
    idx = IVFIndex(root).create(
        v.filter(F.col("vec_id") % m == 0), "vec_id", "embedding"
    )
    for b in range(3):
        idx.apply_batch(
            spark, v.filter(F.col("vec_id") % 3 == b), "vec_id", "embedding"
        )
    return idx.topk(
        spark,
        v.filter(F.col("vec_id") % 100 == 0),
        "vec_id",
        "embedding",
        k=5,
        nprobe=2,
    )


@register(
    "ann_ivf_compacted_equiv",
    oracle=IVF_TOPK_ORACLE,
    doc="IVF index COMPACTION equivalence (round-7 verdict #3 — brings "
    "IVFIndex to dedup-index parity): three batches (vec_id % 3) build "
    "the maintained index, compact_to merges them into ONE generation "
    "under a fresh root written PARTITIONED BY centroid_id — each "
    "inverted list becomes its own directory, so a probe's nprobe lists "
    "prune at the scan (directory-level partition pruning through the "
    "broadcast probe-list join) instead of filtering after a full read "
    "— then top-k runs against the compacted root. Oracle: "
    "ann_ivf_topk's from-scratch formulation VERBATIM, proving "
    "compaction loses/dups/reassigns nothing. Copy-on-write: old-root "
    "readers are never disturbed, the caller swaps roots at commit.",
    tags=("similarity", "ivf", "incremental", "index", "layout"),
)
def ann_ivf_compacted_equiv(spark: SparkSession, sf_dir: str):
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from ..operators.ann_index import IVFIndex

    v = t_cpu(spark, sf_dir, "embeddings")
    m = _ivf_centroid_modulus(sf_dir)
    tag = _hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = _os.path.join(_tempfile.gettempdir(), f"asde_ivf_precmp_{tag}")
    croot = _os.path.join(_tempfile.gettempdir(), f"asde_ivf_cmp_{tag}")
    _shutil.rmtree(croot, ignore_errors=True)
    idx = IVFIndex(root).create(
        v.filter(F.col("vec_id") % m == 0), "vec_id", "embedding"
    )
    for b in range(3):
        idx.apply_batch(
            spark, v.filter(F.col("vec_id") % 3 == b), "vec_id", "embedding"
        )
    compacted = idx.compact_to(spark, croot)
    return compacted.topk(
        spark, v.filter(F.col("vec_id") % 100 == 0),
        "vec_id", "embedding", k=5, nprobe=2,
    )


@register(
    "ann_ivf_partitioned_append_equiv",
    oracle=IVF_TOPK_ORACLE,
    doc="PARTITIONED APPENDS on the maintained IVF index (round-9 "
    "verdict #7 — closes the read-amplification window between "
    "compactions): three batches (vec_id % 3) ingest with "
    "apply_batch(partitioned=True), each batch written hive-partitioned "
    "by centroid_id so a probe's nprobe lists prune at the SCAN of "
    "every batch dir without waiting for compact_to (dynamic partition "
    "pruning asserted in tests/test_skew_bucketing.py::"
    "test_partitioned_appends_prune_before_compaction). Oracle: "
    "ann_ivf_topk's from-scratch formulation VERBATIM — the layout is "
    "physical only, the answer is identical. Trade (recorded in the "
    "apply_batch docstring): one directory per touched list per batch, "
    "so flat appends + scheduled compaction remain the default for "
    "small frequent batches.",
    tags=("similarity", "ivf", "incremental", "index", "layout"),
)
def ann_ivf_partitioned_append_equiv(spark: SparkSession, sf_dir: str):
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from ..operators.ann_index import IVFIndex

    v = t_cpu(spark, sf_dir, "embeddings")
    m = _ivf_centroid_modulus(sf_dir)
    tag = _hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = _os.path.join(_tempfile.gettempdir(), f"asde_ivf_part_{tag}")
    _shutil.rmtree(root, ignore_errors=True)
    idx = IVFIndex(root).create(
        v.filter(F.col("vec_id") % m == 0), "vec_id", "embedding"
    )
    for b in range(3):
        idx.apply_batch(
            spark, v.filter(F.col("vec_id") % 3 == b), "vec_id",
            "embedding", partitioned=True,
        )
    return idx.topk(
        spark, v.filter(F.col("vec_id") % 100 == 0),
        "vec_id", "embedding", k=5, nprobe=2,
    )


@register(
    "ann_ivf_delete_equiv",
    oracle=IVF_TOPK_ORACLE,
    doc="TOMBSTONE DELETE on the maintained IVF index: the corpus plus a "
    "full set of CLONES (same vectors, ids offset by 10^6 — each clone "
    "is its original's exact nearest neighbor at cosine 1.0) are "
    "ingested, then every clone is tombstoned and top-k runs over the "
    "survivors. Oracle: ann_ivf_topk's clone-free from-scratch "
    "formulation VERBATIM — a sharp gate, because a broken anti-join "
    "would put a cosine-1.0 clone at rank 1 of every probe and shift "
    "every true neighbor down. Clone ids are offset by max(vec_id)+1 — "
    "DATA-DERIVED, because any fixed constant eventually collides with "
    "real ids (the sf1 probe corpus is built from +1e6 key-shifted "
    "copies, and a +1e6 clone offset silently deleted copy-1's real "
    "vectors). Delete cost is O(|tombstones|) — one tiny parquet "
    "append, no list file touched (probe: tools/index_delta_probe.py); "
    "physical reclaim rides compact_to (which shares this oracle via "
    "ann_ivf_compacted_equiv's path).",
    tags=("similarity", "ivf", "incremental", "index", "delete"),
)
def ann_ivf_delete_equiv(spark: SparkSession, sf_dir: str):
    import hashlib as _hashlib
    import os as _os
    import tempfile as _tempfile

    from ..operators.ann_index import IVFIndex

    v = t_cpu(spark, sf_dir, "embeddings")
    m = _ivf_centroid_modulus(sf_dir)
    tag = _hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = _os.path.join(_tempfile.gettempdir(), f"asde_ivf_del_{tag}")
    idx = IVFIndex(root).create(
        v.filter(F.col("vec_id") % m == 0), "vec_id", "embedding"
    )
    off = v.agg(F.max("vec_id")).first()[0] + 1  # clear of every real id
    clones = v.select(
        (F.col("vec_id") + F.lit(off)).alias("vec_id"), "embedding"
    )
    for b in range(2):
        idx.apply_batch(
            spark, v.filter(F.col("vec_id") % 2 == b), "vec_id", "embedding"
        )
    idx.apply_batch(spark, clones, "vec_id", "embedding")
    idx.delete(spark, clones.select("vec_id"))
    return idx.topk(
        spark, v.filter(F.col("vec_id") % 100 == 0),
        "vec_id", "embedding", k=5, nprobe=2,
    )


@register(
    "ann_ivf_requantized_equiv",
    oracle=IVF_TOPK_ORACLE,
    doc="RE-QUANTIZATION (round-7 verdict #4 — the drift-recovery op): "
    "the index is created under a deliberately DEGENERATE quantizer "
    "(the three lowest vec_ids — every list is a fat catch-all, the "
    "end state of unchecked corpus drift), three batches ingest, then "
    "requantize() rebuilds under the proper sqrt-sized quantizer in one "
    "corpus x k pass reading vectors FROM THE PERSISTED LISTS (the "
    "corpus is never re-read — vectors are index state). Top-k against "
    "the re-quantized root must equal ann_ivf_topk's from-scratch "
    "formulation VERBATIM: requantize == fresh build under the new "
    "centroids, no vector lost or duplicated through the degenerate "
    "generation. list_stats is the monitor that tells you WHEN to run "
    "this (ann_ivf_drift_monitor).",
    tags=("similarity", "ivf", "incremental", "index"),
)
def ann_ivf_requantized_equiv(spark: SparkSession, sf_dir: str):
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from ..operators.ann_index import IVFIndex

    v = t_cpu(spark, sf_dir, "embeddings")
    m = _ivf_centroid_modulus(sf_dir)
    tag = _hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = _os.path.join(_tempfile.gettempdir(), f"asde_ivf_preq_{tag}")
    rroot = _os.path.join(_tempfile.gettempdir(), f"asde_ivf_req_{tag}")
    _shutil.rmtree(rroot, ignore_errors=True)
    idx = IVFIndex(root).create(
        v.orderBy(F.asc("vec_id")).limit(3), "vec_id", "embedding"
    )
    for b in range(3):
        idx.apply_batch(
            spark, v.filter(F.col("vec_id") % 3 == b), "vec_id", "embedding"
        )
    req = idx.requantize(
        spark, v.filter(F.col("vec_id") % m == 0), rroot,
        "vec_id", "embedding",
    )
    return req.topk(
        spark, v.filter(F.col("vec_id") % 100 == 0),
        "vec_id", "embedding", k=5, nprobe=2,
    )


@register(
    "ann_ivf_drift_monitor",
    oracle=f"""
WITH v AS ({_V}),
nn AS (SELECT count(*) AS n FROM v),
par AS (
  SELECT CASE WHEN n <= 2000 THEN 50
         ELSE greatest(50, 1::BIGINT << (SELECT min(k) FROM range(0, 32) t(k)
                                         WHERE (1::BIGINT << (2 * k)) >= (SELECT n FROM nn)))
         END AS m
  FROM nn
),
corpus AS (
  SELECT vec_id, e FROM v
  UNION ALL
  SELECT vec_id + (SELECT max(vec_id) + 1 FROM v) AS vec_id,
         list_transform(e, x -> x + 2.0) AS e
  FROM v
),
cent AS (SELECT vec_id AS centroid_id, e AS ce FROM v
         WHERE vec_id % (SELECT m FROM par) = 0),
cscored AS (
  SELECT c.vec_id, centroid_id,
         row_number() OVER (
           PARTITION BY c.vec_id
           ORDER BY list_sum(list_transform(range(1, len(e) + 1), i -> e[i] * ce[i]))
                    / (sqrt(list_sum(list_transform(e, x -> x * x)))
                       * sqrt(list_sum(list_transform(ce, x -> x * x)))) DESC,
                    centroid_id ASC) AS crank
  FROM corpus c CROSS JOIN cent
)
SELECT centroid_id, CAST(count(*) AS BIGINT) AS list_size
FROM cscored WHERE crank <= 1
GROUP BY centroid_id
""",
    doc="RECALL-DRIFT MONITOR for the maintained IVF index (round-7 "
    "verdict #4): the quantizer is fixed over the ORIGINAL corpus "
    "distribution, then a deliberately drifted second batch arrives — "
    "every vector shifted by +2.0 per component (ids offset by the data-derived max(vec_id)+1), "
    "collapsing the batch toward the all-ones direction so its "
    "assignments pile onto the few centroids nearest that direction. "
    "list_stats returns per-centroid live-list sizes; the drifted "
    "half's mass concentrates (max/mean jumps — asserted in "
    "tests/test_curation_ops.py) while probe candidate sets bloat and "
    "true-neighborhood recall drops. This is the signal that schedules "
    "requantize() (ann_ivf_requantized_equiv proves the recovery). "
    "Oracle replays the full two-batch assignment in SQL — the monitor "
    "numbers themselves are exact, not heuristic.",
    tags=("similarity", "ivf", "incremental", "index", "eval"),
)
def ann_ivf_drift_monitor(spark: SparkSession, sf_dir: str):
    import hashlib as _hashlib
    import os as _os
    import tempfile as _tempfile

    from ..operators.ann_index import IVFIndex

    v = t_cpu(spark, sf_dir, "embeddings")
    m = _ivf_centroid_modulus(sf_dir)
    tag = _hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = _os.path.join(_tempfile.gettempdir(), f"asde_ivf_drift_{tag}")
    idx = IVFIndex(root).create(
        v.filter(F.col("vec_id") % m == 0), "vec_id", "embedding"
    )
    # both batches land as array<double> so the generations union cleanly
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    idx.apply_batch(
        spark, v.select("vec_id", as_double.alias("embedding")),
        "vec_id", "embedding",
    )
    # drifted ids offset by max(vec_id)+1 — data-derived, so they can
    # never collide with a real id at any sf (the +1e6 constant did, on
    # the key-shifted sf1 probe corpus)
    off = v.agg(F.max("vec_id")).first()[0] + 1
    drifted = v.select(
        (F.col("vec_id") + F.lit(off)).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x.cast("double") + F.lit(2.0)
        ).alias("embedding"),
    )
    idx.apply_batch(spark, drifted, "vec_id", "embedding")
    return idx.list_stats(spark)


@register(
    "embedding_normalize_quantize",
    oracle="""
WITH m AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), stats AS (
  SELECT vec_id, e,
         sqrt(list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b))
           AS l2_norm,
         list_reduce(list_transform(e, x -> abs(x)),
                     (a, b) -> CASE WHEN b > a THEN b ELSE a END) AS max_abs
  FROM m
)
SELECT vec_id, l2_norm,
       list_transform(e, x -> x / (CASE WHEN l2_norm = 0 THEN 1.0
                                        ELSE l2_norm END)) AS unit,
       list_transform(e, x -> CAST(floor(x * 127.0 /
           (CASE WHEN max_abs = 0 THEN 1.0 ELSE max_abs END)) AS INTEGER))
         AS q8
FROM stats
""",
    doc="Embedding L2-normalization + int8 quantization — the two "
    "pre-index transforms every vector store applies before ANN or "
    "training export. Entirely JVM-side higher-order functions "
    "(transform / aggregate): no shuffle, no Python — a narrow map pass "
    "over the vector column, which is the only acceptable shape for a "
    "100 TB embedding table. Determinism: both engines run the same "
    "left-to-right IEEE fold (Spark's aggregate starts at 0.0, DuckDB's "
    "list_reduce starts at the first element — identical because "
    "0.0 + x == x exactly); sqrt and each per-element divide are single "
    "correctly-rounded IEEE ops; quantization uses floor (exact, no "
    "round-half ambiguity across engines), mapping onto [-127, 127] "
    "with zero-vector guards on both norm and max_abs.",
    tags=("similarity", "embedding", "quantize"),
)
def embedding_normalize_quantize(spark: SparkSession, sf_dir: str):
    v = t_cpu(spark, sf_dir, "embeddings")
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    m = v.select("vec_id", e.alias("e"))
    l2 = F.sqrt(
        F.aggregate(
            F.col("e"), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    max_abs = F.aggregate(
        F.col("e"), F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    stats = m.select("vec_id", "e", l2.alias("l2_norm"), max_abs.alias("max_abs"))
    safe_norm = F.when(F.col("l2_norm") == 0, F.lit(1.0)).otherwise(
        F.col("l2_norm")
    )
    safe_max = F.when(F.col("max_abs") == 0, F.lit(1.0)).otherwise(
        F.col("max_abs")
    )
    return stats.select(
        "vec_id",
        "l2_norm",
        F.transform(F.col("e"), lambda x: x / safe_norm).alias("unit"),
        F.transform(
            F.col("e"),
            lambda x: F.floor(x * F.lit(127.0) / safe_max).cast("int"),
        ).alias("q8"),
    )


@register(
    "kmeans_two_rounds",
    oracle="""
WITH m AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), init AS (
  SELECT vec_id AS cid, e AS cvec FROM m WHERE vec_id < 8
), a1 AS (
  SELECT m.vec_id,
         CAST((min([list_reduce(list_transform(range(1, 65),
                      j -> (m.e[j] - i.cvec[j]) * (m.e[j] - i.cvec[j])),
                      (a, b) -> a + b),
                  CAST(i.cid AS DOUBLE)]))[2] AS BIGINT) AS c1
  FROM m, init i GROUP BY m.vec_id
), mu AS (
  SELECT a1.c1 AS cid, g.i AS dim,
         CAST(CAST(SUM(CAST(CAST(m.e[g.i] AS VARCHAR)
                            AS DECIMAL(38,20))) AS VARCHAR) AS DOUBLE)
           / COUNT(*) AS v
  FROM m JOIN a1 USING (vec_id), (SELECT unnest(range(1, 65)) AS i) g
  GROUP BY 1, 2
), cent2 AS (
  SELECT cid, array_agg(v ORDER BY dim) AS cvec FROM mu GROUP BY 1
), a2 AS (
  SELECT m.vec_id,
         CAST((min([list_reduce(list_transform(range(1, 65),
                      j -> (m.e[j] - c.cvec[j]) * (m.e[j] - c.cvec[j])),
                      (a, b) -> a + b),
                  CAST(c.cid AS DOUBLE)]))[2] AS BIGINT) AS c2
  FROM m, cent2 c GROUP BY m.vec_id
)
SELECT a1.vec_id, a1.c1, a2.c2
FROM a1 JOIN a2 ON a1.vec_id = a2.vec_id
""",
    doc="K-means, two unrolled Lloyd rounds (k=8, init = the first k "
    "vectors): assign → exact mean recompute → reassign, returning both "
    "rounds' assignments per vector. This is the canonical ITERATIVE "
    "algorithm shape on Spark: centroids are a k×d table BROADCAST to "
    "every executor, assignment is one narrow map pass (zip_with "
    "squared-diff + left-fold sum — all JVM higher-order functions), "
    "and the mean recompute is one (cid, dim)-keyed map-side-combinable "
    "aggregate — per round: one broadcast, one shuffle, nothing "
    "quadratic, no driver loop over rows. Determinism across engines: "
    "distances are identical left-to-right IEEE folds (0.0-seeded fold "
    "== first-element-seeded fold because 0.0 + x == x); argmin "
    "tie-breaks on centroid id via composite [dist, cid] ordering; "
    "means route the exact DECIMAL(38,20) sum through a string to "
    "double (see embedding_centroids) then ONE division — so round-2 "
    "centroids are bit-identical doubles in both engines and every "
    "comparison agrees.",
    tags=("similarity", "embedding", "iterative", "agg"),
    bench=True,
)
def kmeans_two_rounds(spark: SparkSession, sf_dir: str):
    v = t_cpu(spark, sf_dir, "embeddings")
    m = v.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e"),
    )
    init = m.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("cvec")
    )

    def assign(cent, out):
        dist = F.aggregate(
            F.zip_with(F.col("e"), F.col("cvec"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return (
            m.crossJoin(F.broadcast(cent))
            .select(
                "vec_id",
                F.col("cid"),
                F.array(dist, F.col("cid").cast("double")).alias("rank_key"),
            )
            .groupBy("vec_id")
            .agg(F.min_by("cid", "rank_key").alias(out))
        )

    # r11: a1 feeds BOTH the round-1 mean recompute and the final
    # a1 ⋈ a2 join — unpersisted, Catalyst re-executed the whole
    # broadcast-distance-argmin pass (a full corpus scan + k distance
    # evaluations per row) a second time. The (vec_id, c1) table is two
    # integers per vector; persist it (same reduced-intermediate rule
    # as dsir/ccnet).
    a1 = assign(init, "c1").persist()
    mu = (
        m.join(a1, "vec_id")
        .select(
            F.col("c1").alias("cid"),
            F.posexplode("e").alias("pos", "x"),
        )
        .select(
            "cid",
            (F.col("pos") + 1).alias("dim"),
            F.col("x").cast("string").cast("decimal(38,20)").alias("xd"),
        )
        .groupBy("cid", "dim")
        .agg(
            (
                F.sum("xd").cast("string").cast("double") / F.count(F.lit(1))
            ).alias("v")
        )
    )
    cent2 = mu.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "v"))),
            lambda s: s.getField("v"),
        ).alias("cvec")
    )
    a2 = assign(cent2, "c2")
    return a1.join(a2, "vec_id").select("vec_id", "c1", "c2")


@register(
    "contrastive_hard_negatives",
    oracle="""
WITH raw AS (
  SELECT vec_id, label,
         CAST((CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
            + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
            + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
            + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS INT) AS bucket,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), a AS (
  SELECT vec_id AS anchor_id, label AS anchor_label, bucket, e AS ae
  FROM raw WHERE vec_id % 20 = 0
), scored AS (
  SELECT a.anchor_id, a.anchor_label, raw.vec_id AS cand_id, raw.label AS cand_label,
         [-(list_sum(list_transform(range(1, len(ae) + 1), i -> ae[i] * e[i]))
            / (sqrt(list_sum(list_transform(ae, x -> x * x)))
               * sqrt(list_sum(list_transform(e, x -> x * x))))),
          CAST(raw.vec_id AS DOUBLE)] AS rank_key
  FROM a JOIN raw USING (bucket)
  WHERE raw.vec_id <> a.anchor_id
), pos AS (
  SELECT anchor_id, CAST((min(rank_key))[2] AS BIGINT) AS positive_id
  FROM scored WHERE cand_label = anchor_label GROUP BY 1
), neg AS (
  SELECT anchor_id, CAST((min(rank_key))[2] AS BIGINT) AS negative_id
  FROM scored WHERE cand_label <> anchor_label GROUP BY 1
)
SELECT pos.anchor_id, pos.positive_id, neg.negative_id
FROM pos JOIN neg USING (anchor_id)
""",
    doc="Contrastive-pair mining for embedding training: per anchor "
    "(vec_id % 20 = 0), the nearest same-label neighbor (positive) and "
    "the nearest DIFFERENT-label neighbor (hard negative) from the "
    "anchor's sign-LSH bucket — the standard batch-mining step that "
    "turns a labeled embedding table into triplets. Bucketed candidate "
    "generation (no all-pairs), broadcast anchors, one min_by aggregate "
    "per role; cosine is the shared left-fold, argmax via the "
    "[-cos, id] composite so ties break identically on both engines.",
    tags=("similarity", "embedding", "corpus"),
)
def contrastive_hard_negatives(spark: SparkSession, sf_dir: str):
    from ..operators.similarity import hard_negatives

    v = t_cpu(spark, sf_dir, "embeddings")
    return hard_negatives(
        v,
        anchors=v.filter(F.col("vec_id") % 20 == 0),
        id_col="vec_id",
        vec_col="embedding",
        label_col="label",
        bits=4,
    )


@register(
    "fuzzy_join_part_names",
    oracle="""
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
FROM part a
JOIN part b ON a.p_brand = b.p_brand AND a.p_size = b.p_size
           AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 12
""",
    doc="Entity-resolution fuzzy self-join on part names: blocking on "
    "(brand, size) bounds candidate pairs to sum(block_size^2), then a "
    "THRESHOLDED Levenshtein (early-exit above 12, linear-band DP) keeps "
    "near-identical names. The within-block recall contract is the "
    "standard ER trade; the oracle applies the identical blocking, so "
    "the gate proves the Spark thresholded-levenshtein(-1 sentinel) "
    "path equals the plain distance filter. scale:baseline-only: "
    "OUTPUT-bound at scale (sf1 probe 5.84x is 16.9M answer pairs, not "
    "wasted work) — use sorted-neighborhood or tighter blocking when "
    "the pair list itself must stay bounded.",
    tags=("similarity", "join", "fuzzy", "scale:baseline-only"),
)
def fuzzy_join_part_names(spark: SparkSession, sf_dir: str):
    from ..operators.similarity import blocked_fuzzy_self_join

    return blocked_fuzzy_self_join(
        t_cpu(spark, sf_dir, "part"),
        id_col="p_partkey",
        text_col="p_name",
        block_cols=["p_brand", "p_size"],
        max_dist=12,
    )


@register(
    "ann_quantized_topk",
    oracle=f"""
WITH v AS ({_V}),
q AS (
  SELECT vec_id,
         list_transform(e, x -> CAST(floor(x * 127.0 /
             (CASE WHEN m = 0 THEN 1.0 ELSE m END)) AS BIGINT)) AS q8
  FROM (
    SELECT vec_id, e,
           list_reduce(list_transform(e, x -> abs(x)),
                       (a, b) -> CASE WHEN b > a THEN b ELSE a END) AS m
    FROM v
  )
),
p AS (SELECT vec_id AS probe_id, q8 AS pq FROM q WHERE vec_id % 100 = 0),
scored AS (
  SELECT probe_id, q.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, len(pq) + 1),
                                      i -> pq[i] * q.q8[i])) AS BIGINT)
           AS idot
  FROM p, q WHERE q.vec_id <> probe_id
)
SELECT probe_id, neighbor_id, CAST(rn AS INT) AS rank, idot FROM (
  SELECT probe_id, neighbor_id, idot,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY idot DESC, neighbor_id ASC) AS rn
  FROM scored
) WHERE rn <= 5
""",
    doc="Int8-quantized brute-force top-5 (operators.similarity."
    "quantized_topk): max-abs floor quantization to [-127, 127], then "
    "INTEGER dot-product scoring — 4× less vector bandwidth and a "
    "ranking that is deterministic BY TYPE (integer scores can't "
    "diverge in the last ulp; ties resolve on id identically "
    "everywhere). The production two-stage-retrieval first stage next "
    "to the float baseline ann_cosine_topk.",
    tags=("similarity", "quantize"),
)
def ann_quantized_topk(spark: SparkSession, sf_dir: str):
    from ..operators.similarity import quantized_topk

    v = t_cpu(spark, sf_dir, "embeddings")
    probes = v.filter(F.col("vec_id") % 100 == 0)
    return quantized_topk(v, probes, k=5)


@register(
    "knn_label_accuracy",
    oracle=f"""
WITH v AS ({_V}),
lab AS (SELECT vec_id, label FROM embeddings),
p AS (SELECT vec_id AS probe_id, e AS pe FROM v WHERE vec_id % 100 = 0),
scored AS (
  SELECT probe_id, v.vec_id AS neighbor_id, {_COS} AS cos
  FROM p, v
  WHERE v.vec_id <> probe_id
),
topk AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT probe_id, neighbor_id,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY cos DESC, neighbor_id ASC) AS rn
    FROM scored
  ) WHERE rn <= 5
),
votes AS (
  SELECT t.probe_id, l.label, COUNT(*) AS c
  FROM topk t JOIN lab l ON l.vec_id = t.neighbor_id
  GROUP BY 1, 2
),
winner AS (
  SELECT probe_id, label AS pred_label FROM (
    SELECT probe_id, label,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY c DESC, label ASC) AS rn
    FROM votes
  ) WHERE rn = 1
)
SELECT pl.label AS true_label,
       COUNT(*) AS n_probes,
       COUNT(*) FILTER (WHERE w.pred_label = pl.label) AS n_correct,
       (COUNT(*) FILTER (WHERE w.pred_label = pl.label) * 1000000)
         // COUNT(*) AS acc_ppm
FROM winner w
JOIN lab pl ON pl.vec_id = w.probe_id
GROUP BY 1
""",
    doc="kNN classifier evaluation in-engine: every probe (vec_id % 100) "
    "is classified by majority vote of its 5 cosine neighbors' labels "
    "(deterministic tiebreak: count desc, label asc) and scored against "
    "its own label — leave-one-out accuracy per class, integer ppm. "
    "Composes the exact ANN path with two small aggregates; the "
    "embedding-quality gate ('do nearest neighbors share labels?') a "
    "retrieval pipeline should run before indexing 100 TB of vectors.",
    tags=("similarity", "ml", "eval"),
)
def knn_label_accuracy(spark: SparkSession, sf_dir: str):
    v = t_cpu(spark, sf_dir, "embeddings")
    probes = v.filter(F.col("vec_id") % 100 == 0)
    topk = cosine_topk(v, probes, id_col="vec_id", vec_col="embedding", k=5)
    lab = v.select("vec_id", "label")
    votes = (
        topk.join(lab, topk.neighbor_id == lab.vec_id)
        .groupBy("probe_id", "label")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(F.col("c").desc(), "label")
    winner = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("probe_id", F.col("label").alias("pred_label"))
    )
    true_lab = v.select(
        F.col("vec_id").alias("probe_id"), F.col("label").alias("true_label")
    )
    return (
        winner.join(true_lab, "probe_id")
        .groupBy("true_label")
        .agg(
            F.count(F.lit(1)).alias("n_probes"),
            F.count(
                F.when(F.col("pred_label") == F.col("true_label"), 1)
            ).alias("n_correct"),
        )
        .withColumn("acc_ppm", F.expr("(n_correct * 1000000) div n_probes"))
    )


@register(
    "embedding_norm_profile",
    oracle="""
WITH q AS (
  SELECT label,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0)
                                  AS BIGINT)) AS qv
  FROM embeddings
), n AS (
  SELECT label,
         CAST(list_sum(list_transform(qv, y -> y * y)) AS BIGINT) AS norm2_fix
  FROM q
)
SELECT label,
       norm2_fix // 1000000000000 AS norm2_bucket,
       COUNT(*) AS n_vectors,
       MIN(norm2_fix) AS min_norm2_fix,
       MAX(norm2_fix) AS max_norm2_fix
FROM n
GROUP BY 1, 2
""",
    doc="Embedding-norm distribution per label — the QA pass that catches "
    "norm drift / collapsed vectors before they poison cosine retrieval. "
    "Each component is fixed-point quantized (floor(x * 1e6): one "
    "exactly-rounded IEEE multiply + floor, bit-identical on any "
    "engine), so the squared norm is an exact INTEGER in-row fold — no "
    "float ever crosses an aggregation boundary or a bucket edge, which "
    "is what makes a bucketed float profile hash-gateable. Headroom: "
    "(1e6)^2 x 64 dims = 6.4e13 << 2^63. One narrow scan + one "
    "map-side-combinable aggregate; buckets of 1e12 = unit-norm steps.",
    tags=("similarity", "embedding", "profile"),
)
def embedding_norm_profile(spark: SparkSession, sf_dir: str):
    e = t_cpu(spark, sf_dir, "embeddings")
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.lit(1000000.0)).cast("bigint"),
    )
    norm2 = F.aggregate(
        qv, F.lit(0).cast("bigint"), lambda acc, y: acc + y * y
    )
    return (
        e.select("label", norm2.alias("norm2_fix"))
        .groupBy(
            "label", F.expr("norm2_fix div 1000000000000").alias("norm2_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("norm2_fix").alias("min_norm2_fix"),
            F.max("norm2_fix").alias("max_norm2_fix"),
        )
    )


@register(
    "record_linkage_scores",
    oracle="""
WITH nn AS (SELECT count(*) AS n FROM customer),
par AS (
  SELECT CASE WHEN n <= 15000 THEN 1
         ELSE 1::BIGINT << (SELECT min(b) FROM range(0, 48) t(b)
                            WHERE 15000 * (1::BIGINT << b) >= (SELECT n FROM nn))
         END AS m
  FROM nn
),
c AS (
  SELECT c_custkey, c_name, c_mktsegment, c_acctbal, c_nationkey AS blk,
         CAST(floor(CAST(c_acctbal AS DOUBLE) * (SELECT m FROM par) / 1000)
              AS BIGINT) AS bal_blk
  FROM customer
), pairs AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
         CASE WHEN CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) <= 3
              THEN 2 ELSE -1 END
       + CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 1 ELSE -1 END
       + CASE WHEN abs(CAST(a.c_acctbal AS DECIMAL(12,2))
                       - CAST(b.c_acctbal AS DECIMAL(12,2))) < 100
              THEN 1 ELSE 0 END AS score
  FROM c a JOIN c b ON a.blk = b.blk AND a.bal_blk = b.bal_blk
                   AND a.c_custkey < b.c_custkey
)
SELECT CASE WHEN score >= 4 THEN 'match'
            WHEN score >= 1 THEN 'possible'
            ELSE 'nonmatch' END AS tier,
       COUNT(*) AS n_pairs,
       CAST(MIN(score) AS INT) AS min_score,
       CAST(MAX(score) AS INT) AS max_score
FROM pairs
GROUP BY 1
""",
    doc="Fellegi-Sunter-style record-linkage scoring: blocked candidate "
    "pairs (nation x 1000-unit balance bucket — a composite block that "
    "keeps block sizes bounded as the table grows; near-boundary pairs "
    "are the standard blocking recall trade) scored by integer "
    "agreement/disagreement weights over three fields (thresholded name "
    "Levenshtein, segment, exact-decimal balance proximity), then "
    "classified into match/possible/nonmatch tiers. The composite of "
    "the ER primitives the engine already proves separately (blocking, "
    "thresholded edit distance, exact decimal compare) into the "
    "decision-model shape production linkage uses. All-integer weights: "
    "engine-exact. Scale: candidate pairs bounded by sum(block^2) "
    "exactly like fuzzy_join_part_names; the weight expressions never "
    "leave the row; one tiers-sized aggregate out.",
    tags=("similarity", "join", "fuzzy", "agg"),
    bench=True,
)
def record_linkage_scores(spark: SparkSession, sf_dir: str):
    # Auto-granular balance blocking (same pattern as auto_lsh_bits):
    # the (nation × acctbal/1000) key has FIXED ~275-block cardinality,
    # so pairs grow quadratically with the corpus (round-4 sf1 probe:
    # 8.8× wall at 10× rows). Splitting each 1000-wide band into
    # 2^ceil(log2(n/15000)) sub-bands keeps expected block size constant;
    # at the gate scales (sf0.01: 1500 customers, sf0.1: 15000) the
    # multiplier is 1. n from parquet footer metadata (zero jobs), the
    # multiplier from exact integer arithmetic — the oracle replays the
    # same formula, so the gate contract holds at any sf.
    cust = t_cpu(spark, sf_dir, "customer")
    n = parquet_num_rows(sf_dir, "customer")
    m = 1
    while 15000 * m < n:
        m <<= 1
    c = cust.select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        "c_acctbal",
        F.col("c_nationkey").alias("blk"),
        F.floor(F.col("c_acctbal").cast("double") * m / 1000)
        .cast("bigint")
        .alias("bal_blk"),
    )
    a = c.alias("a")
    b = c.alias("b")
    lev = F.levenshtein(F.col("a.c_name"), F.col("b.c_name"), 3)
    score = (
        F.when((lev >= 0) & (lev <= 3), F.lit(2)).otherwise(F.lit(-1))
        + F.when(
            F.col("a.c_mktsegment") == F.col("b.c_mktsegment"), F.lit(1)
        ).otherwise(F.lit(-1))
        + F.when(
            F.abs(
                F.col("a.c_acctbal").cast("decimal(12,2)")
                - F.col("b.c_acctbal").cast("decimal(12,2)")
            )
            < 100,
            F.lit(1),
        ).otherwise(F.lit(0))
    )
    pairs = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bal_blk") == F.col("b.bal_blk"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(score.alias("score"))
    )
    tier = (
        F.when(F.col("score") >= 4, "match")
        .when(F.col("score") >= 1, "possible")
        .otherwise("nonmatch")
    )
    return (
        pairs.groupBy(tier.alias("tier"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("score").cast("int").alias("min_score"),
            F.max("score").cast("int").alias("max_score"),
        )
    )


@register(
    "ann_two_stage_rerank",
    oracle=f"""
WITH v AS ({_V}),
q AS (
  SELECT vec_id,
         list_transform(e, x -> CAST(floor(x * 127.0 /
             (CASE WHEN m = 0 THEN 1.0 ELSE m END)) AS BIGINT)) AS q8
  FROM (
    SELECT vec_id, e,
           list_reduce(list_transform(e, x -> abs(x)),
                       (a, b) -> CASE WHEN b > a THEN b ELSE a END) AS m
    FROM v
  )
),
p AS (SELECT vec_id AS probe_id, q8 AS pq FROM q WHERE vec_id % 100 = 0),
stage1 AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT probe_id, q.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY probe_id
             ORDER BY list_sum(list_transform(range(1, len(pq) + 1),
                                              i -> pq[i] * q.q8[i])) DESC,
                      q.vec_id ASC) AS rn
    FROM p, q WHERE q.vec_id <> probe_id
  ) WHERE rn <= 20
),
rescored AS (
  SELECT s.probe_id, s.neighbor_id,
         list_sum(list_transform(range(1, len(pv.e) + 1),
                                 i -> pv.e[i] * cv.e[i]))
         / (sqrt(list_sum(list_transform(pv.e, x -> x * x)))
            * sqrt(list_sum(list_transform(cv.e, x -> x * x)))) AS cos
  FROM stage1 s
  JOIN v pv ON pv.vec_id = s.probe_id
  JOIN v cv ON cv.vec_id = s.neighbor_id
)
SELECT probe_id, neighbor_id, CAST(rn AS INT) AS rank FROM (
  SELECT probe_id, neighbor_id,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rn
  FROM rescored
) WHERE rn <= 5
""",
    doc="Two-stage retrieval (operators.similarity.two_stage_topk): int8-"
    "quantized integer-dot first stage keeps 20 candidates per probe, "
    "exact float cosine re-ranks only those 20 to the final top-5 — the "
    "production ANN architecture, where the float math touches k' rows "
    "per probe instead of the corpus. Stage-1 ranking is deterministic "
    "by TYPE (integer scores); stage-2 carries only ranks, with the id "
    "tiebreak absorbing last-ulp cosine disagreement. The oracle replays "
    "both stages in SQL.",
    tags=("similarity", "quantize", "rerank"),
)
def ann_two_stage_rerank(spark: SparkSession, sf_dir: str):
    from ..operators.similarity import two_stage_topk

    v = t_cpu(spark, sf_dir, "embeddings")
    probes = v.filter(F.col("vec_id") % 100 == 0)
    return two_stage_topk(v, probes, k=5, k_candidates=20)


@register(
    "embedding_rank_normalize",
    oracle="""
WITH x AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
), r AS (
  SELECT vec_id, CAST(dim AS BIGINT) AS dim, val,
         percent_rank() OVER (PARTITION BY dim ORDER BY val) AS cdf
  FROM x
)
SELECT vec_id, dim, val, cdf FROM r WHERE vec_id % 50 = 0
""",
    doc="Rank-based (empirical-CDF) normalization per embedding "
    "dimension — the distribution-free alternative to mean/std scaling "
    "when dimensions have wildly different or heavy-tailed marginals "
    "(quantile normalization is the probit-free first half of a "
    "rank-Gaussian transform). cdf = percent_rank = (rank-1)/(n-1): "
    "two exact integers and ONE IEEE division, so values are "
    "engine-exact, and ties share a rank in both engines by "
    "definition. The probe filter (vec_id % 50) sits ABOVE the window "
    "on purpose — ranks are against the FULL corpus; Catalyst cannot "
    "push a non-partition-column predicate below the window, which is "
    "exactly the semantics required. Shape at scale: posexplode then "
    "one sort-shuffle keyed on dim; each of the d reducers ranks its "
    "dimension independently (parallelism = d). For corpora where a "
    "full per-dim sort is too hot, the bucketed approximation is "
    "embedding_clip_bounds' percentile grid.",
    tags=("similarity", "embedding", "profile", "window"),
)
def embedding_rank_normalize(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    v = t_cpu(spark, sf_dir, "embeddings")
    x = v.select(
        "vec_id", F.posexplode("embedding").alias("dim", "f")
    ).select(
        "vec_id",
        F.col("dim").cast("bigint").alias("dim"),
        F.col("f").cast("double").alias("val"),
    )
    w = Window.partitionBy("dim").orderBy("val")
    return (
        x.withColumn("cdf", F.percent_rank().over(w))
        .filter(F.col("vec_id") % 50 == 0)
        .select("vec_id", "dim", "val", "cdf")
    )


@register(
    "ann_recall_eval",
    oracle="""
-- Norms hoisted + hot CTEs materialized (round-10 verdict #6, sf1
-- oracle-cost discipline): the per-pair cosine used to recompute BOTH
-- operand norms inside every pair (3 list scans instead of 1), and
-- cscored is referenced twice (assigned + probe_lists) so un-
-- materialized it ran the corpus x centroids scoring twice. The
-- arithmetic is bit-identical to the original formulation: same dot
-- accumulation, the same two sqrt values (computed once per vector),
-- same multiply/divide order — so every ordering, and therefore the
-- gate output, is unchanged.
WITH v AS MATERIALIZED (
  SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
  FROM (SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings)
),
p AS (SELECT vec_id AS probe_id, e AS pe, nrm AS pn FROM v WHERE vec_id % 20 = 0),
ex AS MATERIALIZED (
  -- materialized: referenced by hit AND the pr probe spine
  SELECT probe_id, neighbor_id FROM (
    SELECT probe_id, v.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY
             list_sum(list_transform(range(1, len(pe) + 1), i -> pe[i] * e[i]))
             / (pn * v.nrm) DESC, v.vec_id ASC) AS rn
    FROM p, v WHERE v.vec_id <> probe_id
  ) WHERE rn <= 5
),
cent AS (SELECT vec_id AS centroid_id, e AS ce, nrm AS cn FROM v WHERE vec_id % 50 = 0),
cscored AS MATERIALIZED (
  SELECT v.vec_id, v.e, v.nrm, centroid_id,
         row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY list_sum(list_transform(range(1, len(e) + 1), i -> e[i] * ce[i]))
                    / (v.nrm * cn) DESC,
                    centroid_id ASC) AS crank
  FROM v CROSS JOIN cent
),
assigned AS (
  SELECT vec_id AS neighbor_id, e, nrm, centroid_id
  FROM cscored WHERE crank <= 1
),
probe_lists AS (
  SELECT vec_id AS probe_id, e AS pe, nrm AS pn, centroid_id
  FROM cscored WHERE vec_id % 20 = 0 AND crank <= 2
),
iscored AS (
  SELECT p.probe_id, a.neighbor_id,
         list_sum(list_transform(range(1, len(pe) + 1), i -> pe[i] * a.e[i]))
         / (p.pn * a.nrm) AS cos
  FROM probe_lists p
  JOIN assigned a USING (centroid_id)
  WHERE a.neighbor_id <> p.probe_id
),
ivf AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT probe_id, neighbor_id,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY cos DESC, neighbor_id ASC) AS rn
    FROM iscored
  ) WHERE rn <= 5
),
hit AS (
  SELECT e.probe_id, COUNT(*) AS h
  FROM ex e JOIN ivf i
    ON i.probe_id = e.probe_id AND i.neighbor_id = e.neighbor_id
  GROUP BY 1
)
SELECT pr.probe_id,
       CAST(COALESCE(h.h, 0) AS BIGINT) AS n_hits,
       CAST(floor(COALESCE(h.h, 0) * 1000.0 / 5) AS BIGINT) AS recall_milli
FROM (SELECT DISTINCT probe_id FROM ex) pr
LEFT JOIN hit h ON h.probe_id = pr.probe_id
""",
    doc="ANN quality evaluation: per-probe recall@5 of the IVF index over a wider probe panel (vec_id % 20) "
    "(nprobe=2, deterministic coarse centroids) against the exact "
    "brute-force top-5 — the measurement that decides whether nprobe "
    "or the centroid count needs to grow before shipping an index. "
    "Same in-engine-eval pattern as dedup_lsh_recall_eval: both "
    "retrieval paths are already independently gated queries; the "
    "eval composes them with one equi-join on (probe, neighbor) and "
    "reports exact integer permille. Probes that lose every true "
    "neighbor still appear (left join, 0 hits) — an eval that drops "
    "its failures overstates recall. Shape at scale: probe-keyed "
    "joins only; the corpus-sized work is inside the two gated "
    "subplans.",
    tags=("similarity", "ivf", "eval"),
)
def ann_recall_eval(spark: SparkSession, sf_dir: str):
    v = t_cpu(spark, sf_dir, "embeddings")
    probes = v.filter(F.col("vec_id") % 20 == 0)
    exact = cosine_topk(v, probes, id_col="vec_id", vec_col="embedding", k=5)
    ivf = ivf_topk(
        v, probes=probes, centroids=v.filter(F.col("vec_id") % 50 == 0),
        id_col="vec_id", vec_col="embedding", k=5, nprobe=2,
    )
    hits = (
        exact.join(ivf, ["probe_id", "neighbor_id"], "inner")
        .groupBy("probe_id")
        .agg(F.count(F.lit(1)).alias("h"))
    )
    return (
        exact.select("probe_id")
        .distinct()
        .join(hits, "probe_id", "left")
        .select(
            "probe_id",
            F.coalesce(F.col("h"), F.lit(0)).cast("bigint").alias("n_hits"),
            F.floor(F.coalesce(F.col("h"), F.lit(0)) * F.lit(1000.0) / F.lit(5))
            .cast("bigint")
            .alias("recall_milli"),
        )
    )


@register(
    "embedding_pq_codes",
    oracle="""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
subs AS (SELECT unnest(range(0, 8)) AS sub),
vs AS MATERIALIZED (
  -- materialized: referenced by cs, codes AND probes/lut — inlined,
  -- DuckDB recomputes the corpus x 8 subvector split three times
  -- (round-9 verdict #6 sf1 lesson).
  SELECT vec_id, sub,
         list_transform(range(1, 9), i -> e[sub * 8 + i]) AS sv
  FROM v, subs
),
cs AS (
  SELECT vec_id AS centroid_id, sub, sv AS cv
  FROM vs WHERE vec_id % 50 = 0
),
scored AS (
  SELECT vs.vec_id, vs.sub, cs.centroid_id,
         list_sum(list_transform(range(1, 9),
                  i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))) AS dist2
  FROM vs JOIN cs ON cs.sub = vs.sub
)
SELECT vec_id, CAST(sub AS INT) AS sub, centroid_id AS code, dist2 FROM (
  SELECT vec_id, sub, centroid_id, dist2,
         row_number() OVER (PARTITION BY vec_id, sub
                            ORDER BY dist2 ASC, centroid_id ASC) AS rn
  FROM scored
) WHERE rn = 1
""",
    doc="Product-quantization encoding: each 64-dim embedding splits into "
    "8 contiguous 8-dim subvectors, each assigned to its nearest "
    "deterministic sub-codebook centroid (the vec_id % 50 panel, "
    "sliced the same way) — the memory-side half of a PQ/IVF-PQ index, "
    "compressing a vector to 8 small codes whose distances are later "
    "served from lookup tables. Output is (vec, subspace, code, exact "
    "squared residual): the residual column is the per-subspace "
    "quantization error that sizes the codebook. Each (subvector, "
    "centroid) distance is one mirrored IEEE expression tree — "
    "deterministic doubles — and the argmin is row_number with the "
    "(dist, centroid) total order, id-tiebroken. Shape at scale: "
    "broadcast sub-codebooks x streamed corpus, pure map-side "
    "assignment (the kmeans_two_rounds shape, 8 subproblems at once); "
    "no corpus-sized shuffle at all.",
    tags=("similarity", "quantize", "embedding"),
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str):
    v = t_cpu(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e"),
    )
    subs = F.explode(F.sequence(F.lit(0), F.lit(7))).alias("sub")
    vs = v.select("vec_id", subs, F.col("e")).select(
        "vec_id",
        "sub",
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: F.element_at(F.col("e"), (F.col("sub") * 8 + i).cast("int")),
        ).alias("sv"),
    )
    cs = vs.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("centroid_id"), "sub", F.col("sv").alias("cv")
    )
    dist2 = F.aggregate(
        F.zip_with(F.col("sv"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = vs.join(F.broadcast(cs), "sub").select(
        "vec_id", "sub", "centroid_id", dist2.alias("dist2")
    )
    # Argmin as a struct-MIN aggregate (lexicographic (dist2, centroid) =
    # the same id-tiebroken total order the oracle's row_number uses):
    # map-side combinable, so the shuffle carries one partial per
    # (vec, sub) per partition instead of every scored candidate row.
    best = F.min(F.struct(F.col("dist2"), F.col("centroid_id"))).alias("b")
    return (
        scored.groupBy("vec_id", "sub")
        .agg(best)
        .select(
            "vec_id",
            F.col("sub").cast("int").alias("sub"),
            F.col("b.centroid_id").alias("code"),
            F.col("b.dist2").alias("dist2"),
        )
    )


@register(
    "ann_pq_adc_recall",
    oracle="""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
subs AS (SELECT unnest(range(0, 8)) AS sub),
vs AS MATERIALIZED (
  -- materialized: referenced by cs, codes AND probes/lut — inlined,
  -- DuckDB recomputes the corpus x 8 subvector split three times
  -- (round-9 verdict #6 sf1 lesson).
  SELECT vec_id, sub,
         list_transform(range(1, 9), i -> e[sub * 8 + i]) AS sv
  FROM v, subs
),
cs AS MATERIALIZED (
  -- materialized: referenced by codes AND lut
  SELECT vec_id AS centroid_id, sub, sv AS cv
  FROM vs WHERE vec_id % 50 = 0
),
codes AS MATERIALIZED (
  -- Materialized: behind a GROUP BY subquery the optimizer loses the
  -- cardinality estimate and the downstream (sub, code) join order
  -- degrades 8x (measured 69s -> 570s+ un-materialized at sf1).
  -- Argmin as a hash-aggregated struct-MIN instead of a row_number
  -- window (round-10 verdict #6): the corpus x codebook join is the
  -- oracle's biggest intermediate and a window must SORT it, while
  -- min() over (d, centroid_id) structs streams through a hash
  -- aggregate — the lexicographic struct order is exactly the
  -- window's (d ASC, centroid_id ASC) total order, so the selected
  -- code is identical.
  SELECT vec_id, sub, struct_extract(b, 'c') AS code FROM (
    SELECT vs.vec_id, vs.sub,
           min(struct_pack(
             d := list_sum(list_transform(range(1, 9),
                  i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))),
             c := cs.centroid_id)) AS b
    FROM vs JOIN cs ON cs.sub = vs.sub
    GROUP BY vs.vec_id, vs.sub
  )
),
probes AS (SELECT vec_id AS probe_id, sub, sv AS pv FROM vs WHERE vec_id % 20 = 0),
lut AS MATERIALIZED (
  SELECT p.probe_id, p.sub, c.centroid_id,
         CAST(floor(list_sum(list_transform(range(1, 9),
              i -> (pv[i] - cv[i]) * (pv[i] - cv[i]))) * 1000000000.0)
              AS BIGINT) AS d_fix
  FROM probes p JOIN cs c ON c.sub = p.sub
),
adc AS MATERIALIZED (
  SELECT probe_id, neighbor_id FROM (
    SELECT l.probe_id, k.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY l.probe_id
             ORDER BY SUM(l.d_fix) ASC, k.vec_id ASC) AS rn
    FROM codes k
    JOIN lut l ON l.sub = k.sub AND l.centroid_id = k.code
    WHERE k.vec_id <> l.probe_id
    GROUP BY l.probe_id, k.vec_id
  ) WHERE rn <= 5
),
exact AS MATERIALIZED (
  -- materialized: referenced by hit AND the pr probe spine
  SELECT probe_id, neighbor_id FROM (
    SELECT p.vec_id AS probe_id, v.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY p.vec_id
             ORDER BY list_sum(list_transform(range(1, len(v.e) + 1),
                      i -> (p.e[i] - v.e[i]) * (p.e[i] - v.e[i]))) ASC,
                      v.vec_id ASC) AS rn
    FROM (SELECT vec_id, e FROM v WHERE vec_id % 20 = 0) p
    CROSS JOIN v
    WHERE v.vec_id <> p.vec_id
  ) WHERE rn <= 5
),
hit AS (
  SELECT e.probe_id, COUNT(*) AS h
  FROM exact e JOIN adc a
    ON a.probe_id = e.probe_id AND a.neighbor_id = e.neighbor_id
  GROUP BY 1
)
SELECT pr.probe_id,
       CAST(COALESCE(h.h, 0) AS BIGINT) AS n_hits,
       CAST(floor(COALESCE(h.h, 0) * 1000.0 / 5) AS BIGINT) AS recall_milli
FROM (SELECT DISTINCT probe_id FROM exact) pr
LEFT JOIN hit h ON h.probe_id = pr.probe_id
""",
    doc="The serving half of IVF-PQ, end to end: probes build an 8 x "
    "codebook lookup table of subspace distances to every centroid "
    "(asymmetric distance computation — the probe stays full-precision, "
    "the corpus is its PQ codes), every corpus vector is scored as the "
    "SUM OF 8 TABLE LOOKUPS joined on (subspace, code) — never touching "
    "the original vectors — and ADC top-5 is evaluated for recall "
    "against exact L2 top-5. Table distances are fixed-point-quantized "
    "(floor(d x 1e9): one deterministic IEEE multiply + floor) BEFORE "
    "the 8-term sum, so the score is an exact integer — a raw double "
    "sum across a groupBy would be order-dependent and gate-breakable. "
    "Shape at scale: the LUT is probes x 8 x codebook (tiny, "
    "broadcast); scoring joins the O(corpus x 8) code table once; no "
    "full-vector math ever touches the corpus at query time — exactly "
    "why PQ serves billion-vector indexes from RAM.",
    tags=("similarity", "quantize", "eval"),
)
def ann_pq_adc_recall(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    v = t_cpu(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e"),
    )
    subs = F.explode(F.sequence(F.lit(0), F.lit(7))).alias("sub")
    vs = v.select("vec_id", subs, "e").select(
        "vec_id",
        "sub",
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: F.element_at(F.col("e"), (F.col("sub") * 8 + i).cast("int")),
        ).alias("sv"),
    )
    cs = vs.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("centroid_id"), "sub", F.col("sv").alias("cv")
    )
    sq = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    best = F.min(F.struct(sq(F.col("sv"), F.col("cv")).alias("dist2"),
                          F.col("centroid_id"))).alias("b")
    codes = (
        vs.join(F.broadcast(cs), "sub")
        .groupBy("vec_id", "sub")
        .agg(best)
        .select("vec_id", "sub", F.col("b.centroid_id").alias("code"))
    )
    probes = vs.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("probe_id"), "sub", F.col("sv").alias("pv")
    )
    lut = probes.join(F.broadcast(cs), "sub").select(
        "probe_id",
        "sub",
        "centroid_id",
        F.floor(sq(F.col("pv"), F.col("cv")) * F.lit(1000000000.0))
        .cast("bigint")
        .alias("d_fix"),
    )
    w_adc = Window.partitionBy("probe_id").orderBy(
        F.col("score").asc(), F.col("neighbor_id").asc()
    )
    adc = (
        codes.join(
            F.broadcast(lut),
            (codes.sub == lut.sub) & (codes.code == lut.centroid_id),
        )
        .filter(F.col("vec_id") != F.col("probe_id"))
        .groupBy("probe_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d_fix").alias("score"))
        .withColumn("rn", F.row_number().over(w_adc))
        .filter(F.col("rn") <= 5)
        .select("probe_id", "neighbor_id")
    )
    p_full = v.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe")
    )
    w_ex = Window.partitionBy("probe_id").orderBy(
        F.col("dist2").asc(), F.col("neighbor_id").asc()
    )
    exact = (
        v.crossJoin(F.broadcast(p_full))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            sq(F.col("pe"), F.col("e")).alias("dist2"),
        )
        .withColumn("rn", F.row_number().over(w_ex))
        .filter(F.col("rn") <= 5)
        .select("probe_id", "neighbor_id")
    )
    hits = (
        exact.join(adc, ["probe_id", "neighbor_id"], "inner")
        .groupBy("probe_id")
        .agg(F.count(F.lit(1)).alias("h"))
    )
    return (
        exact.select("probe_id")
        .distinct()
        .join(hits, "probe_id", "left")
        .select(
            "probe_id",
            F.coalesce(F.col("h"), F.lit(0)).cast("bigint").alias("n_hits"),
            F.floor(F.coalesce(F.col("h"), F.lit(0)) * F.lit(1000.0) / F.lit(5))
            .cast("bigint")
            .alias("recall_milli"),
        )
    )


@register(
    "ann_mmr_select",
    oracle=f"""
WITH v AS ({_V}),
q AS (
  SELECT vec_id,
         list_transform(e, x -> CAST(floor(x * 127.0 /
             (CASE WHEN m = 0 THEN 1.0 ELSE m END)) AS BIGINT)) AS q8
  FROM (
    SELECT vec_id, e,
           list_reduce(list_transform(e, x -> abs(x)),
                       (a, b) -> CASE WHEN b > a THEN b ELSE a END) AS m
    FROM v
  )
),
p AS (SELECT vec_id AS probe_id, q8 AS pq FROM q
      WHERE vec_id = (SELECT MIN(vec_id) FROM q)),
cand AS (
  SELECT q.vec_id AS id, q.q8,
         CAST(list_sum(list_transform(range(1, len(pq) + 1),
                                      i -> pq[i] * q.q8[i])) AS BIGINT) AS rel
  FROM p, q WHERE q.vec_id <> probe_id
  ORDER BY rel DESC, id ASC LIMIT 40
),
sims AS (
  SELECT a.id AS ia, b.id AS ib,
         CAST(list_sum(list_transform(range(1, len(a.q8) + 1),
                                      i -> a.q8[i] * b.q8[i])) AS BIGINT)
           AS sim
  FROM cand a, cand b WHERE a.id <> b.id
),
s1 AS (SELECT id, rel, 7 * rel AS score FROM cand
       ORDER BY rel DESC, id ASC LIMIT 1),
s2 AS (
  SELECT c.id, c.rel, 7 * c.rel - 3 * s.sim AS score
  FROM cand c JOIN sims s ON s.ia = c.id JOIN s1 ON s.ib = s1.id
  WHERE c.id NOT IN (SELECT id FROM s1)
  ORDER BY score DESC, c.id ASC LIMIT 1
),
sel2 AS (SELECT id FROM s1 UNION ALL SELECT id FROM s2),
s3 AS (
  SELECT c.id, c.rel, 7 * c.rel - 3 * m.ms AS score
  FROM cand c JOIN (
    SELECT s.ia AS id, MAX(s.sim) AS ms FROM sims s
    JOIN sel2 ON s.ib = sel2.id GROUP BY 1
  ) m ON m.id = c.id
  WHERE c.id NOT IN (SELECT id FROM sel2)
  ORDER BY score DESC, c.id ASC LIMIT 1
),
sel3 AS (SELECT id FROM sel2 UNION ALL SELECT id FROM s3),
s4 AS (
  SELECT c.id, c.rel, 7 * c.rel - 3 * m.ms AS score
  FROM cand c JOIN (
    SELECT s.ia AS id, MAX(s.sim) AS ms FROM sims s
    JOIN sel3 ON s.ib = sel3.id GROUP BY 1
  ) m ON m.id = c.id
  WHERE c.id NOT IN (SELECT id FROM sel3)
  ORDER BY score DESC, c.id ASC LIMIT 1
)
SELECT CAST(1 AS INT) AS step, id AS vec_id, rel, score FROM s1
UNION ALL SELECT 2, id, rel, score FROM s2
UNION ALL SELECT 3, id, rel, score FROM s3
UNION ALL SELECT 4, id, rel, score FROM s4
""",
    doc="Maximal-marginal-relevance diversity selection (operators."
    "similarity.mmr_select): from the probe's top-40 quantized-dot "
    "candidates, greedily pick 4 maximizing 7*rel - 3*max_sim_to_"
    "selected (lambda = 0.7 cross-multiplied to integers) — the "
    "dedup-aware result-list / exemplar-curation primitive that pure "
    "top-k lacks. Every quantity is an int8-quantized INTEGER dot "
    "product, so each greedy argmax (and therefore the whole trace) "
    "is deterministic with an id tiebreak on both engines; the oracle "
    "unrolls the identical 4 steps as chained argmax CTEs. Scale "
    "shape: stage 1 is the distributed quantized scan + top-N "
    "(TakeOrderedAndProject); the greedy touches only the bounded "
    "candidate set (N^2 broadcast pairwise sims, k tiny argmax "
    "steps) — two-stage retrieval structure, never corpus-quadratic.",
    tags=("similarity", "quantize", "mmr", "topk"),
    bench=True,
)
def ann_mmr_select(spark: SparkSession, sf_dir: str):
    from ..operators.similarity import mmr_select

    v = t_cpu(spark, sf_dir, "embeddings")
    probe = v.select(F.min("vec_id").alias("vec_id"))
    return mmr_select(v, probe, k=4, n_candidates=40, lam10=7)


@register(
    "ann_rrf_fusion",
    oracle=f"""
WITH v AS ({_V}),
p AS (SELECT vec_id AS probe_id, e AS pe FROM v WHERE vec_id % 100 = 0),
ex_scored AS (
  SELECT probe_id, v.vec_id AS neighbor_id, {_COS} AS cos
  FROM p, v WHERE v.vec_id <> probe_id
),
ex AS (
  SELECT probe_id, neighbor_id, rn AS r1 FROM (
    SELECT probe_id, neighbor_id,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY cos DESC, neighbor_id ASC) AS rn
    FROM ex_scored
  ) WHERE rn <= 10
),
q AS (
  SELECT vec_id,
         list_transform(e, x -> CAST(floor(x * 127.0 /
             (CASE WHEN m = 0 THEN 1.0 ELSE m END)) AS BIGINT)) AS q8
  FROM (
    SELECT vec_id, e,
           list_reduce(list_transform(e, x -> abs(x)),
                       (a, b) -> CASE WHEN b > a THEN b ELSE a END) AS m
    FROM v
  )
),
qp AS (SELECT vec_id AS probe_id, q8 AS pq FROM q WHERE vec_id % 100 = 0),
qt_scored AS (
  SELECT probe_id, q.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, len(pq) + 1),
                                      i -> pq[i] * q.q8[i])) AS BIGINT)
           AS idot
  FROM qp, q WHERE q.vec_id <> probe_id
),
qt AS (
  SELECT probe_id, neighbor_id, rn AS r2 FROM (
    SELECT probe_id, neighbor_id,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY idot DESC, neighbor_id ASC) AS rn
    FROM qt_scored
  ) WHERE rn <= 10
),
fused AS (
  SELECT COALESCE(ex.probe_id, qt.probe_id) AS probe_id,
         COALESCE(ex.neighbor_id, qt.neighbor_id) AS neighbor_id,
         COALESCE(CAST(1 AS DOUBLE) / (60 + ex.r1), CAST(0 AS DOUBLE))
         + COALESCE(CAST(1 AS DOUBLE) / (60 + qt.r2), CAST(0 AS DOUBLE))
           AS score
  FROM ex FULL JOIN qt
    ON ex.probe_id = qt.probe_id AND ex.neighbor_id = qt.neighbor_id
)
SELECT probe_id, neighbor_id, CAST(rn AS INT) AS fused_rank, score FROM (
  SELECT probe_id, neighbor_id, score,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY score DESC, neighbor_id ASC) AS rn
  FROM fused
) WHERE rn <= 5
""",
    doc="Reciprocal-rank fusion of two retrieval stages — exact float "
    "cosine top-10 and int8 quantized integer-dot top-10 — into one "
    "top-5 per probe: score = sum over lists of 1/(60 + rank), the "
    "standard RRF that rewards agreement between rankers without "
    "comparing their incommensurable scores (hybrid-retrieval's "
    "default combiner). Determinism: both input RANKINGS are already "
    "gate-proven deterministic, ranks are integers, and the fused "
    "score is two correctly-rounded divisions + one add of identical "
    "operands on both engines — bit-equal doubles, ties broken by id. "
    "Shape: the two rankers' per-probe top-10s (each a bounded "
    "WindowGroupLimit output) FULL-join on (probe, neighbor) — "
    "hundreds of rows per probe, never corpus-sized.",
    tags=("similarity", "rerank", "fusion", "topk"),
)
def ann_rrf_fusion(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    from ..operators.similarity import cosine_topk, quantized_topk

    v = t_cpu(spark, sf_dir, "embeddings")
    probes = v.filter(F.col("vec_id") % 100 == 0)
    ex = cosine_topk(v, probes, id_col="vec_id", vec_col="embedding", k=10).select(
        "probe_id", "neighbor_id", F.col("rank").alias("r1")
    )
    qt = quantized_topk(v, probes, k=10).select(
        "probe_id", "neighbor_id", F.col("rank").alias("r2")
    )
    fused = ex.join(qt, ["probe_id", "neighbor_id"], "full").select(
        "probe_id",
        "neighbor_id",
        (
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("r1")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("r2")), F.lit(0.0))
        ).alias("score"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= 5)
        .select("probe_id", "neighbor_id", F.col("fused_rank").cast("int"), "score")
    )


_B8_OF = lambda col: " + ".join(  # noqa: E731
    f"(CASE WHEN {col}[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
    for i in range(8)
)


@register(
    "ann_multiprobe_lsh",
    oracle=f"""
WITH raw AS (
  SELECT vec_id, CAST({_B8_OF('embedding')} AS INT) AS bucket,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
p0 AS (SELECT vec_id AS probe_id, bucket AS b0, e AS pe FROM raw
       WHERE vec_id % 100 = 0),
p AS (
  SELECT probe_id, pe,
         CASE WHEN f = -1 THEN b0
              ELSE xor(b0, (1 << f)) END AS bucket
  FROM p0, unnest([-1, 0, 1, 2, 3, 4, 5, 6, 7]) AS t(f)
),
scored AS (
  SELECT probe_id, raw.vec_id AS neighbor_id, {_COS} AS cos
  FROM p JOIN raw USING (bucket)
  WHERE raw.vec_id <> probe_id
)
SELECT probe_id, neighbor_id, CAST(rn AS INT) AS rank FROM (
  SELECT probe_id, neighbor_id,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rn
  FROM scored
) WHERE rn <= 3
""",
    doc="Multi-probe sign-LSH ANN (operators.similarity."
    "multiprobe_lsh_topk): every probe searches its own bucket plus "
    "the 8 buckets one sign-flip away — the Lv-et-al recall lever "
    "that widens candidates ~9x by perturbing the QUERY key instead "
    "of multiplying hash tables (no extra index memory, no extra "
    "corpus shuffle: the corpus is bucketed once, only the broadcast "
    "probe table explodes). Exact cosine re-rank over the widened "
    "set, top-3 per probe; next to ann_lsh_buckets (single-probe) "
    "the two isolate exactly what multi-probing buys. Buckets "
    "partition the corpus, so no candidate dedup is needed; the "
    "oracle rebuilds the same 9-key expansion with integer XOR.",
    tags=("similarity", "lsh", "multiprobe"),
)
def ann_multiprobe_lsh(spark: SparkSession, sf_dir: str):
    from ..operators.similarity import multiprobe_lsh_topk

    v = t_cpu(spark, sf_dir, "embeddings")
    probes = v.filter(F.col("vec_id") % 100 == 0)
    return multiprobe_lsh_topk(
        v, probes, id_col="vec_id", vec_col="embedding", k=3, bits=8
    )


@register(
    "ann_multiprobe_recall_eval",
    oracle=f"""
WITH raw AS (
  SELECT vec_id, CAST({_B8_OF('embedding')} AS INT) AS bucket,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
pr AS (SELECT vec_id AS probe_id, bucket AS b0, e AS pe FROM raw
       WHERE vec_id % 100 = 0),
exact AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT pr.probe_id, raw.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY pr.probe_id
                              ORDER BY {_COS} DESC, raw.vec_id ASC) AS rn
    FROM pr, raw WHERE raw.vec_id <> pr.probe_id
  ) WHERE rn <= 3
),
single AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT pr.probe_id, raw.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY pr.probe_id
                              ORDER BY {_COS} DESC, raw.vec_id ASC) AS rn
    FROM pr JOIN raw ON raw.bucket = pr.b0
    WHERE raw.vec_id <> pr.probe_id
  ) WHERE rn <= 3
),
pmulti AS (
  SELECT probe_id, pe,
         CASE WHEN f = -1 THEN b0 ELSE xor(b0, (1 << f)) END AS bucket
  FROM pr, unnest([-1, 0, 1, 2, 3, 4, 5, 6, 7]) AS t(f)
),
multi AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT pmulti.probe_id, raw.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY pmulti.probe_id
                              ORDER BY {_COS.replace('pe', 'pmulti.pe')} DESC,
                                       raw.vec_id ASC) AS rn
    FROM pmulti JOIN raw USING (bucket)
    WHERE raw.vec_id <> pmulti.probe_id
  ) WHERE rn <= 3
)
SELECT CAST((SELECT COUNT(DISTINCT probe_id) FROM pr) AS BIGINT) AS n_probes,
       CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS n_truth,
       CAST((SELECT COUNT(*) FROM exact e JOIN single s
             ON s.probe_id = e.probe_id AND s.neighbor_id = e.neighbor_id)
            * 1000 // (SELECT COUNT(*) FROM exact) AS BIGINT)
         AS recall_single_permille,
       CAST((SELECT COUNT(*) FROM exact e JOIN multi m
             ON m.probe_id = e.probe_id AND m.neighbor_id = e.neighbor_id)
            * 1000 // (SELECT COUNT(*) FROM exact) AS BIGINT)
         AS recall_multi_permille
""",
    doc="Multi-probe payoff, measured: recall@3 of single-bucket LSH vs "
    "Hamming-1 multi-probe LSH against the exact cosine ground truth, "
    "in integer permille over the same probe set — the number that "
    "justifies (or refutes) the 9x candidate widening on THIS corpus. "
    "Follows the eval pattern of ann_recall_eval / "
    "dedup_lsh_recall_eval: index quality is a first-class gated "
    "measurement, not a docstring claim. Truth, single and multi "
    "rankings reuse the registry's own operators; integer "
    "cross-multiplied recall avoids float division.",
    tags=("similarity", "lsh", "multiprobe", "eval"),
)
def ann_multiprobe_recall_eval(spark: SparkSession, sf_dir: str):
    from ..operators.similarity import (
        cosine_topk,
        lsh_bucket_topk,
        multiprobe_lsh_topk,
    )

    v = t_cpu(spark, sf_dir, "embeddings")
    probes = v.filter(F.col("vec_id") % 100 == 0)
    exact = cosine_topk(v, probes, id_col="vec_id", vec_col="embedding", k=3)
    single = lsh_bucket_topk(
        v, probes, id_col="vec_id", vec_col="embedding", k=3, bits=8
    )
    multi = multiprobe_lsh_topk(
        v, probes, id_col="vec_id", vec_col="embedding", k=3, bits=8
    )
    n_probes = probes.agg(
        F.count_distinct("vec_id").alias("n_probes")
    )
    n_truth = exact.agg(F.count(F.lit(1)).alias("n_truth"))
    hit_s = exact.join(single, ["probe_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).alias("h_s")
    )
    hit_m = exact.join(multi, ["probe_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).alias("h_m")
    )
    return (
        n_probes.crossJoin(n_truth).crossJoin(hit_s).crossJoin(hit_m)
        .select(
            "n_probes", "n_truth",
            F.expr("(h_s * 1000) DIV n_truth").cast("bigint")
            .alias("recall_single_permille"),
            F.expr("(h_m * 1000) DIV n_truth").cast("bigint")
            .alias("recall_multi_permille"),
        )
    )


@register(
    "hybrid_search_rrf",
    oracle=f"""
WITH norm_docs AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
  FROM documents
), toks AS (
  SELECT doc_id, unnest(string_split(norm, ' ')) AS term
  FROM norm_docs WHERE length(norm) > 0
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
), df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
), weighted AS (
  SELECT q.term, CAST(1000000 // df.df AS BIGINT) AS w
  FROM (SELECT unnest(['table', 'hash', 'merge']) AS term) q
  JOIN df ON df.term = q.term
), sparse AS (
  SELECT doc_id, rn AS r_sparse FROM (
    SELECT tf.doc_id,
           row_number() OVER (
             ORDER BY SUM(tf.tf * w.w) DESC, tf.doc_id ASC) AS rn
    FROM tf JOIN weighted w ON w.term = tf.term
    GROUP BY tf.doc_id
  ) WHERE rn <= 10
), v AS ({_V}),
qv AS (SELECT e AS pe FROM v WHERE vec_id = 0),
dense AS (
  SELECT vec_id AS doc_id, rn AS r_dense FROM (
    SELECT v.vec_id,
           row_number() OVER (ORDER BY {_COS} DESC, v.vec_id ASC) AS rn
    FROM v, qv WHERE v.vec_id <> 0
  ) WHERE rn <= 10
), fused AS (
  SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
         COALESCE(CAST(1 AS DOUBLE) / (60 + s.r_sparse), CAST(0 AS DOUBLE))
         + COALESCE(CAST(1 AS DOUBLE) / (60 + d.r_dense), CAST(0 AS DOUBLE))
           AS score
  FROM sparse s FULL JOIN dense d ON d.doc_id = s.doc_id
)
SELECT doc_id, CAST(rn AS INT) AS fused_rank, score FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
  FROM fused
) WHERE rn <= 10
""",
    doc="Hybrid retrieval, the RAG-stack capstone: a SPARSE keyword "
    "ranking (the integer-IDF inverted index of "
    "search_inverted_index) and a DENSE query-by-example ranking "
    "(exact cosine to document 0's embedding — embeddings and "
    "documents share ids 1:1) fuse by reciprocal rank, the combiner "
    "production hybrid search ships because sparse and dense scores "
    "are incommensurable but RANKS are not. Both input rankings are "
    "integer-deterministic (exact integer keyword scores; id-broken "
    "cosine ties), the fused score is two correctly-rounded "
    "divisions + one add — bit-equal across engines. Keyword recall "
    "catches lexical matches embeddings miss; the exemplar catches "
    "paraphrases keywords miss; the global top-10s are "
    "TakeOrderedAndProject / bounded windows throughout.",
    tags=("similarity", "search", "fusion", "rerank", "topk"),
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    from ..functions.text import normalized_text
    from ..operators.similarity import cosine_topk

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
    sparse = (
        tf.join(F.broadcast(weighted), "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("w")).cast("bigint").alias("s"))
        .orderBy(F.col("s").desc(), F.col("doc_id"))
        .limit(10)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("s").desc(), F.col("doc_id")))
            .alias("r_sparse"),
        )
    )
    v = t_cpu(spark, sf_dir, "embeddings")
    probe = v.filter(F.col("vec_id") == 0)
    dense = cosine_topk(
        v, probe, id_col="vec_id", vec_col="embedding", k=10
    ).select(F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("r_dense"))
    fused = sparse.join(dense, "doc_id", "full").select(
        "doc_id",
        (
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("r_sparse")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("r_dense")), F.lit(0.0))
        ).alias("score"),
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("fused_rank") <= 10)
        .select("doc_id", "fused_rank", "score")
    )


@register(
    "embedding_dim_stats",
    oracle="""
WITH qt AS (
  SELECT list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0)
                                  AS BIGINT)) AS q
  FROM embeddings
),
ex AS (
  SELECT u.dim AS dim, u.v AS v FROM (
    SELECT unnest([{'dim': i - 1, 'v': q[i]} FOR i IN range(1, len(q) + 1)])
             AS u
    FROM qt
  )
)
SELECT CAST(dim AS INT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(v) AS BIGINT) AS min_fix,
       CAST(MAX(v) AS BIGINT) AS max_fix,
       CAST(SUM(v) AS BIGINT) AS sum_fix,
       CAST(SUM(CAST(v AS HUGEINT) * v) AS DECIMAL(38,0)) AS ss_fix,
       (CAST(CAST(SUM(v) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
         / 1000000.0 AS mean_q
FROM ex
GROUP BY 1
""",
    doc="Per-DIMENSION embedding profile (count, min, max, sum, sum of "
    "squares, mean) — the feature-drift / collapsed-dimension QA pass "
    "that per-VECTOR profiles (embedding_norm_profile) cannot give: a "
    "dimension whose min==max across the corpus is dead, one whose "
    "mean drifts between snapshots signals an encoder change, and the "
    "exact (sum, sumsq, n) triple is the mergeable state from which "
    "any downstream consumer derives variance or a whitening "
    "transform without rescanning. posexplode is a narrow columnar "
    "flatten (rows x dims, no shuffle); the single map-side-combinable "
    "groupBy(dim) has fixed output cardinality (= dims), so at 100 TB "
    "the shuffle carries dims x partitions tiny partials — the "
    "textbook sketch shape, and the (sum, sumsq) partials merge by "
    "addition across shards/days. Determinism: components are "
    "fixed-point quantized (floor(x*1e6), one exactly-rounded IEEE "
    "multiply) so every aggregate is exact integer arithmetic — sums "
    "in BIGINT (|v|<=2^21 holds to ~2^31 rows/dim), sum-of-squares in "
    "DECIMAL(38,0) (headroom to ~1e12 rows); the mean is two "
    "correctly-rounded int->double casts and two IEEE divisions with "
    "pinned parenthesisation, bit-identical cross-engine for "
    "|sum| < 2^53.",
    tags=("similarity", "embedding", "profile", "sketch"),
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str):
    e = t_cpu(spark, sf_dir, "embeddings")
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.lit(1000000.0)).cast("bigint"),
    )
    ex = e.select(F.posexplode(qv).alias("dim", "v"))
    vd = F.col("v").cast("decimal(19,0)")
    return (
        ex.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("min_fix"),
            F.max("v").alias("max_fix"),
            F.sum("v").alias("sum_fix"),
            F.sum(vd * vd).cast("decimal(38,0)").alias("ss_fix"),
        )
        .select(
            F.col("dim").cast("int").alias("dim"),
            "n",
            "min_fix",
            "max_fix",
            "sum_fix",
            "ss_fix",
            (
                (
                    F.col("sum_fix").cast("double")
                    / F.col("n").cast("double")
                )
                / F.lit(1000000.0)
            ).alias("mean_q"),
        )
    )


@register(
    "embedding_power_iteration",
    oracle="""
WITH qt AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0)
                                  AS BIGINT)) AS q
  FROM embeddings
),
ex AS (
  SELECT vec_id, u.dim AS dim, u.v AS v FROM (
    SELECT vec_id,
           unnest([{'dim': i - 1, 'v': q[i]} FOR i IN range(1, len(q) + 1)])
             AS u
    FROM qt
  )
),
y1 AS (
  SELECT vec_id, 1000 * SUM(v) AS y FROM ex GROUP BY 1
),
z1 AS (
  SELECT dim, SUM(CAST(y1.y AS HUGEINT) * ex.v) AS z
  FROM ex JOIN y1 ON y1.vec_id = ex.vec_id
  GROUP BY 1
),
m1 AS (SELECT GREATEST(MAX(abs(z)), 1) AS m FROM z1),
w1 AS (
  SELECT dim,
         CAST(CASE WHEN z < 0 THEN -((abs(z) * 1000) // m1.m)
              ELSE (z * 1000) // m1.m END AS BIGINT) AS w
  FROM z1, m1
),
y2 AS (
  SELECT ex.vec_id, SUM(ex.v * w1.w) AS y
  FROM ex JOIN w1 ON w1.dim = ex.dim
  GROUP BY 1
),
z2 AS (
  SELECT dim, SUM(CAST(y2.y AS HUGEINT) * ex.v) AS z
  FROM ex JOIN y2 ON y2.vec_id = ex.vec_id
  GROUP BY 1
),
m2 AS (SELECT GREATEST(MAX(abs(z)), 1) AS m FROM z2)
SELECT CAST(z2.dim AS INT) AS dim,
       CAST(CASE WHEN z2.z < 0 THEN -((abs(z2.z) * 1000) // m2.m)
            ELSE (z2.z * 1000) // m2.m END AS BIGINT) AS weight_milli,
       CAST(m2.m AS DECIMAL(38,0)) AS norm_scale
FROM z2, m2
""",
    doc="Distributed POWER ITERATION: two rounds of w <- A'Aw over the "
    "embedding matrix (uncentered Gram), yielding the dominant "
    "principal direction in exact arithmetic — the building block of "
    "PCA/whitening/spectral methods done Spark-first, no MLlib, no "
    "driver-side matrix. Each round is two map-side-combinable "
    "aggregates: y = Av (row-keyed: per-vector dot with the broadcast "
    "64-row weight vector) then z = A'y (dim-keyed, fixed output "
    "cardinality = dims) — never materializing the dims x dims Gram, "
    "so the shape scales to any row count and is exactly how one "
    "computes top-k components at 100 TB. Determinism by "
    "construction: components fixed-point quantized (floor(x*1e6)), "
    "the A'y accumulation in DECIMAL(38,0) (headroom ~1e12 rows), and "
    "the per-round renormalization divides by max|z| in SIGN-SPLIT "
    "integer floor division (truncation-vs-floor never disagrees on "
    "non-negative operands — the cross-engine '//' trap), so the "
    "milli-unit weight vector is bit-identical on any engine. w0 = "
    "all-ones pins the eigenvector sign. Oracle replays both rounds "
    "over HUGEINT in DuckDB.",
    tags=("similarity", "embedding", "iterative", "agg"),
)
def embedding_power_iteration(spark: SparkSession, sf_dir: str):
    e = t_cpu(spark, sf_dir, "embeddings")
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.lit(1000000.0)).cast("bigint"),
    )
    ex = e.select(
        "vec_id", F.posexplode(qv).alias("dim", "v")
    ).persist()

    def zstep(y):
        # z = A'y: join the per-row scalar back, accumulate per dim in
        # DECIMAL(38,0); fixed output cardinality (= dims).
        return (
            ex.join(y.hint("shuffle_hash"), "vec_id")
            .groupBy("dim")
            .agg(
                F.sum(
                    F.col("y").cast("decimal(19,0)")
                    * F.col("v").cast("decimal(19,0)")
                )
                .cast("decimal(38,0)")
                .alias("z")
            )
        )

    def normalize(z):
        # Lineage cut before the double reference (max aggregate + the
        # normalized projection) — without it each reference re-runs the
        # whole A'y join+aggregate, doubling the round's cost (the same
        # trap fixed across the PageRank family, see operators/graph.py).
        z = z.localCheckpoint()
        m = z.agg(
            F.greatest(F.max(F.abs(F.col("z"))), F.lit(1).cast("decimal(38,0)"))
            .alias("m")
        )
        return z.crossJoin(F.broadcast(m)).select(
            "dim",
            F.when(
                F.col("z") < 0,
                -F.expr("(abs(z) * 1000) div m"),
            )
            .otherwise(F.expr("(z * 1000) div m"))
            .cast("bigint")
            .alias("w"),
            F.col("m"),
        )

    # round 1: w0 = all-ones => y1 = 1000 * sum(v) per row
    y1 = ex.groupBy("vec_id").agg((F.lit(1000) * F.sum("v")).alias("y"))
    w1 = normalize(zstep(y1)).select("dim", "w")
    # round 2: y2 = A w1 via the broadcast 64-row weight vector
    y2 = (
        ex.join(F.broadcast(w1), "dim")
        .groupBy("vec_id")
        .agg(F.sum(F.col("v") * F.col("w")).alias("y"))
    )
    zn = normalize(zstep(y2))
    out = zn.select(
        F.col("dim").cast("int").alias("dim"),
        F.col("w").alias("weight_milli"),
        F.col("m").cast("decimal(38,0)").alias("norm_scale"),
    ).localCheckpoint()
    ex.unpersist()
    return out


def _jl_signs(k: int = 8, d: int = 64) -> list[list[float]]:
    """Deterministic ±1 Johnson–Lindenstrauss projection rows from md5
    parity of ``jl:{row}:{dim}`` — computed once at import and spliced as
    LITERALS into both the Spark plan and the DuckDB oracle, so the two
    engines multiply by the bit-identical matrix (no cross-engine hash
    mirroring needed; a ±1 Achlioptas matrix satisfies the JL guarantee
    just like a Gaussian one and keeps every product exact-in-double)."""
    import hashlib

    return [
        [
            1.0
            if hashlib.md5(f"jl:{j}:{i}".encode()).digest()[0] % 2 == 0
            else -1.0
            for i in range(d)
        ]
        for j in range(k)
    ]


_JL = _jl_signs()


def _jl_matrix_cte() -> str:
    """One-row CTE carrying the 8 projection rows as array columns
    m0..m7 — hoisted so the 64-element literal is built ONCE, not per
    element access (the inline ``(lit::DOUBLE[])[i]`` form rebuilt the
    array inside every lambda step: 20k rows x 8 rows x 64 dims = 10M
    constructions, 128s at sf1 for a 20k-row result)."""
    cols = []
    for j, row in enumerate(_JL):
        lit = "[" + ", ".join(f"{s:.1f}" for s in row) + "]"
        cols.append(f"{lit}::DOUBLE[] AS m{j}")
    return "SELECT " + ",\n         ".join(cols)


def _jl_sql_projection() -> str:
    """The 8 projected components as DuckDB expressions p0..p7 (reads
    the matrix columns of ``_jl_matrix_cte``)."""
    return ",\n         ".join(
        f"list_reduce(list_transform(range(1, 65), "
        f"i -> e[i] * m{j}[i]), (a, b) -> a + b) AS p{j}"
        for j in range(len(_JL))
    )


@register(
    "embedding_jl_projection",
    oracle=f"""
WITH v AS ({_V}),
m AS ({_jl_matrix_cte()}),
p AS (
  SELECT vec_id,
         list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b)
           AS orig_sq,
         {_jl_sql_projection()}
  FROM v CROSS JOIN m
)
SELECT vec_id,
       CAST(floor(((p0*p0 + p1*p1 + p2*p2 + p3*p3 + p4*p4 + p5*p5
                    + p6*p6 + p7*p7) / 8.0) * 1000.0 / orig_sq) AS BIGINT)
         AS distortion_milli
FROM p WHERE orig_sq > 0
""",
    doc="Johnson–Lindenstrauss random projection 64→8 dims with a "
    "distortion audit: each vector is projected through a deterministic "
    "±1 (Achlioptas) matrix and the squared-norm ratio "
    "‖Rx‖²/(k·‖x‖²) is reported in milli-units — the per-vector check "
    "of the JL guarantee that makes the projection trustworthy as an "
    "ANN PRE-FILTER. Scale shape: the matrix is 8 literal arrays "
    "(broadcast-free — they live in the plan), each component is a "
    "zip_with/aggregate sequential fold entirely inside codegen, no "
    "shuffle at all — a pure map over the corpus, 8× less vector "
    "bandwidth for any downstream distance pass. Determinism: identical "
    "literal matrix spliced into both engines; sums are sequential "
    "left-folds; the three closing ops (÷k, ×1000, ÷orig) are "
    "fixed-order single IEEE ops; projections appear only SQUARED so "
    "±0.0 fold edges can't surface.",
    tags=("similarity", "embedding", "projection"),
)
def embedding_jl_projection(spark: SparkSession, sf_dir: str):
    from ..operators.similarity import dot

    emb = t_cpu(spark, sf_dir, "embeddings")
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select("vec_id", e.alias("e"))
    orig_sq = F.aggregate(
        F.col("e"), F.lit(0.0), lambda acc, x: acc + x * x
    )
    ps = [
        dot(F.col("e"), F.array(*[F.lit(s) for s in _JL[j]])).alias(f"p{j}")
        for j in range(len(_JL))
    ]
    proj = base.select("vec_id", orig_sq.alias("orig_sq"), *ps)
    sumsq = (
        F.col("p0") * F.col("p0")
        + F.col("p1") * F.col("p1")
        + F.col("p2") * F.col("p2")
        + F.col("p3") * F.col("p3")
        + F.col("p4") * F.col("p4")
        + F.col("p5") * F.col("p5")
        + F.col("p6") * F.col("p6")
        + F.col("p7") * F.col("p7")
    )
    return proj.filter(F.col("orig_sq") > 0).select(
        "vec_id",
        F.floor((sumsq / F.lit(8.0)) * F.lit(1000.0) / F.col("orig_sq"))
        .cast("bigint")
        .alias("distortion_milli"),
    )


@register(
    "embedding_covariance_pairs",
    oracle="""
WITH ex AS MATERIALIZED (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
              AS BIGINT) AS v
  FROM embeddings
),
n AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM embeddings),
sums AS (
  SELECT dim, SUM(CAST(v AS HUGEINT)) AS s,
         SUM(CAST(v AS HUGEINT) * v) AS s2
  FROM ex GROUP BY 1
),
pair_s AS (
  SELECT a.dim AS dim_i, b.dim AS dim_j,
         SUM(CAST(a.v AS HUGEINT) * b.v) AS sij
  FROM ex a JOIN ex b ON b.vec_id = a.vec_id AND b.dim > a.dim
  GROUP BY 1, 2
),
scaled AS (
  SELECT p.dim_i, p.dim_j,
         n.n * p.sij - si.s * sj.s AS cov_scaled,
         n.n * si.s2 - si.s * si.s AS var_scaled_i,
         n.n * sj.s2 - sj.s * sj.s AS var_scaled_j
  FROM pair_s p
  JOIN sums si ON si.dim = p.dim_i
  JOIN sums sj ON sj.dim = p.dim_j
  CROSS JOIN n
),
fp AS (
  SELECT dim_i, dim_j,
         CAST(CASE WHEN cov_scaled < 0
              THEN -((-cov_scaled) // (n.n * n.n))
              ELSE cov_scaled // (n.n * n.n) END AS BIGINT) AS cov_fp,
         CAST(var_scaled_i // (n.n * n.n) AS BIGINT) AS var_fp_i,
         CAST(var_scaled_j // (n.n * n.n) AS BIGINT) AS var_fp_j
  FROM scaled CROSS JOIN n
)
SELECT CAST(dim_i AS INT) AS dim_i, CAST(dim_j AS INT) AS dim_j,
       cov_fp,
       CAST((CAST(abs(cov_fp) AS HUGEINT) * abs(cov_fp) * 1000000)
            // NULLIF(CAST(var_fp_i AS HUGEINT) * var_fp_j, 0) AS BIGINT)
         AS corr2_ppm
FROM fp
ORDER BY abs(cov_fp) DESC, dim_i ASC, dim_j ASC
LIMIT 20
""",
    doc="PAIRWISE feature covariance — the one-pass sufficient-"
    "statistics pattern behind PCA/whitening/feature-selection at "
    "100 TB (embedding_power_iteration deliberately never materializes "
    "the Gram matrix; this op materializes exactly the d(d-1)/2 "
    "BOUNDED cells, top-20 by |cov|): uncentered sums S_i, S_ii and "
    "pairwise S_ij accumulate map-side into a fixed 64+2016-cell "
    "output regardless of row count, then cov_scaled = n*S_ij - "
    "S_i*S_j exactly in DECIMAL(38,0)/HUGEINT. The per-row pair "
    "products are generated IN-ROW by a nested higher-order transform "
    "over the (projection-boundary-materialized — the round-11 sf10 "
    "CSE lesson) quantized vector, so there is NO self-join on the "
    "Spark side; the oracle uses the equivalent per-vec_id join. "
    "Determinism: fixed-point quantization floor(x*1e6), sign-split "
    "floor division by n^2 back to 1e-12-unit covariance (BIGINT, "
    "scale-independent), and corr^2 in ppm from already-normalized "
    "fixed-point pieces so no intermediate ever exceeds 1e30 at any "
    "corpus size. Ties rank deterministically on (|cov| desc, i, j).",
    tags=("similarity", "embedding", "stats", "agg"),
)
def embedding_covariance_pairs(spark: SparkSession, sf_dir: str):
    e = t_cpu(spark, sf_dir, "embeddings")
    base = e.select(
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * F.lit(1000000.0)).cast(
                "bigint"
            ),
        ).alias("q")
    )
    n = e.agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("n"))
    d = F.size(F.col("q"))
    # Per-dim sums/squares: one posexplode pass, fixed 64-row output.
    ex = base.select(F.posexplode("q").alias("dim", "v"))
    sums = ex.groupBy("dim").agg(
        F.sum(F.col("v").cast("decimal(38,0)")).alias("s"),
        F.sum(F.col("v").cast("decimal(19,0)") * F.col("v")).cast(
            "decimal(38,0)"
        ).alias("s2"),
    )
    # In-row upper-triangle products (no self-join), exploded straight
    # into a map-side-combinable aggregate. r11: the interpreted
    # per-element work is cut to ONE long multiply — no struct
    # construction, no per-element int casts, no BigDecimal multiply
    # (products stay BIGINT: |q| = |floor(x*1e6)| of unit-scale
    # embedding components, so |prod| << 2^63, and ANSI mode fails
    # loudly rather than wrapping if the domain ever breaks that).
    # (dim_i, dim_j) are recovered AFTER aggregation from the flat
    # upper-triangle position via a bounded d(d-1)/2-row literal map —
    # 2016 rows instead of 2016 structs × every vector.
    pairs = base.select(
        F.posexplode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), d - 1),
                    lambda i: F.transform(
                        F.sequence(i + 1, d),
                        lambda j: F.element_at(F.col("q"), i)
                        * F.element_at(F.col("q"), j),
                    ),
                )
            )
        ).alias("pos", "prod")
    )
    pos_s = pairs.groupBy("pos").agg(
        F.sum(F.col("prod").cast("decimal(38,0)")).cast("decimal(38,0)")
        .alias("sij")
    )
    # Flat position -> (dim_i, dim_j): row-major upper triangle for the
    # fixed embedding dimensionality (read from the corpus schema-side
    # constant: one bounded head probe of the quantized array length).
    dim_n = len(base.select("q").head()["q"])
    posmap = spark.createDataFrame(
        [
            (pos, i, j)
            for pos, (i, j) in enumerate(
                (i, j)
                for i in range(dim_n - 1)
                for j in range(i + 1, dim_n)
            )
        ],
        "pos int, dim_i int, dim_j int",
    )
    pair_s = pos_s.join(F.broadcast(posmap), "pos").select(
        "dim_i", "dim_j", "sij"
    )
    si = sums.select(
        F.col("dim").alias("dim_i"), F.col("s").alias("s_i"),
        F.col("s2").alias("s2_i"),
    )
    sj = sums.select(
        F.col("dim").alias("dim_j"), F.col("s").alias("s_j"),
        F.col("s2").alias("s2_j"),
    )
    scaled = (
        pair_s.join(F.broadcast(si), "dim_i")
        .join(F.broadcast(sj), "dim_j")
        .crossJoin(F.broadcast(n))
        .select(
            "dim_i", "dim_j",
            (F.col("n") * F.col("sij") - F.col("s_i") * F.col("s_j"))
            .alias("cov_scaled"),
            (F.col("n") * F.col("s2_i") - F.col("s_i") * F.col("s_i"))
            .alias("var_scaled_i"),
            (F.col("n") * F.col("s2_j") - F.col("s_j") * F.col("s_j"))
            .alias("var_scaled_j"),
            "n",
        )
    )
    fp = scaled.select(
        "dim_i", "dim_j",
        F.expr(
            "CAST(CASE WHEN cov_scaled < 0"
            " THEN -((-cov_scaled) DIV (n * n))"
            " ELSE cov_scaled DIV (n * n) END AS BIGINT)"
        ).alias("cov_fp"),
        F.expr("CAST(var_scaled_i DIV (n * n) AS BIGINT)").alias("var_fp_i"),
        F.expr("CAST(var_scaled_j DIV (n * n) AS BIGINT)").alias("var_fp_j"),
    )
    out = fp.select(
        F.col("dim_i").cast("int").alias("dim_i"),
        F.col("dim_j").cast("int").alias("dim_j"),
        "cov_fp",
        F.expr(
            "CAST((CAST(abs(cov_fp) AS DECIMAL(19,0)) * abs(cov_fp)"
            " * 1000000)"
            " DIV NULLIF(CAST(var_fp_i AS DECIMAL(19,0)) * var_fp_j, 0)"
            " AS BIGINT)"
        ).alias("corr2_ppm"),
    )
    return out.orderBy(
        F.abs(F.col("cov_fp")).desc(), F.col("dim_i"), F.col("dim_j")
    ).limit(20)


@register(
    "dbscan_grid_clusters",
    oracle="""
WITH pts AS (
  SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 20.0) AS BIGINT) AS cx,
         CAST(floor(CAST(embedding[2] AS DOUBLE) * 20.0) AS BIGINT) AS cy
  FROM embeddings
),
cells AS (SELECT cx, cy, CAST(COUNT(*) AS BIGINT) AS n FROM pts GROUP BY 1, 2),
core AS (
  SELECT cx, cy, n, (cx + 100) * 201 + (cy + 100) AS cell
  FROM cells WHERE n >= 5
),
edges AS (
  SELECT a.cell AS src, b.cell AS dst
  FROM core a JOIN core b
    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
),
reach AS (
  WITH RECURSIVE r AS (
    SELECT cell AS src, cell AS dst FROM core
    UNION
    SELECT r.src, e.dst FROM r JOIN edges e ON e.src = r.dst
  )
  SELECT src, MIN(dst) AS label FROM r GROUP BY 1
)
SELECT CAST(label AS BIGINT) AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(c.n) AS BIGINT) AS n_points
FROM reach JOIN core c ON c.cell = reach.src
GROUP BY 1
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(COUNT(*) AS BIGINT),
       CAST(SUM(n) AS BIGINT)
FROM cells WHERE n < 5 HAVING COUNT(*) > 0
""",
    doc="Grid-cell DBSCAN — density clustering done Spark-first (the "
    "density complement of kmeans_two_rounds): embeddings projected to "
    "dims (0,1), quantized to a fixed grid (floor(x*20), one multiply "
    "+ floor, bit-identical cross-engine), CORE cells = count >= "
    "minPts(5), clusters = connected components of the 8-neighborhood "
    "core-cell graph, everything else = noise (cluster -1). This is "
    "the cell-based GriDBSCAN decomposition: the unbounded point set "
    "only ever passes one map-side-combinable groupBy (points -> cell "
    "counts); all graph work happens on the BOUNDED cell table (the "
    "grid domain caps it at ~40k cells regardless of row count). "
    "Adjacency is an EQUI-join — each core cell explodes its 9 "
    "neighbor keys and hash-joins back on the encoded cell id — not "
    "the O(cells^2) inequality join the oracle can afford on the tiny "
    "domain; components via operators.graph.connected_components "
    "(pointer-doubling min-label, the dedup CC machinery), whose "
    "min-reachable-id label exactly matches the oracle's reachability "
    "closure MIN. Cluster rows: (min cell id, n_cells, n_points).",
    tags=("similarity", "embedding", "clustering", "graph", "iterative"),
)
def dbscan_grid_clusters(spark: SparkSession, sf_dir: str):
    from ..operators.graph import connected_components

    e = t_cpu(spark, sf_dir, "embeddings")
    pts = e.select(
        F.floor(F.element_at("embedding", 1).cast("double") * F.lit(20.0))
        .cast("bigint")
        .alias("cx"),
        F.floor(F.element_at("embedding", 2).cast("double") * F.lit(20.0))
        .cast("bigint")
        .alias("cy"),
    )
    # The grid-bounded cell table (<= ~40k rows) feeds FOUR plan
    # branches (edge probes, edge targets, the cluster rollup join and
    # the noise row); uncached, each branch re-scans the wide
    # embeddings array column and redoes the quantize+count pass
    # (r11: 4 FileScans in the before plan). Persist collapses them
    # to one embeddings pass over a tiny cache.
    cells = pts.groupBy("cx", "cy").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).persist()
    cell_id = (F.col("cx") + 100) * 201 + (F.col("cy") + 100)
    core = cells.filter(F.col("n") >= 5).withColumn("cell", cell_id)
    # 9 neighbor keys per core cell (incl. self), equi-joined back
    # against the core set: edges exist only between core cells.
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probes = core.select(
        F.col("cell").alias("src"), "cx", "cy",
        F.explode(offsets).alias("o"),
    ).select(
        "src",
        ((F.col("cx") + F.col("o.dx") + 100) * 201
         + (F.col("cy") + F.col("o.dy") + 100)).alias("dst"),
    )
    targets = core.select(F.col("cell").alias("dst"))
    edges = probes.join(targets.hint("shuffle_hash"), "dst").select(
        "src", "dst"
    )
    comp = connected_components(edges, src="src", dst="dst")
    clusters = (
        core.join(
            comp.withColumnRenamed("node", "cell"), "cell"
        )
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.sum("n").cast("bigint").alias("n_points"),
        )
        .select(
            F.col("component").cast("bigint").alias("cluster_id"),
            "n_cells", "n_points",
        )
    )
    noise = (
        cells.filter(F.col("n") < 5)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.sum("n").cast("bigint").alias("n_points"),
        )
        .filter(F.col("n_cells") > 0)
        .select(
            F.lit(-1).cast("bigint").alias("cluster_id"),
            "n_cells", "n_points",
        )
    )
    return clusters.unionByName(noise)
