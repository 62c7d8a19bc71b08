"""Similarity search over embedding columns (array<float>).

Not in the reference surface (it has no array types, SURVEY.md §1.3) —
this is the LLM-data-pipeline extension. Two paths:

- ``cosine_topk``: brute-force top-k — broadcast the probe set, score every
  (probe, candidate) pair with built-in higher-order functions
  (zip_with/aggregate: JVM-side, codegen, no Python), rank per probe.
  At scale this is a single broadcast-nested pass over the corpus: no
  shuffle except the final per-probe top-k (tiny).
- ``lsh_bucket_topk``: sign-bucket ANN — bucket every vector by the sign
  bits of its leading dimensions (a deterministic hyperplane family), join
  probes to candidates within the same bucket only, then rank. Recall is
  traded for a candidate set ~corpus/2^bits per probe.

Determinism note (correctness gate): dot products are computed as a
sequential left-fold over index order (``aggregate``), with every element
cast to double first — the same fold order DuckDB's ``list_sum`` uses — so
scores are bit-identical across engines. Ranking tiebreak is the vector id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F




def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_to_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    vectors: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Brute-force top-k cosine neighbors for each probe vector.

    Output: (probe_id, neighbor_id, rank) — rank 1..k by cosine desc,
    neighbor id asc on ties. Probes are broadcast; candidates stream."""
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cand_vec")
    )
    scored = (
        c.join(F.broadcast(p), F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            cosine(F.col("probe_vec"), F.col("cand_vec")).alias("cos"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


def sign_bucket(vec: Column, bits: int = 8) -> Column:
    """Deterministic LSH bucket: bit i set iff vec[i] >= 0 (i 1-based
    element_at). A fixed axis-aligned hyperplane family — portable to any
    engine, no RNG."""
    terms = [
        F.when(F.element_at(vec, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(bits)
    ]
    out = F.lit(0)
    for t in terms:
        out = out + t
    return out.cast("int")


def auto_lsh_bits(n: int, base_bits: int, target_bucket_rows: int) -> int:
    """Number of sign-LSH bits for an ``n``-row corpus: never below
    ``base_bits`` (the recall floor a gate query pins), and grown so the
    EXPECTED bucket holds ~``target_bucket_rows`` rows — because blocked
    pair work is Σ|bucket|², holding bits constant while the corpus
    grows 10× grows the join ~100×. Pure so it is unit-testable without
    a corpus.

    Exact integer arithmetic (smallest b with target·2^b ≥ n, i.e.
    ceil(log2(n/target)) computed without floats) so a SQL oracle can
    replay the sizing with the same integer formula and can never drift
    by a libm ulp — the parameter is part of the output contract."""
    if n <= target_bucket_rows:
        return base_bits
    b, cap = 0, target_bucket_rows
    while cap < n:
        cap <<= 1
        b += 1
    return max(base_bits, b)


def embedding_near_dup(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    bits: int = 4,
    target_bucket_rows: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold), candidates restricted to the same sign-bucket — the
    blocked self-join that replaces the quadratic all-pairs scan at scale
    (each bucket self-joins independently; shuffle key = bucket).

    Few bits = high recall / bigger buckets; tune bits so the largest
    bucket's square fits an executor. A FIXED ``bits`` is only correct at
    a fixed corpus size: in-bucket pair work is Σ|bucket|², so growing
    the corpus 10× under constant bits grows the join ~100× (measured in
    the round-4 sf1 probe). Pass ``target_bucket_rows`` to auto-size:
    bits = max(bits, ceil(log2(n / target))) — the production path.
    The corpus size comes from ``n_rows`` when the caller already knows
    it (parquet footer metadata, a prior count — zero extra jobs; the
    registry layer does this via ``plans.util.parquet_num_rows``), else
    from one ``count()`` job. The sizing is part of the OUTPUT contract
    (bits change which pairs the approximation can recall), so gated
    oracles replay the same integer formula in SQL.
    Output: (id_a, id_b, cos_sim)."""
    if target_bucket_rows is not None:
        n = n_rows if n_rows is not None else vectors.count()
        bits = auto_lsh_bits(n, bits, target_bucket_rows)
    b = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    a, c = b.alias("a"), b.alias("c")
    return (
        a.join(c, "bucket")
        .filter(F.col("a.id") < F.col("c.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("c.id").alias("id_b"),
            cosine(F.col("a.vec"), F.col("c.vec")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_topk(
    vectors: DataFrame,
    probes: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF (inverted-file) ANN: assign every vector to its nearest centroid
    (one broadcast pass — the "coarse quantizer"), then score each probe only
    against the ``nprobe`` nearest centroid lists. At scale the corpus is
    partitioned by cluster id, so a probe touches nprobe partitions instead
    of the whole corpus; centroids stay broadcast.

    Centroids are caller-supplied (deterministic here; k-means upstream in a
    real pipeline). Tiebreaks: centroid id asc, neighbor id asc.
    Output: (probe_id, neighbor_id, rank)."""
    cent = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
    )

    def nearest_clusters(df: DataFrame, out_id: str, n: int) -> DataFrame:
        scored = df.select(
            F.col(id_col).alias(out_id), F.col(vec_col).alias("v")
        ).crossJoin(F.broadcast(cent)).select(
            out_id,
            "v",
            "centroid_id",
            cosine(F.col("v"), F.col("centroid_vec")).alias("ccos"),
        )
        w = Window.partitionBy(out_id).orderBy(
            F.col("ccos").desc(), F.col("centroid_id").asc()
        )
        return (
            scored.withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= n)
            .select(out_id, "v", "centroid_id")
        )

    assigned = nearest_clusters(vectors, "neighbor_id", 1)
    probe_lists = nearest_clusters(probes, "probe_id", nprobe)

    scored = (
        assigned.join(
            probe_lists.withColumnRenamed("v", "pv"), "centroid_id"
        )
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            cosine(F.col("pv"), F.col("v")).alias("cos"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


def lsh_bucket_topk(
    vectors: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    bits: int = 8,
) -> DataFrame:
    """ANN: probes only scored against candidates in the same sign-bucket.
    Output: (probe_id, neighbor_id, rank)."""
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cand_vec"),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(p), "bucket")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            cosine(F.col("probe_vec"), F.col("cand_vec")).alias("cos"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


def hard_negatives(
    vectors: DataFrame,
    anchors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    bits: int = 4,
) -> DataFrame:
    """Contrastive-pair mining: for each anchor, the most similar
    same-label candidate (the positive) and the most similar
    DIFFERENT-label candidate (the hard negative) within the anchor's
    sign-LSH bucket.

    Output: (anchor_id, positive_id, negative_id) — anchors whose bucket
    lacks either kind of candidate are dropped (inner semantics): a pair
    is only useful to a contrastive loss when both sides exist.

    Scale shape: identical to the bucketed near-dup join — candidates
    come only from the anchor's bucket (~corpus/2^bits), scored with the
    JVM-side fold, reduced by one min_by aggregate per role. No
    all-pairs stage, no Python."""
    b = sign_bucket(F.col(vec_col), bits)
    cand = vectors.select(
        F.col(id_col).alias("cand_id"),
        F.col(label_col).alias("cand_label"),
        F.col(vec_col).alias("cand_vec"),
        b.alias("bucket"),
    )
    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("anchor_label"),
        F.col(vec_col).alias("anchor_vec"),
        b.alias("bucket"),
    )
    scored = (
        cand.join(F.broadcast(a), "bucket")
        .filter(F.col("cand_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "anchor_label",
            "cand_id",
            "cand_label",
            # min over [-cos, id]: max cosine, id-ascending tiebreak
            F.array(
                -cosine(F.col("anchor_vec"), F.col("cand_vec")),
                F.col("cand_id").cast("double"),
            ).alias("rank_key"),
        )
    )
    pos = (
        scored.filter(F.col("cand_label") == F.col("anchor_label"))
        .groupBy("anchor_id")
        .agg(F.min_by("cand_id", "rank_key").alias("positive_id"))
    )
    neg = (
        scored.filter(F.col("cand_label") != F.col("anchor_label"))
        .groupBy("anchor_id")
        .agg(F.min_by("cand_id", "rank_key").alias("negative_id"))
    )
    return pos.join(neg, "anchor_id")


def blocked_fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    max_dist: int,
) -> DataFrame:
    """Entity-resolution fuzzy self-join: candidate pairs share a blocking
    key, then survive an edit-distance (Levenshtein) threshold.

    Blocking is the standard ER recall/cost trade: only within-block pairs
    are compared, so cost is sum(block_size^2) instead of n^2 — callers
    pick block keys that bound block size (brand+size, sorted-neighborhood
    windows, phonetic keys). The contract is explicitly *within-block*
    recall; pairs split across blocks are not found (that is what the
    blocking key means, not a bug).

    Spark-side the distance uses the THRESHOLDED levenshtein (early-exits
    once the running distance exceeds ``max_dist`` — O(d·min(len)) per
    pair instead of O(len^2)), returning -1 above threshold; the filter
    keeps 0..max_dist. Output: (id_a, id_b, name_a, name_b, dist),
    id_a < id_b.
    """
    a = df.select(
        *block_cols,
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("name_a"),
    )
    b = df.select(
        *block_cols,
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("name_b"),
    )
    dist = F.levenshtein("name_a", "name_b", max_dist)
    return (
        a.join(b, block_cols)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "name_a",
            "name_b",
            dist.alias("dist"),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
    )


def quantized_topk(
    vectors: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    strict: bool = False,
) -> DataFrame:
    """Int8-quantized brute-force top-k — the production memory/bandwidth
    optimization for large corpora: each vector is max-abs scaled to
    [-127, 127] (floor — no round-half ambiguity), then scoring is an
    INTEGER dot product. 4× smaller vectors, SIMD-friendly arithmetic,
    and — the property the gate exploits — a fully deterministic ranking:
    integer scores cannot tie-break differently across engines or
    partition orders, unlike float cosine where only the id tiebreak
    rescues last-ulp disagreements.

    Scoring is the standard quantized approximation of the float dot
    product (per-vector scale factors cancel in per-probe RANKINGS only
    up to quantization error — callers wanting exact cosine re-rank the
    top-k' candidates in float, the classic two-stage retrieval).
    Output: (probe_id, neighbor_id, rank, idot), rank 1..k by idot desc,
    id asc.

    Contract: ``probes`` ids must exist in ``vectors`` — the probe's own
    quantized vector comes from the inner join against ``vectors``, so an
    unknown probe id yields NO output rows rather than an error. Pass
    ``strict=True`` to validate eagerly (one anti-join count) and raise
    on missing probe ids instead of silently dropping them.
    """
    if strict:
        missing = (
            probes.select(F.col(id_col))
            .join(vectors.select(F.col(id_col)), id_col, "left_anti")
            .limit(20)
            .collect()
        )
        if missing:
            ids = [r[0] for r in missing]
            raise ValueError(
                f"quantized_topk: probe ids absent from vectors: {ids}"
            )
    e = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    max_abs = F.aggregate(e, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x)))
    safe = F.when(max_abs == 0, F.lit(1.0)).otherwise(max_abs)
    q8 = F.transform(e, lambda x: F.floor(x * F.lit(127.0) / safe).cast("bigint"))
    qv = vectors.select(F.col(id_col).alias("vid"), q8.alias("q8"))
    p = probes.select(F.col(id_col).alias("probe_id")).join(
        qv, F.col("probe_id") == F.col("vid")
    ).select("probe_id", F.col("q8").alias("pq"))
    c = qv.select(F.col("vid").alias("neighbor_id"), F.col("q8").alias("cq"))
    idot = F.aggregate(
        F.zip_with("pq", "cq", lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    scored = (
        c.join(F.broadcast(p), F.col("probe_id") != F.col("neighbor_id"))
        .select("probe_id", "neighbor_id", idot.alias("idot"))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("idot").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", F.col("rank").cast("int"), "idot")
    )


def two_stage_topk(
    vectors: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    k_candidates: int = 20,
) -> DataFrame:
    """Two-stage retrieval: int8-quantized first stage over the whole
    corpus (cheap integer dot products, ``k_candidates`` survivors per
    probe), exact float cosine re-rank of only the survivors — the
    production ANN architecture (coarse quantized scan + precise re-rank)
    where the expensive float math touches k' rows per probe instead of
    the corpus.

    Output: (probe_id, neighbor_id, rank), rank 1..k by exact cosine
    desc, id asc on ties. Recall contract: a true top-k neighbor pushed
    below rank ``k_candidates`` by quantization error is missed — the
    standard two-stage trade; k'>>k makes it negligible.
    """
    cand = quantized_topk(
        vectors, probes, id_col=id_col, vec_col=vec_col, k=k_candidates
    ).select("probe_id", "neighbor_id")
    pv = vectors.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    cv = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cand_vec")
    )
    rescored = (
        cand.join(F.broadcast(pv), "probe_id")
        .join(cv, "neighbor_id")
        .select(
            "probe_id",
            "neighbor_id",
            cosine(F.col("probe_vec"), F.col("cand_vec")).alias("cos"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


def mmr_select(
    vectors: DataFrame,
    probes: DataFrame,
    k: int = 4,
    n_candidates: int = 40,
    lam10: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance selection: from the probe's
    ``n_candidates`` most relevant vectors, greedily pick ``k`` that
    trade relevance against redundancy — score(j) = lam10*rel(j) -
    (10-lam10)*max_{s in selected} sim(j, s), all in the int8-quantized
    INTEGER dot-product space of ``quantized_topk`` (lambda = lam10/10
    cross-multiplied away), so every argmax is deterministic with an id
    tiebreak and the greedy trace is engine-reproducible.

    This is the diversity-selection primitive for RAG result lists and
    training-data curation (pick exemplars, not near-copies). Scale
    shape: stage 1 is the distributed quantized scan + per-probe top-N
    (TakeOrderedAndProject); the greedy then runs on the BOUNDED
    candidate set, collapsed to a SINGLE packed row (collect_list of
    ≤n_candidates structs) whose k argmax steps are nested array
    expressions in one projection — no per-step subtree, no persisted
    intermediate, never an all-corpus quadratic. Returns
    (step, vec_id, rel, score): step 1..k in selection order; step 1's
    score is lam10*rel (empty selected set).

    Contract: ``probes`` must contain exactly one probe row (the
    candidate top-N and the output carry no probe_id); violations raise
    rather than silently mixing probes.
    """
    e = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    max_abs = F.aggregate(e, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x)))
    safe = F.when(max_abs == 0, F.lit(1.0)).otherwise(max_abs)
    q8 = F.transform(e, lambda x: F.floor(x * F.lit(127.0) / safe).cast("bigint"))
    qv = vectors.select(F.col(id_col).alias("vid"), q8.alias("q8"))
    p = (
        probes.select(F.col(id_col).alias("probe_id"))
        .join(qv, F.col("probe_id") == F.col("vid"))
        .select("probe_id", F.col("q8").alias("pq"))
        # r11: the validation count below already computes this 1-row
        # table; persisting it lets the candidate scan's broadcast reuse
        # it instead of re-running the probe-resolution subtree (a
        # second corpus scan + quantize pass) inside the main job.
        .persist()
    )
    # Bounded validation (limit(2) short-circuits): the global top-N and
    # the probe_id-less output are only correct for a single probe.
    n_probes = p.limit(2).count()
    if n_probes != 1:
        raise ValueError(
            "mmr_select requires exactly one probe row; got "
            + ("0" if n_probes == 0 else ">= 2")
            + " (use quantized_topk/multiprobe_lsh_topk for per-probe ANN)"
        )
    idot = F.aggregate(
        F.zip_with("pq", "cq", lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    cand = (
        qv.select(F.col("vid").alias("id"), F.col("q8").alias("cq"))
        .join(F.broadcast(p), F.col("probe_id") != F.col("id"))
        .select("id", "cq", idot.alias("rel"))
        .orderBy(F.col("rel").desc(), F.col("id"))
        .limit(n_candidates)
    )
    # Collapse the bounded top-N into ONE packed row; the whole greedy
    # trace is then nested array expressions over that row — no per-step
    # TakeOrdered subtree, no persisted 40-row intermediates, no N^2
    # sims DataFrame (pair dots are computed lazily inside the argmax).
    packed = cand.agg(
        F.collect_list(F.struct("id", "rel", "cq")).alias("cands")
    )
    mu = 10 - lam10
    lam_b = F.lit(lam10).cast("bigint")
    mu_b = F.lit(mu).cast("bigint")

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    def _argmax(scored):
        # orderBy(score DESC, id ASC) as a comparator sort on the packed
        # array; element 0 is the greedy pick. F.get is NULL (not an
        # ANSI error) when the array is exhausted — k > |candidates|
        # then yields fewer rows, matching the old limit(1) semantics.
        return F.get(
            F.array_sort(
                scored,
                lambda l, r: F.when(l["score"] > r["score"], F.lit(-1))
                .when(l["score"] < r["score"], F.lit(1))
                .when(l["id"] < r["id"], F.lit(-1))
                .when(l["id"] > r["id"], F.lit(1))
                .otherwise(F.lit(0)),
            ),
            0,
        )

    def _entry(step, pick):
        step_col = step if isinstance(step, Column) else F.lit(step)
        return F.struct(
            step_col.cast("int").alias("step"),
            pick["id"].alias("id"),
            pick["rel"].alias("rel"),
            pick["score"].alias("score"),
            pick["cq"].alias("cq"),
        )

    first = _argmax(
        F.transform(
            F.col("cands"),
            lambda c: F.struct(
                (lam_b * c["rel"]).alias("score"),
                c["id"].alias("id"),
                c["rel"].alias("rel"),
                c["cq"].alias("cq"),
            ),
        )
    )

    def _grow(sel, step):
        # One greedy step: filter out already-selected ids, score the
        # rest against the CURRENT selected set (max pairwise dot),
        # append the argmax. ``sel``/``step`` are higher-order-function
        # lambda variables, so each reference is a pointer, not an
        # inlined copy — the whole k-step trace stays one runtime loop
        # (ArrayAggregate), never an exponentially-collapsed Project.
        scored = F.transform(
            F.filter(
                F.col("cands"),
                lambda c: ~F.exists(sel, lambda s: s["id"] == c["id"]),
            ),
            lambda c: F.struct(
                (
                    lam_b * c["rel"]
                    - mu_b
                    * F.aggregate(
                        sel,
                        F.lit(-(1 << 62)).cast("bigint"),
                        lambda acc, s: F.greatest(acc, _dot(c["cq"], s["cq"])),
                    )
                ).alias("score"),
                c["id"].alias("id"),
                c["rel"].alias("rel"),
                c["cq"].alias("cq"),
            ),
        )
        return F.concat(sel, F.array(_entry(step, _argmax(scored))))

    sel_final = (
        F.aggregate(
            F.sequence(F.lit(2), F.lit(k)),
            F.array(_entry(1, first)),
            lambda acc, step: _grow(acc, step),
        )
        if k > 1
        else F.array(_entry(1, first))
    )
    return (
        packed.select(F.explode(sel_final).alias("s"))
        .filter(F.col("s.id").isNotNull())
        .select(
            F.col("s.step").cast("int").alias("step"),
            F.col("s.id").alias(id_col),
            F.col("s.rel").alias("rel"),
            F.col("s.score").alias("score"),
        )
    )


def multiprobe_lsh_topk(
    vectors: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    bits: int = 8,
) -> DataFrame:
    """Multi-probe sign-LSH ANN: each probe searches its own bucket AND
    the ``bits`` buckets at Hamming distance 1 (one sign flipped) — the
    classic recall lever that multiplies candidates ~(bits+1)x WITHOUT
    more hash tables or index memory (Lv et al.'s multi-probe insight:
    near misses land in adjacent buckets, so perturbing the query key is
    cheaper than widening the index). Probe-side fanout only: the
    corpus is still bucketed once; the probe table explodes to bits+1
    keys and broadcasts. Output: (probe_id, neighbor_id, rank) — exact
    cosine over the widened candidate set, deduped (a candidate can
    match via at most one bucket since buckets partition the corpus).
    """
    flips = F.array(
        F.lit(-1), *[F.lit(i) for i in range(bits)]
    )
    p = (
        probes.select(
            F.col(id_col).alias("probe_id"),
            F.col(vec_col).alias("probe_vec"),
            sign_bucket(F.col(vec_col), bits).alias("b0"),
        )
        .select(
            "probe_id", "probe_vec", "b0", F.explode(flips).alias("flip")
        )
        .select(
            "probe_id",
            "probe_vec",
            F.when(F.col("flip") < 0, F.col("b0"))
            .otherwise(F.expr("b0 ^ shiftleft(1, flip)"))
            .alias("bucket"),
        )
    )
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cand_vec"),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(p), "bucket")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            cosine(F.col("probe_vec"), F.col("cand_vec")).alias("cos"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "probe_id", "neighbor_id", F.col("rank").cast("int").alias("rank")
        )
    )


def kcenter_trace(
    df: DataFrame, id_col: str, vec_col: str, k: int
) -> DataFrame:
    """Greedy k-center (farthest-point) coreset trace: ``k`` rows of
    (round, center_id, radius) — see plans.pretrain_ops.
    sample_kcenter_coreset for the literature + scale notes. Fully
    deterministic: seed = lowest id, distance ties break on id.

    r11 shape (guide §1.2 job-count / §5 storage): ONE job per round.
    The corpus-sized (id, vector) table is persisted ONCE; each
    round's min-distance state is a LAZY left-nested ``least(...,
    sqd(e, center_r))`` fold over the centers selected so far —
    centers are O(k·dim) driver literals, so the argmax
    (TakeOrderedAndProject, per-partition top-1 + driver merge of k
    candidate rows) is the round's ONLY job. The previous shape
    additionally re-materialized the full (id, vector, d) state into
    fresh localCheckpoint blocks every round (a second job + a
    corpus-sized array re-serialization per round, measured 2× the
    wall at the 16-job scheduling floor). The fold order is identical
    to the old iterative ``least`` update (and to the oracle's), so
    every IEEE intermediate — hence every rank and tie — is unchanged.
    NOTE for bench accounting: the k argmax jobs run at
    DataFrame-CONSTRUCTION time (as the eager checkpoints did); the
    returned trace is a k-row local relation."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def sqd(a, c):
        return F.aggregate(
            F.zip_with(a, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def vec_lit(vec):
        return F.array(*[F.lit(float(x)) for x in vec])

    v = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("e"),
    ).persist()
    try:
        seed = v.orderBy(F.asc(id_col)).limit(1).collect()[0]
        trace = [(1, seed[id_col], 0.0)]
        # Lazy running min-distance to the selected centers — same
        # left-nested least() chain the materialized update applied.
        d = sqd(F.col("e"), vec_lit(seed["e"]))
        for r in range(2, k + 1):
            far = (
                v.select(id_col, "e", d.alias("d"))
                .orderBy(F.desc("d"), F.asc(id_col))
                .limit(1)
                .collect()[0]
            )
            trace.append((r, far[id_col], far["d"]))
            if r < k:
                d = F.least(d, sqd(F.col("e"), vec_lit(far["e"])))
        id_type = dict(df.dtypes)[id_col]
        return df.sparkSession.createDataFrame(
            trace, f"round int, center_id {id_type}, radius double"
        )
    finally:
        v.unpersist()
