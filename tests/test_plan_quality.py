"""Plan-shape guards for the round-2 query families: the point of these
queries is not just the answer but the PLAN (pushdown, partial top-k,
broadcast, TakeOrderedAndProject). Assert the shape so a refactor can't
silently regress a scale property while staying value-correct.
"""

from __future__ import annotations

from amazon_sales_data_engineering_spark.plans import REGISTRY

from .conftest import SF_DIR


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].spark_fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q19_pushes_disjunction_to_both_scans(spark):
    plan = _plan(spark, "q19_disjunctive_pushdown")
    # quantity range reaches the lineitem scan, brand list the part scan
    assert "PushedFilters: [IsNotNull(l_partkey), Or(" in plan
    assert "EqualTo(p_brand,Brand#12)" in plan


def test_tfidf_uses_partial_window_group_limit(spark):
    """Per-doc top-5 must prune BEFORE the shuffle (WindowGroupLimit
    partial mode) — otherwise every (doc, term) row shuffles."""
    plan = _plan(spark, "tfidf_top_terms")
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan


def test_bigrams_take_ordered_not_global_window(spark):
    """Global top-50 must be TakeOrderedAndProject (per-partition top-k +
    driver merge), never a single-partition sort or global window."""
    plan = _plan(spark, "ngram_bigram_top50")
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_q17_broadcasts_per_part_average(spark):
    """The de-correlated per-part AVG is small (one row per part) and must
    broadcast back onto lineitem, not force a shuffle join."""
    plan = _plan(spark, "q17_small_qty_revenue")
    assert "BroadcastHashJoin" in plan


def test_semi_anti_joins_stay_semi_anti(spark):
    """EXISTS/NOT IN must compile to semi/anti joins (no row-multiplying
    inner join + dedup)."""
    assert "LeftSemi" in _plan(spark, "q4_priority_semijoin")
    assert "LeftAnti" in _plan(spark, "q16_supplier_antijoin")
    assert "LeftAnti" in _plan(spark, "q22_idle_rich_customers")


def test_sampling_is_pure_mapside(spark):
    """Deterministic hash sampling must add no shuffle: scan + filter."""
    plan = _plan(spark, "sample_stratified_hash")
    assert "Exchange" not in plan
    assert "rand" not in plan.lower()


def test_decontaminate_broadcasts_eval_grams(spark):
    """The frequency-capped eval-gram set is the small side by
    construction and must broadcast — the train side may not shuffle for
    the join itself."""
    plan = _plan(spark, "decontaminate_ngram_overlap")
    assert "BroadcastHashJoin" in plan


def test_kmeans_broadcasts_centroids(spark):
    """Both assignment rounds must broadcast the k x d centroid table;
    a shuffled assignment join would be the non-scalable shape."""
    plan = _plan(spark, "kmeans_two_rounds")
    # crossJoin(broadcast) per assignment; round-1's subplan appears twice
    # (feeding both the mean recompute and the final a1⋈a2), so >= 2.
    assert plan.count("BroadcastNestedLoopJoin") >= 2
    assert "CartesianProduct" not in plan


def test_histogram_broadcasts_bounds(spark):
    """The 1-row min/max bounds table rides a broadcast; the scan side
    stays a single map-side-combinable aggregate."""
    plan = _plan(spark, "histogram_extendedprice")
    assert "BroadcastNestedLoopJoin" in plan


def test_embedding_quantize_no_shuffle(spark):
    """Normalize + quantize is a pure narrow map over the vector column:
    any Exchange in this plan is a regression. (t_cpu may repartition an
    under-parallelized local scan; only RoundRobin partitioning is
    acceptable — no hash/range exchange.)"""
    plan = _plan(spark, "embedding_normalize_quantize")
    import re

    for m in re.finditer(r"Exchange (\w+)", plan):
        assert m.group(1) == "RoundRobinPartitioning", plan[:2000]


def test_per_group_sample_prunes_before_shuffle(spark):
    """rank<=50 must plan as Partial WindowGroupLimit (per-partition top-k
    heap BEFORE the exchange) — the property the query doc claims."""
    plan = _plan(spark, "sample_per_group_topn")
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_key_skew_profile_take_ordered(spark):
    """Global top-20 heavy hitters: TakeOrderedAndProject, not a global
    sort or single-partition window."""
    plan = _plan(spark, "key_skew_profile")
    assert "TakeOrderedAndProject" in plan


def test_candidate_joins_never_cartesian(spark):
    """Every candidate-generation strategy must plan as an equi-join on
    its blocking key — a cartesian/BroadcastNestedLoop product means the
    blocking silently stopped working."""
    for name in (
        "dedup_prefix_jaccard",
        "dedup_sorted_neighborhood",
        "fuzzy_join_part_names",
        "dedup_incremental_minhash",
    ):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoop" not in plan, name


def test_delta_join_broadcasts_deltas(spark):
    """The join-view delta terms must broadcast the delta sides — the old
    sides are scanned but never shuffled."""
    plan = _plan(spark, "delta_join_view")
    assert plan.count("BroadcastHashJoin") >= 2


def test_oov_rate_broadcasts_vocab(spark):
    """The frequency-truncated vocab is a driver-sized table and must
    broadcast onto the token stream — a shuffle join here would shuffle
    the whole corpus by token."""
    plan = _plan(spark, "tokenizer_oov_rate")
    assert "BroadcastHashJoin" in plan


def test_phrase_pmi_global_topk_is_take_ordered(spark):
    """The PMI top-50 must be TakeOrderedAndProject (per-partition top-k
    + driver merge), never a single-partition global sort."""
    plan = _plan(spark, "phrase_pmi_top50")
    assert "TakeOrderedAndProject" in plan


def test_sorted_neighborhood_has_no_join(spark):
    """lead()-based SNM generates candidates in-row: the plan must be
    window + generate with ZERO join operators (the O(block^2)
    block-keyed self-join this operator replaced)."""
    plan = _plan(spark, "dedup_sorted_neighborhood")
    assert "Join" not in plan
    assert "Window" in plan and "Generate" in plan


def test_record_linkage_never_cartesian(spark):
    """Blocked ER scoring must stay an equi-join on the block key — a
    nested-loop/cartesian pair generation is the quadratic trap."""
    plan = _plan(spark, "record_linkage_scores")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_weighted_sample_is_take_ordered(spark):
    """Weighted priority sampling must plan the smallest-k as
    TakeOrderedAndProject (per-partition top-k + driver k-merge), never
    a global sort, and must stay rand()-free."""
    plan = _plan(spark, "sample_weighted_priority")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan
    assert "rand" not in plan.lower()


def test_compaction_plan_has_no_global_window(spark):
    """The running total must come from the two-phase distributed scan:
    bucket-partitioned windows only — a window over an EMPTY partition
    spec (the single-partition cliff) may appear solely for the
    bucket-offsets table, which is bounded by n_buckets, never the
    inventory. Heuristic: every unpartitioned window in the plan must
    sit over the tiny offsets aggregate (its input carries __btot)."""
    plan = _plan(spark, "compaction_binpack_plan")
    for frag in plan.split("Window ")[1:]:
        head = frag.split("\n", 1)[0]
        if "partitionBy=[]" in head or "PartitionBy: []" in head:
            assert "__btot" in frag.split("Exchange", 1)[0] + head, (
                "unpartitioned window over non-offset data:\n" + head
            )


def test_attribution_join_is_equi_not_nested_loop(spark):
    """The purchase-touch pairing must hash/sort-merge on user_id with
    the time window as a post-join filter — an inequality-only
    BroadcastNestedLoopJoin would be quadratic per user block."""
    plan = _plan(spark, "attribution_position_weighted")
    assert "NestedLoop" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_mmr_greedy_is_single_pass_and_bounded(spark):
    """mmr_select's greedy trace is ONE packed-row expression pipeline
    (ArrayAggregate over the step sequence), not k unioned argmax
    subtrees: the plan must contain no Union, exactly one global top-N
    (TakeOrdered / global Sort+Limit for the candidate set) feeding one
    single-row aggregate — and the output is exactly steps 1..k."""
    df = REGISTRY["ann_mmr_select"].spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    assert "CartesianProduct" not in plan
    steps = sorted(r.step for r in df.select("step").collect())
    assert steps == [1, 2, 3, 4]


def test_patch_plan_single_small_aggregate(spark):
    """Everything after the two narrow mapInPandas stages stays in one
    aggregation — exactly one exchange pair (partial/final agg), no
    join, no sort."""
    plan = _plan(spark, "multimodal_patch_plan")
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2


def test_bloom_words_broadcast_to_probes(spark):
    """The 66-word filter table must broadcast onto the probe side —
    a shuffled join would defeat the point of a Bloom filter."""
    plan = _plan(spark, "bloom_filter_semijoin")
    assert "BroadcastHashJoin" in plan


def test_stride_interleave_take_ordered(spark):
    """The emitted interleave prefix must plan as TakeOrderedAndProject,
    never a global sort of the whole corpus."""
    plan = _plan(spark, "corpus_stride_interleave")
    assert "TakeOrderedAndProject" in plan


def test_rrf_no_cartesian(spark):
    """RRF fuses two bounded per-probe top-10 tables; nothing in the
    plan may degenerate to a cartesian/nested-loop product."""
    plan = _plan(spark, "ann_rrf_fusion")
    assert "CartesianProduct" not in plan


def test_search_broadcasts_query_terms(spark):
    """Inverted-index retrieval must broadcast the (tiny) weighted
    query-term table onto the postings — shuffling postings by term for
    a 3-term query would be the anti-pattern; the global top-10 must be
    TakeOrderedAndProject."""
    plan = _plan(spark, "search_inverted_index")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_lpa_shuffle_diet_idioms(spark):
    """Pin the two idioms label_propagation_rounds' shuffle diet rests
    on (the operator returns an eagerly-checkpointed result, so its
    internal plan isn't visible from the output — guard the idioms):

    1. A PERSISTED repartition(v) keeps its outputPartitioning, so a
       later join on v re-exchanges only the other side (this is what
       silently did NOT hold for localCheckpoint, whose LogicalRDD
       reports UnknownPartitioning — the round-4 fix).
    2. dropDuplicates after repartition(v) rides the same exchange:
       HashPartitioning(v) satisfies the distinct's clustered(u, v).
    """
    from pyspark.sql import functions as F

    e = (
        spark.createDataFrame(
            [(i % 7, (i * 3) % 7) for i in range(40)], "u int, v int"
        )
        .repartition(8, "v")
        .dropDuplicates(["u", "v"])
        .persist()
    )
    try:
        e.count()
        labels = e.groupBy("u").agg(F.min("v").alias("vl"))
        joined = e.join(
            labels.select(F.col("u").alias("v"), "vl").hint("shuffle_hash"), "v"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan, plan[:2000]
        # The streamed (edge) side of the join must read STRAIGHT from
        # the cache: no Exchange between the join and the first
        # InMemoryTableScan. (Exchanges deeper in the plan text live
        # inside the InMemoryRelation's stored build plan or on the
        # label side — those are expected.)
        edge_side = plan.split("Join", 1)[1].split("InMemoryTableScan", 1)[0]
        assert "Exchange" not in edge_side, f"edge side re-exchanged:\n{plan[:2000]}"
        # idiom 2: the CACHED plan itself holds exactly one live
        # exchange — the repartition the dedup rode (the duplicated
        # Initial/Final AQE plan text makes raw counting misleading, so
        # count distinct plan_ids of exchanges instead)
        import re

        cached = e._jdf.queryExecution().executedPlan().toString()
        ex_ids = set(
            re.findall(r"Exchange [^\n]*plan_id=(\d+)", cached)
        )
        assert len(ex_ids) <= 2, cached[:2000]
    finally:
        e.unpersist()


def test_lpa_prepartitioned_swap_elides_edge_exchange(spark):
    """Pin the idiom behind label_propagation_rounds'
    prepartitioned_distinct path (r11): on a SYMMETRIC edge set cached
    with hashpartitioning(src), the alias swap (u, v) := (dst, src) is
    a set-identity whose alias-aware Project REPORTS
    hashpartitioning(v) — so the per-round join on v reads the edge
    side straight from the cache with NO new Exchange (the 51 MB
    repartition-by-v the pre-r11 build paid is gone)."""
    from pyspark.sql import functions as F

    pairs = {(i % 7, (i * 3 + 1) % 7) for i in range(40)}
    sym = sorted(pairs | {(b, a) for a, b in pairs})
    cached = (
        spark.createDataFrame(sym, "src int, dst int")
        .repartition(8, "src")
        .persist()
    )
    try:
        cached.count()
        # the operator's swap: u := dst, v := src
        e = cached.select(
            F.col("dst").alias("u"), F.col("src").alias("v")
        )
        labels = e.groupBy("u").agg(F.min("v").alias("vl"))
        joined = e.join(
            labels.select(F.col("u").alias("v"), "vl").hint(
                "shuffle_hash"
            ),
            "v",
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan, plan[:2000]
        edge_side = plan.split("Join", 1)[1].split(
            "InMemoryTableScan", 1
        )[0]
        assert (
            "Exchange" not in edge_side
        ), f"edge side re-exchanged despite alias swap:\n{plan[:2000]}"
    finally:
        cached.unpersist()


def test_lpa_prepartitioned_requires_symmetric(spark):
    """The alias swap is only edge-set-preserving on a symmetric input
    — the operator must refuse the combination loudly."""
    import pytest as _pytest

    from amazon_sales_data_engineering_spark.operators.graph import (
        label_propagation_rounds,
    )

    df = spark.createDataFrame([(1, 2)], "src int, dst int")
    with _pytest.raises(ValueError, match="symmetric"):
        label_propagation_rounds(
            df, n_rounds=2, symmetric=False, prepartitioned_distinct=True
        )


def test_decontaminate_embedding_broadcasts_eval_side(spark):
    """The eval carve-out is benchmark-sized and must broadcast; a
    SortMergeJoin on bucket would shuffle the whole train corpus."""
    plan = _plan(spark, "decontaminate_embedding")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_suffix_spans_joins_on_hash_never_cartesian(spark):
    """The duplicate-set join back onto window positions is an equi-join
    on the content hash — no nested loop, no cartesian."""
    plan = _plan(spark, "dedup_suffix_spans")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quality_classifier_broadcasts_vocab_weights(spark):
    """Token weights are vocabulary-sized and must broadcast back onto
    the per-doc token stream."""
    plan = _plan(spark, "quality_classifier_logodds")
    assert "BroadcastHashJoin" in plan


def test_kcenter_round_idioms_shuffle_free(spark):
    """sample_kcenter_coreset runs its rounds at construction time (r11:
    one lazy least()-fold argmax job per round over the persisted
    corpus; the trace itself is a k-row local relation), so the final
    plan is only RDD scans (assert that below); the round idioms are
    pinned here on a synthetic frame: (1) the min-distance update is a
    narrow map over the corpus — zero corpus Exchange; (2) the argmax
    is TakeOrderedAndProject, never a global sort."""
    from pyspark.sql import functions as F

    v = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("e"),
        F.lit(0.0).alias("d"),
    )
    c = spark.range(1).select(F.array(F.lit(0.5), F.lit(1.0)).alias("ce"))
    sq = F.aggregate(
        F.zip_with("e", "ce", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    upd = v.crossJoin(F.broadcast(c)).select(
        "vec_id", "e", F.least(F.col("d"), sq).alias("d")
    )
    plan = upd._jdf.queryExecution().executedPlan().toString()
    # the one-row center arrives by BroadcastExchange; what must NOT
    # appear is any shuffle of the corpus side
    for shuffle in ("Exchange hashpartitioning", "Exchange rangepartitioning",
                    "Exchange SinglePartition"):
        assert shuffle not in plan
    argmax = v.orderBy(F.desc("d"), F.asc("vec_id")).limit(1)
    aplan = argmax._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in aplan
    # and the gated query's output really is the checkpointed trace
    final = _plan(spark, "sample_kcenter_coreset")
    assert "Scan ExistingRDD" in final
    assert "SortMergeJoin" not in final


def test_unigram_viterbi_dp_is_vocab_sized(spark):
    """The DP runs over collect_list'd in-row edges: no join in the DP
    stage, piece weights broadcast, nothing corpus-quadratic."""
    plan = _plan(spark, "tokenizer_unigram_viterbi")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ndcg_windows_take_ordered_not_global_sort(spark):
    """Both nDCG rank windows (BM25 order + ideal order) must plan their
    inputs as TakeOrderedAndProject(limit=10) — per-partition top-10 +
    driver merge, never a one-partition corpus sort."""
    plan = _plan(spark, "search_ndcg_eval")
    assert plan.count("TakeOrderedAndProject") >= 2


def test_phrase_search_single_exchange_take_ordered(spark):
    """Positional phrase matching must stay one groupBy exchange with an
    in-row array intersection — no positional self-join — and resolve the
    global top-20 as TakeOrderedAndProject."""
    plan = _plan(spark, "search_phrase_positions")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan
    assert "Window" not in plan


def test_jl_projection_is_pure_map(spark):
    """The 64->8 JL projection is literal-matrix arithmetic inside
    codegen: a keyed or range Exchange means the plan regressed to a
    real shuffle (the only allowed Exchange is t_cpu's round-robin
    spread of an under-parallelized single-file scan)."""
    plan = _plan(spark, "embedding_jl_projection")
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "Sort" not in plan and "Join" not in plan


def test_asof_nearest_no_join_two_exchanges(spark):
    """Nearest as-of = union + two fills over ONE by-key exchange (the
    second exchange is the sparse index build) — never a join."""
    plan = _plan(spark, "asof_join_nearest")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_curation_e2e_no_cartesian_no_smj(spark):
    """The end-to-end curation pipeline: fingerprint window + two
    map-side-combinable aggregates; the only nested-loop is the 1-row
    max-offset broadcast, and the source-report join must broadcast."""
    plan = _plan(spark, "corpus_curation_e2e")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_join_size_estimate_bounded_summary(spark):
    """The estimator reads a bounded summary: top-20 via TakeOrdered
    (per-partition heaps), tail via broadcast anti-join — never a sort
    or shuffle proportional to the key set."""
    plan = _plan(spark, "join_size_estimate")
    assert "TakeOrderedAndProject" in plan
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_ann_lifecycle_probe_prunes_post_compaction(spark):
    """Round-9 verdict #3: the lifecycle e2e's final probe runs against
    a compacted generation plus a partitioned append — BOTH laid out
    hive-partitioned by centroid_id — so the nprobe lists must prune at
    the scan via dynamic partition pruning, and the probe plan must be
    free of the O(partition²) window-frame class."""
    from amazon_sales_data_engineering_spark.plans import REGISTRY
    from amazon_sales_data_engineering_spark.plans.frame_guard import (
        assert_no_quadratic_frames,
    )

    df = REGISTRY["ann_index_lifecycle_e2e"].spark_fn(spark, SF_DIR)
    assert_no_quadratic_frames(df, context="ann_index_lifecycle_e2e")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "dynamicpruningexpression(cast(centroid_id" in plan, plan[:4000]


def test_dedup_lifecycle_compacted_generation_is_clean(spark):
    """The dedup lifecycle e2e compacts tombstones away before the final
    delta — the delta probe joins the ONE merged generation with no
    tombstone anti-join left in the plan (broadcast band join, no
    cartesian)."""
    from amazon_sales_data_engineering_spark.plans import REGISTRY

    df = REGISTRY["dedup_index_lifecycle_e2e"].spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_lifecycle_gates_record_phase_timings(spark):
    """Round-10 verdict #3: the two composite lifecycle gates must
    decompose their wall into named eager phases (replay landing,
    stream drain, compaction, [append]) so a regression inside the
    109/50-stage composites localizes. bench.py --sf1 copies these
    into the BENCH_SF1 sidecar; the lazy probe is the wall residual."""
    from amazon_sales_data_engineering_spark.plans import REGISTRY
    from amazon_sales_data_engineering_spark.plans.streaming_ops import (
        LAST_PHASE_TIMINGS,
    )

    REGISTRY["ann_index_lifecycle_e2e"].spark_fn(spark, SF_DIR)
    ann = LAST_PHASE_TIMINGS["ann_index_lifecycle_e2e"]
    assert set(ann) == {
        "land_replay", "create_index", "replay_drain", "compact",
        "append_partitioned",
    }
    REGISTRY["dedup_index_lifecycle_e2e"].spark_fn(spark, SF_DIR)
    ddp = LAST_PHASE_TIMINGS["dedup_index_lifecycle_e2e"]
    assert set(ddp) == {"land_replay", "replay_drain", "compact"}
    for d in (ann, ddp):
        assert all(v >= 0 for v in d.values())
        # the drain is never instantaneous — a zero here means the
        # phase clock wrapped the wrong block
        assert d["replay_drain"] > 0.1


def test_spearman_broadcasts_quantity_rank_map(spark):
    """The ~50-row quantity rank map must broadcast; the price map join
    may shuffle (its domain grows with the data) but must be a hash
    join, never a cartesian/NL join."""
    plan = _plan(spark, "stats_spearman_rho")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan or "Cross" not in plan.split(
        "BroadcastNestedLoopJoin"
    )[0]


def test_wasserstein_no_global_window_over_value_domain(spark):
    """Both the ECDF cumsum and the neighbor lead must run inside
    percentile-fenced buckets: every Window node is partitioned (no
    single-partition global window)."""
    df = REGISTRY["stats_wasserstein_drift"].spark_fn(spark, SF_DIR)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", opt):
        # a global window renders with no partition columns before the
        # first ordering spec (ASC/DESC marker)
        head = spec.split(",")[0]
        assert "__bucket" in head or "ASC" not in head, spec


def test_assortativity_single_pass_no_cartesian(spark):
    plan = _plan(spark, "graph_degree_assortativity")
    assert "CartesianProduct" not in plan
    # the two 1-row statistic tables combine via broadcast NL cross —
    # bounded; the degree joins themselves must be hash joins
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan or (
        "BroadcastHashJoin" in plan
    )


def test_mcnemar_composes_without_cartesian(spark):
    plan = _plan(spark, "stats_mcnemar_filters")
    assert "CartesianProduct" not in plan


def test_heaps_and_brier_spines_broadcast(spark):
    """The 20-row / 10-row checkpoint spines must join by broadcast —
    never shuffle the aggregates against a 20-row table."""
    for name in ("text_heaps_vocab_growth", "quality_brier_reliability"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name
