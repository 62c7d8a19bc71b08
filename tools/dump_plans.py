#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for the headline queries.

The registry docstrings ARGUE each plan's scale shape; this artifact shows
the actual Catalyst output backing the argument (pushed filters, broadcast
vs shuffle joins, WindowGroupLimit, whole-stage codegen spans). Regenerate
after plan-affecting changes: python tools/dump_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHOWCASE = [
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q19_disjunctive_pushdown",
    "star_join_enriched",
    "salted_join_revenue",
    "dedup_minhash_lsh",
    "dedup_prefix_jaccard",
    "graph_triangle_count",
    "asof_join_price_index",
    "sample_per_group_topn",
    "delta_join_view",
    "events_sliding_agg",
    "pit_join_scd2",
    "pareto_abc_parts",
    "graph_label_propagation",
    "record_linkage_scores",
    "phrase_pmi_top50",
    "tokenizer_oov_rate",
    "corpus_gopher_rules",
    "zorder_curve_locality",
    "orders_open_backlog",
    "embedding_pq_codes",
    "graph_bfs_layers",
    "graph_sssp_weighted",
    "compaction_binpack_plan",
    "sample_weighted_priority",
    "attribution_position_weighted",
    "json_variant_native",
    "sql_recursive_hierarchy",
    "events_max_concurrency",
    # round-6 additions
    "dedup_suffix_spans",
    "dedup_suffix_apply",
    "decontaminate_embedding",
    "quality_classifier_logodds",
    "tokenizer_unigram_viterbi",
    "kmv_set_intersection",
    "multimodal_phash_dedup",
    "events_drift_tvd",
    "corpus_epoch_plan",
    # round-7 additions
    "multimodal_phash_near_dedup",
    "csv_splittable_roundtrip",
    "dedup_index_maintained_equiv",
    "dedup_index_bucketed_bands",
    "dedup_exact_salted_zipf",
    "dedup_winnowing",
    "dedup_cdc_segments",
    "search_ndcg_eval",
    # round-8 additions
    "graph_kcore_peel",
    "pagerank_copurchase",
    "dedup_connected_components",
    "dedup_index_delete_equiv",
    "ann_ivf_compacted_equiv",
    "ann_ivf_delete_equiv",
    "ann_ivf_requantized_equiv",
    "ann_ivf_drift_monitor",
    "streaming_index_ann",
    "json_splittable_roundtrip",
    # round-9 additions
    "asof_join_nearest",
    "resample_linear_interpolate",
    "search_phrase_positions",
    "embedding_jl_projection",
    "join_size_estimate",
    "corpus_curation_e2e",
    "multimodal_metadata_scrub",
    # round-10 additions
    "dedup_index_lifecycle_e2e",
    "ann_index_lifecycle_e2e",
    "dedup_suffix_spans_chars",
    "dedup_suffix_apply_chars",
    "text_mojibake_repair",
    # round-11 additions
    "dedup_rank_maxjoin_skew",
    "pipeline_curated_agg_scale",
    "text_mojibake_repair_deep",
    # round-11 continuation: the prefix-sum / exact-statistics family
    "stats_spearman_rho",
    "stats_wasserstein_drift",
    "graph_degree_assortativity",
    "stats_kendall_tau_b",
    "quality_brier_reliability",
]


def main() -> int:
    from amazon_sales_data_engineering_spark.operators import graph as _graph
    from amazon_sales_data_engineering_spark.plans import REGISTRY
    from amazon_sales_data_engineering_spark.session import get_spark

    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.01"

    def explain(df) -> str:
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    # Iterative operators localCheckpoint every round, so the RETURNED
    # table's plan is just `Scan ExistingRDD` (round-7 verdict #8). The
    # PLAN_OBSERVER hook hands us each round body BEFORE the lineage
    # cut; keep the FIRST occurrence per tag (a representative round)
    # and append it under the query's section.
    captured: dict[str, str] = {}

    def observe(tag: str, df) -> None:
        if tag not in captured:
            captured[tag] = explain(df)

    _graph.PLAN_OBSERVER = observe

    out = [
        "# PLANS — physical plans of the headline queries (generated)\n",
        "Regenerate with `python tools/dump_plans.py` (sf0.01, the gate's",
        "scale). What to look for: `PushedFilters` on scans, `BroadcastHashJoin`",
        "for dim sides vs `SortMergeJoin`/`ShuffledHashJoin` for fact joins,",
        "`WindowGroupLimit ... Partial` before exchanges, `TakeOrderedAndProject`",
        "for global top-k, and wide `WholeStageCodegen` spans.\n",
    ]
    for name in SHOWCASE:
        q = REGISTRY[name]
        captured.clear()
        df = q.spark_fn(spark, sf)
        plan = explain(df)
        out.append(f"\n## {name}\n")
        doc = (q.doc or "").strip().split(". ")[0]
        if doc:
            out.append(f"{doc}.\n")
        out.append("```\n" + plan.strip() + "\n```\n")
        for tag, rplan in captured.items():
            out.append(
                f"\n### pre-checkpoint plan: {tag}\n\nWhat one round "
                "actually executes before the lineage cut erases it "
                "(the returned fixpoint table above scans the "
                "checkpoint RDD).\n"
            )
            out.append("```\n" + rplan.strip() + "\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    spark.stop()
    print(f"PLANS.md written ({len(SHOWCASE)} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
