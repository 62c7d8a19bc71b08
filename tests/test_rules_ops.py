"""Semantic unit tests for the quality-rules family (plans.rules_ops)
beyond the differential oracle sweep: the in-row max-run fold against a
brute-force Python oracle, heavy-hitter share accounting, and
time-weighted-average interval bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_sales_data_engineering_spark.plans import REGISTRY

from .conftest import SF_DIR


def _brute_max_run(tokens: list[str]) -> int:
    best = run = 0
    prev = None
    for tok in tokens:
        run = run + 1 if tok == prev else 1
        best = max(best, run)
        prev = tok
    return best


def test_gopher_max_run_matches_bruteforce(spark):
    df = REGISTRY["corpus_gopher_rules"].spark_fn(spark, SF_DIR)
    got = {r["doc_id"]: r["max_run"] for r in df.select("doc_id", "max_run").collect()}
    raw = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))).alias("norm"))
        .collect()
    )
    for r in raw:
        toks = r["norm"].split(" ") if r["norm"] else []
        assert got[r["doc_id"]] == _brute_max_run(toks), r["doc_id"]


def test_gopher_keep_discriminates(spark):
    df = REGISTRY["corpus_gopher_rules"].spark_fn(spark, SF_DIR)
    kept = df.groupBy("keep").count().collect()
    assert {r["keep"] for r in kept} == {True, False}


def test_heavy_hitters_share_accounting(spark):
    df = REGISTRY["token_heavy_hitters"].spark_fn(spark, SF_DIR).collect()
    assert df, "heavy hitters must be non-empty on this corpus"
    total = df[0]["n_total"]
    for r in df:
        assert r["n_total"] == total
        assert r["cnt"] * 50 >= total  # the registration's >= 2% contract
        assert r["permille"] == (r["cnt"] * 1000) // total


def test_twa_interval_bookkeeping(spark):
    out = REGISTRY["events_time_weighted_avg"].spark_fn(spark, SF_DIR)
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    per_user = {
        r["user_id"]: r["n"]
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rows = out.collect()
    # users with >= 2 events contribute exactly n-1 intervals
    assert {r["user_id"] for r in rows} == {u for u, n in per_user.items() if n >= 2}
    for r in rows:
        assert r["n_intervals"] == per_user[r["user_id"]] - 1
        assert r["total_dur_us"] > 0


def test_clip_bounds_order_and_coverage(spark):
    rows = REGISTRY["embedding_clip_bounds"].spark_fn(spark, SF_DIR).collect()
    dim = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        F.size("embedding").alias("d")
    ).first()["d"]
    assert len(rows) == dim
    for r in rows:
        assert r["vmin"] <= r["p01"] <= r["p99"] <= r["vmax"]


def test_zorder_buckets_have_narrow_envelopes(spark):
    rows = REGISTRY["zorder_curve_locality"].spark_fn(spark, SF_DIR).collect()
    assert rows
    import statistics

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    glob = li.agg(
        F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
    ).first()
    pk_span, sk_span = glob[1] - glob[0], glob[3] - glob[2]
    # Mean per-bucket envelope must be far narrower than the global span on
    # BOTH dimensions — the property that makes Z-order stats prunable.
    mean_pk = statistics.mean(r["pk_max"] - r["pk_min"] for r in rows)
    mean_sk = statistics.mean(r["sk_max"] - r["sk_min"] for r in rows)
    assert mean_pk < pk_span * 0.5
    assert mean_sk < sk_span * 0.5


def test_rank_normalize_cdf_bounds(spark):
    rows = REGISTRY["embedding_rank_normalize"].spark_fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["cdf"] <= 1.0
    # a probe's per-dim cdf ordering must agree with its value ordering
    by_dim = {}
    for r in rows:
        by_dim.setdefault(r["dim"], []).append((r["val"], r["cdf"]))
    for pairs in by_dim.values():
        pairs.sort()
        cdfs = [c for _, c in pairs]
        assert cdfs == sorted(cdfs)


def test_lsh_recall_eval_consistency(spark):
    r = REGISTRY["dedup_lsh_recall_eval"].spark_fn(spark, SF_DIR).first()
    assert r["n_lsh_found"] <= r["n_truth"]
    assert r["n_lsh_found"] <= r["n_lsh_candidates"]
    assert 0 <= r["recall_milli"] <= 1000
    assert 0 <= r["cand_precision_milli"] <= 1000
    # verified LSH pairs are a subset of truth, so found == truth here
    # means the banded sketch lost nothing on this corpus
    assert r["n_truth"] > 0


def test_modularity_terms_consistent(spark):
    rows = REGISTRY["graph_community_modularity"].spark_fn(spark, SF_DIR).collect()
    assert rows
    e2 = rows[0]["e2"]
    # the symmetric edge list's degree mass sums to the edge count, and
    # intra-community edges can never exceed a community's degree mass
    assert sum(r["degree_sum"] for r in rows) == e2
    for r in rows:
        assert 0 <= r["intra_edges"] <= r["degree_sum"]
        assert r["modularity_term_num"] == r["intra_edges"] * e2 - r["degree_sum"] ** 2


def test_backlog_census_invariants(spark):
    rows = (
        REGISTRY["orders_open_backlog"].spark_fn(spark, SF_DIR)
        .orderBy("d")
        .collect()
    )
    assert rows
    n_orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    running = 0
    peak = 0
    for r in rows:
        running += r["net"]
        assert running == r["n_open"]
        assert running >= 0
        peak = max(peak, running)
    assert running == 0  # every order eventually closes
    assert 0 < peak <= n_orders


def test_source_drift_bounds(spark):
    rows = REGISTRY["corpus_source_drift"].spark_fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # L1 distance between two distributions is in [0, 2] -> [0, 2000] milli
        assert 0 <= r["l1_milli"] <= 2000
        assert r["n_docs"] > 0


def test_cluster_histogram_accounts_for_components(spark):
    hist = REGISTRY["dedup_cluster_size_histogram"].spark_fn(spark, SF_DIR).collect()
    comp = REGISTRY["dedup_connected_components"].spark_fn(spark, SF_DIR)
    n_nodes = comp.count()
    n_components = comp.select("component").distinct().count()
    assert sum(r["n_docs"] for r in hist) == n_nodes
    assert sum(r["n_clusters"] for r in hist) == n_components
    for r in hist:
        assert r["cluster_size"] >= 2  # components need an edge -> >= 2 nodes


def test_late_arrival_profile_discriminates(spark):
    rows = REGISTRY["events_late_arrival_profile"].spark_fn(spark, SF_DIR).collect()
    assert sum(r["n_out_of_order"] for r in rows) > 0
    assert sum(r["n_beyond_watermark"] for r in rows) > 0
    for r in rows:
        assert r["n_beyond_watermark"] <= r["n_out_of_order"] <= r["n_events"]
        assert (r["max_late_us"] > 0) == (r["n_out_of_order"] > 0)


def test_ann_recall_eval_discriminates(spark):
    rows = REGISTRY["ann_recall_eval"].spark_fn(spark, SF_DIR).collect()
    assert rows
    vals = {r["recall_milli"] for r in rows}
    assert not vals - {0, 200, 400, 600, 800, 1000}  # hits out of 5
    assert len(vals) > 1, "recall must discriminate on this corpus"
    for r in rows:
        assert r["recall_milli"] == (r["n_hits"] * 1000) // 5


def test_watermark_drop_gate_discriminates(spark):
    # the straggler replay must contain BOTH failure probes: copies that
    # get dropped (early, window closed) and copies that get kept
    # (last half hour, window open)
    out = REGISTRY["streaming_watermark_drops"].spark_fn(spark, SF_DIR)
    total_streamed = out.agg(F.sum("n_events")).first()[0]
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    sec = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    e = e.select("event_id", sec.alias("sec"))
    lo, hi = e.agg(F.min("sec"), F.max("sec")).first()
    b1 = lo + (hi - lo) // 3
    n_base = e.count()
    n_dropped_probe = e.filter(
        (F.col("sec") < b1) & (F.col("event_id") % 10 == 0)
    ).count()
    n_kept_probe = e.filter(F.col("sec") >= hi - 1800).count()
    assert n_dropped_probe > 0 and n_kept_probe > 0
    assert total_streamed == n_base + n_kept_probe


def test_bfs_layers_triangle_inequality(spark):
    rows = REGISTRY["graph_bfs_layers"].spark_fn(spark, SF_DIR).collect()
    dist = {r["node"]: r["dist"] for r in rows}
    assert sorted(set(dist.values()))[0] == 0
    assert sum(1 for d in dist.values() if d == 0) == 1  # single seed
    assert max(dist.values()) <= 3
    # every settled node at depth d>0 must have an in-neighbor at d-1
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.l_partkey") != F.col("b.l_partkey")))
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
        .collect()
    )
    in_nbrs = {}
    for e in edges:
        in_nbrs.setdefault(e["dst"], set()).add(e["src"])
    for node, d in dist.items():
        if d > 0:
            assert any(dist.get(p) == d - 1 for p in in_nbrs.get(node, ()))


def test_pq_codes_shape_and_residuals(spark):
    rows = REGISTRY["embedding_pq_codes"].spark_fn(spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_vecs = emb.count()
    assert len(rows) == n_vecs * 8
    for r in rows:
        assert 0 <= r["sub"] <= 7
        assert r["code"] % 50 == 0  # codes come from the centroid panel
        assert r["dist2"] >= 0.0
    # centroid panel members must encode themselves with zero residual
    self_rows = [r for r in rows if r["vec_id"] % 50 == 0]
    assert self_rows
    for r in self_rows:
        assert r["dist2"] == 0.0 and r["code"] == r["vec_id"]


def test_pq_adc_recall_discriminates(spark):
    rows = REGISTRY["ann_pq_adc_recall"].spark_fn(spark, SF_DIR).collect()
    assert rows
    vals = {r["recall_milli"] for r in rows}
    assert len(vals) > 1
    for r in rows:
        assert 0 <= r["n_hits"] <= 5
        assert r["recall_milli"] == (r["n_hits"] * 1000) // 5
