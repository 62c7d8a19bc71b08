"""Scale-path operators: salted join semantics + bucketed co-located joins.

The salted join must be row-identical to the plain join (salting is a
physical rewrite only); the bucketed join must eliminate the shuffle
entirely (no Exchange in the executed plan) — that's its whole point.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from amazon_sales_data_engineering_spark.operators.skew import (
    salted_join,
    write_bucketed,
)
from amazon_sales_data_engineering_spark.tables import table

from .conftest import SF_DIR


def _multiset(df):
    return Counter(tuple(r) for r in df.collect())


def test_salted_inner_join_matches_plain(spark):
    li = table(spark, SF_DIR, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"), "l_extendedprice"
    )
    o = table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("orderkey"), "o_orderpriority"
    )
    plain = li.join(o, ["orderkey"], "inner")
    salted = salted_join(li, o, ["orderkey"], "inner", salt=8)
    assert sorted(plain.columns) == sorted(salted.columns)
    assert _multiset(plain) == _multiset(salted.select(*plain.columns))


def test_salted_left_join_keeps_unmatched(spark):
    li = table(spark, SF_DIR, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"), "l_extendedprice"
    )
    # drop half the orders so some lineitems have no match
    o = (
        table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderkey") % 2 == 0)
        .select(F.col("o_orderkey").alias("orderkey"), "o_orderpriority")
    )
    plain = li.join(o, ["orderkey"], "left")
    salted = salted_join(li, o, ["orderkey"], "left", salt=8)
    assert _multiset(plain) == _multiset(salted.select(*plain.columns))


def test_bucketed_join_has_no_exchange(spark):
    li = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_extendedprice")
    o = table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(o, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    # force the sort-merge path: broadcasting would bypass buckets entirely
    # (at real scale neither side fits the broadcast threshold anyway)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # sanity: result is the real join
        n = joined.count()
        assert n == li.join(o, li.l_orderkey == o.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_partitioned_sink_prunes_at_plan_time(spark):
    """A filter on the partition column must become a PartitionFilter
    (directory pruning), not a post-scan predicate."""
    from amazon_sales_data_engineering_spark.sources.sinks import (
        save_table_partitioned,
    )

    li = table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_returnflag"
    )
    save_table_partitioned(li, "p_lineitem", ["l_returnflag"], mode="overwrite")
    try:
        q = spark.table("p_lineitem").filter(F.col("l_returnflag") == "R")
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(l_returnflag" in plan or (
            "PartitionFilters: [" in plan and "l_returnflag" in plan.split("PartitionFilters:")[1].split("]")[0]
        ), plan
        assert q.count() == li.filter(F.col("l_returnflag") == "R").count()
    finally:
        spark.sql("DROP TABLE IF EXISTS p_lineitem")


def test_salted_exact_dedup_matches_unsalted_on_zipf(spark):
    """salted_exact_dedup == unsalted groupBy + plain join on a corpus
    where one fingerprint holds half the rows (the viral-duplicate
    shape it exists for)."""
    from amazon_sales_data_engineering_spark.operators.dedup import (
        exact_dedup_groups,
        salted_exact_dedup,
    )

    docs = spark.createDataFrame(
        [
            (i, "viral boilerplate" if i % 2 == 0 else f"unique text {i}")
            for i in range(400)
        ],
        "doc_id bigint, text string",
    )
    got = sorted(
        (r.doc_id, r.fingerprint, r.keep_id, r.n_docs, r.is_keeper)
        for r in salted_exact_dedup(docs, "text", "doc_id", salt=8).collect()
    )
    stats = exact_dedup_groups(docs, "text", "doc_id")
    want = sorted(
        (r.doc_id, r.fingerprint, r.keep_id, r.n_docs, r.doc_id == r.keep_id)
        for r in docs.select(
            F.md5(
                F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
            ).alias("fingerprint"),
            "doc_id",
        )
        .join(stats, "fingerprint")
        .collect()
    )
    assert got == want
    hot = [r for r in got if r[3] == 200]
    assert len(hot) == 200  # the viral cluster really is half the corpus


def test_salted_exact_dedup_plan_is_two_phase(spark):
    """Plan-shape guard (round-6 verdict #8): the aggregate must run in
    two phases — an exchange on (fingerprint, __agg_salt) feeding the
    partials, then an exchange on fingerprint alone for the merge — and
    the join-back must carry skew.SALT_COL in its keys (the salted
    join, not a plain hot-key join)."""
    from amazon_sales_data_engineering_spark.operators.dedup import (
        salted_exact_dedup,
    )

    docs = spark.createDataFrame(
        [(i, f"t {i % 3}") for i in range(100)], "doc_id bigint, text string"
    )
    plan = (
        salted_exact_dedup(docs, "text", "doc_id", salt=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "__agg_salt" in plan  # phase-1 salted grouping survived
    # phase-2 merge groups on fingerprint WITHOUT the salt
    import re

    partials = re.findall(r"keys=\[([^\]]*)\]", plan)
    assert any("__agg_salt" in k and "fingerprint" in k for k in partials)
    assert any("fingerprint" in k and "__agg_salt" not in k for k in partials)
    assert "__salt" in plan  # the join-back went through salted_join


def test_band_index_bucketed_join_has_no_exchange(spark):
    """The maintained band index's co-location claim: both band tables
    bucketed by band_key -> the delta-vs-corpus candidate join is a
    SortMergeJoin with NO Exchange on either side (the corpus shuffle
    was paid once at write time)."""
    from amazon_sales_data_engineering_spark.plans import REGISTRY
    from .conftest import SF_DIR

    # at test scale the tables fit the auto-broadcast threshold, which
    # would sidestep bucketing entirely; disable it to expose the plan
    # the 100 TB case gets (neither side broadcastable there)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = REGISTRY["dedup_index_bucketed_bands"].spark_fn(spark, SF_DIR)
        # guard the JOIN stage, not the trailing distinct (which must
        # exchange on (id_new, id_other) by definition)
        plan = df._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("HashAggregate")[-1]  # below distinct aggs
        assert "SortMergeJoin" in join_part
        assert "Exchange" not in join_part, join_part[:2000]
        assert "Bucketed: true" in join_part, join_part[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_compacted_ivf_scan_prunes_partitions_dynamically(spark, tmp_path):
    """The compacted IVF generation is written PARTITIONED BY
    centroid_id so a probe's nprobe lists prune at the SCAN: the list
    scan must carry a dynamicpruning PartitionFilter on centroid_id
    (fed by the broadcast probe-list side). Without it, every query
    reads every inverted list — the difference between touching nprobe
    directories and the whole corpus at 100 TB."""
    from amazon_sales_data_engineering_spark.operators.ann_index import IVFIndex

    vecs = spark.createDataFrame(
        [
            (i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(4)])
            for i in range(64)
        ],
        "vec_id bigint, embedding array<float>",
    )
    idx = IVFIndex(str(tmp_path / "ivf")).create(
        vecs.filter("vec_id % 8 = 0"), "vec_id", "embedding"
    )
    for b in range(2):
        idx.apply_batch(
            spark, vecs.filter(f"vec_id % 2 = {b}"), "vec_id", "embedding"
        )
    comp = idx.compact_to(spark, str(tmp_path / "ivf_c"))
    tk = comp.topk(
        spark, vecs.filter("vec_id % 16 = 0"), "vec_id", "embedding",
        k=3, nprobe=2,
    )
    plan = tk._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "dynamicpruningexpression(cast(centroid_id" in plan, plan[:4000]
    # and the result over the pruned scan is still the full answer
    assert tk.count() > 0


def test_partitioned_appends_prune_before_compaction(spark, tmp_path):
    """Round-9 verdict #7: ``apply_batch(partitioned=True)`` writes each
    ingest batch hive-partitioned by centroid_id, so a probe against N
    appended, NEVER-compacted batches still prunes at the scan (DPP on
    every batch dir) — closing the read-amplification window between
    compactions. Answer equality with flat appends is also asserted."""
    from amazon_sales_data_engineering_spark.operators.ann_index import IVFIndex

    vecs = spark.createDataFrame(
        [
            (i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(4)])
            for i in range(64)
        ],
        "vec_id bigint, embedding array<float>",
    )
    cent = vecs.filter("vec_id % 8 = 0")
    idx = IVFIndex(str(tmp_path / "ivf_p")).create(
        cent, "vec_id", "embedding"
    )
    flat = IVFIndex(str(tmp_path / "ivf_f")).create(
        cent, "vec_id", "embedding"
    )
    for b in range(3):
        idx.apply_batch(
            spark, vecs.filter(f"vec_id % 3 = {b}"), "vec_id", "embedding",
            partitioned=True,
        )
        flat.apply_batch(
            spark, vecs.filter(f"vec_id % 3 = {b}"), "vec_id", "embedding"
        )
    probes = vecs.filter("vec_id % 16 = 0")
    tk = idx.topk(spark, probes, "vec_id", "embedding", k=3, nprobe=2)
    plan = tk._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "dynamicpruningexpression(cast(centroid_id" in plan, plan[:4000]
    got = sorted(
        (r.probe_id, r.neighbor_id, r.rank) for r in tk.collect()
    )
    ref = sorted(
        (r.probe_id, r.neighbor_id, r.rank)
        for r in flat.topk(
            spark, probes, "vec_id", "embedding", k=3, nprobe=2
        ).collect()
    )
    assert got == ref and len(got) > 0
    # the physical layout really is one directory per touched list
    import glob as _glob

    assert _glob.glob(
        str(tmp_path / "ivf_p" / "assignments" / "batch_00000" /
            "centroid_id=*")
    )


def test_rank_maxjoin_plan_is_window_free_broadcast(spark):
    """Plan-shape guard (round-10 verdict #1): the skew-proof W1 dedup
    must contain NO Window node (a fat partition would serialize onto
    one task — AQE cannot split a window partition) and must join the
    per-partition maxima back via BROADCAST, so the fact side never
    shuffles on the skewed key. Also re-proves row identity vs the
    faithful window form on real data."""
    from amazon_sales_data_engineering_spark.operators.dedup import (
        rank_dedup,
        rank_dedup_maxjoin,
    )
    from amazon_sales_data_engineering_spark.plans import REGISTRY

    df = REGISTRY["dedup_rank_maxjoin_skew"].spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan[:3000]
    assert "BroadcastHashJoin" in plan, plan[:3000]
    # the fact scan reaches the join without a hash-partition exchange
    # (the only exchanges allowed feed the tiny aggregate + broadcast)
    li = table(spark, SF_DIR, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.when(F.col("l_orderkey") % 2 == 0, F.lit("1995-06-17").cast("date"))
        .otherwise(F.col("l_shipdate").cast("date"))
        .alias("ship_dt"),
    )
    want = rank_dedup(
        li, ["ship_dt"], [F.col("l_quantity").desc()], keep_ties=True
    )
    got = rank_dedup_maxjoin(li, ["ship_dt"], "l_quantity", desc=True)
    assert _multiset(got.select(*want.columns)) == _multiset(want)
