"""Property-based tests (SURVEY §5.4): operator invariants checked against
independent pure-Python oracles on hypothesis-generated inputs.

Spark jobs are slow per-example, so examples are small and capped; the
deadline is disabled (JVM warmup skews the first example).
"""

from __future__ import annotations

import datetime as dt
import re
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from amazon_sales_data_engineering_spark.operators.dedup import rank_dedup, shingles
from amazon_sales_data_engineering_spark.operators.sequences import dense_keys
from amazon_sales_data_engineering_spark.operators.setops import union_distinct
from amazon_sales_data_engineering_spark.operators.skew import salted_join

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_st = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 5), st.integers(0, 100)),
    min_size=1,
    max_size=30,
)


@SETTINGS
@given(rows=rows_st)
def test_rank_dedup_keep_ties_is_argmax_set(spark, rows):
    df = spark.createDataFrame(rows, "key int, ord int, payload int")
    got = Counter(
        (r.key, r.ord, r.payload)
        for r in rank_dedup(
            df, ["key"], [F.col("ord").desc()], keep_ties=True
        ).collect()
    )
    best = defaultdict(int)
    for k, o, _ in rows:
        best[k] = max(best[k], o)
    want = Counter((k, o, p) for k, o, p in rows if o == best[k])
    assert got == want


@SETTINGS
@given(rows=rows_st)
def test_rank_dedup_row_number_keeps_one_per_key(spark, rows):
    df = spark.createDataFrame(rows, "key int, ord int, payload int")
    out = rank_dedup(
        df, ["key"], [F.col("ord").desc(), F.col("payload")], keep_ties=False
    ).collect()
    assert len(out) == len({k for k, _, _ in rows})
    best = defaultdict(int)
    for k, o, _ in rows:
        best[k] = max(best[k], o)
    for r in out:
        assert r.ord == best[r.key]


@SETTINGS
@given(
    left=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 99)), max_size=25),
    right=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 99)), max_size=10),
    salt=st.integers(1, 5),
)
def test_salted_join_equals_plain(spark, left, right, salt):
    l = spark.createDataFrame(left or [(99, 0)], "k int, lv int")
    r = spark.createDataFrame(right or [(98, 0)], "k int, rv int")
    for how in ("inner", "left"):
        plain = Counter(tuple(x) for x in l.join(r, ["k"], how).collect())
        got = Counter(
            tuple(x)
            for x in salted_join(l, r, ["k"], how, salt=salt)
            .select("k", "lv", "rv")
            .collect()
        )
        assert got == plain, how


@SETTINGS
@given(
    frames=st.lists(
        st.lists(st.tuples(st.integers(0, 4), st.integers(0, 2)), max_size=10),
        min_size=1,
        max_size=3,
    )
)
def test_union_distinct_is_set_union(spark, frames):
    dfs = [
        spark.createDataFrame(rows or [(9, 9)], "a int, b int") for rows in frames
    ]
    got = {tuple(r) for r in union_distinct(*dfs).collect()}
    want = {tuple(t) for rows in frames for t in (rows or [(9, 9)])}
    assert got == want
    # deduplicating union: no multiset duplicates survive
    assert union_distinct(*dfs).count() == len(want)


@SETTINGS
@given(
    rows=st.lists(st.integers(0, 1000), min_size=1, max_size=40),
    start=st.integers(1, 50),
)
def test_dense_keys_contiguous_from_start(spark, rows, start):
    df = spark.createDataFrame([(v,) for v in rows], "v int")
    keyed = dense_keys(df, "pk", order_by=[F.col("v"), F.monotonically_increasing_id()], start=start)
    pks = sorted(r.pk for r in keyed.collect())
    assert pks == list(range(start, start + len(rows)))


TEXT = st.text(
    alphabet=" \t\nabcdef.,!0123456789", min_size=0, max_size=60
)


@SETTINGS
@given(texts=st.lists(TEXT, min_size=1, max_size=8))
def test_shingles_match_python_reference(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id int, text string")
    got = {(r.doc_id, r.shingle) for r in shingles(df, "text", "doc_id", k=3).collect()}
    want = set()
    for i, txt in enumerate(texts):
        toks = re.sub(r"\s+", " ", txt.lower()).strip().split(" ")
        if toks == [""]:
            toks = []
        for j in range(len(toks) - 2):
            want.add((i, " ".join(toks[j : j + 3])))
    assert got == want


def test_jaccard_cap_drops_hot_shingle_pairs(spark):
    """The stop-shingle cap restricts the universe consistently: pairs
    supported only by a viral shingle disappear; other pairs keep the
    Jaccard computed over the surviving shingles."""
    import pytest

    from amazon_sales_data_engineering_spark.operators.dedup import jaccard_pairs

    # docs 1..4 all share shingle "viral"; docs 1,2 additionally share x,y.
    rows = (
        [(i, "viral") for i in (1, 2, 3, 4)]
        + [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "z"), (4, "w")]
    )
    sh = spark.createDataFrame(rows, "doc_id int, shingle string")

    with pytest.raises(ValueError, match="max_shingle_freq"):
        jaccard_pairs(sh, "doc_id", threshold=0.0)

    # cap=3 kills "viral" (df=4): only (1,2) survives with J(x,y ; x,y)=1.
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(
            sh, "doc_id", threshold=0.01, max_shingle_freq=3
        ).collect()
    }
    assert capped == {(1, 2): 1.0}

    # A generous cap is a no-op: equals the exact all-pairs computation
    # (run through the candidates path, which needs no cap).
    all_pairs = spark.createDataFrame(
        [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b],
        "id_a int, id_b int",
    )
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(sh, "doc_id", threshold=0.01, candidates=all_pairs).collect()
    }
    generous = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(
            sh, "doc_id", threshold=0.01, max_shingle_freq=10**9
        ).collect()
    }
    assert generous == exact


def test_approx_sketch_bounds(spark):
    """The sketch query now EMITS its bounds proof (booleans the DuckDB
    oracle pins to TRUE); this twin re-derives the raw HLL++ estimate and
    approximate median independently and checks the same envelopes —
    HLL++ within 3*rsd of exact, approx median inside exact p25-p75 —
    so a bug in the query's own boolean plumbing can't self-certify."""
    from amazon_sales_data_engineering_spark.plans import REGISTRY

    from .conftest import SF_DIR

    gated = {
        r.event_type: r
        for r in REGISTRY["approx_distinct_sketch"].spark_fn(spark, SF_DIR).collect()
    }
    raw = {
        r.event_type: r
        for r in (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .groupBy("event_type")
            .agg(
                F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
                F.percentile_approx("value", 0.5, 10000).alias("approx_median"),
                F.count_distinct("user_id").alias("users"),
                F.expr("percentile(value, 0.25)").alias("p25"),
                F.expr("percentile(value, 0.75)").alias("p75"),
                F.count(F.lit(1)).alias("n"),
            )
        ).collect()
    }
    assert set(gated) == set(raw)
    for et, g in gated.items():
        r = raw[et]
        assert g.n_events == r.n
        # independent re-derivation of the gated booleans
        assert abs(r.approx_users - r.users) <= max(3, 0.06 * r.users)
        assert r.p25 <= r.approx_median <= r.p75
        # and the query's own flags agree
        assert g.hll_within_3rsd and g.median_in_iqr


def test_scd2_idempotent_and_noop(spark):
    """SCD2 invariants on a literal dim: (1) re-applying the same change
    set is a no-op (the new current row equals the change, so nothing
    differs); (2) a change equal to the current values does nothing;
    (3) exactly one current row per key afterwards."""
    from amazon_sales_data_engineering_spark.operators.merge import scd2_apply

    dim = spark.createDataFrame(
        [(1, "A", dt.date(2020, 1, 1), None, "Y"),
         (2, "B", dt.date(2020, 1, 1), None, "Y")],
        "k int, seg string, valid_from date, valid_to date, is_current string",
    )
    changes = spark.createDataFrame(
        [(1, "Z"), (2, "B"), (3, "C")], "k int, seg string"
    )
    once = scd2_apply(
        dim, changes, key="k", tracked=["seg"], eff_date="2020-06-01"
    )
    rows = sorted(tuple(r) for r in once.collect())
    assert rows == [
        (1, "A", dt.date(2020, 1, 1), dt.date(2020, 6, 1), "N"),  # closed
        (1, "Z", dt.date(2020, 6, 1), None, "Y"),                 # new version
        (2, "B", dt.date(2020, 1, 1), None, "Y"),                 # no-op change
        (3, "C", dt.date(2020, 6, 1), None, "Y"),                 # insert
    ]
    twice = scd2_apply(
        once, changes, key="k", tracked=["seg"], eff_date="2020-07-01"
    )
    assert sorted(tuple(r) for r in twice.collect()) == rows  # idempotent
    current = [r for r in rows if r[4] == "Y"]
    assert sorted(r[0] for r in current) == [1, 2, 3]  # one current per key


asof_left_st = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=15
)
asof_right_st = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 99)),
    min_size=1,
    max_size=15,
)


@SETTINGS
@given(left=asof_left_st, right=asof_right_st,
       direction=st.sampled_from(["backward", "forward", "nearest"]),
       tol=st.sampled_from([None, 0, 3, 10]))
def test_asof_join_matches_pandas_merge_asof(spark, left, right, direction, tol):
    """Differential oracle: our union+window as-of (all three directions,
    with and without tolerance) must agree with pandas merge_asof — a
    wholly independent single-node implementation (nearest tie-break:
    both prefer the backward match)."""
    import pandas as pd

    from amazon_sales_data_engineering_spark.operators.temporal import asof_join

    ldf = spark.createDataFrame(
        [(k, dt.date(2020, 1, 1) + dt.timedelta(days=d)) for k, d in left],
        "k int, t date",
    )
    # right times must be unique per key for a deterministic value oracle
    seen = set()
    rrows = []
    for k, d, v in right:
        if (k, d) not in seen:
            seen.add((k, d))
            rrows.append((k, dt.date(2020, 1, 1) + dt.timedelta(days=d), v))
    rdf = spark.createDataFrame(rrows, "k int, t date, v int")

    got = sorted(
        (r.k, r.t, r.v)
        for r in asof_join(
            ldf, rdf, "t", "t", by=["k"], right_cols=["v"],
            direction=direction, tolerance=tol,
        ).collect()
    )

    lp = pd.DataFrame(
        [(k, pd.Timestamp(2020, 1, 1) + pd.Timedelta(days=d)) for k, d in left],
        columns=["k", "t"],
    ).sort_values(["t", "k"], kind="stable")
    rp = pd.DataFrame(
        [(k, pd.Timestamp(t.year, t.month, t.day), v) for k, t, v in rrows],
        columns=["k", "t", "v"],
    ).sort_values(["t", "k"], kind="stable")
    merged = pd.merge_asof(
        lp, rp, on="t", by="k", direction=direction,
        tolerance=None if tol is None else pd.Timedelta(days=tol),
        allow_exact_matches=True,
    )
    want = sorted(
        (int(r.k), r.t.date(), None if pd.isna(r.v) else int(r.v))
        for r in merged.itertuples()
    )
    assert got == want


@SETTINGS
@given(
    intervals=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(1, 40)),
        min_size=1,
        max_size=25,
    )
)
def test_interval_union_matches_point_count(spark, intervals):
    """Union length per key == count of integer points covered by any
    interval (brute-force oracle over the small domain)."""
    from amazon_sales_data_engineering_spark.operators.temporal import (
        interval_union_length,
    )

    rows = [(k, s, s + d, i) for i, (k, s, d) in enumerate(intervals)]
    df = spark.createDataFrame(rows, "k int, s long, e long, rid int")
    got = {
        r.k: (r.covered_len, r.n_islands, r.n_intervals)
        for r in interval_union_length(
            df, by=["k"], start_col="s", end_col="e", order_tiebreak=["rid"]
        ).collect()
    }
    per_key: dict[int, set[int]] = defaultdict(set)
    n_per_key: dict[int, int] = defaultdict(int)
    for k, s, e, _ in rows:
        per_key[k].update(range(s, e))
        n_per_key[k] += 1
    for k, pts in per_key.items():
        covered, islands, n_iv = got[k]
        assert covered == len(pts)
        # islands = maximal runs of consecutive covered points
        want_islands = sum(
            1 for p in pts if p - 1 not in pts
        )
        assert islands == want_islands
        assert n_iv == n_per_key[k]


@SETTINGS
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=12).map(
            " ".join
        ),
        min_size=2,
        max_size=12,
    ),
    threshold_pct=st.sampled_from([30, 50, 70, 90]),
)
def test_prefix_filter_exact_recall(spark, docs, threshold_pct):
    """Prefix-filtered candidates must contain EVERY pair whose token-set
    Jaccard >= t (the pigeonhole exact-recall guarantee), for any corpus
    and threshold."""
    from amazon_sales_data_engineering_spark.operators.dedup import (
        prefix_filter_candidates,
    )

    rows = [(i, d) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tok = shingles(df, "text", "doc_id", k=1)
    cand = {
        (r.id_a, r.id_b)
        for r in prefix_filter_candidates(
            tok, "doc_id", threshold_pct=threshold_pct
        ).collect()
    }
    sets = {i: set(d.split()) for i, d in rows}
    t = threshold_pct / 100.0
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= t:
                assert (a, b) in cand, (a, b, inter / union, t)


@SETTINGS
@given(
    left=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 1), st.integers(0, 99)),
        min_size=0,
        max_size=20,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 1), st.integers(0, 99)),
        min_size=0,
        max_size=20,
    ),
)
def test_delta_join_equals_full_recompute(spark, left, right):
    """V_old ∪ ΔV == full A⋈B for ANY split of each side into old/delta
    (the incremental view-maintenance algebra), as a multiset."""
    from amazon_sales_data_engineering_spark.operators.delta import delta_join

    a = spark.createDataFrame(
        [(k, f, p) for k, f, p in left], "k int, is_new int, pa int"
    )
    b = spark.createDataFrame(
        [(k, f, p) for k, f, p in right], "k int, is_new int, pb int"
    )
    a_old = a.filter("is_new = 0").select("k", "pa")
    a_new = a.filter("is_new = 1").select("k", "pa")
    b_old = b.filter("is_new = 0").select("k", "pb")
    b_new = b.filter("is_new = 1").select("k", "pb")
    cols = ["k", "pa", "pb"]
    v_old = a_old.join(b_old, "k").select(*cols)
    dv = delta_join(a_old, a_new, b_old, b_new, on=["k"]).select(*cols)
    got = Counter(tuple(r) for r in v_old.unionByName(dv).collect())
    want = Counter(
        tuple(r)
        for r in a.select("k", "pa").join(b.select("k", "pb"), "k").collect()
    )
    assert got == want


edges_st = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=25,
)


@SETTINGS
@given(edges=edges_st)
def test_label_propagation_matches_python_reference(spark, edges):
    """Bounded-round synchronous LPA vs a brute-force Python oracle:
    most-frequent neighbor label, ties to the minimum label."""
    from amazon_sales_data_engineering_spark.operators.graph import (
        label_propagation_rounds,
    )

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    labels = {n: n for n in adj}
    for _ in range(2):
        labels = {
            n: min(
                Counter(labels[v] for v in adj[n]).most_common(),
                key=lambda kv: (-kv[1], kv[0]),
            )[0]
            for n in adj
        }

    df = spark.createDataFrame(edges, "src int, dst int")
    got = {
        r.node: r.label
        for r in label_propagation_rounds(df, n_rounds=2).collect()
    }
    assert got == labels


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 2), st.integers(0, 9)),
        min_size=1,
        max_size=30,
        unique_by=lambda r: r[0],
    ),
    window=st.integers(1, 4),
)
def test_sorted_neighborhood_matches_python_reference(spark, rows, window):
    """lead()-based SNM candidates vs brute force: within each block,
    every pair within `window` positions of the (key, id) sort order,
    exactly once, with the right gap."""
    from amazon_sales_data_engineering_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    blocks = defaultdict(list)
    for rid, blk, key in rows:
        blocks[blk].append((key, rid))
    want = set()
    for blk, members in blocks.items():
        members.sort()
        for i, (ka, ida) in enumerate(members):
            for j in range(i + 1, min(i + window + 1, len(members))):
                kb, idb = members[j]
                want.add((ida, idb, ka, kb, j - i))

    df = spark.createDataFrame(rows, "rid int, blk int, key int")
    got = {
        (r.id_a, r.id_b, r.key_a, r.key_b, r.pos_gap)
        for r in sorted_neighborhood_pairs(
            df, id_col="rid", sort_key="key", block_cols=["blk"], window=window
        ).collect()
    }
    assert got == want


@SETTINGS
@given(
    sizes=st.lists(st.integers(1, 50), min_size=1, max_size=25),
    target=st.integers(10, 120),
)
def test_compaction_plan_matches_sequential_first_fit(spark, sizes, target):
    """compaction_plan == the sequential one-pass plan: walk files in
    order, a file starting at running offset s joins bin s // target.
    Implies contiguity (bins are intervals of the file order) and the
    size bound (every bin except possibly the last closes at >= target
    only via the file that crosses the boundary)."""
    from amazon_sales_data_engineering_spark.operators.layout import (
        compaction_plan,
    )

    rows = [(i, sz) for i, sz in enumerate(sizes)]
    df = spark.createDataFrame(rows, "file_key bigint, n bigint")
    got = {
        r.file_key: r.bin
        for r in compaction_plan(df, "file_key", "n", target=target).collect()
    }
    run = 0
    want = {}
    for i, sz in rows:
        want[i] = run // target
        run += sz
    assert got == want
    # contiguity: bin ids are non-decreasing in file order
    assert all(want[i] <= want[i + 1] for i in range(len(rows) - 1))


edges_st = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7), st.integers(1, 9)),
    min_size=1,
    max_size=40,
)


@SETTINGS
@given(edges=edges_st, rounds=st.integers(1, 4))
def test_sssp_rounds_equals_bounded_bellman_ford(spark, edges, rounds):
    """Frontier relaxation == textbook full relaxation at every round
    bound (the claim the operator docstring makes)."""
    from amazon_sales_data_engineering_spark.operators.graph import sssp_rounds

    e = [(u, v, w) for u, v, w in edges if u != v]
    if not e:
        return
    df = spark.createDataFrame(e, "src bigint, dst bigint, w bigint")
    seed_node = min(u for u, _, _ in e)
    seeds = spark.createDataFrame([(seed_node,)], "node bigint")
    got = {r.node: r.dist for r in sssp_rounds(df, seeds, rounds).collect()}

    best = {(u, v): None for u, v, _ in e}
    for u, v, w in e:
        if best[(u, v)] is None or w < best[(u, v)]:
            best[(u, v)] = w
    dist = {seed_node: 0}
    for _ in range(rounds):
        nxt = dict(dist)
        for (u, v), w in best.items():
            if u in dist and (v not in nxt or dist[u] + w < nxt[v]):
                nxt[v] = dist[u] + w
        dist = nxt
    assert got == dist


@SETTINGS
@given(
    keys=st.lists(st.integers(1, 10**9), min_size=5, max_size=200, unique=True),
)
def test_cms_never_underestimates(spark, keys):
    """Count-min's one-sided guarantee: for EVERY key, estimate >= true
    count (collisions only add). Checked on the registry's exact grid
    parameters via a DuckDB-free pure-Python rebuild."""
    W, HASHES, BITS = 1024, (2654435761, 2246822519, 3266489917), 4092
    from collections import Counter

    true = Counter(keys)
    grid = Counter()
    for k in keys:
        for d, a in enumerate(HASHES):
            grid[(d, ((k % 2147483647) * a) % 2147483647 % BITS % W)] += 1
    for k, t_cnt in true.items():
        est = min(
            grid[(d, ((k % 2147483647) * a) % 2147483647 % BITS % W)]
            for d, a in enumerate(HASHES)
        )
        assert est >= t_cnt


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    """Registry Bloom semi-join invariants on real gate data: every true
    member passes (no false negatives — MIN over present bits), and the
    measured FP count stays under 5% of non-member probes (4092 bits /
    ~300 build keys / 3 hashes => theoretical FP ~ 1.1%)."""
    from amazon_sales_data_engineering_spark.plans import REGISTRY

    from .conftest import SF_DIR

    row = REGISTRY["bloom_filter_semijoin"].spark_fn(spark, SF_DIR).first()
    assert row.n_pass >= row.n_true_members  # no false negatives
    non_members = row.n_probes - row.n_true_members
    assert row.n_false_positives <= max(1, non_members // 20)


def test_hll_portable_error_band(spark):
    """Raw-HLL relative error with m=64 registers is ~1.04/sqrt(64) = 13%
    (1 sigma); assert every group lands within a generous 4-sigma band
    so the test is stable while still catching register corruption
    (a broken rank computation is off by orders of magnitude)."""
    from amazon_sales_data_engineering_spark.plans import REGISTRY

    from .conftest import SF_DIR

    rows = REGISTRY["hll_portable_distinct"].spark_fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert abs(r.hll_est - r.n_exact) <= max(4, int(0.52 * r.n_exact)), (
            r.event_type, r.n_exact, r.hll_est,
        )


def test_auto_lsh_bits_scales_with_corpus():
    """Gate contract + scale behavior of the LSH-bit auto-sizer: exactly
    the pinned base bits at every gate scale (sf0.01: 500 vectors,
    sf0.1: 2000 — the DuckDB oracles replay a 4-bit bucketing), then
    grows log2 with the corpus so expected in-bucket pair work stays
    ~target² per bucket instead of scaling quadratically with n."""
    from amazon_sales_data_engineering_spark.operators.similarity import (
        auto_lsh_bits,
    )

    # gate scales resolve to the oracle-pinned 4 bits
    assert auto_lsh_bits(500, 4, 125) == 4
    assert auto_lsh_bits(2000, 4, 125) == 4
    # 10x the bench corpus: 8 bits = 256 buckets, ~78 rows each
    assert auto_lsh_bits(20000, 4, 125) == 8
    # growth is logarithmic: another 10x adds ~3 bits
    assert auto_lsh_bits(200000, 4, 125) == 11
    # never shrinks below the recall floor
    assert auto_lsh_bits(10, 4, 125) == 4
    assert auto_lsh_bits(126, 4, 1) == 7


groups_st = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 6)),
    min_size=0,
    max_size=30,
)


@SETTINGS
@given(rows=groups_st)
def test_cooccurrence_pairs_matches_self_join(spark, rows):
    """The in-row pair builder must emit exactly the multiset of pairs
    the classic self-join produces — both orientations (ordered=False)
    and each-once (ordered=True) — since it now feeds LPA, modularity,
    SSSP, and personalized PageRank."""
    from amazon_sales_data_engineering_spark.operators.graph import (
        cooccurrence_pairs,
    )

    df = spark.createDataFrame(rows, "g int, item int")

    # Python reference over DISTINCT items per group (collect_set).
    from collections import defaultdict

    groups = defaultdict(set)
    for g, i in rows:
        groups[g].add(i)
    both, once = Counter(), Counter()
    for items in groups.values():
        for u in items:
            for v in items:
                if u != v:
                    both[(u, v)] += 1
                    if u < v:
                        once[(u, v)] += 1

    got_both = Counter(
        (r.src, r.dst)
        for r in cooccurrence_pairs(df, "g", "item", ordered=False).collect()
    )
    got_once = Counter(
        (r.src, r.dst)
        for r in cooccurrence_pairs(df, "g", "item", ordered=True).collect()
    )
    assert got_both == both
    assert got_once == once


def test_hits_rejects_zero_rounds(spark):
    """bipartite_hits_rounds(n_rounds=0) has no hub state to return;
    round-4 ADVICE: fail loudly instead of AttributeError on None."""
    import pytest as _pytest

    from amazon_sales_data_engineering_spark.operators.graph import (
        bipartite_hits_rounds,
    )

    e = spark.createDataFrame([(1, 10)], "src int, dst int")
    with _pytest.raises(ValueError, match="n_rounds >= 1"):
        bipartite_hits_rounds(e, n_rounds=0)


def test_ppr_keeps_isolated_seed(spark):
    """A seed with no incident edges must stay in the output with its
    teleport share (round-4 ADVICE: it previously vanished from the node
    set while still inflating n_seeds, silently losing restart mass)."""
    from amazon_sales_data_engineering_spark.operators.graph import (
        personalized_pagerank_rounds,
    )

    e = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src int, dst int")
    seeds = spark.createDataFrame([(1,), (99,)], "node int")  # 99 isolated
    out = personalized_pagerank_rounds(e, seeds, n_rounds=2)
    rows = {r.node: r for r in out.collect()}
    assert 99 in rows, "isolated seed dropped from PPR output"
    assert rows[99].is_seed
    # it holds exactly the per-round teleport share: (100-d)*scale/(100*2)
    assert rows[99].ppr_fixed == (15 * 10**15) // (100 * 2)


def test_copurchase_edges_cached_and_matches_selfjoin(spark):
    """The shared co-purchase edge table (plans/util.t_copurchase_edges):
    (a) second call returns the SAME materialized DataFrame (per-session
    cache — the round-4 verdict's amortization contract), and (b) the
    in-row k² construction equals the naive lineitem self-join as a
    multiset of (src, dst, min-weight) rows."""
    from .conftest import SF_DIR
    from amazon_sales_data_engineering_spark.plans.util import (
        t_copurchase_edges,
    )
    from amazon_sales_data_engineering_spark.tables import table

    e1 = t_copurchase_edges(spark, SF_DIR)
    assert t_copurchase_edges(spark, SF_DIR) is e1

    li = table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    a, b = li.alias("a"), li.alias("b")
    ref = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
            (F.lit(1) + F.least(F.col("a.l_quantity"), F.col("b.l_quantity")))
            .cast("bigint")
            .alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
    )
    got = {(r.src, r.dst, r.w) for r in e1.collect()}
    want = {(r.src, r.dst, r.w) for r in ref.collect()}
    assert got == want and len(got) > 0


cc_edges_st = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),  # self-loops allowed
    min_size=1,
    max_size=25,
)


@SETTINGS
@given(edges=cc_edges_st)
def test_connected_components_matches_union_find(spark, edges):
    """Pointer-doubling CC (with the round-5 fused 1-hop init and
    old-labels doubling lookup) vs a brute-force union-find oracle:
    component = min reachable node id, for every node in an edge."""
    from amazon_sales_data_engineering_spark.operators.graph import (
        connected_components,
    )

    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min = {}
    for n in parent:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    want = {n: comp_min[find(n)] for n in parent}

    df = spark.createDataFrame(edges, "id_a int, id_b int")
    got = {
        r.node: r.component
        for r in connected_components(df, "id_a", "id_b").collect()
    }
    assert got == want


pair_edges_st = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)),
    min_size=1,
    max_size=30,
)


@SETTINGS
@given(edges=pair_edges_st)
def test_triangle_count_matches_bruteforce(spark, edges):
    """Degree-oriented in-row triangle counting vs brute force over all
    node triples (each triangle found exactly once at its lowest-
    (deg, id) edge — the claim the orientation argument makes)."""
    from itertools import combinations

    from amazon_sales_data_engineering_spark.operators.graph import (
        triangle_count,
    )

    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    if not und:
        return
    nodes = {n for e in und for n in e}
    n_tri = sum(
        1
        for a, b, c in combinations(sorted(nodes), 3)
        if (a, b) in und and (a, c) in und and (b, c) in und
    )

    df = spark.createDataFrame(edges, "src int, dst int")
    row = triangle_count(df).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (
        len(nodes),
        len(und),
        n_tri,
    )


@SETTINGS
@given(edges=pair_edges_st, k=st.integers(1, 4), rounds=st.integers(1, 3))
def test_kcore_peel_matches_python(spark, edges, k, rounds):
    """Bounded-round peeling vs a literal Python replay: same surviving
    node set and residual degrees after every round count."""
    from amazon_sales_data_engineering_spark.operators.graph import kcore_peel

    cur = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    if not cur:
        return
    for _ in range(rounds):
        deg = Counter([u for u, _ in cur] + [v for _, v in cur])
        keep = {n for n, c in deg.items() if c >= k}
        cur = {(u, v) for u, v in cur if u in keep and v in keep}
    want = dict(Counter([u for u, _ in cur] + [v for _, v in cur]))

    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: r.deg for r in kcore_peel(df, k=k, rounds=rounds).collect()}
    assert got == want


@SETTINGS
@given(edges=pair_edges_st, rounds=st.integers(1, 3))
def test_pagerank_matches_python_fixed_point(spark, edges, rounds):
    """pagerank_rounds vs a bit-exact Python replica of the fixed-point
    recurrence (integer DIV, multi-edges counted as given) — the
    'bit-identical on any engine' claim, checked on pr_fixed."""
    from amazon_sales_data_engineering_spark.operators.graph import (
        pagerank_rounds,
    )

    e = [(a, b) for a, b in edges if True]  # operator takes rows as-is
    nodes = sorted({n for p in e for n in p})
    scale, d = 10**15, 85
    n = len(nodes)
    outdeg = Counter(a for a, _ in e)
    pr = {x: scale // n for x in nodes}
    teleport = (100 - d) * scale // (100 * n)
    for _ in range(rounds):
        s = Counter()
        for a, b in e:
            s[b] += pr[a] // outdeg[a]
        pr = {x: teleport + d * s.get(x, 0) // 100 for x in nodes}

    df = spark.createDataFrame(e, "src int, dst int")
    got = {
        r.node: r.pr_fixed for r in pagerank_rounds(df, n_rounds=rounds).collect()
    }
    assert got == pr


@SETTINGS
@given(edges=pair_edges_st, rounds=st.integers(1, 3))
def test_bipartite_hits_matches_python(spark, edges, rounds):
    """bipartite_hits_rounds vs a bit-exact Python replay of the
    mutual-reinforcement half-rounds with integer max-normalization."""
    from amazon_sales_data_engineering_spark.operators.graph import (
        bipartite_hits_rounds,
    )

    a_score = {p: 1000 for _, p in edges}
    h_score = {}
    for _ in range(rounds):
        hs = Counter()
        for c, p in edges:
            hs[c] += a_score[p]
        m = max(max(hs.values()), 1)
        h_score = {c: s * 1000 // m for c, s in hs.items()}
        as_ = Counter()
        for c, p in edges:
            as_[p] += h_score[c]
        m = max(max(as_.values()), 1)
        a_score = {p: s * 1000 // m for p, s in as_.items()}
    want = {("hub", c): s for c, s in h_score.items()}
    want.update({("authority", p): s for p, s in a_score.items()})

    df = spark.createDataFrame(edges, "src int, dst int")
    got = {
        (r.side, r.id): r.score_milli
        for r in bipartite_hits_rounds(df, n_rounds=rounds).collect()
    }
    assert got == want


@SETTINGS
@given(edges=pair_edges_st)
def test_edge_similarity_matches_bruteforce(spark, edges):
    """Per-edge common-neighbor count / neighborhood Jaccard vs brute
    force set intersection; the single division makes the double
    IEEE-identical, so floats compare exactly (0/0 edges -> NULL)."""
    from amazon_sales_data_engineering_spark.operators.graph import (
        edge_neighborhood_similarity,
    )

    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    if not und:
        return
    nbrs = defaultdict(set)
    for u, v in und:
        nbrs[u].add(v)
        nbrs[v].add(u)
    want = {}
    for u, v in und:
        common = len(nbrs[u] & nbrs[v])
        du, dv = len(nbrs[u]), len(nbrs[v])
        denom = du + dv - 2 - common
        want[(u, v)] = (common, du, dv, common / denom if denom > 0 else None)

    df = spark.createDataFrame(edges, "src int, dst int")
    got = {
        (r.u, r.v): (r.common, r.deg_u, r.deg_v, r.nb_jaccard)
        for r in edge_neighborhood_similarity(df).collect()
    }
    assert got == want


def _py_suffix(docs: list[tuple[int, str]], k: int = 4):
    """Independent Python implementation of suffix_dup_spans +
    suffix_apply_dedup on (id, text) rows; returns (spans, applied)."""
    import hashlib

    def norm(s):
        return re.sub(r"\s+", " ", s.lower()).strip()

    occ = defaultdict(list)
    words = {}
    for d, t in docs:
        ws = norm(t).split(" ") if norm(t) else []
        words[d] = ws
        for i in range(len(ws) - k + 1):
            h = hashlib.md5(" ".join(ws[i : i + k]).encode()).hexdigest()
            occ[h].append((d, i + 1))
    spans = set()
    dup_pos = defaultdict(list)
    removed = defaultdict(set)
    for h, lst in occ.items():
        if len(lst) < 2:
            continue
        first = min(lst)
        for d, p in lst:
            dup_pos[d].append(p)
            if (d, p) != first:
                removed[d].update(range(p, p + k))
    for d, ps in dup_pos.items():
        run = []
        for p in sorted(ps):
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    spans.add((d, run[0], run[-1] + k - 1, run[-1] + k - run[0], len(run)))
                run = [p]
        if run:
            spans.add((d, run[0], run[-1] + k - 1, run[-1] + k - run[0], len(run)))
    applied = {}
    for d, ws in words.items():
        if not ws:
            continue
        kept = [w for i, w in enumerate(ws, 1) if i not in removed[d]]
        if kept:
            applied[d] = (
                len(ws), len(kept), len(ws) - len(kept),
                hashlib.md5(" ".join(kept).encode()).hexdigest(),
            )
    return spans, applied


# Tiny vocabulary so duplicated windows arise naturally; k=4 keeps docs
# short enough for hypothesis while exercising island merges and the
# canonical-first tiebreak across docs.
docs_st = st.lists(
    st.lists(st.sampled_from(["a", "b"]), min_size=0, max_size=14).map(
        lambda ws: " ".join(ws)
    ),
    min_size=1,
    max_size=8,
).map(lambda texts: [(i, t) for i, t in enumerate(texts)])


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=docs_st)
def test_suffix_ops_match_python_oracle(spark, docs):
    from amazon_sales_data_engineering_spark.operators.dedup import (
        suffix_apply_dedup,
        suffix_dup_spans,
    )

    df = spark.createDataFrame(docs, "doc_id int, text string")
    want_spans, want_applied = _py_suffix(docs, k=4)
    got_spans = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_windows)
        for r in suffix_dup_spans(df, "text", "doc_id", k=4).collect()
    }
    assert got_spans == want_spans
    nonempty = df.filter(F.length(F.trim(F.col("text"))) > 0)
    got_applied = {
        r.doc_id: (r.n_tokens, r.n_kept, r.n_removed, r.kept_hash)
        for r in suffix_apply_dedup(nonempty, "text", "doc_id", k=4).collect()
    }
    assert got_applied == want_applied


vecs_st = st.lists(
    st.lists(st.integers(-4, 4).map(float), min_size=3, max_size=3),
    min_size=2,
    max_size=12,
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vecs=vecs_st)
def test_kcenter_trace_matches_python_oracle(spark, vecs):
    """Greedy farthest-point selection on random small-integer vectors
    (distances are exact in floats) vs an independent Python greedy."""
    from amazon_sales_data_engineering_spark.operators.similarity import (
        kcenter_trace,
    )

    k = min(4, len(vecs))
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    got = sorted(
        (r.round, r.center_id, r.radius)
        for r in kcenter_trace(df, "vec_id", "embedding", k=k).collect()
    )
    d = [sum((a - b) ** 2 for a, b in zip(v, vecs[0])) for v in vecs]
    want = [(1, 0, 0.0)]
    for rnd in range(2, k + 1):
        best = max(range(len(vecs)), key=lambda i: (d[i], -i))
        want.append((rnd, best, d[best]))
        d = [
            min(d[i], sum((a - b) ** 2 for a, b in zip(vecs[i], vecs[best])))
            for i in range(len(vecs))
        ]
    assert got == want


# ---- splittable JSON: random documents x random split sizes ----------

_json_chars = st.sampled_from(list('"\\{}[]\n\t ,:abxé漢😀0'))
_elem_st = st.fixed_dictionaries(
    {
        "a": st.one_of(
            st.none(), st.text(alphabet=_json_chars, max_size=16)
        ),
        "b": st.integers(-(10**6), 10**6),
    }
)


@SETTINGS
@given(
    elems=st.lists(_elem_st, max_size=12),
    split_bytes=st.integers(1, 64),
    indent=st.sampled_from([None, 1]),
    ensure_ascii=st.booleans(),
)
def test_splittable_json_matches_json_loads(
    spark, elems, split_bytes, indent, ensure_ascii
):
    """read_json_splittable over ARBITRARY array-of-objects files —
    quote/backslash/brace/newline/unicode soup, compact or
    pretty-printed, raw UTF-8 or \\u-escaped — must reproduce exactly
    the elements json.loads sees, at every split size (1-byte splits
    put a chunk boundary inside every escape sequence)."""
    import json as _json
    import os as _os
    import tempfile as _tempfile

    from pyspark.sql import types as T

    from amazon_sales_data_engineering_spark.sources.splittable_json import (
        read_json_splittable,
    )

    body = _json.dumps(elems, indent=indent, ensure_ascii=ensure_ascii)
    fd, path = _tempfile.mkstemp(suffix=".json")
    try:
        with _os.fdopen(fd, "w", encoding="utf-8") as fh:
            fh.write(body)
        schema = T.StructType(
            [
                T.StructField("a", T.StringType()),
                T.StructField("b", T.LongType()),
            ]
        )
        got = sorted(
            ((r["a"], r["b"]) for r in read_json_splittable(
                spark, path, schema, split_bytes=split_bytes
            ).collect()),
            key=lambda t: tuple((v is None, v) for v in t),
        )
        want = sorted(
            ((e["a"], e["b"]) for e in elems),
            key=lambda t: tuple((v is None, v) for v in t),
        )
        assert got == want
    finally:
        _os.unlink(path)


# Latin-1-representable text WITHOUT native mojibake lead chars (the
# _MARKER_CHARS set: 'Â'/'Ã' 2-byte leads, 'â' 3-byte lead, 'ð' 4-byte
# lead) — the repair contract's stated domain: for any such string,
# corrupting through the exact UTF-8-bytes-read-as-Latin-1 transform and
# repairing must round-trip to the original. Native lead chars are
# excluded because repair there is inherently ambiguous (a real 'â'
# followed by two continuation-range chars IS byte-identical to
# mojibake — ftfy has the same ambiguity and resolves it by heuristic).
_MOJI_ALPHABET = st.characters(
    codec="latin-1", exclude_characters="ÂÃâð"
)


@SETTINGS
@given(texts=st.lists(st.text(_MOJI_ALPHABET, max_size=40), min_size=1, max_size=8))
def test_mojibake_repair_round_trips(spark, texts):
    from amazon_sales_data_engineering_spark.functions.text import (
        repair_mojibake,
    )

    corrupted = [t.encode("utf-8").decode("iso-8859-1") for t in texts]
    df = spark.createDataFrame(
        list(enumerate(corrupted)), "id bigint, t string"
    )
    got = {r.id: r.f for r in df.select("id", repair_mojibake("t").alias("f")).collect()}
    assert got == dict(enumerate(texts))


def _corrupt_cp1252(t: str) -> str:
    """UTF-8 bytes read by a LENIENT cp1252 decoder (undefined bytes
    0x81/0x8D/0x8F/0x90/0x9D fall back to the C1 control, as real-world
    decoders do)."""
    out = []
    for b in t.encode("utf-8"):
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))
    return "".join(out)


_MOJI_PROFILES = {
    "latin1": lambda t: t.encode("utf-8").decode("iso-8859-1"),
    "cp1252": _corrupt_cp1252,
    "latin1x2": lambda t: _MOJI_PROFILES["latin1"](_MOJI_PROFILES["latin1"](t)),
    "cp1252x2": lambda t: _corrupt_cp1252(_corrupt_cp1252(t)),
    "cross": lambda t: _MOJI_PROFILES["latin1"](_corrupt_cp1252(t)),
}


@SETTINGS
@given(
    texts=st.lists(st.text(_MOJI_ALPHABET, max_size=40), min_size=1, max_size=6),
    profile=st.sampled_from(sorted(_MOJI_PROFILES)),
)
def test_mojibake_repair_round_trips_deep(spark, texts, profile):
    """Round-11: the repair covers the cp1252 profile ('’' -> 'â€™')
    and DOUBLE-encoded text ('é' -> 'ÃƒÂ©') via ≤2-pass fixed point —
    every profile must round-trip over the same contract domain."""
    from amazon_sales_data_engineering_spark.functions.text import (
        repair_mojibake,
    )

    corrupt = _MOJI_PROFILES[profile]
    corrupted = [corrupt(t) for t in texts]
    df = spark.createDataFrame(
        list(enumerate(corrupted)), "id bigint, t string"
    )
    got = {r.id: r.f for r in df.select("id", repair_mojibake("t").alias("f")).collect()}
    assert got == dict(enumerate(texts))


# rank_dedup_maxjoin identity domain: few fat partition keys (the shape
# the operator targets), small order values (heavy TIES), both nullable.
_maxjoin_rows_st = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 2)),    # partition key
        st.one_of(st.none(), st.integers(0, 3)),    # order value
        st.integers(0, 10**6),                       # payload
    ),
    min_size=1,
    max_size=40,
)


@SETTINGS
@given(rows=_maxjoin_rows_st, desc=st.booleans())
def test_rank_dedup_maxjoin_row_identity(spark, rows, desc):
    """Round-10 verdict #1: the window-free groupBy-max + broadcast-join
    formulation must be ROW-IDENTICAL (multiset) to
    rank_dedup(keep_ties=True) for both sort directions, including the
    null-ordering edges (desc = NULLS LAST: all-null partitions tie at
    rank 1; asc = NULLS FIRST: any null row outranks every value)."""
    from amazon_sales_data_engineering_spark.operators.dedup import (
        rank_dedup,
        rank_dedup_maxjoin,
    )

    df = spark.createDataFrame(rows, "k int, v int, payload bigint")
    order = [F.col("v").desc()] if desc else [F.col("v").asc()]
    want = rank_dedup(df, ["k"], order, keep_ties=True)
    got = rank_dedup_maxjoin(df, ["k"], "v", desc=desc)

    def key(r):
        return (
            r["k"] is None, r["k"] or 0,
            r["v"] is None, r["v"] or 0,
            r["payload"],
        )

    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))
