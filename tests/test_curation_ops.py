"""Behavioral pins for the round-6 curation ops: bit-exact Python/numpy
replicas + structural invariants, beyond the registry's DuckDB
differential gate (which compares engine-vs-oracle, not engine-vs-spec).
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

import duckdb
import numpy as np

from amazon_sales_data_engineering_spark.plans import REGISTRY

from .conftest import SF_DIR


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.lower()).strip()


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, source, lang, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()


def _vecs():
    return duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()


def test_suffix_spans_match_python_replica(spark):
    """Maximal duplicated-span extraction == windows-with-count>=2 merged
    into islands, computed independently in Python."""
    k = 8
    windows = defaultdict(list)  # (doc_id) -> positions of dup windows
    counts = Counter()
    per_doc = {}
    for doc_id, _src, _lang, text in _docs():
        ws = _norm(text).split(" ") if _norm(text) else []
        hs = []
        for i in range(len(ws) - k + 1):
            h = hashlib.md5(" ".join(ws[i : i + k]).encode()).hexdigest()
            hs.append(h)
            counts[h] += 1
        per_doc[doc_id] = hs
    want = set()
    for doc_id, hs in per_doc.items():
        dup_pos = [i + 1 for i, h in enumerate(hs) if counts[h] >= 2]
        run = []
        for p in dup_pos:
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    want.add(
                        (doc_id, run[0], run[-1] + 7, run[-1] + 8 - run[0], len(run))
                    )
                run = [p]
        if run:
            want.add((doc_id, run[0], run[-1] + 7, run[-1] + 8 - run[0], len(run)))
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_windows)
        for r in REGISTRY["dedup_suffix_spans"].spark_fn(spark, SF_DIR).collect()
    }
    assert got == want
    assert want, "fixture must exercise at least one duplicated span"


def test_epoch_plan_greedy_optimal(spark):
    rows = REGISTRY["corpus_epoch_plan"].spark_fn(spark, SF_DIR).collect()
    assert rows
    budget = rows[0].budget_tokens
    total = sum(r.tokens for r in rows)
    assert budget == (5 * total) // 2
    spent = sum(r.tokens * r.epochs for r in rows)
    assert spent <= budget
    for r in rows:
        assert 0 <= r.epochs <= 4
        # effective value = tokens * (8 + 4 + 2 + ...) for the epochs taken
        weights = [8, 4, 2, 1][: r.epochs]
        assert r.effective_x8 == r.tokens * sum(weights)
    # greedy optimality: replay the global marginal-ordered prefix in Python
    steps = sorted(
        (
            (-r.tokens * (1 << (4 - e)), r.source, e, r.tokens)
            for r in rows
            for e in (1, 2, 3, 4)
        )
    )
    cum, want = 0, Counter()
    for _neg, src, _e, tok in steps:
        cum += tok
        if cum <= budget:
            want[src] += 1
    got = {r.source: r.epochs for r in rows}
    assert got == {r.source: want.get(r.source, 0) for r in rows}


def test_quality_classifier_matches_python_replica(spark):
    pos_sources = {"src0", "src1", "src2", "src3"}
    docs = [
        (d, s, _norm(t).split(" "))
        for d, s, _l, t in _docs()
        if _norm(t)
    ]
    cp, cn = Counter(), Counter()
    for _d, src, ws in docs:
        (cp if src in pos_sources else cn).update(ws)
    vocab = set(cp) | set(cn)
    tp, tn, v = sum(cp.values()), sum(cn.values()), len(vocab)
    wt = {
        w: (1_000_000 * (cp[w] + 1) * (tn + v)) // ((cn[w] + 1) * (tp + v))
        for w in vocab
    }
    want = {}
    scores = {}
    for d, src, ws in docs:
        k = Counter(ws)
        score = sum(c * wt[w] for w, c in k.items())
        top = min(k, key=lambda w: (-wt[w], w))
        want[d] = (src, len(ws), score, top)
        scores[d] = score
    nd, ts = len(scores), sum(scores.values())
    got = REGISTRY["quality_classifier_logodds"].spark_fn(spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r in got:
        src, n_tokens, score, top = want[r.doc_id]
        assert (r.source, r.n_tokens, r.score, r.top_token) == (
            src, n_tokens, score, top,
        )
        assert r.above_mean == (score * nd >= ts)
    assert any(r.above_mean for r in got) and not all(r.above_mean for r in got)


def test_decontaminate_embedding_matches_numpy_replica(spark):
    vecs = {vid: np.array(e, dtype=np.float64) for vid, e in _vecs()}
    buckets = defaultdict(lambda: ([], []))  # bucket -> (train ids, eval ids)
    for vid, e in vecs.items():
        b = sum((1 << j) for j in range(8) if e[j] >= 0)
        buckets[b][1 if vid % 50 == 0 else 0].append(vid)
    want = {}
    for b, (train, evals) in buckets.items():
        for t_ in train:
            best = None
            for ev in sorted(evals):
                a, c = vecs[t_], vecs[ev]
                cos = float(a @ c) / (np.sqrt(a @ a) * np.sqrt(c @ c))
                if cos >= 0.2 and (best is None or cos > best[1]):
                    best = (ev, cos)
            if best:
                want[t_] = best[0]
    got = {
        r.vec_id: r.eval_id
        for r in REGISTRY["decontaminate_embedding"].spark_fn(spark, SF_DIR).collect()
    }
    assert got == want
    assert all(e % 50 == 0 for e in got.values())
    assert all(t_ % 50 != 0 for t_ in got)


def test_kcenter_coreset_matches_numpy_replica(spark):
    ids = [vid for vid, _ in _vecs()]
    X = np.array([e for _, e in _vecs()], dtype=np.float64)
    centers = [0]  # index of min vec_id (rows sorted by vec_id)
    d = ((X - X[0]) ** 2).sum(axis=1)
    want = [(1, ids[0], 0.0)]
    for r in range(2, 9):
        # argmax with vec_id tiebreak (ids sorted ascending, so first argmax)
        i = int(np.argmax(d))
        want.append((r, ids[i], float(d[i])))
        centers.append(i)
        d = np.minimum(d, ((X - X[i]) ** 2).sum(axis=1))
    got = sorted(
        (r.round, r.center_id, r.radius)
        for r in REGISTRY["sample_kcenter_coreset"].spark_fn(spark, SF_DIR).collect()
    )
    assert [(r, c) for r, c, _ in got] == [(r, c) for r, c, _ in want]
    # radii agree to float tolerance (numpy sums in a different order than
    # the engines' sequential fold — the ENGINE sides are pinned bit-exact
    # by the DuckDB oracle; numpy is a semantic check only)
    for (_, _, a), (_, _, b) in zip(got, want):
        assert abs(a - b) <= 1e-9 * max(1.0, abs(b))


def test_l_diversity_flags_are_consistent(spark):
    rows = REGISTRY["privacy_l_diversity"].spark_fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.l_distinct <= min(r.n, 5)  # 5 priority values exist
        assert r.violates_l3 == (r.l_distinct < 3)


def test_unigram_viterbi_matches_python_replica(spark):
    wc = Counter()
    for _d, _s, _l, t_ in _docs():
        n = _norm(t_)
        if n:
            wc.update(w for w in n.split(" ") if len(w) <= 12)
    pc = Counter()
    for w, c in wc.items():
        for i in range(len(w)):
            for j in range(1, 5):
                if i + j <= len(w):
                    pc[w[i : i + j]] += c
    total = sum(pc.values())
    keep = {p: c for p, c in pc.items() if len(p) == 1 or c * 1000 >= total}
    want = {}
    for w, c in wc.items():
        dp = [(0, 0)] + [None] * len(w)  # (n_pieces, -score)
        for i in range(1, len(w) + 1):
            cands = []
            for j in range(1, min(4, i) + 1):
                piece = w[i - j : i]
                if piece in keep:
                    np_, nsc = dp[i - j]
                    cands.append((np_ + 1, nsc - keep[piece]))
            dp[i] = min(cands)
        want[w] = (c, dp[len(w)][0], -dp[len(w)][1])
    got = {
        r.word: (r.cnt, r.n_pieces, r.piece_score)
        for r in REGISTRY["tokenizer_unigram_viterbi"].spark_fn(spark, SF_DIR).collect()
    }
    assert got == want
    # the DP must genuinely beat single-char segmentation somewhere
    assert any(np_ < len(w) for w, (_c, np_, _s) in want.items() if len(w) > 1)


def test_streaming_cms_heavy_hitters_one_sided(spark):
    """CMS guarantee: stream-built registers never undercount, and the
    top keys' estimates are exact unless a hash collision adds mass."""
    rows = REGISTRY["streaming_cms_heavy_hitters"].spark_fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.cms_est >= r.true_cnt
        assert r.overestimate == r.cms_est - r.true_cnt


def test_suffix_apply_matches_python_replica(spark):
    """ExactSubstr apply: delete every token covered by a non-canonical
    duplicated-window occurrence, reassemble, compare counts + md5."""
    k = 8
    occ = defaultdict(list)  # h -> [(doc_id, pos)]
    words = {}
    for doc_id, _s, _l, text in _docs():
        n = _norm(text)
        if not n:
            continue
        ws = n.split(" ")
        words[doc_id] = ws
        for i in range(len(ws) - k + 1):
            h = hashlib.md5(" ".join(ws[i : i + k]).encode()).hexdigest()
            occ[h].append((doc_id, i + 1))
    removed = defaultdict(set)
    for h, lst in occ.items():
        if len(lst) < 2:
            continue
        first = min(lst)
        for d, p in lst:
            if (d, p) != first:
                removed[d].update(range(p, p + k))
    want = {}
    for d, ws in words.items():
        kept = [w for i, w in enumerate(ws, 1) if i not in removed[d]]
        if kept:
            want[d] = (
                len(ws), len(kept), len(ws) - len(kept),
                hashlib.md5(" ".join(kept).encode()).hexdigest(),
            )
    got = {
        r.doc_id: (r.n_tokens, r.n_kept, r.n_removed, r.kept_hash)
        for r in REGISTRY["dedup_suffix_apply"].spark_fn(spark, SF_DIR).collect()
    }
    assert got == want
    assert any(v[2] > 0 for v in want.values()), "fixture must remove something"


def test_phash_dedup_groups_cover_all_docs(spark):
    """dHash dedup must partition the corpus: group sizes sum to the doc
    count, keepers are members of their group, and the stubbed decode
    yields ~50 distinct images (doc_id % 50 keying)."""
    rows = REGISTRY["multimodal_phash_dedup"].spark_fn(spark, SF_DIR).collect()
    n_docs = len(_docs())
    assert sum(r.n_docs for r in rows) == n_docs
    assert len(rows) <= 50
    assert all(r.n_docs >= 1 for r in rows)
    # hashes are two 32-bit words
    assert all(0 <= r.h0 < 2**32 and 0 <= r.h1 < 2**32 for r in rows)


def test_kmv_exact_in_small_regime(spark):
    """Sets smaller than k=64 are counted exactly (their KMV list IS the
    set), so at the test scale every estimate with a small exact side
    must reproduce DuckDB's exact distinct counts."""
    rows = REGISTRY["kmv_set_intersection"].spark_fn(spark, SF_DIR).collect()
    assert rows
    exact = dict(
        duckdb.sql(
            f"SELECT event_type, count(DISTINCT user_id) "
            f"FROM '{SF_DIR}/events.parquet' GROUP BY 1"
        ).fetchall()
    )
    for r in rows:
        assert r.est_inter >= 0
        assert r.exact_inter >= 0
        if exact[r.type_a] < 64:
            assert r.est_a == exact[r.type_a]
        if exact[r.type_b] < 64:
            assert r.est_b == exact[r.type_b]
        if exact[r.type_a] < 64 and exact[r.type_b] < 64 and r.est_union < 64:
            # both lists exhaustive -> union exact -> inclusion-exclusion exact
            assert r.est_inter == r.exact_inter


def test_dp_noisy_counts_mechanism_properties(spark):
    """Noise is bounded by the truncated support, zero-clamped, and the
    threshold table is a valid inverse CDF (checked against a fresh
    float computation of the epsilon=1 discrete Laplace)."""
    import math

    rows = REGISTRY["privacy_dp_noisy_counts"].spark_fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert -8 <= r.z <= 8
        assert r.noisy_n == max(r.n + r.z, 0)
        assert r.epsilon_milli == 1000
    # table re-derivation (independent of the embedded literal)
    from amazon_sales_data_engineering_spark.plans.quality_ops import (
        _DP_THRESHOLDS,
    )

    a = math.exp(-1.0)
    probs = [(1 - a) / (1 + a) * a ** abs(zz) for zz in range(-8, 9)]
    tot = sum(probs)
    acc, want = 0.0, []
    for p in probs[:-1]:
        acc += p / tot
        want.append(int(acc * (1 << 32)))
    assert want == _DP_THRESHOLDS


def test_coreset_coverage_dominates_hash_baseline(spark):
    """k-center's covering-radius guarantee: at every threshold its
    coverage must be >= the hash-picked baseline's (ties allowed at the
    saturated ends)."""
    rows = REGISTRY["sample_coreset_coverage_eval"].spark_fn(spark, SF_DIR).collect()
    by = {(r.method, r.thr): r for r in rows}
    thrs = sorted({r.thr for r in rows})
    assert len(thrs) == 4 and len(rows) == 8
    for t_ in thrs:
        kc, h8 = by[("kcenter", t_)], by[("hash8", t_)]
        assert kc.n_total == h8.n_total
        assert kc.n_covered >= h8.n_covered
        assert kc.covered_ppm == kc.n_covered * 1_000_000 // kc.n_total


def test_shard_manifest_matches_python_merkle(spark):
    """Two-level Merkle manifest == a straightforward Python rebuild,
    and any single-doc perturbation would flip its shard digest (checked
    by recomputing with one fingerprint changed)."""
    rows = sorted(_docs())
    shards = defaultdict(list)  # shard -> [(doc_id, fp, n_tokens)]
    for doc_id, _s, _l, text in rows:
        n = _norm(text)
        fp = hashlib.md5(n.encode()).hexdigest()
        ntok = 0 if not n else n.count(" ") + 1
        sh = ((doc_id % 2147483648) * 2654435761) % 16
        shards[sh].append((doc_id, fp, ntok))
    want = {}
    for sh, items in shards.items():
        items.sort()
        block_digests = []
        for b in range(0, len(items), 1024):
            blk = items[b : b + 1024]
            block_digests.append(
                hashlib.md5("".join(fp for _d, fp, _n in blk).encode()).hexdigest()
            )
        want[sh] = (
            len(items),
            sum(n for _d, _f, n in items),
            items[0][0],
            items[-1][0],
            hashlib.md5("".join(block_digests).encode()).hexdigest(),
        )
    got = {
        r.shard_id: (r.n_docs, r.n_tokens, r.min_doc_id, r.max_doc_id, r.manifest_md5)
        for r in REGISTRY["export_shard_manifest"].spark_fn(spark, SF_DIR).collect()
    }
    assert got == want
    # sensitivity: flipping one fingerprint changes that shard's digest
    sh0 = next(iter(shards))
    items = shards[sh0]
    items[0] = (items[0][0], "0" * 32, items[0][2])
    perturbed = hashlib.md5(
        "".join(
            hashlib.md5("".join(fp for _d, fp, _n in items[b : b + 1024]).encode()).hexdigest()
            for b in range(0, len(items), 1024)
        ).encode()
    ).hexdigest()
    assert perturbed != want[sh0][4]


def test_suffix_apply_empty_doc_vanishes(spark):
    """ADVICE r6: a doc whose normalized text is empty must vanish from
    suffix_apply_dedup's output (not report a phantom n_tokens=1 with
    kept_hash=md5('')) — the public operator is safe without any
    plan-level length>0 pre-filter."""
    from amazon_sales_data_engineering_spark.operators.dedup import (
        suffix_apply_dedup,
        suffix_dup_spans,
    )

    df = spark.createDataFrame(
        [
            ("d1", "   \t  \n "),  # normalizes to empty
            ("d2", ""),
            ("d3", "a b c d e f g h a b c d e f g h x"),
        ],
        "id string, text string",
    )
    out = suffix_apply_dedup(df, "text", "id", k=8).collect()
    ids = {r.id for r in out}
    assert "d1" not in ids and "d2" not in ids
    d3 = next(r for r in out if r.id == "d3")
    assert d3.n_tokens == 17 and d3.n_removed > 0
    spans = suffix_dup_spans(df, "text", "id", k=8).collect()
    assert {r.id for r in spans} == {"d3"}


def test_copy_on_write_ops_reject_live_root(tmp_path):
    """Round-8 ADVICE: compact_to/requantize with new_root == root would
    destroy the live index (requantize rmtree's the root before the lazy
    read of the OLD lists executes). Must raise ValueError up front —
    pure path check, no Spark work. Relative-path aliasing of the same
    dir must also be caught (abspath comparison)."""
    import pytest

    from amazon_sales_data_engineering_spark.operators.ann_index import (
        IVFIndex,
    )
    from amazon_sales_data_engineering_spark.operators.dedup_index import (
        MinHashDedupIndex,
    )

    root = str(tmp_path / "idx")
    alias = str(tmp_path / "sub" / ".." / "idx")
    for fn in (
        lambda r: MinHashDedupIndex(root).compact_to(None, r),
        lambda r: IVFIndex(root).compact_to(None, r),
        lambda r: IVFIndex(root).requantize(None, None, r, "id", "vec"),
    ):
        with pytest.raises(ValueError, match="fresh root"):
            fn(root)
        with pytest.raises(ValueError, match="fresh root"):
            fn(alias)


def test_missing_success_marker_fails_fast(tmp_path):
    """Round-8 ADVICE: a write that produced no _SUCCESS marker (e.g.
    marksuccessfuljobs=false) must raise at WRITE time, not silently
    drop the batch from every subsequent read."""
    import pytest

    from amazon_sales_data_engineering_spark.operators.dedup_index import (
        _assert_job_committed,
    )

    d = tmp_path / "batch_00000"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"x")
    with pytest.raises(RuntimeError, match="marksuccessfuljobs"):
        _assert_job_committed(str(d))
    (d / "_SUCCESS").write_bytes(b"")
    _assert_job_committed(str(d))  # marker present -> no raise


def test_dedup_index_compaction_reduces_files_same_answer(spark, tmp_path):
    """compact_to merges N batch dirs into one generation with fewer
    files, and a subsequent delta finds EXACTLY the pairs the
    uncompacted index finds."""
    import glob as _glob

    from amazon_sales_data_engineering_spark.operators.dedup_index import (
        MinHashDedupIndex,
    )

    docs = [
        (i, f"one two three four five six seven doc{i % 5} tail{i % 5}")
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    idx = MinHashDedupIndex(str(tmp_path / "a"))
    for b in range(3):
        idx.apply_batch(
            spark, df.filter(f"doc_id % 4 = {b}"), "text", "doc_id"
        )
    compacted = idx.compact_to(spark, str(tmp_path / "b"), target_files=1)
    assert compacted.n_batches() == 1
    n_files = lambda r: len(
        _glob.glob(f"{r}/summaries/batch_*/*.parquet")
        + _glob.glob(f"{r}/bands/batch_*/*.parquet")
    )
    assert n_files(tmp_path / "b") < n_files(tmp_path / "a")
    assert compacted.n_indexed(spark) == idx.n_indexed(spark)

    delta = df.filter("doc_id % 4 = 3")
    want = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in idx.apply_batch(spark, delta, "text", "doc_id").collect()
    )
    got = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in compacted.apply_batch(spark, delta, "text", "doc_id").collect()
    )
    assert got == want and len(got) > 0


def test_winnow_fingerprints_match_python_replica(spark):
    """Winnowing selection (k=4-gram md5, w=5 window, min hash with
    RIGHTMOST tie-break) replicated independently in Python — pins the
    position rule the pair gate can't see, plus the short-doc single
    window and sub-k vanishing edges."""
    from amazon_sales_data_engineering_spark.operators.dedup import (
        winnow_fingerprints,
    )

    k, w = 4, 5
    docs = [
        (1, "a b c d e f g h i j k l"),
        (2, "x x x x x x x x"),  # all-equal hashes: rightmost min wins
        (3, "p q r s t"),  # fewer than w hashes: one short window
        (4, "one two three"),  # < k words: no fingerprints
        (5, ""),
    ]
    want = set()
    for did, text in docs:
        ws = _norm(text).split(" ") if _norm(text) else []
        if len(ws) < k:
            continue
        hs = [
            hashlib.md5(" ".join(ws[i : i + k]).encode()).hexdigest()
            for i in range(len(ws) - k + 1)
        ]
        n_win = max(len(hs) - (w - 1), 1)
        for s in range(n_win):
            sl = hs[s : s + w]
            mn = min(sl)
            pos = s + max(i for i, h in enumerate(sl) if h == mn) + 1
            want.add((did, pos, mn))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        (r.doc_id, r.pos, r.h)
        for r in winnow_fingerprints(df, "text", "doc_id", k=k, w=w).collect()
    }
    assert got == want
    assert not any(d == 4 or d == 5 for d, _p, _h in got)
    # doc 2: every window min is the (identical) hash, rightmost pos
    d2 = sorted(p for d, p, _h in got if d == 2)
    assert d2 == [5]  # 5 equal hashes -> ONE window, rightmost pos 5


def test_cdc_chunking_is_insertion_robust(spark):
    """The CDC property fixed-size chunking lacks: inserting words at
    the FRONT of a document must leave every chunk after the edited
    neighborhood hash-identical (boundaries depend only on local
    content, never position)."""
    from amazon_sales_data_engineering_spark.operators.dedup import (
        cdc_segments,
    )

    base = " ".join(f"tok{i}" for i in range(200))
    edited = "inserted words at the front " + base
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id bigint, text string"
    )
    segs = cdc_segments(df, "text", "doc_id").collect()
    h1 = {r.seg_hash for r in segs if r.doc_id == 1}
    h2 = {r.seg_hash for r in segs if r.doc_id == 2}
    shared = h1 & h2
    # everything except the edited first chunk(s) must coincide
    assert len(shared) >= len(h1) - 2 and len(shared) > 5
    # counterfactual: a FIXED-size chunker (every 8 words) shares NO
    # chunk — the 5 inserted words shift every fixed boundary
    assert not (
        {" ".join(base.split()[i : i + 8]) for i in range(0, 193, 8)}
        & {" ".join(edited.split()[i : i + 8]) for i in range(0, 198, 8)}
    )


def test_index_tombstone_delete_and_physical_reclaim(spark, tmp_path):
    """Tombstone lifecycle on the maintained dedup index: delete() hides
    a doc immediately (no later delta pairs with it), is idempotent,
    and compact_to drops the rows PHYSICALLY — the compacted summary
    files no longer contain the doc_id and the new generation starts
    tombstone-free (right-to-be-forgotten reclaim)."""
    from amazon_sales_data_engineering_spark.operators.dedup_index import (
        MinHashDedupIndex,
    )

    docs = [
        (i, f"one two three four five six seven doc{i % 5} tail{i % 5}")
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    idx = MinHashDedupIndex(str(tmp_path / "a"))
    for b in range(3):
        idx.apply_batch(spark, df.filter(f"doc_id % 4 = {b}"), "text", "doc_id")
    n_before = idx.n_indexed(spark)

    # doc 3 (in the %4==3 delta) near-dups docs 8, 13, 18, ... (%5==3);
    # delete two of its indexed partners
    idx.delete(spark, [8, 13])
    idx.delete(spark, [8, 13])  # idempotent: same key set, new batch
    assert idx.n_indexed(spark) == n_before - 2

    pairs = idx.apply_batch(
        spark, df.filter("doc_id % 4 = 3"), "text", "doc_id"
    ).collect()
    touched = {r.id_a for r in pairs} | {r.id_b for r in pairs}
    assert touched, "delta should still find pairs among survivors"
    assert not touched & {8, 13}, "tombstoned docs leaked into pairs"

    compacted = idx.compact_to(spark, str(tmp_path / "b"))
    live = {
        r.doc_id
        for r in spark.read.parquet(
            str(tmp_path / "b" / "summaries" / "batch_00000")
        ).collect()
    }
    assert 8 not in live and 13 not in live
    assert not compacted._tomb_dirs()
    assert compacted.n_indexed(spark) == idx.n_indexed(spark)


def test_index_commit_marker_ignores_partial_dirs(spark, tmp_path):
    """The crash window the round-7 ADVICE flagged: Spark creates the
    output dir at job START, so a crash mid-write leaves a dir with no
    _SUCCESS. Both maintained indexes must treat such an epoch as
    UNCOMMITTED (not counted, completed()==False, retry overwrites)."""
    import os as _os

    from amazon_sales_data_engineering_spark.operators.ann_index import IVFIndex
    from amazon_sales_data_engineering_spark.operators.dedup_index import (
        MinHashDedupIndex,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i % 3} tail{i % 3}") for i in range(12)],
        "doc_id bigint, text string",
    )
    idx = MinHashDedupIndex(str(tmp_path / "d"))
    idx.apply_batch(spark, docs, "text", "doc_id", seq=0)
    # simulate a crashed epoch 1: full data files, commit marker missing
    idx.apply_batch(spark, docs.limit(0), "text", "doc_id", seq=1)
    _os.remove(str(tmp_path / "d" / "summaries" / "batch_00001" / "_SUCCESS"))
    assert idx.n_batches() == 1
    assert idx.completed(0) and not idx.completed(1)
    assert idx._dirs("bands") == [str(tmp_path / "d" / "bands" / "batch_00000")]

    vecs = spark.createDataFrame(
        [(i, [float(i % 4), 1.0, float(i)]) for i in range(12)],
        "vec_id bigint, embedding array<float>",
    )
    ivf = IVFIndex(str(tmp_path / "v")).create(
        vecs.filter("vec_id < 2"), "vec_id", "embedding"
    )
    ivf.apply_batch(spark, vecs, "vec_id", "embedding", seq=0)
    ivf.apply_batch(spark, vecs.limit(0), "vec_id", "embedding", seq=1)
    _os.remove(
        str(tmp_path / "v" / "assignments" / "batch_00001" / "_SUCCESS")
    )
    assert ivf.n_batches() == 1
    assert ivf.completed(0) and not ivf.completed(1)
    # the uncommitted epoch's rows are invisible to queries
    assert ivf._read_lists(spark).count() == 12
    # retry overwrites the partial epoch and commits it
    ivf.apply_batch(spark, vecs, "vec_id", "embedding", seq=1)
    assert ivf.n_batches() == 2 and ivf.completed(1)


def test_ivf_drift_skew_monitor_and_requantize_restores(spark, tmp_path):
    """list_stats is the drift signal and requantize the recovery. The
    monitor number is the EXPECTED PROBE-CANDIDATE COUNT E = sum(s_i^2)
    / sum(s_i) — what a nprobe=1 query actually scans on average (a
    max/mean skew ratio is misleading: adding centroids shrinks the
    mean, masking a still-fat list). A distribution-shifted second
    batch (a direction the quantizer has no centroid for) piles onto
    one list and E jumps; re-quantizing under centroids drawn from the
    NEW corpus restores it. Total live rows conserved throughout."""
    from amazon_sales_data_engineering_spark.operators.ann_index import IVFIndex

    dim = 8

    def onehot(j, jitter):
        return [
            1.0 + jitter if i == j else (jitter if i == j + 1 else 0.0)
            for i in range(dim)
        ]

    base = [(i, onehot(i % dim, 0.01 * (i // dim))) for i in range(64)]
    # drifted arrivals: a NEW direction (all-ones) none of the one-hot
    # centroids covers — the old quantizer dumps every one of them onto
    # a single tie-broken list
    drift = [
        (1000 + i, [1.0 + 0.001 * i] + [1.0] * (dim - 1)) for i in range(64)
    ]
    schema = "vec_id bigint, embedding array<double>"
    base_df = spark.createDataFrame(base, schema)
    drift_df = spark.createDataFrame(drift, schema)

    def probe_cost(stats):
        sizes = [r.list_size for r in stats.collect()]
        return sum(s * s for s in sizes) / sum(sizes), sum(sizes)

    idx = IVFIndex(str(tmp_path / "i")).create(
        base_df.filter(f"vec_id < {dim}"), "vec_id", "embedding"
    )
    idx.apply_batch(spark, base_df, "vec_id", "embedding")
    e_base, n_base = probe_cost(idx.list_stats(spark))
    idx.apply_batch(spark, drift_df, "vec_id", "embedding")
    e_drift, n_drift = probe_cost(idx.list_stats(spark))
    assert n_drift == n_base + 64
    assert e_drift > 2 * e_base, (
        f"drift not visible: E {e_base:.1f} -> {e_drift:.1f}"
    )

    # recovery: new quantizer sampled from the CURRENT corpus — the 8
    # base directions plus one centroid inside the drifted cluster
    new_cent = base_df.filter(f"vec_id < {dim}").unionByName(
        drift_df.filter("vec_id = 1000")
    )
    req = idx.requantize(
        spark, new_cent, str(tmp_path / "r"), "vec_id", "embedding"
    )
    e_req, n_req = probe_cost(req.list_stats(spark))
    assert n_req == n_drift
    assert e_req < 0.9 * e_drift, (
        f"requantize did not rebalance: E {e_drift:.1f} -> {e_req:.1f}"
    )


def test_char_suffix_catches_mid_token_duplication(spark):
    """Round-9 verdict #7: the CHARACTER-granularity ExactSubstr profile
    must catch a seeded duplicated run that does not align with token
    boundaries and is shorter than the token profile's 8-token minimum
    — invisible to dedup_suffix_spans, found by the chars variant."""
    from amazon_sales_data_engineering_spark.operators.dedup import (
        suffix_apply_dedup_chars,
        suffix_dup_spans,
        suffix_dup_spans_chars,
    )

    # a 30-char run duplicated mid-sentence across two docs; only ~5
    # tokens long, so the k=8-token profile sees nothing
    dup_run = "xqzjvkwpmh rlatbcnd efgsouyi t"
    assert len(dup_run) == 30
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {dup_run} gamma delta epsilon"),
            (2, f"omega {dup_run} psi chi phi upsilon"),
            (3, "entirely unrelated text with no repeats at all here"),
        ],
        "id bigint, text string",
    )
    tok = suffix_dup_spans(docs, "text", "id", k=8).collect()
    assert tok == []  # token profile: no 8-token duplicate exists

    ch = {r.id: r for r in suffix_dup_spans_chars(docs, "text", "id", k=24).collect()}
    assert set(ch) == {1, 2}
    # the MAXIMAL duplicated run also absorbs shared context: "beta "
    # and "omega " both end in "a ", so the common substring is
    # "a " + dup_run + " " = 33 chars — starting at 1-based pos 10 in
    # doc 1 (inside the token "beta"!) and pos 5 in doc 2
    assert (ch[1].span_start, ch[1].span_chars) == (10, 33)
    assert (ch[2].span_start, ch[2].span_chars) == (5, 33)

    out = {
        r.id: r
        for r in suffix_apply_dedup_chars(docs, "text", "id", k=24).collect()
    }
    # canonical first occurrence (doc 1, the min (id, pos)) keeps all
    # characters; doc 2 loses exactly the 33-char maximal run (deletion
    # starts and ends MID-TOKEN); doc 3 untouched
    assert out[1].n_removed == 0
    assert out[2].n_removed == 33
    assert out[3].n_removed == 0
    assert out[2].n_kept == out[2].n_chars - 33


def test_mojibake_repair_guards_and_idempotence(spark):
    """repair_mojibake must (1) fix real UTF-8-as-Latin-1 artifacts,
    (2) leave clean text and ALREADY-correct accents untouched, (3)
    refuse a false-positive marker whose round-trip is invalid UTF-8
    (the U+FFFD guard), and (4) be idempotent."""
    from amazon_sales_data_engineering_spark.functions.text import (
        mojibake_markers,
        repair_mojibake,
    )

    rows = [
        (1, "cafÃ© au lait Â½"),   # real mojibake -> repaired
        (2, "plain ascii text"),   # untouched
        (3, "café déjà vu"),       # correct accents -> untouched
        (4, "Ãz lone lead byte"),  # invalid round-trip -> untouched
        # marker + non-Latin-1 char (round-10 review: Spark 4's encode
        # THROWS on unmappable chars; mixed content must pass through,
        # not crash the job)
        (5, "cafÃ© emoji \U0001f60a"),
        (6, "cafÃ© dash — ok"),
    ]
    df = spark.createDataFrame(rows, "id bigint, t string")
    out = {
        r.id: r
        for r in df.select(
            "id",
            mojibake_markers("t").alias("m"),
            repair_mojibake("t").alias("f"),
        ).collect()
    }
    assert out[1].f == "café au lait ½" and out[1].m == 2
    assert out[2].f == "plain ascii text" and out[2].m == 0
    assert out[3].f == "café déjà vu" and out[3].m == 0
    assert out[4].f == "Ãz lone lead byte" and out[4].m == 1
    assert out[5].f == "cafÃ© emoji \U0001f60a" and out[5].m == 1
    assert out[6].f == "cafÃ© dash — ok" and out[6].m == 1

    # idempotence: a second pass over the repaired column changes nothing
    fixed = df.select("id", repair_mojibake("t").alias("t"))
    again = {
        r.id: r.f
        for r in fixed.select("id", repair_mojibake("t").alias("f")).collect()
    }
    assert again == {i: out[i].f for i in (1, 2, 3, 4, 5, 6)}


def test_mojibake_query_is_pure_map(spark):
    """The registered repair query must stay a zero-shuffle codegen map
    — encode/decode are Catalyst expressions, never UDFs."""
    from .conftest import SF_DIR

    from amazon_sales_data_engineering_spark.plans import REGISTRY

    df = REGISTRY["text_mojibake_repair"].spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the only exchange is t_cpu's deliberate round-robin fan-out of the
    # single-split table; the op itself adds no keyed shuffle
    assert "hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
