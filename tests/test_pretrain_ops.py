"""Behavioral pins for the pre-training curation ops (pretrain_ops):
bit-exact Python replicas + structural invariants, beyond the registry's
DuckDB differential gate.
"""

from __future__ import annotations

import re
from collections import Counter

import duckdb
import pytest

from pyspark.sql import functions as F

from amazon_sales_data_engineering_spark.plans import REGISTRY

from .conftest import SF_DIR

SEP = "\x1f"


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.lower()).strip()


def _python_bpe(word_counts: Counter, rounds: int):
    """Pure-Python BPE trainer: greedy left-to-right non-overlapping merge
    of the most frequent pair, ties (count desc, lhs asc, rhs asc)."""
    state = {w: tuple(list(w) + ["$"]) for w in word_counts}
    merges = []
    for r in range(1, rounds + 1):
        pc = Counter()
        for w, toks in state.items():
            cnt = word_counts[w]
            for a, b in zip(toks, toks[1:]):
                pc[(a, b)] += cnt
        (lhs, rhs), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, lhs, rhs, c))
        new_state = {}
        for w, toks in state.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == lhs and toks[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new_state[w] = tuple(out)
        state = new_state
    return merges, state


def test_bpe_train_matches_python_reference(spark):
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    ]
    wc = Counter()
    for t in texts:
        n = _norm(t)
        if n:
            wc.update(n.split(" "))
    want, _ = _python_bpe(wc, 6)
    got = sorted(
        (r.round, r.lhs, r.rhs, r.pair_cnt)
        for r in REGISTRY["bpe_train_merges"].spark_fn(spark, SF_DIR).collect()
    )
    assert got == want


def test_bpe_encode_fertility_matches_python_reference(spark):
    docs = duckdb.sql(
        f"SELECT doc_id, lang, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    wc = Counter()
    normed = []
    for doc_id, lang, t in docs:
        n = _norm(t)
        if n:
            ws = n.split(" ")
            wc.update(ws)
            normed.append((doc_id, lang, ws))
    _, state = _python_bpe(wc, 6)
    want = {}
    for doc_id, lang, ws in normed:
        n_tokens = sum(len(state[w]) for w in ws)
        want[doc_id] = (
            lang, len(ws), n_tokens, n_tokens * 1_000_000 // len(ws)
        )
    got = {
        r.doc_id: (r.lang, r.n_words, r.n_tokens, r.fertility_ppm)
        for r in REGISTRY["bpe_encode_fertility"]
        .spark_fn(spark, SF_DIR)
        .collect()
    }
    assert got == want


def test_bpe_wrapped_replace_is_greedy_left_to_right(spark):
    # The unit-separator-wrapped string replace must reproduce the greedy
    # fold on the overlap cases ('aaa' -> [aa, a], 'aaaa' -> [aa, aa]) —
    # the encoding property the whole operator rests on.
    df = spark.createDataFrame([("aaa",), ("aaaa",), ("aba",)], ["w"])
    wrapped = F.concat(
        F.lit(SEP),
        F.array_join(F.split("w", ""), SEP + SEP),
        F.lit(SEP),
    )
    merged = F.replace(
        wrapped,
        F.lit(SEP + "a" + SEP + SEP + "a" + SEP),
        F.lit(SEP + "aa" + SEP),
    )
    toks = F.split(F.expr("substring(m, 2, length(m) - 2)"), SEP + SEP)
    rows = {
        r.w: r.t
        for r in df.select("w", merged.alias("m"))
        .select("w", toks.alias("t"))
        .collect()
    }
    assert rows["aaa"] == ["aa", "a"]
    assert rows["aaaa"] == ["aa", "aa"]
    assert rows["aba"] == ["a", "b", "a"]


def test_semdedup_invariants(spark):
    rows = REGISTRY["semdedup_prune"].spark_fn(spark, SF_DIR).collect()
    n = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/embeddings.parquet'"
    ).fetchone()[0]
    assert len(rows) == n  # every vector classified exactly once
    assert len({r.vec_id for r in rows}) == n
    cluster = {r.vec_id: r.cid for r in rows}
    for r in rows:
        assert r.keep == (r.dup_of is None)
        if r.dup_of is not None:
            assert r.dup_of < r.vec_id  # keeper is the earliest id
            assert cluster[r.dup_of] == r.cid  # pruning is intra-cluster


def test_dsir_invariants(spark):
    rows = REGISTRY["dsir_importance_ppm"].spark_fn(spark, SF_DIR).collect()
    assert rows and all(r.lang != "en" for r in rows)  # pool excludes target
    assert all(0 <= r.accept_ppm <= 1_000_000 for r in rows)
    top = max(rows, key=lambda r: (r.score, -r.doc_id))
    assert top.accept_ppm == 1_000_000  # max-weight doc always accepted
    assert top.selected


def test_ccnet_terciles_partition_each_language(spark):
    rows = REGISTRY["ccnet_perplexity_buckets"].spark_fn(
        spark, SF_DIR
    ).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        sizes = Counter(r.bucket for r in rs)
        assert set(sizes) <= {"head", "middle", "tail"}
        if len(rs) >= 3:
            assert max(sizes.values()) - min(sizes.values()) <= 1
            # score ordering across buckets (non-strict under ties)
            assert min(r.score_ppm for r in rs if r.bucket == "head") >= max(
                r.score_ppm for r in rs if r.bucket == "middle"
            )
            assert min(r.score_ppm for r in rs if r.bucket == "middle") >= max(
                r.score_ppm for r in rs if r.bucket == "tail"
            )


def test_brier_reliability_matches_bruteforce(spark):
    """Rank-normalization + binning replicated in Python from the
    classifier's own (gate-pinned) output — independent of the nested
    DuckDB oracle."""
    cls = (
        REGISTRY["quality_classifier_logodds"]
        .spark_fn(spark, SF_DIR)
        .select("doc_id", "source", "score")
        .collect()
    )
    nd = len(cls)
    scores = sorted(r.score for r in cls)
    import bisect

    bins = {b: [0, 0, 0, 0] for b in range(10)}  # n, pos, sum_p, brier_e12
    for r in cls:
        cum = bisect.bisect_right(scores, r.score)
        p_ppm = 1000000 * cum // nd
        y = 1 if r.source in ("src0", "src1", "src2", "src3") else 0
        b = min(p_ppm // 100000, 9)
        bins[b][0] += 1
        bins[b][1] += y
        bins[b][2] += p_ppm
        bins[b][3] += (p_ppm - y * 1000000) ** 2
    rows = (
        REGISTRY["quality_brier_reliability"]
        .spark_fn(spark, SF_DIR)
        .orderBy("bin")
        .collect()
    )
    assert [r.bin for r in rows] == list(range(10))
    for r in rows:
        n, pos, sum_p, brier = bins[r.bin]
        assert (r.n_docs, r.n_pos) == (n, pos), r.bin
        if n:
            assert r.mean_p == float(sum_p) / n / 1000000.0
            assert r.mean_y == float(pos) / n
            assert r.brier == float(brier) / n / 1e12
        else:
            assert r.mean_p is None and r.brier is None


def test_ece_matches_composed_bins(spark):
    bins = (
        REGISTRY["quality_brier_reliability"]
        .spark_fn(spark, SF_DIR)
        .orderBy("bin")
        .collect()
    )
    live = [r for r in bins if r.n_docs > 0]
    n = sum(r.n_docs for r in live)
    ece = 0.0
    for r in live:  # fold in bin order, matching the op
        ece += r.n_docs / n * abs(r.mean_p - r.mean_y)
    mce = max(abs(r.mean_p - r.mean_y) for r in live)
    row = REGISTRY["quality_ece_eval"].spark_fn(spark, SF_DIR).collect()[0]
    assert row["n"] == n
    assert abs(row["ece"] - ece) < 1e-12
    assert row["mce"] == mce


def test_avg_precision_matches_bruteforce(spark):
    import pyarrow.parquet as pq

    docs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["n_chars", "lang"]
    ).to_pandas()
    pairs = sorted(
        zip(docs.n_chars.astype(int), (docs.lang == "en").astype(int)),
        key=lambda t: -t[0],
    )
    S = 100_000_000_000
    ap_num = cum_c = cum_p = 0
    n_pos = sum(p for _, p in pairs)
    i = 0
    while i < len(pairs):
        j = i
        p_v = 0
        while j < len(pairs) and pairs[j][0] == pairs[i][0]:
            p_v += pairs[j][1]
            j += 1
        cum_c += j - i
        cum_p += p_v
        ap_num += p_v * ((cum_p * S) // cum_c)  # truncated, per the op
        i = j
    r = REGISTRY["score_avg_precision"].spark_fn(spark, SF_DIR).collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (n_pos, len(pairs) - n_pos)
    assert r["ap_num"] == ap_num
    assert r["avg_precision"] == ap_num / n_pos / S


def test_feature_hash_audit_matches_bruteforce(spark):
    import hashlib

    import pyarrow.parquet as pq

    docs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["text"]
    ).to_pandas()
    tf = Counter()
    for text in docs.text:
        for w in _norm(text).split(" "):
            if w:
                tf[w] += 1
    loads, mass = Counter(), Counter()
    for term, c in tf.items():
        b = int(hashlib.md5(term.encode()).hexdigest()[:4], 16)
        loads[b] += 1
        mass[b] += c
    coll_terms = sum(l for l in loads.values() if l >= 2)
    coll_tf = sum(mass[b] for b, l in loads.items() if l >= 2)
    r = (
        REGISTRY["feature_hash_collision_audit"]
        .spark_fn(spark, SF_DIR)
        .collect()[0]
    )
    assert r["n_terms"] == len(tf)
    assert r["buckets_used"] == len(loads)
    assert r["colliding_terms"] == coll_terms
    assert r["max_load"] == max(loads.values())
    assert r["total_tf"] == sum(tf.values())
    assert r["collided_tf"] == coll_tf
    assert r["term_collision_rate"] == coll_terms / len(tf)
    assert r["tf_collision_rate"] == coll_tf / sum(tf.values())
