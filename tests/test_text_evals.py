"""Brute-force Python replicas for the text/retrieval eval ops
(text_heaps_vocab_growth, search_mrr_eval) — independent of the DuckDB
oracle the sweep compares against."""

from __future__ import annotations

import re
from collections import Counter

import pyarrow.parquet as pq

from amazon_sales_data_engineering_spark.plans import REGISTRY

from .conftest import SF_DIR


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.lower()).strip()


def _docs():
    tbl = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    return [(r["doc_id"], _norm(r["text"])) for r in tbl]


def test_heaps_vocab_growth_matches_bruteforce(spark):
    docs = _docs()
    max_id = max(d for d, _ in docs)
    nonempty = [(d, t.split(" ")) for d, t in docs if t]
    buckets = {b: [0, 0, 0] for b in range(20)}  # docs, tokens, new_vocab
    first = {}
    for d, ws in nonempty:
        b = d * 20 // (max_id + 1)
        buckets[b][0] += 1
        buckets[b][1] += len(ws)
        for w in ws:
            if w not in first or d < first[w]:
                first[w] = d
    for w, d in first.items():
        buckets[d * 20 // (max_id + 1)][2] += 1
    rows = (
        REGISTRY["text_heaps_vocab_growth"]
        .spark_fn(spark, SF_DIR)
        .orderBy("bucket")
        .collect()
    )
    assert [r.bucket for r in rows] == list(range(20))
    dc = tc = vc = 0
    for r in rows:
        dc += buckets[r.bucket][0]
        tc += buckets[r.bucket][1]
        vc += buckets[r.bucket][2]
        assert (r.docs_cum, r.tokens_cum, r.vocab_cum) == (dc, tc, vc)
    assert vc == len(first)
    assert tc == sum(len(ws) for _, ws in nonempty)


def test_mrr_eval_matches_bruteforce(spark):
    docs = [(d, t.split(" ")) for d, t in _docs() if t]
    queries = (
        ("q_hash_merge", "hash", "merge"),
        ("q_window_sort", "window", "sort"),
        ("q_scan_filter", "scan", "filter"),
        ("q_spark_table", "spark", "table"),
        ("q_vector_batch", "vector", "batch"),
    )
    expected = {}
    rrs = []
    for qid, t1, t2 in queries:
        cand = []
        for d, ws in docs:
            c = Counter(ws)
            if c[t1] + c[t2] > 0:
                cand.append((d, c[t1] + c[t2], c[t1] > 0 and c[t2] > 0))
        ranked = sorted(cand, key=lambda x: (-x[1], x[0]))
        first_rank = next(
            (i + 1 for i, (_, _, rel) in enumerate(ranked) if rel), None
        )
        rr = 1000000 // first_rank if first_rank else 0
        rrs.append(rr)
        expected[qid] = (
            len(cand),
            sum(1 for _, _, rel in cand if rel),
            first_rank,
            rr,
        )
    mrr = sum(rrs) // len(queries)
    rows = REGISTRY["search_mrr_eval"].spark_fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        n_cand, n_rel, first_rank, rr = expected[r.qid]
        assert (r.n_cand, r.n_rel, r.first_rank, r.rr_ppm, r.mrr_ppm) == (
            n_cand, n_rel, first_rank, rr, mrr,
        ), r.qid


def test_readability_fk_bands_matches_bruteforce(spark):
    import math
    from collections import Counter as C2

    raw = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["text"]
    ).to_pylist()
    bands = C2()
    for r in raw:
        text = r["text"]
        norm = _norm(text)
        n_words = len(norm.split(" ")) if norm else 0
        if n_words == 0:
            continue
        n_sents = max(len(re.findall(r"[.!?]+", text)), 1)
        n_syll = max(len(re.findall(r"[aeiouy]+", text.lower())), 1)
        grade = math.floor(
            0.39 * (n_words / n_sents) + 11.8 * (n_syll / n_words) - 15.59
        )
        bands[min(max(grade, 0), 18)] += 1
    got = {
        r["grade_band"]: r["n_docs"]
        for r in REGISTRY["text_readability_fk_bands"]
        .spark_fn(spark, SF_DIR)
        .collect()
    }
    assert got == dict(bands)
