"""Equivalence pins for the Arrow-vectorized pretrain featurizers (r12).

``functions/wordhash.py`` replaces three interpreted-Catalyst paths with
one numpy batch pass each:

- ``word_hashes``          ≡ ``transform(ws, _word_hash_spark)``;
- ``feature_bucket_counts``≡ explode(unigram++bigram buckets) →
                             groupBy(doc, b).count() (the DSIR fc rows);
- ``trigram_counts``       ≡ explode(3-char substrings) →
                             groupBy(doc, g).count(), with the trigram
                             packed c1·2^42 + c2·2^21 + c3 (injective).

These tests prove BIT-IDENTICAL results against the replaced interpreted
expressions over (a) the sf0.001 documents corpus and (b) an adversarial
sample: supra-ASCII code points (ascii() = ord = code point), empty
words (Spark's sequence(1,0) quirk folds to 0), single-word docs (no
bigrams), empty arrays, NULL arrays, NULL words inside arrays, and
maximum-length words. The consumer queries (dsir_importance_ppm,
ccnet_perplexity_buckets) stay oracle-hash-gated on top.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amazon_sales_data_engineering_spark.functions.wordhash import (
    HASH_P,
    N_BUCKETS,
    feature_bucket_counts,
    trigram_counts,
    word_hash_py,
    word_hashes,
)
from amazon_sales_data_engineering_spark.plans.pretrain_ops import (
    _NORM_SPARK,
    _word_hash_spark,
)

from .conftest import SF_DIR

ADVERSARIAL = [
    (1, ["hello", "world"]),
    (2, ["a"]),                              # single word: no bigram
    (3, []),                                 # empty array
    (4, None),                               # NULL array
    (5, ["", "x", ""]),                      # empty words -> hash 0
    (6, ["café", "€100", "中文詞"]),  # supra-ASCII
    (7, ["z" * 500]),                        # long word
    (8, [None, "ok", None]),                 # NULL words inside the array
    (9, ["same", "same", "same"]),           # in-doc repetition
    (10, ["0", "00", "000", "0000"]),        # shared prefixes
]


def _interp_hashes(df):
    return df.select(
        "doc_id", F.transform("ws", _word_hash_spark).alias("h")
    )


def _interp_fc(df):
    hs = df.select(
        "doc_id", F.transform("ws", _word_hash_spark).alias("h")
    )
    bigrams = F.when(
        F.size("h") < 2, F.array().cast("array<bigint>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size("h") - 1),
            lambda i: (
                (F.element_at("h", i) * F.lit(131) + F.element_at("h", i + 1))
                % F.lit(HASH_P)
            )
            % F.lit(N_BUCKETS),
        )
    )
    feats = hs.select(
        "doc_id",
        F.explode(
            F.concat(F.transform("h", lambda x: x % F.lit(N_BUCKETS)), bigrams)
        ).alias("b"),
    )
    return feats.groupBy("doc_id", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )


def _interp_tgc(df):
    tg = df.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("s") - 2),
                lambda i: F.substr(F.col("s"), i, F.lit(3)),
            )
        ).alias("g"),
    )
    # pack the interpreted 3-char trigram the same injective way
    packed = (
        F.ascii(F.substring("g", 1, 1)).cast("bigint") * F.lit(1 << 42)
        + F.ascii(F.substring("g", 2, 1)).cast("bigint") * F.lit(1 << 21)
        + F.ascii(F.substring("g", 3, 1)).cast("bigint")
    )
    return tg.select("doc_id", packed.alias("g")).groupBy("doc_id", "g").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )


@pytest.fixture(scope="module")
def corpus_ws(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    nrm = _NORM_SPARK(F.col("text"))
    return (
        docs.filter(F.length(nrm) > 0)
        .select("doc_id", F.split(nrm, " ").alias("ws"))
        .cache()
    )


@pytest.fixture(scope="module")
def adversarial_ws(spark):
    return spark.createDataFrame(
        ADVERSARIAL, "doc_id bigint, ws array<string>"
    )


def _rows(df):
    return sorted(
        tuple(x if not isinstance(x, list) else tuple(x) for x in r)
        for r in df.collect()
    )


def test_word_hashes_corpus(spark, corpus_ws):
    old = _rows(_interp_hashes(corpus_ws))
    new = _rows(corpus_ws.select("doc_id", word_hashes("ws").alias("h")))
    assert old == new


def test_word_hashes_adversarial(spark, adversarial_ws):
    old = _rows(_interp_hashes(adversarial_ws))
    new = _rows(
        adversarial_ws.select("doc_id", word_hashes("ws").alias("h"))
    )
    assert old == new


def test_word_hash_py_matches_fold(spark):
    """The scalar fallback twin agrees with the Spark fold char-for-char
    (unicode + long words; empty string handled by the caller)."""
    words = ["café", "€", "z" * 500, "a", "0" * 9]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: r["h"]
        for r in df.select("w", _word_hash_spark(F.col("w")).alias("h")).collect()
    }
    for w in words:
        assert got[w] == word_hash_py(w)


def test_feature_bucket_counts_corpus(spark, corpus_ws):
    old = _rows(_interp_fc(corpus_ws))
    new = _rows(
        corpus_ws.select(
            "doc_id", F.explode(feature_bucket_counts("ws")).alias("b", "k")
        )
    )
    assert old == new


def test_feature_bucket_counts_adversarial(spark, adversarial_ws):
    # NULL words (case 8) would explode to a NULL-bucket group, which a
    # map key cannot carry — unreachable from split(), and the UDF fails
    # loud on it (tested below) instead of silently diverging.
    no_null_words = adversarial_ws.filter(F.col("doc_id") != 8)
    old = _rows(_interp_fc(no_null_words))
    new = _rows(
        no_null_words.select(
            "doc_id", F.explode(feature_bucket_counts("ws")).alias("b", "k")
        )
    )
    assert old == new


def test_feature_bucket_counts_null_word_fails_loud(spark, adversarial_ws):
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises(PythonException, match="NULL word"):
        (
            adversarial_ws.filter(F.col("doc_id") == 8)
            .select(F.explode(feature_bucket_counts("ws")))
            .collect()
        )


def test_trigram_counts_corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    nrm = _NORM_SPARK(F.col("text"))
    n0 = (
        docs.filter(F.length(nrm) >= 3)
        .select("doc_id", nrm.alias("s"))
        .cache()
    )
    old = _rows(_interp_tgc(n0))
    new = _rows(
        n0.select("doc_id", F.explode(trigram_counts("s")).alias("g", "k"))
    )
    assert old == new


def test_trigram_counts_adversarial(spark):
    # Production (ccnet) filters length >= 3 BEFORE the trigram stage, so
    # the interpreted reference is only defined on that domain (below it,
    # sequence(1, len-2) DESCENDS — Spark's sequence(1,0) = [1,0] quirk —
    # which the replaced query could never reach).
    rows = [
        (1, "abcabc"),
        (2, "aaa"),
        (4, "café au lait €€€"),
        (5, "x" * 1000),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, s string")
    old = _rows(_interp_tgc(df))
    new = _rows(
        df.select("doc_id", F.explode(trigram_counts("s")).alias("g", "k"))
    )
    assert old == new


def test_trigram_counts_short_and_null(spark):
    """Below the production length>=3 domain the UDF yields an empty map
    (no trigram rows after explode) and NULL input stays NULL."""
    rows = [(1, ""), (2, "a"), (3, "ab"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, s string")
    got = {
        r["doc_id"]: r["m"]
        for r in df.select("doc_id", trigram_counts("s").alias("m")).collect()
    }
    assert got == {1: {}, 2: {}, 3: {}, 4: None}
