"""Vectorized (Arrow) twins of the pretrain-ops text featurizers.

``plans/pretrain_ops`` defines two cross-engine exactness contracts:

- the rolling 31-polynomial word hash (``_word_hash_spark`` /
  ``_WORD_HASH_SQL``): per word, fold over char codes c_1..c_n of
  ``h' = (h * 31 + c) mod P`` with seed 0, P = 1000003;
- DSIR feature buckets: unigram hash mod 1024 plus bigram
  ``((h_i * 131 + h_{i+1}) mod P) mod 1024``.

As Catalyst higher-order folds (``aggregate(transform(sequence(...)))``)
these evaluate INTERPRETED, one expression tree per character/token (HOFs
are not codegen'd), and the per-occurrence feature stream then pays a
full explode + hash-aggregate exchange just to build per-doc counts.
This module computes the IDENTICAL integers over numpy int64 in one
ArrowEvalPython projection per document batch (guide §4.2: hand whole
batches to vectorized native code) and returns per-doc COUNT MAPS, so
the per-doc reduction happens in-row and no occurrence stream is ever
shuffled (guide §2.3: aggregate before you shuffle).

Exactness: the fold's closed form is ``h = Σ_j c_j·31^(n-j) mod P``
(mod is a ring homomorphism; each summand < P = 1e6, so the int64 sum
is exact to ~9e12 chars/word). Char codes come from UTF-32, i.e. Python
``ord`` == Spark ``ascii`` == DuckDB ``ord`` (code points — including
supra-ASCII, verified). The empty-word edge matches Spark's quirk
(``sequence(1,0)`` = [1,0] → two '' substrings with ascii 0 → fold 0).
Bit-equality against the interpreted forms — real corpus plus
adversarial unicode/boundary samples — is pinned in
tests/test_wordhash_arrow.py, and the consumer queries stay
oracle-hash-gated on top.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, MapType

HASH_P = 1000003
N_BUCKETS = 1024
#: packing base for trigram code points (max code point 0x10FFFF < 2^21,
#: so 3 * 21 = 63 bits — injective into BIGINT)
_CP_BASE = 1 << 21

_POW31: np.ndarray = np.array([1], dtype=np.int64)


def _pow31(max_len: int) -> np.ndarray:
    """Powers of 31 mod P up to index ``max_len`` (grown on demand, cached
    at module level — once per Python worker, guide §4.5)."""
    global _POW31
    if len(_POW31) <= max_len:
        ext = np.empty(max_len + 1, dtype=np.int64)
        ext[: len(_POW31)] = _POW31
        for i in range(len(_POW31), max_len + 1):
            ext[i] = (ext[i - 1] * 31) % HASH_P
        _POW31 = ext
    return _POW31


def word_hash_py(w: str) -> int:
    """Reference scalar twin of the Spark fold (odd-case fallback and the
    equivalence test's independent implementation)."""
    h = 0
    for ch in w:
        h = (h * 31 + ord(ch)) % HASH_P
    return h


def _flat_word_hashes(all_words: list) -> np.ndarray:
    """Closed-form polynomial hash of every word in one vectorized pass
    (words must be non-None; zero-length words are fine)."""
    n = len(all_words)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    lens = np.fromiter((len(w) for w in all_words), dtype=np.int64, count=n)
    total = int(lens.sum())
    if total == 0:
        return np.zeros(n, dtype=np.int64)
    codes = np.frombuffer(
        "".join(all_words).encode("utf-32-le"), dtype="<u4"
    ).astype(np.int64)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    exp = np.repeat(lens - 1, lens) - pos
    terms = (codes % HASH_P) * _pow31(int(lens.max()))[exp] % HASH_P
    if (lens == 0).any():
        # np.add.reduceat misreads zero-length segments — exact slow path
        return np.fromiter(
            (word_hash_py(w) for w in all_words), dtype=np.int64, count=n
        )
    return np.add.reduceat(terms, starts) % HASH_P


def _rows_and_flat(ws_values: np.ndarray):
    """Split a batch of word arrays into (null_mask, words_per_row,
    flat_word_list, needs_slow_mask) — rows containing a None word take
    the scalar fallback path."""
    nrows = len(ws_values)
    null_mask = np.fromiter(
        (v is None for v in ws_values), dtype=bool, count=nrows
    )
    slow_mask = np.fromiter(
        (
            (v is not None) and any(w is None for w in v)
            for v in ws_values
        ),
        dtype=bool,
        count=nrows,
    )
    nwords = np.fromiter(
        (
            0
            if (ws_values[r] is None or slow_mask[r])
            else len(ws_values[r])
            for r in range(nrows)
        ),
        dtype=np.int64,
        count=nrows,
    )
    flat = [
        w
        for r in range(nrows)
        if not (null_mask[r] or slow_mask[r])
        for w in ws_values[r]
    ]
    return null_mask, slow_mask, nwords, flat


@F.pandas_udf(ArrayType(LongType()))
def _word_hashes_arrow(ws: pd.Series) -> pd.Series:
    vals = ws.to_numpy(dtype=object)
    null_mask, slow_mask, nwords, flat = _rows_and_flat(vals)
    h = _flat_word_hashes(flat)
    out = np.empty(len(vals), dtype=object)
    pos = 0
    for r in range(len(vals)):
        if null_mask[r]:
            out[r] = None
        elif slow_mask[r]:
            out[r] = [
                None if w is None else word_hash_py(w) for w in vals[r]
            ]
        else:
            k = int(nwords[r])
            out[r] = h[pos : pos + k].tolist()
            pos += k
    return pd.Series(out)


def word_hashes(ws: Column | str) -> Column:
    """array<string> -> array<bigint> of rolling-31 word hashes as ONE
    ArrowEvalPython projection. Bit-identical to ``_word_hash_spark``."""
    return _word_hashes_arrow(ws if isinstance(ws, Column) else F.col(ws))


@F.pandas_udf(MapType(LongType(), LongType()))
def _feature_bucket_counts_arrow(ws: pd.Series) -> pd.Series:
    """Per-doc DSIR feature-bucket counts: map from bucket (unigram
    ``h mod 1024`` ++ bigram ``((h_i*131 + h_{i+1}) mod P) mod 1024``)
    to its occurrence count within the doc. Exploding the map yields
    exactly the rows of
    ``feats.groupBy(doc, lang, b).count()`` over the interpreted form."""
    vals = ws.to_numpy(dtype=object)
    nrows = len(vals)
    null_mask, slow_mask, nwords, flat = _rows_and_flat(vals)
    h = _flat_word_hashes(flat)
    out = np.empty(nrows, dtype=object)
    n = len(h)
    if n:
        rstarts = np.zeros(nrows, dtype=np.int64)
        np.cumsum(nwords[:-1], out=rstarts[1:])
        row_of = np.repeat(np.arange(nrows, dtype=np.int64), nwords)
        uni = h % N_BUCKETS
        if n > 1:
            same = row_of[:-1] == row_of[1:]
            bi = (((h[:-1] * 131 + h[1:]) % HASH_P) % N_BUCKETS)[same]
            bi_row = row_of[:-1][same]
        else:
            bi = bi_row = np.zeros(0, dtype=np.int64)
        # one batch-wide unique over (row, bucket) keys (bucket < 1024)
        keys = np.concatenate([row_of * N_BUCKETS + uni,
                               bi_row * N_BUCKETS + bi])
        kv, kc = np.unique(keys, return_counts=True)
        krow, kb = kv // N_BUCKETS, kv % N_BUCKETS
        bounds = np.searchsorted(krow, np.arange(nrows + 1))
    for r in range(nrows):
        if null_mask[r]:
            out[r] = None
        elif slow_mask[r]:
            # A NULL word would hash to a NULL bucket, which a map key
            # cannot carry (the interpreted explode kept NULL elements
            # as a NULL-bucket group). The only production input is
            # F.split() output, which never contains NULL elements —
            # fail loud rather than silently diverge if that ever
            # changes (the frame-guard discipline).
            raise ValueError(
                "feature_bucket_counts: NULL word in input array "
                "(unreachable from split(); NULL buckets cannot be "
                "represented in a map key)"
            )
        elif n == 0:
            out[r] = {}
        else:
            lo, hi = bounds[r], bounds[r + 1]
            out[r] = dict(zip(kb[lo:hi].tolist(), kc[lo:hi].tolist()))
    return pd.Series(out)


def feature_bucket_counts(ws: Column | str) -> Column:
    """array<string> -> map<bigint,bigint> of per-doc DSIR bucket counts
    (unigrams + bigrams), one ArrowEvalPython projection; explode to get
    the (b, k) rows the old explode+groupBy exchange produced."""
    return _feature_bucket_counts_arrow(
        ws if isinstance(ws, Column) else F.col(ws)
    )


@F.pandas_udf(MapType(LongType(), LongType()))
def _trigram_counts_arrow(s: pd.Series) -> pd.Series:
    """Per-doc character-trigram counts, trigrams PACKED as
    ``c1·2^42 + c2·2^21 + c3`` (injective for all Unicode code points) —
    a bigint join/group key in place of a 3-char string; the trigram
    itself never reaches the output, so consumers are value-identical."""
    vals = s.to_numpy(dtype=object)
    nrows = len(vals)
    out = np.empty(nrows, dtype=object)
    lens = np.fromiter(
        (0 if v is None else len(v) for v in vals), dtype=np.int64,
        count=nrows,
    )
    buf = "".join(v for v in vals if v is not None)
    codes = np.frombuffer(buf.encode("utf-32-le"), dtype="<u4").astype(
        np.int64
    )
    pos = 0
    for r in range(nrows):
        if vals[r] is None:
            out[r] = None
            continue
        length = int(lens[r])
        seg = codes[pos : pos + length]
        pos += length
        if length < 3:
            out[r] = {}
            continue
        tri = seg[:-2] * (_CP_BASE * _CP_BASE) + seg[1:-1] * _CP_BASE + seg[2:]
        kv, kc = np.unique(tri, return_counts=True)
        out[r] = dict(zip(kv.tolist(), kc.tolist()))
    return pd.Series(out)


def trigram_counts(s: Column | str) -> Column:
    """string -> map<bigint,bigint> of packed-code-point trigram counts
    (one ArrowEvalPython projection; explode for (g, k) rows)."""
    return _trigram_counts_arrow(s if isinstance(s, Column) else F.col(s))
