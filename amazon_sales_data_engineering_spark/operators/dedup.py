"""Deduplication operators.

Reference parity
----------------
``rank_dedup`` replicates the reference's load-batch dedup (SURVEY.md §2.5
W1; /root/reference/step_4_source_to_curated.py:114-132): ``rank()`` over a
partition ordered by recency, keep rank 1 — **rank keeps ties**, which is
load-batch semantics, not per-key row_number. The reference implements it as
window → filter → key-project → self-join (J2/J3); here it is a single
window + filter (same result set, one less shuffle/join).

Large-scale extensions (LLM training-data pipeline)
---------------------------------------------------
- ``exact_dedup_groups``: hash-groupBy on a normalized fingerprint.
- ``minhash_signatures`` / ``minhash_lsh_pairs``: shingle → MinHash → banded
  LSH → candidate pairs → exact-Jaccard verification. MinHash values are
  lexicographic minima of seeded md5 hex strings (portable across engines,
  see functions.hashing). Scale path: the only shuffles are the groupBys on
  (doc, seed) / band key and the band-bucket self-join; no all-pairs stage.
- ``simhash16``: 16-bit SimHash from per-token md5 bits (integer arithmetic
  only). Near-dup buckets = equal fingerprints.
- ``jaccard_pairs``: exact shingle-Jaccard via inverted-index self-join —
  the quadratic-verify baseline the sketches are measured against. The
  no-candidates path requires ``max_shingle_freq``: hot shingles are
  dropped as stop-shingles (broadcast anti-join against the tiny hot list),
  bounding the self-join output; the LSH-candidates path needs no cap.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import seeded_md5
from ..functions.text import fingerprint, normalized_text


def rank_dedup(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    keep_ties: bool = True,
) -> DataFrame:
    """Keep the top-ranked rows per partition. ``keep_ties=True`` uses
    ``rank()`` (faithful to /root/reference/step_4_source_to_curated.py:117);
    ``False`` uses ``row_number()`` (corrected profile, one row per key)."""
    fn = F.rank() if keep_ties else F.row_number()
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("__rk", fn.over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )


def rank_dedup_maxjoin(
    df: DataFrame,
    partition_by: list[str],
    order_col: str,
    desc: bool = True,
    broadcast: bool = True,
) -> DataFrame:
    """Window-free SCALE profile of ``rank_dedup(keep_ties=True)`` for a
    single order column (SURVEY §7.3.6's one genuine skew hazard: the
    faithful W1 partitions its window by ``order_dt`` — few FAT
    partitions at 100× data, and AQE cannot split a window partition,
    so one hot date serializes onto one task).

    ``rank() == 1`` with ties over ``ORDER BY x DESC`` keeps exactly the
    rows whose ``x`` equals the per-partition MAX — computable as a
    map-side-combinable ``groupBy().agg(max)`` plus a broadcast
    equi-join back: identical result multiset (ties kept, null ordering
    matched row-for-row — see below), but the fact side NEVER shuffles
    and a hot partition parallelizes across all its input splits.

    Null parity with the window form (property-pinned in
    tests/test_properties.py):

    - ``desc`` (Spark default NULLS LAST): rank-1 rows are the non-null
      max rows when one exists, else the all-null partition ties.
      ``max()`` ignores nulls, so a null-safe ``x <=> max(x)`` matches
      both cases.
    - ``asc`` (Spark default NULLS FIRST): rank-1 rows are the NULL rows
      whenever the partition has any, else the min rows — so the keep
      condition switches on a per-partition ``has_null`` flag.

    ``broadcast=False`` drops the hint for high-cardinality partition
    keys (where the window form's shuffle is fine anyway — this
    operator targets the few-fat-partitions shape)."""
    has_null = F.max(F.col(order_col).isNull()).alias("__has_null")
    tgt = (F.max if desc else F.min)(order_col).alias("__tgt")
    keys = [f"__p{i}" for i in range(len(partition_by))]
    stats = (
        df.groupBy(*partition_by)
        .agg(tgt, has_null)
        .select(
            *[F.col(p).alias(k) for p, k in zip(partition_by, keys)],
            "__tgt",
            "__has_null",
        )
    )
    if broadcast:
        stats = F.broadcast(stats)
    cond = reduce(
        lambda a, b: a & b,
        [df[p].eqNullSafe(F.col(k)) for p, k in zip(partition_by, keys)],
    )
    if desc:
        keep = F.col(order_col).eqNullSafe(F.col("__tgt"))
    else:
        keep = F.when(
            F.col("__has_null"), F.col(order_col).isNull()
        ).otherwise(F.col(order_col) == F.col("__tgt"))
    return df.join(stats, cond, "inner").filter(keep).drop(
        *keys, "__tgt", "__has_null"
    )


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup on normalized-text fingerprint: one row per distinct
    content with the minimum id as the canonical keeper and the group size.
    Single hash-aggregate; fully map-side combinable."""
    return (
        df.select(fingerprint(text_col).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def winnow_fingerprints(
    df: DataFrame, text_col: str, id_col: str, k: int = 4, w: int = 5
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS algorithm): hash every k-word gram, slide a window of
    ``w`` consecutive hashes, select each window's MINIMUM hash —
    rightmost on ties — and keep the distinct (position, hash)
    selections. Guarantees: any shared run of at least w+k-1 words
    contributes at least one COMMON selected fingerprint, while only
    ~2/(w+1) of the hashes are kept — a local, position-robust
    fingerprint index ~w/2 smaller than the full shingle index (the
    point at 100 TB: the inverted index a plagiarism/overlap detector
    joins on is winnowed BEFORE the shuffle). Entirely in-row (narrow):
    rightmost-min per window via array_min + array_position over the
    reversed window slice — no UDF, same expressions the DuckDB oracle
    replays. Docs shorter than k words produce no fingerprints; with
    fewer than w hashes the single short window selects its min.
    Output: (id, pos, h), pos = 1-based k-gram position."""
    # Tokenization materialized behind projection boundaries: `ws`
    # appears INSIDE the k-gram lambda body, where an inline
    # split(normalize(text)) re-evaluates per gram (no CSE in
    # interpreted HOF lambdas — the O(doc_len²) class the round-11
    # sf10 probe caught in passage_windows).
    pre = df.select(
        F.col(id_col), normalized_text(F.col(text_col)).alias("__nrm")
    ).select(
        F.col(id_col), F.col("__nrm"), F.split("__nrm", " ").alias("__ws")
    )
    ws = F.col("__ws")
    m = F.size(ws) - (k - 1)
    hs = F.when(
        (F.length("__nrm") > 0) & (m >= 1),
        F.transform(
            F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
            lambda i: F.md5(F.concat_ws(" ", F.slice(ws, i, k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    d = pre.select(F.col(id_col), hs.alias("hl"))
    mh = F.size("hl")

    def win(s):
        wl = F.least(F.lit(w), mh - s + 1)
        sl = F.slice("hl", s, wl)
        mn = F.array_min(sl)
        return F.struct(
            (s + wl - F.array_position(F.reverse(sl), mn)).cast("bigint").alias("pos"),
            mn.alias("h"),
        )

    sel = F.when(
        mh >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(mh - (w - 1), F.lit(1))), win
            )
        ),
    ).otherwise(F.array().cast("array<struct<pos:bigint,h:string>>"))
    return d.select(F.col(id_col), F.explode(sel).alias("f")).select(
        id_col, "f.pos", "f.h"
    )


def cdc_segments(
    df: DataFrame, text_col: str, id_col: str, boundary_hex: str = "01"
) -> DataFrame:
    """Content-defined chunking (the Rabin/gear-hash storage-dedup
    scheme, at word granularity): a chunk boundary falls BEFORE any
    word whose md5 starts with a hex digit in ``boundary_hex`` (2 of 16
    digits → p=1/8, mean chunk ~8 words). Boundaries depend only on
    LOCAL content, never on position — inserting a sentence re-chunks
    only its neighborhood, so identical passages in different documents
    (or shifted copies of the same document) hash to identical chunks.
    That is the property fixed-size chunking lacks and the reason
    dedup-storage systems (LBFS, restic, Venti lineage) chunk this way.
    Per-doc windows only (the suffix-ops pattern): one posexplode, a
    per-doc running boundary count, one (doc, seg) aggregate. Output:
    (id, seg_idx, seg_hash, n_words) — seg_hash = md5 of the
    space-joined chunk words."""
    nrm = normalized_text(F.col(text_col))
    words = df.select(
        F.col(id_col),
        F.posexplode(
            F.when(F.length(nrm) > 0, F.split(nrm, " "))
            .otherwise(F.array().cast("array<string>"))
        ).alias("pos", "w"),
    )
    flag = F.when(
        F.substring(F.md5("w"), 1, 1).isin(*list(boundary_hex)), 1
    ).otherwise(0)
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seg = words.select(
        id_col, "pos", "w",
        F.coalesce(F.sum(flag).over(w), F.lit(0)).alias("seg_idx"),
    )
    return seg.groupBy(id_col, "seg_idx").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda x: x["w"],
                ),
                " ",
            )
        ).alias("seg_hash"),
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
    )


def salted_exact_dedup(
    df: DataFrame, text_col: str, id_col: str, salt: int = 16
) -> DataFrame:
    """Skew-hardened exact dedup for the viral-duplicate corpus (one
    boilerplate text at 10^8 copies — round-6 verdict #8). Two
    mitigations over exact_dedup_groups' single aggregate, both needed
    only when one fingerprint is HOT:

    1. **Salted two-phase aggregate** — phase 1 groups on
       (fingerprint, __agg_salt = xxhash64(id) % salt) so the hot key's
       rows split across ``salt`` reducers; phase 2 merges the ≤salt
       partials per fingerprint. Plain map-side partial aggregation
       bounds reducer input to one row per map task per key ONLY while
       the partial hash map holds; in a corpus mixing one hot key with
       millions of distinct keys the partial map spills to pass-through
       and the hot key's raw rows funnel to a single reducer — the
       explicit salt keeps the bound unconditional.
    2. **Salted join-back** (operators.skew.salted_join) — the cluster
       stats are joined back onto the per-doc rows on fingerprint,
       where the viral fingerprint would otherwise send 10^8 probe rows
       to one join task; the skewed side salts on full row content and
       the 1-row-per-fingerprint stats side replicates ``salt``×.

    Returns per-doc rows (id, fingerprint, keep_id, n_docs, is_keeper)
    — row-identical to the unsalted groupBy + plain join
    (tests/test_skew_bucketing.py pins both equivalence and the
    two-phase plan shape)."""
    base = df.select(
        fingerprint(text_col).alias("fingerprint"), F.col(id_col)
    )
    p1 = (
        base.withColumn(
            "__agg_salt",
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt)).cast("int"),
        )
        .groupBy("fingerprint", "__agg_salt")
        .agg(
            F.min(id_col).alias("__m"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    stats = p1.groupBy("fingerprint").agg(
        F.min("__m").alias("keep_id"),
        F.sum("__n").cast("bigint").alias("n_docs"),
    )
    from .skew import salted_join

    joined = salted_join(base, stats, on=["fingerprint"], salt=salt)
    return joined.select(
        F.col(id_col),
        "fingerprint",
        "keep_id",
        "n_docs",
        (F.col(id_col) == F.col("keep_id")).alias("is_keeper"),
    )


def shingles(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """Explode distinct k-word shingles of the normalized text.
    Output: (id_col, shingle). Shingling is a narrow transform (no shuffle).

    Tokenization is materialized behind a projection boundary before the
    window lambda — an expensive expression INSIDE a higher-order
    function's lambda body is re-evaluated interpreted per element (no
    CSE), which made the inline form O(doc_len²) (round-11 sf10 probe
    catch; see passage_windows for the full post-mortem)."""
    base = df.select(
        F.col(id_col),
        F.split(normalized_text(text_col), " ").alias("__toks"),
    )
    toks = F.col("__toks")
    n = F.size(toks)
    # sequence(1, x) with x < 1 would produce a *descending* array in Spark,
    # so documents shorter than k tokens get an explicitly empty index list.
    idx = F.when(n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + F.lit(j)) for j in range(k)]
        ),
    )
    return (
        base.select(F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def minhash_signatures(
    shingle_df: DataFrame, id_col: str, num_hashes: int = 6
) -> DataFrame:
    """MinHash signature per document: for each seed, the lexicographic MIN
    of md5(seed|shingle). One groupBy(id) aggregate computes all seeds at
    once (no per-seed shuffle). Output: (id_col, h0..h{n-1})."""
    aggs = [
        F.min(seeded_md5(s, F.col("shingle"))).alias(f"h{s}")
        for s in range(num_hashes)
    ]
    return shingle_df.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    sig_df: DataFrame,
    id_col: str,
    num_hashes: int = 6,
    bands: int = 3,
) -> DataFrame:
    """Banded LSH: band key = md5 of the concatenated row hashes of the band;
    candidate pairs share ≥1 band key. Output: distinct (id_a, id_b) with
    id_a < id_b. The self-join is per-band-bucket (sparse at scale)."""
    rows_per_band = num_hashes // bands
    band_entries = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_entries.append(
            sig_df.select(
                F.col(id_col),
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("band_key"),
            )
        )
    buckets = reduce(DataFrame.unionByName, band_entries)
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band") == F.col(f"b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    num_hashes: int = 6,
    bands: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Fused MinHash-LSH near-dup pipeline: shingle → (signature + shingle
    set) in ONE aggregate pass → banded candidates → exact Jaccard via
    ``array_intersect`` on the stored sets.

    Composing ``minhash_signatures`` + ``minhash_lsh_pairs`` +
    ``jaccard_pairs`` re-executes the shingle/normalization chain once per
    consumer (three times); here the per-doc summary (6 hashes + shingle
    set + size) is built by a single shuffle and persisted, so the
    expensive regexp/explode/md5 work happens exactly once. The persisted
    summary is one row per document — O(corpus) not O(pairs) — and Spark's
    CacheManager dedupes the entry across repeated invocations."""
    sh = shingles(df, text_col, id_col, k=k)
    aggs = [
        F.min(seeded_md5(s, F.col("shingle"))).alias(f"h{s}")
        for s in range(num_hashes)
    ]
    docsets = (
        sh.groupBy(id_col)
        .agg(*aggs, F.collect_set("shingle").alias("sh_set"))
        .withColumn("n", F.size("sh_set"))
        .persist()
    )
    cand = minhash_lsh_pairs(
        docsets.select(id_col, *[f"h{s}" for s in range(num_hashes)]),
        id_col,
        num_hashes=num_hashes,
        bands=bands,
    )
    a = docsets.select(
        F.col(id_col).alias("id_a"),
        F.col("sh_set").alias("set_a"),
        F.col("n").alias("na"),
    )
    b = docsets.select(
        F.col(id_col).alias("id_b"),
        F.col("sh_set").alias("set_b"),
        F.col("n").alias("nb"),
    )
    inter = F.size(F.array_intersect("set_a", "set_b"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                inter.cast("double")
                / (F.col("na") + F.col("nb") - inter).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
    )


def jaccard_pairs(
    shingle_df: DataFrame,
    id_col: str,
    threshold: float,
    candidates: DataFrame | None = None,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard over shingle sets via inverted-index self-join.

    intersection(a,b) = count of shared shingles (join on shingle);
    union = |a| + |b| - intersection. Jaccard = int/int division — a single
    IEEE double op, deterministic across engines. If ``candidates`` is given
    (id_a, id_b), only those pairs are verified (the LSH path).
    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.

    ``max_shingle_freq`` treats shingles occurring in more than that many
    documents as stop-shingles and drops them from the universe (both
    intersections and set sizes — a consistent restriction, like stopword
    removal). This bounds the no-candidates self-join: a shingle shared by
    d documents produces d·(d-1)/2 pairs, so one viral shingle is a
    quadratic blow-up; the cap makes the join output ≤ cap·|shingles|.
    The hot-shingle list itself is tiny by construction (≤ total
    occurrences / cap rows), so it broadcasts. The no-candidates path
    REQUIRES a cap — pass LSH candidates or an explicit cap.
    """
    if candidates is None and max_shingle_freq is None:
        raise ValueError(
            "jaccard_pairs without candidates is quadratic in the hottest "
            "shingle's document frequency; pass max_shingle_freq to bound "
            "it (or supply LSH candidates, e.g. minhash_lsh_pairs)"
        )
    if max_shingle_freq is not None:
        hot = (
            shingle_df.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_shingle_freq)
            .select("shingle")
        )
        shingle_df = shingle_df.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = shingle_df.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    if candidates is not None:
        # Verify ONLY the candidate pairs: attach a's shingles to each pair,
        # then match b's shingles on (id_b, shingle). Work is proportional
        # to |candidates| × shingles/doc, never to the co-shingle pair count
        # — this is what makes LSH pay off at scale.
        sh_a = shingle_df.select(F.col(id_col).alias("id_a"), "shingle")
        sh_b = shingle_df.select(F.col(id_col).alias("id_b"), "shingle")
        inter = (
            candidates.join(sh_a, "id_a")
            .join(sh_b, ["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("i"))
        )
    else:
        a = shingle_df.alias("sa")
        b = shingle_df.alias("sb")
        inter = (
            a.join(
                b,
                (F.col("sa.shingle") == F.col("sb.shingle"))
                & (F.col(f"sa.{id_col}") < F.col(f"sb.{id_col}")),
            )
            .groupBy(
                F.col(f"sa.{id_col}").alias("id_a"),
                F.col(f"sb.{id_col}").alias("id_b"),
            )
            .agg(F.count(F.lit(1)).alias("i"))
        )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("i").cast("double")
                / (F.col("na") + F.col("nb") - F.col("i")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
    )


def simhash16(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """16-bit SimHash per document from per-token md5 bits.

    For each distinct token: value = first 4 hex chars of md5(token) → 16
    bits. For each bit position, sum (2*bit - 1) over tokens; the sign gives
    the fingerprint bit. Pure integer arithmetic → portable to SQL. The
    explode is 16× distinct tokens (bounded); one groupBy(id) shuffle.
    Output: (id_col, simhash) with simhash in [0, 65535].
    """
    toks = (
        df.select(
            F.col(id_col),
            F.explode(F.array_distinct(F.split(normalized_text(text_col), " "))).alias(
                "tok"
            ),
        )
        .withColumn("h4", F.substring(F.md5(F.col("tok")), 1, 4))
    )
    # hex char i (1-based) of h4 contributes bits 4*(4-i) .. 4*(4-i)+3.
    bit = F.explode(F.sequence(F.lit(0), F.lit(15))).alias("bit")
    exploded = toks.select(F.col(id_col), F.col("h4"), bit)
    ch = F.substring(F.col("h4"), 4 - (F.col("bit") / 4).cast("int"), 1)
    # conv(hex_char, 16, 10) = numeric value 0..15 (oracle twin:
    # instr('0123456789abcdef', ch) - 1 — same function, different builtin).
    val = F.conv(ch, 16, 10).cast("int")
    bitval = F.floor(val / F.pow(F.lit(2), F.col("bit") % 4)).cast("int") % 2
    contrib = (bitval * 2 - 1).alias("contrib")
    return (
        exploded.select(F.col(id_col), F.col("bit"), contrib)
        .groupBy(id_col, "bit")
        .agg(F.sum("contrib").alias("s"))
        .select(
            F.col(id_col),
            F.when(F.col("s") > 0, F.pow(F.lit(2), F.col("bit")).cast("bigint"))
            .otherwise(F.lit(0))
            .alias("term"),
        )
        .groupBy(id_col)
        .agg(F.sum("term").cast("bigint").alias("simhash"))
    )


def simhash60(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """60-bit SimHash per document (first 15 hex chars of per-token md5).

    Same construction as :func:`simhash16` but wide enough for Hamming-
    distance blocking: 60 bits split into 4 × 15-bit bands gives 32768
    buckets per band, so band-bucket fanout stays bounded as the corpus
    grows (16-bit signatures max out at 16 buckets per nibble band — a
    quadratic join in disguise). 60 rather than 64 keeps every
    intermediate (2^59 max) inside a non-negative int64 in both engines.
    The explode is 60× distinct tokens (bounded); one groupBy(id) shuffle.
    Output: (id_col, simhash) with simhash in [0, 2^60).
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(normalized_text(text_col), " "))).alias(
            "tok"
        ),
    ).withColumn("h15", F.substring(F.md5(F.col("tok")), 1, 15))
    # hex char i (1-based) of h15 contributes bits 4*(15-i) .. 4*(15-i)+3.
    bit = F.explode(F.sequence(F.lit(0), F.lit(59))).alias("bit")
    exploded = toks.select(F.col(id_col), F.col("h15"), bit)
    ch = F.substring(F.col("h15"), 15 - (F.col("bit") / 4).cast("int"), 1)
    val = F.conv(ch, 16, 10).cast("int")
    # 2^(bit % 4) and 2^bit (bit <= 59) are exact in double, so the
    # pow-then-cast idiom stays engine-exact (powers of two only).
    bitval = F.floor(val / F.pow(F.lit(2), F.col("bit") % 4)).cast("int") % 2
    contrib = (bitval * 2 - 1).alias("contrib")
    return (
        exploded.select(F.col(id_col), F.col("bit"), contrib)
        .groupBy(id_col, "bit")
        .agg(F.sum("contrib").alias("s"))
        .select(
            F.col(id_col),
            F.when(F.col("s") > 0, F.pow(F.lit(2), F.col("bit")).cast("bigint"))
            .otherwise(F.lit(0))
            .alias("term"),
        )
        .groupBy(id_col)
        .agg(F.sum("term").cast("bigint").alias("simhash"))
    )


def simhash_hamming_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs at Hamming distance <= ``max_hamming`` (< 4) over a
    60-bit signature, via pigeonhole band blocking (Manku et al.'s
    multi-index simhash scheme).

    The signature splits into 4 × 15-bit bands; two signatures within
    Hamming distance 3 differ in at most 3 bits, so at least one band is
    untouched — the (band_index, band_value) equi-join has EXACT recall
    by construction, never an all-pairs scan. Band values come from
    literal bit-shifts (no float division of >2^53 ints — that would
    round differently per engine). Candidates sharing several bands are
    deduped with one DISTINCT, then the distance is verified exactly
    with bit_count(xor). Shuffles: one explode-join on (band, value) +
    one distinct. Returns (id_a, id_b, hamming), id_a < id_b.
    """
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            f"max_hamming={max_hamming}: 4 bands over 60 bits guarantee "
            "recall only for Hamming distance <= 3; use more/narrower "
            "bands for larger radii"
        )
    bands = sig.select(
        F.col(id_col),
        F.col(sig_col),
        F.posexplode(
            F.array(
                F.col(sig_col) % 32768,
                F.shiftright(F.col(sig_col), 15) % 32768,
                F.shiftright(F.col(sig_col), 30) % 32768,
                F.shiftright(F.col(sig_col), 45) % 32768,
            )
        ).alias("b", "band_val"),
    )
    a = bands.select(
        F.col(id_col).alias("id_a"), F.col(sig_col).alias("sig_a"), "b", "band_val"
    )
    b = bands.select(
        F.col(id_col).alias("id_b"), F.col(sig_col).alias("sig_b"), "b", "band_val"
    )
    cand = (
        a.join(b, ["b", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.filter(hamming <= max_hamming).select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    )


def hamming_band_pairs64(
    sig: DataFrame,
    id_col: str,
    w0_col: str,
    w1_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """simhash_hamming_pairs' pigeonhole band blocking applied to a
    64-BIT signature stored as two 32-bit words (the dHash layout of
    multimodal image dedup): 4 × 16-bit bands — two per word — give
    65536 buckets per band, and Hamming distance <= 3 cannot touch all
    4 bands, so the (band, value) equi-join has exact recall. Verified
    exactly with bit_count(xor) summed over both words. Same shuffle
    shape as the 60-bit variant: one explode-join + one distinct —
    never all-pairs, which is what lets an image-crawl near-dedup run
    at 100 TB. Band extraction is sign-agnostic (mask + unsigned shift),
    so signed-int32 word storage is safe; the one remaining contract is
    that BOTH rows of a pair store their words under the same type/
    sign-extension convention (the verify step XORs the raw columns).
    Returns (id_a, id_b, hamming), id_a < id_b."""
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            f"max_hamming={max_hamming}: 4 bands over 64 bits guarantee "
            "recall only for Hamming distance <= 3; use more/narrower "
            "bands for larger radii"
        )
    # Mask, never mod: Spark's % is sign-preserving, so a caller storing
    # the 32-bit words as SIGNED ints (bit 31 set -> negative) would map
    # identical low halves to different band values across signs and
    # silently lose the exact-recall guarantee. bitwiseAND(0xFFFF) and
    # shiftrightunsigned are sign-agnostic bit extraction.
    w0, w1 = F.col(w0_col), F.col(w1_col)
    lo = lambda w: w.bitwiseAND(F.lit(65535))
    hi = lambda w: F.shiftrightunsigned(w, 16).bitwiseAND(F.lit(65535))
    bands = sig.select(
        F.col(id_col),
        w0.alias("__w0"),
        w1.alias("__w1"),
        F.posexplode(F.array(lo(w0), hi(w0), lo(w1), hi(w1))).alias(
            "b", "band_val"
        ),
    )
    a = bands.select(
        F.col(id_col).alias("id_a"),
        F.col("__w0").alias("w0_a"),
        F.col("__w1").alias("w1_a"),
        "b",
        "band_val",
    )
    b = bands.select(
        F.col(id_col).alias("id_b"),
        F.col("__w0").alias("w0_b"),
        F.col("__w1").alias("w1_b"),
        "b",
        "band_val",
    )
    cand = (
        a.join(b, ["b", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "w0_a", "w1_a", "w0_b", "w1_b")
        .distinct()
    )
    hamming = F.bit_count(
        F.col("w0_a").bitwiseXOR(F.col("w0_b"))
    ) + F.bit_count(F.col("w1_a").bitwiseXOR(F.col("w1_b")))
    return cand.filter(hamming <= max_hamming).select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    )


def prefix_filter_candidates(
    shingle_df: DataFrame, id_col: str, threshold_pct: int
) -> DataFrame:
    """PPJoin-style prefix-filtered candidate pairs for Jaccard >= t.

    The third candidate-generation strategy next to MinHash-LSH
    (probabilistic recall) and the stop-shingle-capped inverted index
    (exact but df-bounded): prefix filtering is EXACT-recall and
    sub-quadratic. Order each document's token set by ascending global
    document frequency (rarest first, token text as tiebreak — one global
    total order shared by all docs), and keep only the first
    ``p = n - ceil(t*n) + 1`` tokens as the document's *prefix*. Any pair
    with Jaccard >= t MUST share at least one prefix token (pigeonhole:
    disjoint prefixes leave fewer than ceil(t*n) tokens to overlap), so
    joining on prefix tokens alone loses no qualifying pair. Because
    prefixes hold each document's RAREST tokens, the join keys are
    low-frequency by construction — the hot-key blow-up the stop-shingle
    cap exists for cannot arise here. A size filter
    (100*min(n) >= t_pct*max(n), integer) prunes pairs no verify could
    accept (Jaccard <= min/max size ratio).

    ``threshold_pct`` is an integer percentage so the prefix-length and
    size-filter arithmetic is 64-bit integer only (bit-identical across
    engines): ceil(t*n) = (t_pct*n + 99) div 100.

    Shape at scale: two map-side-combinable aggregates (token df, doc
    size), one per-doc sort window for prefix positions, one equi-join on
    (rare) prefix tokens + DISTINCT. Feed the output to ``jaccard_pairs``
    as ``candidates`` for exact verification.
    """
    if not 1 <= threshold_pct <= 100:
        raise ValueError(f"threshold_pct={threshold_pct} not in [1, 100]")
    freq = shingle_df.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy(id_col).orderBy("df", "shingle")
    # Set size via an unordered count window over the SAME doc-keyed sort
    # shuffle that computes prefix positions — no separate sizes aggregate
    # + join.
    w_all = Window.partitionBy(id_col)
    ranked = (
        shingle_df.join(freq, "shingle")
        .withColumn("pos", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(w_all))
    )
    prefix_len = F.col("n") - F.expr(
        f"({threshold_pct} * n + 99) div 100"
    ) + F.lit(1)
    prefix = ranked.filter(F.col("pos") <= prefix_len)
    a = prefix.select(
        F.col(id_col).alias("id_a"), "shingle", F.col("n").alias("na")
    )
    b = prefix.select(
        F.col(id_col).alias("id_b"), "shingle", F.col("n").alias("nb")
    )
    return (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.lit(100) * F.least("na", "nb")
            >= F.lit(threshold_pct) * F.greatest("na", "nb")
        )
        .select("id_a", "id_b")
        .distinct()
    )


def containment_scores(
    shingle_df: DataFrame, id_col: str, threshold_pct: int
) -> DataFrame:
    """Directed containment scoring |A∩B| / |A| >= t with EXACT recall:
    (contained_id, container_id, i, na, nb) for every pair whose
    containment can reach ``t = threshold_pct / 100``.

    One-sided prefix filter (round-4 verdict #5): containment >= t
    means A misses at most n_a - ceil(t·n_a) of its shingles in B, so
    among A's p = n_a - ceil(t·n_a) + 1 globally-RAREST shingles at
    least one is in B (pigeonhole) — candidates probe only A's prefix
    against the FULL index of B (the container side carries no prefix
    constraint), replacing the Σ df(s)² inverted-index self-join with a
    Σ df_prefix(s)·df(s) join on low-df keys. Integer arithmetic:
    ceil(t·n) = (t_pct·n + 99) div 100.

    Verification is IN-ROW, not a re-join of the index: one doc-keyed
    aggregate builds each document's shingle array sorted by ascending
    global df (prefix = its leading slice — same aggregate, no window
    sort), candidates join the two ~set-sized arrays by id and
    i = size(array_intersect(...)) never leaves the row. The first
    prefix-filter draft verified by re-exploding each candidate by
    |A| shingles — Σ_cand |A| rows, measured 3.6x the OLD join's
    volume at 10x data; the array join carries |cand| rows total.
    A size filter (100·n_b >= t_pct·n_a, from |A∩B| <= |B|) prunes
    before the intersect. Shingles are per-doc DISTINCT (operators.
    dedup.shingles), so the array intersect equals the exploded
    count(*). Input should be persisted by the caller (it is read by
    the df aggregate, the doc-array aggregate, and the index side).
    """
    if not 1 <= threshold_pct <= 100:
        raise ValueError(f"threshold_pct={threshold_pct} not in [1, 100]")
    freq = shingle_df.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    docs = (
        shingle_df.join(freq, "shingle")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("df", "shingle"))).alias("srt"))
        .select(
            F.col(id_col).alias("doc"),
            F.transform("srt", lambda s: s["shingle"]).alias("arr"),
            F.size("srt").alias("n"),
        )
        # referenced three times (prefix explode + both verify sides):
        # persist, like minhash_dedup_pairs' per-doc summary — the
        # CacheManager dedupes identical plans across calls
        .persist()
    )
    plen = F.col("n") - F.expr(f"({threshold_pct} * n + 99) div 100") + F.lit(1)
    a = docs.select(
        F.col("doc").alias("contained_id"),
        F.explode(F.slice("arr", F.lit(1), plen)).alias("shingle"),
    )
    b = shingle_df.select(F.col(id_col).alias("container_id"), "shingle")
    cand = (
        a.join(b, "shingle")
        .filter(F.col("contained_id") != F.col("container_id"))
        .select("contained_id", "container_id")
        .distinct()
    )
    da = docs.select(
        F.col("doc").alias("contained_id"),
        F.col("arr").alias("arr_a"),
        F.col("n").alias("na"),
    )
    db = docs.select(
        F.col("doc").alias("container_id"),
        F.col("arr").alias("arr_b"),
        F.col("n").alias("nb"),
    )
    return (
        cand.join(da, "contained_id")
        .join(db, "container_id")
        .filter(F.lit(100) * F.col("nb") >= F.lit(threshold_pct) * F.col("na"))
        .select(
            "contained_id",
            "container_id",
            F.size(F.array_intersect("arr_a", "arr_b")).cast("bigint").alias("i"),
            "na",
            "nb",
        )
    )


def passage_windows(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """ALL overlapping k-token windows of the normalized text — unlike
    ``shingles`` these are NOT deduplicated, because passage mining counts
    occurrences. Narrow transform (no shuffle). Output: (id_col, passage).

    The tokenization is materialized behind a PROJECTION BOUNDARY before
    the window lambda (round-11 sf10 probe catch): a higher-order
    function's lambda is evaluated INTERPRETED with no common-
    subexpression elimination, so an inline ``split(normalize(text))``
    re-ran the full-document regex pipeline once per element_at — per
    window, per token — turning the op O(doc_len²) (invisible at sf0.1,
    a 25-minute wall at the 100× corpus; thread dumps showed every core
    inside Lower/RegExpReplace.nullSafeEval). CollapseProject keeps the
    boundary because the alias is non-trivial and referenced more than
    once; measured 4.2× on 600-token docs and asymptotically linear."""
    base = df.select(
        F.col(id_col),
        F.split(normalized_text(text_col), " ").alias("__toks"),
    )
    toks = F.col("__toks")
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    win = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + F.lit(j)) for j in range(k)]
        ),
    )
    return base.select(F.col(id_col), F.explode(win).alias("passage"))


def repeated_passages(
    windows: DataFrame, id_col: str, min_docs: int = 2
) -> DataFrame:
    """Cross-document repeated-passage mining (the C4/Pile-style exact
    substring dedup signal): group ALL k-token windows by content hash and
    keep passages appearing in >= min_docs distinct documents.

    Deliberately a pure aggregate — hot passages (boilerplate, licenses)
    produce ONE output row with large counts, never a pair explosion, so
    the op is scale-safe on any corpus. Shape: an EXPLICIT two-level
    aggregate — (hash, doc) partial counts, then per-hash rollup — not
    ``countDistinct`` mixed with plain aggregates, which Spark plans via
    an Expand that doubles the exploded window stream (the source of the
    old 2× run-to-run variance band: the doubled partial-agg state is
    what intermittently spilled). Both levels are map-side combinable.
    Output: (passage_hash, n_docs, n_occurrences, first_doc).
    """
    per_doc = (
        # shuffle on the 16-byte BINARY digest, not the 32-char hex
        # string — halves the key bytes through both exchanges; hex()
        # is restored (lowercase, = md5()) only on the final rows
        windows.select(
            F.unhex(F.md5("passage")).alias("ph"), F.col(id_col)
        )
        .groupBy("ph", id_col)
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    return (
        per_doc.groupBy("ph")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("occ").alias("n_occurrences"),
            F.min(id_col).alias("first_doc"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .select(
            F.lower(F.hex("ph")).alias("passage_hash"),
            "n_docs",
            "n_occurrences",
            "first_doc",
        )
    )


def passage_dup_fraction(
    windows: DataFrame, id_col: str, min_docs: int = 2
) -> DataFrame:
    """Per-document duplicated-passage fraction — the actual filter signal
    a training-data pipeline thresholds on ("drop docs >30% duplicated").

    A window counts as duplicated when its passage appears in >= min_docs
    distinct documents. The duplicated-passage set is an aggregate
    (bounded by distinct passages), joined back onto the window stream by
    content hash — an equi-join, no pairwise stage. dup_ppm is integer
    arithmetic (bit-identical across engines). Documents shorter than k
    tokens have no windows and are absent by construction.
    Output: (id_col, n_windows, n_dup_windows, dup_ppm).
    """
    hashed = windows.select(
        F.col(id_col), F.md5("passage").alias("passage_hash")
    )
    dup = (
        hashed.groupBy("passage_hash")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("passage_hash")
    )
    flagged = hashed.join(
        dup.withColumn("__dup", F.lit(1)), "passage_hash", "left"
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.count("__dup").alias("n_dup_windows"),
        )
        .withColumn("dup_ppm", F.expr("(n_dup_windows * 1000000) div n_windows"))
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    sort_key,
    block_cols: list[str],
    window: int = 3,
) -> DataFrame:
    """Sorted-neighborhood ER candidates: within each block, rows are
    sorted by ``sort_key`` (plus id tiebreak) and every pair within
    ``window`` positions becomes a candidate — the classic
    sorted-neighborhood method, complementing LSH (probabilistic),
    prefix filtering (exact for set similarity), and blocked
    all-pairs (exact within block): it finds near-sorted neighbors in
    O(n·w) pairs per block with no similarity function at all at the
    candidate stage.

    No self-join at all: the ``window`` following neighbors are read with
    ``lead(j)`` over the same sorted block window, so the rows are
    shuffled ONCE for the sort and candidates are generated in-row —
    exactly n·w pairs per block, never the O(block²) intermediate a
    block-keyed self-join would materialize before its position filter.
    Output: (id_a, id_b, key_a, key_b, pos_gap), id ordering follows the
    SORT order (a before b).
    """
    key = sort_key if isinstance(sort_key, Column) else F.col(sort_key)
    w = Window.partitionBy(*block_cols).orderBy("__key", id_col)
    ranked = df.select(*block_cols, F.col(id_col), key.alias("__key"))
    neighbors = F.array(
        *[
            F.struct(
                F.lead(id_col, j).over(w).alias("id_b"),
                F.lead("__key", j).over(w).alias("key_b"),
                F.lit(j).cast("int").alias("pos_gap"),
            )
            for j in range(1, window + 1)
        ]
    )
    return (
        ranked.select(
            F.col(id_col).alias("id_a"),
            F.col("__key").alias("key_a"),
            neighbors.alias("__nbs"),  # window exprs first …
        )
        .select("id_a", "key_a", F.explode("__nbs").alias("nb"))  # … then explode
        .filter(F.col("nb.id_b").isNotNull())
        .select(
            "id_a",
            F.col("nb.id_b").alias("id_b"),
            "key_a",
            F.col("nb.key_b").alias("key_b"),
            F.col("nb.pos_gap").alias("pos_gap"),
        )
    )


def suffix_window_hashes(
    df: DataFrame, text_col: str, id_col: str, k: int = 8
) -> DataFrame:
    """Positioned k-token window hashes: one row per window start,
    ``(id, pos, h)`` with 1-based ``pos`` and ``h = md5`` of the k
    space-joined tokens of the whitespace-normalized text. The shared
    front end of the exact-substring dedup pair (suffix_dup_spans /
    suffix_apply_dedup — Lee et al. 2022 arXiv:2107.06499). Docs
    shorter than ``k`` tokens produce no windows. Narrow map-only."""
    # tokens behind a projection boundary — `ws` sits INSIDE the window
    # lambda body, where an inline split(normalize) re-evaluates per
    # window (round-11 probe catch; see passage_windows)
    base = df.select(
        F.col(id_col),
        F.split(normalized_text(F.col(text_col)), " ").alias("__ws"),
    )
    ws = F.col("__ws")
    win = F.when(
        F.size(ws) < k,
        F.array().cast("array<struct<pos:bigint,h:string>>"),
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - (k - 1)),
            lambda i: F.struct(
                i.cast("bigint").alias("pos"),
                F.md5(F.array_join(F.slice(ws, i, k), " ")).alias("h"),
            ),
        )
    )
    return (
        base.select(F.col(id_col), F.explode(win).alias("w"))
        .select(id_col, "w.pos", "w.h")
    )


def _merge_dup_islands(
    wh: DataFrame, id_col: str, k: int, span_len_alias: str
) -> DataFrame:
    """Shared back half of both ExactSubstr detect variants: windows
    whose hash occurs >= 2 times anywhere in the corpus (including
    within one document) are merged per doc into maximal
    [span_start, span_end] unit ranges via the pos - row_number islands
    trick. One content-hash aggregate + one equi-join + one per-doc
    window — nothing pairwise."""
    dup = (
        wh.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("h")
    )
    hits = wh.join(dup, "h").select(id_col, "pos")
    isl = hits.withColumn(
        "grp",
        F.col("pos")
        - F.row_number().over(Window.partitionBy(id_col).orderBy("pos")),
    )
    return (
        isl.groupBy(id_col, "grp")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") + (k - 1)).cast("bigint").alias("span_end"),
            (F.max("pos") + k - F.min("pos")).cast("bigint").alias(span_len_alias),
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        )
        .select(id_col, "span_start", "span_end", span_len_alias, "n_windows")
    )


def suffix_dup_spans(
    df: DataFrame, text_col: str, id_col: str, k: int = 8
) -> DataFrame:
    """MAXIMAL duplicated-span extraction (detect half of ExactSubstr)
    at TOKEN granularity. Returns
    (id, span_start, span_end, span_tokens, n_windows)."""
    wh = suffix_window_hashes(df, text_col, id_col, k).persist()
    return _merge_dup_islands(wh, id_col, k, "span_tokens")


def suffix_char_window_hashes(
    df: DataFrame, text_col: str, id_col: str, k: int = 24
) -> DataFrame:
    """Positioned k-CHARACTER window hashes: one row per character
    start, ``(id, pos, h)`` with 1-based ``pos`` and ``h = md5`` of the
    k-char substring of the whitespace-normalized text — the
    byte-granularity ExactSubstr front end (Lee et al. 2022 match at
    UTF-8 byte level with a 50-byte minimum; character windows are the
    cross-engine-deterministic equivalent — identical for ASCII, and
    both Spark substring and DuckDB substr count CHARACTERS, so the
    oracle agrees on any input). Stricter than the token profile: a
    duplicated run need not start on a token boundary, and the minimum
    match is k characters rather than k whole tokens. Docs shorter than
    k chars produce no windows. Narrow map-only; each window recopies k
    chars (O(len·k) per doc) — at petabyte scale the same shape runs as
    a rolling/gear hash, which changes only this function's hash
    expression, not the span/apply machinery downstream."""
    # normalized text behind a projection boundary — `nrm` sits INSIDE
    # the per-character lambda body, where the inline regex pipeline
    # re-evaluates once per character position: O(len²) per doc
    # (round-11 probe catch; see passage_windows)
    base = df.select(
        F.col(id_col), normalized_text(F.col(text_col)).alias("__nrm")
    )
    nrm = F.col("__nrm")
    win = F.when(
        F.length(nrm) < k,
        F.array().cast("array<struct<pos:bigint,h:string>>"),
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(nrm) - (k - 1)),
            lambda i: F.struct(
                i.cast("bigint").alias("pos"),
                F.md5(F.substr(nrm, i, F.lit(k))).alias("h"),
            ),
        )
    )
    return (
        base.select(F.col(id_col), F.explode(win).alias("w"))
        .select(id_col, "w.pos", "w.h")
    )


def suffix_dup_spans_chars(
    df: DataFrame, text_col: str, id_col: str, k: int = 24
) -> DataFrame:
    """MAXIMAL duplicated-span extraction at CHARACTER granularity —
    the stricter ExactSubstr profile, sharing the islands machinery
    with the token variant. Returns
    (id, span_start, span_end, span_chars, n_windows) in 1-based
    character positions of the normalized text."""
    wh = suffix_char_window_hashes(df, text_col, id_col, k).persist()
    return _merge_dup_islands(wh, id_col, k, "span_chars")


def _apply_dedup_from_units(
    docs: DataFrame,
    wh: DataFrame,
    id_col: str,
    k: int,
    len_alias: str,
    sep: str,
) -> DataFrame:
    """Shared delete/reassemble machinery of both ExactSubstr apply
    variants. ``docs`` carries (id, us: array<string>) — the per-doc
    unit sequence (tokens or characters); ``wh`` the positioned window
    hashes over the same sequence. Drops every unit covered by a
    duplicated k-window occurrence that is not the canonical first one
    (lexicographic min (id, pos) per window hash), reassembles each doc
    joined on ``sep``. Docs reduced to zero units vanish."""
    agg = wh.groupBy("h").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))).alias("f"),
    )
    nonfirst = (
        wh.join(agg.filter(F.col("n") >= 2), "h")
        .filter(
            ~((F.col(id_col) == F.col("f.d")) & (F.col("pos") == F.col("f.p")))
        )
        .select(id_col, "pos")
    )
    removed = nonfirst.select(
        id_col,
        F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("tp"),
    ).distinct()
    toks = docs.select(
        F.col(id_col),
        F.size("us").cast("bigint").alias("__n_units"),
        F.posexplode("us").alias("p0", "tok"),
    ).select(
        id_col, "__n_units", (F.col("p0") + 1).cast("bigint").alias("tp"), "tok"
    )
    kept = toks.join(removed, [id_col, "tp"], "left_anti")
    return kept.groupBy(id_col).agg(
        F.min("__n_units").cast("bigint").alias(len_alias),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        (F.min("__n_units") - F.count(F.lit(1))).cast("bigint").alias("n_removed"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("tp", "tok"))),
                    lambda x: x["tok"],
                ),
                sep,
            )
        ).alias("kept_hash"),
    )


def suffix_apply_dedup(
    df: DataFrame, text_col: str, id_col: str, k: int = 8
) -> DataFrame:
    """APPLY half of ExactSubstr at TOKEN granularity: drop every token
    covered by a duplicated k-window occurrence that is not the
    canonical first one, reassemble each doc.
    Returns (id, n_tokens, n_kept, n_removed, kept_hash); docs reduced
    to zero tokens vanish. See dedup_suffix_apply for the scale notes.

    Empty-normalized docs are mapped to an EMPTY token array here (not
    the [''] that split('') yields), so the public operator never
    reports a phantom n_tokens=1 / kept_hash=md5('') — such docs simply
    vanish, matching the zero-tokens-vanish contract, without relying
    on any plan-level length>0 pre-filter."""
    nrm = normalized_text(F.col(text_col))
    docs = df.select(
        F.col(id_col),
        F.when(F.length(nrm) > 0, F.split(nrm, " "))
        .otherwise(F.array().cast("array<string>"))
        .alias("us"),
    ).persist()
    wh = suffix_window_hashes(
        docs.select(id_col, F.array_join("us", " ").alias("__t")), "__t", id_col, k
    ).persist()
    return _apply_dedup_from_units(docs, wh, id_col, k, "n_tokens", " ")


def suffix_apply_dedup_chars(
    df: DataFrame, text_col: str, id_col: str, k: int = 24
) -> DataFrame:
    """APPLY half of ExactSubstr at CHARACTER granularity — the
    stricter profile (duplicated runs need not start or end on token
    boundaries, minimum deleted match is k characters), sharing the
    delete/reassemble machinery with the token variant.
    Returns (id, n_chars, n_kept, n_removed, kept_hash) over the
    normalized text's character sequence; docs reduced to zero
    characters vanish."""
    nrm = normalized_text(F.col(text_col))
    docs = df.select(
        F.col(id_col),
        F.when(F.length(nrm) > 0, F.split(nrm, ""))
        .otherwise(F.array().cast("array<string>"))
        .alias("us"),
    ).persist()
    wh = suffix_char_window_hashes(df, text_col, id_col, k).persist()
    return _apply_dedup_from_units(docs, wh, id_col, k, "n_chars", "")
