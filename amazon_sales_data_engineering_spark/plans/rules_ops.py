"""Corpus-gating rule batteries and frequency profiling — the
"quality-rules" pass a pre-training pipeline runs between raw text and
the training mix (Gopher-style heuristic filters, corpus heavy-hitter
vocabulary stats, time-weighted event values, per-dimension embedding
clip bounds).

Design rules at scale (same contract as the sibling plan modules):

- **Everything per-document stays in-row.** The Gopher rule battery is
  computed with array functions and an in-row ``aggregate`` fold over
  the token array — zero explode, zero shuffle; the scan is the plan.
  At 100 TB this is the difference between a map-only pass and an
  explode that multiplies the shuffle by mean document length.
- **Ratios are integer fixed-point** (permille via ``floor(a*1000/b)``)
  so rule thresholds compare engine-exact integers, never floats.
- **Heavy hitters are exact, not sketched**: token counts are a
  two-level aggregate (map-side combine shrinks each partition to its
  local vocabulary before the shuffle), and the corpus total is an
  aggregate of the *aggregated* counts — vocabulary-sized, broadcast
  back. The sketched alternative (count-min) trades exactness for a
  fixed-width summary; at vocabulary cardinalities (≤ millions) the
  exact path is already cheap, which is why it is the default here.
- **Time-weighted sums cross the aggregation boundary as exact
  decimals** (value quantized at source scale × integer microsecond
  weights), then ONE string-routed cast to double and ONE IEEE
  division — deterministic on any engine.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from .registry import register
from .util import t, t_cpu

_NORM_SPARK = lambda c: F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))  # noqa: E731
_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@register(
    "corpus_gopher_rules",
    oracle=f"""
WITH base AS (
  SELECT doc_id, {_NORM_SQL} AS norm,
         CASE WHEN length({_NORM_SQL}) = 0 THEN []::VARCHAR[]
              ELSE string_split({_NORM_SQL}, ' ') END AS toks
  FROM documents
), m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
         CAST(length(replace(norm, ' ', '')) AS BIGINT) AS n_nonspace,
         CAST(len(list_filter(toks,
                              x -> x IN ('the', 'a', 'and', 'of'))) AS BIGINT) AS n_stop
  FROM base
), tok AS (
  SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS tok
  FROM base WHERE len(toks) > 0
), marked AS (
  SELECT doc_id, pos,
         CASE WHEN lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) = tok
              THEN 0 ELSE 1 END AS brk
  FROM tok
), runs AS (
  SELECT doc_id, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
  FROM marked
), runlen AS (
  SELECT doc_id, run_id, COUNT(*) AS rl FROM runs GROUP BY 1, 2
), mr AS (
  SELECT doc_id, CAST(MAX(rl) AS BIGINT) AS max_run FROM runlen GROUP BY 1
), j AS (
  SELECT m.doc_id, m.n_tokens, m.n_distinct,
         COALESCE(mr.max_run, 0) AS max_run,
         CASE WHEN m.n_tokens = 0 THEN NULL
              ELSE CAST(floor((m.n_nonspace * 1000.0) / m.n_tokens) AS BIGINT)
         END AS wordlen_milli,
         CASE WHEN m.n_tokens = 0 THEN NULL
              ELSE CAST(floor((m.n_distinct * 1000.0) / m.n_tokens) AS BIGINT)
         END AS ttr_milli,
         CASE WHEN m.n_tokens = 0 THEN NULL
              ELSE CAST(floor((m.n_stop * 1000.0) / m.n_tokens) AS BIGINT)
         END AS stop_milli
  FROM m LEFT JOIN mr ON m.doc_id = mr.doc_id
)
SELECT doc_id, n_tokens, wordlen_milli, ttr_milli, stop_milli, max_run,
       (n_tokens >= 20 AND n_tokens <= 100000) AS ok_len,
       (wordlen_milli IS NOT NULL
        AND wordlen_milli >= 3800 AND wordlen_milli <= 10000) AS ok_wordlen,
       (ttr_milli IS NOT NULL AND ttr_milli >= 300) AS ok_ttr,
       (stop_milli IS NOT NULL AND stop_milli >= 10) AS ok_stop,
       (max_run <= 3) AS ok_run,
       ((n_tokens >= 20 AND n_tokens <= 100000)
        AND wordlen_milli IS NOT NULL
        AND wordlen_milli >= 3800 AND wordlen_milli <= 10000
        AND ttr_milli >= 300 AND stop_milli >= 10 AND max_run <= 3) AS keep
FROM j
""",
    doc="Gopher-style heuristic quality gate (Rae et al. 2021, table A1 "
    "re-expressed for this corpus): per-document token-count bounds, "
    "mean-word-length band, type-token ratio, stopword-density floor, "
    "and a max consecutive-repeated-token run — each emitted as a "
    "boolean rule flag plus the conjunctive keep decision, so the "
    "pipeline can audit WHY a document was dropped (rule ablation), "
    "not just that it was. Shape at scale: entirely in-row — the "
    "repeated-run length is an aggregate() fold over the token array "
    "(state = (prev, run, best)), NOT an explode+window, so the whole "
    "battery is a map-only pass with zero shuffle; ratios are integer "
    "permille so thresholds are engine-exact. The oracle re-derives "
    "max_run with an explicit unnest + gaps-islands window, proving "
    "the in-row fold against the classical formulation.",
    tags=("corpus", "text", "filter", "rules"),
    bench=True,
)
def corpus_gopher_rules(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents")
    norm = _NORM_SPARK(F.col("text"))
    toks = F.when(F.length(norm) == 0, F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )
    base = d.select("doc_id", norm.alias("norm"), toks.alias("toks"))

    n_tokens = F.size("toks").cast("bigint")
    n_distinct = F.size(F.array_distinct("toks")).cast("bigint")
    n_nonspace = F.length(F.regexp_replace(F.col("norm"), " ", "")).cast("bigint")
    n_stop = F.size(
        F.filter(F.col("toks"), lambda x: x.isin("the", "a", "and", "of"))
    ).cast("bigint")

    # Longest run of the same token, as a single in-row fold:
    # state = (prev token, current run length, best run length).
    zero = F.lit(0).cast("bigint")
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        zero.alias("run"),
        zero.alias("best"),
    )

    def step(a, x):
        run = (
            F.when(x == a["prev"], a["run"] + F.lit(1).cast("bigint"))
            .otherwise(F.lit(1).cast("bigint"))
        )
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(a["best"], run).alias("best")
        )

    max_run = F.aggregate(F.col("toks"), acc0, step, lambda a: a["best"])

    denom = F.when(n_tokens == 0, F.lit(None)).otherwise(n_tokens)
    wordlen_milli = F.floor((n_nonspace * F.lit(1000.0)) / denom).cast("bigint")
    ttr_milli = F.floor((n_distinct * F.lit(1000.0)) / denom).cast("bigint")
    stop_milli = F.floor((n_stop * F.lit(1000.0)) / denom).cast("bigint")

    m = base.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        wordlen_milli.alias("wordlen_milli"),
        ttr_milli.alias("ttr_milli"),
        stop_milli.alias("stop_milli"),
        max_run.alias("max_run"),
    )
    ok_len = (F.col("n_tokens") >= 20) & (F.col("n_tokens") <= 100000)
    ok_wordlen = (
        F.col("wordlen_milli").isNotNull()
        & (F.col("wordlen_milli") >= 3800)
        & (F.col("wordlen_milli") <= 10000)
    )
    ok_ttr = F.col("ttr_milli").isNotNull() & (F.col("ttr_milli") >= 300)
    ok_stop = F.col("stop_milli").isNotNull() & (F.col("stop_milli") >= 10)
    ok_run = F.col("max_run") <= 3
    return m.select(
        "doc_id", "n_tokens", "wordlen_milli", "ttr_milli", "stop_milli", "max_run",
        ok_len.alias("ok_len"),
        ok_wordlen.alias("ok_wordlen"),
        ok_ttr.alias("ok_ttr"),
        ok_stop.alias("ok_stop"),
        ok_run.alias("ok_run"),
        (ok_len & ok_wordlen & ok_ttr & ok_stop & ok_run).alias("keep"),
    )


@register(
    "token_heavy_hitters",
    oracle=f"""
WITH tok AS (
  SELECT unnest(string_split({_NORM_SQL}, ' ')) AS token
  FROM documents WHERE length({_NORM_SQL}) > 0
), counts AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY 1
), tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM counts
)
SELECT token, cnt, n_total,
       CAST(floor((cnt * 1000.0) / n_total) AS BIGINT) AS permille
FROM counts, tot
WHERE cnt * 50 >= n_total
""",
    doc="Exact corpus heavy hitters: tokens holding >= 2% of all token "
    "occurrences, with their exact permille share. The >= test is the "
    "integer cross-multiplication cnt*50 >= total (no float compare). "
    "Shape at scale: explode -> two-level hash aggregate (map-side "
    "combine reduces each partition to its local vocabulary, so the "
    "shuffle carries vocab-sized partials, not token occurrences); the "
    "corpus total is then an aggregate OVER the aggregated counts — a "
    "vocabulary-sized second pass broadcast back as one row, never a "
    "second scan of the corpus. This is the exact-counting baseline "
    "the count-min/Misra-Gries sketches approximate; at vocabulary "
    "cardinality the exact two-phase plan is already one shuffle.",
    tags=("text", "corpus", "agg", "heavy-hitters"),
)
def token_heavy_hitters(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents")
    norm = _NORM_SPARK(F.col("text"))
    toks = d.filter(F.length(norm) > 0).select(
        F.explode(F.split(norm, " ")).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * 50 >= F.col("n_total"))
        .select(
            "token",
            "cnt",
            "n_total",
            F.floor((F.col("cnt") * F.lit(1000.0)) / F.col("n_total"))
            .cast("bigint")
            .alias("permille"),
        )
    )


@register(
    "events_time_weighted_avg",
    oracle="""
WITH w AS (
  SELECT user_id, value, ts,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
), d AS (
  SELECT user_id,
         CAST(value AS DECIMAL(18,6)) AS v,
         epoch_us(nxt) - epoch_us(ts) AS dur_us
  FROM w WHERE nxt IS NOT NULL
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(dur_us) AS BIGINT) AS total_dur_us,
       CAST(CAST(SUM(v * dur_us) AS VARCHAR) AS DOUBLE)
         / CAST(CAST(SUM(dur_us) AS BIGINT) AS DOUBLE) AS twa_value
FROM d
GROUP BY 1
""",
    doc="Time-weighted average of a sampled value per user: each "
    "observation is held until the next one (step interpolation), so "
    "its weight is the interval to the successor in integer "
    "microseconds (timestampdiff — timezone-independent for NTZ wall "
    "times and instant-exact for TIMESTAMP). The weighted sum crosses "
    "the aggregation as an exact DECIMAL (source-scale value x integer "
    "micros), is printed to a string (exact digits), parsed back to "
    "double (correctly rounded in both engines), and divided ONCE — "
    "the only IEEE op, on bit-identical operands. Shape at scale: one "
    "sort shuffle on user_id for the lead() window, then a map-side-"
    "combinable aggregate on the same key — AQE coalesces the two "
    "into one exchange.",
    tags=("events", "temporal", "window", "agg"),
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = (
        e.withColumn("nxt", F.lead("ts").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(
            "user_id",
            F.col("value").cast("decimal(18,6)").alias("v"),
            F.expr("timestampdiff(MICROSECOND, ts, nxt)").alias("dur_us"),
        )
    )
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dur_us").cast("bigint").alias("total_dur_us"),
        (
            F.sum(F.col("v") * F.col("dur_us")).cast("string").cast("double")
            / F.sum("dur_us").cast("bigint").cast("double")
        ).alias("twa_value"),
    )


@register(
    "embedding_clip_bounds",
    oracle="""
WITH x AS (
  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
)
SELECT dim,
       PERCENTILE_DISC(0.01) WITHIN GROUP (ORDER BY val) AS p01,
       PERCENTILE_DISC(0.99) WITHIN GROUP (ORDER BY val) AS p99,
       MIN(val) AS vmin,
       MAX(val) AS vmax,
       CAST(COUNT(*) AS BIGINT) AS n_values
FROM x
GROUP BY 1
""",
    doc="Per-dimension clip bounds for embedding post-processing "
    "(outlier clamping before quantization): exact p01/p99 via "
    "PERCENTILE_DISC — discrete percentiles SELECT an actual stored "
    "float (cast to double exactly), zero interpolation arithmetic, so "
    "bounds are engine-exact. Shape at scale: posexplode fans each "
    "vector into d rows, but the aggregate keys on dim (fixed, small "
    "cardinality d), so the shuffle after map-side partials is O(d x "
    "partitions) — independent of corpus size; the exact percentile "
    "materializes per-dim value lists only at the final d reducers. "
    "For unbounded-cardinality keys the approx_percentile sketch path "
    "(approx_distinct_sketch) is the alternative.",
    tags=("similarity", "embedding", "profile", "percentile"),
)
def embedding_clip_bounds(spark: SparkSession, sf_dir: str):
    v = t(spark, sf_dir, "embeddings")
    x = v.select(F.posexplode("embedding").alias("dim", "f")).select(
        F.col("dim").cast("bigint").alias("dim"),
        F.col("f").cast("double").alias("val"),
    )
    pd_ = lambda p: F.expr(  # noqa: E731
        f"percentile_disc({p}) WITHIN GROUP (ORDER BY val)"
    )
    return x.groupBy("dim").agg(
        pd_(0.01).alias("p01"),
        pd_(0.99).alias("p99"),
        F.min("val").alias("vmin"),
        F.max("val").alias("vmax"),
        F.count(F.lit(1)).alias("n_values"),
    )
