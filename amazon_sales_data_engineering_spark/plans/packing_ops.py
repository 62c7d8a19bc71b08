"""Training-shard export family: sequence packing, deterministic
shuffle-shard assignment, and table profiling.

The last mile of a pre-training data pipeline: cleaned documents are
packed into fixed-length context windows, shuffled, and written out as
numbered shards; table profiling is the QA pass that runs before and
after. Design rules at scale:

- **Packing is per-shard, never global.** Concatenating a 100 TB corpus
  into one token stream needs a global cumulative sum — a single-
  partition window. Real packers shard first (hash of doc id), then pack
  within each shard independently: the cumulative-offset window
  partitions by shard_id, so every shard packs in parallel and the plan
  has exactly one hash-partitioned sort shuffle. Cross-shard window
  boundaries don't exist by construction.
- **"Shuffle" means a deterministic permutation, not rand().** The
  within-shard order is a multiplicative integer hash of the doc id
  (distinct constant from the sampling hash so sample/shuffle decisions
  are uncorrelated) — task retries, speculation, and re-runs produce the
  identical shard layout, and any engine with 64-bit integers reproduces
  it. This is what makes shard export resumable.
- **Profiling is one pass.** All per-column stats (rows, nulls, exact
  distincts, min/max) compute in a single scan-aggregate, then unpivot
  to one row per column. The oracle scans once per column instead —
  same answer, but the Spark plan is the one you'd run on 100 TB.
- All arithmetic is integer (token counts, offsets, window indices), so
  every value is engine-exact; min/max surface as strings via the
  shortest-repr double print, which Spark and DuckDB share below 1e7
  magnitude (above that Spark switches to scientific notation — the
  profiled columns are bounded well under it).

Reference parity surface: extends the stage-export conventions of
/root/reference/step_3_load_from_stage_to_source.py (numbered batch
files, re-runnable loads) to training-shard layout (SURVEY §2 LLM
extensions).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from .registry import register
from .util import t, t_cpu

# Same normalization contract as corpus_ops/text_ops.
_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def _norm(c):
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


# Knuth multiplicative hashes; the % 2^31 pre-fold keeps the product in
# int64 for arbitrary ids. 2654435761 is the sampling constant
# (corpus_ops); 2246822519 (xxhash prime) keeps the shuffle permutation
# independent of sampling decisions.
_SHUFFLE_CONST = 2246822519


@register(
    "pack_sequences_sharded",
    oracle=f"""
WITH m AS (
  SELECT doc_id,
         CAST(CASE WHEN length({_NORM_SQL}) = 0 THEN 0
              ELSE length({_NORM_SQL})
                   - length(replace({_NORM_SQL}, ' ', '')) + 1 END AS BIGINT)
           AS n_tokens,
         ((doc_id % 2147483648) * 2654435761) % 16 AS shard_id
  FROM documents
), packed AS (
  SELECT doc_id, shard_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard_id ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_off
  FROM m
)
SELECT doc_id, shard_id, n_tokens, start_off,
       start_off + n_tokens AS end_off,
       CAST(floor(start_off / 256.0) AS BIGINT) AS first_window,
       CAST(CASE WHEN n_tokens = 0 THEN floor(start_off / 256.0)
            ELSE floor((start_off + n_tokens - 1) / 256.0) END AS BIGINT)
         AS last_window
FROM packed
""",
    doc="Sequence packing into 256-token context windows, sharded 16 "
    "ways by a deterministic hash of doc_id. Each document gets its "
    "byte^W token offset range within its shard's concatenated stream "
    "plus the first/last window indices it lands in (a doc spanning a "
    "window boundary appears in both — the packer's overlap map). The "
    "cumulative sum partitions BY SHARD, so the only shuffle is one "
    "hash-partition sort and shards pack in parallel — the global-"
    "stream formulation would be a single-partition window and is "
    "deliberately not expressible here. All integer arithmetic.",
    tags=("corpus", "packing", "window"),
    bench=True,
)
def pack_sequences_sharded(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents")
    norm = _norm(F.col("text"))
    ntok = (
        F.when(F.length(norm) == 0, F.lit(0))
        .otherwise(F.length(norm) - F.length(F.regexp_replace(norm, " ", "")) + 1)
        .cast("bigint")
    )
    shard = ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)) % F.lit(16)
    m = d.select(
        "doc_id", ntok.alias("n_tokens"), shard.alias("shard_id")
    )
    w = (
        Window.partitionBy("shard_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    packed = m.withColumn("start_off", start)
    end = F.col("start_off") + F.col("n_tokens")
    first_w = F.floor(F.col("start_off") / 256.0).cast("bigint")
    last_w = (
        F.when(F.col("n_tokens") == 0, first_w)
        .otherwise(F.floor((end - 1) / 256.0))
        .cast("bigint")
    )
    return packed.select(
        "doc_id",
        "shard_id",
        "n_tokens",
        "start_off",
        end.alias("end_off"),
        first_w.alias("first_window"),
        last_w.alias("last_window"),
    )


@register(
    "export_shuffle_shards",
    oracle=f"""
WITH h AS (
  SELECT doc_id,
         ((doc_id % 2147483648) * {_SHUFFLE_CONST}) % 4294967296 AS scramble
  FROM documents
)
SELECT doc_id,
       scramble % 8 AS shard_id,
       CAST(row_number() OVER (
         PARTITION BY scramble % 8 ORDER BY scramble, doc_id) AS BIGINT)
         AS pos_in_shard
FROM h
""",
    doc="Deterministic shuffle-shard export layout: every document gets "
    "a shard (hash mod 8) and a position inside it (rank by a second "
    "multiplicative hash — the 'shuffle' — with doc_id as the total "
    "tie-break). No rand(): retries, speculation, and re-runs emit the "
    "byte-identical shard layout, which is what makes a 100 TB export "
    "resumable after a partial failure. One hash-partitioned sort "
    "shuffle; shards are independent and write in parallel (the file "
    "write itself is sinks.partitioned_sink).",
    tags=("corpus", "packing", "shuffle"),
)
def export_shuffle_shards(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    scramble = (
        (F.col("doc_id") % F.lit(2147483648)) * F.lit(_SHUFFLE_CONST)
    ) % F.lit(4294967296)
    h = d.select("doc_id", scramble.alias("scramble"))
    shard = F.col("scramble") % 8
    w = Window.partitionBy(shard).orderBy("scramble", "doc_id")
    return h.select(
        "doc_id",
        shard.alias("shard_id"),
        F.row_number().over(w).cast("bigint").alias("pos_in_shard"),
    )


_PROFILE_COLS = ("o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice")


@register(
    "table_profile",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{c}' AS column_name,
       COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_val,
       CAST(MAX({c}) AS VARCHAR) AS max_val
FROM orders"""
        for c in _PROFILE_COLS
    ),
    doc="Table profiling: per-column row/null/exact-distinct counts and "
    "min/max, one output row per profiled column. The Spark plan "
    "computes ALL columns' stats in a single scan-aggregate (one job, "
    "one pass — the shape that matters when the table is 100 TB), then "
    "unpivots the 1-row aggregate via stack(); the oracle scans per "
    "column instead, same answer. min/max surface as strings: both "
    "engines print the shortest-repr double identically below 1e7 "
    "(o_totalprice is bounded ~5e5; above 1e7 Spark would switch to "
    "scientific notation and this idiom would not compare). Exact "
    "count_distinct over multiple columns in one agg expands to "
    "expand+partial-agg — still map-side-combinable.",
    tags=("profile", "agg"),
)
def table_profile(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(F.col(c))).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    one = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(column_name, n_nulls, n_distinct, min_val, max_val)",
        "n_rows",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")


@register(
    "chunk_documents_overlap",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split({{norm}}, ' ') AS tk
  FROM documents
  WHERE length({{norm}}) > 0
)
SELECT doc_id,
       CAST(s.i AS BIGINT) AS chunk_idx,
       array_to_string(list_slice(tk, s.i * 40 + 1, s.i * 40 + 50), ' ')
         AS chunk_text,
       CAST(LEAST(len(tk) - s.i * 40, 50) AS BIGINT) AS n_tokens
FROM toks,
     unnest(range(0, CASE WHEN len(tk) <= 50 THEN 1
                     ELSE CAST(ceil((len(tk) - 50) / 40.0) AS BIGINT) + 1
                     END)) AS s(i)
""".replace("{norm}", "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"),
    doc="Sliding-window document chunking (window 50 tokens, stride 40 — "
    "10-token overlap), the context-length splitter every pre-training "
    "pipeline runs before packing. Chunk count per doc is "
    "ceil((n-50)/40)+1 (one chunk for short docs), so the LAST chunk is "
    "the only short one and every token lands in >= 1 chunk. Pure "
    "map-side: the token array never leaves the row until the final "
    "explode, no shuffle at all — the narrow 100 TB shape. Slice "
    "arithmetic is integer-only; text reassembly via array_join is "
    "byte-identical on both engines.",
    tags=("corpus", "packing", "text"),
)
def chunk_documents_overlap(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    toks = (
        d.select("doc_id", norm.alias("norm"))
        .filter(F.length("norm") > 0)
        .select("doc_id", F.split(F.col("norm"), " ").alias("tk"))
    )
    n = F.size("tk")
    n_chunks = F.when(n <= 50, F.lit(1)).otherwise(
        F.ceil((n - F.lit(50)) / F.lit(40.0)).cast("bigint") + 1
    )
    chunked = toks.select(
        "doc_id",
        "tk",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * 40
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.array_join(F.slice("tk", start + 1, 50), " ").alias("chunk_text"),
        F.least(F.size("tk") - start, F.lit(50)).cast("bigint").alias(
            "n_tokens"
        ),
    )


@register(
    "padding_waste_by_bucket",
    oracle=f"""
WITH m AS (
  SELECT CAST(CASE WHEN length({_NORM_SQL}) = 0 THEN 0
              ELSE length({_NORM_SQL})
                   - length(replace({_NORM_SQL}, ' ', '')) + 1 END AS BIGINT)
           AS n_tokens
  FROM documents
), b AS (
  SELECT n_tokens, (n_tokens - 1) // 16 AS bucket_id
  FROM m WHERE n_tokens > 0
)
SELECT bucket_id,
       (bucket_id + 1) * 16 AS bucket_max,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       CAST((bucket_id + 1) * 16 * COUNT(*) - SUM(n_tokens) AS BIGINT)
         AS sum_padding,
       CAST((((bucket_id + 1) * 16 * COUNT(*) - SUM(n_tokens)) * 1000)
            // ((bucket_id + 1) * 16 * COUNT(*)) AS BIGINT) AS waste_milli
FROM b
GROUP BY 1
""",
    doc="Length-bucketed batching efficiency: documents are binned into "
    "width-16 token-length buckets (the dynamic-batching strategy that "
    "pads each sequence to its bucket's max instead of the global max), "
    "and the padding overhead per bucket is reported in integer "
    "milli-units. This is the measurement that justifies bucketed "
    "batching in a training pipeline: waste_milli of the top bucket vs "
    "a single global pad length. One map-side-combinable aggregate over "
    "a narrow projection — at 100 TB the scan is the whole cost, and "
    "the n_tokens arithmetic never leaves the row. Complements "
    "pack_sequences_sharded (which ELIMINATES padding by concatenation) "
    "with the padded-batching profile. All-integer: engine-exact.",
    tags=("packing", "corpus", "agg"),
)
def padding_waste_by_bucket(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents")
    norm = _norm(F.col("text"))
    ntok = (
        F.when(F.length(norm) == 0, F.lit(0))
        .otherwise(
            F.length(norm) - F.length(F.regexp_replace(norm, " ", "")) + 1
        )
        .cast("bigint")
    )
    b = d.select(ntok.alias("n_tokens")).filter(F.col("n_tokens") > 0)
    b = b.withColumn("bucket_id", F.expr("(n_tokens - 1) div 16"))
    slots = (F.col("bucket_id") + 1) * 16 * F.col("n_docs")
    return (
        b.groupBy("bucket_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .select(
            "bucket_id",
            ((F.col("bucket_id") + 1) * 16).alias("bucket_max"),
            "n_docs",
            "sum_tokens",
            (slots - F.col("sum_tokens")).alias("sum_padding"),
            F.expr(
                "(((bucket_id + 1) * 16 * n_docs - sum_tokens) * 1000)"
                " div ((bucket_id + 1) * 16 * n_docs)"
            ).alias("waste_milli"),
        )
    )


@register(
    "export_shard_manifest",
    oracle=f"""
WITH m AS (
  SELECT doc_id,
         ((doc_id % 2147483648) * 2654435761) % 16 AS shard_id,
         md5({_NORM_SQL}) AS fp,
         CAST(CASE WHEN length({_NORM_SQL}) = 0 THEN 0
              ELSE length({_NORM_SQL})
                   - length(replace({_NORM_SQL}, ' ', '')) + 1 END AS BIGINT)
           AS n_tokens
  FROM documents
),
numbered AS (
  SELECT *, (row_number() OVER (PARTITION BY shard_id ORDER BY doc_id) - 1)
            // 1024 AS block_id
  FROM m
),
blocks AS (
  SELECT shard_id, block_id,
         md5(string_agg(fp, '' ORDER BY doc_id)) AS block_md5,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         CAST(min(doc_id) AS BIGINT) AS min_doc_id,
         CAST(max(doc_id) AS BIGINT) AS max_doc_id
  FROM numbered GROUP BY 1, 2
)
SELECT shard_id,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(min(min_doc_id) AS BIGINT) AS min_doc_id,
       CAST(max(max_doc_id) AS BIGINT) AS max_doc_id,
       md5(string_agg(block_md5, '' ORDER BY block_id)) AS manifest_md5
FROM blocks GROUP BY 1
""",
    doc="Shard reproducibility MANIFEST — the artifact a training run "
    "records beside its data card so a rebuilt corpus can be proven "
    "byte-identical: per export shard (the pack_sequences_sharded "
    "hash sharding), doc/token counts, the id range, and a MERKLE "
    "checksum — md5 over 1024-doc block digests, each block digest "
    "md5 over the docs' content fingerprints in doc_id order. The "
    "two-level tree is the scale shape: a flat ordered fold over a "
    "shard would collect every fingerprint of a 100 TB shard into "
    "one aggregation buffer, while blocks bound the ordered state at "
    "1024 x 32 bytes per group and the shard level folds only block "
    "digests (at deeper scale, add levels — same recurrence). "
    "Determinism: ordering keys are explicit (doc_id, then block_id), "
    "so both engines fold identical byte sequences; any single-doc "
    "content change flips its block digest and the shard manifest.",
    tags=("layout", "corpus", "export", "audit"),
)
def export_shard_manifest(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    norm = _norm(F.col("text"))
    ntok = (
        F.when(F.length(norm) == 0, F.lit(0))
        .otherwise(F.length(norm) - F.length(F.regexp_replace(norm, " ", "")) + 1)
        .cast("bigint")
    )
    m = t_cpu(spark, sf_dir, "documents").select(
        "doc_id",
        (((F.col("doc_id") % 2147483648) * 2654435761) % 16).alias("shard_id"),
        F.md5(norm).alias("fp"),
        ntok.alias("n_tokens"),
    )
    numbered = m.withColumn(
        "block_id",
        (
            (
                F.row_number().over(
                    Window.partitionBy("shard_id").orderBy("doc_id")
                )
                - 1
            )
            / 1024
        ).cast("bigint"),
    )
    blocks = numbered.groupBy("shard_id", "block_id").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "fp"))),
                    lambda x: x["fp"],
                ),
                "",
            )
        ).alias("block_md5"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
        F.max("doc_id").cast("bigint").alias("max_doc_id"),
    )
    return blocks.groupBy("shard_id").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.min("min_doc_id").cast("bigint").alias("min_doc_id"),
        F.max("max_doc_id").cast("bigint").alias("max_doc_id"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("block_id", "block_md5"))),
                    lambda x: x["block_md5"],
                ),
                "",
            )
        ).alias("manifest_md5"),
    )
