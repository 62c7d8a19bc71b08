"""Multimodal-column queries: binary payloads + mapInPandas extraction.

``documents.text`` is packed into a binary column (utf-8 encode) to stand in
for an opaque media payload; the metadata extraction then runs through the
real Arrow/mapInPandas plumbing (multimodal.binary_ops). The oracle verifies
the byte-level facts with pure SQL.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..multimodal.binary_ops import (
    chunk_binary,
    decode_media_meta,
    extract_binary_meta,
    synthesize_media,
)
from .registry import register
from .util import t_cpu


@register(
    "multimodal_binary_meta",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(ascii(substring(text, 1, 1)) AS INT) AS first_byte
FROM documents
""",
    doc="Binary-column plumbing: utf-8 payload → Arrow-batched mapInPandas "
    "metadata extraction (stub decoder, real batch shape/schema/flow).",
    tags=("multimodal",),
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return extract_binary_meta(d, "doc_id", "payload")


@register(
    "multimodal_chunk_frames",
    oracle="""
SELECT doc_id,
       CAST(j AS INT) AS chunk_idx,
       CAST(octet_length(encode(substring(text, CAST(j * 256 + 1 AS BIGINT), 256))) AS BIGINT)
         AS n_bytes,
       CAST(ascii(substring(text, CAST(j * 256 + 1 AS BIGINT), 1)) AS INT) AS first_byte
FROM documents
CROSS JOIN unnest(range(0, CAST(ceil(length(text) / 256.0) AS BIGINT))) AS t(j)
""",
    doc="Frame-sample plumbing: payloads split into 256-byte windows via "
    "Arrow mapInPandas (the batch shape a video frame-sampler/audio "
    "segmenter emits). Oracle reconstructs the chunks with string "
    "arithmetic — valid because the corpus is pure ASCII (byte==char).",
    tags=("multimodal",),
)
def multimodal_chunk_frames(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return chunk_binary(d, "doc_id", "payload", chunk_size=256)


@register(
    "multimodal_decode_media",
    oracle="""
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS format,
       TRUE AS valid,
       CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 640 + 16 AS INT) END AS width,
       CASE WHEN doc_id % 2 = 0 THEN CAST((doc_id * 7) % 480 + 16 AS INT) END AS height,
       CASE WHEN doc_id % 2 = 0 THEN 4
            ELSE CAST(1 + (doc_id // 2) % 2 AS INT) END AS channels,
       CASE WHEN doc_id % 2 = 1 THEN CAST(8000 * (1 + doc_id % 3) AS INT) END AS sample_rate,
       CASE WHEN doc_id % 2 = 1
            THEN CAST(((100 + doc_id % 50) * 1000) // (8000 * (1 + doc_id % 3)) AS BIGINT)
       END AS duration_ms
FROM documents
""",
    doc="REAL binary decode roundtrip: spec-valid PNG/WAV payloads are "
    "synthesized per doc_id (struct-packed headers, CRC'd IHDR), then "
    "decode_media_meta parses them back — signature sniff, IHDR "
    "width/height/color-type, RIFF chunk walk with duration arithmetic. "
    "Every recovered field is a pure function of doc_id, so the oracle "
    "predicts the decoder's output byte-arithmetically. Two chained "
    "narrow mapInPandas stages, no shuffle.",
    tags=("multimodal", "decode"),
)
def multimodal_decode_media(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents").select("doc_id")
    payloads = synthesize_media(d, "doc_id")
    return decode_media_meta(payloads, "doc_id", "payload")


@register(
    "multimodal_patch_plan",
    oracle="""
WITH png AS (
  SELECT doc_id,
         CAST(doc_id % 640 + 16 AS BIGINT) AS w,
         CAST((doc_id * 7) % 480 + 16 AS BIGINT) AS h
  FROM documents WHERE doc_id % 2 = 0
), tiled AS (
  SELECT doc_id, w, h,
         (w + 15) // 16 AS npx, (h + 15) // 16 AS npy
  FROM png
), planned AS (
  SELECT doc_id,
         npx * 16 - w AS pad_x, npy * 16 - h AS pad_y,
         npx * npy + 1 AS seq_len
  FROM tiled
)
SELECT seq_len, CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(pad_x) AS BIGINT) AS pad_x_total,
       CAST(SUM(pad_y) AS BIGINT) AS pad_y_total
FROM planned GROUP BY 1
""",
    doc="Vision-tokenizer batch planning downstream of the REAL decode "
    "path: the spec-valid PNG payloads are synthesized and header-"
    "decoded (multimodal.binary_ops, Arrow mapInPandas), then each "
    "image's ViT tiling is computed from the RECOVERED width/height — "
    "16px patches, ceil tiling, +1 CLS token — and rolled up into the "
    "visual-sequence-length histogram (with total padding waste) that "
    "sizes multimodal training batches. The tiling arithmetic is pure "
    "integer built-ins on top of the decode, so everything after the "
    "two narrow mapInPandas stages stays in codegen with no extra "
    "shuffle beyond the final small aggregate. The oracle predicts "
    "the whole pipeline byte-arithmetically from doc_id (the decoder "
    "is the identity on the synthesizer's header fields — proven by "
    "multimodal_decode_media).",
    tags=("multimodal", "decode", "packing", "agg"),
)
def multimodal_patch_plan(spark: SparkSession, sf_dir: str):
    d = t_cpu(spark, sf_dir, "documents").select("doc_id")
    meta = decode_media_meta(synthesize_media(d, "doc_id"), "doc_id", "payload")
    png = meta.filter(F.col("format") == "png").select(
        "doc_id",
        F.col("width").cast("bigint").alias("w"),
        F.col("height").cast("bigint").alias("h"),
    )
    npx = F.expr("(w + 15) DIV 16")
    npy = F.expr("(h + 15) DIV 16")
    planned = png.select(
        "doc_id",
        (npx * 16 - F.col("w")).alias("pad_x"),
        (npy * 16 - F.col("h")).alias("pad_y"),
        (npx * npy + 1).alias("seq_len"),
    )
    return planned.groupBy("seq_len").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum("pad_x").cast("bigint").alias("pad_x_total"),
        F.sum("pad_y").cast("bigint").alias("pad_y_total"),
    )
