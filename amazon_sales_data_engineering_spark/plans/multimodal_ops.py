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
