"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The reference has no binary/media types (SURVEY.md §1.3); this is the
LLM-data-pipeline extension. The design for 100 TB:

- media lives in a ``binary`` column (or an object-store path column with
  lazy fetch), metadata in sibling typed columns;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages — one Python worker pass per partition, never
  per-row UDF calls;
- partition sizing: binary rows are fat, so repartition by byte budget
  (``spark.sql.files.maxPartitionBytes``-style) before a decode stage, not
  by row count.

The actual image/audio decoders are NOT available in this environment, so
``decode_image_meta`` is a clearly-marked deterministic fake behind the same
batch interface a real decoder (PIL/ffmpeg) would use: the Spark-side
schema, batching, and partition flow are real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "doc_id bigint, n_bytes bigint, first_byte int"


def extract_binary_meta(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Arrow-batched metadata extraction over a binary column via
    mapInPandas. Narrow (no shuffle); output schema is fixed/typed.

    The decoder is nested inside the closure so cloudpickle serializes it
    by VALUE — executors never need this package on their PYTHONPATH
    (the external driver may launch Spark from any cwd).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fake_decode(payload: bytes) -> dict:
            # STUB decoder. A real implementation would parse the container
            # header (PNG/JPEG/WAV...) and return width/height/duration; the
            # fake returns deterministic byte-level facts so tests and
            # oracles can verify the plumbing end to end.
            return {
                "n_bytes": len(payload),
                "first_byte": payload[0] if payload else -1,
            }

        for pdf in batches:
            metas = pdf[payload_col].map(lambda b: fake_decode(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": metas.map(lambda m: m["n_bytes"]).astype("int64"),
                    "first_byte": metas.map(lambda m: m["first_byte"]).astype("int32"),
                }
            )

    return df.select(
        F.col(id_col), F.col(payload_col)
    ).mapInPandas(run, schema=META_SCHEMA)


CHUNK_SCHEMA = "doc_id bigint, chunk_idx int, n_bytes bigint, first_byte int"


def chunk_binary(
    df: DataFrame, id_col: str, payload_col: str, chunk_size: int = 256
) -> DataFrame:
    """Frame-sample-style chunking: split each binary payload into fixed
    ``chunk_size``-byte windows, one output row per chunk — the batch shape
    a video frame-sampler or audio segmenter produces. Arrow-batched
    mapInPandas; rows fan out ~len/chunk_size with no shuffle. Decoder
    nested for by-value pickling (see extract_binary_meta)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, firsts = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                for j in range(0, len(data), chunk_size):
                    chunk = data[j : j + chunk_size]
                    ids.append(int(doc_id))
                    idxs.append(j // chunk_size)
                    sizes.append(len(chunk))
                    firsts.append(chunk[0])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "first_byte": pd.Series(firsts, dtype="int32"),
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=CHUNK_SCHEMA
    )


def decode_image(df: DataFrame, payload_col: str) -> DataFrame:
    """Placeholder for real image decode (resize / pixel stats). The
    container has no image libraries, so this raises — the Spark-side
    pattern to follow is ``extract_binary_meta``."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not available in this "
        "environment; see extract_binary_meta for the mapInPandas pattern"
    )
