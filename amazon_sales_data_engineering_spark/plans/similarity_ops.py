"""Similarity-search queries over the ``embeddings`` table (array<float>,
64-dim). Brute-force cosine top-k is the exact baseline; sign-bucket LSH is
the approximate scale path. Implementations in operators.similarity.

Determinism: dot products are sequential left-folds in double precision on
both engines; outputs carry only (probe_id, neighbor_id, rank) so a
last-ulp disagreement can only matter on an exact score tie, which the
id-ascending tiebreak resolves identically.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import cosine_topk, lsh_bucket_topk
from .registry import register
from .util import t

_V = """
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
"""

_COS = """
  list_sum(list_transform(range(1, len(pe) + 1), i -> pe[i] * e[i]))
  / (sqrt(list_sum(list_transform(pe, x -> x * x)))
     * sqrt(list_sum(list_transform(e, x -> x * x))))
"""


@register(
    "ann_cosine_topk",
    oracle=f"""
WITH v AS ({_V}),
p AS (SELECT vec_id AS probe_id, e AS pe FROM v WHERE vec_id % 100 = 0),
scored AS (
  SELECT probe_id, v.vec_id AS neighbor_id, {_COS} AS cos
  FROM p, v
  WHERE v.vec_id <> probe_id
)
SELECT probe_id, neighbor_id, CAST(rn AS INT) AS rank FROM (
  SELECT probe_id, neighbor_id,
         row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS rn
  FROM scored
) WHERE rn <= 5
""",
    doc="Brute-force cosine top-5 per probe (probe set: vec_id % 100 = 0): "
    "broadcast probes × streamed corpus, zip_with/aggregate JVM-side dot "
    "products, per-probe ranking. The exact ANN baseline.",
    tags=("similarity",),
    bench=True,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str):
    v = t(spark, sf_dir, "embeddings")
    probes = v.filter(F.col("vec_id") % 100 == 0)
    return cosine_topk(v, probes, id_col="vec_id", vec_col="embedding", k=5)


@register(
    "ann_lsh_buckets",
    oracle=f"""
WITH raw AS (
  SELECT vec_id, embedding,
         CAST((CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
            + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
            + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
            + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END)
            + (CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END)
            + (CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END)
            + (CASE WHEN embedding[7] >= 0 THEN 64 ELSE 0 END)
            + (CASE WHEN embedding[8] >= 0 THEN 128 ELSE 0 END) AS INT) AS bucket,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
p AS (SELECT vec_id AS probe_id, bucket, e AS pe FROM raw WHERE vec_id % 100 = 0),
scored AS (
  SELECT probe_id, raw.vec_id AS neighbor_id, {_COS} AS cos
  FROM p JOIN raw USING (bucket)
  WHERE raw.vec_id <> probe_id
)
SELECT probe_id, neighbor_id, CAST(rn AS INT) AS rank FROM (
  SELECT probe_id, neighbor_id,
         row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS rn
  FROM scored
) WHERE rn <= 3
""",
    doc="Sign-bucket LSH ANN (deterministic axis hyperplanes on the first 8 "
    "dims): candidates restricted to the probe's bucket (~corpus/256), then "
    "exact cosine top-3. The approximate scale path.",
    tags=("similarity", "lsh"),
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str):
    v = t(spark, sf_dir, "embeddings")
    probes = v.filter(F.col("vec_id") % 100 == 0)
    return lsh_bucket_topk(v, probes, id_col="vec_id", vec_col="embedding", k=3, bits=8)
