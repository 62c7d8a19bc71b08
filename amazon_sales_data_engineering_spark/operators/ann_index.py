"""Persisted, incrementally-maintained IVF ANN index — the similarity
twin of ``operators.dedup_index`` (same round-7 maintenance story,
applied to retrieval instead of dedup).

``plans.similarity_ops.ann_ivf_topk`` builds its inverted file inside
every query: the coarse-quantizer assignment (vector → nearest
centroid) is recomputed for the whole corpus per run. A 100 TB corpus
assigns each vector ONCE — at ingest — and persists the inverted lists;
queries then read the lists and touch only ``nprobe`` of them. This
module is that maintained index:

- **State**: ``centroids/`` (the coarse quantizer, fixed at creation —
  in production the output of a k-means over a sample, here the
  deterministic subset the from-scratch gate uses) and append-only
  ``assignments/batch_NNNNN`` dirs of ``(centroid_id, id, vec)`` rows.
- **Maintenance = append**: a batch broadcasts the centroid table over
  the DELTA only (|Δ|×k work, never corpus-sized) and appends its
  assignment rows. Assignment is a pure per-vector function of the
  fixed centroids, so the union over ANY batch partitioning equals the
  from-scratch inverted file — the equivalence the gated query
  (ann_ivf_incremental_equiv) proves by sharing ann_ivf_topk's oracle
  verbatim.
- **Query**: probes pick their ``nprobe`` nearest centroids (broadcast
  pass), join the persisted lists on centroid_id, exact cosine top-k
  within candidates — identical math to operators.similarity.ivf_topk,
  reading stored lists instead of recomputing them. At scale the
  assignment dirs are written partitioned by centroid_id so a probe's
  nprobe lists prune at the scan.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .similarity import cosine


class IVFIndex:
    """Maintained inverted-file index rooted at a directory."""

    def __init__(self, root: str) -> None:
        self.root = root

    def _cent_dir(self) -> str:
        return os.path.join(self.root, "centroids")

    def _batch_dirs(self) -> list[str]:
        return sorted(
            glob.glob(os.path.join(self.root, "assignments", "batch_*"))
        )

    def create(
        self, centroids: DataFrame, id_col: str, vec_col: str
    ) -> "IVFIndex":
        """Fix the coarse quantizer. Overwrites any previous index state
        (new centroids invalidate every inverted list)."""
        import shutil

        shutil.rmtree(self.root, ignore_errors=True)
        centroids.select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).alias("centroid_vec"),
        ).write.parquet(self._cent_dir())
        return self

    def _centroids(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self._cent_dir())

    def _nearest(
        self, df: DataFrame, cent: DataFrame, out_id: str, n: int,
        id_col: str, vec_col: str,
    ) -> DataFrame:
        scored = (
            df.select(F.col(id_col).alias(out_id), F.col(vec_col).alias("v"))
            .crossJoin(F.broadcast(cent))
            .select(
                out_id, "v", "centroid_id",
                cosine(F.col("v"), F.col("centroid_vec")).alias("ccos"),
            )
        )
        w = Window.partitionBy(out_id).orderBy(
            F.col("ccos").desc(), F.col("centroid_id").asc()
        )
        return (
            scored.withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= n)
            .select(out_id, "v", "centroid_id")
        )

    def apply_batch(
        self,
        spark: SparkSession,
        vectors: DataFrame,
        id_col: str,
        vec_col: str,
    ) -> int:
        """Assign one ingest batch against the FIXED centroids (|delta| x
        k broadcast pass — never corpus-sized) and append its inverted-
        list rows. Returns the batch sequence number. Same id-uniqueness
        contract as MinHashDedupIndex.apply_batch."""
        seq = len(self._batch_dirs())
        cent = self._centroids(spark)
        self._nearest(
            vectors, cent, "id", 1, id_col, vec_col
        ).select("centroid_id", "id", F.col("v").alias("vec")).write.mode(
            "overwrite"
        ).parquet(
            os.path.join(self.root, "assignments", f"batch_{seq:05d}")
        )
        return seq

    def topk(
        self,
        spark: SparkSession,
        probes: DataFrame,
        id_col: str,
        vec_col: str,
        k: int = 5,
        nprobe: int = 2,
    ) -> DataFrame:
        """ANN top-k over the PERSISTED inverted lists: probes pick their
        nprobe nearest centroids, candidates come from those lists only,
        exact cosine ranks within candidates. Output
        (probe_id, neighbor_id, rank) — identical semantics to
        operators.similarity.ivf_topk."""
        dirs = self._batch_dirs()
        if not dirs:
            raise ValueError(f"empty index under {self.root!r}")
        cent = self._centroids(spark)
        lists = spark.read.parquet(*dirs).select(
            "centroid_id", F.col("id").alias("neighbor_id"), "vec"
        )
        probe_lists = self._nearest(
            probes, cent, "probe_id", nprobe, id_col, vec_col
        ).withColumnRenamed("v", "pv")
        scored = (
            lists.join(probe_lists, "centroid_id")
            .filter(F.col("probe_id") != F.col("neighbor_id"))
            .select(
                "probe_id", "neighbor_id",
                cosine(F.col("pv"), F.col("vec")).alias("cos"),
            )
        )
        w = Window.partitionBy("probe_id").orderBy(
            F.col("cos").desc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "probe_id", "neighbor_id", F.col("rank").cast("int").alias("rank")
            )
        )
