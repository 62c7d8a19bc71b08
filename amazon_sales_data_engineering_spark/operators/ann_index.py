"""Persisted, incrementally-maintained IVF ANN index — the similarity
twin of ``operators.dedup_index`` (same round-7 maintenance story,
applied to retrieval instead of dedup), with the full round-8 lifecycle:
commit-marker crash safety, tombstone deletes, compaction, and
re-quantization.

``plans.similarity_ops.ann_ivf_topk`` builds its inverted file inside
every query: the coarse-quantizer assignment (vector → nearest
centroid) is recomputed for the whole corpus per run. A 100 TB corpus
assigns each vector ONCE — at ingest — and persists the inverted lists;
queries then read the lists and touch only ``nprobe`` of them. This
module is that maintained index:

- **State**: ``centroids/`` (the coarse quantizer, fixed at creation —
  in production the output of a k-means over a sample, here the
  deterministic subset the from-scratch gate uses), append-only
  ``assignments/batch_NNNNN`` dirs of ``(centroid_id, id, vec)`` rows,
  and ``tombstones/batch_NNNNN`` dirs of deleted ids.
- **Crash safety**: a batch counts only once its dir's ``_SUCCESS``
  file (written at Hadoop job COMMIT, after every task's output is in
  place) exists — Spark creates the dir itself at job START, so a bare
  glob would read a crashed epoch's partial assignment rows and return
  top-k over a partially-assigned corpus (round-7 ADVICE). ``seq`` is
  caller-assignable and writes are mode=overwrite, so a streaming
  foreachBatch caller gets idempotent retry + ``completed(seq)``.
  Requires ``mapreduce.fileoutputcommitter.marksuccessfuljobs=true``
  (the Hadoop default) — every write asserts its marker immediately,
  so a cluster configured otherwise fails fast instead of silently
  hiding committed batches (round-8 ADVICE; see
  dedup_index._assert_job_committed)
  restart-skip — the exact MinHashDedupIndex convention.
- **Maintenance = append**: a batch broadcasts the centroid table over
  the DELTA only (|Δ|×k work, never corpus-sized) and appends its
  assignment rows. Assignment is a pure per-vector function of the
  fixed centroids, so the union over ANY batch partitioning equals the
  from-scratch inverted file — the equivalence the gated queries
  (ann_ivf_incremental_equiv, streaming_index_ann) prove by sharing
  ann_ivf_topk's oracle verbatim.
- **Delete = tombstone**: ``delete`` appends an O(|tombstones|) id
  batch; ``topk`` anti-joins it (broadcast — retraction sets are tiny
  next to the corpus); ``compact_to`` drops tombstoned rows physically.
  Right-to-be-forgotten without a rebuild — DELETE + OPTIMIZE
  semantics, mirroring MinHashDedupIndex.delete.
- **Compaction**: ``compact_to`` merges every committed batch into ONE
  generation under a fresh root, written ``partitionBy(centroid_id)``
  — the inverted lists become directory-partitioned, so a probe's
  nprobe lists prune at the SCAN (static pruning when the list filter
  is a literal; dynamic partition pruning through the broadcast
  probe-list join otherwise). Copy-on-write: old-root readers are
  never disturbed; the caller swaps roots when the new generation
  commits.
- **Re-quantization**: centroids are fixed at creation, so a drifting
  corpus skews list sizes (``list_stats`` is the monitor — gated by
  ann_ivf_drift_monitor) and degrades recall. ``requantize`` rebuilds
  under a NEW quantizer in one corpus×k pass — the scheduled
  drift-recovery op, proven ≡ a fresh build under the new centroids
  (ann_ivf_requantized_equiv).
- **Query**: probes pick their ``nprobe`` nearest centroids (broadcast
  pass), join the persisted lists on centroid_id, exact cosine top-k
  within candidates — identical math to operators.similarity.ivf_topk,
  reading stored lists instead of recomputing them.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .dedup_index import _assert_job_committed, _guard_new_root, _tombstone_frame
from .similarity import cosine


class IVFIndex:
    """Maintained inverted-file index rooted at a directory."""

    def __init__(self, root: str) -> None:
        self.root = root

    def _cent_dir(self) -> str:
        return os.path.join(self.root, "centroids")

    def _committed(self, kind: str) -> list[str]:
        """COMMITTED batch dirs of ``kind`` (``_SUCCESS`` present — the
        job-commit marker, never the dir itself)."""
        return [
            d
            for d in sorted(
                glob.glob(os.path.join(self.root, kind, "batch_*"))
            )
            if os.path.isfile(os.path.join(d, "_SUCCESS"))
        ]

    def _batch_dirs(self) -> list[str]:
        return self._committed("assignments")

    def n_batches(self) -> int:
        return len(self._batch_dirs())

    def completed(self, seq: int) -> bool:
        """True when assignment batch ``seq`` fully committed — the
        restart-skip check for streaming foreachBatch maintenance."""
        return os.path.isfile(
            os.path.join(
                self.root, "assignments", f"batch_{seq:05d}", "_SUCCESS"
            )
        )

    def completed_delete(self, seq: int) -> bool:
        """True when tombstone batch ``seq`` fully committed — the
        restart-skip check for the DELETE half of a CDC epoch
        (round-9 verdict #2); same mixed-epoch retry semantics as
        MinHashDedupIndex.completed_delete."""
        return os.path.isfile(
            os.path.join(
                self.root, "tombstones", f"batch_{seq:05d}", "_SUCCESS"
            )
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

    def tombstones(self, spark: SparkSession) -> DataFrame | None:
        """All tombstoned ids (one column ``id``), or None."""
        dirs = self._committed("tombstones")
        return spark.read.parquet(*dirs).distinct() if dirs else None

    def _read_lists(self, spark: SparkSession) -> DataFrame:
        """Union every committed assignment batch, tombstones applied.
        Batch dirs come in two physical layouts — flat (ingest appends)
        and hive-partitioned by centroid_id (compacted generations) —
        so each dir is read separately and normalized to
        (centroid_id bigint, id bigint, vec)."""
        dirs = self._batch_dirs()
        if not dirs:
            raise ValueError(f"empty index under {self.root!r}")
        out = None
        for d in dirs:
            part = spark.read.parquet(d).select(
                F.col("centroid_id").cast("bigint").alias("centroid_id"),
                F.col("id").cast("bigint").alias("id"),
                "vec",
            )
            out = part if out is None else out.unionByName(part)
        tomb = self.tombstones(spark)
        if tomb is not None:
            out = out.join(
                F.broadcast(tomb.select("id")), "id", "left_anti"
            )
        return out

    def _nearest(
        self, df: DataFrame, cent: DataFrame, out_id: str, n: int,
        id_col: str, vec_col: str,
    ) -> DataFrame:
        # Repartition the RAW delta by the output id BEFORE the k-way
        # scoring (round-11 sf10 probe catch): a streaming micro-batch
        # arrives as one file = one partition, so the |delta| x k cosine
        # pass ran on a single core at 100x (40+ min straggler), and the
        # ranking window's exchange then shipped the k-times-larger
        # SCORED rows. Keyed on the same column the window partitions
        # by, this shuffle REPLACES that exchange (HashPartitioning
        # satisfies the window's ClusteredDistribution) — strictly less
        # shuffle volume at any scale, full-width scoring.
        src = (
            df.select(F.col(id_col).alias(out_id), F.col(vec_col).alias("v"))
            .repartition(
                df.sparkSession.sparkContext.defaultParallelism,
                F.col(out_id),
            )
        )
        scored = (
            src.crossJoin(F.broadcast(cent))
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
        seq: int | None = None,
        partitioned: bool = False,
    ) -> int:
        """Assign one ingest batch against the FIXED centroids (|delta| x
        k broadcast pass — never corpus-sized) and append its inverted-
        list rows. Returns the batch sequence number. Same id-uniqueness
        contract as MinHashDedupIndex.apply_batch; same explicit-``seq``
        + overwrite convention for idempotent streaming retry.

        ``partitioned=True`` writes the batch hive-partitioned by
        centroid_id — the compacted generation's layout — so probes
        prune at the SCAN even against a long-uncompacted index
        (round-9 verdict #7; DPP plan guard in
        tests/test_skew_bucketing.py). The trade: one directory (and at
        least one small file) PER TOUCHED LIST per batch, so file count
        grows k x faster. Rule of thumb: partition appends when batches
        are large (>> k rows, so per-list files are real) or the
        workload is probe-heavy between compactions; keep flat appends
        for small/frequent batches and COMPACT when flat batches
        accumulate past ~8-16 dirs or ``list_stats``' probe-cost
        estimate drifts — compact_to both merges the small files AND
        applies tombstones."""
        if seq is None:
            seq = len(self._batch_dirs())
        cent = self._centroids(spark)
        batch_dir = os.path.join(
            self.root, "assignments", f"batch_{seq:05d}"
        )
        assigned = self._nearest(
            vectors, cent, "id", 1, id_col, vec_col
        ).select("centroid_id", "id", F.col("v").alias("vec"))
        if partitioned:
            # cluster each list's rows -> one file per touched list
            assigned.repartition("centroid_id").write.mode(
                "overwrite"
            ).partitionBy("centroid_id").parquet(batch_dir)
        else:
            assigned.write.mode("overwrite").parquet(batch_dir)
        _assert_job_committed(batch_dir)
        return seq

    def delete(self, spark: SparkSession, ids, seq: int | None = None) -> int:
        """Tombstone-delete: append a batch of ids under
        ``tombstones/batch_NNNNN`` — O(|tombstones|), one tiny parquet
        write, no inverted-list file touched (gated by the delete-cost
        probe in tools/index_delta_probe.py). ``topk`` anti-joins the
        set; ``compact_to``/``requantize`` drop the rows physically.
        Same retired-forever id contract as MinHashDedupIndex.delete."""
        tomb = _tombstone_frame(spark, ids, "id")
        if seq is None:
            seq = len(self._committed("tombstones"))
        tomb_dir = os.path.join(self.root, "tombstones", f"batch_{seq:05d}")
        tomb.coalesce(1).write.mode("overwrite").parquet(tomb_dir)
        _assert_job_committed(tomb_dir)
        return seq

    def list_stats(self, spark: SparkSession) -> DataFrame:
        """Per-centroid inverted-list sizes over live (non-tombstoned)
        rows: (centroid_id, list_size). THE drift monitor — a corpus
        whose distribution has moved away from the quantizer piles new
        vectors onto few centroids, so probe candidate sets bloat (slow)
        while recall against the true neighborhood drops. Watch
        max/mean list_size; when it drifts, ``requantize``. Gated:
        ann_ivf_drift_monitor feeds a deliberately shifted second batch
        and the skew is visible in exactly these numbers."""
        return (
            self._read_lists(spark)
            .groupBy("centroid_id")
            .agg(F.count(F.lit(1)).alias("list_size"))
        )

    def compact_to(self, spark: SparkSession, new_root: str) -> "IVFIndex":
        """Copy-on-write compaction: merge every committed assignment
        batch into ONE generation under a fresh root, tombstones applied
        (dropped physically; the new generation starts tombstone-free),
        written hive-partitioned by centroid_id — each inverted list
        becomes its own directory, so a probe's nprobe lists prune at
        the scan instead of filtering after a full read (the module
        docstring's scale note made physical). Readers of the old root
        are never disturbed; the caller swaps roots when the new
        generation commits. Gated: ann_ivf_compacted_equiv +
        ann_ivf_delete_equiv share ann_ivf_topk's oracle."""
        _guard_new_root(self.root, new_root, "compact_to")
        lists = self._read_lists(spark)
        new = IVFIndex(new_root)
        self._centroids(spark).write.mode("overwrite").parquet(
            new._cent_dir()
        )
        # one file per list: repartition clusters each centroid's rows
        # before the partitioned write
        gen_dir = os.path.join(new_root, "assignments", "batch_00000")
        lists.repartition("centroid_id").write.mode(
            "overwrite"
        ).partitionBy("centroid_id").parquet(gen_dir)
        _assert_job_committed(gen_dir)
        return new

    def requantize(
        self,
        spark: SparkSession,
        new_centroids: DataFrame,
        new_root: str,
        id_col: str,
        vec_col: str,
    ) -> "IVFIndex":
        """Rebuild under a NEW coarse quantizer: every live vector is
        read from the persisted lists (vectors are index state — the
        corpus is NOT re-read) and reassigned in one corpus×k broadcast
        pass into a fresh root. This is the scheduled drift-recovery op:
        list_stats shows the skew, requantize restores balanced lists
        and recall. Corpus-sized by necessity (every assignment is a
        function of the centroids), amortized over the new quantizer's
        lifetime — identical cost shape to a from-scratch build, which
        is exactly what ann_ivf_requantized_equiv proves it equals.
        Tombstones are applied on read; the new generation starts
        tombstone-free."""
        _guard_new_root(self.root, new_root, "requantize")
        live = self._read_lists(spark).select("id", "vec")
        new = IVFIndex(new_root).create(new_centroids, id_col, vec_col)
        new.apply_batch(spark, live, "id", "vec")
        return new

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
        nprobe nearest centroids, candidates come from those lists only
        (tombstoned ids excluded), exact cosine ranks within candidates.
        Output (probe_id, neighbor_id, rank) — identical semantics to
        operators.similarity.ivf_topk."""
        cent = self._centroids(spark)
        lists = self._read_lists(spark).select(
            "centroid_id", F.col("id").alias("neighbor_id"), "vec"
        )
        probe_lists = self._nearest(
            probes, cent, "probe_id", nprobe, id_col, vec_col
        ).withColumnRenamed("v", "pv")
        scored = (
            lists.join(F.broadcast(probe_lists), "centroid_id")
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
