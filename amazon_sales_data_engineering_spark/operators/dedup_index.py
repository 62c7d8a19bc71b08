"""Persisted, incrementally-maintained MinHash dedup index.

``plans.dedup_ops.dedup_incremental_minhash`` proves the delta-restricted
band join (old×old pairs are never generated), but rebuilds the corpus
side's signatures inside every run — fine for a one-shot query, wrong
for the daily-ingest shape at 100 TB, where the corpus summary must be
computed ONCE per document ever (round-6 verdict #1). This module is
that maintained index:

- **State**: three append-only parquet table directories under one root —
  ``summaries/batch_NNNNN`` holding one row per document
  ``(doc_id, h0..h{n-1}, sh_set, n)`` (the fused per-doc summary of
  minhash_dedup_pairs, persisted), ``bands/batch_NNNNN`` holding the
  exploded LSH band rows ``(doc_id, band, band_key)``, and
  ``tombstones/batch_NNNNN`` holding deleted doc_ids (the
  right-to-be-forgotten path: queries anti-join them, compaction drops
  them physically — see ``delete``).
- **Maintenance = append**: each batch writes ONLY its own summary/band
  files — cost scales with |Δ|, never |corpus| (gated by the fixed-delta
  probe in tests/test_scale_probe.py). This is the log-structured MERGE
  strategy: on parquet-paths appends are new files; on Delta/Iceberg the
  same writes go through MERGE/appendOnly commits with identical cost.
  CONTRACT: doc_ids are unique across batches (the COPY ledger —
  sources/ledger.py — already guarantees each input file loads exactly
  once upstream; re-ingesting a changed document means assigning it a
  new id or compacting the index, exactly as in production systems).
- **Query**: a batch's near-dup pairs come from the delta's band rows
  joined against the INDEX's band rows (new×old, all orientations) plus
  the delta's self-join (new×new, id_a < id_b) — candidate volume scales
  with |Δ|·collision-rate. Exact-Jaccard verification reads shingle sets
  from the stored summaries via in-row ``array_intersect``; the corpus
  text is never re-shingled.

Equivalence invariant (gated by dedup_index_maintained_equiv): every
full-corpus LSH pair is discovered exactly once — in the batch where its
LATER member arrives (the earlier member's band rows are already
indexed) or its own batch when both arrive together — so the union of
per-batch outputs over any batch partitioning of the corpus equals the
from-scratch minhash_lsh_pairs answer on the full corpus.

Scale notes: band files would be written bucketed by band_key on a real
deployment (operators.skew.write_bucketed — co-locates the band join);
at gate scale the join shuffles the delta plus the touched index rows.
The per-batch output is eagerly localCheckpointed BEFORE the append so
the returned plan never re-reads index directories that now include the
delta itself.

CONF REQUIREMENT: batch visibility is keyed on Hadoop ``_SUCCESS``
job-commit markers, so the session must keep
``mapreduce.fileoutputcommitter.marksuccessfuljobs=true`` (the Hadoop
default). Every index write asserts the marker immediately after the
job commits (``_assert_job_committed``) so a cluster configured with
``false`` fails fast at write time instead of silently hiding all
committed batches from reads (round-8 ADVICE).
"""

from __future__ import annotations

import glob
import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import seeded_md5
from .dedup import shingles


def _assert_job_committed(path: str) -> None:
    """Fail fast when the Hadoop job-commit marker is absent right after
    a write. Batch visibility (``_dirs``/``completed``/``n_batches``) is
    keyed on ``_SUCCESS``; under
    ``mapreduce.fileoutputcommitter.marksuccessfuljobs=false`` (a common
    prod setting) every committed batch would silently vanish from reads
    — MinHash apply_batch would then drop all prior-corpus candidates
    without an error. Raising at WRITE time turns that silent data loss
    into an immediate, attributable failure (round-8 ADVICE)."""
    if not os.path.isfile(os.path.join(path, "_SUCCESS")):
        raise RuntimeError(
            f"no _SUCCESS job-commit marker under {path!r} immediately "
            "after the write. The maintained indexes key batch "
            "visibility on the marker, so this session must run with "
            "mapreduce.fileoutputcommitter.marksuccessfuljobs=true (the "
            "Hadoop default) — a batch written without it would be "
            "invisible to every subsequent read."
        )


def _guard_new_root(root: str, new_root: str, op: str) -> None:
    """Copy-on-write ops must target a FRESH root. Passing the live root
    would destroy the index: requantize rmtree's ``new_root`` (via
    ``create``) before the lazy read of the OLD lists executes, and
    compact_to would overwrite generations readers still hold open
    (round-8 ADVICE)."""
    if os.path.abspath(new_root) == os.path.abspath(root):
        raise ValueError(
            f"{op} requires a fresh root: new_root == current root "
            f"({os.path.abspath(root)!r}). Write the new generation "
            "elsewhere and swap roots once it commits."
        )


def _tombstone_frame(
    spark: SparkSession, ids, id_name: str
) -> DataFrame:
    """Normalize a delete request (DataFrame or iterable of ids) to a
    one-column DataFrame named ``id_name``."""
    if isinstance(ids, DataFrame):
        return ids.select(F.col(ids.columns[0]).alias(id_name)).distinct()
    return spark.createDataFrame(
        [(int(i),) for i in ids], f"{id_name} bigint"
    ).distinct()


class MinHashDedupIndex:
    """Maintained LSH index rooted at a directory. Parameters mirror
    minhash_dedup_pairs (6 hashes × 3 bands, 3-word shingles, Jaccard
    0.5) so the maintained answer is comparable to the one-shot ops."""

    def __init__(
        self,
        root: str,
        num_hashes: int = 6,
        bands: int = 3,
        k: int = 3,
        threshold: float = 0.5,
    ) -> None:
        if num_hashes % bands:
            raise ValueError("num_hashes must divide evenly into bands")
        self.root = root
        self.num_hashes = num_hashes
        self.bands = bands
        self.k = k
        self.threshold = threshold

    # -- state layout ---------------------------------------------------
    def _dirs(self, kind: str) -> list[str]:
        """COMMITTED batch dirs of ``kind``: a batch counts only once its
        summaries ``_SUCCESS`` file exists. The summaries dir is the last
        artifact apply_batch writes, and the dir itself appears at JOB
        START (Spark creates the output path before any task commits) —
        so a bare isdir check would treat a crashed epoch's empty/partial
        dir as committed (round-7 ADVICE). ``_SUCCESS`` is written by the
        Hadoop committer only at job COMMIT, after every task's output is
        in place, which makes it the correct atomic marker; a crashed
        epoch's partial files are never read — the retry overwrites them."""
        out = []
        for d in sorted(glob.glob(os.path.join(self.root, kind, "batch_*"))):
            mark = os.path.join(
                self.root, "summaries", os.path.basename(d), "_SUCCESS"
            )
            if os.path.isfile(mark):
                out.append(d)
        return out

    def n_batches(self) -> int:
        return len(self._dirs("summaries"))

    def _tomb_dirs(self) -> list[str]:
        """COMMITTED tombstone batch dirs — a tombstone batch is its own
        single artifact, so its own ``_SUCCESS`` is the marker."""
        return [
            d
            for d in sorted(
                glob.glob(os.path.join(self.root, "tombstones", "batch_*"))
            )
            if os.path.isfile(os.path.join(d, "_SUCCESS"))
        ]

    def tombstones(self, spark: SparkSession) -> DataFrame | None:
        """All tombstoned doc_ids (one column ``doc_id``), or None."""
        dirs = self._tomb_dirs()
        return spark.read.parquet(*dirs).distinct() if dirs else None

    def _minus_tombstones(
        self, df: DataFrame, tomb: DataFrame | None, id_col: str = "doc_id"
    ) -> DataFrame:
        """Anti-join out tombstoned ids. Broadcast: a tombstone set is a
        right-to-be-forgotten / retraction batch — tiny next to the
        corpus — so the filter costs one broadcast pass over the rows
        being read anyway, never a corpus shuffle."""
        if tomb is None:
            return df
        return df.join(
            F.broadcast(tomb.select(F.col("doc_id").alias(id_col))),
            id_col,
            "left_anti",
        )

    def n_indexed(self, spark: SparkSession) -> int:
        dirs = self._dirs("summaries")
        if not dirs:
            return 0
        return self._minus_tombstones(
            spark.read.parquet(*dirs), self.tombstones(spark)
        ).count()

    # -- per-batch computation ------------------------------------------
    def _summaries(self, docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
        # The t_cpu guard, applied to arbitrary inputs: a streaming
        # micro-batch (one replay file) or a small filtered delta
        # arrives as ONE partition, which would pin the CPU-heavy
        # regexp/shingle/md5 chain to one core. Spread it ONLY when
        # under-parallelized — at real split counts this is a no-op.
        target = docs.sparkSession.sparkContext.defaultParallelism
        if docs.rdd.getNumPartitions() < target:
            docs = docs.repartition(target)
        sh = shingles(docs, text_col, id_col, k=self.k)
        aggs = [
            F.min(seeded_md5(s, F.col("shingle"))).alias(f"h{s}")
            for s in range(self.num_hashes)
        ]
        return (
            sh.groupBy(F.col(id_col).alias("doc_id"))
            .agg(*aggs, F.collect_set("shingle").alias("sh_set"))
            .withColumn("n", F.size("sh_set"))
        )

    def _band_rows(self, summaries: DataFrame) -> DataFrame:
        rpb = self.num_hashes // self.bands
        parts = []
        for b in range(self.bands):
            cols = [F.col(f"h{b * rpb + r}") for r in range(rpb)]
            parts.append(
                summaries.select(
                    "doc_id",
                    F.lit(b).alias("band"),
                    F.md5(F.concat_ws("|", *cols)).alias("band_key"),
                )
            )
        return reduce(DataFrame.unionByName, parts)

    # -- the maintained-ingest step -------------------------------------
    def apply_batch(
        self,
        spark: SparkSession,
        docs: DataFrame,
        text_col: str,
        id_col: str,
        seq: int | None = None,
        pairs_dir: str | None = None,
    ) -> DataFrame:
        """Ingest one batch: return its near-dup pairs (id_a, id_b,
        jaccard; id_a < id_b — new×old and new×new, never old×old),
        then append the batch's summary/band rows to the index. The
        returned DataFrame is already materialized (localCheckpoint).

        ``seq`` defaults to the next batch number; a caller with its own
        epoch (a streaming micro-batch id) passes it explicitly. Writes
        go pairs → bands → summaries, all mode=overwrite, so a retried
        epoch redoes the whole step idempotently and the SUMMARIES dir
        (written last) is the commit marker — ``completed(seq)`` and
        ``n_batches`` count only fully-committed batches. If
        ``pairs_dir`` is given the pairs are also persisted there."""
        delta = self._summaries(docs, text_col, id_col).persist()
        delta_bands = self._band_rows(delta)

        new_b = delta_bands.select(
            F.col("doc_id").alias("id_new"), "band", "band_key"
        )
        tomb = self.tombstones(spark)
        idx_dirs = self._dirs("bands")
        cands = []
        if idx_dirs:
            old_b = self._minus_tombstones(
                spark.read.parquet(*idx_dirs), tomb
            ).select(
                F.col("doc_id").alias("id_other"), "band", "band_key"
            )
            cands.append(
                new_b.join(old_b, ["band", "band_key"])
                # defensive: the id-uniqueness contract makes equality
                # impossible against committed batches; keep the filter
                # so a contract breach degrades to a no-op, not a
                # jaccard=1 self-pair
                .filter(F.col("id_new") != F.col("id_other"))
                .select("id_new", "id_other")
            )
        cands.append(
            new_b.join(
                delta_bands.select(
                    F.col("doc_id").alias("id_other"), "band", "band_key"
                ),
                ["band", "band_key"],
            )
            .filter(F.col("id_new") < F.col("id_other"))
            .select("id_new", "id_other")
        )
        cand = reduce(DataFrame.unionByName, cands).distinct()

        sum_dirs = self._dirs("summaries")
        all_sum = (
            self._minus_tombstones(
                spark.read.parquet(*sum_dirs), tomb
            ).unionByName(delta)
            if sum_dirs
            else delta
        )
        a = delta.select(
            F.col("doc_id").alias("id_new"),
            F.col("sh_set").alias("set_a"),
            F.col("n").alias("na"),
        )
        b = all_sum.select(
            F.col("doc_id").alias("id_other"),
            F.col("sh_set").alias("set_b"),
            F.col("n").alias("nb"),
        )
        i = F.size(F.array_intersect("set_a", "set_b"))
        jac = i.cast("double") / (F.col("na") + F.col("nb") - i).cast("double")
        pairs = (
            cand.join(a, "id_new")
            .join(b, "id_other")
            .select(
                F.least("id_new", "id_other").alias("id_a"),
                F.greatest("id_new", "id_other").alias("id_b"),
                jac.alias("jaccard"),
            )
            .filter(F.col("jaccard") >= self.threshold)
            # materialize BEFORE the append below — a lazy plan would
            # re-read the band dirs after they contain the delta itself
            .localCheckpoint(eager=True)
        )

        if seq is None:
            seq = self.n_batches()
        if pairs_dir is not None:
            pairs.write.mode("overwrite").parquet(pairs_dir)
        bands_dir = os.path.join(self.root, "bands", f"batch_{seq:05d}")
        summ_dir = os.path.join(self.root, "summaries", f"batch_{seq:05d}")
        self._band_rows(delta).write.mode("overwrite").parquet(bands_dir)
        delta.write.mode("overwrite").parquet(summ_dir)
        _assert_job_committed(bands_dir)
        _assert_job_committed(summ_dir)
        delta.unpersist()
        return pairs

    def delete(self, spark: SparkSession, doc_ids, seq: int | None = None) -> int:
        """Tombstone-delete: append a batch of doc_ids under
        ``tombstones/batch_NNNNN`` and return its sequence number. Cost
        is O(|tombstones|) — ONE tiny parquet write; no summary or band
        file is touched (gated by the delete-cost probe in
        tools/index_delta_probe.py). Queries anti-join the tombstone set
        (broadcast — retraction batches are tiny next to the corpus) and
        ``compact_to`` physically drops tombstoned rows, after which the
        new generation starts tombstone-free. This is the right-to-be-
        forgotten primitive the engine already audits for tables
        (delete_cascade_audit): logical delete is immediate, physical
        reclaim rides the existing compaction schedule — exactly Delta/
        Iceberg DELETE + OPTIMIZE semantics.

        CONTRACT (the flip side of apply_batch's id-uniqueness): a
        tombstoned doc_id is retired forever — re-ingesting changed
        content means a NEW id. Tombstones therefore apply to the whole
        index regardless of batch order, and delete is idempotent
        (duplicate tombstones are harmless; the anti-join key set is
        what matters).

        ``doc_ids`` may be a one-column DataFrame or an iterable of
        ints; ``seq`` follows the same explicit-epoch convention as
        apply_batch for streaming callers."""
        tomb = _tombstone_frame(spark, doc_ids, "doc_id")
        if seq is None:
            seq = len(self._tomb_dirs())
        tomb_dir = os.path.join(self.root, "tombstones", f"batch_{seq:05d}")
        tomb.coalesce(1).write.mode("overwrite").parquet(tomb_dir)
        _assert_job_committed(tomb_dir)
        return seq

    def completed(self, seq: int) -> bool:
        """True when batch ``seq`` fully committed — the restart-skip
        check a streaming foreachBatch caller uses for exactly-once
        maintenance. Keyed on the summaries ``_SUCCESS`` file (job-commit
        marker), NOT the dir: Spark creates the dir at job start, so a
        crash mid-write leaves the dir present but no ``_SUCCESS``, and
        the epoch correctly retries."""
        return os.path.isfile(
            os.path.join(
                self.root, "summaries", f"batch_{seq:05d}", "_SUCCESS"
            )
        )

    def completed_delete(self, seq: int) -> bool:
        """True when tombstone batch ``seq`` fully committed — the
        restart-skip check for the DELETE half of a CDC epoch
        (round-9 verdict #2). Independent of ``completed``: a mixed
        I+D epoch that crashed between its delete commit and its
        insert commit retries ONLY the insert half."""
        return os.path.isfile(
            os.path.join(
                self.root, "tombstones", f"batch_{seq:05d}", "_SUCCESS"
            )
        )

    def compact_to(
        self, spark: SparkSession, new_root: str, target_files: int = 8
    ) -> "MinHashDedupIndex":
        """Copy-on-write compaction (Delta/Iceberg OPTIMIZE semantics):
        merge every committed batch into ONE batch dir under a fresh
        root and return the index there. The append-only design means
        read amplification (file count, dir listings, parquet footers)
        grows with batch count — a daily-ingest index compacts on a
        schedule, and because compaction writes only NEW files, readers
        of the old root are never disturbed; the caller swaps roots
        when the new generation commits (same atomic-rename discipline
        as the ledger sinks). Band rows are REDERIVED from the merged
        summaries — one narrow map — so the two tables cannot drift.
        Compaction also APPLIES TOMBSTONES: deleted rows are dropped
        physically and the new generation starts tombstone-free, which
        is both the read-amplification fix and the physical
        right-to-be-forgotten reclaim (DELETE + OPTIMIZE semantics).
        Gated: dedup_index_compacted_equiv proves a post-compaction
        delta finds exactly the pairs the uncompacted index finds;
        dedup_index_delete_compacted_equiv proves the same with
        tombstones applied."""
        _guard_new_root(self.root, new_root, "compact_to")
        dirs = self._dirs("summaries")
        if not dirs:
            raise ValueError(f"nothing to compact under {self.root!r}")
        merged = self._minus_tombstones(
            spark.read.parquet(*dirs), self.tombstones(spark)
        ).coalesce(target_files)
        new = MinHashDedupIndex(
            new_root, self.num_hashes, self.bands, self.k, self.threshold
        )
        nb = os.path.join(new_root, "bands", "batch_00000")
        ns = os.path.join(new_root, "summaries", "batch_00000")
        self._band_rows(merged).coalesce(target_files).write.mode(
            "overwrite"
        ).parquet(nb)
        merged.write.mode("overwrite").parquet(ns)
        _assert_job_committed(nb)
        _assert_job_committed(ns)
        return new
