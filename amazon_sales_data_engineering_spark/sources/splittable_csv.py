"""Splittable ingest for multiLine (quoted-embedded-newline) CSV.

Spark's native CSV reader with ``multiLine=True`` — mandatory for the
reference's IN files, whose Delivery Address fields embed newlines
(/root/reference/amazon-sales-data/sales/source=IN/format=csv/
date=2020-01-01/order-20200101.csv:2-3) — reads each file as ONE split:
a newline inside quotes is indistinguishable from a record boundary
without knowing the quote parity at the split start, so the JVM reader
refuses to split. Fine for date-partitioned fixtures; a single multi-TB
CSV would serialize onto one core (SURVEY.md §7.3.4, the one documented
scale-killer in the parity surface).

This module implements the documented mitigation: the classic TWO-PASS
distributed record splitter (the same scheme parallel CSV loaders in
MPP databases use):

1. **Parity pass** — the file is planned into ``split_bytes`` chunks;
   one embarrassingly-parallel Spark job counts the quote characters in
   each chunk (``bytes.count``, no parsing). Only O(#chunks) integers
   reach the driver, where a per-file prefix XOR yields the quote
   PARITY at every chunk start: even parity = the chunk begins outside
   any quoted field. With RFC-4180 doubled-quote escaping (the repo's
   ``quote='"', escape='"'`` preset) cumulative quote count mod 2 is
   exactly the inside/outside state — an escaped quote flips twice.
   (Backslash escaping would break this; the entry point rejects it.)
2. **Extract pass** — chunk tasks (now carrying their start parity)
   re-read their byte range via Arrow-batched ``mapInPandas``. A record
   TERMINATOR is a newline at even parity; each task owns the records
   that START inside its range (Hadoop input-split convention: it skips
   to the first terminator at or after ``start-1`` and reads past
   ``end`` to finish its last record), so every record is emitted
   exactly once with no coordination. The Python stage only finds
   boundaries and slices bytes — the actual CSV field parsing
   (quotes, escapes, nulls, type casts) happens JVM-side with
   ``from_csv`` on the reassembled single-record strings.

Scale notes: both passes are linear, shuffle-free scans partitioned by
byte range — a 1000-executor cluster splits one 100 TB file into
~100k × 1 GB tasks. The parity pass is one extra full read; ingest-once
pipelines amortize it into the first load, and re-ingests of the same
immutable files skip it entirely by passing ``manifest_dir`` — the
per-chunk counts persist with a (size, mtime) invalidation key, the
same pattern as sources/ledger.py (see sources.scan_manifest).
Executors open files with plain ``open()`` — local/NFS paths here; an
object-store deployment swaps in the filesystem client, the algorithm
is unchanged.
"""

from __future__ import annotations

import glob as _glob
import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of the intermediate record stream (pass 2 output).
_REC_SCHEMA = "path string, rec_start bigint, rec string"

_TASK_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("start", T.LongType()),
        T.StructField("end", T.LongType()),
        T.StructField("start_parity", T.IntegerType()),
    ]
)


def _plan_chunks(paths: list[str], split_bytes: int) -> list[tuple[str, int, int]]:
    """(path, start, end) byte-range tasks, ``split_bytes`` each."""
    chunks: list[tuple[str, int, int]] = []
    for p in sorted(paths):
        size = os.path.getsize(p)
        if size == 0:
            continue
        for lo in range(0, size, split_bytes):
            chunks.append((p, lo, min(lo + split_bytes, size)))
    return chunks


def _count_quotes(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Pass 1 body: quote chars per chunk — a buffered count, no parse."""
    for pdf in batches:
        counts = []
        for path, start, end in zip(pdf["path"], pdf["start"], pdf["end"]):
            n, todo = 0, int(end) - int(start)
            with open(path, "rb") as f:
                f.seek(int(start))
                while todo > 0:
                    buf = f.read(min(todo, 1 << 22))
                    if not buf:
                        break
                    n += buf.count(b'"')
                    todo -= len(buf)
            counts.append(n)
        yield pd.DataFrame(
            {
                "path": pdf["path"],
                "start": pdf["start"].astype("int64"),
                "n_quotes": pd.Series(counts, dtype="int64"),
            }
        )


class _Scanner:
    """Buffered forward scanner over one file from a byte offset:
    feeds quote/newline positions in order, tracking parity and
    retaining bytes so records can be sliced out."""

    def __init__(self, f, pos: int, parity: int) -> None:
        self.f = f
        self.base = pos  # absolute offset of buf[0]
        self.pos = pos  # absolute scan cursor
        self.parity = parity
        self.buf = bytearray()
        self.eof = False
        f.seek(pos)

    def _fill(self) -> bool:
        chunk = self.f.read(1 << 22)
        if not chunk:
            self.eof = True
            return False
        self.buf.extend(chunk)
        return True

    def next_terminator(self) -> int:
        """Advance to the next even-parity newline; return its absolute
        position, or -1 at EOF (parity state left at EOF)."""
        while True:
            rel = self.pos - self.base
            iq = self.buf.find(b'"', rel)
            inl = self.buf.find(b"\n", rel)
            if inl == -1 and iq == -1:
                if not self._fill():
                    self.pos = self.base + len(self.buf)
                    return -1
                continue
            if iq != -1 and (inl == -1 or iq < inl):
                # a quote might still precede a newline not yet buffered
                if inl == -1 and not self.eof:
                    if self._fill():
                        continue
                self.parity ^= 1
                self.pos = self.base + iq + 1
                continue
            self.pos = self.base + inl + 1
            if self.parity == 0:
                return self.base + inl
            # odd parity: newline is inside quotes — keep scanning

    def slice_record(self, s: int, t: int) -> bytes:
        """bytes[s:t] (record body, terminator excluded), then drop the
        consumed prefix so memory stays O(one record + buffer)."""
        rec = bytes(self.buf[s - self.base : t - self.base])
        keep = self.pos - self.base
        del self.buf[:keep]
        self.base = self.pos
        return rec.rstrip(b"\r")

    def tail_record(self, s: int) -> bytes:
        """EOF remainder starting at ``s`` (file had no final newline)."""
        return bytes(self.buf[s - self.base :]).rstrip(b"\r")


def _extract_records(header: bool):
    """Pass 2 body factory (closure pickled by value — executors never
    import this package)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_paths: list[str] = []
        out_starts: list[int] = []
        out_recs: list[str] = []

        def flush():
            nonlocal out_paths, out_starts, out_recs
            df = pd.DataFrame(
                {
                    "path": out_paths,
                    "rec_start": pd.Series(out_starts, dtype="int64"),
                    "rec": out_recs,
                }
            )
            out_paths, out_starts, out_recs = [], [], []
            return df

        for pdf in batches:
            for path, start, end, parity in zip(
                pdf["path"], pdf["start"], pdf["end"], pdf["start_parity"]
            ):
                start, end, parity = int(start), int(end), int(parity)
                with open(path, "rb") as f:
                    if start == 0:
                        sc = _Scanner(f, 0, 0)
                        s = 0
                        if header:
                            t = sc.next_terminator()
                            if t < 0:
                                continue  # header-only / truncated file
                            sc.slice_record(s, t)
                            s = t + 1
                    else:
                        # scan from start-1 so a record starting exactly
                        # at `start` (terminator at start-1) is caught;
                        # parity at start-1 = parity at start unflipped
                        # by byte[start-1] if it is a quote.
                        f.seek(start - 1)
                        prev = f.read(1)
                        p0 = parity ^ (1 if prev == b'"' else 0)
                        sc = _Scanner(f, start - 1, p0)
                        t = sc.next_terminator()
                        if t < 0:
                            continue  # no record starts in this chunk
                        sc.slice_record(start - 1, t)
                        s = t + 1
                    # emit records whose start lies in the owned range
                    while s < end:
                        t = sc.next_terminator()
                        if t < 0:
                            tail = sc.tail_record(s)
                            if tail:
                                out_paths.append(path)
                                out_starts.append(s)
                                out_recs.append(tail.decode("utf-8"))
                            break
                        rec = sc.slice_record(s, t)
                        if rec:  # skip blank lines, like Spark's reader
                            out_paths.append(path)
                            out_starts.append(s)
                            out_recs.append(rec.decode("utf-8"))
                        s = t + 1
                if len(out_recs) >= 10000:
                    yield flush()
        if out_recs:
            yield flush()

    return run


def read_csv_splittable(
    spark: SparkSession,
    path_glob: str,
    schema: T.StructType,
    split_bytes: int = 32 << 20,
    header: bool = True,
    quote: str = '"',
    escape: str = '"',
    nullValue: str | None = None,
    manifest_dir: str | None = None,
) -> DataFrame:
    """Splittable read of quoted-embedded-newline CSV: the two-pass
    distributed record splitter described in the module docstring.
    Returns the same relation ``spark.read.csv(..., multiLine=True)``
    produces (parity is gated: csv_splittable_roundtrip query +
    tests/test_splittable_csv.py on the real IN fixtures), but scans
    in ``split_bytes`` parallel byte-range tasks instead of one task
    per file.

    PRECONDITIONS (divergences from the native reader raise / are
    checked, not silently mis-split — round-7 ADVICE):

    - **RFC-4180-strict quoting.** Every ``"`` in the file is either a
      field delimiter or a doubled escape. Spark's univocity parser
      TOLERATES a stray unquoted quote inside an unquoted field; here a
      stray quote flips the parity fold for the rest of the file and
      would mis-split every subsequent record. Cheap detector: a valid
      RFC-4180 file always ENDS outside quotes, so an odd final parity
      is proof of a stray quote and raises ValueError below. (An EVEN
      number of strays evades the check — that is inherent to any
      counting scheme; full detection requires a parse, which is what
      this reader exists to avoid. PERMISSIVE from_csv still surfaces
      per-record damage as null rows rather than crashing.)
    - **UTF-8 bytes.** Record reassembly decodes slices as UTF-8 and
      raises UnicodeDecodeError on anything else; the native reader's
      ``encoding`` option is not supported here. (Quote/newline BYTE
      scanning is correct for UTF-8 regardless — multi-byte sequences
      never contain 0x22/0x0A continuation bytes.)
    - RFC-4180 doubled-quote escaping only (``quote == escape == '"'``,
      enforced below): backslash escaping breaks the even-flip parity
      invariant.

    ``manifest_dir`` (optional) persists the parity pass's per-chunk
    quote counts keyed by (path, size, mtime_ns, split_bytes) — the
    ledger-style invalidation key — so a RE-ingest of the same
    immutable files skips pass 1 entirely and runs ONE read instead of
    two (sources.scan_manifest; asserted by
    tests/test_splittable_csv.py::test_manifest_skips_parity_pass).
    Stale manifests (source rewritten) are recomputed silently.
    """
    if escape != quote or quote != '"':
        raise ValueError(
            "quote-parity splitting requires RFC-4180 doubled-quote "
            f"escaping (quote == escape == '\"'); got quote={quote!r} "
            f"escape={escape!r}"
        )
    paths = sorted(_glob.glob(path_glob))
    if not paths:
        raise FileNotFoundError(f"no files match {path_glob!r}")
    chunks = _plan_chunks(paths, split_bytes)
    if not chunks:  # all files empty
        return spark.createDataFrame([], schema)

    # Pass 1: per-chunk quote counts (parallel), prefix parity (driver,
    # O(#chunks) integers). With a manifest_dir, files whose persisted
    # counts are still valid skip the pass — re-ingests run ONE read.
    counts: dict[tuple[str, int], int] = {}
    todo = paths
    if manifest_dir is not None:
        from .scan_manifest import load_chunk_rows

        todo = []
        for p in paths:
            rows = load_chunk_rows(manifest_dir, p, split_bytes)
            if rows is None:
                todo.append(p)
            else:
                for s, n in rows:
                    counts[(p, int(s))] = int(n)
    if todo:
        todo_chunks = [c for c in chunks if c[0] in set(todo)]
        tasks = spark.createDataFrame(
            [(p, s, e, 0) for p, s, e in todo_chunks], _TASK_SCHEMA
        ).repartition(min(len(todo_chunks), 256))
        for r in tasks.mapInPandas(
            _count_quotes, schema="path string, start bigint, n_quotes bigint"
        ).collect():
            counts[(r["path"], r["start"])] = r["n_quotes"]
        if manifest_dir is not None:
            from .scan_manifest import save_chunk_rows

            for p in todo:
                save_chunk_rows(
                    manifest_dir, p, split_bytes,
                    [[s, counts[(p, s)]] for q, s, _e in chunks if q == p],
                )
    parities: list[tuple[str, int, int, int]] = []
    acc: dict[str, int] = {}
    for p, s, e in chunks:  # chunks are (path, start)-sorted
        parities.append((p, s, e, acc.get(p, 0)))
        acc[p] = (acc.get(p, 0) + counts[(p, s)]) % 2
    # Parity-drift sanity check (docstring precondition #1): a valid
    # RFC-4180 file ends OUTSIDE quotes — total quote count even. Odd
    # means a stray unquoted quote somewhere flipped the fold and every
    # record after it would mis-split; fail loudly instead.
    bad = sorted(p for p, par in acc.items() if par != 0)
    if bad:
        raise ValueError(
            "odd total quote count (stray unquoted '\"' — not RFC-4180-"
            f"strict); quote-parity splitting would mis-split: {bad}. "
            "Read these files with the native multiLine reader instead."
        )

    # Pass 2: boundary-aware record extraction, then JVM-side parse.
    rec_tasks = spark.createDataFrame(parities, _TASK_SCHEMA).repartition(
        min(len(parities), 256)
    )
    recs = rec_tasks.mapInPandas(_extract_records(header), schema=_REC_SCHEMA)
    opts = {"quote": quote, "escape": escape, "mode": "PERMISSIVE"}
    if nullValue is not None:
        opts["nullValue"] = nullValue
    ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )
    parsed = recs.select(
        "path",
        "rec_start",
        F.from_csv(F.col("rec"), F.lit(ddl), opts).alias("r"),
    )
    return parsed.select("path", "rec_start", "r.*")
