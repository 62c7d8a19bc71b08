"""Splittable ingest for multiLine (top-level-array) JSON.

The reference's FR files are ONE top-level JSON array per file
(/root/reference/step_3_load_from_stage_to_source.py:108-109 — Snowflake
``strip_outer_array``; the repo reads them with ``multiLine=True``,
sources/readers.py). Like multiLine CSV, that makes each file a single
split: an element boundary is indistinguishable from punctuation inside
a string without knowing the string/escape state at the split start, so
the JVM reader refuses to split — one multi-TB array file would
serialize onto one core, the same scale-killer class the round-7
quote-parity CSV splitter fixed (sources/splittable_csv.py).

This module extends that two-pass scheme to JSON. The complication vs
CSV: JSON escapes quotes with BACKSLASH (``"a \\" b"``), so a chunk's
quote count alone cannot give string parity — whether a quote toggles
depends on the parity of the backslash run before it, and both the run
and the string state can cross chunk boundaries. The classic fix (the
same state-transfer idea simdjson and parallel JSON loaders use): a
chunk's scan is a pure TRANSFER FUNCTION over a tiny entry-state space,
computable locally and folded on the driver.

1. **Transfer pass** — the file is planned into ``split_bytes`` chunks;
   one embarrassingly-parallel job computes, per chunk (numpy over the
   raw bytes — no parsing, no Python byte loop):
   - unescaped-quote-count parity for BOTH possible entry backslash-run
     parities (they differ only when the chunk starts mid-run),
   - net bracket depth delta (``{[`` = +1, ``]}`` = -1, counted only
     outside strings) for all four (in_string, bs_parity) entry states,
   - the chunk's own trailing-backslash-run parity (+ an all-backslash
     flag so a run crossing the whole chunk folds correctly).
   Only O(#chunks) integers reach the driver, which folds them
   file-sequentially into the exact (in_string, bs_parity, depth) state
   at every chunk start. A file that does not fold back to
   (outside-string, depth 0) is malformed / violates the preconditions
   and raises — the JSON analogue of the CSV splitter's parity check.
2. **Extract pass** — chunk tasks (now carrying their entry state)
   re-read their byte range via Arrow-batched ``mapInPandas``, rerun
   the same vectorized automaton to mask string interiors and compute
   the depth profile, and slice out the top-level ELEMENTS: an element
   starts at a ``{`` outside strings at depth 1 and ends at its
   matching ``}`` (depth back to 1). Each task owns the elements that
   START inside its range and reads past its end only to finish its
   last element (Hadoop input-split convention), so every element is
   emitted exactly once with no coordination. The Python stage only
   masks bytes and slices elements — the actual JSON field parsing
   (escapes, ``\\uXXXX``, nulls, type casts) happens JVM-side with
   ``from_json`` on the reassembled single-element strings.

PRECONDITIONS (divergences raise, they are never silently mis-split):

- **Two supported shapes** (round-9 verdict #3 generalization), detected
  from each file's first non-whitespace byte and required to agree
  across the glob:

  * ``[`` — **top-level array of objects** (the FR shape): elements are
    the ``{...}`` objects at depth 1.
  * ``{`` — **wrapper object** (the common API-dump shape,
    ``{"meta": 1, "rows": [ {...}, ... ]}``): exactly ONE wrapper key
    holds the element array; other wrapper keys may only hold SCALARS.
    Elements are the ``{...}`` objects at depth 2. Object-valued
    wrapper keys raise (their sub-objects would be indistinguishable
    from elements by depth alone); a second depth-1 array raises when
    any single chunk can see the violation (two array-opens, or an
    array-open after a depth-2 return) — a multi-array wrapper whose
    arrays are chunk-split apart is the one shape the per-chunk scan
    cannot police, hence the exactly-one-array precondition.

- **Elements are OBJECTS**: a scalar / string / array element at the
  element depth raises with the byte offset (never silently dropped —
  the round-9 error-path gate, tests/test_splittable_json.py).
- **Valid JSON**: backslashes occur only inside strings (RFC 8259); the
  end-of-file fold check catches structural damage.
- **UTF-8 bytes**: element slicing is at ASCII ``{``/``}`` boundaries,
  so slices are always whole-codepoint aligned; multi-byte sequences
  never contain the ASCII marker bytes, so the automaton is correct for
  any UTF-8 content.

Scale notes: both passes are linear, shuffle-free scans partitioned by
byte range — a 1000-executor cluster splits one 100 TB array file into
~100k × 1 GB tasks. The transfer pass is one extra full read,
amortized into the first load exactly like the CSV splitter's parity
pass (or persisted via its manifest machinery). Executors open files
with plain ``open()`` — local/NFS here; an object-store deployment
swaps the filesystem client, the algorithm is unchanged.
"""

from __future__ import annotations

import glob as _glob
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .splittable_csv import _plan_chunks

#: schema of the intermediate element stream (pass 2 output).
_ELEM_SCHEMA = "path string, elem_start bigint, elem string"

_TASK_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("start", T.LongType()),
        T.StructField("end", T.LongType()),
        T.StructField("entry_in_string", T.IntegerType()),
        T.StructField("entry_bs_parity", T.IntegerType()),
        T.StructField("entry_depth", T.LongType()),
        T.StructField("elem_depth", T.IntegerType()),
    ]
)

_BS, _QUOTE = 0x5C, 0x22


def _unescaped_quotes(a: np.ndarray, entry_bs_parity: int) -> np.ndarray:
    """Bool mask of UNESCAPED quote positions. A quote is escaped iff
    preceded by an ODD total run of backslashes; ``entry_bs_parity`` is
    the parity of the run crossing the chunk's left boundary."""
    q = a == _QUOTE
    qpos = np.nonzero(q)[0]
    uq = np.zeros(len(a), dtype=bool)
    if len(qpos) == 0:
        return uq
    bs = a == _BS
    idx = np.arange(len(a), dtype=np.int64)
    last_nb = np.maximum.accumulate(np.where(~bs, idx, np.int64(-1)))
    j = last_nb[np.maximum(qpos - 1, 0)]
    run_par = np.where(
        qpos == 0,
        entry_bs_parity,
        np.where(
            j == -1,  # backslashes all the way to the chunk start
            (qpos % 2) ^ entry_bs_parity,
            (qpos - 1 - j) % 2,
        ),
    )
    uq[qpos[run_par == 0]] = True
    return uq


def _depth_contrib(a: np.ndarray, uq: np.ndarray, entry_in_string: int):
    """(contrib, exit_in_string, in_str_before): per-byte bracket depth
    contributions (zeroed inside strings), the chunk's exit string
    state, and the per-byte is-inside-a-string mask (True for bytes
    after an opening quote, False ON the opening quote itself)."""
    cum = np.cumsum(uq)
    in_str_before = ((cum - uq) % 2).astype(bool)
    if entry_in_string:
        in_str_before = ~in_str_before
    contrib = np.zeros(len(a), dtype=np.int64)
    contrib[(a == 0x7B) | (a == 0x5B)] = 1
    contrib[(a == 0x7D) | (a == 0x5D)] = -1
    contrib[in_str_before] = 0
    exit_in_string = bool(entry_in_string) ^ bool(cum[-1] % 2)
    return contrib, exit_in_string, in_str_before


def _trailing_bs(a: np.ndarray) -> tuple[int, bool]:
    """(local trailing-backslash-run parity, whole-chunk-is-backslashes)."""
    bs = a == _BS
    if bs.all():
        return len(a) % 2, True
    j = len(a) - 1 - int(np.argmax(~bs[::-1]))
    return (len(a) - 1 - j) % 2, False


def _read_range(path: str, start: int, end: int) -> np.ndarray:
    with open(path, "rb") as f:
        f.seek(start)
        return np.frombuffer(f.read(end - start), dtype=np.uint8)


def _transfer_pass(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Pass 1 body: the chunk's state-transfer function — quote parities
    for both entry backslash parities, depth deltas for all four entry
    states, trailing-run parity. All numpy, no byte loop."""
    for pdf in batches:
        rows = []
        for path, start, end in zip(pdf["path"], pdf["start"], pdf["end"]):
            a = _read_range(path, int(start), int(end))
            uq0 = _unescaped_quotes(a, 0)
            uq1 = _unescaped_quotes(a, 1)
            d00, _, _ = _depth_contrib(a, uq0, 0)
            d10, _, _ = _depth_contrib(a, uq0, 1)
            d01, _, _ = _depth_contrib(a, uq1, 0)
            d11, _, _ = _depth_contrib(a, uq1, 1)
            trail_par, all_bs = _trailing_bs(a)
            rows.append(
                (
                    path, int(start),
                    int(uq0.sum() % 2), int(uq1.sum() % 2),
                    int(d00.sum()), int(d10.sum()),
                    int(d01.sum()), int(d11.sum()),
                    # opens-count per entry state: feeds the driver's
                    # reopened-after-close check (a second top-level
                    # value whose chunks straddle the close is invisible
                    # to both entry states and in-chunk profiles alone)
                    int((d00 == 1).sum()), int((d10 == 1).sum()),
                    int((d01 == 1).sum()), int((d11 == 1).sum()),
                    trail_par, all_bs,
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "path", "start", "qpar0", "qpar1",
                "d00", "d10", "d01", "d11",
                "o00", "o10", "o01", "o11", "trail_par", "all_bs",
            ],
        )


#: bytes allowed OUTSIDE strings at the element depth besides element
#: opens: the array's own close, element separators, whitespace.
_ELEM_DEPTH_OK = np.array(
    [0x5D, 0x2C, 0x20, 0x09, 0x0A, 0x0D], dtype=np.uint8
)


def _validate_chunk(
    path: str, start: int, a: np.ndarray,
    depth_before: np.ndarray, in_str: np.ndarray, elem_depth: int,
) -> None:
    """Per-chunk precondition police (round-9 verdict #3): raise — with
    the absolute byte offset — instead of silently dropping or
    mis-slicing. Local to the chunk, so it distributes for free."""
    outside = ~in_str
    d0 = outside & (depth_before == 0)
    # depth 0 admits only whitespace and the single top-level open/close
    bad0 = d0 & ~np.isin(
        a, np.array([0x7B, 0x5B, 0x20, 0x09, 0x0A, 0x0D], dtype=np.uint8)
    )
    if bad0.any():
        off = start + int(np.nonzero(bad0)[0][0])
        raise ValueError(
            f"{path}: byte {off} is content outside the top-level JSON "
            "value — the element splitter supports exactly one "
            "top-level array / wrapper object per file."
        )
    # a depth-0 open AFTER this chunk's profile already left depth 0 =
    # a second top-level value inside one chunk (the whole-file-chunk
    # NDJSON case; the cross-chunk case is policed by the driver fold)
    reopen = np.nonzero(d0 & ((a == 0x7B) | (a == 0x5B)))[0]
    if len(reopen) and (depth_before[: reopen[-1]] > 0).any():
        off = start + int(reopen[-1])
        raise ValueError(
            f"{path}: byte {off} begins a SECOND top-level JSON value — "
            "one top-level array / wrapper object per file (NDJSON is "
            "natively splittable: read it without multiLine)."
        )
    if elem_depth == 2:  # wrapper-object shape — check FIRST: an
        # object-valued wrapper key also spills content at depth 2, and
        # the root-cause message beats the generic content one.
        d1 = outside & (depth_before == 1)
        bad_obj = d1 & (a == 0x7B)
        if bad_obj.any():
            off = start + int(np.nonzero(bad_obj)[0][0])
            raise ValueError(
                f"{path}: byte {off} opens an OBJECT-valued wrapper key "
                "— wrapper keys other than the element array must hold "
                "scalars (a sub-object is indistinguishable from an "
                "element by depth); use the native multiLine reader."
            )
        arr1 = np.nonzero(d1 & (a == 0x5B))[0]
        # two depth-1 array-opens in one chunk, or an array-open after
        # the depth profile already returned from the element depth —
        # the locally-visible signatures of a multi-array wrapper.
        came_down = (
            len(arr1) > 0
            and (depth_before[: arr1[0]] >= 2).any()
        )
        if len(arr1) > 1 or came_down:
            off = start + int(arr1[-1])
            raise ValueError(
                f"{path}: byte {off} opens a SECOND depth-1 array — the "
                "wrapper shape requires exactly one element array; use "
                "the native multiLine reader."
            )
    at_e = outside & (depth_before == elem_depth)
    bad = at_e & (a != 0x7B) & ~np.isin(a, _ELEM_DEPTH_OK)
    if bad.any():
        off = start + int(np.nonzero(bad)[0][0])
        raise ValueError(
            f"{path}: byte {off} ({bytes([a[np.nonzero(bad)[0][0]]])!r}) "
            f"begins a non-object element at depth {elem_depth} — the "
            "element splitter supports only arrays of OBJECTS "
            "(scalars/strings/nested arrays at the element depth are "
            "never silently dropped); use the native multiLine reader."
        )


def _extract_elements(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Pass 2 body: slice out the ``{...}`` elements (at the shape's
    element depth — 1 for bare arrays, 2 for wrapper objects) whose
    start lies in the owned byte range; the last owned element may
    extend past the range and is completed by reading forward
    block-wise with the carried automaton state."""
    out_paths: list[str] = []
    out_starts: list[int] = []
    out_elems: list[str] = []

    def flush() -> pd.DataFrame:
        nonlocal out_paths, out_starts, out_elems
        df = pd.DataFrame(
            {
                "path": out_paths,
                "elem_start": pd.Series(out_starts, dtype="int64"),
                "elem": out_elems,
            }
        )
        out_paths, out_starts, out_elems = [], [], []
        return df

    for pdf in batches:
        for path, start, end, e_is, e_pb, e_depth, elem_depth in zip(
            pdf["path"], pdf["start"], pdf["end"],
            pdf["entry_in_string"], pdf["entry_bs_parity"],
            pdf["entry_depth"], pdf["elem_depth"],
        ):
            start, end = int(start), int(end)
            e_is, e_pb, e_depth = int(e_is), int(e_pb), int(e_depth)
            elem_depth = int(elem_depth)
            a = _read_range(path, start, end)
            raw = a.tobytes()
            uq = _unescaped_quotes(a, e_pb)
            contrib, exit_is, in_str = _depth_contrib(a, uq, e_is)
            depth_before = e_depth + np.cumsum(contrib) - contrib
            _validate_chunk(path, start, a, depth_before, in_str, elem_depth)
            outside = contrib != 0  # brackets outside strings only
            starts = np.nonzero(
                (a == 0x7B) & outside & (depth_before == elem_depth)
            )[0]
            ends = np.nonzero(
                (a == 0x7D) & outside & (depth_before == elem_depth + 1)
            )[0]
            if len(starts) == 0:
                continue
            close_idx = np.searchsorted(ends, starts)
            for n, s in enumerate(starts):
                if close_idx[n] < len(ends):
                    e = int(ends[close_idx[n]])
                    elem = raw[int(s) : e + 1]
                else:
                    # the last owned element crosses the range end:
                    # read forward, carrying the automaton state
                    trail_par, all_bs = _trailing_bs(a)
                    cur_pb = (trail_par ^ e_pb) if all_bs else trail_par
                    cur_is, cur_depth = exit_is, e_depth + int(contrib.sum())
                    tail = bytearray(raw[int(s) :])
                    with open(path, "rb") as f:
                        f.seek(end)
                        while True:
                            block = f.read(1 << 22)
                            if not block:
                                raise ValueError(
                                    f"{path}: unterminated element at "
                                    f"byte {start + int(s)} — truncated "
                                    "or malformed JSON"
                                )
                            b = np.frombuffer(block, dtype=np.uint8)
                            uqb = _unescaped_quotes(b, cur_pb)
                            cb, exit_b, _ = _depth_contrib(b, uqb, cur_is)
                            db = cur_depth + np.cumsum(cb) - cb
                            eb = np.nonzero(
                                (b == 0x7D) & (cb != 0)
                                & (db == elem_depth + 1)
                            )[0]
                            if len(eb):
                                tail.extend(block[: int(eb[0]) + 1])
                                break
                            tail.extend(block)
                            tp, ab = _trailing_bs(b)
                            cur_pb = (tp ^ cur_pb) if ab else tp
                            cur_is = exit_b
                            cur_depth += int(cb.sum())
                    elem = bytes(tail)
                out_paths.append(path)
                out_starts.append(start + int(s))
                out_elems.append(elem.decode("utf-8"))
            if len(out_elems) >= 5000:
                yield flush()
    if out_elems:
        yield flush()


def read_json_splittable(
    spark: SparkSession,
    path_glob: str,
    schema: T.StructType,
    split_bytes: int = 32 << 20,
    manifest_dir: str | None = None,
) -> DataFrame:
    """Splittable read of top-level-array JSON: the two-pass distributed
    element splitter described in the module docstring. Returns the same
    relation ``spark.read.json(..., multiLine=True)`` produces on
    array-of-objects files (parity gated: json_splittable_roundtrip
    query + tests/test_splittable_json.py on the real FR fixtures), but
    scans in ``split_bytes`` parallel byte-range tasks instead of one
    task per file.

    ``manifest_dir`` (optional) persists the transfer pass's per-chunk
    rows keyed by (path, size, mtime_ns, split_bytes) so a re-ingest of
    the same immutable files skips pass 1 — one read instead of two
    (sources.scan_manifest, same machinery as the CSV splitter)."""
    paths = sorted(_glob.glob(path_glob))
    if not paths:
        raise FileNotFoundError(f"no files match {path_glob!r}")
    # cheap driver-side shape detection: '[' = bare array (elements at
    # depth 1), '{' = wrapper object (elements at depth 2). All files in
    # one read must share the shape — a mixed glob would need per-file
    # element depths and almost certainly signals a landing-zone bug.
    shapes: set[int] = set()
    for p in paths:
        with open(p, "rb") as f:
            head = f.read(4096).lstrip()
        if head.startswith(b"["):
            shapes.add(1)
        elif head.startswith(b"{"):
            shapes.add(2)
        elif head:
            raise ValueError(
                f"{p}: first non-whitespace byte is neither '[' nor "
                "'{' — the element splitter supports top-level-array "
                "and wrapper-object files; use the native reader for "
                "other JSON layouts"
            )
    if len(shapes) > 1:
        raise ValueError(
            f"mixed shapes under {path_glob!r}: some files are bare "
            "top-level arrays and some are wrapper objects — split the "
            "read, the shapes need different element depths"
        )
    elem_depth = shapes.pop() if shapes else 1
    chunks = _plan_chunks(paths, split_bytes)
    if not chunks:  # all files empty
        return spark.createDataFrame([], schema)

    # Pass 1: per-chunk transfer functions (parallel), state fold
    # (driver, O(#chunks) integers). With a manifest_dir, files whose
    # persisted transfer rows are still valid skip the pass.
    _COLS = (
        "qpar0", "qpar1", "d00", "d10", "d01", "d11",
        "o00", "o10", "o01", "o11", "trail_par", "all_bs",
    )
    transfer: dict[tuple[str, int], dict] = {}
    todo = paths
    if manifest_dir is not None:
        from .scan_manifest import load_chunk_rows

        todo = []
        for p in paths:
            rows = load_chunk_rows(manifest_dir, p, split_bytes)
            # pre-round-9 manifests carry fewer columns (no opens
            # counts) — treat a shape mismatch as a miss, never a
            # half-populated transfer row
            if rows is None or any(len(r) != 1 + len(_COLS) for r in rows):
                todo.append(p)
            else:
                for row in rows:
                    transfer[(p, int(row[0]))] = dict(zip(_COLS, row[1:]))
    if todo:
        todo_chunks = [c for c in chunks if c[0] in set(todo)]
        tasks = spark.createDataFrame(
            [(p, s, e, 0, 0, 0, 0) for p, s, e in todo_chunks],
            _TASK_SCHEMA,
        ).repartition(min(len(todo_chunks), 256))
        for r in tasks.mapInPandas(
            _transfer_pass,
            schema="path string, start bigint, qpar0 int, qpar1 int, "
            "d00 bigint, d10 bigint, d01 bigint, d11 bigint, "
            "o00 bigint, o10 bigint, o01 bigint, o11 bigint, "
            "trail_par int, all_bs boolean",
        ).collect():
            transfer[(r["path"], r["start"])] = {c: r[c] for c in _COLS}
        if manifest_dir is not None:
            from .scan_manifest import save_chunk_rows

            for p in todo:
                save_chunk_rows(
                    manifest_dir, p, split_bytes,
                    [
                        [s] + [transfer[(p, s)][c] for c in _COLS]
                        for q, s, _e in chunks
                        if q == p
                    ],
                )
    entries: list[tuple[str, int, int, int, int, int, int]] = []
    state: dict[str, tuple[int, int, int]] = {}
    closed: dict[str, bool] = {}  # depth returned to 0 after activity
    for p, s, e in chunks:  # (path, start)-sorted
        is_, pb, depth = state.get(p, (0, 0, 0))
        entries.append((p, s, e, is_, pb, depth, elem_depth))
        r = transfer[(p, s)]
        qpar = r["qpar1"] if pb else r["qpar0"]
        delta = r[f"d{is_}{pb}"]
        opens = int(r[f"o{is_}{pb}"])
        # a chunk with structural opens AFTER the top-level value closed
        # = a second top-level value (NDJSON-style file) whose values
        # straddle chunk boundaries — invisible to the per-chunk scan
        # (its own profile starts innocently at depth 0), so the driver
        # polices it from the folded opens counts.
        if closed.get(p) and opens:
            raise ValueError(
                f"{p}: a second top-level JSON value begins at or after "
                f"byte {s} — the element splitter supports exactly one "
                "top-level array / wrapper object per file (NDJSON is "
                "natively splittable: read it with spark.read.json "
                "without multiLine)."
            )
        depth += int(delta)
        is_ ^= int(qpar)
        pb = (int(r["trail_par"]) ^ pb) if r["all_bs"] else int(r["trail_par"])
        state[p] = (is_, pb, depth)
        if depth == 0 and not is_ and (opens or closed.get(p) is not None):
            closed[p] = True
        elif opens and closed.get(p) is None:
            closed[p] = False  # activity seen, value still open
    bad = sorted(
        p for p, (is_, pb, depth) in state.items() if (is_, depth) != (0, 0)
    )
    if bad:
        raise ValueError(
            "file does not fold back to (outside-string, depth 0) — "
            f"malformed JSON or precondition violation: {bad}. Read "
            "these files with the native multiLine reader instead."
        )

    # Pass 2: boundary-aware element extraction, then JVM-side parse.
    elem_tasks = spark.createDataFrame(entries, _TASK_SCHEMA).repartition(
        min(len(entries), 256)
    )
    elems = elem_tasks.mapInPandas(_extract_elements, schema=_ELEM_SCHEMA)
    ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )
    parsed = elems.select(
        "path",
        "elem_start",
        F.from_json(F.col("elem"), F.lit(ddl), {"mode": "PERMISSIVE"}).alias(
            "r"
        ),
    )
    return parsed.select("path", "elem_start", "r.*")
