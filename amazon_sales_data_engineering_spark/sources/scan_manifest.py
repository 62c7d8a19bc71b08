"""Persisted per-chunk scan manifests for the splittable readers.

Both splittable readers (splittable_csv, splittable_json) pay one extra
full read per file — the parity / state-transfer pass — before the
record-extract pass. Ingest-once pipelines amortize it into the first
load; pipelines that RE-READ the same immutable files (repeated query
over a staged drop, a retried load, a dev loop) should not repay it, so
the pass's O(#chunks) integers can be persisted next to the ledger
(round-7 verdict #5, completing the splittable_csv docstring's
promise).

One JSON file per (source file, split_bytes) under ``manifest_dir``,
keyed by the md5 of the absolute path, carrying the source's
(size, mtime_ns) — the same invalidation key the ledger and the sweep
cache use: any rewrite of the source file changes size or mtime and the
manifest is silently recomputed (false misses only, never false hits).
Writes go through a temp file + atomic rename, the ledger-sink
discipline, so a crashed writer can never leave a half manifest that
parses.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile


def _key_path(manifest_dir: str, path: str, split_bytes: int) -> str:
    h = hashlib.md5(
        f"{os.path.abspath(path)}|{split_bytes}".encode()
    ).hexdigest()
    return os.path.join(manifest_dir, f"{h}.json")


def load_chunk_rows(
    manifest_dir: str, path: str, split_bytes: int
) -> list | None:
    """The persisted per-chunk rows for ``path`` at this chunking, or
    None when absent/stale (source size or mtime changed)."""
    mp = _key_path(manifest_dir, path, split_bytes)
    try:
        with open(mp) as fh:
            m = json.load(fh)
        st = os.stat(path)
        if m["size"] == st.st_size and m["mtime_ns"] == st.st_mtime_ns:
            return m["rows"]
    except (OSError, ValueError, KeyError):
        pass
    return None


def save_chunk_rows(
    manifest_dir: str, path: str, split_bytes: int, rows: list
) -> None:
    """Persist per-chunk rows atomically (tmp + rename)."""
    os.makedirs(manifest_dir, exist_ok=True)
    st = os.stat(path)
    payload = {
        "path": os.path.abspath(path),
        "size": st.st_size,
        "mtime_ns": st.st_mtime_ns,
        "split_bytes": split_bytes,
        "rows": rows,
    }
    fd, tmp = tempfile.mkstemp(dir=manifest_dir, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as fh:
            json.dump(payload, fh)
        os.replace(tmp, _key_path(manifest_dir, path, split_bytes))
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
