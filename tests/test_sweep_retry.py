"""tools/verify_sweep.py resource-failure auto-retry (round-9 verdict
#2): DuckDB OOM / spill-disk oracle casualties must be classified apart
from value mismatches and re-run isolated with a raised memory cap —
the three sf1 casualties needed exactly this by hand last round."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import verify_sweep as vs  # noqa: E402


def test_resource_failure_classification():
    assert vs._is_resource_failure(
        "Out of Memory Error: could not allocate block of size 256KB"
    )
    assert vs._is_resource_failure(
        "IO Error: No space left on device: failed to write spill file"
    )
    assert vs._is_resource_failure("OutOfMemoryError: Java heap space")
    assert vs._is_resource_failure("failed to allocate data of size 1.5 GiB")
    # BroadcastExchange's heap failure (the r11 final-close sf1
    # casualty: dedup_suffix_apply_chars, green on an isolated re-run)
    assert vs._is_resource_failure(
        "SparkException: Not enough memory to build and broadcast the "
        "table to all worker nodes."
    )
    # value mismatches and plan failures are NOT resource failures
    # a dying chunk JVM (round-10 close: driver OOM after 56 sf1
    # queries) surfaces as these two — both must retry in a fresh JVM
    assert vs._is_resource_failure(
        "Job 507 cancelled because SparkContext was shut down"
    )
    assert vs._is_resource_failure("[Errno 111] Connection refused")
    assert not vs._is_resource_failure("value hash mismatch: 3 != 7")
    assert not vs._is_resource_failure("rows 10 != oracle rows 12")
    assert not vs._is_resource_failure(
        "O(partition^2) window frame in q: ends at unboundedFollowing"
    )


def test_retry_reruns_only_resource_failures(tmp_path, monkeypatch):
    journal = tmp_path / "sweep.json"
    names = ["ok_q", "mismatch_q", "timeout_q", "oom_q", "oom_stuck_q"]
    journal.write_text(
        json.dumps(
            {
                "ok_q": {"ok": True, "sec": 1.0},
                "mismatch_q": {"ok": False, "err": "value hash mismatch"},
                "timeout_q": {"ok": False, "timeout": True},
                "oom_q": {
                    "ok": False,
                    "err": "Out of Memory Error: could not allocate",
                    "resource": True,
                },
                "oom_stuck_q": {
                    "ok": False,
                    "err": "Out of Memory Error: could not allocate",
                    "resource": True,
                },
                "other_round_oom": {"ok": False, "resource": True},
            }
        )
    )

    calls: list[list[str]] = []

    def fake_run(cmd, env=None, **kw):
        # argv tail after the script path = the retried query names
        sub = cmd[2:]
        calls.append(sub)
        assert env.get("SWEEP_DUCK_MEM") == "100GB"
        data = json.loads(journal.read_text())
        if "oom_q" in sub:  # recovers at the raised cap
            data["oom_q"] = {"ok": True, "sec": 9.9}
        journal.write_text(json.dumps(data))

        class R:
            returncode = 0

        return R()

    monkeypatch.setattr("subprocess.run", fake_run)
    rc = vs._retry_resource_failures(names, str(journal), env={})

    # pass 1: BOTH resource failures in one fresh-JVM batch (a dead
    # chunk JVM fails a whole tail — one batch heals it); pass 2: the
    # still-failing one isolated. The mismatch, the timeout, and the
    # resource failure from a DIFFERENT round's names are never retried.
    assert calls == [["oom_q", "oom_stuck_q"], ["oom_stuck_q"]]
    # rc: oom_stuck_q still failed and mismatch_q is a real failure;
    # the timeout keeps its non-failure child semantics
    assert rc == 1
    final = json.loads(journal.read_text())
    assert final["oom_q"]["ok"] is True

    # all-green after retry -> rc 0 (timeouts don't fail the sweep)
    data = json.loads(journal.read_text())
    data["mismatch_q"] = {"ok": True}
    data["oom_stuck_q"] = {"ok": True}
    journal.write_text(json.dumps(data))
    calls.clear()
    assert vs._retry_resource_failures(names, str(journal), env={}) == 0
    assert calls == []  # nothing left classified as resource-failed


def test_run_id_completeness_heals_crashed_chunk_tail(tmp_path, monkeypatch):
    """Round-10 review: a chunk child that dies before journaling its
    tail leaves STALE committed green verdicts for never-run names —
    with a run id, those names are detected, re-run in the retry batch,
    and only count green once stamped by THIS run."""
    journal = tmp_path / "sweep.json"
    names = ["ran_q", "stale_q", "stale_dead_q"]
    journal.write_text(
        json.dumps(
            {
                "ran_q": {"ok": True, "sec": 1.0, "run": "r10"},
                # green, but from a PREVIOUS sweep — the chunk died
                # before reaching these two
                "stale_q": {"ok": True, "sec": 0.5},
                "stale_dead_q": {"ok": True, "sec": 0.5, "run": "r09"},
            }
        )
    )

    calls: list[list[str]] = []

    def fake_run(cmd, env=None, **kw):
        sub = cmd[2:]
        calls.append(sub)
        data = json.loads(journal.read_text())
        if "stale_q" in sub:  # this one re-runs green
            data["stale_q"] = {"ok": True, "sec": 2.0, "run": "r10"}
        # stale_dead_q stays unstamped (still failing to run)
        journal.write_text(json.dumps(data))

        class R:
            returncode = 0

        return R()

    monkeypatch.setattr("subprocess.run", fake_run)
    rc = vs._retry_resource_failures(names, str(journal), env={}, run_id="r10")
    # both unstamped names retried (batch, then the still-stale one
    # isolated); final rc fails because stale_dead_q never ran this sweep
    assert calls == [["stale_q", "stale_dead_q"], ["stale_dead_q"]]
    assert rc == 1

    # once everything is stamped by this run -> rc 0, no retries
    data = json.loads(journal.read_text())
    data["stale_dead_q"] = {"ok": True, "run": "r10"}
    journal.write_text(json.dumps(data))
    calls.clear()
    assert vs._retry_resource_failures(
        names, str(journal), env={}, run_id="r10"
    ) == 0
    assert calls == []

    # SWEEP_RESUME opts out: stale greens are trusted
    data["stale_dead_q"] = {"ok": True}
    journal.write_text(json.dumps(data))
    monkeypatch.setenv("SWEEP_RESUME", "1")
    assert vs._retry_resource_failures(
        names, str(journal), env={}, run_id="r10"
    ) == 0
    assert calls == []
