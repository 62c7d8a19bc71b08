"""tools/bench_gate.py: the contention-proof plan-metric regression gate
must flag real growth, ignore noise within tolerance, and handle the
pre-instrumentation baseline files gracefully. Pure-Python (no Spark)."""

from __future__ import annotations

import json
import subprocess
import sys

REPO = __file__.rsplit("/tests/", 1)[0]


def _run(old: dict, new: dict, tmp_path, *args: str):
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    return subprocess.run(
        [sys.executable, f"{REPO}/tools/bench_gate.py", str(po), str(pn), *args],
        capture_output=True, text=True,
    )


def _bench(metrics: dict) -> dict:
    return {"value": 1.0, "queries": {}, "plan_metrics": metrics}


BASE = {
    "q1": {
        "shuffle_write_bytes": 100_000, "shuffle_write_records": 10_000,
        "input_bytes": 500_000, "input_records": 50_000, "n_stages": 4,
    }
}


def test_clean_within_tolerance(tmp_path):
    new = {
        "q1": {**BASE["q1"], "shuffle_write_bytes": 109_000}  # +9% < 15%
    }
    r = _run(_bench(BASE), _bench(new), tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "clean" in r.stdout


def test_flags_record_growth(tmp_path):
    new = {"q1": {**BASE["q1"], "shuffle_write_records": 12_000}}  # +20%
    r = _run(_bench(BASE), _bench(new), tmp_path)
    assert r.returncode == 1
    assert "shuffle_write_records" in r.stdout and "q1" in r.stdout


def test_flags_byte_growth_beyond_byte_tolerance(tmp_path):
    new = {"q1": {**BASE["q1"], "input_bytes": 700_000}}  # +40% > 15%
    r = _run(_bench(BASE), _bench(new), tmp_path)
    assert r.returncode == 1
    assert "input_bytes" in r.stdout


def test_new_queries_reported_not_flagged(tmp_path):
    new = {**BASE, "q2": {**BASE["q1"], "shuffle_write_bytes": 10**9}}
    r = _run(_bench(BASE), _bench(new), tmp_path)
    assert r.returncode == 0
    assert "q2" in r.stdout and "not gated" in r.stdout


def test_pre_instrumentation_baseline_is_informational(tmp_path):
    r = _run({"value": 1.0, "queries": {}}, _bench(BASE), tmp_path)
    assert r.returncode == 0
    assert "no plan_metrics" in r.stdout


def test_absolute_floor_suppresses_tiny_diffs(tmp_path):
    # +50% growth but only 600 bytes — below the 1 KiB materiality floor
    old = {"q1": {**BASE["q1"], "shuffle_write_bytes": 1_200}}
    new = {"q1": {**BASE["q1"], "shuffle_write_bytes": 1_800}}
    r = _run(_bench(old), _bench(new), tmp_path)
    assert r.returncode == 0


def test_small_record_regressions_are_flagged(tmp_path):
    """Round-8 ADVICE: the 1 KiB floor must NOT apply to record counts —
    a lost broadcast on a small query (100 -> 900 records) is exactly
    deterministic and must flag."""
    old = {"q1": {**BASE["q1"], "shuffle_write_records": 100}}
    new = {"q1": {**BASE["q1"], "shuffle_write_records": 900}}
    r = _run(_bench(old), _bench(new), tmp_path)
    assert r.returncode == 1
    assert "shuffle_write_records" in r.stdout


def test_driver_record_wrapper_shape_loads(tmp_path):
    """Driver BENCH_r*.json wraps the parsed line as {"parsed": {...}} —
    load() must unwrap it."""
    old = {"n": 1, "rc": 0, "tail": "...", "parsed": _bench(BASE)}
    new = {"q1": {**BASE["q1"], "shuffle_write_records": 12_000}}  # +20%
    r = _run(old, _bench(new), tmp_path)
    assert r.returncode == 1
    assert "shuffle_write_records" in r.stdout


def test_missing_new_metrics_is_inconclusive_not_fail(tmp_path):
    """If the stage API was down for the whole new run, metrics degrade
    to absent — the gate reports inconclusive and exits 0 (never treats
    absent as zero/regressed)."""
    r = _run(_bench(BASE), {"value": 1.0, "queries": {}}, tmp_path)
    assert r.returncode == 0
    assert "inconclusive" in r.stdout
