"""tools/round_close.py git-anchor resolution (round 10): gating a
close against the working-tree sidecar compares a fresh bench run to
itself (bench.py overwrites it), so git:REF[:PATH] anchors must extract
the COMMITTED record — and abort up front on a bad ref, before the hour
of sweeps."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import round_close as rc  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_plain_paths_pass_through():
    assert rc._resolve_anchor(None, "--gate") is None
    assert rc._resolve_anchor("/tmp/x.json", "--gate") == "/tmp/x.json"


def test_git_anchor_extracts_committed_sidecar():
    out = rc._resolve_anchor("git:HEAD", "--gate")
    assert out and out != "BENCH_PLAN_METRICS.json" and os.path.exists(out)
    with open(out) as fh:
        extracted = json.load(fh)
    committed = json.loads(
        subprocess.run(
            ["git", "show", "HEAD:BENCH_PLAN_METRICS.json"],
            cwd=REPO, capture_output=True, check=True,
        ).stdout
    )
    assert extracted == committed
    assert "plan_metrics" in extracted


def test_git_anchor_explicit_path_and_bad_ref():
    out = rc._resolve_anchor("git:HEAD:BENCH_SF1.json", "--sf1-gate")
    with open(out) as fh:
        assert json.load(fh)["metric"] == "sf1_mini_bench_total_sec"
    with pytest.raises(SystemExit) as ex:
        rc._resolve_anchor("git:no-such-ref-xyz", "--gate")
    assert ex.value.code == 2


def test_sf1_gate_bare_ref_defaults_to_sf1_record():
    """Round-10 review: a bare git:REF for --sf1-gate must extract the
    SF1 record, not the sf0.1 sidecar (whose shared query names carry
    10x-smaller plan metrics and would flag every healthy sf1 seat)."""
    out = rc._resolve_anchor("git:HEAD", "--sf1-gate", default_path="BENCH_SF1.json")
    with open(out) as fh:
        assert json.load(fh)["metric"] == "sf1_mini_bench_total_sec"
