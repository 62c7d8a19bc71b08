#!/usr/bin/env python
"""One-command round-close ritual (round-9 verdict #4).

Runs, IN ORDER, the gates the verify skill prescribes — stopping at the
first failure and exiting nonzero so a regression (correctness OR plan
cost) fails loudly instead of relying on a hand-run diff:

  1. full sf0.01 verify sweep        (tools/verify_sweep.py ->
     SWEEP_RESULTS.json; auto-chunked into fresh JVMs above
     SWEEP_CHUNK queries)
  2. [--sf1 DIR] full big-corpus sweep into SWEEP_SF1.json
     (8 GiB driver, 1200 s per-query watchdog, chunked)
  3. coverage matrix regeneration    (tools/coverage_matrix.py)
  4. full pytest                     (python -m pytest tests/ -q)
  5. bench                           (python bench.py -> headline line +
     BENCH_PLAN_METRICS.json sidecar)
  6. [--gate PREV] plan-metric gate  (tools/bench_gate.py PREV sidecar)
  7. [--sf1 DIR] standing sf1 mini-bench (python bench.py --sf1 DIR ->
     BENCH_SF1.json; [--sf1-gate PREV] plan-metric gate against a
     previous sf1 record — round-9 verdict #5: an absolute 10x wall +
     plan record catches hang-class bugs without a probe ceiling)

Usage:
    python tools/round_close.py --gate BENCH_PLAN_METRICS_r08.json
    python tools/round_close.py --sf1 /tmp/asde_sf1 --gate ...
    python tools/round_close.py --skip-sweep --skip-pytest   # bench only

ORDERING CAUTION (from the verify skill): finish every package-source
change BEFORE running this — sweep fingerprints hash the whole package,
so one late engine commit invalidates every cached verdict.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _resolve_anchor(
    spec: str | None, label: str, default_path: str = "BENCH_PLAN_METRICS.json"
) -> str | None:
    """Resolve a gate anchor. ``git:REF:PATH`` (or ``git:REF`` with the
    path defaulting to the gate's own sidecar — BENCH_PLAN_METRICS.json
    for --gate, BENCH_SF1.json for --sf1-gate) extracts the COMMITTED
    record to a temp file via ``git show`` — the safe default, because
    bench.py overwrites the repo-root sidecar on every run (including
    interim smoke runs), so gating against the working-tree path can
    compare a fresh run to itself or to garbage (the round-9 second-close
    footgun, recorded in the verify skill). Plain paths pass through."""
    if not spec or not spec.startswith("git:"):
        return spec
    import tempfile

    rest = spec[4:]
    ref, _, path = rest.partition(":")
    path = path or default_path
    out = subprocess.run(
        ["git", "show", f"{ref}:{path}"], cwd=REPO, capture_output=True
    )
    if out.returncode:
        print(f"*** cannot resolve {label} anchor {spec!r}: "
              f"{out.stderr.decode().strip()} ***", flush=True)
        sys.exit(2)
    fd, tmp = tempfile.mkstemp(prefix=f"anchor_{ref.replace('/', '_')}_",
                               suffix=".json")
    with os.fdopen(fd, "wb") as fh:
        fh.write(out.stdout)
    print(f"{label} anchor: {spec} -> {tmp}", flush=True)
    return tmp


def _step(title: str, cmd: list[str], env: dict | None = None) -> None:
    print(f"\n=== {title}: {' '.join(cmd)} ===", flush=True)
    t0 = time.perf_counter()
    p = subprocess.run(cmd, cwd=REPO, env={**os.environ, **(env or {})})
    dt = time.perf_counter() - t0
    if p.returncode:
        print(f"*** {title} FAILED (rc={p.returncode}, {dt:.0f}s) — "
              "round close aborted ***", flush=True)
        sys.exit(p.returncode)
    print(f"=== {title} ok ({dt:.0f}s) ===", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gate", metavar="PREV_METRICS",
                    help="previous bench sidecar / record to gate plan "
                         "metrics against (tools/bench_gate.py). Use "
                         "git:REF[:PATH] to extract the COMMITTED sidecar "
                         "(default PATH BENCH_PLAN_METRICS.json) — never "
                         "gate against the working-tree sidecar, bench "
                         "overwrites it")
    ap.add_argument("--sf1", metavar="DIR",
                    help="also sweep the big corpus at DIR into "
                         "SWEEP_SF1.json (chunked fresh JVMs) and run the "
                         "standing sf1 mini-bench into BENCH_SF1.json")
    ap.add_argument("--sf1-gate", metavar="PREV_SF1",
                    help="previous BENCH_SF1 record to gate the sf1 "
                         "mini-bench plan metrics against. Defaults to "
                         "git:HEAD:BENCH_SF1.json when --sf1 is given "
                         "(round-10 verdict #2: the gate runs by default "
                         "against the committed anchor); pass "
                         "--sf1-gate '' to disable")
    ap.add_argument("--skip-sweep", action="store_true")
    ap.add_argument("--skip-pytest", action="store_true")
    ap.add_argument("--skip-bench", action="store_true")
    args = ap.parse_args()
    py = sys.executable
    # resolve git: anchors UP FRONT so a typo aborts before the hour of
    # sweeps, and so the extraction happens before bench overwrites
    # anything
    args.gate = _resolve_anchor(args.gate, "--gate")
    # the sf1 gate's bare git:REF must extract the SF1 record — the sf0.1
    # sidecar shares query names with 10x-smaller plan metrics, which
    # would flag every healthy sf1 seat as a regression
    if args.sf1 and args.sf1_gate is None:
        # default anchor: the committed record at HEAD (every source
        # commit precedes the ritual, so HEAD's BENCH_SF1.json is the
        # previous close's). Soft default: a repo without one yet just
        # skips the gate instead of aborting.
        probe = subprocess.run(
            ["git", "show", "HEAD:BENCH_SF1.json"], cwd=REPO,
            capture_output=True,
        )
        if probe.returncode == 0:
            args.sf1_gate = "git:HEAD:BENCH_SF1.json"
        else:
            print("no committed BENCH_SF1.json at HEAD — sf1 gate skipped",
                  flush=True)
    args.sf1_gate = _resolve_anchor(
        args.sf1_gate or None, "--sf1-gate", default_path="BENCH_SF1.json"
    )

    if not args.skip_sweep:
        _step("sf0.01 sweep", [py, "tools/verify_sweep.py"])
        if args.sf1:
            _step(
                "sf1 sweep",
                [py, "tools/verify_sweep.py"],
                env={
                    "SWEEP_JOURNAL": os.path.join(REPO, "SWEEP_SF1.json"),
                    "SWEEP_SF_DIR": args.sf1,
                    "SWEEP_DRIVER_MEM": os.environ.get(
                        "SWEEP_DRIVER_MEM", "8g"
                    ),
                    "SWEEP_QUERY_TIMEOUT": os.environ.get(
                        "SWEEP_QUERY_TIMEOUT", "1200"
                    ),
                    # the round-10 close lost a 100-query chunk's tail
                    # when the JVM's driver heap gave out after 56 heavy
                    # sf1 queries — smaller chunks bound the blast
                    # radius AND the accumulated JVM state (auto-retry
                    # heals what remains)
                    "SWEEP_CHUNK": os.environ.get("SWEEP_CHUNK", "50"),
                },
            )
        _step("coverage matrix", [py, "tools/coverage_matrix.py"])
    if not args.skip_pytest:
        _step("pytest", [py, "-m", "pytest", "tests/", "-q"])
    if not args.skip_bench:
        _step("bench", [py, "bench.py"]
              + (["--gate", args.gate] if args.gate else []))
        if args.sf1:
            _step("sf1 mini-bench", [py, "bench.py", "--sf1", args.sf1]
                  + (["--gate", args.sf1_gate] if args.sf1_gate else []))
    print("\nround close: ALL GATES GREEN", flush=True)


if __name__ == "__main__":
    main()
