#!/usr/bin/env python
"""Plan-cost regression gate over bench JSON (round-7 verdict #6).

Wall-clock on a shared host swings with contention (the round-7
variance saga: the same commit benched 41s idle and 48s during sweeps,
and A/B comparisons flipped sign), so seconds alone cannot prove a plan
regression. bench.py therefore records per-query SHUFFLE WRITE
BYTES/RECORDS and SCAN BYTES/RECORDS from the stage API — deterministic
for a fixed plan + data — and this tool diffs two bench JSON lines:

    python tools/bench_gate.py BENCH_r08.json /tmp/bench_now.json

Flags any query whose shuffle_write_records grew (> --tol, default 5%;
records are exactly deterministic) or whose shuffle_write_bytes /
input_bytes grew materially (> --tol-bytes, default 15% — bytes wobble
slightly with compression framing). Exit 1 on any flag — a plan
regression is now detectable from ONE run on a noisy host. New queries
(absent from the old file) are reported informationally, never flagged.
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        txt = fh.read().strip()
    try:  # a whole-file JSON document (driver-recorded BENCH_r*.json)
        return json.loads(txt)
    except ValueError:
        pass
    # else bench stdout: one JSON line, possibly amid log noise
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except ValueError:
                continue
    raise ValueError(f"{path}: no JSON document found")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--tol", type=float, default=0.05,
                    help="relative growth allowed for record counts")
    ap.add_argument("--tol-bytes", type=float, default=0.15,
                    help="relative growth allowed for byte counts")
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)
    om, nm = old.get("plan_metrics") or {}, new.get("plan_metrics") or {}
    if not om:
        print(f"{args.old} carries no plan_metrics — nothing to gate "
              "(first instrumented round); recording only.")
        return 0
    flags: list[str] = []
    fresh: list[str] = []
    checks = (
        ("shuffle_write_records", args.tol),
        ("input_records", args.tol),
        ("shuffle_write_bytes", args.tol_bytes),
        ("input_bytes", args.tol_bytes),
    )
    for name in sorted(nm):
        if name not in om:
            fresh.append(name)
            continue
        for key, tol in checks:
            o, n = om[name].get(key, 0), nm[name].get(key, 0)
            if n > o * (1 + tol) and n - o > 1024:
                flags.append(
                    f"{name}: {key} {o} -> {n} "
                    f"(+{(n - o) / max(o, 1):.0%})"
                )
    gone = sorted(set(om) - set(nm))
    if fresh:
        print(f"new queries (not gated): {fresh}")
    if gone:
        print(f"queries no longer benched: {gone}")
    if flags:
        print("PLAN REGRESSIONS (deterministic metrics, contention-proof):")
        for f in flags:
            print(f"  {f}")
        return 1
    print(
        f"plan metrics clean: {len([n for n in nm if n in om])} queries "
        f"within tolerance (records {args.tol:.0%}, bytes "
        f"{args.tol_bytes:.0%})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
