#!/usr/bin/env python
"""Plan-cost regression gate over bench records (round-7 verdict #6,
wired into the flow per round-9 verdict #4 via ``bench.py --gate`` and
``tools/round_close.py``).

Wall-clock on a shared host swings with contention (the round-7
variance saga: the same commit benched 41s idle and 48s during sweeps,
and A/B comparisons flipped sign), so seconds alone cannot prove a plan
regression. bench.py therefore records per-query SHUFFLE WRITE
BYTES/RECORDS and SCAN BYTES/RECORDS from the stage API — deterministic
for a fixed plan + data — in its sidecar ``BENCH_PLAN_METRICS.json``,
and this tool diffs two records:

    python tools/bench_gate.py BENCH_PLAN_METRICS_r08.json BENCH_PLAN_METRICS.json

Flags any query whose record counts grew (> --tol, default 5%; records
are exactly deterministic, so ANY growth above tolerance is real — no
absolute floor) or whose shuffle_write_bytes / input_bytes grew
materially (> --tol-bytes, default 15%, AND by more than a 1 KiB
absolute floor — bytes wobble slightly with compression framing).
Round-8 ADVICE fix: the old code applied the 1 KiB floor to record
counts too, so a lost broadcast on a small query (100 -> 900 records)
was never flagged. Exit 1 on any flag. New queries (absent from the
old record) are reported informationally, never flagged.
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        txt = fh.read().strip()
    try:  # a whole-file JSON document (sidecar / driver BENCH_r*.json)
        doc = json.loads(txt)
        # driver records wrap the parsed line: {"tail":..., "parsed": {...}}
        if isinstance(doc, dict) and isinstance(doc.get("parsed"), dict):
            return doc["parsed"]
        if isinstance(doc, dict):
            return doc
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


def diff_plan_metrics(old: dict, new: dict,
                      tol: float = 0.05, tol_bytes: float = 0.15) -> int:
    """Print a diff report; return 0 clean / 1 on any plan regression."""
    om, nm = old.get("plan_metrics") or {}, new.get("plan_metrics") or {}
    if not om:
        print("old record carries no plan_metrics — nothing to gate "
              "(first instrumented round); recording only.")
        return 0
    if not nm:
        print("NEW record carries no plan_metrics — stage API was "
              "unreachable for every query; gate is inconclusive "
              "(metrics degrade to absent, never wrong). Re-run bench.")
        return 0
    flags: list[str] = []
    fresh: list[str] = []
    # (key, relative tolerance, absolute materiality floor). Records are
    # exactly deterministic -> floor 0; bytes wobble with compression
    # framing -> 1 KiB floor.
    checks = (
        ("shuffle_write_records", tol, 0),
        ("input_records", tol, 0),
        ("shuffle_write_bytes", tol_bytes, 1024),
        ("input_bytes", tol_bytes, 1024),
    )
    for name in sorted(nm):
        if name not in om:
            fresh.append(name)
            continue
        for key, t, floor in checks:
            o, n = om[name].get(key, 0), nm[name].get(key, 0)
            if n > o * (1 + t) and n - o > floor:
                flags.append(
                    f"{name}: {key} {o} -> {n} "
                    f"(+{(n - o) / max(o, 1):.0%})"
                )
    # sf1 mini-bench records additionally gate the WALL per seat: the
    # set exists to catch the hang class (an O(partition²) frame is a
    # 15x blow-up, not a 15% one). Band calibrated round 11 over four
    # idle sittings (BASELINE.md): max per-seat spread 21%, so 2x the
    # anchor wall (with a 5s absolute floor for the sub-5s seats) is
    # far outside noise and far inside the failure mode.
    if (old.get("metric") == new.get("metric") == "sf1_mini_bench_total_sec"):
        ow = old.get("queries_full_precision") or old.get("queries") or {}
        nw = new.get("queries_full_precision") or new.get("queries") or {}
        for name in sorted(nw):
            o, n = ow.get(name), nw[name]
            if o is not None and n > 2 * o and n - o > 5:
                flags.append(
                    f"{name}: sf1 wall {o:.1f}s -> {n:.1f}s "
                    f"(x{n / o:.1f}, hang-class gate at 2x)"
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
        f"within tolerance (records {tol:.0%}, bytes {tol_bytes:.0%})"
    )
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--tol", type=float, default=0.05,
                    help="relative growth allowed for record counts")
    ap.add_argument("--tol-bytes", type=float, default=0.15,
                    help="relative growth allowed for byte counts")
    args = ap.parse_args()
    return diff_plan_metrics(load(args.old), load(args.new),
                             args.tol, args.tol_bytes)


if __name__ == "__main__":
    sys.exit(main())
