#!/usr/bin/env python
"""Regenerate COVERAGE.md: the registry coverage matrix.

One row per registered query: tag family, gate kind (DuckDB-oracled vs
rows-only), bench membership, and the latest driver verdict if a
CORRECTNESS_r*.json sampled it. Auto-generated so the matrix cannot drift
from the registry as it grows: python tools/coverage_matrix.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_driver_verdicts() -> tuple[str, dict]:
    """Merge every round's driver sample, most recent round winning per
    query; each verdict remembers which round produced it (`rN`)."""
    files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if not files:
        return "none", {}
    merged: dict = {}
    for path in files:
        tag = os.path.basename(path).replace("CORRECTNESS_", "").replace(
            ".json", ""
        ).lstrip("0") or os.path.basename(path)
        tag = "r" + tag.lstrip("r").lstrip("0")
        with open(path) as fh:
            for name, row in json.load(fh).items():
                merged[name] = {**row, "_round": tag}
    span = (
        os.path.basename(files[0])
        if len(files) == 1
        else f"{os.path.basename(files[0])} … {os.path.basename(files[-1])}, latest round wins"
    )
    return span, merged


def main() -> int:
    from amazon_sales_data_engineering_spark.plans import REGISTRY

    src, driver = latest_driver_verdicts()
    lines = [
        "# COVERAGE — registry matrix (generated)\n",
        "Regenerate with `python tools/coverage_matrix.py`. One row per",
        "registered query. *Gate*: `oracle` = DuckDB-differential (row",
        "count + schema + type parity + order-insensitive value hash, see",
        "tests/oracle_util.py), `rows-only` = no SQL-expressible oracle by",
        "design (the docstring says why). *Driver*: most recent driver-",
        f"sample verdict with its round ({src}); `—` = never sampled.",
        "*Sweep*: latest full local `tools/verify_sweep.py` run",
        "(SWEEP_RESULTS.json) — every query, every run, so it supersedes",
        "a stale driver sample. *sf1*: the 10×-corpus correctness sweep",
        "(SWEEP_SF1.json, SWEEP_SF_DIR=/tmp/asde_sf1) — the same",
        "oracle-differential gate re-run at 10× cardinalities, proving",
        "decimal accumulators, sketch register widths and scale-adaptive",
        "parameters hold past the gate scales; `timeout` = the DuckDB",
        "oracle formulation (not the Spark query) is brute-force by",
        "design and infeasible at this sf — the sf0.01 gate still proves",
        "that query.",
        "SURVEY.md §2 parity rows are mapped in README.md's coverage",
        "table; tags group the extension families. The",
        "`scale:baseline-only` tag marks queries that are quadratic or",
        "output-bound BY DESIGN (exact ground-truth baselines for the",
        "approximate scale paths) — do not read their 10x probe ratios",
        "as scale regressions; the rationale is in each docstring.\n",
        "| query | tags | gate | bench | driver | sweep | sf1 |",
        "|---|---|---|---|---|---|---|",
    ]
    sweep_path = os.path.join(REPO, "SWEEP_RESULTS.json")
    sweep: dict = {}
    if os.path.exists(sweep_path):
        with open(sweep_path) as fh:
            sweep = json.load(fh)
    sf1_path = os.path.join(REPO, "SWEEP_SF1.json")
    sf1: dict = {}
    if os.path.exists(sf1_path):
        with open(sf1_path) as fh:
            sf1 = json.load(fh)
    n_oracle = n_rows_only = 0
    for name in sorted(REGISTRY):
        q = REGISTRY[name]
        gate = "oracle" if q.oracle else "rows-only"
        if q.oracle:
            n_oracle += 1
        else:
            n_rows_only += 1
        d = driver.get(name)
        if d is None:
            verdict = "—"
        elif d.get("err") == "no_oracle":
            verdict = f"rows-only ok ({d.get('_round', '?')})"
        elif d.get("hash_match"):
            verdict = f"pass ({d.get('_round', '?')})"
        elif sweep.get(name, {}).get("ok") and sf1.get(name, {}).get("ok"):
            # round-6 verdict: a driver FAIL from an old round that BOTH
            # full local sweeps have since proven green is a stale sample
            # of a since-fixed query, not a standing failure — say so
            # instead of presenting a scary FAIL the registry refutes
            verdict = f"fixed since {d.get('_round', '?')} (sweeps green)"
        else:
            verdict = f"**FAIL** ({d.get('_round', '?')})"
        s = sweep.get(name)
        sweep_v = "—" if s is None else ("ok" if s.get("ok") else "**FAIL**")
        s1 = sf1.get(name)
        if s1 is None:
            sf1_v = "—"
        elif s1.get("ok"):
            sf1_v = "ok" + (f" ({s1['sec']:.0f}s)" if s1.get("sec") else "")
        elif s1.get("timeout"):
            sf1_v = "timeout (oracle)"
        else:
            sf1_v = "**FAIL**"
        lines.append(
            f"| {name} | {', '.join(q.tags)} | {gate} "
            f"| {'yes' if q.bench else ''} | {verdict} | {sweep_v} | {sf1_v} |"
        )
    lines.append(
        f"\n**{len(REGISTRY)} queries: {n_oracle} oracle-gated, "
        f"{n_rows_only} rows-only.**\n"
    )
    out = os.path.join(REPO, "COVERAGE.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out}: {len(REGISTRY)} queries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
