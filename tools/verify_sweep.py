#!/usr/bin/env python
"""Driver-contract verification sweep (see .claude/skills/verify/SKILL.md).

Simulates the external driver: a VANILLA SparkSession (not
session.get_spark()) in a hostile timezone, comparing every registered
query against its DuckDB oracle at sf0.01 (row count + schema +
order-insensitive value hash — the exact gate comparison).

Usage:
    python tools/verify_sweep.py            # full sweep (~1-2 min)
    python tools/verify_sweep.py name1 ...  # only the named queries

Chunking (round-9 verdict #5): one long-lived JVM OOMs after ~140 sf1
queries on an 8 GiB driver (accumulated JVM/Arrow state across hundreds
of jobs — BASELINE.md round-8 notes), so sweeps larger than SWEEP_CHUNK
queries (default 100; 0 disables) split into named-subset runs in FRESH
subprocess JVMs. Each child journals into the SAME file — named-subset
journals merge, never clobber — so the full 320-query sf1 sweep now
completes unattended:

    SWEEP_JOURNAL=SWEEP_SF1.json SWEEP_SF_DIR=/tmp/asde_sf1 \\
    SWEEP_DRIVER_MEM=8g SWEEP_QUERY_TIMEOUT=1200 \\
    python tools/verify_sweep.py

Round-10 additions:
- Every query's OPTIMIZED PLAN is screened for O(partition²) suffix
  window frames (plans/frame_guard.py) before the value comparison —
  the round-9 forward-fill bug class fails the sweep even at sf0.01.
- Resource-classified oracle failures (DuckDB OOM / spill-disk, see
  _RESOURCE_MARKERS) are automatically re-run ISOLATED — one query per
  fresh subprocess with SWEEP_DUCK_MEM_RETRY (default 100GB) — before
  a failure verdict stands; value mismatches and timeouts are not.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings"


def _corpus_fp(sf_dir: str) -> str:
    """Fingerprint of the corpus: (relpath, size, mtime_ns) of every
    parquet file under sf_dir."""
    import hashlib

    h = hashlib.md5()
    for root, _dirs, files in sorted(os.walk(sf_dir)):
        for fn in sorted(files):
            if fn.endswith(".parquet"):
                p = os.path.join(root, fn)
                st = os.stat(p)
                h.update(
                    f"{os.path.relpath(p, sf_dir)}|{st.st_size}|"
                    f"{st.st_mtime_ns}\n".encode()
                )
    return h.hexdigest()


def _pkg_fp() -> str:
    """Fingerprint of every package source file — a coarse but SAFE
    invalidation key: any engine code change invalidates all cached
    verdicts (false misses only, never false hits)."""
    import hashlib

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "amazon_sales_data_engineering_spark",
    )
    h = hashlib.md5()
    for root, _dirs, files in sorted(os.walk(pkg)):
        for fn in sorted(files):
            if fn.endswith(".py"):
                with open(os.path.join(root, fn), "rb") as fh:
                    h.update(fh.read())
    return h.hexdigest()


#: Error-text markers of a RESOURCE failure (oracle ran out of memory or
#: spill disk) as opposed to a value mismatch — these are retried
#: isolated in a fresh process with a raised DuckDB memory cap before a
#: failure verdict stands (round-9 verdict #2: the three sf1 casualties
#: ann_pq_adc_recall / graph_sssp_weighted / pagerank_copurchase all
#: needed exactly that by hand).
_RESOURCE_MARKERS = (
    "out of memory",
    "no space left on device",
    "failed to allocate",
    "could not allocate",
    "memory limit",
    "java heap space",
    "gc overhead limit",
    # Spark's BroadcastExchange heap failure says "Not enough memory to
    # build and broadcast the table" — none of the markers above match
    # it, so the r11 final-close sf1 casualty (dedup_suffix_apply_chars,
    # healed green by an isolated 12g re-run) dodged the retry batch.
    "not enough memory",
    # a dying chunk JVM (driver OOM at sf1) surfaces as these two in
    # sequence: jobs cancelled while the context tears down, then bare
    # socket refusals once the gateway is gone — the round-10 close lost
    # 44 queries of one chunk to exactly this; every one went green in a
    # fresh JVM
    "sparkcontext was shut down",
    "connection refused",
    # third surface of the same dying-JVM sequence: a query whose action
    # started AFTER the context died raises IllegalStateException instead
    # of the shutdown/refused forms — the round-11 second-close casualty
    # (histogram_extendedprice) that dodged the retry batch
    "stopped sparkcontext",
)


def _is_resource_failure(msg: str) -> bool:
    low = msg.lower()
    return any(m in low for m in _RESOURCE_MARKERS)


def _default_journal(named: bool) -> str | None:
    return os.environ.get("SWEEP_JOURNAL") or (
        None
        if named
        else os.path.join(os.path.dirname(__file__), "..", "SWEEP_RESULTS.json")
    )


def _run_chunked(names: list[str], chunk: int) -> int:
    """Split ``names`` into fresh-JVM subprocess runs of <= ``chunk``
    queries each, journaling into one shared file (merged, never
    clobbered). The fix for the documented 8 GiB-JVM OOM after ~140
    sf1 queries in one session."""
    import subprocess
    import uuid

    journal = _default_journal(named=False)
    # Per-run nonce: children stamp every verdict they write (including
    # cache replays) with this id, and the final rc counts a name as
    # FAILED if its journal entry lacks the current run's stamp — a
    # chunk child that dies before journaling its tail (kernel OOM,
    # segfault) must not let STALE committed green verdicts masquerade
    # as this run's results (round-10 review finding). SWEEP_RESUME
    # deliberately trusts prior greens, so it opts out of the check.
    run_id = uuid.uuid4().hex[:12]
    env = {
        **os.environ,
        "_SWEEP_CHILD": "1",
        "SWEEP_RUN_ID": run_id,
        **({"SWEEP_JOURNAL": os.path.abspath(journal)} if journal else {}),
    }
    rc = 0
    n_chunks = (len(names) + chunk - 1) // chunk
    for i in range(0, len(names), chunk):
        sub = names[i : i + chunk]
        print(
            f"=== chunk {i // chunk + 1}/{n_chunks}: {len(sub)} queries "
            "in a fresh JVM ===",
            flush=True,
        )
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), *sub], env=env
        )
        rc = rc or p.returncode
    if journal:
        # the retry pass recomputes the FINAL rc from the merged journal
        # over all names — a chunk rc poisoned by failures the retry
        # fixed must not survive it, and names without this run's stamp
        # (a child died before journaling them) must fail it
        return _retry_resource_failures(names, journal, env, run_id=run_id)
    return rc


def _retry_resource_failures(
    names: list[str], journal: str, env: dict, run_id: str | None = None
) -> int:
    """Re-run every resource-classified failure (DuckDB OOM / spill-disk
    exhaustion, a chunk JVM dying under the driver heap — journaled
    ``resource: true``) with the DuckDB cap raised to
    SWEEP_DUCK_MEM_RETRY (default 100GB): first ALL of them as ONE
    fresh-JVM batch (a dead chunk JVM fails its whole alphabetical tail;
    one batch heals those cheaply), then anything still failing gets its
    own subprocess (full isolation for genuine per-query OOMs — a fresh
    process also releases the previous oracle's spill files). Names whose
    journal entry lacks this run's stamp (a child died before reaching
    them — their entries are stale survivors of an earlier sweep) are
    retried the same way. Value mismatches and watchdog timeouts are NOT
    retried (they are real verdicts). Returns the final rc over
    ``names`` from the merged journal."""
    import json
    import subprocess

    def _load() -> dict:
        with open(journal) as fh:
            return json.load(fh)

    def _not_this_run(v: dict, n: str) -> bool:
        """True when the journal entry was NOT written by this sweep —
        a stale prior-round verdict surviving a crashed chunk child.
        SWEEP_RESUME deliberately trusts prior greens, so it opts out."""
        if not run_id or os.environ.get("SWEEP_RESUME"):
            return False
        return v.get(n, {}).get("run") != run_id

    def _resource_failed() -> list[str]:
        v = _load()
        return [
            n
            for n in names
            if (not v.get(n, {}).get("ok") and v.get(n, {}).get("resource"))
            or _not_this_run(v, n)
        ]

    retry_env = {
        **env,
        "SWEEP_DUCK_MEM": os.environ.get("SWEEP_DUCK_MEM_RETRY", "100GB"),
        "SWEEP_JOURNAL": os.path.abspath(journal),
    }
    retry = _resource_failed()
    if retry:
        print(
            f"=== resource-failure retry: {len(retry)} queries as one "
            f"fresh-JVM batch (SWEEP_DUCK_MEM={retry_env['SWEEP_DUCK_MEM']}) ===",
            flush=True,
        )
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), *retry], env=retry_env
        )
        for n in _resource_failed():
            print(f"=== resource-failure retry: {n} isolated ===", flush=True)
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), n], env=retry_env
            )
    verdicts = _load()
    # watchdog timeouts keep their child-rc semantics (documented
    # infeasible-at-this-sf oracles, not failures) — only real failures
    # and never-ran-this-sweep names drive the final rc.
    failed = [
        n
        for n in names
        if (
            not verdicts.get(n, {}).get("ok")
            and not verdicts.get(n, {}).get("timeout")
        )
        or _not_this_run(verdicts, n)
    ]
    if retry:
        print(
            f"retries: {len(retry) - sum(1 for n in retry if n in failed)}"
            f"/{len(retry)} resource failures recovered",
            flush=True,
        )
    if failed:
        print(f"FINAL failures after retry: {failed}", flush=True)
    return 1 if failed else 0


def main() -> int:
    names_cli = sys.argv[1:]
    chunk_env = os.environ.get("SWEEP_CHUNK")
    chunk = int(chunk_env) if chunk_env not in (None, "") else 100
    if chunk and not os.environ.get("_SWEEP_CHILD"):
        import __spark_entry__ as e_probe

        names_all = names_cli or sorted(e_probe.queries())
        if len(names_all) > chunk:
            return _run_chunked(names_all, chunk)

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e
    from amazon_sales_data_engineering_spark.plans.frame_guard import (
        assert_no_quadratic_frames,
    )
    from tests.oracle_util import compare

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "16")
        # default 1g driver heap OOMs on the 10x corpus (SWEEP_SF_DIR=
        # /tmp/asde_sf1) — size it from the env for big-sf sweeps
        .config("spark.driver.memory", os.environ.get("SWEEP_DRIVER_MEM", "4g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    duck = duckdb.connect()
    # Cap the oracle's memory and give it a spill dir: at sf1 a handful
    # of deliberately brute-force DuckDB formulations (pagerank closure,
    # all-pairs evals) otherwise balloon past 100 GB and draw the KERNEL
    # OOM killer, which takes the neighboring Spark JVM down with them —
    # the round-9 chunk-2 casualty. With a limit + temp_directory the
    # oracle spills to disk (slower, correct) or fails alone (cleanly
    # journaled), never the host.
    duck.sql(
        f"SET memory_limit='{os.environ.get('SWEEP_DUCK_MEM', '48GB')}'"
    )
    duck.sql("SET temp_directory='/tmp/duckdb_sweep_spill'")
    for tb in TABLES.split():
        p = f"{SF_DIR}/{tb}.parquet"
        if os.path.isdir(p):  # Spark-written table = directory of parts
            p = f"{p}/*.parquet"
        if os.path.exists(f"{SF_DIR}/{tb}.parquet"):
            duck.sql(f"CREATE VIEW {tb} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = e.queries(), e.oracle_sql()
    names = sys.argv[1:] or sorted(qs)
    # stamp every verdict this process writes with the sweep's run
    # nonce (set by the chunking coordinator) so the parent can tell
    # fresh verdicts from stale journal survivors of a crashed child
    _run_id = os.environ.get("SWEEP_RUN_ID")

    def _stamp(d: dict) -> dict:
        return {**d, "run": _run_id} if _run_id else d
    df = e.entry(spark)
    assert df.count() >= 0, "entry() returned no result"

    # Full sweeps journal per-query verdicts so COVERAGE.md's sweep
    # column reflects the latest local gate run, not just the (sampled,
    # possibly stale) driver rounds. SWEEP_JOURNAL overrides the output
    # file (e.g. SWEEP_SF1.json for the 10x-corpus correctness sweep);
    # the journal is rewritten after EVERY query so a killed run still
    # leaves its partial verdicts on disk.
    import json

    journal_path = _default_journal(named=bool(sys.argv[1:]))
    # Per-query watchdog: a handful of DuckDB oracle formulations are
    # deliberately brute-force (recursive closures, all-pairs evals) and
    # become infeasible at 10x data — one of them must not wedge the
    # whole sweep (the first sf1 attempt sat 20+ min / 58 GB inside one
    # oracle). After SWEEP_QUERY_TIMEOUT seconds the watchdog interrupts
    # DuckDB and cancels Spark jobs; the query is journaled as
    # "timeout" (a documented infeasible-at-this-sf oracle, not a
    # correctness failure — the sf0.01 gate still proves it).
    import threading

    q_timeout = float(os.environ.get("SWEEP_QUERY_TIMEOUT", "0") or 0)

    # An explicitly-named journal is MERGED, never clobbered: a named-
    # subset retry (e.g. the three fixed queries against SWEEP_SF1.json)
    # must update three verdicts, not replace a 280-entry sweep record
    # with three rows. SWEEP_RESUME=1 additionally SKIPS queries the
    # journal already proved green (big-sf sweeps take hours; a restart
    # must not repay the prefix) — failures/timeouts are always retried.
    verdicts: dict[str, dict] = {}
    if journal_path and os.path.exists(journal_path) and (
        os.environ.get("SWEEP_JOURNAL") or os.environ.get("SWEEP_RESUME")
    ):
        with open(journal_path) as fh:
            verdicts = json.load(fh)
    if os.environ.get("SWEEP_RESUME"):
        done = [n for n, v in verdicts.items() if v.get("ok")]
        names = [n for n in names if n not in done]
        print(f"resume: {len(done)} green in journal, {len(names)} to run", flush=True)

    # SWEEP_CACHE=1 (round-6 verdict #6): skip a query whose journaled
    # GREEN verdict carries a fingerprint matching the current (oracle
    # SQL + query source + whole-package source + corpus) state — so a
    # full sf1 re-sweep after a no-op commit replays in minutes instead
    # of re-paying the multi-minute oracles (ann_pq_adc_recall 632s).
    # The package-wide source hash makes stale hits impossible: ANY
    # engine code change invalidates every cached verdict (false misses
    # only). Fingerprints are journaled on every run, cache on or off.
    import hashlib as _hl
    import inspect as _inspect

    use_cache = bool(os.environ.get("SWEEP_CACHE"))
    base_fp = _pkg_fp() + "|" + _corpus_fp(SF_DIR)

    def _fp(name: str) -> str:
        try:
            src = _inspect.getsource(qs[name])
        except (OSError, TypeError):
            src = ""
        return _hl.md5(
            (base_fp + "|" + (oracles.get(name) or "") + "|" + src).encode()
        ).hexdigest()

    if use_cache:
        hits = [
            n for n in names
            if verdicts.get(n, {}).get("ok")
            and verdicts[n].get("fp") == _fp(n)
        ]
        for n in hits:
            verdicts[n] = _stamp({**verdicts[n], "cached": True})
        names = [n for n in names if n not in hits]
        print(
            f"cache: {len(hits)} fingerprint-matched green verdicts "
            f"replayed, {len(names)} to run",
            flush=True,
        )

    failed: list[str] = []
    for name in names:
        t0 = time.perf_counter()
        timed_out = threading.Event()
        done = threading.Event()
        timer = None
        if q_timeout > 0:

            def _kill(done_evt: threading.Event = done) -> None:
                timed_out.set()
                try:
                    duck.interrupt()
                except Exception:  # noqa: BLE001
                    pass
                # Keep cancelling until the query thread actually returns:
                # a single cancelAllJobs() fired BETWEEN two jobs of an
                # iterative operator (rounds run eagerly at DataFrame
                # construction) cancels nothing, and the next round runs
                # unimpeded — the query escapes the watchdog entirely.
                while not done_evt.is_set():
                    try:
                        spark.sparkContext.cancelAllJobs()
                    except Exception:  # noqa: BLE001
                        pass
                    done_evt.wait(5)

            timer = threading.Timer(q_timeout, _kill)
            timer.daemon = True
            timer.start()
        try:
            df_q = qs[name](spark, SF_DIR)
            # Plan-level frame screen (round-9 verdict #1): a suffix
            # window frame is O(partition²) at execution — invisible to
            # every value gate below sf1, so the sweep rejects the PLAN.
            assert_no_quadratic_frames(df_q, context=name)
            if name not in oracles:
                n = df_q.count()
                print(f"  rows-only {name}: {n} rows", flush=True)
                verdicts[name] = _stamp(
                    {"ok": True, "rows_only": True, "fp": _fp(name)}
                )
                continue
            compare(df_q, duck, oracles[name])
            dt = round(time.perf_counter() - t0, 1)
            print(f"  ok {name} ({dt}s)", flush=True)
            verdicts[name] = _stamp({"ok": True, "sec": dt, "fp": _fp(name)})
        except Exception as ex:  # noqa: BLE001
            if timed_out.is_set():
                print(f"  TIMEOUT {name} (> {q_timeout:.0f}s)", flush=True)
                verdicts[name] = _stamp({"ok": False, "timeout": True})
            else:
                failed.append(name)
                v = {"ok": False, "err": str(ex)[:300]}
                if _is_resource_failure(str(ex)):
                    v["resource"] = True  # parent retries isolated
                print(f"  FAIL {name}: {ex}", flush=True)
                verdicts[name] = _stamp(v)
        finally:
            done.set()
            if timer is not None:
                timer.cancel()
        if journal_path:
            with open(journal_path, "w") as fh:
                json.dump(verdicts, fh, indent=0, sort_keys=True)
    print(f"{len(names) - len(failed)}/{len(names)} green; failed: {failed}")
    if journal_path:
        with open(journal_path, "w") as fh:
            json.dump(verdicts, fh, indent=0, sort_keys=True)
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
