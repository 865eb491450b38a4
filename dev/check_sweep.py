#!/usr/bin/env python3
"""Timeout-tolerant variant of check.py for large-SF sweeps: compare
semantics are IMPORTED from check.py (one copy of canon/values_equal/
TABLES), but each DuckDB oracle runs in a subprocess with a per-query
time budget so one pathological oracle (e.g. an all-pairs construction
at sf0.1) cannot hang the whole sweep.

Two-phase schedule so one invocation completes unattended at sf0.1:
the known brute-force oracles (deliberate all-pairs / recursive-CTE
ground-truth recomputes whose cost asymmetry vs the engine is the
point) are deferred to a SECOND phase that runs them in PARALLEL
subprocesses under a separate long budget, after the fast majority has
reported sequentially. Any fast-phase timeout is retried in the long
phase too.

Usage: check_sweep.py <sfDir> <outDir> [timeoutSec] [longTimeoutSec]
  timeoutSec      fast-phase per-oracle budget (default 180)
  longTimeoutSec  parallel long-phase budget   (default 3600)

Output per query: PASS / FAIL (check.py semantics), ORACLE_TIMEOUT
(the ENGINE result exists; only the DuckDB-side ground-truth recompute
exceeded the budget at this SF — counted separately, not as a
failure), or FAIL ... oracle process died (a crashed/OOM-killed oracle
subprocess is a FAILURE, not a timeout).

Exit code: 1 if any FAIL; 2 if no FAIL but some ORACLE_TIMEOUT (so
automation cannot silently treat lost verification coverage as green);
0 only when every oracle was actually compared and passed.
"""
import glob
import json
import multiprocessing as mp
import os
import queue as queue_mod
import sys
from concurrent.futures import ThreadPoolExecutor

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import TABLES, compare, table_glob  # noqa: E402

# Oracles that are brute-force BY DESIGN (exact all-pairs Jaccard /
# containment over every doc pair, recursive-CTE cluster closure):
# tens of minutes single-node at sf0.1 while the engine side takes
# seconds. Scheduled last, in parallel, under the long budget.
LONG_ORACLES = {
    "d06_jaccard_near_dups",
    "d07_dedup_clusters",
    "d11_quality_keeper",
    "d13_containment_dedup",
    "p23_leakage_safe_split",
}


def run_oracle(sf_dir: str, sql: str, q):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_glob(sf_dir, t)}'")
    try:
        q.put(("ok", con.execute(sql).fetchdf()))
    except Exception as e:  # noqa: BLE001
        q.put(("err", str(e)))


def oracle_result(sf_dir: str, sql: str, timeout: int):
    """Run one oracle in a subprocess. Returns ("ok", df) | ("err", msg)
    | ("timeout", None) | ("died", exitcode). Drains the queue BEFORE
    join (a large result blocks the child on the queue's pipe until the
    parent reads — join-first would misreport it as a timeout), and
    polls the child so a crashed/OOM-killed oracle is a FAILURE, not a
    timeout."""
    q = mp.Queue()
    p = mp.Process(target=run_oracle, args=(sf_dir, sql, q))
    p.start()
    waited = 0.0
    step = 1.0
    while waited < timeout:
        try:
            status, payload = q.get(timeout=step)
            p.join()
            return status, payload
        except queue_mod.Empty:
            waited += step
            if not p.is_alive():
                # died without posting a result (segfault / OOM-kill);
                # one last non-blocking drain in case the result raced
                # the exit
                try:
                    status, payload = q.get(timeout=1.0)
                    p.join()
                    return status, payload
                except queue_mod.Empty:
                    code = p.exitcode
                    p.join()
                    return "died", code
    p.terminate()
    p.join()
    return "timeout", None


def check_one(sf_dir, name, sql, got, timeout):
    """(verdict, detail): verdict in pass|fail|timeout."""
    status, payload = oracle_result(sf_dir, sql, timeout)
    if status == "timeout":
        return "timeout", f"> {timeout}s at this SF"
    if status == "died":
        return "fail", f"oracle process died (exit {payload})"
    if status == "err":
        return "fail", f"oracle error: {payload}"
    diff = compare(got, payload)
    if diff:
        return "fail", diff
    return "pass", f"{len(got)} rows"


def main(sf_dir: str, out_dir: str, timeout: int, long_timeout: int) -> None:
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = n_timeout = 0
    timeouts = []
    deferred = []  # (name, got) for the parallel long phase

    def record(name, verdict, detail):
        nonlocal n_pass, n_fail, n_timeout
        if verdict == "pass":
            print(f"PASS {name}: {detail}", flush=True)
            n_pass += 1
        elif verdict == "timeout":
            print(f"ORACLE_TIMEOUT {name}: {detail}", flush=True)
            n_timeout += 1
            timeouts.append(name)
        else:
            print(f"FAIL {name}: {detail}", flush=True)
            n_fail += 1

    # Phase 1: everything except the known-long oracles, sequential
    # under the fast budget — the suite's health is visible in minutes.
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output", flush=True)
            n_fail += 1
            continue
        got = pd.read_parquet(files[0])
        if name not in oracles:
            print(f"ROWS {name}: {len(got)} rows (no oracle)", flush=True)
            continue
        if name in LONG_ORACLES:
            deferred.append((name, got))
            continue
        verdict, detail = check_one(sf_dir, name, oracles[name], got,
                                    timeout)
        if verdict == "timeout":
            # unexpectedly slow at this SF — give it the long phase too
            print(f"DEFER {name}: > {timeout}s, retrying in the "
                  f"parallel long phase", flush=True)
            deferred.append((name, got))
        else:
            record(name, verdict, detail)

    # Phase 2: brute-force ground-truth oracles, in parallel under the
    # long budget (each already runs in its own subprocess).
    if deferred:
        print(f"\n[long phase] {len(deferred)} brute-force oracle(s) in "
              f"parallel, budget {long_timeout}s: "
              + ", ".join(n for n, _ in deferred), flush=True)
        with ThreadPoolExecutor(max_workers=len(deferred)) as ex:
            futs = [(name, ex.submit(check_one, sf_dir, name,
                                     oracles[name], got, long_timeout))
                    for name, got in deferred]
            for name, fut in futs:
                verdict, detail = fut.result()
                record(name, verdict, detail)

    print(f"\n{n_pass} pass, {n_fail} fail, {n_timeout} oracle-timeout"
          + (f" ({', '.join(timeouts)})" if timeouts else ""))
    # 2 (not 0) on timeout-only: lost coverage must be explicit opt-in
    sys.exit(1 if n_fail else (2 if n_timeout else 0))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 180,
         int(sys.argv[4]) if len(sys.argv) > 4 else 3600)
