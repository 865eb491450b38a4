#!/usr/bin/env python3
"""Timeout-tolerant variant of check.py for large-SF sweeps: compare
semantics are IMPORTED from check.py (one copy of canon/values_equal/
TABLES), but each DuckDB oracle runs in a subprocess with a per-query
time budget so one pathological oracle (e.g. an all-pairs construction
at sf0.1) cannot hang the whole sweep.

Usage: check_sweep.py <sfDir> <outDir> [timeoutSec]

Output per query: PASS / FAIL (check.py semantics), ORACLE_TIMEOUT
(the ENGINE result exists; only the DuckDB-side ground-truth recompute
exceeded the budget at this SF — counted separately, not as a
failure), or FAIL ... oracle process died (a crashed/OOM-killed oracle
subprocess is a FAILURE, not a timeout).
"""
import glob
import json
import multiprocessing as mp
import os
import queue as queue_mod
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import TABLES, compare  # noqa: E402


def run_oracle(sf_dir: str, sql: str, q):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
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


def main(sf_dir: str, out_dir: str, timeout: int) -> None:
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = n_timeout = 0
    timeouts = []
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
        status, payload = oracle_result(sf_dir, oracles[name], timeout)
        if status == "timeout":
            print(f"ORACLE_TIMEOUT {name}: > {timeout}s at this SF",
                  flush=True)
            n_timeout += 1
            timeouts.append(name)
            continue
        if status == "died":
            print(f"FAIL {name}: oracle process died (exit {payload})",
                  flush=True)
            n_fail += 1
            continue
        if status == "err":
            print(f"FAIL {name}: oracle error: {payload}", flush=True)
            n_fail += 1
            continue
        diff = compare(got, payload)
        if diff:
            print(f"FAIL {name}: {diff}", flush=True)
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows", flush=True)
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_timeout} oracle-timeout"
          + (f" ({', '.join(timeouts)})" if timeouts else ""))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 180)
