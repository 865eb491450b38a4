#!/usr/bin/env python3
"""Timeout-tolerant variant of check.py for large-SF sweeps: identical
compare semantics, but each DuckDB oracle runs in a subprocess with a
per-query time budget so one pathological oracle (e.g. an all-pairs
construction at sf0.1) cannot hang the whole sweep.

Usage: check_sweep.py <sfDir> <outDir> [timeoutSec]

Output per query: PASS / FAIL (same as check.py) or ORACLE_TIMEOUT
(the ENGINE result exists; only the DuckDB-side ground-truth recompute
exceeded the budget at this SF — counted separately, not as a failure,
and listed so the gap is explicit).
"""
import glob
import json
import math
import multiprocessing as mp
import sys

import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


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
        q = mp.Queue()
        p = mp.Process(target=run_oracle, args=(sf_dir, oracles[name], q))
        p.start()
        # Drain the queue BEFORE join: a large result blocks the child
        # on the queue's pipe until the parent reads — join-first would
        # misreport every big-result oracle as a timeout.
        try:
            status, payload = q.get(timeout=timeout)
        except Exception:  # queue.Empty
            p.terminate()
            p.join()
            print(f"ORACLE_TIMEOUT {name}: > {timeout}s at this SF",
                  flush=True)
            n_timeout += 1
            timeouts.append(name)
            continue
        p.join()
        if status == "err":
            print(f"FAIL {name}: oracle error: {payload}", flush=True)
            n_fail += 1
            continue
        g, e = canon(got), canon(payload)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs "
                  f"{list(e.columns)}", flush=True)
            n_fail += 1
            continue
        if g.dtypes.tolist() != e.dtypes.tolist():
            print(f"FAIL {name}: dtypes {g.dtypes.tolist()} vs "
                  f"{e.dtypes.tolist()}", flush=True)
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}", flush=True)
            n_fail += 1
            continue
        bad = None
        for i in range(len(g)):
            for c in g.columns:
                if not values_equal(g[c].iloc[i], e[c].iloc[i]):
                    bad = (i, c, g[c].iloc[i], e[c].iloc[i])
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: "
                  f"spark={bad[2]!r} oracle={bad[3]!r}", flush=True)
            n_fail += 1
        else:
            print(f"PASS {name}: {len(g)} rows", flush=True)
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_timeout} oracle-timeout"
          + (f" ({', '.join(timeouts)})" if timeouts else ""))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 180)
