#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against DuckDB oracles and diff. Usage: check.py <sfDir> <outDir>."""
import glob
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def table_glob(sf_dir: str, t: str) -> str:
    """Driver testdata is flat files (<t>.parquet); Spark-written
    fixtures (e.g. the sf1 rehearsal set) are directories of part
    files. Return the DuckDB read pattern that matches either."""
    import os
    p = f"{sf_dir}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


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


def compare(got: pd.DataFrame, exp: pd.DataFrame):
    """The driver-mirroring diff: columns, then TYPES (the invariant
    requires identical types both sides — a type drift the driver's
    hash-match would fail must fail here too), then row count, then
    cell-exact values. Returns None on match, else a failure string."""
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        return f"columns {list(g.columns)} vs {list(e.columns)}"
    if g.dtypes.tolist() != e.dtypes.tolist():
        return f"dtypes {g.dtypes.tolist()} vs {e.dtypes.tolist()}"
    if len(g) != len(e):
        return f"rows {len(g)} vs {len(e)}"
    for i in range(len(g)):
        for c in g.columns:
            if not values_equal(g[c].iloc[i], e[c].iloc[i]):
                return (f"row {i} col {c}: spark={g[c].iloc[i]!r} "
                        f"oracle={e[c].iloc[i]!r}")
    return None


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_glob(sf_dir, t)}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.read_parquet(files[0])
        if name not in oracles:
            print(f"ROWS {name}: {len(got)} rows (no oracle)")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        diff = compare(got, exp)
        if diff:
            print(f"FAIL {name}: {diff}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
