#!/usr/bin/env python3
"""Bounded sf1 spot-check oracles for the d-family gates whose full
DuckDB ground truth is all-pairs (days at sf1 BY DESIGN — the r7-r10
sweeps excluded d02-d11/d13 for exactly that cost). Three bounded
strata, each EXACT on what it covers, together pinning the excluded
gates at sf1 in seconds instead of days:

1. SUBSQUARE (per-doc + pair gates): sample S = F complete planted
   replica families (the MakeSf1 near-duplicate groups — sampled
   WHOLE, so the planted-dup stratum is inside the square) + R uniform
   ids; run the gate's ORIGINAL oracle SQL (from oracle_sql.json,
   byte-identical semantics) against the corpus restricted to S via a
   view swap, and compare cell-exact (check.py semantics) against the
   engine's sf1 output filtered to rows whose ids all lie in S.
   Per-doc values and pair predicates depend only on their own rows,
   so the restriction is exact — this pins soundness AND completeness
   (recall) on the S x S square.
2. PAIR SAMPLE (pair gates): K pairs drawn uniformly from the
   engine's own sf1 output get their similarity recomputed
   pair-exactly in DuckDB (soundness anywhere in the corpus, not just
   the square), and K uniform random NON-output pairs are verified to
   not qualify (global completeness spot check — a qualifying
   non-output pair is a recall failure and fails the gate).
3. CLUSTER CLOSURE (d07/d09/d11): conditional-on-pairs EXACTNESS over
   the FULL sf1 corpus — given the engine pair sets (d06's output for
   d07/d11, d05's for d09; both spot-verified by strata 1-2), DuckDB
   recomputes connected components, canonical min-id labels, keep
   flags (and d11's token-count argmax) with a recursive CTE and
   compares ALL rows. Only the all-pairs similarity stage is sampled;
   the clustering semantics are verified exactly.

The soundness argument is the same one DedupOps cites (Chaudhuri
ICDE'06 / Xiao WWW'08): candidate generation is provably complete by
construction, so sampled verification of the similarity arithmetic +
exact verification of the graph closure covers the failure modes an
all-pairs oracle would.

Usage: spot_check_d.py <sf1Dir> <outDir> [families] [randoms] [pairsK] [seed]
  outDir = graft.Verify dump at sf1 containing the d* gate parquet
  dirs and oracle_sql.json. Exit 1 on any FAIL.
"""
import glob
import json
import os
import random
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import TABLES, compare, table_glob  # noqa: E402

NORM = r"lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"


def floor4(e):
    return f"CAST(floor(({e}) * 10000) AS DOUBLE) / 10000"


# 3-word shingle set CTE body, identical to the d06/d07/d11/d13 oracles.
def sh_cte(src):
    return f"""
  SELECT doc_id, CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
    ELSE list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      FOR i IN generate_series(1, len(ws) - 2)]) END AS sh
  FROM (SELECT doc_id, string_split({NORM}, ' ') AS ws FROM {src})"""


JACC = floor4(
    "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)"
    " / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))")

# Per-pair value SQL (temp table sp(id1,id2) holds the pairs to score);
# value expressions are copied verbatim from the gates' full oracles.
PAIR_VALUE_SQL = {
    "d06_jaccard_near_dups": f"""
WITH ids AS (SELECT id1 AS id FROM sp UNION SELECT id2 FROM sp),
s AS ({sh_cte("raw_documents WHERE doc_id IN (SELECT id FROM ids)")})
SELECT p.id1, p.id2, {JACC} AS jaccard
FROM sp p JOIN s a ON a.doc_id = p.id1 JOIN s b ON b.doc_id = p.id2
ORDER BY id1, id2""",
    "d13_containment_dedup": f"""
WITH ids AS (SELECT id1 AS id FROM sp UNION SELECT id2 FROM sp),
s AS ({sh_cte("raw_documents WHERE doc_id IN (SELECT id FROM ids)")})
SELECT p.id1, p.id2,
  CAST((10000 * len(list_intersect(a.sh, b.sh))) // len(a.sh) AS BIGINT)
    AS c1_bp,
  CAST((10000 * len(list_intersect(a.sh, b.sh))) // len(b.sh) AS BIGINT)
    AS c2_bp
FROM sp p JOIN s a ON a.doc_id = p.id1 JOIN s b ON b.doc_id = p.id2
ORDER BY id1, id2""",
    "d05_cosine_near_dups": """
SELECT p.id1, p.id2,
  round(list_dot_product(a.v, b.v) /
    (sqrt(list_dot_product(a.v, a.v)) *
     sqrt(list_dot_product(b.v, b.v))), 6) AS score
FROM sp p
JOIN (SELECT vec_id, embedding::DOUBLE[] v FROM raw_embeddings) a
  ON a.vec_id = p.id1
JOIN (SELECT vec_id, embedding::DOUBLE[] v FROM raw_embeddings) b
  ON b.vec_id = p.id2
ORDER BY id1, id2""",
    "d10_fuzzy_name_pairs": """
SELECT p.id1, p.id2,
  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM sp p JOIN raw_customer a ON a.c_custkey = p.id1
          JOIN raw_customer b ON b.c_custkey = p.id2
ORDER BY id1, id2""",
}
PAIR_VALUE_SQL["d08_incremental_dedup"] = \
    PAIR_VALUE_SQL["d06_jaccard_near_dups"]

# gate -> (base table, id column, qualify predicate over value cols,
#          pair-population constraint for negative sampling)
PAIR_GATES = {
    "d06_jaccard_near_dups": ("documents", "doc_id",
                              lambda r: r["jaccard"] >= 0.8, "lt"),
    "d13_containment_dedup": ("documents", "doc_id",
                              lambda r: max(r["c1_bp"], r["c2_bp"]) >= 9000,
                              "lt"),
    "d05_cosine_near_dups": ("embeddings", "vec_id",
                             lambda r: r["score"] >= 0.45, "lt"),
    "d10_fuzzy_name_pairs": ("customer", "c_custkey",
                             lambda r: r["dist"] <= 1, "lt"),
    # batch (id1 % 10 == 0) x corpus (id2 % 10 != 0), not id1 < id2
    "d08_incremental_dedup": ("documents", "doc_id",
                              lambda r: r["jaccard"] >= 0.8, "batch"),
}
DOC_GATES = {
    "d02_shingle_count": ("documents", "doc_id"),
    "d03_minhash_bands": ("documents", "doc_id"),
    "d04_simhash": ("documents", "doc_id"),
}
# cluster gate -> (pair-source gate, base table, id column)
CLUSTER_GATES = {
    "d07_dedup_clusters": ("d06_jaccard_near_dups", "documents", "doc_id"),
    "d09_semantic_dedup": ("d05_cosine_near_dups", "embeddings", "vec_id"),
    "d11_quality_keeper": ("d06_jaccard_near_dups", "documents", "doc_id"),
}

failures = []


def report(gate, stratum, diff, detail=""):
    if diff is None:
        print(f"PASS {gate} [{stratum}] {detail}", flush=True)
    else:
        print(f"FAIL {gate} [{stratum}]: {diff}", flush=True)
        failures.append((gate, stratum))


def engine_df(out_dir, gate):
    files = sorted(glob.glob(f"{out_dir}/{gate}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    n_fam = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    n_rand = int(sys.argv[4]) if len(sys.argv) > 4 else 200
    pairs_k = int(sys.argv[5]) if len(sys.argv) > 5 else 1000
    seed = int(sys.argv[6]) if len(sys.argv) > 6 else 11
    rng = random.Random(seed)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW raw_{t} AS SELECT * FROM "
            f"'{table_glob(sf_dir, t)}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    # --- planted-family structure (MakeSf1): id = base + replica*span,
    # span = the power of 10 just above the base key space
    def ids_and_span(table, idc):
        ids = [r[0] for r in con.execute(
            f"SELECT DISTINCT {idc} FROM raw_{table}").fetchall()]
        mx = max(ids)
        span = 10 ** (len(str(mx)) - 1)
        return sorted(ids), span

    def sample_ids(table, idc, n_f, n_r):
        """Union of n_f complete replica families + n_r uniform ids."""
        ids, span = ids_and_span(table, idc)
        id_set = set(ids)
        bases = sorted({i % span for i in ids})
        n_copies = max(ids) // span + 1
        fam_bases = rng.sample(bases, min(n_f, len(bases)))
        s = {b + i * span for b in fam_bases for i in range(n_copies)}
        s &= id_set
        s |= set(rng.sample(ids, min(n_r, len(ids))))
        return sorted(s)

    def restrict(table, idc, ids):
        """Point the oracle's table names at raw data, with `table`
        restricted to ids — the original oracle SQL then computes the
        exact ground truth of the restricted corpus."""
        con.execute("CREATE OR REPLACE TEMP TABLE s_ids(id BIGINT)")
        con.executemany("INSERT INTO s_ids VALUES (?)",
                        [(int(i),) for i in ids])
        for t in TABLES:
            if t == table:
                con.execute(
                    f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM raw_{t} "
                    f"WHERE {idc} IN (SELECT id FROM s_ids)")
            else:
                con.execute(
                    f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM raw_{t}")

    # ---------- stratum 1: subsquare ----------
    sub_ids = {}  # table -> sampled S (reused across its gates)
    for gate in sorted(list(DOC_GATES) + list(PAIR_GATES)):
        table, idc = (DOC_GATES.get(gate) or PAIR_GATES[gate][:2])
        got = engine_df(out_dir, gate)
        if got is None:
            report(gate, "subsquare", "no engine output")
            continue
        if table not in sub_ids:
            # per-doc restriction is exact at any size; pair gates are
            # quadratic in |S| on the oracle side, so S stays modest
            sub_ids[table] = sample_ids(table, idc, n_fam, n_rand)
        s = sub_ids[table]
        restrict(table, idc, s)
        exp = con.execute(oracles[gate]).fetchdf()
        s_set = set(s)
        if gate in DOC_GATES:
            g = got[got[idc].isin(s_set)].reset_index(drop=True)
        else:
            g = got[got["id1"].isin(s_set)
                    & got["id2"].isin(s_set)].reset_index(drop=True)
        report(gate, "subsquare", compare(g, exp),
               f"|S|={len(s)} rows={len(g)}")

    # ---------- stratum 2: pair samples ----------
    for gate, (table, idc, qualify, pop) in sorted(PAIR_GATES.items()):
        got = engine_df(out_dir, gate)
        if got is None:
            continue
        ids, _ = ids_and_span(table, idc)
        # positives: K engine-output pairs, values recomputed pair-exact
        pos = got.sample(n=min(pairs_k, len(got)),
                         random_state=seed).reset_index(drop=True)
        con.execute("CREATE OR REPLACE TEMP TABLE sp(id1 BIGINT, id2 BIGINT)")
        con.executemany("INSERT INTO sp VALUES (?, ?)",
                        [(int(a), int(b))
                         for a, b in zip(pos["id1"], pos["id2"])])
        exp = con.execute(PAIR_VALUE_SQL[gate]).fetchdf()
        diff = compare(pos, exp)
        if diff is None and not all(
                qualify(r) for _, r in exp.iterrows()):
            diff = "an engine pair does not satisfy the gate threshold"
        report(gate, "pairs+", diff, f"K={len(pos)}")
        # negatives: K random pairs NOT in the engine output must not
        # qualify (a qualifying one is a recall failure)
        out_pairs = set(zip(got["id1"], got["id2"]))
        neg = set()
        attempts = 0
        while len(neg) < pairs_k and attempts < pairs_k * 20:
            attempts += 1
            a, b = rng.choice(ids), rng.choice(ids)
            if pop == "lt":
                a, b = min(a, b), max(a, b)
                if a == b:
                    continue
            else:  # d08: batch x corpus
                if a % 10 != 0:
                    continue
                if b % 10 == 0:
                    continue
            if (a, b) in out_pairs or (a, b) in neg:
                continue
            neg.add((a, b))
        con.execute("CREATE OR REPLACE TEMP TABLE sp(id1 BIGINT, id2 BIGINT)")
        con.executemany("INSERT INTO sp VALUES (?, ?)",
                        [(int(a), int(b)) for a, b in sorted(neg)])
        expn = con.execute(PAIR_VALUE_SQL[gate]).fetchdf()
        bad = [r for _, r in expn.iterrows() if qualify(r)]
        report(gate, "pairs-",
               None if not bad else
               f"{len(bad)} random non-output pairs qualify "
               f"(first: {bad[0].to_dict()})",
               f"K={len(neg)}")

    # ---------- stratum 3: cluster closure (full corpus, exact) ----------
    for gate, (pair_gate, table, idc) in sorted(CLUSTER_GATES.items()):
        got = engine_df(out_dir, gate)
        pairs = engine_df(out_dir, pair_gate)
        if got is None or pairs is None:
            report(gate, "closure", "missing engine output")
            continue
        con.register("ep_src", pairs[["id1", "id2"]])
        con.execute("CREATE OR REPLACE TEMP TABLE ep AS "
                    "SELECT * FROM ep_src")
        reach = f"""
und AS (SELECT id1 AS a, id2 AS b FROM ep
        UNION ALL SELECT id2, id1 FROM ep),
reach(id, m) AS (
  SELECT {idc}, {idc} FROM raw_{table}
  UNION
  SELECT u.a, r.m FROM reach r JOIN und u ON u.b = r.id)"""
        if gate == "d11_quality_keeper":
            sql = f"""WITH RECURSIVE {reach},
cl AS (SELECT id, min(m) AS cluster_id FROM reach GROUP BY id),
tok AS (SELECT doc_id, CAST(CASE WHEN length(trim(text)) = 0 THEN 0
    ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT)
    AS n_tokens FROM raw_documents)
SELECT CAST(id AS BIGINT) AS doc_id,
  CAST(cluster_id AS BIGINT) AS cluster_id, n_tokens,
  CAST(CASE WHEN row_number() OVER (PARTITION BY cluster_id
    ORDER BY n_tokens DESC, id) = 1 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM cl JOIN tok ON tok.doc_id = cl.id ORDER BY doc_id"""
        else:
            sql = f"""WITH RECURSIVE {reach}
SELECT CAST(id AS BIGINT) AS {idc}, CAST(min(m) AS BIGINT) AS cluster_id,
  CAST(CASE WHEN id = min(m) THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM reach GROUP BY id ORDER BY {idc}"""
        exp = con.execute(sql).fetchdf()
        report(gate, "closure", compare(got.reset_index(drop=True), exp),
               f"rows={len(got)} given {len(pairs)} engine pairs")

    n = len(set(g for g, _ in failures))
    total = len(DOC_GATES) + len(PAIR_GATES) + len(CLUSTER_GATES)
    print(f"\nspot-check: {total - n}/{total} gates green"
          + (f"; FAILING: {sorted(set(g for g, _ in failures))}"
             if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
