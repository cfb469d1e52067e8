#!/usr/bin/env python3
"""Derived-consistency verification for the dedup DECISION queries at
rehearsal scales where their full DuckDB oracles are intractable (the
unrolled min-label iterations over the corpus-sized pair graph OOM
DuckDB's temp disk at sf10).

Soundness model: dedup_minhash_decisions and dedup_cc_decisions are
PURE deterministic functions of (doc id universe, near-dup pair set) —
one-round min-neighbor star contraction and its min-label fixpoint
respectively (operators/Dedup.scala decisionsFromPairs /
connectedComponents). DuckDB recomputes both functions EXACTLY from the
engine's own verified pair output (dedup_minhash_lsh — full-oracle
green at sf1, restricted-replay green at sf10) and the doc id universe,
and compares row-for-row. This verifies the decision derivation
end-to-end; the pair set's own correctness is established by its
separate checks. Dev tooling only; NOT part of the engine.

Usage: check_derived_decisions.py SF_DIR OUT_DIR RESULT_JSON
"""
import glob
import json
import os
import sys
import time

import duckdb

sf_dir, out_dir, result_path = sys.argv[1], sys.argv[2], sys.argv[3]

con = duckdb.connect()
con.execute("SET memory_limit='20GB'")
con.execute("SET threads=8")
p = f"{sf_dir}/documents.parquet"
src = f"{p}/*.parquet" if os.path.isdir(p) else p
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{src}')")
con.execute("CREATE VIEW pairs AS SELECT * FROM read_parquet("
            f"'{out_dir}/dedup_minhash_lsh/*.parquet')")

# labels = min-label fixpoint via iterative halving (materialized
# rounds, not a recursive CTE: label propagation halves the max chain
# length per round, and near-dup components are shallow)
con.execute("""
CREATE TABLE lbl AS
SELECT doc_id, doc_id AS rep FROM documents
""")
con.execute("""
CREATE TABLE edges AS
SELECT id_a AS a, id_b AS b FROM pairs
UNION ALL SELECT id_b, id_a FROM pairs
""")
rounds = 0
while True:
    rounds += 1
    con.execute("""
    CREATE OR REPLACE TABLE nxt AS
    SELECT l.doc_id,
           least(l.rep, coalesce(min(r.rep), l.rep)) AS rep
    FROM lbl l LEFT JOIN edges e ON e.a = l.doc_id
    LEFT JOIN lbl r ON r.doc_id = e.b
    GROUP BY l.doc_id, l.rep
    """)
    changed = con.execute(
        "SELECT count(*) FROM nxt n JOIN lbl l USING (doc_id) "
        "WHERE n.rep <> l.rep").fetchone()[0]
    con.execute("DROP TABLE lbl")
    con.execute("ALTER TABLE nxt RENAME TO lbl")
    if changed == 0 or rounds > 60:
        break

results = {}


def compare(name, want_sql):
    t0 = time.time()
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        return "fail", "no engine output", 0.0
    con.execute(f"CREATE OR REPLACE VIEW eng_{name} AS "
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
    n_eng = con.execute(f"SELECT count(*) FROM eng_{name}").fetchone()[0]
    bad = con.execute(f"""
    WITH want AS ({want_sql})
    SELECT count(*) FROM (
      SELECT doc_id, keep, dup_of FROM want
      EXCEPT SELECT doc_id, keep, dup_of FROM eng_{name}
      UNION ALL
      SELECT doc_id, keep, dup_of FROM eng_{name}
      EXCEPT SELECT doc_id, keep, dup_of FROM want)
    """).fetchone()[0]
    n_want = con.execute(
        f"WITH want AS ({want_sql}) SELECT count(*) FROM want").fetchone()[0]
    secs = round(time.time() - t0, 1)
    if n_eng != n_want:
        return "fail", f"rows {n_eng} != {n_want}", secs
    if bad:
        return "fail", f"{bad} rows diverge from derived decisions", secs
    return ("derived_consistency_green",
            f"{n_eng} rows identical to the DuckDB re-derivation from the "
            f"engine's verified pair set ({rounds} label rounds)", secs)


one_round = """
SELECT d.doc_id,
  d.doc_id = least(d.doc_id, coalesce(m.min_nb, d.doc_id)) AS keep,
  CASE WHEN least(d.doc_id, coalesce(m.min_nb, d.doc_id)) <> d.doc_id
       THEN least(d.doc_id, coalesce(m.min_nb, d.doc_id)) END AS dup_of
FROM documents d LEFT JOIN (
  SELECT a AS doc_id, min(b) AS min_nb FROM edges GROUP BY a) m
  USING (doc_id)
"""
fixpoint = """
SELECT doc_id, doc_id = rep AS keep,
  CASE WHEN doc_id <> rep THEN rep END AS dup_of
FROM lbl
"""

for name, sql in [("dedup_minhash_decisions", one_round),
                  ("dedup_cc_decisions", fixpoint)]:
    status, detail, secs = compare(name, sql)
    results[name] = {"status": status, "detail": detail, "secs": secs}
    print(f"{name}: {status} ({secs}s) {detail}", flush=True)

with open(result_path, "w") as f:
    json.dump(results, f, indent=1, sort_keys=True)
