#!/usr/bin/env python3
"""Sampled-candidate verification for dedup_sorted_nbr at rehearsal
scale (sf10), where the full oracle times out — not in the window (the
block/sort/lead candidate derivation over the whole corpus is cheap)
but in the gram join that scores ALL ~3N candidate pairs at once.

Soundness: the candidate set depends on the full corpus (sort order +
window), so a corpus restriction is UNSOUND — instead DuckDB derives
the FULL candidate set exactly as the oracle does, then exact jaccard
is computed only for a deterministic hash-ordered sample of pairs:

  CAND sample  — for each sampled candidate pair, engine membership
                 must EQUAL (jaccard >= threshold): precision AND
                 recall over the sampled slice of the candidate space.
  ENGINE sample — every sampled engine pair must BE a candidate and
                 clear the threshold (no invented neighbors).

Both checks are linear (grams rebuilt only for sampled docs).
Statuses feed CORRECTNESS_sf10. Dev tooling only; NOT part of the
engine.

Usage: check_sorted_nbr.py SF_DIR OUT_DIR RESULT_JSON
"""
import glob
import json
import os
import sys
import time

import duckdb

sf_dir = sys.argv[1]
out_dir = sys.argv[2]
result_path = sys.argv[3]

CAND_SAMPLE = 20000
ENG_SAMPLE = 10000
THRESHOLD = 0.7

con = duckdb.connect()
con.execute("SET memory_limit='30GB'")
con.execute("SET threads=16")
con.execute("SET temp_directory='%s'"
            % os.environ.get("DUCK_TEMP_DIR", "/tmp/duck_snbr_tmp"))
con.execute("SET max_temp_directory_size='30GiB'")
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[: -len(".parquet")]
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
files = f"{out_dir}/dedup_sorted_nbr/*.parquet"
if not glob.glob(files):
    raise SystemExit("no engine output for dedup_sorted_nbr")
con.execute(f"CREATE VIEW eng AS SELECT * FROM read_parquet('{files}')")

# Full-corpus candidate derivation — identical to the oracle's CTEs.
CAND_CTES = """
nt AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS k
  FROM documents),
bl AS (SELECT doc_id, k, substr(k, 1, 4) AS block FROM nt),
nbr AS (
  SELECT doc_id,
    lead(doc_id, 1) OVER w AS n1,
    lead(doc_id, 2) OVER w AS n2,
    lead(doc_id, 3) OVER w AS n3
  FROM bl
  WINDOW w AS (PARTITION BY block ORDER BY k, doc_id)),
cand AS (
  SELECT DISTINCT least(doc_id, nb) AS id_a, greatest(doc_id, nb) AS id_b
  FROM (SELECT doc_id, unnest([n1, n2, n3]) AS nb FROM nbr)
  WHERE nb IS NOT NULL)
"""

# Exact jaccard over only the pairs in `pr` (grams for sampled docs).
GRAM_CTES = """
ids AS (SELECT id_a AS id FROM pr UNION SELECT id_b FROM pr),
snt AS (SELECT d.doc_id, trim(regexp_replace(lower(d.text), '\\s+', ' ',
          'g')) AS t
        FROM documents d JOIN ids ON d.doc_id = ids.id),
gr AS (SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id, unnest(CASE WHEN length(t) >= 8
      THEN list_transform(generate_series(1, length(t) - 7),
                          i -> substr(t, i, 8))
      ELSE [t] END) AS g
    FROM snt) u),
sizes AS (SELECT doc_id, count(*) AS n FROM gr GROUP BY doc_id),
common AS (
  SELECT pr.id_a, pr.id_b, count(*) AS n_common
  FROM pr JOIN gr ga ON ga.doc_id = pr.id_a
  JOIN gr gb ON gb.doc_id = pr.id_b AND gb.g = ga.g
  GROUP BY 1, 2),
j AS (
  SELECT pr.id_a, pr.id_b,
    CAST(coalesce(c.n_common, 0) AS DOUBLE)
      / CAST(na.n + nb.n - coalesce(c.n_common, 0) AS DOUBLE) AS jac
  FROM pr LEFT JOIN common c
    ON c.id_a = pr.id_a AND c.id_b = pr.id_b
  JOIN sizes na ON na.doc_id = pr.id_a
  JOIN sizes nb ON nb.doc_id = pr.id_b)
"""

t0 = time.time()
n_out = con.execute("SELECT count(*) FROM eng").fetchone()[0]

# Materialize the full candidate set once (cheap: window + distinct).
con.execute(f"CREATE TEMP TABLE cand_t AS WITH {CAND_CTES} "
            "SELECT * FROM cand")
n_cand = con.execute("SELECT count(*) FROM cand_t").fetchone()[0]

# CAND sample: engine membership must equal (jac >= threshold).
cand_sql = f"""
WITH pr AS (
  SELECT id_a, id_b FROM cand_t
  ORDER BY hash(id_a * 1000003 + id_b) LIMIT {CAND_SAMPLE}),
{GRAM_CTES}
SELECT count(*) AS n,
  count(*) FILTER (WHERE (j.jac >= {THRESHOLD}) != (e.id_a IS NOT NULL))
    AS disagree,
  count(*) FILTER (WHERE j.jac >= {THRESHOLD}) AS n_true
FROM j LEFT JOIN eng e ON e.id_a = j.id_a AND e.id_b = j.id_b
"""
n_c, disagree, n_true = con.execute(cand_sql).fetchone()

# ENGINE sample: every emitted pair is a candidate above threshold.
eng_sql = f"""
WITH pr AS (
  SELECT id_a, id_b FROM eng
  ORDER BY hash(id_a * 1000003 + id_b) LIMIT {ENG_SAMPLE}),
{GRAM_CTES}
SELECT count(*) AS n,
  count(*) FILTER (WHERE j.jac < {THRESHOLD}
                      OR c.id_a IS NULL) AS bad
FROM j LEFT JOIN cand_t c ON c.id_a = j.id_a AND c.id_b = j.id_b
"""
n_e, bad = con.execute(eng_sql).fetchone()

ok = (disagree == 0 and bad == 0 and n_c > 0 and n_e > 0 and n_true > 0)
status = "sampled_candidates_green" if ok else "fail"
detail = (f"output={n_out}, candidates={n_cand}; cand sample {n_c} "
          f"({n_true} true), {disagree} membership disagreements; "
          f"engine sample {n_e}, {bad} bad")
secs = round(time.time() - t0, 1)
print(f"dedup_sorted_nbr: {status} ({secs}s) {detail}", flush=True)
with open(result_path, "w") as f:
    json.dump({"dedup_sorted_nbr": {
        "status": status, "detail": detail, "secs": secs}}, f, indent=1)
