#!/usr/bin/env python3
"""Sampled-pair + planted-recall verification for the queries whose
FULL DuckDB oracle is intractable at rehearsal scale (the ngram-jaccard
family: the oracle's unrestricted gram self-join OOMs DuckDB at sf1,
while the engine's AllPairs machinery answers in seconds).

Two independent checks per query, both LINEAR in corpus size:

 PRECISION — deterministically sample <=10k emitted rows and have
   DuckDB recompute the exact metric for exactly those pairs (grams
   rebuilt only for the sampled docs; joined only along sampled
   pairs). Every claimed jaccard must equal the recomputation and
   clear the threshold.

 RECALL — planted ground truth: documents sharing a 50-char raw-text
   prefix (the generator's near-dup signature; ScaleUp's per-copy word
   permutation decorrelates copies, so the truth set scales linearly).
   DuckDB computes the exact jaccard for those candidate pairs
   (bounded: prefix groups are small) and keeps those >= threshold;
   every truth pair must appear in the engine output — the operator is
   exact AllPairs, so required recall is 1.0, not a floor.

Statuses feed CORRECTNESS_sf1 next to check_oracle_scaled.py's.
Dev tooling only; NOT part of the engine.

Usage: check_scaled_pairs.py SF_DIR OUT_DIR RESULT_JSON [subset]
"""
import json, sys, glob, os
import duckdb

sf_dir = sys.argv[1]
out_dir = sys.argv[2]
result_path = sys.argv[3]
subset = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

SAMPLE_N = 10000
# 8-char grams over whitespace-normalized lowercase text — the exact
# normalization the engine and the full oracle share
GRAM_CTES = """
nt AS (SELECT d.doc_id, trim(regexp_replace(lower(d.text), '\\s+', ' ',
         'g')) AS t
       FROM documents d JOIN ids ON d.doc_id = ids.id),
gr AS (SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id, unnest(CASE WHEN length(t) >= 8
      THEN list_transform(generate_series(1, length(t) - 7),
                          i -> substr(t, i, 8))
      ELSE [t] END) AS g
    FROM nt) u),
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


def connect():
    con = duckdb.connect()
    con.execute("SET memory_limit='30GB'")
    con.execute("SET threads=16")
    con.execute("SET temp_directory='/tmp/duck_scaled_tmp'")
    con.execute("SET max_temp_directory_size='30GiB'")
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[: -len(".parquet")]
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    return con


def engine_view(con, name, view):
    files = f"{out_dir}/{name}/*.parquet"
    if not glob.glob(files):
        raise FileNotFoundError(f"no engine output for {name}")
    con.execute(
        f"CREATE VIEW {view} AS SELECT * FROM read_parquet('{files}')")


def check_pairs(name, threshold):
    """Engine output is (id_a, id_b, jaccard) — precision + recall."""
    con = connect()
    engine_view(con, name, "eng")
    n_out = con.execute("SELECT count(*) FROM eng").fetchone()[0]

    # PRECISION over a deterministic hash-ordered sample
    precision_sql = f"""
    WITH pr AS (
      SELECT id_a, id_b, jaccard AS claimed FROM eng
      ORDER BY hash(id_a * 1000003 + id_b) LIMIT {SAMPLE_N}),
    ids AS (SELECT id_a AS id FROM pr UNION SELECT id_b FROM pr),
    {GRAM_CTES}
    SELECT count(*) AS n,
      count(*) FILTER (WHERE abs(j.jac - pr.claimed) > 1e-9
                          OR j.jac < {threshold}) AS bad
    FROM pr JOIN j ON j.id_a = pr.id_a AND j.id_b = pr.id_b
    """
    n, bad = con.execute(precision_sql).fetchone()

    # RECALL over the planted prefix-sharing truth set
    recall_sql = f"""
    WITH pfx AS (SELECT substr(text, 1, 50) AS p, doc_id
                 FROM documents WHERE length(text) >= 50),
    grp AS (SELECT p FROM pfx GROUP BY p
            HAVING count(*) > 1 AND count(*) <= 150
            ORDER BY hash(p) LIMIT 100),
    pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM pfx a JOIN grp USING (p)
           JOIN pfx b ON b.p = a.p AND a.doc_id < b.doc_id),
    ids AS (SELECT id_a AS id FROM pr UNION SELECT id_b FROM pr),
    {GRAM_CTES},
    truth AS (SELECT id_a, id_b FROM j WHERE jac >= {threshold})
    SELECT count(*) AS n_truth,
      count(*) FILTER (WHERE e.id_a IS NULL) AS missed
    FROM truth t LEFT JOIN eng e
      ON e.id_a = t.id_a AND e.id_b = t.id_b
    """
    n_truth, missed = con.execute(recall_sql).fetchone()
    con.close()
    ok = bad == 0 and missed == 0 and n > 0 and n_truth > 0
    detail = (f"output={n_out}; precision sample {n} pairs, {bad} bad; "
              f"planted truth {n_truth} pairs, {missed} missed")
    return ("sampled_planted_green" if ok else "fail"), detail


def check_decisions(name, pairs_name, threshold):
    """Engine output is (doc_id, keep, dup_of) over the ngram pair
    graph. Sampled precision: every sampled non-keep row's
    (dup_of, doc_id) must be a genuine >=threshold pair. Planted
    recall: for every planted truth pair (a, b), b cannot keep (its
    min neighbor is <= a < b)."""
    con = connect()
    engine_view(con, name, "dec")
    n_out = con.execute("SELECT count(*) FROM dec").fetchone()[0]

    precision_sql = f"""
    WITH s AS (
      SELECT CAST(dup_of AS BIGINT) AS id_a, doc_id AS id_b FROM dec
      WHERE NOT keep
      ORDER BY hash(doc_id) LIMIT {SAMPLE_N}),
    pr AS (SELECT id_a, id_b FROM s),
    ids AS (SELECT id_a AS id FROM pr UNION SELECT id_b FROM pr),
    {GRAM_CTES}
    SELECT count(*) AS n,
      count(*) FILTER (WHERE j.jac < {threshold}) AS bad
    FROM pr JOIN j ON j.id_a = pr.id_a AND j.id_b = pr.id_b
    """
    n, bad = con.execute(precision_sql).fetchone()
    # NOTE dup_of < doc_id always (min-id representative), so
    # (dup_of, doc_id) is already in canonical id_a < id_b order.

    recall_sql = f"""
    WITH pfx AS (SELECT substr(text, 1, 50) AS p, doc_id
                 FROM documents WHERE length(text) >= 50),
    grp AS (SELECT p FROM pfx GROUP BY p
            HAVING count(*) > 1 AND count(*) <= 150
            ORDER BY hash(p) LIMIT 100),
    pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM pfx a JOIN grp USING (p)
           JOIN pfx b ON b.p = a.p AND a.doc_id < b.doc_id),
    ids AS (SELECT id_a AS id FROM pr UNION SELECT id_b FROM pr),
    {GRAM_CTES},
    truth AS (SELECT id_a, id_b FROM j WHERE jac >= {threshold})
    SELECT count(*) AS n_truth,
      count(*) FILTER (WHERE d.keep) AS kept_wrongly
    FROM truth t JOIN dec d ON d.doc_id = t.id_b
    """
    n_truth, kept = con.execute(recall_sql).fetchone()
    con.close()
    ok = bad == 0 and kept == 0 and n > 0 and n_truth > 0
    detail = (f"output={n_out}; precision sample {n} non-keep rows, "
              f"{bad} bad dup_of pairs; planted truth {n_truth} pairs, "
              f"{kept} higher ids wrongly kept")
    return ("sampled_planted_green" if ok else "fail"), detail


CHECKS = {
    "dedup_ngram_jaccard": lambda: check_pairs("dedup_ngram_jaccard", 0.7),
    "dedup_ngram_decisions":
        lambda: check_decisions("dedup_ngram_decisions",
                                "dedup_ngram_jaccard", 0.7),
    "join_jaccard_threshold":
        lambda: check_pairs("join_jaccard_threshold", 0.7),
}

results = {}
for name, fn in sorted(CHECKS.items()):
    if subset and name not in subset:
        continue
    import time
    t0 = time.time()
    try:
        status, detail = fn()
    except Exception as e:
        status, detail = "error", f"{type(e).__name__}: {str(e)[:200]}"
    results[name] = {"status": status, "detail": detail,
                     "secs": round(time.time() - t0, 1)}
    print(f"{name}: {status} ({results[name]['secs']}s) {detail}",
          flush=True)

with open(result_path, "w") as f:
    json.dump(results, f, indent=1, sort_keys=True)
