#!/usr/bin/env python3
"""Restricted-corpus exact replay for PAIRWISE similarity queries whose
full DuckDB oracle is intractable at rehearsal scale (sf10): the
banded/minhash/simhash/embedding families' oracles self-join the whole
corpus, which overflows DuckDB's temp budget two decades up — but their
per-pair metrics (shingle jaccard, simhash hamming, cosine) depend ONLY
on the two endpoint rows. Restriction is therefore sound:

  engine_output ∩ (S × S)  ==  full_oracle( corpus restricted to S )

for any id set S — the right side computes exactly the qualifying pairs
inside S, the left side is what the engine claimed for those pairs, and
equality verifies BOTH precision and recall over the S×S sub-square.

S is deterministic and bounded: the endpoint ids of <=PAIR_SAMPLE
hash-ordered engine output pairs, plus every doc in a hash-ordered
sample of planted 50-char-prefix near-dup groups (ScaleUp's planted
structure — so recall is probed exactly where true pairs live), plus a
hash-ordered filler sample of corpus ids (so empty-output cannot
vacuously pass).

NOT sound for decision/top-k/best-neighbor queries (dup_of, top-k and
argmax depend on the whole corpus); those use their own checks. Dev tooling only; NOT part
of the engine.

Usage:
  check_restricted_replay.py SF_DIR OUT_DIR RESULT_JSON [subset]
"""
import glob
import json
import os
import sys

import duckdb
import pyarrow.parquet as pq

sf_dir = sys.argv[1]
out_dir = sys.argv[2]
result_path = sys.argv[3]
subset = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

PAIR_SAMPLE = 4000
GROUP_SAMPLE = 60
FILLER = 2000

# query -> (base table, id column in that table, engine id columns)
QUERIES = {
    "dedup_minhash_lsh": ("documents", "doc_id", ("id_a", "id_b")),
    "dedup_minhash_increment": ("documents", "doc_id", ("id_a", "id_b")),
    "dedup_minhash_index_merge": ("documents", "doc_id", ("id_a", "id_b")),
    "dedup_minhash_epoch_append": ("documents", "doc_id", ("id_a", "id_b")),
    "stream_minhash_pairs": ("documents", "doc_id", ("id_a", "id_b")),
    "dedup_simhash": ("documents", "doc_id", ("id_a", "id_b")),
    "dedup_phash": ("documents", "doc_id", ("id_a", "id_b")),
}


def eq(a, b):
    if a is None and b is None:
        return True
    try:
        if a != a and b != b:
            return True
    except Exception:
        pass
    return a == b


def connect():
    con = duckdb.connect()
    con.execute("SET memory_limit='30GB'")
    con.execute("SET threads=16")
    con.execute("SET temp_directory='/tmp/duck_scaled_tmp'")
    con.execute("SET max_temp_directory_size='30GiB'")
    return con


oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name, (table, idcol, (ca, cb)) in sorted(QUERIES.items()):
    if subset and name not in subset:
        continue
    import time
    t0 = time.time()
    try:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = {"status": "fail", "detail": "no engine output",
                             "secs": 0.0}
            continue
        con = connect()
        for p in glob.glob(f"{sf_dir}/*.parquet"):
            t = os.path.basename(p)[: -len(".parquet")]
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            if t == table:
                con.execute(
                    f"CREATE VIEW __full_{t} AS SELECT * "
                    f"FROM read_parquet('{src}')")
            else:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
        con.execute(f"CREATE VIEW eng AS SELECT * "
                    f"FROM read_parquet('{out_dir}/{name}/*.parquet')")
        # deterministic sample set S
        planted = ""
        if table == "documents":
            planted = f"""
            UNION
            SELECT doc_id AS id FROM __full_documents
            WHERE length(text) >= 50 AND substr(text, 1, 50) IN (
              SELECT p FROM (
                SELECT substr(text, 1, 50) AS p FROM __full_documents
                WHERE length(text) >= 50
                GROUP BY 1 HAVING count(*) BETWEEN 2 AND 150
                ORDER BY hash(p) LIMIT {GROUP_SAMPLE}))"""
        con.execute(f"""
        CREATE TABLE sample_ids AS
        SELECT DISTINCT id FROM (
          SELECT {ca} AS id FROM (
            SELECT {ca}, {cb} FROM eng
            ORDER BY hash({ca} * 1000003 + {cb}) LIMIT {PAIR_SAMPLE})
          UNION
          SELECT {cb} FROM (
            SELECT {ca}, {cb} FROM eng
            ORDER BY hash({ca} * 1000003 + {cb}) LIMIT {PAIR_SAMPLE})
          UNION
          SELECT id FROM (
            SELECT {idcol} AS id FROM __full_{table}
            ORDER BY hash({idcol} * 7919) LIMIT {FILLER})
          {planted})""")
        n_s = con.execute("SELECT count(*) FROM sample_ids").fetchone()[0]
        con.execute(f"""
        CREATE VIEW {table} AS SELECT * FROM __full_{table}
        WHERE {idcol} IN (SELECT id FROM sample_ids)""")
        want = con.execute(oracle[name]).fetchdf()
        got_full = pq.read_table(files[0]).to_pandas()
        ids = set(x[0] for x in con.execute(
            "SELECT id FROM sample_ids").fetchall())
        got = got_full[got_full[ca].isin(ids) & got_full[cb].isin(ids)]
        got = got.sort_values([ca, cb]).reset_index(drop=True)
        want = want.sort_values([ca, cb]).reset_index(drop=True)
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        con.close()
        if list(got.columns) != list(want.columns):
            st, detail = "fail", (f"columns {list(got.columns)} != "
                                  f"{list(want.columns)}")
        elif len(got) != len(want):
            st, detail = "fail", (f"restricted rows {len(got)} != "
                                  f"{len(want)} (|S|={n_s})")
        else:
            st, detail = "restricted_replay_green", (
                f"|S|={n_s}, {len(got)} in-sample rows value-identical")
            for c in got.columns:
                gv, wv = got[c].tolist(), want[c].tolist()
                bad = next((i for i in range(len(gv))
                            if not eq(gv[i], wv[i])), None)
                if bad is not None:
                    st = "fail"
                    detail = f"col {c} row {bad}: {gv[bad]!r} != {wv[bad]!r}"
                    break
    except Exception as e:
        st, detail = "error", f"{type(e).__name__}: {str(e)[:200]}"
    results[name] = {"status": st, "detail": detail,
                     "secs": round(time.time() - t0, 1)}
    print(f"{name}: {st} ({results[name]['secs']}s) {detail}", flush=True)

with open(result_path, "w") as f:
    json.dump(results, f, indent=1, sort_keys=True)
