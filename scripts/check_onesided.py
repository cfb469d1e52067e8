#!/usr/bin/env python3
"""One-sided restricted replay for the capped/argmax similarity queries
at rehearsal scale (sf10), where the full oracle's banded self-join is
DuckDB-intractable and a TWO-sided corpus restriction is UNSOUND
(bucket caps and per-vector argmax depend on full-corpus occupancy).

Soundness: only the probe side `a` of the oracle's final self-join is
restricted to a deterministic sample S. Every corpus-dependent
derivation — signatures, band keys, the keep-smallest bucket cap
(`rn <= N` over the FULL banded set), the per-vector argmax partition —
is computed over the full corpus exactly as the unrestricted oracle
would; the modified query returns exactly the oracle rows whose probe
id lies in S. Comparing those against the engine rows with the same
probe-id restriction therefore verifies precision AND recall for every
sampled probe id, caps and argmax included.

S = hash-ordered engine-output probe ids (<=PROBE_SAMPLE) + hash-ordered
corpus filler (so empty output cannot vacuously pass) + all docs of a
hash-ordered sample of planted 50-char-prefix groups (document tables
only — recall probed where true pairs live).

Dev tooling only; NOT part of the engine.
Usage: check_onesided.py SF_DIR OUT_DIR RESULT_JSON [subset]
"""
import glob
import json
import os
import sys
import time

import duckdb
import pyarrow.parquet as pq

sf_dir = sys.argv[1]
out_dir = sys.argv[2]
result_path = sys.argv[3]
subset = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

PROBE_SAMPLE = 3000
FILLER = 1500
GROUP_SAMPLE = 40

# query -> (table, table id col, probe col in engine output,
#           "FROM X a JOIN X b" alias table to restrict, its id col)
QUERIES = {
    "dedup_simhash": ("documents", "doc_id", "id_a", "capped", "doc_id"),
    "dedup_phash": ("documents", "doc_id", "id_a", "capped", "doc_id"),
    "dedup_embedding":
        ("embeddings", "vec_id", "vec_id", "capped", "vec_id"),
    "stream_embedding_dedup":
        ("embeddings", "vec_id", "vec_id", "capped", "vec_id"),
    # pair-local semantics (signatures + residual predicate, no caps or
    # argmax), so the one-sided restriction is trivially sound; used at
    # scales where the full banded self-join oracle is intractable
    "join_cosine_threshold":
        ("embeddings", "vec_id", "id_a", "bb", "vec_id"),
    "join_hamming_threshold":
        ("documents", "doc_id", "id_a", "sig", "doc_id"),
    # exact jaccard >= t over ALL pairs (id_a < id_b): pair-local, no
    # caps; restricting the gram self-join's a-side to S yields exactly
    # the oracle rows with id_a in S — the engine restriction matches
    "join_jaccard_threshold":
        ("documents", "doc_id", "id_a", "gr", "doc_id"),
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


oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name, (table, idcol, probe, jt, jid) in sorted(QUERIES.items()):
    if subset and name not in subset:
        continue
    t0 = time.time()
    try:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = {"status": "fail",
                             "detail": "no engine output", "secs": 0.0}
            continue
        con = duckdb.connect()
        con.execute("SET memory_limit='%s'"
                    % os.environ.get("DUCK_MEM", "30GB"))
        con.execute("SET threads=%s" % os.environ.get("DUCK_THREADS", "16"))
        con.execute("SET temp_directory='%s'"
                    % os.environ.get("DUCK_TEMP_DIR", "/tmp/duck_1s_tmp"))
        con.execute("SET max_temp_directory_size='%s'"
                    % os.environ.get("DUCK_TEMP", "30GiB"))
        for p in glob.glob(f"{sf_dir}/*.parquet"):
            t = os.path.basename(p)[: -len(".parquet")]
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
        con.execute(f"CREATE VIEW eng AS SELECT * "
                    f"FROM read_parquet('{out_dir}/{name}/*.parquet')")
        planted = ""
        if table == "documents":
            planted = f"""
            UNION
            SELECT id FROM (
              SELECT doc_id AS id FROM documents
              WHERE length(text) >= 50 AND substr(text, 1, 50) IN (
                SELECT p FROM (
                  SELECT substr(text, 1, 50) AS p FROM documents
                  WHERE length(text) >= 50
                  GROUP BY 1 HAVING count(*) BETWEEN 2 AND 150
                  ORDER BY hash(p) LIMIT {GROUP_SAMPLE})))"""
        con.execute(f"""
        CREATE TABLE sample_ids AS
        SELECT DISTINCT id FROM (
          SELECT id FROM (
            SELECT {probe} AS id FROM eng
            ORDER BY hash({probe} * 1000003) LIMIT {PROBE_SAMPLE})
          UNION
          SELECT id FROM (
            SELECT {idcol} AS id FROM {table}
            ORDER BY hash({idcol} * 7919) LIMIT {FILLER})
          {planted})""")
        n_s = con.execute("SELECT count(*) FROM sample_ids").fetchone()[0]
        needle = f"FROM {jt} a JOIN {jt} b"
        sql = oracle[name]
        if needle not in sql:
            results[name] = {"status": "error",
                             "detail": f"join pattern not found: {needle}",
                             "secs": 0.0}
            continue
        sql = sql.replace(
            needle,
            f"FROM (SELECT * FROM {jt} WHERE {jid} IN "
            f"(SELECT id FROM sample_ids)) a JOIN {jt} b", 1)
        want = con.execute(sql).fetchdf()
        ids = set(x[0] for x in
                  con.execute("SELECT id FROM sample_ids").fetchall())
        import pandas as pd
        got = pd.concat([pq.read_table(f).to_pandas() for f in files],
                        ignore_index=True)
        got = got[got[probe].isin(ids)]
        sort_cols = [c for c in (probe, "id_b", "nn_id") if c in got.columns]
        got = got.sort_values(sort_cols).reset_index(drop=True)
        want = want.sort_values(sort_cols).reset_index(drop=True)
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        con.close()
        if list(got.columns) != list(want.columns):
            st, detail = "fail", (f"columns {list(got.columns)} != "
                                  f"{list(want.columns)}")
        elif len(got) != len(want):
            st, detail = "fail", (f"probe-restricted rows {len(got)} != "
                                  f"{len(want)} (|S|={n_s})")
        else:
            st, detail = "onesided_replay_green", (
                f"|S|={n_s}, {len(got)} probe-restricted rows "
                f"value-identical (full-corpus caps/argmax)")
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
