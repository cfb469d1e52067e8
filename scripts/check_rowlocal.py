#!/usr/bin/env python3
"""Doc-restricted replay for ROW-LOCAL queries at rehearsal scales
where the full DuckDB oracle exceeds the watchdog (e.g.
text_fingerprints: the FNV rolling hash unrolls 8 HUGEINT mix steps per
character position — ~1.2e9 HUGEINT expression chains at sf10, >30 min
in DuckDB while the engine's codegen'd expression takes seconds).

Soundness: these queries are PER-DOCUMENT pure functions (no joins,
windows keyed only within doc_id, no corpus-global state), so running
the UNMODIFIED oracle over a restricted documents view equals
restricting the full oracle's output — two-sided restriction is exact.
The sample is deterministic hash-ordered, large (20k docs), and the
engine output is filtered to the same ids and compared value-for-value.
Dev tooling only; NOT part of the engine.

Usage: check_rowlocal.py SF_DIR OUT_DIR RESULT_JSON QUERY[,QUERY...]
"""
import glob
import json
import os
import sys
import time

import duckdb
import pyarrow.parquet as pq

sf_dir, out_dir, result_path = sys.argv[1], sys.argv[2], sys.argv[3]
queries = sys.argv[4].split(",")
SAMPLE_N = 20000

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in queries:
    t0 = time.time()
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        results[name] = {"status": "fail", "detail": "no engine output",
                         "secs": 0.0}
        continue
    con = duckdb.connect()
    con.execute("SET memory_limit='25GB'")
    con.execute("SET threads=16")
    p = f"{sf_dir}/documents.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW documents_full AS "
                f"SELECT * FROM read_parquet('{src}')")
    con.execute(f"""
    CREATE TABLE sample_ids AS
    SELECT doc_id AS id FROM documents_full
    ORDER BY hash(doc_id * 7919) LIMIT {SAMPLE_N}""")
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_full "
                "WHERE doc_id IN (SELECT id FROM sample_ids)")
    for other in glob.glob(f"{sf_dir}/*.parquet"):
        t = os.path.basename(other)[: -len(".parquet")]
        if t == "documents":
            continue
        osrc = f"{other}/*.parquet" if os.path.isdir(other) else other
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{osrc}')")
    try:
        want = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        results[name] = {"status": "oracle_error",
                         "detail": f"{type(e).__name__}: {str(e)[:160]}",
                         "secs": round(time.time() - t0, 1)}
        con.close()
        continue
    ids = set(x[0] for x in
              con.execute("SELECT id FROM sample_ids").fetchall())
    con.close()
    got = pq.read_table(files[0]).to_pandas()
    got = got[got["doc_id"].isin(ids)]
    got = got[sorted(got.columns)].sort_values(
        sorted(got.columns)).reset_index(drop=True)
    want = want[sorted(want.columns)].sort_values(
        sorted(want.columns)).reset_index(drop=True)
    secs = round(time.time() - t0, 1)
    if list(got.columns) != list(want.columns):
        st, detail = "fail", (f"columns {list(got.columns)} != "
                              f"{list(want.columns)}")
    elif len(got) != len(want):
        st, detail = "fail", f"restricted rows {len(got)} != {len(want)}"
    else:
        bad = None
        for c in got.columns:
            gv, wv = got[c].tolist(), want[c].tolist()
            for i in range(len(gv)):
                a, b = gv[i], wv[i]
                if a is None and b is None:
                    continue
                try:
                    if a != a and b != b:
                        continue
                except Exception:
                    pass
                if a != b:
                    bad = f"col {c} row {i}: {a!r} != {b!r}"
                    break
            if bad:
                break
        if bad:
            st, detail = "fail", bad
        else:
            st = "rowlocal_restricted_green"
            detail = (f"{len(got)} doc-restricted rows value-identical "
                      f"(|S|={len(ids)}; row-local oracle replayed on the "
                      f"restricted corpus)")
    results[name] = {"status": st, "detail": detail, "secs": secs}
    print(f"{name}: {st} ({secs}s) {detail}", flush=True)

with open(result_path, "w") as f:
    json.dump(results, f, indent=1, sort_keys=True)
