#!/usr/bin/env python3
"""Scaled (sf1/sf10) oracle gate with per-query protection.

Same compare as check_oracle.py (schema + row-order-sensitive values),
but built to survive oracles that are intractable at rehearsal scale:
each oracle runs on its own DuckDB connection under a wall-clock
watchdog (con.interrupt) and a memory/temp-disk budget, and the result
is a per-query status record rather than a hard exit — the JSON
artifact feeds CORRECTNESS_sf1. Dev tooling only; NOT part of the
engine.

Usage:
  check_oracle_scaled.py SF_DIR OUT_DIR RESULT_JSON [TIMEOUT_S] [subset]
"""
import json, sys, glob, os, threading, time
import duckdb
import pyarrow.parquet as pq

sf_dir = sys.argv[1]
out_dir = sys.argv[2]
result_path = sys.argv[3]
timeout_s = float(sys.argv[4]) if len(sys.argv) > 4 else 300.0
subset = set(sys.argv[5].split(",")) if len(sys.argv) > 5 else None

views = []
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[: -len(".parquet")]
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    views.append((name, src))

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))


def eq(a, b):
    if a is None and b is None:
        return True
    try:
        if a != a and b != b:  # NaN
            return True
    except Exception:
        pass
    return a == b


def run_one(name, sql):
    """Run one oracle with watchdog + budgets; return (status, detail, secs)."""
    con = duckdb.connect()
    try:
        con.execute("SET memory_limit='%s'"
                    % os.environ.get("DUCK_MEM", "50GB"))
        con.execute("SET threads=%s" % os.environ.get("DUCK_THREADS", "16"))
        con.execute("SET temp_directory='%s'"
                    % os.environ.get("DUCK_TEMP_DIR", "/tmp/duck_scaled_tmp"))
        con.execute("SET max_temp_directory_size='%s'"
                    % os.environ.get("DUCK_TEMP", "38GiB"))
    except Exception:
        pass
    for vname, src in views:
        con.execute(
            f"CREATE VIEW {vname} AS SELECT * FROM read_parquet('{src}')")
    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            try:
                con.interrupt()
            except Exception:
                pass

    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    t0 = time.time()
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        secs = time.time() - t0
        done.set()
        con.close()
        kind = "timeout" if secs >= timeout_s - 1 else "oracle_error"
        return kind, f"{type(e).__name__}: {str(e)[:200]}", secs
    secs = time.time() - t0
    done.set()
    con.close()

    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        return "fail", "no result parquet", secs
    got = pq.read_table(files[0]).to_pandas()
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        return ("fail",
                f"columns {list(got.columns)} != {list(want.columns)}", secs)
    if len(got) != len(want):
        return "fail", f"rows {len(got)} != {len(want)}", secs
    for c in got.columns:
        gv, wv = got[c].tolist(), want[c].tolist()
        bad = next((i for i in range(len(gv)) if not eq(gv[i], wv[i])), None)
        if bad is not None:
            return ("fail",
                    f"col {c} row {bad}: {gv[bad]!r} != {wv[bad]!r}", secs)
    return "oracle_green", f"{len(got)} rows value-identical", secs


results = {}
names = sorted(oracle)
if subset:
    names = [n for n in names if n in subset]
for i, name in enumerate(names):
    status, detail, secs = run_one(name, oracle[name])
    results[name] = {"status": status, "detail": detail,
                     "secs": round(secs, 1)}
    print(f"[{i+1}/{len(names)}] {name}: {status} ({secs:.1f}s) {detail}"
          if status != "oracle_green" else
          f"[{i+1}/{len(names)}] {name}: green ({secs:.1f}s)", flush=True)

# rows-only queries (no oracle SQL)
for res_dir in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(res_dir.rstrip("/"))
    if name in oracle or (subset and name not in subset):
        continue
    files = glob.glob(f"{res_dir}/*.parquet")
    n = pq.read_table(files[0]).num_rows if files else 0
    results[name] = {"status": "rows_only" if n > 0 else "fail",
                     "detail": f"{n} rows", "secs": 0.0}

with open(result_path, "w") as f:
    json.dump(results, f, indent=1, sort_keys=True)
greens = sum(1 for r in results.values() if r["status"] == "oracle_green")
print(f"\n{greens}/{len(results)} oracle_green; statuses:",
      {s: sum(1 for r in results.values() if r['status'] == s)
       for s in set(r['status'] for r in results.values())})
