#!/usr/bin/env python3
"""Exact full-value skyline oracle at rehearsal scale (sf10), where the
declared NOT-EXISTS oracle is quadratic (every part probes every part:
~4e12 dominance tests at sf10) and times out in DuckDB.

Soundness: for the 2-D skyline (minimize price_cents, maximize size)
the dominance test has a closed sweep form. x is dominated iff some d
has (d.price < x.price AND d.size >= x.size) OR
     (d.price = x.price AND d.size > x.size)
— exactly the declared oracle's predicate
(d.price <= x.price AND d.size >= x.size AND one strict) split on
price< vs price=. Therefore x survives iff
  max(size | price <  x.price) <  x.size   AND
  max(size | price == x.price) <= x.size
Both maxima are window functions over a single price-ordered sort:
O(n log n), same rows as the quadratic oracle by construction (ties on
(price, size) all survive together, as under the declared predicate —
dominance requires a strict inequality, so exact duplicates never
dominate each other).

Compare: full value-identical check vs the engine parquet (both
totally ordered by unique p_partkey). Statuses feed CORRECTNESS_sf10.
Dev tooling only; NOT part of the engine.

Usage: check_skyline_sweep.py SF_DIR OUT_DIR RESULT_JSON
"""
import glob
import json
import os
import sys
import time

import duckdb
import pandas as pd
import pyarrow.parquet as pq

sf_dir = sys.argv[1]
out_dir = sys.argv[2]
result_path = sys.argv[3]

t0 = time.time()
con = duckdb.connect()
con.execute("SET memory_limit='%s'" % os.environ.get("DUCK_MEM", "30GB"))
con.execute("SET threads=%s" % os.environ.get("DUCK_THREADS", "16"))
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[: -len(".parquet")]
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

want = con.execute("""
WITH p AS (
  SELECT p_partkey,
         CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS size
  FROM part),
sw AS (
  SELECT p_partkey, price_cents, size,
    max(size) OVER (ORDER BY price_cents
                    RANGE BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING) AS max_below,
    max(size) OVER (PARTITION BY price_cents) AS max_at
  FROM p)
SELECT p_partkey, price_cents, size
FROM sw
WHERE (max_below IS NULL OR max_below < size) AND max_at <= size
ORDER BY p_partkey""").fetchdf()


def compare():
    files = sorted(glob.glob(f"{out_dir}/pareto_skyline/*.parquet"))
    if not files:
        return "fail", "no result parquet"
    got = pd.concat([pq.read_table(f).to_pandas() for f in files],
                    ignore_index=True)
    got = got.sort_values("p_partkey").reset_index(drop=True)
    g = got[sorted(got.columns)]
    w = want.sort_values("p_partkey").reset_index(drop=True)
    w = w[sorted(w.columns)]
    if list(g.columns) != list(w.columns):
        return "fail", f"columns {list(g.columns)} != {list(w.columns)}"
    if len(g) != len(w):
        return "fail", f"rows {len(g)} != {len(w)}"
    for c in g.columns:
        gv, wv = g[c].tolist(), w[c].tolist()
        for i in range(len(gv)):
            if gv[i] != wv[i]:
                return "fail", f"col {c} row {i}: {gv[i]!r} != {wv[i]!r}"
    return "sweep_oracle_green", f"{len(g)} rows value-identical"


status, detail = compare()
secs = round(time.time() - t0, 1)
print(f"pareto_skyline: {status} ({secs}s) {detail}", flush=True)
with open(result_path, "w") as f:
    json.dump({"pareto_skyline": {
        "status": status, "detail": detail, "secs": secs}}, f, indent=1)
