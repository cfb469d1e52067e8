#!/usr/bin/env python3
"""Iterative replay of the graph oracles at rehearsal scale (sf10),
where the declared single-statement oracles OOM DuckDB — not because
the per-round math is heavy, but because the 5 unrolled CTE rounds
(each a full edges-join + re-aggregation, with CTE rescans) build
their pipelines CONCURRENTLY: ~58 GiB of simultaneous hash tables at
sf10 where one round needs a few GiB.

Soundness: this runs the SAME per-round SQL text as the declared
oracle (`oracle_sql.json`), but materializes each round into a temp
table and drops the previous one — the integer arithmetic
(// floor-division on BIGINT ranks scaled by 1e12, 15/85 damping) is
byte-for-byte the oracle's expression; only the execution schedule
changes (sequential rounds instead of one fused plan). The final
SELECT and ORDER BY are the oracle's. Peak memory is one round's
join+agg instead of five.

Compare: full value-identical check against the engine parquet, same
discipline as check_oracle_scaled.py (both outputs are totally
ordered by unique node_id, so a sort-by-id normalization of the
multi-file engine read preserves order-sensitivity).

Statuses feed CORRECTNESS_sf10. Dev tooling only; NOT part of the
engine.

Usage: check_graph_iter.py SF_DIR OUT_DIR RESULT_JSON
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

ROUNDS = 5
SCALE = 1000000000000


def connect():
    con = duckdb.connect()
    con.execute("SET memory_limit='%s'" % os.environ.get("DUCK_MEM", "30GB"))
    con.execute("SET threads=%s" % os.environ.get("DUCK_THREADS", "16"))
    con.execute("SET temp_directory='%s'"
                % os.environ.get("DUCK_TEMP_DIR", "/tmp/duck_giter_tmp"))
    con.execute("SET max_temp_directory_size='%s'"
                % os.environ.get("DUCK_TEMP", "38GiB"))
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[: -len(".parquet")]
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    return con


def compare(name, want):
    """Value-identical compare vs the engine output (sorted by the
    oracle's unique total-order key, so multi-file reads are safe)."""
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        return "fail", "no result parquet"
    got = pd.concat([pq.read_table(f).to_pandas() for f in files],
                    ignore_index=True)
    key = [c for c in ("node_id", "p_partkey") if c in got.columns]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        return "fail", f"columns {list(got.columns)} != {list(want.columns)}"
    if len(got) != len(want):
        return "fail", f"rows {len(got)} != {len(want)}"
    for c in got.columns:
        gv, wv = got[c].tolist(), want[c].tolist()
        for i in range(len(gv)):
            a, b = gv[i], wv[i]
            if a is None and b is None:
                continue
            if a != a and b != b:  # NaN == NaN for nullable numerics
                continue
            if a != b:
                return "fail", f"col {c} row {i}: {a!r} != {b!r}"
    return None, f"{len(got)} rows value-identical"


def pagerank(con):
    con.execute("""
      CREATE TEMP TABLE pr_pairs AS
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS sp
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey""")
    # edge list pre-joined with src outdeg: one round = one join + agg
    con.execute("""
      CREATE TEMP TABLE pr_el AS
      WITH edges AS (SELECT c AS src, sp AS dst FROM pr_pairs
                     UNION ALL SELECT sp, c FROM pr_pairs),
      deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)
      SELECT e.src, e.dst, d.outdeg
      FROM edges e JOIN deg d ON d.src = e.src""")
    con.execute("""
      CREATE TEMP TABLE pr_nodes AS
      SELECT c_custkey * 2 AS id FROM customer
      UNION ALL SELECT s_suppkey * 2 + 1 FROM supplier""")
    n = con.execute("SELECT count(*) FROM pr_nodes").fetchone()[0]
    con.execute(f"""
      CREATE TEMP TABLE pr_r AS
      SELECT id, CAST({SCALE} // {n} AS BIGINT) AS rank FROM pr_nodes""")
    for _ in range(ROUNDS):
        # the oracle's per-round expression, verbatim semantics
        con.execute(f"""
          CREATE TEMP TABLE pr_next AS
          SELECT n.id,
            CAST(15 * {SCALE} // (100 * {n})
              + (85 * coalesce(sum(x.contrib), 0)) // 100 AS BIGINT)
              AS rank
          FROM pr_nodes n LEFT JOIN (
            SELECT el.dst AS id, r.rank // el.outdeg AS contrib
            FROM pr_el el JOIN pr_r r ON el.src = r.id) x ON x.id = n.id
          GROUP BY n.id""")
        con.execute("DROP TABLE pr_r")
        con.execute("ALTER TABLE pr_next RENAME TO pr_r")
    want = con.execute("""
      SELECT CAST(id AS BIGINT) AS node_id,
        CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END
          AS node_type,
        CAST(id // 2 AS BIGINT) AS node_key,
        rank AS rank_scaled
      FROM pr_r ORDER BY node_id""").fetchdf()
    for t in ("pr_pairs", "pr_el", "pr_nodes", "pr_r"):
        con.execute(f"DROP TABLE IF EXISTS {t}")
    return want


def bfs(con):
    con.execute("""
      CREATE TEMP TABLE bf_pairs AS
      SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS c,
             CAST(l_suppkey * 2 + 1 AS BIGINT) AS sp
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey""")
    con.execute("""
      CREATE TEMP TABLE bf_e AS
      SELECT c AS src, sp AS dst FROM bf_pairs
      UNION ALL SELECT sp, c FROM bf_pairs""")
    con.execute("""
      CREATE TEMP TABLE bf_lv AS
      SELECT CAST(c_custkey * 2 AS BIGINT) AS id, 0 AS h
      FROM customer WHERE c_nationkey = 0""")
    con.execute("CREATE TEMP TABLE bf_s AS SELECT id FROM bf_lv")
    for h in range(1, ROUNDS):
        # the oracle's s(k) = distinct successors of s(k-1); min(h)
        # over the union of all levels is taken at the end, as declared
        con.execute(f"""
          CREATE TEMP TABLE bf_next AS
          SELECT DISTINCT e.dst AS id
          FROM bf_e e JOIN bf_s s ON e.src = s.id""")
        con.execute(f"INSERT INTO bf_lv SELECT id, {h} FROM bf_next")
        con.execute("DROP TABLE bf_s")
        con.execute("ALTER TABLE bf_next RENAME TO bf_s")
    want = con.execute("""
      WITH n AS (
        SELECT CAST(c_custkey * 2 AS BIGINT) AS id FROM customer
        UNION ALL
        SELECT CAST(s_suppkey * 2 + 1 AS BIGINT) FROM supplier),
      d AS (SELECT id, CAST(min(h) AS BIGINT) AS hops
            FROM bf_lv GROUP BY id)
      SELECT n.id AS node_id,
        CASE WHEN n.id % 2 = 0 THEN 'customer' ELSE 'supplier' END
          AS node_type,
        n.id // 2 AS node_key, d.hops
      FROM n LEFT JOIN d ON n.id = d.id
      ORDER BY node_id""").fetchdf()
    for t in ("bf_pairs", "bf_e", "bf_lv", "bf_s"):
        con.execute(f"DROP TABLE IF EXISTS {t}")
    return want


results = {}
for name, fn in (("graph_pagerank", pagerank), ("graph_bfs", bfs)):
    t0 = time.time()
    try:
        con = connect()
        want = fn(con)
        con.close()
        bad, detail = compare(name, want)
        status = bad or "iterative_oracle_green"
    except Exception as e:
        status = "oracle_error"
        detail = f"{type(e).__name__}: {str(e)[:200]}"
    secs = round(time.time() - t0, 1)
    results[name] = {"status": status, "detail": detail, "secs": secs}
    print(f"{name}: {status} ({secs}s) {detail}", flush=True)

with open(result_path, "w") as f:
    json.dump(results, f, indent=1, sort_keys=True)
