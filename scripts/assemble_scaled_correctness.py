#!/usr/bin/env python3
"""Assemble the scaled correctness artifact (CORRECTNESS_sf1.json /
CORRECTNESS_sf10.json) from the two scaled checkers' outputs:

  check_oracle_scaled.py  -> full-value DuckDB oracle statuses
  check_scaled_pairs.py   -> sampled-precision + planted-recall
                             statuses for the DuckDB-intractable
                             ngram-jaccard family

The sampled/planted result WINS for its queries (the full oracle is
known intractable there — its status would be a statement about DuckDB,
not about the engine). Everything else keeps the full-oracle status.
Dev tooling only; NOT part of the engine.

Usage: assemble_scaled_correctness.py ORACLE_JSON PAIRS_JSON OUT_JSON
"""
import json
import sys

oracle = json.load(open(sys.argv[1]))
pairs = json.load(open(sys.argv[2]))

merged = dict(oracle)
for name, rec in pairs.items():
    prev = merged.get(name)
    rec = dict(rec)
    if prev is not None:
        rec["full_oracle_status"] = prev["status"]
    merged[name] = rec

with open(sys.argv[3], "w") as f:
    json.dump(merged, f, indent=1, sort_keys=True)

statuses = {}
for r in merged.values():
    statuses[r["status"]] = statuses.get(r["status"], 0) + 1
green = statuses.get("oracle_green", 0) + statuses.get(
    "sampled_planted_green", 0)
print(f"{green}/{len(merged)} green; statuses: {statuses}")
bad = {k: v for k, v in merged.items()
       if v["status"] not in ("oracle_green", "sampled_planted_green",
                              "rows_only")}
for k, v in sorted(bad.items()):
    print(f"  NOT GREEN {k}: {v['status']} — {v['detail'][:140]}")
