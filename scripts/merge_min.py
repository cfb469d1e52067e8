#!/usr/bin/env python3
"""Merge N single-pass graft.Bench JSON lines into a min-of-N record.

Usage: merge_min.py out.json note pass1.json pass2.json [...]
Each input is the one-line {"metric":...,"queries":{...}} Bench emits;
output keeps the schema with per-query minima and their sum as value.
"""
import json, sys

if len(sys.argv) < 4:
    print("usage: merge_min.py out.json note pass1.json [pass2.json ...]",
          file=sys.stderr)
    sys.exit(2)
out, note, paths = sys.argv[1], sys.argv[2], sys.argv[3:]
passes = [json.load(open(p)) for p in paths]
# min over the INTERSECTION of query sets; any asymmetry (a pass
# recorded before/after a headline change) is loud, never a silent
# drop or a KeyError
sets = [set(p["queries"]) for p in passes]
common = set.intersection(*sets)
for p, s in zip(paths, sets):
    extra = s - common
    if extra:
        print(f"WARNING: {p} has queries absent from other passes, "
              f"excluded from the min: {sorted(extra)}", file=sys.stderr)
queries = {}
for q in sorted(common):
    queries[q] = round(min(p["queries"][q] for p in passes), 3)
rec = {
    "metric": passes[0]["metric"],
    "value": round(sum(queries.values()), 3),
    "unit": passes[0]["unit"],
    "queries": queries,
    "sf": passes[0]["sf"],
    "note": note,
}
json.dump(rec, open(out, "w"), indent=1)
print(out, rec["value"], "s over", len(queries), "queries")
