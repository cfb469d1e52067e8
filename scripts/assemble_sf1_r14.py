#!/usr/bin/env python3
"""Assemble the round-14 CORRECTNESS_sf1.json from the sf1 checker
outputs on round-14 code + corpus (drift rule: nothing inherited).
Merge precedence mirrors assemble_sf10_r14.py: a later specialized
tier supersedes a non-green full-oracle status (recorded as
full_oracle_status); a green is never masked.

Dev tooling only; NOT part of the engine.
Usage: assemble_sf1_r14.py OUT_JSON
"""
import json
import sys

SOURCES = [
    "/tmp/oracle_sf1_r14.json",
    "/tmp/oracle_sf1_r14_retry.json",
    "/tmp/pairs_sf1_r14.json",      # ngram trio sampled+planted
    "/tmp/onesided_sf1_r14.json",   # jjt probe-restricted replay
]

NOTES = {
    "dedup_ngram_jaccard":
        "sampled-precision + planted-recall: the unrestricted gram "
        "self-join oracle OOMs DuckDB at sf1 (r9 NOTES)",
    "dedup_ngram_decisions": "see dedup_ngram_jaccard",
    "join_jaccard_threshold":
        "one-sided probe-restricted replay (full-corpus caps/argmax); "
        "sampled-precision + planted-recall also green",
}


def is_green(status):
    return status.endswith("_green") or status == "rows_only"


merged = {}
for path in SOURCES:
    try:
        d = json.load(open(path))
    except FileNotFoundError:
        print(f"WARNING: missing source {path}", file=sys.stderr)
        continue
    for name, rec in d.items():
        rec = dict(rec)
        prev = merged.get(name)
        if prev is not None:
            if is_green(prev["status"]) and not is_green(rec["status"]):
                continue
            if not is_green(prev["status"]):
                rec["full_oracle_status"] = prev.get(
                    "full_oracle_status", prev["status"])
        merged[name] = rec

for name, note in NOTES.items():
    if name in merged:
        merged[name]["note"] = note

with open(sys.argv[1], "w") as f:
    json.dump(merged, f, indent=1, sort_keys=True)

statuses = {}
for r in merged.values():
    statuses[r["status"]] = statuses.get(r["status"], 0) + 1
green = sum(1 for r in merged.values() if is_green(r["status"]))
print(f"{green}/{len(merged)} green; statuses: {statuses}")
bad = {k: v["status"] for k, v in merged.items()
       if not is_green(v["status"])}
if bad:
    print("non-green:", bad)
