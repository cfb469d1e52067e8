#!/usr/bin/env python3
"""Assemble CORRECTNESS_sf10.json from the per-family checker outputs
produced by the round-9 sf10 rehearsal (all under /tmp; corpora
/tmp/graft_sf10 + /tmp/graft_sf10_he, engine output
/tmp/verify_sf10_r9 — see the memory/BASELINE notes for rebuild
commands).

Precedence: sources are merged in the listed order; an entry REPLACES
an earlier one only if the earlier status is non-green (timeout /
oracle_error / fail from an attempt the later, specialized checker was
built to supersede) or the later one is green. When a specialized
checker overrides a full-oracle attempt, the earlier status is kept as
`full_oracle_status` so the artifact is honest about WHY the
specialized check exists (the full oracle is a statement about DuckDB
tractability at 100x, not about the engine).

Green statuses, by construction:
  oracle_green               full declared-oracle value match
  iterative_oracle_green     declared oracle, round-materialized
                             (same per-round SQL; fused plan OOMs)
  sweep_oracle_green         equivalent O(n log n) dominance sweep
  onesided_replay_green      probe-side-restricted replay (pair-local
                             semantics, restriction provably sound)
  restricted_replay_green    restricted-corpus replay (row-local or
                             closure-closed derivation)
  rowlocal_restricted_green  per-row function on a restricted view
  derived_consistency_green  decision output verified against its own
                             declared derivation
  sampled_planted_green      sampled-precision + planted-recall
  sampled_candidates_green   full candidate derivation + sampled
                             exact verification (precision AND recall
                             over the sampled slice)
  rows_only                  model-dependent output (driver gate
                             rows-checks; quality pinned by dedicated
                             recall gates)

Dev tooling only; NOT part of the engine.

Usage: assemble_sf10.py OUT_JSON
"""
import json
import sys

SOURCES = [
    # full-oracle sweeps (earliest; superseded where intractable)
    "/tmp/oracle_sf10_light.json",
    "/tmp/oracle_sf10_p1_partial.json",
    "/tmp/oracle_sf10_grpA.json",
    "/tmp/oracle_sf10_grpB2.json",
    "/tmp/oracle_sf10_grpC.json",
    "/tmp/oracle_link_sf10.json",
    # specialized scale checkers, in the order they were produced
    "/tmp/replay_sf10.json",
    "/tmp/onesided_sf10.json",
    "/tmp/onesided_emb_sf10.json",
    "/tmp/rowsonly_sf10.json",
    "/tmp/derived_sf10.json",
    "/tmp/rowlocal_sf10.json",
    "/tmp/onesided_cj_sf10.json",
    "/tmp/sorted_nbr_sf10.json",
    "/tmp/pairs_sf10he.json",
    "/tmp/onesided_ham_sf10.json",
    "/tmp/giter_sf10.json",
    "/tmp/skyline_sf10.json",
    "/tmp/onesided_jjt_sf10he.json",
    # round-12: captured-model literal export extended to sf10 — the
    # 9 former rows_only queries (kmeans/semantic/lr/pq/ivf families +
    # stream_quality_filter) re-run with the trained model embedded in
    # the dumped oracle SQL, full DuckDB value compare
    "/tmp/oracle_sf10_captured.json",
]

# Declared, by-design degrades recorded alongside a green: the
# fixed-gram-universe sf10 corpus (a deliberately pathological
# degeneracy: gram vocabulary does NOT grow with the corpus) under the
# DEFAULT pair budget engages the rarest-first df-ceiling and misses
# 3/100 planted pairs at effCap=78 with zero precision errors — the
# documented budget behavior, not a defect; the realistic-entropy
# corpus needs no guard and is exact (0/104 missed).
NOTES = {
    "dedup_ngram_jaccard":
        "high-entropy sf10 corpus exact (0/104 planted missed, 0 bad "
        "precision); fixed-universe corpus at default budget keeps its "
        "DECLARED df-ceiling degrade: 3/100 planted missed at "
        "effCap=78, 0 precision errors (pairs_sf10fu)",
    "dedup_ngram_decisions":
        "high-entropy sf10 corpus exact (0 wrongly-kept, 0 bad dup_of)",
    "join_jaccard_threshold":
        "verified on the realistic-entropy sf10 corpus (sparse "
        "candidate regime: skinny postings + original-predicate "
        "verify). The fixed-gram-universe corpus forces the dense "
        "inline-verified regime, whose exact shipped mass (~105 GB "
        "postings x gram arrays) exceeds this box's free disk — an "
        "inherent cost of EXACT jaccard on a deliberately degenerate "
        "corpus (a cluster's aggregate disk absorbs it; the budgeted "
        "Dedup.ngramJaccard is the declared degrade path); "
        "dense-regime correctness pinned at sf1-fixed (71 s, "
        "sampled-precision 328/328, planted-recall 326/326) and by "
        "the regime-equality spec",
}


def is_green(status):
    return status.endswith("_green") or status in ("oracle_green",
                                                   "rows_only")


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
                continue  # never let a later failure mask a green
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
