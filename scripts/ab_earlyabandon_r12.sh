#!/bin/bash
# Round-12 same-day alternated A/B for the early-abandon pair
# verification (mergeIntersectAtLeast in VerifiedBucketPairs): NEW =
# working tree, OLD = the pre-early-abandon VectorFunctions.scala
# (commit 9fcabc9^) swapped in and recompiled, N,O,N,O order so
# within-day drift can't masquerade as a win (BASELINE.md
# measurement-day discipline). Target: join_jaccard_threshold at
# sf30-he — the dense regime whose bucket-loop aggregate the r10
# profile measured 94% CPU-bound — with a quick sf10-he (sparse
# regime) pair alongside.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/ab_earlyabandon_r12.jsonl
: > "$OUT"
VF=src/main/scala/graft/functions/VectorFunctions.scala

cp "$VF" /tmp/vf_new.scala
git show 9fcabc9^:"$VF" > /tmp/vf_old.scala

swap() {
  if [ "$1" = old ]; then cp /tmp/vf_old.scala "$VF"; else cp /tmp/vf_new.scala "$VF"; fi
  sbt -batch compile >/dev/null 2>&1 || { echo "COMPILE FAILED for $1" >&2; exit 1; }
}

bench() { # bench <label> <sfdir> <shuffle> <query>
  local line
  line=$(SPARK_DRIVER_MEM=32g SPARK_GRAFT_SHUFFLE="$3" \
    SPARK_GRAFT_SF_DIR="$2" scripts/run_main.sh graft.Bench "$4" 2>/dev/null | tail -1)
  echo "{\"label\":\"$1\",\"bench\":$line}" >> "$OUT"
  echo "=== $1: $line" >&2
}

for round in 1 2; do
  for variant in new old; do
    swap "$variant"
    bench "join_sf10he_${variant}_$round" /tmp/graft_sf10_he 32 join_jaccard_threshold
  done
done
# sf30-he: one alternated pair (a pass is ~10 min; two passes per
# variant would burn an hour for a record the sf10-he pairs bracket)
for variant in new old; do
  swap "$variant"
  bench "join_sf30he_${variant}_1" /tmp/graft_sf30_he 96 join_jaccard_threshold
done

cp /tmp/vf_new.scala "$VF"
sbt -batch compile >/dev/null 2>&1
echo "done; results in $OUT" >&2
cat "$OUT"
