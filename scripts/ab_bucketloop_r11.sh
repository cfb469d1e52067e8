#!/bin/bash
# Round-11 same-day alternated A/B for the primitive-array bucket-pair
# loops (BucketPairs / VerifiedBucketPairs): NEW = working tree, OLD =
# HEAD's VectorFunctions.scala swapped in and recompiled, back to back
# in N,O,N,O order so within-day drift can't masquerade as a win
# (BASELINE.md measurement-day discipline). Sequential, one JVM at a
# time; queries: dedup_ngram_jaccard at sf30 (operator path) and
# join_jaccard_threshold at sf10-he (sparse rewrite path).
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/ab_bucketloop_r11.jsonl
: > "$OUT"
VF=src/main/scala/graft/functions/VectorFunctions.scala

cp "$VF" /tmp/vf_new.scala
git show HEAD:"$VF" > /tmp/vf_old.scala

swap() { # swap new|old
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
    bench "ngram_sf30_${variant}_$round" /tmp/graft_sf30 96 dedup_ngram_jaccard
    bench "join_sf10he_${variant}_$round" /tmp/graft_sf10_he 32 join_jaccard_threshold
  done
done

# leave the working tree on NEW
cp /tmp/vf_new.scala "$VF"
sbt -batch compile >/dev/null 2>&1
echo "done; results in $OUT" >&2
cat "$OUT"
