#!/bin/bash
# Round-12 same-day alternated A/B/C for the exact-jaccard bucket
# loop (VerifiedBucketPairs / BucketPairs in VectorFunctions.scala):
#   new = working tree (early-abandon + size-band break),
#   mid = HEAD          (early-abandon only, commits 9fcabc9..bff59d8),
#   old = 9fcabc9^      (pre-early-abandon round-11 loop).
# N,M,O alternated order so within-day drift can't masquerade as a
# win (BASELINE.md measurement-day discipline).
#
# Target: join_jaccard_threshold at sf10-he ONLY. This round's
# driver-regenerated testdata is far denser in near-dup structure
# than round 11's (same code, same box: r11 sf10-he 16-18 s, today
# 367 s new / >520 s mid) — today's sf10-he IS the dense regime the
# sf30-he runs used to probe, and an sf30-he pass would cost hours
# per variant. The cross-round swing also explains r11's unexplained
# "cross-day artifact": /root/testdata is rebuilt by the driver each
# round and its duplicate structure drifts.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/ab_earlyabandon_r12.jsonl
[ "${APPEND:-0}" = 1 ] || : > "$OUT"
VF=src/main/scala/graft/functions/VectorFunctions.scala

cp "$VF" /tmp/vf_new.scala
git show HEAD:"$VF" > /tmp/vf_mid.scala
git show 9fcabc9^:"$VF" > /tmp/vf_old.scala

swap() {
  cp "/tmp/vf_$1.scala" "$VF"
  sbt -batch compile >/dev/null 2>&1 || { echo "COMPILE FAILED for $1" >&2; exit 1; }
}

bench() { # bench <label> <sfdir> <shuffle> <query>
  local line
  line=$(SPARK_DRIVER_MEM=32g SPARK_GRAFT_SHUFFLE="$3" \
    SPARK_GRAFT_SF_DIR="$2" scripts/run_main.sh graft.Bench "$4" 2>/dev/null | tail -1)
  echo "{\"label\":\"$1\",\"bench\":$line}" >> "$OUT"
  echo "=== $1: $line" >&2
}

for round in $(seq "${ROUND0:-1}" "${ROUNDS:-2}"); do
  for variant in new mid old; do
    swap "$variant"
    bench "join_sf10he_${variant}_$round" /tmp/graft_sf10_he 32 join_jaccard_threshold
  done
done

cp /tmp/vf_new.scala "$VF"
sbt -batch compile >/dev/null 2>&1
echo "done; results in $OUT" >&2
cat "$OUT"
