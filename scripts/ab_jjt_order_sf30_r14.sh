#!/bin/bash
# Round-14 sparse-branch order crossover A/B at sf30-he: the round-13
# A/B refuted the exact-df order in the jaccard rewrite's SPARSE
# branch at sf10-he (ranking shuffles ~1.9k CPU-s vs ~1.2k bucket-loop
# savings). The df-cap refutation's occupancy math predicts the
# balance flips with density: bucket-loop mass grows superlinearly in
# corpus size while the ranking cost is linear in postings — at
# sf30-he the loop is 14.1k CPU-s (r13 single pass), so a 5.8x-class
# mass cut would buy ~11k CPU-s against ~5.7k of ranking. One
# event-logged pass per variant per round, ALTERNATED (off,on,off,on)
# so box waves hit both; attribute by per-stage executor CPU
# (scripts/parse_evlog_cpu.py), the box-noise protocol.
# Output set identity off-vs-on was proven at sf10-he (r13: 1048
# pairs, 0 diff) and is guaranteed by the prefix lemma for any
# consistent total order — this A/B measures cost only.
set -uo pipefail
cd "$(dirname "$0")/.."

OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

CORPUS="${1:-/tmp/graft_sf30_he}"
for round in 1 2; do
  for variant in off on; do
    EVDIR="/tmp/evlogs_jjt30_${variant}${round}"
    rm -rf "$EVDIR"; mkdir -p "$EVDIR"
    SPARK_GRAFT_SF_DIR="$CORPUS" SPARK_GRAFT_SHUFFLE=64 \
    java $OPENS -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC \
      -Dspark.graft.jaccardRewrite.exactDfOrder=$variant \
      -Dspark.eventLog.enabled=true -Dspark.eventLog.dir="file://$EVDIR" \
      -Xmx40g -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
      graft.Bench join_jaccard_threshold 2>/dev/null | tail -1 \
      | sed "s/^/=== $variant$round wall: /"
  done
done
echo "event logs in /tmp/evlogs_jjt30_{off,on}{1,2}; attribute with:"
echo "  python3 scripts/parse_evlog_cpu.py /tmp/evlogs_jjt30_off1 /tmp/evlogs_jjt30_on1 /tmp/evlogs_jjt30_off2 /tmp/evlogs_jjt30_on2"
