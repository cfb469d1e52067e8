#!/bin/bash
# CPU-time companion to ab_earlyabandon_r12.sh: the wall-clock A/B at
# sf10-he came back noise-dominated (new {184,283}, mid {342,242},
# old {421,172} — swings 2.5x with identical code+data, single shared
# disk + AQE), so attribute the loop changes by the metric they
# actually change: per-stage EXECUTOR CPU TIME from the event log,
# one logged pass per variant. Wall-clock noise (spill waits,
# writeback, scheduling) does not contaminate CPU seconds.
set -uo pipefail
cd "$(dirname "$0")/.."
VF=src/main/scala/graft/functions/VectorFunctions.scala

# Unconditionally refresh the snapshots: a stale /tmp/vf_*.scala from
# an earlier A/B would benchmark the wrong "new" variant AND be copied
# back over the working tree at the end, silently reverting source
# edits made since that run.
cp "$VF" /tmp/vf_new.scala
git show HEAD:"$VF" > /tmp/vf_mid.scala
git show 9fcabc9^:"$VF" > /tmp/vf_old.scala

OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

for variant in new mid old; do
  cp "/tmp/vf_$variant.scala" "$VF"
  sbt -batch compile >/dev/null 2>&1 || { echo "COMPILE FAILED $variant" >&2; exit 1; }
  EVDIR="/tmp/evlogs_$variant"
  rm -rf "$EVDIR"; mkdir -p "$EVDIR"
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf10_he SPARK_GRAFT_SHUFFLE=32 \
  java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Dspark.eventLog.enabled=true -Dspark.eventLog.dir="file://$EVDIR" \
    -Xmx32g -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Bench join_jaccard_threshold 2>/dev/null | tail -1 \
    | sed "s/^/=== $variant wall: /" >&2
done

cp /tmp/vf_new.scala "$VF"
sbt -batch compile >/dev/null 2>&1
echo "event logs in /tmp/evlogs_{new,mid,old}" >&2
