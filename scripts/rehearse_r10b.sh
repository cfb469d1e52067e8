#!/bin/bash
# Round-10 rehearsal, part 2: clean same-day A/B points (no mid-run
# recompiles). bfs new2 = typed hash-aggregable BitmapAgg; assoc off =
# keyspace-bounded plan disabled via an absurd per-task budget.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/rehearse_r10b.jsonl
: > "$OUT"

run() {
  local label="$1"; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "=== $label ===" >&2
  local line
  line=$(env "${envs[@]}" scripts/run_main.sh graft.Bench "$1" 2>/dev/null | tail -1)
  echo "{\"label\":\"$label\",\"bench\":$line}" >> "$OUT"
}

run sf30_bfs_typedagg JAVA_TOOL_OPTIONS=-Dspark.rdd.compress=true \
  SPARK_DRIVER_MEM=32g SPARK_GRAFT_SHUFFLE=96 \
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf30 -- graph_bfs
run sf10_bfs_typedagg JAVA_TOOL_OPTIONS="-Dspark.rdd.compress=true -Dspark.graft.bfs.denseFactor=1365" \
  SPARK_DRIVER_MEM=32g SPARK_GRAFT_SHUFFLE=96 SPARK_GRAFT_BCAST=1 \
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 -- graph_bfs
run sf10_assoc_new SPARK_DRIVER_MEM=32g SPARK_GRAFT_SHUFFLE=32 \
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 -- assoc_rules
run sf10_assoc_off JAVA_TOOL_OPTIONS=-Dspark.graft.assoc.pairAggTargetRows=999999999999 \
  SPARK_DRIVER_MEM=32g SPARK_GRAFT_SHUFFLE=32 \
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 -- assoc_rules
run sf30_assoc_new SPARK_DRIVER_MEM=32g SPARK_GRAFT_SHUFFLE=96 \
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf30 -- assoc_rules
run sf30_assoc_off JAVA_TOOL_OPTIONS=-Dspark.graft.assoc.pairAggTargetRows=999999999999 \
  SPARK_DRIVER_MEM=32g SPARK_GRAFT_SHUFFLE=96 \
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf30 -- assoc_rules
echo DONE >> "$OUT"
