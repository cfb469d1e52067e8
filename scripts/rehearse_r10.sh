#!/bin/bash
# Round-10 scale rehearsal: the three named scale-killers, measured
# same-day old-vs-new where the fix claims a delta. Sequential on
# purpose — one Spark JVM at a time, every number is a quiet-box point.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/rehearse_r10.jsonl
: > "$OUT"

run() { # run <label> <extra-env...> -- <queries>
  local label="$1"; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  local qs="$1"
  echo "=== $label ($qs) ===" >&2
  local line
  line=$(env "${envs[@]}" scripts/run_main.sh graft.Bench "$qs" 2>/dev/null | tail -1)
  echo "{\"label\":\"$label\",\"bench\":$line}" >> "$OUT"
  echo "$line" >&2
}

# sf30: bfs new (dense bitmap rounds) vs old row path, same session day
run sf30_bfs_new SPARK_DRIVER_MEM=32g SPARK_GRAFT_SHUFFLE=96 \
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf30 -- graph_bfs
run sf30_bfs_oldpath JAVA_TOOL_OPTIONS=-Dspark.graft.bfs.denseFactor=-1 \
  SPARK_DRIVER_MEM=32g SPARK_GRAFT_SHUFFLE=96 \
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf30 -- graph_bfs

# sf30: pagerank new prep (one-pass) at both memory points
run sf30_pagerank_32g SPARK_DRIVER_MEM=32g SPARK_GRAFT_SHUFFLE=96 \
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf30 -- graph_pagerank
run sf30_pagerank_64g SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE=96 \
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf30 -- graph_pagerank

# assoc: keyspace-bounded pair aggregate across the decades
run sf10_assoc SPARK_DRIVER_MEM=32g SPARK_GRAFT_SHUFFLE=32 \
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 -- assoc_rules
run sf30_assoc SPARK_DRIVER_MEM=32g SPARK_GRAFT_SHUFFLE=96 \
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf30 -- assoc_rules
run sf100_assoc SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE=320 \
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf100 -- assoc_rules

# sf100 pagerank: the disk-cliff test (r9: fill-then-abort at >54 GB)
run sf100_pagerank SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE=320 \
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf100 -- graph_pagerank

# sf100 bfs: never measured before (r9 stopped at sf30)
run sf100_bfs SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE=320 \
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf100 -- graph_bfs

echo DONE >> "$OUT"
