#!/bin/bash
# Round-14 full sf1 gate on round-14 code + corpus — preempts the
# drift rule (scaled artifacts age one round; the r13 sf1 gate was
# certified on the r13 corpus). /tmp/graft_sf1 must already be the
# ScaleUp K=10 of the CURRENT /root/testdata/sf0.1.
#
# Stages (the r13 sf1 recipe, tooling unchanged):
#   1. engine dump of all 225 queries at /tmp/graft_sf1
#   2. DuckDB full-oracle sweep, 3 shards, 900 s watchdog (the two
#      heavy oracles — dedup_cc_decisions, dedup_sorted_nbr — need it)
#   3. specialized tiers: sampled+planted for the ngram trio (the
#      fixed-universe gram self-join oracle OOMs DuckDB at sf1),
#      one-sided probe-restricted replay for join_jaccard_threshold
#   4. high-budget serial retry of any remaining non-green
#   5. assemble -> CORRECTNESS_sf1.json
# Dev tooling only; NOT part of the engine.
set -uo pipefail
cd "$(dirname "$0")/.."

TRIO="dedup_ngram_jaccard,dedup_ngram_decisions,join_jaccard_threshold"

echo "=== stage 1: sf1 dump ($(date -u +%H:%M:%S))"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 \
  scripts/run_main.sh graft.Verify /tmp/graft_sf1 /tmp/verify_sf1_r14 \
  > /tmp/verify_sf1_r14.log 2>&1 || echo "stage 1 FAILED"
grep -c parquet <(ls /tmp/verify_sf1_r14) || true

echo "=== stage 2: full-oracle sweep, 3 shards ($(date -u +%H:%M:%S))"
python3 - <<'PYEOF'
import json
names = sorted(json.load(open("/tmp/verify_sf1_r14/oracle_sql.json")))
trio = {"dedup_ngram_jaccard", "dedup_ngram_decisions",
        "join_jaccard_threshold"}
names = [n for n in names if n not in trio]
for i in range(3):
    open(f"/tmp/sf1_shard{i}.txt", "w").write(",".join(names[i::3]))
PYEOF
for i in 0 1 2; do
  DUCK_MEM=24GB DUCK_THREADS=10 DUCK_TEMP=16GiB \
  DUCK_TEMP_DIR=/tmp/duck_sf1_tmp$i \
  python3 scripts/check_oracle_scaled.py /tmp/graft_sf1 \
    /tmp/verify_sf1_r14 /tmp/oracle_sf1_shard$i.json 900 \
    "$(cat /tmp/sf1_shard$i.txt)" > /tmp/oracle_sf1_shard$i.log 2>&1 &
done
wait
python3 - <<'PYEOF'
import json
m = {}
for i in range(3):
    m.update(json.load(open(f"/tmp/oracle_sf1_shard{i}.json")))
json.dump(m, open("/tmp/oracle_sf1_r14.json", "w"), indent=1,
          sort_keys=True)
bad = {k: v["status"] for k, v in m.items()
       if v["status"] != "oracle_green"}
print(f"sweep: {len(m) - len(bad)}/{len(m)} green; non-green: {bad}")
PYEOF

echo "=== stage 3: specialized tiers ($(date -u +%H:%M:%S))"
python3 scripts/check_scaled_pairs.py /tmp/graft_sf1 \
  /tmp/verify_sf1_r14 /tmp/pairs_sf1_r14.json "$TRIO" \
  > /tmp/tier_sf1_pairs.log 2>&1
python3 scripts/check_onesided.py /tmp/graft_sf1 /tmp/verify_sf1_r14 \
  /tmp/onesided_sf1_r14.json join_jaccard_threshold \
  > /tmp/tier_sf1_onesided.log 2>&1
tail -2 /tmp/tier_sf1_pairs.log /tmp/tier_sf1_onesided.log

echo "=== stage 4: high-budget retry of non-green ($(date -u +%H:%M:%S))"
RETRY=$(python3 - <<'PYEOF'
import json
m = json.load(open("/tmp/oracle_sf1_r14.json"))
spec = set(json.load(open("/tmp/pairs_sf1_r14.json"))) | \
       set(json.load(open("/tmp/onesided_sf1_r14.json")))
bad = [k for k, v in m.items()
       if v["status"] != "oracle_green" and k not in spec]
print(",".join(sorted(bad)))
PYEOF
)
if [ -n "$RETRY" ]; then
  echo "retrying: $RETRY"
  DUCK_MEM=55GB DUCK_THREADS=24 DUCK_TEMP=40GiB \
  python3 scripts/check_oracle_scaled.py /tmp/graft_sf1 \
    /tmp/verify_sf1_r14 /tmp/oracle_sf1_r14_retry.json 1800 "$RETRY" \
    > /tmp/oracle_sf1_retry.log 2>&1
  tail -3 /tmp/oracle_sf1_retry.log
else
  echo '{}' > /tmp/oracle_sf1_r14_retry.json
fi

echo "=== stage 5: assemble ($(date -u +%H:%M:%S))"
python3 scripts/assemble_sf1_r14.py CORRECTNESS_sf1.json
