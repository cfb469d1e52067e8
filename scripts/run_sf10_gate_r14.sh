#!/bin/bash
# Round-14 full sf10 gate on round-14 code + corpus (verdict item 1:
# scaled artifacts age one round under corpus drift; nothing inherited).
#
# Stages:
#   1. engine dump, fixed-universe /tmp/graft_sf10 — all queries except
#      the ngram trio (join_jaccard_threshold's EXACT dense-regime run
#      ships ~105 GB of postings x gram arrays, beyond one box's disk —
#      disk-watchdog measured this round; the trio certifies on the
#      high-entropy corpus, the r12 NOTES discipline)
#   2. engine dump, /tmp/graft_sf10_he — the ngram trio subset
#   3. DuckDB full-oracle sweep (3 shards, bounded mem/temp/watchdog)
#   4. specialized tier checkers (soundness notes in each script)
#   5. high-budget serial retry of every non-green full-oracle attempt
#   6. assemble_sf10_r14.py merge
#
# A disk watchdog kills an engine dump if root free space drops under
# 12 GB (the box, not the engine, is the constraint at this scale).
# Dev tooling only; NOT part of the engine.
set -uo pipefail
cd "$(dirname "$0")/.."

TRIO="dedup_ngram_jaccard,dedup_ngram_decisions,join_jaccard_threshold"
ALLQ=$(python3 - <<'EOF'
import json
d = json.load(open("CORRECTNESS_r13.json"))
trio = {"dedup_ngram_jaccard", "dedup_ngram_decisions",
        "join_jaccard_threshold"}
print(",".join(sorted(k for k in d if k not in trio)))
EOF
)

disk_watchdog() {  # $1 = pid to kill when / fills up
  while kill -0 "$1" 2>/dev/null; do
    free_kb=$(df --output=avail / | tail -1)
    if [ "$free_kb" -lt $((12 * 1024 * 1024)) ]; then
      echo "DISK WATCHDOG: ${free_kb}KB free, killing $1" >&2
      kill "$1"; return 1
    fi
    sleep 20
  done
}

echo "=== stage 1: fixed-corpus dump ($(date -u +%H:%M:%S))"
SPARK_DRIVER_MEM=56g SPARK_GRAFT_CPUS=32 \
  scripts/run_main.sh graft.Verify /tmp/graft_sf10 /tmp/verify_sf10_r14 \
  "$ALLQ" > /tmp/verify_sf10_r14.log 2>&1 &
DUMP=$!; disk_watchdog $DUMP; wait $DUMP || echo "stage 1 FAILED"

echo "=== stage 2: he-corpus trio dump ($(date -u +%H:%M:%S))"
SPARK_DRIVER_MEM=56g SPARK_GRAFT_CPUS=32 \
  scripts/run_main.sh graft.Verify /tmp/graft_sf10_he \
  /tmp/verify_sf10he_r14 "$TRIO" > /tmp/verify_sf10he_r14.log 2>&1 &
DUMP=$!; disk_watchdog $DUMP; wait $DUMP || echo "stage 2 FAILED"

echo "=== stage 3: full-oracle sweep, 3 shards ($(date -u +%H:%M:%S))"
python3 - <<'EOF'
import json
names = sorted(json.load(open("/tmp/verify_sf10_r14/oracle_sql.json")))
trio = {"dedup_ngram_jaccard", "dedup_ngram_decisions",
        "join_jaccard_threshold"}
names = [n for n in names if n not in trio]
for i in range(3):
    open(f"/tmp/sf10_shard{i}.txt", "w").write(",".join(names[i::3]))
EOF
for i in 0 1 2; do
  DUCK_MEM=24GB DUCK_THREADS=10 DUCK_TEMP=20GiB \
  DUCK_TEMP_DIR=/tmp/duck_sf10_tmp$i \
  python3 scripts/check_oracle_scaled.py /tmp/graft_sf10 \
    /tmp/verify_sf10_r14 /tmp/oracle_sf10_shard$i.json 300 \
    "$(cat /tmp/sf10_shard$i.txt)" > /tmp/oracle_sf10_shard$i.log 2>&1 &
done
wait
python3 - <<'EOF'
import json
m = {}
for i in range(3):
    m.update(json.load(open(f"/tmp/oracle_sf10_shard{i}.json")))
json.dump(m, open("/tmp/oracle_sf10_r14.json", "w"), indent=1,
          sort_keys=True)
bad = {k: v["status"] for k, v in m.items()
       if v["status"] != "oracle_green"}
print(f"sweep: {len(m) - len(bad)}/{len(m)} green; non-green: {bad}")
EOF

echo "=== stage 4: specialized tiers ($(date -u +%H:%M:%S))"
python3 scripts/check_restricted_replay.py /tmp/graft_sf10 \
  /tmp/verify_sf10_r14 /tmp/replay_sf10_r14.json \
  dedup_minhash_lsh,dedup_minhash_increment,dedup_minhash_index_merge,dedup_minhash_epoch_append,stream_minhash_pairs \
  > /tmp/tier_replay.log 2>&1
python3 scripts/check_onesided.py /tmp/graft_sf10 /tmp/verify_sf10_r14 \
  /tmp/onesided_sf10_r14.json \
  dedup_simhash,dedup_phash,dedup_embedding,stream_embedding_dedup,join_cosine_threshold,join_hamming_threshold \
  > /tmp/tier_onesided.log 2>&1
# jjt's sf10-he caps/argmax replay needs more than the 30 GiB default
# DuckDB temp budget (measured in-round: the default cap is the only
# thing stopping the stronger tier here)
DUCK_MEM=55GB DUCK_THREADS=24 DUCK_TEMP=52GiB \
DUCK_TEMP_DIR=/tmp/duck_1s_big \
python3 scripts/check_onesided.py /tmp/graft_sf10_he \
  /tmp/verify_sf10he_r14 /tmp/onesided_jjt_sf10he_r14.json \
  join_jaccard_threshold > /tmp/tier_onesided_jjt.log 2>&1
python3 scripts/check_rowlocal.py /tmp/graft_sf10 /tmp/verify_sf10_r14 \
  /tmp/rowlocal_sf10_r14.json text_fingerprints > /tmp/tier_rowlocal.log 2>&1
python3 scripts/check_derived_decisions.py /tmp/graft_sf10 \
  /tmp/verify_sf10_r14 /tmp/derived_sf10_r14.json > /tmp/tier_derived.log 2>&1
python3 scripts/check_graph_iter.py /tmp/graft_sf10 /tmp/verify_sf10_r14 \
  /tmp/giter_sf10_r14.json > /tmp/tier_giter.log 2>&1
python3 scripts/check_skyline_sweep.py /tmp/graft_sf10 \
  /tmp/verify_sf10_r14 /tmp/skyline_sf10_r14.json > /tmp/tier_skyline.log 2>&1
python3 scripts/check_sorted_nbr.py /tmp/graft_sf10 /tmp/verify_sf10_r14 \
  /tmp/sorted_nbr_sf10_r14.json > /tmp/tier_sorted_nbr.log 2>&1
python3 scripts/check_scaled_pairs.py /tmp/graft_sf10_he \
  /tmp/verify_sf10he_r14 /tmp/pairs_sf10he_r14.json \
  "$TRIO" > /tmp/tier_pairs.log 2>&1
tail -2 /tmp/tier_*.log

echo "=== stage 5: high-budget retry of non-green ($(date -u +%H:%M:%S))"
RETRY=$(python3 - <<'EOF'
import json
m = json.load(open("/tmp/oracle_sf10_r14.json"))
spec = set()
for p in ["/tmp/replay_sf10_r14.json", "/tmp/onesided_sf10_r14.json",
          "/tmp/onesided_jjt_sf10he_r14.json",
          "/tmp/rowlocal_sf10_r14.json", "/tmp/derived_sf10_r14.json",
          "/tmp/giter_sf10_r14.json", "/tmp/skyline_sf10_r14.json",
          "/tmp/sorted_nbr_sf10_r14.json", "/tmp/pairs_sf10he_r14.json"]:
    try:
        spec |= set(json.load(open(p)))
    except FileNotFoundError:
        pass
bad = [k for k, v in m.items()
       if v["status"] != "oracle_green" and k not in spec]
print(",".join(sorted(bad)))
EOF
)
if [ -n "$RETRY" ]; then
  DUCK_MEM=60GB DUCK_THREADS=24 DUCK_TEMP=38GiB \
  python3 scripts/check_oracle_scaled.py /tmp/graft_sf10 \
    /tmp/verify_sf10_r14 /tmp/oracle_sf10_r14_retry.json 1200 "$RETRY" \
    > /tmp/oracle_sf10_retry.log 2>&1
  tail -3 /tmp/oracle_sf10_retry.log
else
  echo '{}' > /tmp/oracle_sf10_r14_retry.json
fi

echo "=== stage 6: assemble ($(date -u +%H:%M:%S))"
python3 scripts/assemble_sf10_r14.py CORRECTNESS_sf10.json
