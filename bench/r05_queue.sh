#!/bin/bash
# Round-5 serialized TPU bench queue (one chip -> one process at a time).
# Each bench writes JSONL to artifacts/. Run under nohup; poll the .log files.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
A=artifacts
mkdir -p "$A"
log() { echo "[$(date +%H:%M:%S)] $*" >> "$A/r05_queue.log"; }

log "queue start"

log "1/5 joinscan_wide_repro"
python -m bench.joinscan_wide_repro > "$A/joinscan_wide_r05.json" 2> "$A/joinscan_wide_r05.log"
log "1/5 done rc=$?"

log "2/5 scale 100M int32"
python -m bench.scale_bench --rows 100000000 --dtype int32 > "$A/scale_r05.json" 2> "$A/scale_r05.log"
log "2/5 done rc=$?"

log "3/5 hash_vs_smj 10M"
python -m bench.hash_vs_smj --rows 10000000 --skip-verify > "$A/hash_vs_smj_r05.json" 2> "$A/hash_vs_smj_r05.log"
log "3/5 done rc=$?"

log "4/5 sort_tune 20M"
python -m bench.sort_tune > "$A/sort_tune_r05.json" 2> "$A/sort_tune_r05.log"
log "4/5 done rc=$?"

log "5/5 size sweep"
python -m bench.sweep --sizes 10000,100000,200000,300000,500000,700000,1000000,3000000,10000000 > "$A/sweep_r05.json" 2> "$A/sweep_r05.log"
log "5/5 done rc=$?"

log "queue complete"
