#!/bin/bash
# Round-5 TPU queue, part 5 (final): hash A/B rerun with the wide dispatch
# re-pinned off -> wide repro at the failing scale -> sort tune -> sweep ->
# bench.py cache warmup for the driver.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
A=artifacts
log() { echo "[$(date +%H:%M:%S)] $*" >> "$A/r05_queue.log"; }

log "queue5 start"

log "q5 1/5 hash_vs_smj 10M (wide pinned off)"
python -m bench.hash_vs_smj --rows 10000000 --skip-verify > "$A/hash_vs_smj_r05.json" 2> "$A/hash_vs_smj_r05.log"
log "q5 1/5 done rc=$?"

log "q5 2/5 joinscan_wide_repro 2^25"
python -m bench.joinscan_wide_repro 33554432 > "$A/joinscan_wide_32m_r05.json" 2> "$A/joinscan_wide_32m_r05.log"
log "q5 2/5 done rc=$?"

log "q5 3/5 sort_tune 20M"
python -m bench.sort_tune > "$A/sort_tune_r05.json" 2> "$A/sort_tune_r05.log"
log "q5 3/5 done rc=$?"

log "q5 4/5 size sweep"
python -m bench.sweep --sizes 10000,100000,200000,300000,500000,700000,1000000,3000000,10000000 > "$A/sweep_r05.json" 2> "$A/sweep_r05.log"
log "q5 4/5 done rc=$?"

log "q5 5/5 bench.py warmup"
python bench.py > "$A/bench_warmup_r05.json" 2> "$A/bench_warmup_r05.log"
log "q5 5/5 done rc=$?"

log "queue5 complete"
