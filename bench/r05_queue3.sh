#!/bin/bash
# Round-5 TPU bench queue, part 3: waits for the diagnostics chain (PID $1),
# then roofline -> hash A/B rerun -> sort tune -> sweep -> wide joinscan A/B.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
A=artifacts
log() { echo "[$(date +%H:%M:%S)] $*" >> "$A/r05_queue.log"; }

WAIT_PID=${1:-0}
if [ "$WAIT_PID" -gt 0 ]; then
  log "queue3 waiting on pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
log "queue3 start"

log "q3 1/5 roofline 10M narrow"
python -m bench.roofline_bench --rows 10000000 --narrow --reps 3 --out "$A/roofline_r05.json" > "$A/roofline_r05.stdout" 2> "$A/roofline_r05.log"
log "q3 1/5 done rc=$?"

log "q3 2/5 hash_vs_smj 10M (rerun)"
python -m bench.hash_vs_smj --rows 10000000 --skip-verify > "$A/hash_vs_smj_r05.json" 2> "$A/hash_vs_smj_r05.log"
log "q3 2/5 done rc=$?"

log "q3 3/5 sort_tune 20M"
python -m bench.sort_tune > "$A/sort_tune_r05.json" 2> "$A/sort_tune_r05.log"
log "q3 3/5 done rc=$?"

log "q3 4/5 size sweep"
python -m bench.sweep --sizes 10000,100000,200000,300000,500000,700000,1000000,3000000,10000000 > "$A/sweep_r05.json" 2> "$A/sweep_r05.log"
log "q3 4/5 done rc=$?"

log "q3 5/5 joinscan_wide_ab 10M"
python -m bench.joinscan_wide_ab --rows 10000000 > "$A/joinscan_wide_ab_r05.json" 2> "$A/joinscan_wide_ab_r05.log"
log "q3 5/5 done rc=$?"

log "queue3 complete"
