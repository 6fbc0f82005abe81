#!/bin/bash
# Round-5 TPU bench queue, part 2 (reprioritized per VERDICT ranking).
# Waits for the in-flight scale bench (PID $1) to release the chip, then
# runs: hash A/B -> radix A/B -> wide join-scan A/B -> sort tune -> sweep.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
A=artifacts
log() { echo "[$(date +%H:%M:%S)] $*" >> "$A/r05_queue.log"; }

SCALE_PID=${1:-0}
if [ "$SCALE_PID" -gt 0 ]; then
  log "queue2 waiting on scale pid $SCALE_PID"
  while kill -0 "$SCALE_PID" 2>/dev/null; do sleep 20; done
fi
log "queue2 start"

log "q2 1/5 hash_vs_smj 10M"
python -m bench.hash_vs_smj --rows 10000000 --skip-verify > "$A/hash_vs_smj_r05.json" 2> "$A/hash_vs_smj_r05.log"
log "q2 1/5 done rc=$?"

log "q2 2/5 radix_bench 2^24"
python -m bench.radix_bench > "$A/radix_r05.json" 2> "$A/radix_r05.log"
log "q2 2/5 done rc=$?"

log "q2 3/5 joinscan_wide_ab 10M"
python -m bench.joinscan_wide_ab --rows 10000000 > "$A/joinscan_wide_ab_r05.json" 2> "$A/joinscan_wide_ab_r05.log"
log "q2 3/5 done rc=$?"

log "q2 4/5 sort_tune 20M"
python -m bench.sort_tune > "$A/sort_tune_r05.json" 2> "$A/sort_tune_r05.log"
log "q2 4/5 done rc=$?"

log "q2 5/5 size sweep"
python -m bench.sweep --sizes 10000,100000,200000,300000,500000,700000,1000000,3000000,10000000 > "$A/sweep_r05.json" 2> "$A/sweep_r05.log"
log "q2 5/5 done rc=$?"

log "queue2 complete"
