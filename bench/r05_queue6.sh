#!/bin/bash
# Round-5 queue, part 6: after queue5 (PID $1), re-warm bench.py on the
# post-divisor-change code and validate the new chunk size in-pipeline.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
A=artifacts
log() { echo "[$(date +%H:%M:%S)] $*" >> "$A/r05_queue.log"; }
WAIT_PID=${1:-0}
if [ "$WAIT_PID" -gt 0 ]; then
  log "queue6 waiting on pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
log "queue6 start: bench.py on new choose_sizes"
python bench.py > "$A/bench_warmup2_r05.json" 2> "$A/bench_warmup2_r05.log"
log "queue6 done rc=$?"
