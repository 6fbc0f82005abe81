#!/bin/bash
# Round-5 TPU queue, part 4: after queue3 (PID $1) drains, pre-run the
# driver headline bench to warm /tmp/jaxcache for the end-of-round capture
# (the 10M program changed this round; without this the driver pays the
# full remote compile).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
A=artifacts
log() { echo "[$(date +%H:%M:%S)] $*" >> "$A/r05_queue.log"; }

WAIT_PID=${1:-0}
if [ "$WAIT_PID" -gt 0 ]; then
  log "queue4 waiting on pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
log "queue4 start: bench.py warmup"
python bench.py > "$A/bench_warmup_r05.json" 2> "$A/bench_warmup_r05.log"
log "queue4 done rc=$?"
