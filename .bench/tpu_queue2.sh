#!/bin/bash
# Phase-2 TPU measurements (fire AFTER tpu_queue.sh finishes): the
# fem2d_P1 scale ladder toward the 1M-DOF BASELINE target, f32/dd on the
# real chip. Each level is its own process so a failure doesn't kill the
# ladder; ONESHOT because a scale solve is minutes+. Every JSON result
# line is appended to .bench/tpu_runs.jsonl IMMEDIATELY (bench.py attaches
# that file to the round-end artifact, so a later tunnel outage cannot
# hide an earlier on-hardware measurement).
cd /root/repo
RUNS=.bench/tpu_runs.jsonl
log() { echo "[$(date +%H:%M:%S)] $*"; }
for L in 8 9 10 11; do
  log "=== fem2d_P1 L=$L (TPU f32/dd)"
  MGB_BENCH_FEM=fem2d_P1 MGB_BENCH_L=$L MGB_BENCH_ONESHOT=1 MGBTPU_NO_X64=1 \
    timeout 14000 python bench.py 2>/dev/null | grep '^{' | tee -a "$RUNS"
done
log "=== parabolic fem2d_P1 L=7 x 4 steps (TPU f32/dd)"
timeout 7200 python .bench/tpu_parabolic.py 7 4 2>&1 | grep -v WARNING | tail -2
log "=== fem3d k=3 L=2 (TPU, A40 baseline 0.790 s)"
MGB_BENCH_FEM=fem3d MGB_BENCH_L=2 MGBTPU_NO_X64=1 \
  timeout 3600 python bench.py 2>/dev/null | grep '^{' | tee -a "$RUNS"
log "queue2 done"
