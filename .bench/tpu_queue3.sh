#!/bin/bash
# Round-4b TPU queue: re-measure the curve with the GEMM-form dd leaf
# assembly (factor 389 ms -> 12 ms at L=5 per .bench/factor_ab.log).
# Order: L=5 (headline), L=6 (the former worker-crash case), L=4, L=7,
# then the fem2d_P1 scale ladder. Results persist immediately via
# tpu_curve.py/last_tpu_curve.json and tpu_runs.jsonl so a later tunnel
# drop cannot hide an earlier on-hardware measurement.
cd /root/repo
export MGBTPU_NO_X64=1
log() { echo "[$(date +%H:%M:%S)] $*"; }
while true; do
  if timeout 40 python -c "import jax, jax.numpy as jnp; (jnp.ones((8,))*2).sum().block_until_ready()" >/dev/null 2>&1; then
    log "tunnel UP"; break
  fi
  log "tunnel down; sleeping 9 min"
  sleep 540
done
log "=== curve L=5 (GEMM asm)"
timeout 5400 python .bench/tpu_curve.py 5 2>&1 | grep -v WARNING
log "=== curve L=6"
timeout 7200 python .bench/tpu_curve.py 6 2>&1 | grep -v WARNING
log "=== curve L=4"
timeout 3600 python .bench/tpu_curve.py 4 2>&1 | grep -v WARNING
log "=== curve L=7"
timeout 10800 python .bench/tpu_curve.py 7 2>&1 | grep -v WARNING
RUNS=.bench/tpu_runs.jsonl
for L in 8 9; do
  log "=== fem2d_P1 L=$L (TPU f32/dd, oneshot)"
  MGB_BENCH_FEM=fem2d_P1 MGB_BENCH_L=$L MGB_BENCH_ONESHOT=1 MGBTPU_NO_X64=1 \
    timeout 14000 python bench.py 2>/dev/null | grep '^{' | tee -a "$RUNS"
done
log "queue3 done"
