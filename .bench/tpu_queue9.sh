#!/bin/bash
# Round-4e TPU queue (fresh VM: all compile/AOT caches are cold).
# Order: P2 curve L=4,5,6 first — it re-measures the headline workload
# with the program-size-shrink commits (624b309: rolled dd_cholesky_pform
# panel step + hoisted apply_pre) whose warm_s effect is unmeasured; then
# fem2d_P1 L=8 (A40 60.0 s, winnable); then the P2 L=7 worker-crash test;
# then the P1 L=9 oneshot LAST (longest, interruptible).
cd /root/repo
export MGBTPU_NO_X64=1
export MGBTPU_ND_DD_T=0
RUNS=.bench/tpu_runs.jsonl
log() { echo "[$(date +%H:%M:%S)] $*"; }
wait_tunnel() {
  while true; do
    if timeout 60 python -c "import jax, jax.numpy as jnp; (jnp.ones((8,))*2).sum().block_until_ready()" >/dev/null 2>&1; then
      log "tunnel UP"; return
    fi
    log "tunnel down; sleeping 9 min"
    sleep 540
  done
}
wait_tunnel
log "=== P2 curve L=4,5,6 (post program-size shrink; cold caches)"
timeout 14400 python .bench/tpu_curve.py 4 5 6 2>&1 | grep -v WARNING | tee .bench/curve_r4e.log
wait_tunnel
log "=== fem2d_P1 L=8 (warm + steady solve, stderr kept)"
MGB_BENCH_FEM=fem2d_P1 MGB_BENCH_L=8 \
  timeout 21600 python bench.py 2> .bench/ladder_l8.err | grep '^{' | tee -a "$RUNS"
tail -5 .bench/ladder_l8.err
wait_tunnel
log "=== curve L=7 (pure dd + worker-crash record)"
timeout 14400 python .bench/tpu_curve.py 7 2>&1 | grep -v WARNING | tee .bench/l7_puredd.log
wait_tunnel
log "=== fem2d_P1 L=9 (oneshot: one solve is long, stderr kept)"
MGB_BENCH_FEM=fem2d_P1 MGB_BENCH_L=9 MGB_BENCH_ONESHOT=1 \
  timeout 21600 python bench.py 2> .bench/ladder_l9.err | grep '^{' | tee -a "$RUNS"
tail -5 .bench/ladder_l9.err
log "queue9 done"
