#!/bin/bash
# Round-4f TPU queue (fresh VM; caches now repo-local so later processes
# and the driver's bench stay warm). Order: the P2 L=7 crash test FIRST —
# it has never run with the program-size-shrink commits (624b309/ef03f55)
# and is the one missing headline-curve point; then the fused Mosaic panel
# A/B at L=6 (perop then end-to-end); then fem2d_P1 L=8 (A40 60.0 s).
cd /root/repo
export MGBTPU_NO_X64=1
export MGBTPU_ND_DD_T=0
RUNS=.bench/tpu_runs.jsonl
log() { echo "[$(date +%H:%M:%S)] $*"; }
wait_tunnel() {
  while true; do
    # first contact through a cold tunnel measured 72 s — probe at 150 s
    if timeout 150 python -c "import jax, jax.numpy as jnp; (jnp.ones((8,))*2).sum().block_until_ready()" >/dev/null 2>&1; then
      log "tunnel UP"; return
    fi
    log "tunnel down; sleeping 9 min"
    sleep 540
  done
}
wait_tunnel
log "=== curve L=7 (post program-size shrink: the crash test that never ran)"
timeout 7200 python .bench/tpu_curve.py 7 2>&1 | grep -v WARNING | tee .bench/l7_r4f.log
wait_tunnel
log "=== perop L=6: MGBTPU_DD_PANEL=pallas (fused Mosaic panel chol+inv)"
PEROP_L=6 MGBTPU_DD_PANEL=pallas timeout 5400 python .bench/tpu_perop.py 2>&1 | grep -v WARNING | tee .bench/perop_l6_pallaspanel.log
wait_tunnel
log "=== curve L=6: MGBTPU_DD_PANEL=pallas end-to-end"
MGBTPU_DD_PANEL=pallas timeout 5400 python .bench/tpu_curve.py 6 2>&1 | grep -v WARNING | tee .bench/l6_pallaspanel.log
wait_tunnel
log "=== fem2d_P1 L=8 bench (A40 60.0 s)"
MGB_BENCH_FEM=fem2d_P1 MGB_BENCH_L=8 \
  timeout 10800 python bench.py 2> .bench/ladder_l8.err | grep '^{' | tee -a "$RUNS"
tail -3 .bench/ladder_l8.err
wait_tunnel
log "=== curve L=5 re-measure (warm repo-local caches)"
timeout 3600 python .bench/tpu_curve.py 5 2>&1 | grep -v WARNING | tee .bench/l5_r4f.log
log "queue11 done"
