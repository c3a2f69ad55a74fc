#!/bin/bash
# Round-4d TPU queue, revision: the two-phase default (ND_DD_T=1e5)
# REGRESSED at L=6 (13.6 s / 116 its / 1317 cg vs 10.4 s / 102 / 129 pure
# dd — .bench/l6_twophase_ab.json), so everything here runs pure dd.
# Order: fem2d_P1 L=8 first (the A40's weak family: 60.0 s baseline,
# winnable), then P1 L=9, then perop L=6, then the P2 L=7 crash test LAST
# (a worker crash must not block the other measurements).
cd /root/repo
export MGBTPU_NO_X64=1
export MGBTPU_ND_DD_T=0
RUNS=.bench/tpu_runs.jsonl
log() { echo "[$(date +%H:%M:%S)] $*"; }
wait_tunnel() {
  while true; do
    if timeout 40 python -c "import jax, jax.numpy as jnp; (jnp.ones((8,))*2).sum().block_until_ready()" >/dev/null 2>&1; then
      log "tunnel UP"; return
    fi
    log "tunnel down; sleeping 9 min"
    sleep 540
  done
}
wait_tunnel
log "=== fem2d_P1 L=8 (warm + steady solve, stderr kept)"
MGB_BENCH_FEM=fem2d_P1 MGB_BENCH_L=8 \
  timeout 21600 python bench.py 2> .bench/ladder_l8.err | grep '^{' | tee -a "$RUNS"
tail -5 .bench/ladder_l8.err
wait_tunnel
log "=== fem2d_P1 L=9 (oneshot: one solve is long, stderr kept)"
MGB_BENCH_FEM=fem2d_P1 MGB_BENCH_L=9 MGB_BENCH_ONESHOT=1 \
  timeout 21600 python bench.py 2> .bench/ladder_l9.err | grep '^{' | tee -a "$RUNS"
tail -5 .bench/ladder_l9.err
wait_tunnel
log "=== perop L=6 (pure dd sub-phases; jnp.eye fix)"
PEROP_L=6 timeout 7200 python .bench/tpu_perop.py 2>&1 | grep -v WARNING | tee .bench/perop_l6_r4d.log
wait_tunnel
log "=== curve L=7 (pure dd + worker-crash record; LAST on purpose)"
timeout 14400 python .bench/tpu_curve.py 7 2>&1 | grep -v WARNING | tee .bench/l7_puredd.log
log "queue8 done"
