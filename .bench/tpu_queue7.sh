#!/bin/bash
# Round-4d TPU queue: two-phase (ND_DD_T) solver measurements.
# perop L=6 (new factor sub-phases + cheap-vs-dd) -> curve L=6 -> L=5 ->
# L=4 -> warm re-run L=6 (AOT+XLA cache A/B) -> L=7 (crash fallback in
# place) -> ND_LEAF=8 A/B at L=6 -> fem2d_P1 ladder L=8/9 (stderr kept).
cd /root/repo
export MGBTPU_NO_X64=1
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
log "=== perop L=6 (two-phase sub-phases)"
PEROP_L=6 timeout 7200 python .bench/tpu_perop.py 2>&1 | grep -v WARNING | tee .bench/perop_l6_r4d.log
wait_tunnel
log "=== curve L=6 (two-phase default)"
timeout 7200 python .bench/tpu_curve.py 6 2>&1 | grep -v WARNING
wait_tunnel
log "=== curve L=5"
timeout 5400 python .bench/tpu_curve.py 5 2>&1 | grep -v WARNING
wait_tunnel
log "=== curve L=4"
timeout 5400 python .bench/tpu_curve.py 4 2>&1 | grep -v WARNING
wait_tunnel
log "=== curve L=6 rerun (fresh process, warm AOT+XLA caches)"
timeout 5400 python .bench/tpu_curve.py 6 2>&1 | grep -v WARNING | tee .bench/l6_warm_rerun.log
wait_tunnel
log "=== curve L=7 (two-phase + worker-crash fallback)"
timeout 14400 python .bench/tpu_curve.py 7 2>&1 | grep -v WARNING | tee .bench/l7_twophase.log
wait_tunnel
log "=== ND_DD_T=8e5 A/B at L=6 (host-only knob: same blobs, warm fast)"
cp .bench/last_tpu_curve.json /tmp/curve_snapshot.json 2>/dev/null || true
MGBTPU_ND_DD_T=8e5 timeout 5400 python .bench/tpu_curve.py 6 2>&1 | grep -v WARNING | tee .bench/l6_nddt8e5.log || true
cp /tmp/curve_snapshot.json .bench/last_tpu_curve.json 2>/dev/null || true
wait_tunnel
log "=== ND_LEAF=8 A/B at L=6"
cp .bench/last_tpu_curve.json /tmp/curve_snapshot.json 2>/dev/null || true
MGBTPU_ND_LEAF=8 timeout 7200 python .bench/tpu_curve.py 6 2>&1 | grep -v WARNING | tee .bench/l6_leaf8.log || true
# the A/B must not overwrite the default-config record
cp /tmp/curve_snapshot.json .bench/last_tpu_curve.json 2>/dev/null || true
wait_tunnel
log "=== fem2d_P1 L=8 (oneshot, stderr kept)"
MGB_BENCH_FEM=fem2d_P1 MGB_BENCH_L=8 MGB_BENCH_ONESHOT=1 \
  timeout 21600 python bench.py 2> .bench/ladder_l8.err | grep '^{' | tee -a "$RUNS"
tail -5 .bench/ladder_l8.err
wait_tunnel
log "=== fem2d_P1 L=9 (oneshot, stderr kept)"
MGB_BENCH_FEM=fem2d_P1 MGB_BENCH_L=9 MGB_BENCH_ONESHOT=1 \
  timeout 21600 python bench.py 2> .bench/ladder_l9.err | grep '^{' | tee -a "$RUNS"
tail -5 .bench/ladder_l9.err
log "queue7 done"
