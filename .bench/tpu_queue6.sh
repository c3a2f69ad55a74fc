#!/bin/bash
# Round-4c TPU queue 6 (manual control after the L=7 Pallas-off retry):
# per-op profile at L=6 -> ND_REFRESH=auto A/B at L=6 -> AOT warm A/B at
# L=5 (two fresh processes) -> fem2d_P1 L=8 oneshot ladder step.
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
# wait for any in-flight tpu_curve run to release the chip
while pgrep -f "tpu_curve.py" >/dev/null 2>&1; do sleep 60; done
wait_tunnel
log "=== per-op profile L=6 (nd path)"
PEROP_L=6 timeout 5400 python .bench/tpu_perop.py 2>&1 | grep -v WARNING | tee .bench/perop_l6.log
wait_tunnel
log "=== curve L=6 A: ND_REFRESH=auto"
MGBTPU_ND_REFRESH=auto timeout 5400 python .bench/tpu_curve.py 6 2>&1 | grep -v WARNING | tee .bench/l6_ndauto.log
wait_tunnel
log "=== curve L=6 B: default (always) — post-keyfix re-measure"
timeout 5400 python .bench/tpu_curve.py 6 2>&1 | grep -v WARNING
wait_tunnel
log "=== curve L=5 run A (exports blobs on the current code hash)"
timeout 5400 python .bench/tpu_curve.py 5 2>&1 | grep -v WARNING
log "=== curve L=5 run B (fresh process: AOT warm-start A/B)"
timeout 5400 python .bench/tpu_curve.py 5 2>&1 | grep -v WARNING
wait_tunnel
log "=== fem2d_P1 L=8 (oneshot ladder step)"
MGB_BENCH_FEM=fem2d_P1 MGB_BENCH_L=8 MGB_BENCH_ONESHOT=1 \
  timeout 14400 python bench.py 2>/dev/null | grep '^{' | tee -a "$RUNS"
log "queue6 done"
