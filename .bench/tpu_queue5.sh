#!/bin/bash
# Round-4c TPU queue, part 2 (fires after the manual per-op profile):
# L=7 Pallas-off retry if the P-form L=7 run crashed, AOT warm A/B at L=5,
# L=4 dense-vs-ND A/B, then the fem2d_P1 ladder to the 1M-DOF target.
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
if python -c "import json,sys; c=json.load(open('.bench/last_tpu_curve.json'))['curve']; sys.exit(0 if 'error' in c.get('7',{}) else 1)"; then
  wait_tunnel
  log "=== curve L=7 retry, Pallas disabled (kernel-fault hypothesis)"
  MGBTPU_PALLAS=0 timeout 10800 python .bench/tpu_curve.py 7 2>&1 | grep -v WARNING
fi
wait_tunnel
log "=== curve L=5 run A"
timeout 5400 python .bench/tpu_curve.py 5 2>&1 | grep -v WARNING
log "=== curve L=5 run B (fresh process: AOT warm-start A/B)"
timeout 5400 python .bench/tpu_curve.py 5 2>&1 | grep -v WARNING
wait_tunnel
log "=== curve L=4"
timeout 3600 python .bench/tpu_curve.py 4 2>&1 | grep -v WARNING
log "=== ND-at-L4 A/B (MGBTPU_DENSE_MAX=512)"
MGBTPU_DENSE_MAX=512 timeout 3600 python .bench/tpu_curve.py 4 2>&1 | grep -v WARNING
for L in 8 9 10 11; do
  wait_tunnel
  log "=== fem2d_P1 L=$L (oneshot)"
  MGB_BENCH_FEM=fem2d_P1 MGB_BENCH_L=$L MGB_BENCH_ONESHOT=1 \
    timeout 21600 python bench.py 2>/dev/null | grep '^{' | tee -a "$RUNS"
done
log "queue5 done"
