#!/bin/bash
# Round-4c TPU queue (fires after queue3): re-measure everything with the
# partitioned-inverse (P-form) dd triangular solves — the full-inverse
# apply was the L=6 cg blow-up (127 -> 1907) — then the scale ladder.
# Order: L=6 first (the decisive on-hardware check), L=7 (former
# worker-crash case; retried with Pallas disabled on failure), L=5/L=4
# refresh, AOT warm-start A/B, fem2d_P1 ladder to the 1M-DOF target.
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
log "=== curve L=6 (P-form tri solves)"
timeout 7200 python .bench/tpu_curve.py 6 2>&1 | grep -v WARNING
wait_tunnel
log "=== curve L=7"
if ! timeout 10800 python .bench/tpu_curve.py 7 2>&1 | grep -v WARNING | tee /tmp/l7.out; then :; fi
if grep -q "ERROR" /tmp/l7.out; then
  wait_tunnel
  log "=== curve L=7 retry, Pallas disabled (kernel-fault hypothesis)"
  MGBTPU_PALLAS=0 timeout 10800 python .bench/tpu_curve.py 7 2>&1 | grep -v WARNING
fi
wait_tunnel
log "=== curve L=5"
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
log "queue4 done"
