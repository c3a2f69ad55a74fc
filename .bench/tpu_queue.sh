#!/bin/bash
# Queued TPU measurements: probe until the tunnel is up, then run the
# round-4 measurement list. The ONLY process that touches the TPU.
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
log "=== dd smoke (asserts TPU EFT exactness)"
timeout 1800 python .bench/tpu_smoke.py 2>&1 | grep -v WARNING
log "=== curve L=4 L=5"
timeout 5400 python .bench/tpu_curve.py 4 5 2>&1 | grep -v WARNING
log "=== curve L=6"
timeout 7200 python .bench/tpu_curve.py 6 2>&1 | grep -v WARNING
log "=== curve L=7"
timeout 10800 python .bench/tpu_curve.py 7 2>&1 | grep -v WARNING
log "queue done"
