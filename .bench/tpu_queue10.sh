#!/bin/bash
# Round-4e perf A/Bs (chained after queue9's L=7 item): per-tree-level
# factor breakdown first, then the three knob A/Bs at L=6 (the knobs are
# default-neutral env gates added this round). Each L=6 run is a fresh
# process so the AOT/compile caches key per knob set.
cd /root/repo
export MGBTPU_NO_X64=1
export MGBTPU_ND_DD_T=0
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
log "=== perop L=6: sub-phases + per-tree-level factor breakdown"
PEROP_L=6 PEROP_LEVELS=1 timeout 10800 python .bench/tpu_perop.py 2>&1 | grep -v WARNING | tee .bench/perop_l6_levels.log
wait_tunnel
log "=== perop L=6: MGBTPU_DD_PANEL=pallas (fused Mosaic panel chol+inv)"
PEROP_L=6 MGBTPU_DD_PANEL=pallas timeout 7200 python .bench/tpu_perop.py 2>&1 | grep -v WARNING | tee .bench/perop_l6_pallaspanel.log
wait_tunnel
log "=== perop L=6: OZAKI_BITS=42 + DD_BLOCK=64 factor/solve timing"
PEROP_L=6 MGBTPU_OZAKI_BITS=42 MGBTPU_DD_BLOCK=64 timeout 7200 python .bench/tpu_perop.py 2>&1 | grep -v WARNING | tee .bench/perop_l6_bits42b64.log
wait_tunnel
log "=== curve L=4 with ND forced down (DENSE_MAX=512): the dense path burns 6123 CG its"
MGBTPU_DENSE_MAX=512 timeout 7200 python .bench/tpu_curve.py 4 2>&1 | grep -v WARNING | tee .bench/l4_nd.log
log "queue10 done (read the logs, then pick end-to-end A/Bs)"
