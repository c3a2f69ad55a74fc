#!/bin/bash
# After the two A/B runs finish, run the IR_DEBUG L=6 diag (serialized on
# the single core) and capture per-iteration cg + nd_pre n_null.
cd /root/repo
while ls /proc/*/cmdline 2>/dev/null >/dev/null; do
  busy=0
  for p in $(ls /proc | grep -E '^[0-9]+$'); do
    c=$(tr '\0' ' ' < /proc/$p/cmdline 2>/dev/null)
    case "$c" in *cpu_l6_diag*) busy=1;; esac
  done
  [ $busy -eq 0 ] && break
  sleep 60
done
JAX_PLATFORMS=cpu MGBTPU_NO_X64=1 MGBTPU_IR_DEBUG=1 \
  timeout 7200 python .bench/cpu_l6_diag.py 6 > .bench/cpu_l6_irdebug.log 2>&1
echo "irdebug done rc=$?"
