#!/bin/bash
# Round-3e: default-knob bench with the member_run driver (the BENCH_r03
# candidate), plus an AOT HLO dump of the shear acc16 epoch for layout-copy
# attribution (the 0.86 s copy bucket in the r3d profile).
set -u
cd /root/repo
LOG=/tmp/r3e
mkdir -p $LOG
export JAX_COMPILATION_CACHE_DIR=/root/repo/.cache/jax
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10

step() {
  name=$1; to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a $LOG/summary.txt
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  tail -4 "$LOG/$name.log" | grep -v WARNING | tee -a $LOG/summary.txt
  echo "rc=$rc" | tee -a $LOG/summary.txt
  return $rc
}

ok=0
for i in $(seq 1 12); do
  step health 150 python -c "import jax; print(float(jax.jit(lambda x: x+1)(jax.numpy.ones(4)).sum()))" && { ok=1; break; }
  sleep 120
done
[ $ok = 1 ] || { echo "NO HEALTH" | tee -a $LOG/summary.txt; exit 1; }

# 1. default bench (GIN, 12 epochs) — one member_run dispatch per member
step bench_member 5400 python bench.py

# 2. AOT HLO of the shear acc16 epoch (compile-cache hit, chipless) for
#    copy/fusion attribution against the r3d trace
step hlo_dump 3000 env PROBE_ACC=16 DGTTA_AFFINE_SHEAR=1 PROBE_HLO_OUT=/tmp/r3e/epoch_hlo.txt python tools/probe_acc2.py --analyze

echo "=== SEQUENCE DONE $(date) ===" | tee -a $LOG/summary.txt
