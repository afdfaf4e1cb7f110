#!/bin/bash
# Round-3c shear-warp validation sequence: quantifies the MXU shear affine
# resampler (ops/warp_shear.py, DGTTA_AFFINE_SHEAR) against the XLA-gather
# baseline on the real chip, then records a full default-knob bench.
# Health-gated; every step has its own timeout + log so a wedged remote
# compile can't hang the session.
set -u
cd /root/repo
LOG=/tmp/r3c
mkdir -p $LOG
export JAX_COMPILATION_CACHE_DIR=/root/repo/.cache/jax
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10

step() {
  name=$1; to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a $LOG/summary.txt
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  tail -3 "$LOG/$name.log" | grep -v WARNING | tee -a $LOG/summary.txt
  echo "rc=$rc" | tee -a $LOG/summary.txt
  return $rc
}

# 0. health gate (retry up to ~30 min)
ok=0
for i in $(seq 1 12); do
  step health 150 python -c "import jax; print(float(jax.jit(lambda x: x+1)(jax.numpy.ones(4)).sum()))" && { ok=1; break; }
  sleep 120
done
[ $ok = 1 ] || { echo "NO HEALTH" | tee -a $LOG/summary.txt; exit 1; }

# 1. acc2 epoch, shear affine warps (auto default on TPU; pinned explicit)
step acc2_shear 3000 env PROBE_ACC=2 DGTTA_AFFINE_SHEAR=1 python tools/probe_acc2.py --time

# 2. acc16 epoch, shear affine warps
step acc16_shear 3000 env PROBE_ACC=16 DGTTA_AFFINE_SHEAR=1 python tools/probe_acc2.py --time

# 3. acc16 epoch, XLA-gather baseline (apples-to-apples)
step acc16_xla 3600 env PROBE_ACC=16 DGTTA_AFFINE_SHEAR=0 python tools/probe_acc2.py --time

# 4. full default-knob bench (12 epochs) — the BENCH_r03 candidate
step bench12 5400 python bench.py

echo "=== SEQUENCE DONE $(date) ===" | tee -a $LOG/summary.txt
