#!/bin/bash
# Round-3d follow-up after the shear bench (237 s/vol): diagnose the ~117 s
# of driver-path overhead (vmapped-by-1 epoch program vs the raw one), then
# profile the post-shear epoch, re-measure HBM at chunk>1 (AOT), sweep
# patch_group, and bench the GIN_MIND config.  Health-gated; serial.
set -u
cd /root/repo
LOG=/tmp/r3d
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

# 1. THE DRIVER-PATH PROGRAM: jit(vmap(epoch_train)) at chunk=1 — is the
#    vmap wrapper what costs bench12 237 s vs the raw program's 36x3.34?
step acc16_vmap1 3000 env PROBE_ACC=16 PROBE_VMAP=1 DGTTA_AFFINE_SHEAR=1 python tools/probe_acc2.py --time

# 2. profile the post-shear raw acc16 epoch (trace -> /tmp/probe_trace)
step prof_acc16 3000 env PROBE_ACC=16 DGTTA_AFFINE_SHEAR=1 python tools/probe_acc2.py --profile

# 3. chunk HBM re-measure with the shear program (AOT)
step chunk_mem 3000 env DGTTA_AFFINE_SHEAR=1 python tools/probe_chunk_mem.py 1 2 3

# 4. patch_group sweep at acc16
step acc16_group2 3000 env PROBE_ACC=16 PROBE_GROUP=2 DGTTA_AFFINE_SHEAR=1 python tools/probe_acc2.py --time
step acc16_group4 3000 env PROBE_ACC=16 PROBE_GROUP=4 DGTTA_AFFINE_SHEAR=1 python tools/probe_acc2.py --time

# 5. GIN_MIND flagship bench (12 epochs) — the paper's headline config
step bench_ginmind 7200 env BENCH_TRAINER=nnUNetTrainer_GIN_MIND python bench.py

echo "=== SEQUENCE DONE $(date) ===" | tee -a $LOG/summary.txt
