#!/bin/bash
# Round-3 one-hot warp validation sequence: times the gather-free one-hot
# epoch program (ops/warp_onehot.py) against the XLA-gather baseline on the
# real chip, then runs a short bench.  Health-gated; every step has its own
# timeout + log so a wedged remote compile can't hang the session.
set -u
cd /root/repo
LOG=/tmp/r3b
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

# 1. standalone full-size one-hot warp timing (C=10 bf16, C=1 f32)
step warp_onehot_standalone 2400 python tools/probe_warp_onehot.py

# 2. acc2 epoch, one-hot warps
step acc2_onehot 3000 env PROBE_ACC=2 DGTTA_WARP_IMPL=onehot python tools/probe_acc2.py --time

# 3. acc2 epoch, XLA-gather baseline (apples-to-apples re-measure)
step acc2_xla 3000 env PROBE_ACC=2 DGTTA_WARP_IMPL=xla python tools/probe_acc2.py --time

# 4. acc16 epoch, one-hot warps
step acc16_onehot 3000 env PROBE_ACC=16 DGTTA_WARP_IMPL=onehot python tools/probe_acc2.py --time

# 5. short bench (3 epochs) with inference metrics, default routing
step bench3 3600 env BENCH_EPOCHS=3 python bench.py

echo "=== SEQUENCE DONE $(date) ===" | tee -a $LOG/summary.txt
