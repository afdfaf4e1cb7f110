#!/bin/bash
# Round-3r: record the inference pad fix (final bench at HEAD).
set -u
cd /root/repo
LOG=/tmp/r3r
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

step bench_final 4000 python bench.py

echo "=== SEQUENCE DONE $(date) ===" | tee -a $LOG/summary.txt
