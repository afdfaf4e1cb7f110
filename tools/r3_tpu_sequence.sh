#!/bin/bash
# Round-3 TPU validation sequence: runs the Pallas-warp validation and the
# benchmark ladder as soon as the chip is reachable.  Each step has its own
# timeout and log; later steps run only if earlier ones succeed.
set -u
cd /root/repo
LOG=/tmp/r3seq
mkdir -p $LOG

step() {
  name=$1; to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a $LOG/summary.txt
  timeout "$to" "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  tail -3 "$LOG/$name.log" | grep -v WARNING | tee -a $LOG/summary.txt
  echo "rc=$rc" | tee -a $LOG/summary.txt
  return $rc
}

# 0. health
for i in 1 2 3; do step health 150 python -c "import jax; print(float(jax.jit(lambda x: x+1)(jax.numpy.ones(4)).sum()))" && break; sleep 60; done

# 1. small warp kernel compile+correctness (the preflight shape)
step warp_small 1500 python -c "
import jax, jax.numpy as jnp, numpy as np
from dg_tta_tpu.core.fields import get_rand_affine
from dg_tta_tpu.core.grid import affine_grid, grid_sample_flat
from dg_tta_tpu.ops.experimental.warp_pallas_staged import grid_sample_flat_pallas
import time
D,H,W=8,16,128; N=D*H*W
flat = jax.random.normal(jax.random.PRNGKey(1),(1,2,N),jnp.float32)
th,_ = get_rand_affine(jax.random.PRNGKey(2),1)
g = affine_grid(th,(D,H,W),align_corners=False)
t0=time.perf_counter()
got = np.asarray(grid_sample_flat_pallas(flat, g, (D,H,W)))
print('compile+run', round(time.perf_counter()-t0,1), 's')
ref = np.asarray(grid_sample_flat(flat,(D,H,W),g))
err = np.abs(got-ref).max()
print('maxerr', err)
assert err < 2e-5
print('WARP_SMALL_OK')
" || exit 1

# 2. full-size warp timing (C=10 bf16 + C=1)
step warp_full 2400 python tools/probe_warp_pallas.py || exit 1
step warp_c1 1200 env WP_C=1 WP_BF16=0 python tools/probe_warp_pallas.py

# 3. acc2 probe with pallas warps (gather-time target <0.1s)
step acc2_pallas 3000 env PROBE_ACC=2 PROBE_GROUP=1 PROBE_BF16=1 python tools/probe_acc2.py --time

# 4. acc16 epoch with pallas warps
step acc16_pallas 3000 env PROBE_ACC=16 PROBE_GROUP=1 PROBE_BF16=1 python tools/probe_acc2.py --time

# 5. short bench (3 epochs) sanity with inference metric
step bench3 3600 env BENCH_EPOCHS=3 python bench.py

echo "=== SEQUENCE DONE $(date) ===" | tee -a $LOG/summary.txt
