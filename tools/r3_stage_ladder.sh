#!/bin/bash
# Walk the warp-kernel stage ladder; the first level that faults the worker
# identifies the faulting construct.  Run after worker recovery.
set -u
cd /root/repo
LOG=/tmp/r3ladder
mkdir -p $LOG
for lvl in 0 1 2 3 4; do
  echo "=== stage_limit=$lvl $(date +%H:%M:%S) ===" | tee -a $LOG/summary.txt
  timeout 1500 env DGTTA_PALLAS_STAGE_LIMIT=$lvl python -c "
import jax, jax.numpy as jnp, numpy as np, time
from dg_tta_tpu.core.fields import get_rand_affine
from dg_tta_tpu.core.grid import affine_grid
from dg_tta_tpu.ops.experimental.warp_pallas_staged import grid_sample_flat_pallas
D,H,W=8,16,128; N=D*H*W
flat = jax.random.normal(jax.random.PRNGKey(1),(1,2,N),jnp.float32)
th,_ = get_rand_affine(jax.random.PRNGKey(2),1)
g = affine_grid(th,(D,H,W),align_corners=False)
t0=time.perf_counter()
out = np.asarray(grid_sample_flat_pallas(flat, g, (D,H,W)))
print('ok', round(time.perf_counter()-t0,1), 's finite:', np.isfinite(out).all())
" > "$LOG/stage$lvl.log" 2>&1
  rc=$?
  tail -2 "$LOG/stage$lvl.log" | grep -v WARNING | tee -a $LOG/summary.txt
  echo "rc=$rc" | tee -a $LOG/summary.txt
  if [ $rc -ne 0 ]; then
    echo "FAULT AT LEVEL $lvl" | tee -a $LOG/summary.txt
    exit $lvl
  fi
done
echo "ALL LEVELS OK" | tee -a $LOG/summary.txt
