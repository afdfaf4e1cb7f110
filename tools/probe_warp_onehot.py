"""Standalone timing of the one-hot warp at the TTA hot-path shapes.

Times grid_sample_flat_onehot vs grid_sample_flat (XLA gather) on the real
chip for the two shapes the fused epoch cares about:
  * C=10 bf16 unwarp (the n_opt logits unwarp — the r2 cliff cost)
  * C=1 f32 input warp
NOTE: standalone numbers on this stack are polluted by dispatch/transfer
pathologies (PERF.md); the acc2 probe is the decider.  Env: WP_C, WP_BF16,
WP_ITERS.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dg_tta_tpu.core.fields import get_rand_affine
from dg_tta_tpu.core.grid import affine_grid, grid_sample_flat
from dg_tta_tpu.ops.warp_onehot import grid_sample_flat_onehot

PATCH = (112, 112, 128)
N = int(np.prod(PATCH))


def run(C, bf16, iters=8):
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    B = 2
    flat = jax.random.normal(jax.random.PRNGKey(1), (B, C, N), dtype)
    theta, _ = get_rand_affine(jax.random.PRNGKey(2), B)
    grid = affine_grid(theta, PATCH, align_corners=False)

    @jax.jit
    def f_onehot(x, g):
        return grid_sample_flat_onehot(x, g, PATCH, padding_mode="zeros",
                                       align_corners=False)

    @jax.jit
    def f_xla(x, g):
        return grid_sample_flat(x, PATCH, g, padding_mode="zeros",
                                align_corners=False)

    for name, fn in (("onehot", f_onehot), ("xla", f_xla)):
        t0 = time.perf_counter()
        out = fn(flat, grid)
        out.block_until_ready()
        compile_s = time.perf_counter() - t0
        # timing fence via tiny host transfer (PERF.md: block_until_ready
        # alone has been unreliable on donated outputs; this is safe here
        # but keep the float() fence for uniformity)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(flat, grid)
            float(out[0, 0, 0])
            ts.append(time.perf_counter() - t0)
        print(f"C={C} bf16={bf16} {name}: compile {compile_s:.1f}s "
              f"steady {min(ts)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    C = int(os.environ.get("WP_C", 10))
    bf16 = os.environ.get("WP_BF16", "1") == "1"
    iters = int(os.environ.get("WP_ITERS", 8))
    run(C, bf16, iters)
    if "WP_C" not in os.environ:
        run(1, False, iters)
