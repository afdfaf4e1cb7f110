"""Correctness + timing of ops/warp_pallas.py on the real chip.

Env: WP_SMALL=1 for a small shape smoke, WP_N iterations (default 20).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from dg_tta_tpu.core.fields import get_rand_affine
    from dg_tta_tpu.core.grid import affine_grid, grid_sample_flat
    from dg_tta_tpu.ops.experimental.warp_pallas_staged import grid_sample_flat_pallas

    small = bool(os.environ.get("WP_SMALL"))
    D, H, W = (8, 10, 128) if small else (112, 112, 128)
    C = int(os.environ.get("WP_C", 10))
    B = int(os.environ.get("WP_B", 1))
    dt = jnp.bfloat16 if os.environ.get("WP_BF16", "1") == "1" else (
        jnp.float32)
    N = D * H * W
    flat = (jax.random.normal(jax.random.PRNGKey(1), (B, C, N), jnp.float32)
            .astype(dt))
    theta, theta_inv = get_rand_affine(jax.random.PRNGKey(2), B)
    grid = affine_grid(theta_inv, (D, H, W), align_corners=False)

    t0 = time.perf_counter()
    got = grid_sample_flat_pallas(flat, grid, (D, H, W),
                                  padding_mode="zeros",
                                  align_corners=False)
    got = np.asarray(got, dtype=np.float32)
    print(f"first call (compile): {time.perf_counter()-t0:.1f} s",
          flush=True)

    ref = np.asarray(grid_sample_flat(
        flat.astype(jnp.float32), (D, H, W), grid,
        padding_mode="zeros", align_corners=False))
    err = np.max(np.abs(ref - got))
    scale = np.max(np.abs(ref)) + 1e-9
    print(f"maxerr={err:.3e} rel={err/scale:.3e} "
          f"(dtype={dt.__name__})", flush=True)

    n = int(os.environ.get("WP_N", 20))
    t0 = time.perf_counter()
    y = flat
    for _ in range(n):
        y = grid_sample_flat_pallas(y, grid, (D, H, W),
                                    padding_mode="zeros",
                                    align_corners=False)
    np.asarray(y)
    per = (time.perf_counter() - t0) / n * 1e3
    print(f"{per:.2f} ms/warp (B={B} C={C} {D}x{H}x{W})", flush=True)


if __name__ == "__main__":
    main()
