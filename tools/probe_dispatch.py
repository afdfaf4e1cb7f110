"""Probe: sustainable dispatch rate of small XLA programs through the tunnel.

Decides between the fused+Pallas-warp design and the split-dispatch engine:
the split engine issues ~670 small warp dispatches per epoch, so its floor is
dispatch_rate * count.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    # plain tiny jit op
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128))
    np.asarray(f(x))
    for n in (100, 400):
        t0 = time.perf_counter()
        y = x
        for _ in range(n):
            y = f(y)
        np.asarray(y)
        dt = (time.perf_counter() - t0) / n * 1e6
        print(f"tiny chained x{n}: {dt:.1f} us/dispatch", flush=True)

    # independent (non-chained) dispatches
    t0 = time.perf_counter()
    outs = [f(x) for _ in range(400)]
    jax.block_until_ready(outs)
    print(f"tiny independent x400: "
          f"{(time.perf_counter()-t0)/400*1e6:.1f} us/dispatch", flush=True)

    # realistic C=1 fast-form unwarp (the split engine's hot dispatch)
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from dg_tta_tpu.core.fields import get_rand_affine
    from dg_tta_tpu.core.grid import affine_grid, grid_sample_flat

    patch = (112, 112, 128)
    N = int(np.prod(patch))
    B = 1

    @jax.jit
    def unwarp(ch, theta):
        grid = affine_grid(theta, patch, align_corners=False)
        return grid_sample_flat(ch, patch, grid, padding_mode="zeros",
                                align_corners=False)

    theta, _ = get_rand_affine(jax.random.PRNGKey(0), B)
    ch = jnp.zeros((B, 1, N), jnp.float32)
    np.asarray(unwarp(ch, theta))
    for n in (50, 200):
        t0 = time.perf_counter()
        y = ch
        for _ in range(n):
            y = unwarp(y, theta)
        np.asarray(y)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"C=1 unwarp chained x{n}: {dt:.3f} ms/dispatch", flush=True)

    # 10-channel unwarp as 10 separate C=1 dispatches, 64 rounds
    chans = [jnp.zeros((B, 1, N), jnp.float32) for _ in range(10)]
    t0 = time.perf_counter()
    for _ in range(64):
        chans = [unwarp(c, theta) for c in chans]
    jax.block_until_ready(chans)
    dt = time.perf_counter() - t0
    print(f"64 rounds x 10 C=1 unwarps: {dt:.2f} s total "
          f"({dt/640*1e3:.2f} ms/dispatch)", flush=True)


if __name__ == "__main__":
    main()
