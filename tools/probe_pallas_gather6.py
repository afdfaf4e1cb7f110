"""Probe 7: resolvable in-kernel costs of shuffle / select / roll / slice.

2048+ iterations so per-op cost swamps the ~1.4 ms tunnel dispatch constant.
These constants drive the warp-kernel design (ops/warp_pallas.py).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 896
CLK = 940e6


def run(name, kernel, args, out_shape, iters, ops_per_iter, n=5):
    try:
        fn = jax.jit(lambda *a: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in a],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*a))
        np.asarray(fn(*args))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _ = np.asarray(out)
        dt = (time.perf_counter() - t0) / n * 1e6
        per = (dt - 1400) / iters
        tiles = T / 8
        print(f"{name}: {dt:.0f} us/call -> {per:.3f} us/iter "
              f"({per*1e-6*CLK/tiles:.1f} cyc/(8,128)tile)", flush=True)
        return per
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:110]}", flush=True)
        return None


def main():
    k = jax.random.PRNGKey
    ops = jax.random.normal(k(8), (T, 128), jnp.float32)
    idxs = jax.random.randint(k(9), (T, 128), 0, 128)

    # lane shuffle
    def k_shuf(o_ref, i_ref, r_ref):
        def body(t, acc):
            ii = jnp.bitwise_and(i_ref[:] + t, 127)
            return acc + jnp.take_along_axis(o_ref[:], ii, axis=1)
        r_ref[:] = jax.lax.fori_loop(0, 2048, body,
                                     jnp.zeros((T, 128), jnp.float32))
    run("shuffle", k_shuf, (ops, idxs), (T, 128), 2048, 1)

    # cmp+select+add
    def k_sel(o_ref, i_ref, r_ref):
        def body(t, acc):
            c = i_ref[:] == jnp.bitwise_and(t, 127)
            return acc + jnp.where(c, o_ref[:], 0.0)
        r_ref[:] = jax.lax.fori_loop(0, 16384, body,
                                     jnp.zeros((T, 128), jnp.float32))
    run("cmp+sel+add", k_sel, (ops, idxs), (T, 128), 16384, 3)

    # static lane roll + fma
    def k_roll(o_ref, i_ref, r_ref):
        def body(t, acc):
            return acc + pltpu.roll(o_ref[:], 7, 1) * 0.5
        r_ref[:] = jax.lax.fori_loop(0, 8192, body,
                                     jnp.zeros((T, 128), jnp.float32))
    run("laneroll+fma", k_roll, (ops, idxs), (T, 128), 8192, 2)

    # static row-slice + fma from an extended buffer
    slab = jax.random.normal(k(10), (T + 64, 128), jnp.float32)

    def k_slice(s_ref, r_ref):
        def body(t, acc):
            return acc + s_ref[13:13 + T, :] * 0.5
        r_ref[:] = jax.lax.fori_loop(0, 8192, body,
                                     jnp.zeros((T, 128), jnp.float32))
    run("rowslice+fma", k_slice, (slab,), (T, 128), 8192, 2)

    # dynamic row-slice + fma (scalar base)
    def k_dslice(s_ref, b_ref, r_ref):
        base = b_ref[0, 0]
        def body(t, acc):
            return acc + s_ref[pl.ds(base, T), :] * 0.5
        r_ref[:] = jax.lax.fori_loop(0, 4096, body,
                                     jnp.zeros((T, 128), jnp.float32))
    run("dynrowslice+fma", k_dslice, (slab, jnp.array([[11]], jnp.int32)),
        (T, 128), 4096, 2)

    # dynamic lane roll (traced shift)
    def k_droll(o_ref, b_ref, r_ref):
        s = b_ref[0, 0]
        def body(t, acc):
            return acc + pltpu.roll(o_ref[:], s, 1) * 0.5
        r_ref[:] = jax.lax.fori_loop(0, 4096, body,
                                     jnp.zeros((T, 128), jnp.float32))
    run("dynlaneroll+fma", k_droll, (ops, jnp.array([[5]], jnp.int32)),
        (T, 128), 4096, 2)

    # int cmp on int32 fields (cond builds)
    def k_cmp(i_ref, o_ref, r_ref):
        def body(t, acc):
            c = (i_ref[:] == t).astype(jnp.float32)
            return acc + c
        r_ref[:] = jax.lax.fori_loop(0, 16384, body,
                                     jnp.zeros((T, 128), jnp.float32))
    run("intcmp+cast+add", k_cmp, (idxs, ops), (T, 128), 16384, 3)


if __name__ == "__main__":
    main()
