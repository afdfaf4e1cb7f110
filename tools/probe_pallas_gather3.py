"""Probe 3: retry HTTP-500 cases + true primitive throughput (cheap idx math).

Calibrates the building blocks for the Pallas trilinear-warp kernel:
  - same-shape sublane take_along_axis (g4 retry)
  - wide lane taa (g1 retry)
  - lane-shuffle throughput with &-mask index update (no int mod/div)
  - select+fma chain throughput (one-hot contraction model)
  - static sublane slice + fma (z/y candidate model)
  - per-row scalar loop with dynamic slab slice (row-loop design model)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, args, out_shape, expect=None, n=30, scratch=()):
    try:
        fn = jax.jit(lambda *a: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in a],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=list(scratch),
        )(*a))
        out = np.asarray(fn(*args))
        ok = True if expect is None else bool(np.allclose(out, expect))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _ = np.asarray(out)
        dt = (time.perf_counter() - t0) / n * 1e6
        print(f"{name}: OK correct={ok} {dt:.1f} us/call")
        return dt
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return None


def main():
    k = jax.random.PRNGKey
    S = 512

    # g4 retry: same-shape sublane taa
    op4 = jax.random.normal(k(5), (S, 128), jnp.float32)
    idx4 = jax.random.randint(k(6), (S, 128), 0, S)
    exp4 = np.take_along_axis(np.asarray(op4), np.asarray(idx4), axis=0)
    run("g4r same-shape sublane taa", lambda o, i, r: r.__setitem__(
        slice(None), jnp.take_along_axis(o[:], i[:], axis=0)),
        (op4, idx4), (S, 128), exp4)

    # g1 retry: wide lane taa
    A, Wd = 8, 6272
    op1 = jax.random.normal(k(0), (A, Wd), jnp.float32)
    idx1 = jax.random.randint(k(1), (A, Wd), 0, Wd)
    exp1 = np.take_along_axis(np.asarray(op1), np.asarray(idx1), axis=1)
    run("g1r wide lane taa (8,6272)", lambda o, i, r: r.__setitem__(
        slice(None), jnp.take_along_axis(o[:], i[:], axis=1)),
        (op1, idx1), (A, Wd), exp1)

    # t3: lane shuffle throughput, cheap idx update (xor with lane const)
    T = 896
    ops = jax.random.normal(k(8), (T, 128), jnp.float32)
    idxs = jax.random.randint(k(9), (T, 128), 0, 128)

    def k_shuf(o_ref, i_ref, r_ref):
        def body(t, acc):
            ii = jnp.bitwise_and(i_ref[:] + t, 127)
            return acc + jnp.take_along_axis(o_ref[:], ii, axis=1)
        r_ref[:] = jax.lax.fori_loop(0, 64, body,
                                     jnp.zeros((T, 128), jnp.float32))
    dt = run("t3 64x lane shuffle (896,128)", k_shuf, (ops, idxs), (T, 128))
    if dt:
        print(f"  -> {dt/64:.2f} us/shuffle = {T*128/(dt/64):.0f} elem/us")

    # t4: pure select+fma chain (one-hot contraction model): 64 iters of
    # cond = (i==t); acc += where(cond, o, 0)
    def k_sel(o_ref, i_ref, r_ref):
        def body(t, acc):
            c = i_ref[:] == jnp.bitwise_and(t, 127)
            return acc + jnp.where(c, o_ref[:], 0.0)
        r_ref[:] = jax.lax.fori_loop(0, 64, body,
                                     jnp.zeros((T, 128), jnp.float32))
    dt = run("t4 64x cmp+select+add (896,128)", k_sel, (ops, idxs), (T, 128))
    if dt:
        print(f"  -> {dt/64:.2f} us/iter = {T*128/(dt/64):.0f} elem/us")

    # t5: static sublane-slice + fma model: acc += w * slab[t:t+T, :]
    SB = 1536
    slab = jax.random.normal(k(10), (SB, 128), jnp.float32)
    wts = jax.random.normal(k(11), (T, 128), jnp.float32)

    def k_slice(s_ref, w_ref, r_ref):
        acc = jnp.zeros((T, 128), jnp.float32)
        for t in range(36):
            acc = acc + w_ref[:] * s_ref[t:t + T, :]
        r_ref[:] = acc
    dt = run("t5 36x static-slice+fma (896 of 1536,128)", k_slice,
             (slab, wts), (T, 128))
    if dt:
        print(f"  -> {dt/36:.2f} us/slice-fma = {T*128/(dt/36):.0f} elem/us")

    # t6: per-row scalar loop: 896 rows; per row: dynamic (36,128) slice of
    # slab + broadcast-shuffle + weighted reduce to one output row
    rowbase = jax.random.randint(k(12), (T, 1), 0, SB - 40)

    def k_rowloop(s_ref, b_ref, i_ref, r_ref):
        def body(t, _):
            base = b_ref[t, 0]
            cand = s_ref[pl.ds(base, 36), :]                # (36,128)
            lane = jnp.broadcast_to(i_ref[pl.ds(t, 1), :], (36, 128))
            shuf = jnp.take_along_axis(cand, lane, axis=1)   # (36,128)
            r_ref[pl.ds(t, 1), :] = jnp.sum(shuf, axis=0, keepdims=True)
            return 0
        jax.lax.fori_loop(0, T, body, 0)
    dt = run("t6 per-row dynslice+shuffle+reduce (896 rows)", k_rowloop,
             (slab, rowbase, idxs), (T, 128))
    if dt:
        print(f"  -> {dt/T*1000:.1f} ns/row")

    # t7: dynamic sublane slice (scalar start) + fma, 36 iters
    def k_dyn(s_ref, w_ref, b_ref, r_ref):
        base = b_ref[0, 0]
        acc = jnp.zeros((T, 128), jnp.float32)
        for t in range(36):
            acc = acc + w_ref[:] * s_ref[pl.ds(base + t, T), :]
        r_ref[:] = acc
    dt = run("t7 36x dyn-slice+fma", k_dyn,
             (slab, wts, jnp.array([[3]], jnp.int32)), (T, 128))
    if dt:
        print(f"  -> {dt/36:.2f} us/dyn-slice-fma")


if __name__ == "__main__":
    main()
