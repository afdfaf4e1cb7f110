"""Probe 2: boundary cases of Mosaic dynamic-gather + in-kernel throughput."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, args, out_shape, expect=None, n=50):
    try:
        fn = jax.jit(lambda *a: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in a],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*a))
        out = np.asarray(fn(*args))
        ok = True if expect is None else np.allclose(out, expect)
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

    # g1: wide lane gather, idx.shape == operand.shape (8, 6272)
    A, Wd = 8, 6272
    op = jax.random.normal(k(0), (A, Wd), jnp.float32)
    idx = jax.random.randint(k(1), (A, Wd), 0, Wd)
    exp = np.take_along_axis(np.asarray(op), np.asarray(idx), axis=1)
    run("g1 wide lane taa (8,6272)", lambda o, i, r: r.__setitem__(
        slice(None), jnp.take_along_axis(o[:], i[:], axis=1)),
        (op, idx), (A, Wd), exp)

    # g2: narrow result from wide operand (8, 6272) -> (8, 128)
    idx2 = jax.random.randint(k(2), (A, 128), 0, Wd)
    exp2 = np.take_along_axis(np.asarray(op), np.asarray(idx2), axis=1)
    run("g2 narrow-from-wide lane taa", lambda o, i, r: r.__setitem__(
        slice(None), jnp.take_along_axis(o[:], i[:], axis=1)),
        (op, idx2), (A, 128), exp2)

    # g3: single-row huge lane gather (1, 524288) -> (1, 16384)
    op3 = jax.random.normal(k(3), (1, 524288), jnp.float32)
    idx3 = jax.random.randint(k(4), (1, 16384), 0, 524288)
    exp3 = np.take_along_axis(np.asarray(op3), np.asarray(idx3), axis=1)
    run("g3 huge 1-row lane taa", lambda o, i, r: r.__setitem__(
        slice(None), jnp.take_along_axis(o[:], i[:], axis=1)),
        (op3, idx3), (1, 16384), exp3)

    # g4: sublane taa, idx.shape == operand.shape (512, 128)
    S = 512
    op4 = jax.random.normal(k(5), (S, 128), jnp.float32)
    idx4 = jax.random.randint(k(6), (S, 128), 0, S)
    exp4 = np.take_along_axis(np.asarray(op4), np.asarray(idx4), axis=0)
    run("g4 same-shape sublane taa", lambda o, i, r: r.__setitem__(
        slice(None), jnp.take_along_axis(o[:], i[:], axis=0)),
        (op4, idx4), (S, 128), exp4)

    # g5: row gather with 1D vector idx: jnp.take(slab, (64,), axis=0)
    idx5 = jax.random.randint(k(7), (64,), 0, S)
    exp5 = np.asarray(op4)[np.asarray(idx5)]
    run("g5 vector-row take", lambda o, i, r: r.__setitem__(
        slice(None), jnp.take(o[:], i[:], axis=0)),
        (op4, idx5), (64, 128), exp5)

    # t1: in-kernel throughput: 64 chained lane gathers on (512, 128)
    ops = jax.random.normal(k(8), (S, 128), jnp.float32)
    idxs = jax.random.randint(k(9), (S, 128), 0, 128)

    def k_loop(o_ref, i_ref, r_ref):
        def body(t, acc):
            return acc + jnp.take_along_axis(o_ref[:], (i_ref[:] + t) % 128,
                                             axis=1)
        r_ref[:] = jax.lax.fori_loop(0, 64, body, jnp.zeros((S, 128),
                                                            jnp.float32))
    dt = run("t1 64x lane taa (512,128)", k_loop, (ops, idxs), (S, 128))
    if dt:
        per = dt / 64
        print(f"  -> {per:.2f} us per (512,128) gather = "
              f"{512 * 128 / per:.0f} elem/us")

    # t2: in-kernel throughput of wide gather if g1 worked
    def k_loop2(o_ref, i_ref, r_ref):
        def body(t, acc):
            return acc + jnp.take_along_axis(o_ref[:], (i_ref[:] + t) % Wd,
                                             axis=1)
        r_ref[:] = jax.lax.fori_loop(0, 16, body,
                                     jnp.zeros((A, Wd), jnp.float32))
    dt = run("t2 16x wide lane taa (8,6272)", k_loop2, (op, idx), (A, Wd))
    if dt:
        per = dt / 16
        print(f"  -> {per:.2f} us per (8,6272) gather = "
              f"{A * Wd / per:.0f} elem/us")


if __name__ == "__main__":
    main()
