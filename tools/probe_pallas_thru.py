"""Probe 4: separate tunnel dispatch overhead from true in-kernel throughput.

Scales in-kernel work (fori iterations) and fits t = C + iters * k.
Also a matmul kernel to sanity-check against known MXU peak.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 896


def bench(fn, args, n=30):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / n * 1e6


def make(kernel, args, out_shape):
    return jax.jit(lambda *a: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in a],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*a))


def main():
    k = jax.random.PRNGKey
    ops = jax.random.normal(k(0), (T, 128), jnp.float32)
    idxs = jax.random.randint(k(1), (T, 128), 0, 128)

    # d0: trivial kernel = pure dispatch cost
    triv = make(lambda o, r: r.__setitem__(slice(None), o[:] + 1.0),
                (ops,), (T, 128))
    print(f"d0 trivial kernel: {bench(triv, (ops,)):.1f} us/call")

    # select+add loop at three iteration counts
    def sel_loop(iters):
        def kern(o_ref, i_ref, r_ref):
            def body(t, acc):
                c = i_ref[:] == jnp.bitwise_and(t, 127)
                return acc + jnp.where(c, o_ref[:], 0.0)
            r_ref[:] = jax.lax.fori_loop(0, iters, body,
                                         jnp.zeros((T, 128), jnp.float32))
        return make(kern, (ops, idxs), (T, 128))

    ts = {}
    for it in (64, 256, 1024):
        ts[it] = bench(sel_loop(it), (ops, idxs))
        print(f"s{it} select loop x{it}: {ts[it]:.1f} us/call")
    kk = (ts[1024] - ts[64]) / (1024 - 64)
    C = ts[64] - 64 * kk
    per_elem = kk * 1e-6 * 940e6 * 1e6 / (T * 128)  # cycles per element
    print(f"  -> fit: C={C:.1f} us, k={kk:.3f} us/iter, "
          f"{kk*1e3/T:.1f} ns/row, {per_elem:.4f} cycl/elem")

    # shuffle loop at two counts
    def shuf_loop(iters):
        def kern(o_ref, i_ref, r_ref):
            def body(t, acc):
                ii = jnp.bitwise_and(i_ref[:] + t, 127)
                return acc + jnp.take_along_axis(o_ref[:], ii, axis=1)
            r_ref[:] = jax.lax.fori_loop(0, iters, body,
                                         jnp.zeros((T, 128), jnp.float32))
        return make(kern, (ops, idxs), (T, 128))

    t64 = bench(shuf_loop(64), (ops, idxs))
    t256 = bench(shuf_loop(256), (ops, idxs))
    kk2 = (t256 - t64) / 192
    print(f"shuffle loops: 64={t64:.1f} 256={t256:.1f} -> k={kk2:.3f} us/iter"
          f" ({kk2*1e3/T:.2f} ns/row, "
          f"{kk2*1e-6*940e6*1e6/(T*128):.4f} cycl/elem)")

    # matmul sanity: acc += A @ B, iters x (896x128)@(128x128)
    A = jax.random.normal(k(2), (T, 128), jnp.float32)
    Bm = jax.random.normal(k(3), (128, 128), jnp.float32)

    def mm_loop(iters):
        def kern(a_ref, b_ref, r_ref):
            def body(t, acc):
                return acc + jnp.dot(a_ref[:], b_ref[:] + t * 0.0,
                                     preferred_element_type=jnp.float32)
            r_ref[:] = jax.lax.fori_loop(0, iters, body,
                                         jnp.zeros((T, 128), jnp.float32))
        return make(kern, (A, Bm), (T, 128))

    m64 = bench(mm_loop(64), (A, Bm))
    m256 = bench(mm_loop(256), (A, Bm))
    km = (m256 - m64) / 192
    flops = 2 * T * 128 * 128
    print(f"matmul loops: 64={m64:.1f} 256={m256:.1f} -> {km:.3f} us/iter = "
          f"{flops/km/1e6:.2f} TFLOP/s")


if __name__ == "__main__":
    main()
