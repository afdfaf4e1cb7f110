"""Probe 6 (make-or-break): wide lane-axis take_along_axis at 128 sublanes.

If taa(op (128,S), idx (128,S), axis=1) compiles and runs near hardware-
gather speed, the Pallas warp kernel can do arbitrary row-gathers in a
transposed layout.  Also probes transpose cost and dynamic lane roll.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, args, out_shape, expect=None, n=20):
    try:
        fn = jax.jit(lambda *a: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in a],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*a))
        out = np.asarray(fn(*args))
        ok = True if expect is None else bool(np.allclose(out, expect))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _ = np.asarray(out)
        dt = (time.perf_counter() - t0) / n * 1e6
        print(f"{name}: OK correct={ok} {dt:.1f} us/call", flush=True)
        return dt
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return None


def taa1(o, i, r):
    r[:] = jnp.take_along_axis(o[:], i[:], axis=1)


def main():
    k = jax.random.PRNGKey

    # wide lane taa at 128 sublanes, growing width
    ok_s = []
    for S in (256, 512, 1024, 2048):
        op = jax.random.normal(k(S), (128, S), jnp.float32)
        idx = jax.random.randint(k(S + 1), (128, S), 0, S)
        exp = np.take_along_axis(np.asarray(op), np.asarray(idx), axis=1)
        if run(f"taa1 (128,{S})", taa1, (op, idx), (128, S), exp) is not None:
            ok_s.append(S)

    if not ok_s:
        print("wide lane taa unusable")
        return
    S = max(ok_s)

    # resolvable speed: 512 chained gathers on (128, S)
    op = jax.random.normal(k(0), (128, S), jnp.float32)
    idx = jax.random.randint(k(1), (128, S), 0, S)
    mask = S - 1 if (S & (S - 1)) == 0 else None

    def k_loop(o_ref, i_ref, r_ref):
        def body(t, acc):
            ii = jnp.bitwise_and(i_ref[:] + t, mask)
            return acc + jnp.take_along_axis(o_ref[:], ii, axis=1)
        r_ref[:] = jax.lax.fori_loop(0, 512, body,
                                     jnp.zeros((128, S), jnp.float32))
    dt = run(f"taa1 x512 (128,{S})", k_loop, (op, idx), (128, S), n=5)
    if dt:
        per = (dt - 1400) / 512
        print(f"  -> ~{per:.3f} us/gather of {128*S} elems = "
              f"{128*S/per/940:.1f} elem/cycle", flush=True)

    # transpose cost: 512 transposes of (128, S)
    def k_tr(o_ref, r_ref):
        def body(t, acc):
            return acc + o_ref[:].T.T * 1.0 + t * 0.0
        r_ref[:] = jax.lax.fori_loop(0, 256, body,
                                     jnp.zeros((128, S), jnp.float32))
    # .T.T may fold; use explicit round-trip via swapped shape accumulate
    def k_tr2(o_ref, r_ref):
        def body(t, acc):
            return acc + jnp.transpose(o_ref[:] + t * 0.0)
        r_ref[:] = jax.lax.fori_loop(0, 256, body,
                                     jnp.zeros((S, 128), jnp.float32))
    dt = run(f"transpose x256 (128,{S})->({S},128)", k_tr2, (op,), (S, 128),
             n=5)
    if dt:
        print(f"  -> ~{(dt-1400)/256:.3f} us/transpose", flush=True)

    # dynamic lane roll (scalar traced shift)
    def k_roll(o_ref, s_ref, r_ref):
        r_ref[:] = pltpu.roll(o_ref[:], s_ref[0], 1)
    op8 = jax.random.normal(k(2), (128, 256), jnp.float32)
    sh = jnp.asarray([5], jnp.int32)
    exp = np.roll(np.asarray(op8), -0 + 5, axis=1)  # check direction
    d = run("dyn roll (128,256)", k_roll, (op8, sh), (128, 256), None)
    if d is not None:
        fn = jax.jit(lambda *a: pl.pallas_call(
            k_roll, out_shape=jax.ShapeDtypeStruct((128, 256), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(*a))
        out = np.asarray(fn(op8, sh))
        fwd = np.allclose(out, np.roll(np.asarray(op8), 5, axis=1))
        bwd = np.allclose(out, np.roll(np.asarray(op8), -5, axis=1))
        print(f"  dyn roll direction: +5={fwd} -5={bwd}", flush=True)


if __name__ == "__main__":
    main()
