"""Probe 5: sublane dynamic-gather operand-size limits + resolvable shuffle
throughput (enough in-kernel work to swamp the ~1.4 ms dispatch constant)."""
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
        print(f"{name}: OK correct={ok} {dt:.1f} us/call")
        return dt
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return None


def main():
    k = jax.random.PRNGKey

    # sublane taa at increasing operand row counts, idx same shape
    for S in (8, 16, 32, 64, 128, 256):
        op = jax.random.normal(k(S), (S, 128), jnp.float32)
        idx = jax.random.randint(k(S + 1), (S, 128), 0, S)
        exp = np.take_along_axis(np.asarray(op), np.asarray(idx), axis=0)
        run(f"sub taa S={S}", lambda o, i, r: r.__setitem__(
            slice(None), jnp.take_along_axis(o[:], i[:], axis=0)),
            (op, idx), (S, 128), exp)

    # result rows != operand rows (operand 64, idx 896) - numpy disallows,
    # but jnp may broadcast; try jnp.take variant instead via clip
    # (skip - shape rules already probed)

    # shuffle cost, resolvable: 2048 in-kernel iterations on (896,128)
    T = 896
    ops = jax.random.normal(k(8), (T, 128), jnp.float32)
    idxs = jax.random.randint(k(9), (T, 128), 0, 128)

    def k_shuf(o_ref, i_ref, r_ref):
        def body(t, acc):
            ii = jnp.bitwise_and(i_ref[:] + t, 127)
            return acc + jnp.take_along_axis(o_ref[:], ii, axis=1)
        r_ref[:] = jax.lax.fori_loop(0, 2048, body,
                                     jnp.zeros((T, 128), jnp.float32))
    dt = run("shuf x2048 (896,128)", k_shuf, (ops, idxs), (T, 128), n=5)
    if dt:
        per = (dt - 1400) / 2048
        print(f"  -> ~{per:.3f} us/shuffle, "
              f"{per*1e3/(T/8):.1f} ns/(8,128)tile, "
              f"{per*1e-6*940e6/(T*128/1024):.2f} cyc/1024elem-op")

    # select+fma resolvable: 16384 iterations
    def k_sel(o_ref, i_ref, r_ref):
        def body(t, acc):
            c = i_ref[:] == jnp.bitwise_and(t, 127)
            return acc + jnp.where(c, o_ref[:], 0.0)
        r_ref[:] = jax.lax.fori_loop(0, 16384, body,
                                     jnp.zeros((T, 128), jnp.float32))
    dt = run("sel x16384 (896,128)", k_sel, (ops, idxs), (T, 128), n=5)
    if dt:
        per = (dt - 1400) / 16384
        ideal = T * 128 * 3 / 1024 / 940e6 * 1e6  # 3 ops/elem
        print(f"  -> ~{per:.3f} us/iter (ideal ~{ideal:.3f})")

    # static sublane roll (pltpu.roll) resolvable: 8192 iterations
    def k_roll(o_ref, i_ref, r_ref):
        def body(t, acc):
            return acc + pltpu.roll(o_ref[:], 8, 0)
        r_ref[:] = jax.lax.fori_loop(0, 8192, body,
                                     jnp.zeros((T, 128), jnp.float32))
    dt = run("roll x8192 (896,128)", k_roll, (ops, idxs), (T, 128), n=5)
    if dt:
        per = (dt - 1400) / 8192
        print(f"  -> ~{per:.3f} us/roll")


if __name__ == "__main__":
    main()
