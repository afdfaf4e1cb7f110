"""Scaffolding bisect: which kernel plumbing construct hangs Mosaic?

WS_VARIANT:
  a  minimal: one ANY input, DMA static slice, static store, no fori
  b  + dynamic-start DMA (scalar from SMEM)
  c  + fori loop over channels with dynamic-index store
  d  + 4D ANY ref DMA (b, c indices + row slice)
  e  grid-dim channel instead of fori (no dynamic store)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V = os.environ.get("WS_VARIANT", "a")
R, T, Cp = 128, 32, 2
PADR = 64


def main():
    B = 1
    n_slab = R // T
    src = jnp.arange(B * Cp * (R + PADR) * 128, dtype=jnp.float32).reshape(
        B, Cp, R + PADR, 128)
    bases = jnp.full((B, 2), 3, jnp.int32)

    if V == "a":
        def kernel(src_ref, out_ref, buf, sem):
            i = pl.program_id(1)
            cp = pltpu.make_async_copy(
                src_ref.at[0, 0, pl.ds(i * T, T), :], buf, sem)
            cp.start()
            cp.wait()
            out_ref[0, 0] = buf[:]
        grid = (B, n_slab)
        in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
        args = (src,)
        out_specs = pl.BlockSpec((1, Cp, T, 128), lambda b, i: (b, 0, i, 0))
    elif V == "b":
        def kernel(bases_ref, src_ref, out_ref, buf, sem):
            i = pl.program_id(1)
            zb = bases_ref[0, 0]
            cp = pltpu.make_async_copy(
                src_ref.at[0, 0, pl.ds(i * T + zb, T), :], buf, sem)
            cp.start()
            cp.wait()
            out_ref[0, 0] = buf[:]
        grid = (B, n_slab)
        in_specs = [
            pl.BlockSpec((1, 2), lambda b, i: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY)]
        args = (bases, src)
        out_specs = pl.BlockSpec((1, Cp, T, 128), lambda b, i: (b, 0, i, 0))
    elif V == "c":
        def kernel(src_ref, out_ref, buf, sem):
            i = pl.program_id(1)

            def body(c, carry):
                cp = pltpu.make_async_copy(
                    src_ref.at[0, 0, pl.ds(i * T, T), :], buf, sem)
                cp.start()
                cp.wait()
                out_ref[0, pl.ds(c, 1)] = buf[:][None]
                return carry
            jax.lax.fori_loop(0, Cp, body, 0)
        grid = (B, n_slab)
        in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
        args = (src,)
        out_specs = pl.BlockSpec((1, Cp, T, 128), lambda b, i: (b, 0, i, 0))
    elif V == "d":
        def kernel(src_ref, out_ref, buf, sem):
            b = pl.program_id(0)
            i = pl.program_id(1)

            def body(c, carry):
                cp = pltpu.make_async_copy(
                    src_ref.at[b, c, pl.ds(i * T, T), :], buf, sem)
                cp.start()
                cp.wait()
                out_ref[0, pl.ds(c, 1)] = buf[:][None]
                return carry
            jax.lax.fori_loop(0, Cp, body, 0)
        grid = (B, n_slab)
        in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
        args = (src,)
        out_specs = pl.BlockSpec((1, Cp, T, 128), lambda b, i: (b, 0, i, 0))
    else:  # e
        def kernel(src_ref, out_ref, buf, sem):
            b = pl.program_id(0)
            i = pl.program_id(1)
            c = pl.program_id(2)
            cp = pltpu.make_async_copy(
                src_ref.at[b, c, pl.ds(i * T, T), :], buf, sem)
            cp.start()
            cp.wait()
            out_ref[0, 0] = buf[:]
        grid = (B, n_slab, Cp)
        in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
        args = (src,)
        out_specs = pl.BlockSpec((1, 1, T, 128),
                                 lambda b, i, c: (b, c, i, 0))

    t0 = time.perf_counter()
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((B, Cp, R, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(*args)
    out = np.asarray(out)
    print(f"variant {V}: ok {time.perf_counter()-t0:.1f}s "
          f"sum={out.sum():.0f}", flush=True)


if __name__ == "__main__":
    main()


def extra_variants():
    """f: no DMA (blocked VMEM in); g: DMA from 2D ANY ref; h: DMA whole-row
    chunk from 2D ANY with static start; i: grid-dim c + blocked VMEM."""
    B = 1
    V = os.environ["WS_VARIANT"]
    n_slab = R // T
    src2 = jnp.arange((R + PADR) * 128, dtype=jnp.float32).reshape(
        R + PADR, 128)

    if V == "f":
        def kernel(x_ref, out_ref):
            out_ref[:] = x_ref[:] * 2.0
        t0 = time.perf_counter()
        out = pl.pallas_call(
            kernel,
            grid=(n_slab,),
            in_specs=[pl.BlockSpec((T, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((T, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        )(src2[:R])
        np.asarray(out)
        print(f"variant f: ok {time.perf_counter()-t0:.1f}s", flush=True)
        return
    if V == "g":
        def kernel(src_ref, out_ref, buf, sem):
            i = pl.program_id(0)
            cp = pltpu.make_async_copy(
                src_ref.at[pl.ds(i * T, T), :], buf, sem)
            cp.start()
            cp.wait()
            out_ref[:] = buf[:]
        t0 = time.perf_counter()
        out = pl.pallas_call(
            kernel,
            grid=(n_slab,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((T, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((T, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
        )(src2)
        np.asarray(out)
        print(f"variant g: ok {time.perf_counter()-t0:.1f}s", flush=True)
        return
    if V == "h":
        def kernel(src_ref, out_ref, buf, sem):
            cp = pltpu.make_async_copy(src_ref.at[pl.ds(0, T), :], buf, sem)
            cp.start()
            cp.wait()
            out_ref[:] = buf[:]
        t0 = time.perf_counter()
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((T, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
        )(src2)
        np.asarray(out)
        print(f"variant h: ok {time.perf_counter()-t0:.1f}s", flush=True)
        return


if os.environ.get("WS_VARIANT", "a") in ("f", "g", "h"):
    main = extra_variants  # noqa: F811
