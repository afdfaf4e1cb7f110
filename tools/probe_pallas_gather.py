"""Probe: which gather primitives does Mosaic-TPU support inside Pallas?

The Pallas trilinear-warp kernel (ops/warp_pallas.py) needs a per-element
gather from a VMEM-resident source slab.  Candidates, best first:
  v1  flat 1D gather:        jnp.take(slab.reshape(-1), idx2d)
  v2  sublane gather:        jnp.take_along_axis(slab, rowidx, axis=0)
  v3  lane gather:           jnp.take_along_axis(tile, laneidx, axis=1)
Run on the real chip: python tools/probe_pallas_gather.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, L = 512, 128   # slab rows, lanes
T = 64            # output tile rows


def run(name, kernel, args, out_shape, expect):
    try:
        fn = jax.jit(lambda *a: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in a],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*a))
        out = np.asarray(fn(*args))
        ok = np.allclose(out, expect)
        # time it
        n = 100
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _ = np.asarray(out)
        dt = (time.perf_counter() - t0) / n * 1e6
        print(f"{name}: OK correct={ok} {dt:.1f} us/call")
        return ok
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return False


def main():
    key = jax.random.PRNGKey(0)
    slab = jax.random.normal(key, (S, L), jnp.float32)
    rowidx = jax.random.randint(jax.random.PRNGKey(1), (T, L), 0, S)
    laneidx = jax.random.randint(jax.random.PRNGKey(2), (T, L), 0, L)
    flatidx = (rowidx * L + laneidx).astype(jnp.int32)
    np_slab = np.asarray(slab)

    # v1: flat 1D gather with 2D index tile
    def k_flat(slab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(slab_ref[:].reshape(-1), idx_ref[:], axis=0)

    expect1 = np_slab.reshape(-1)[np.asarray(flatidx)]
    run("v1 flat take", k_flat, (slab, flatidx), (T, L), expect1)

    # v2: sublane gather (per-element row index, lane preserved)
    def k_sub(slab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(slab_ref[:], idx_ref[:], axis=0)

    expect2 = np.take_along_axis(np_slab, np.asarray(rowidx), axis=0)
    run("v2 sublane taa", k_sub, (slab, rowidx), (T, L), expect2)

    # v3: lane gather (per-element lane index, within own row)
    tile = jax.random.normal(jax.random.PRNGKey(3), (T, L), jnp.float32)
    def k_lane(tile_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tile_ref[:], idx_ref[:], axis=1)

    expect3 = np.take_along_axis(np.asarray(tile), np.asarray(laneidx), axis=1)
    run("v3 lane taa", k_lane, (tile, laneidx), (T, L), expect3)

    # v2b: sublane gather from a BIG slab (realistic size: 6272 rows)
    SB = 6272
    slab_b = jax.random.normal(key, (SB, L), jnp.float32)
    rowidx_b = jax.random.randint(jax.random.PRNGKey(4), (T * 8, L), 0, SB)
    def k_sub_b(slab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(slab_ref[:], idx_ref[:], axis=0)
    expect2b = np.take_along_axis(
        np.broadcast_to(np.asarray(slab_b)[:, :], (SB, L)),
        np.asarray(rowidx_b), axis=0)
    run("v2b big sublane taa", k_sub_b, (slab_b, rowidx_b), (T * 8, L),
        expect2b)

    # v1b: big flat gather
    flatidx_b = jax.random.randint(jax.random.PRNGKey(5), (T * 8, L), 0,
                                   SB * L)
    def k_flat_b(slab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(slab_ref[:].reshape(-1), idx_ref[:], axis=0)
    expect1b = np.asarray(slab_b).reshape(-1)[np.asarray(flatidx_b)]
    run("v1b big flat take", k_flat_b, (slab_b, flatidx_b), (T * 8, L),
        expect1b)


if __name__ == "__main__":
    main()
