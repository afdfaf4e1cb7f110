"""Bisect which construct of the warp kernel stalls the Mosaic compiler.

Runs progressively fuller kernel variants (same scaffolding: SMEM scalars,
ANY inputs, manual DMA, fori channel loop).  Env: WB_STAGE=1..5
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

from dg_tta_tpu.ops.experimental.warp_pallas_staged import (
    _decisions, _own_fields, _stage_z, _stage_y, _stage_x_combine)

D, H = 8, 16
R = D * H
T = 2 * H
pyh = 4
py = 2
pz = 2
PAD = 200
S_rows = T + 2 * pyh + (2 * pz + 5) * H
ext_n = T + 2 * pyh
Cp = 2
STAGE = int(os.environ.get("WB_STAGE", "1"))


def kernel(bases_ref, zs_ref, ys_ref, xs_ref, src_ref, out_ref,
           cz, cy, cx, slab, sem):
    b = pl.program_id(0)
    i = pl.program_id(1)
    zb = bases_ref[0, 0]
    yb = bases_ref[0, 1]
    for ref, dst in ((zs_ref, cz), (ys_ref, cy), (xs_ref, cx)):
        cp = pltpu.make_async_copy(ref.at[b, pl.ds(i * T, ext_n), :], dst,
                                   sem)
        cp.start()
        cp.wait()
    if STAGE == 1:
        def body(c, carry):
            out_ref[0, pl.ds(c, 1)] = (cz[pyh:pyh + T, :]
                                       + cy[pyh:pyh + T, :])[None]
            return carry
        jax.lax.fori_loop(0, Cp, body, 0)
        return

    R0 = i * T - pyh
    zo, yo = _own_fields(R0, ext_n, H)
    dec = _decisions(cz[:], cy[:], cx[:], zo, yo, zb, yb, D, H, pz, py,
                     "zeros")
    if STAGE == 2:
        def body(c, carry):
            out_ref[0, pl.ds(c, 1)] = (
                dec["Zoff"].astype(jnp.float32)[pyh:pyh + T]
                + dec["wz"][0][pyh:pyh + T])[None]
            return carry
        jax.lax.fori_loop(0, Cp, body, 0)
        return

    row0 = i * T - pyh - (pz + 2) * H + PAD + zb * H + yb

    def mid(f):
        return jax.lax.slice_in_dim(f, pyh, pyh + T, axis=0)

    dec_mid = dict(Zoff=mid(dec["Zoff"]), Yoff=mid(dec["Yoff"]),
                   xidx=[mid(x) for x in dec["xidx"]],
                   wz=[mid(w) for w in dec["wz"]],
                   wy=[mid(w) for w in dec["wy"]],
                   wx=[mid(w) for w in dec["wx"]])

    def body(c, carry):
        cp = pltpu.make_async_copy(
            src_ref.at[b, c, pl.ds(row0, S_rows), :], slab, sem)
        cp.start()
        cp.wait()

        def slab_at(dz):
            s = (pz + 2) * H + dz * H
            return slab[s:s + ext_n, :]

        if STAGE == 3:
            out_ref[0, pl.ds(c, 1)] = slab_at(0)[pyh:pyh + T][None]
            return carry
        A = _stage_z(slab_at, dec["Zoff"], pz, H)
        if STAGE == 4:
            out_ref[0, pl.ds(c, 1)] = mid(A[0])[None]
            return carry
        Bf = _stage_y(A, dec["Zoff"], dec["Yoff"], py, pyh, T)
        if STAGE == 5:
            out_ref[0, pl.ds(c, 1)] = Bf[(0, 0)][None]
            return carry
        res = _stage_x_combine(Bf, dec_mid, False)
        out_ref[0, pl.ds(c, 1)] = res[None]
        return carry

    jax.lax.fori_loop(0, Cp, body, 0)


def main():
    B = 1
    n_slab = D // 2
    bases = jnp.zeros((B, 2), jnp.int32)
    zs = jnp.zeros((B, R + 2 * pyh, 128), jnp.float32)
    ys = jnp.zeros((B, R + 2 * pyh, 128), jnp.float32)
    xs = jnp.zeros((B, R + 2 * pyh, 128), jnp.float32)
    src = jnp.zeros((B, Cp, R + 2 * PAD, 128), jnp.float32)
    t0 = time.perf_counter()
    out = pl.pallas_call(
        kernel,
        grid=(B, n_slab),
        in_specs=[
            pl.BlockSpec((1, 2), lambda b, i: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, Cp, T, 128), lambda b, i: (b, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Cp, R, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ext_n, 128), jnp.float32),
            pltpu.VMEM((ext_n, 128), jnp.float32),
            pltpu.VMEM((ext_n, 128), jnp.float32),
            pltpu.VMEM((S_rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(bases, zs, ys, xs, src)
    np.asarray(out)
    print(f"STAGE {STAGE}: ok {time.perf_counter()-t0:.1f} s", flush=True)


if __name__ == "__main__":
    main()
