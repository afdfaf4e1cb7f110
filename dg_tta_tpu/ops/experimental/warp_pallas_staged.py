"""EXPERIMENTAL Pallas-TPU staged trilinear warp — NEVER ran on the target.

QUARANTINED (round 4): on this TPU stack the compiled kernel FAULTS the
remote TPU worker even with the compute stages disabled
(DGTTA_PALLAS_STAGE_LIMIT=0 — the manual make_async_copy / ANY-memspace DMA
plumbing alone crashes the worker, PERF.md round 3), and a faulted worker
stays down for hours.  It is correct in CPU interpret mode
(tests/test_warp_pallas.py) and documents the staged-gather algorithm, but
it is NOT a production warp backend: the production paths are the MXU shear
resampler (ops/warp_shear.py) and the XLA gather warp (core/grid.py).
Selecting it requires the explicit opt-in DGTTA_WARP_IMPL=pallas, which
routes here via ops/warp_pallas.warp_flat_auto with a RuntimeWarning.

Original design notes follow.

Replaces `core.grid.grid_sample_flat` for the TTA hot path.  XLA-TPU's
dynamic-gather emitters collapse to a ~400x serial path for any multi-channel
warp or any program with >2 warps (PERF.md "gather cliff", measured r2), which
made the fused TTA epoch ~75% gather time.  Mosaic exposes no row-direction
hardware gather on v5e (sublane `take_along_axis` crashes the compiler —
tools/probe_pallas_gather*.py), so this kernel re-expresses the trilinear
8-corner gather with the primitives that ARE fast (measured cycles per
(8,128) tile: lane shuffle 44, static row slice 6, select/fma 2):

  stage Z  one-hot scan over bounded z-offset candidates -> 6 variant fields
           A_e = value at z-corner offset e in {-2..3} from the element's
           own z (flat-row arithmetic, so H-boundary wraps are harmless)
  stage Y  one-hot scan over y-row candidates with +-1 drift-corrected picks
           of A -> 16 fields B[(ez, ey)], ez, ey in {-1..2}
  stage X  per-element 128-lane shuffles of the B fields at the two x-corner
           lanes, +-1 drift-corrected 2D pick -> 8 exact corner values
  combine  trilinear weights (+ zeros-mode bounds masks), f32 accumulation

"Drift" is the +-1 change of a floor() decision when a stage consumes a
field at a shifted row/lane: the variant fields carry every reachable
decision and the consumer picks the exact one (valid while
|d(coord)/d(axis)| * max_shift < 2, which the TTA augmentation families
satisfy by construction — fields.py strength/factor defaults).

Channel packing: two bf16 channels ride one f32 lane through every stage
(the stages are pure data movement — slices, selects, shuffles), halving
data cost for bf16 models; weights/accumulation stay f32 per channel.

Scope (asserted; callers fall back to the XLA path otherwise): W == 128,
endomorphic warp (output grid spatial == source spatial), trilinear,
zeros|border padding — exactly the TTA branch warps (tta/engine.py).

Exactness: matches `grid_sample_flat` wherever (a) the per-sample residual
offsets (after subtracting the per-sample mean integer shift zb/yb) stay
within the static candidate windows (pz, py voxels), and (b) every drift
stays within +-1, including across the x-shuffle distance:
|d(z,y)_src/dx| * |x_src - x| < 2 (x has no base absorption — an x
translation beyond ~20 voxels combined with a 0.05 cross-slope would clip
the drift pick).  Beyond either bound a corner snaps to the nearest
reachable voxel — a bounded-error tail event for >~3-sigma affine draws
(tests pin exactness on the reference distributions).

Reference for semantics: torch F.grid_sample via /root/reference/dg_tta/tta/
torch_utils.py:55-73 and the warps at tta.py:549-575.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dg_tta_tpu.core.grid import _unnormalize, unpack_grid

# variant ranges (module docstring): EZ covers corner {0,1} +- drift from the
# y-stage AND x-stage consumers; E4 covers corner {0,1} +- one drift
_EZ = (-2, -1, 0, 1, 2, 3)
_E4 = (-1, 0, 1, 2)
# global integer translation absorbed per sample into the slab offset
GZ_MAX = 24
GY_MAX = 24


def _decisions(zs, ys, xs, zo, yo, zb, yb, D, H, pz, py, padding_mode):
    """Shared per-element decision/weight fields (channel-independent).

    zs/ys/xs: (rows, 128) f32 ABSOLUTE unnormalized source coordinates.
    zo/yo: int32 own z/y fields; zb/yb: per-sample integer bases (scalars).
    """
    W = 128
    if padding_mode == "border":
        zs = jnp.clip(zs, 0.0, D - 1.0)
        ys = jnp.clip(ys, 0.0, H - 1.0)
        xs = jnp.clip(xs, 0.0, W - 1.0)
    Zc = jnp.floor(zs)
    Yc = jnp.floor(ys)
    Xc = jnp.floor(xs)
    fz = (zs - Zc).astype(jnp.float32)
    fy = (ys - Yc).astype(jnp.float32)
    fx = (xs - Xc).astype(jnp.float32)
    Zci = Zc.astype(jnp.int32)
    Yci = Yc.astype(jnp.int32)
    Xci = Xc.astype(jnp.int32)
    Zoff = jnp.clip(Zci - zo - zb, -pz, pz)
    Yoff = jnp.clip(Yci - yo - yb, -py, py)
    if padding_mode == "zeros":
        fmz = [((Zci + k >= 0) & (Zci + k <= D - 1)).astype(jnp.float32)
               for k in (0, 1)]
        fmy = [((Yci + k >= 0) & (Yci + k <= H - 1)).astype(jnp.float32)
               for k in (0, 1)]
        fmx = [((Xci + k >= 0) & (Xci + k <= W - 1)).astype(jnp.float32)
               for k in (0, 1)]
        wz = [(1.0 - fz) * fmz[0], fz * fmz[1]]
        wy = [(1.0 - fy) * fmy[0], fy * fmy[1]]
        wx = [(1.0 - fx) * fmx[0], fx * fmx[1]]
    else:
        wz = [1.0 - fz, fz]
        wy = [1.0 - fy, fy]
        wx = [1.0 - fx, fx]
    xidx = [jnp.clip(Xci + k, 0, W - 1) for k in (0, 1)]
    return dict(Zoff=Zoff, Yoff=Yoff, xidx=xidx, wz=wz, wy=wy, wx=wx)


def _stage_z(slab_at, Zoff_ext, pz, H):
    """A_e[p] = slab row (p + (zb + Zoff(p) + e) * H), for e in _EZ.

    slab_at(r): the slab rows shifted by (zb + r//H ... ) — concretely a
    static row-slice helper provided by the caller: slab_at(dz) returns the
    extended-row range shifted by dz * H rows (zb/yb pre-baked in its base).
    """
    A = {e: None for e in _EZ}
    for d in range(-pz - 2, pz + 4):
        sh = None
        for e in _EZ:
            want = d - e
            if want < -pz or want > pz:
                continue
            if sh is None:
                sh = slab_at(d)
            cond = Zoff_ext == want
            A[e] = (jnp.where(cond, sh, A[e]) if A[e] is not None
                    else jnp.where(cond, sh, jnp.zeros_like(sh)))
    return A


def _stage_y(A, Zoff_ext, Yoff_ext, py, pyh, T):
    """B[(ez, ey)] = value at (z-corner ez, y-corner ey) on the T out rows.

    Extended fields index 0 == output row -pyh.  Consuming A at row shift d
    uses z-decisions made at the shifted row; the pick corrects them by
    dzy = Zoff(o) - Zoff(o+d) in {-1,0,1} (flat-row algebra, wrap-safe).
    """
    def mid(f, d=0):
        return jax.lax.slice_in_dim(f, pyh + d, pyh + d + T, axis=0)

    Zm = mid(Zoff_ext)
    Ym = mid(Yoff_ext)
    B = {}
    for d in range(-py - 1, py + 3):
        Zs = mid(Zoff_ext, d)
        dzy = Zm - Zs
        neg = dzy <= -1
        pos = dzy >= 1
        sh = {e: mid(A[e], d) for e in _EZ}  # one slice per variant field
        picked = {}
        for ez in _E4:
            picked[ez] = jnp.where(neg, sh[ez - 1],
                                   jnp.where(pos, sh[ez + 1], sh[ez]))
        for ey in _E4:
            want = d - ey
            if want < -py or want > py:
                continue
            cond = Ym == want
            for ez in _E4:
                key = (ez, ey)
                prev = B.get(key)
                B[key] = (jnp.where(cond, picked[ez], prev)
                          if prev is not None
                          else jnp.where(cond, picked[ez],
                                         jnp.zeros_like(picked[ez])))
    return B


def _stage_x_combine(B, dec, pack):
    """Shuffle B at the two x-corner lanes, 2D drift pick, weight, sum."""
    Zm, Ym = dec["Zoff"], dec["Yoff"]
    out_hi = out_lo = out = None
    for kx in (0, 1):
        idx = dec["xidx"][kx]
        Z_at = jnp.take_along_axis(Zm, idx, axis=1)
        Y_at = jnp.take_along_axis(Ym, idx, axis=1)
        zneg, zpos = (Zm - Z_at) <= -1, (Zm - Z_at) >= 1
        yneg, ypos = (Ym - Y_at) <= -1, (Ym - Y_at) >= 1
        sh = {k: jnp.take_along_axis(v, idx, axis=1) for k, v in B.items()}
        for kz in (0, 1):
            for ky in (0, 1):
                def pick(dz, kz=kz, ky=ky):
                    return jnp.where(
                        yneg, sh[(kz + dz, ky - 1)],
                        jnp.where(ypos, sh[(kz + dz, ky + 1)],
                                  sh[(kz + dz, ky)]))
                v = jnp.where(zneg, pick(-1),
                              jnp.where(zpos, pick(1), pick(0)))
                w = (dec["wz"][kz] * dec["wy"][ky]
                     * dec["wx"][kx]).astype(jnp.float32)
                if pack:
                    u = jax.lax.bitcast_convert_type(v, jnp.uint32)
                    hi_f = jax.lax.bitcast_convert_type(
                        u & jnp.uint32(0xFFFF0000), jnp.float32)
                    lo_f = jax.lax.bitcast_convert_type(
                        u << jnp.uint32(16), jnp.float32)
                    out_hi = (hi_f * w if out_hi is None
                              else out_hi + hi_f * w)
                    out_lo = (lo_f * w if out_lo is None
                              else out_lo + lo_f * w)
                else:
                    term = v.astype(jnp.float32) * w
                    out = term if out is None else out + term
    if pack:
        hi_u = jax.lax.bitcast_convert_type(
            out_hi.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        lo_u = jax.lax.bitcast_convert_type(
            out_lo.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        return jax.lax.bitcast_convert_type(
            (hi_u << jnp.uint32(16)) | lo_u, jnp.float32)
    return out


def _own_fields(R0, n, H):
    """(zo, yo) int32 fields for absolute output rows [R0, R0+n) x 128."""
    rows = R0 + jax.lax.broadcasted_iota(jnp.int32, (n, 128), 0)
    return rows // H, rows % H


def _global_bases(zs, ys, D, H):
    """Per-sample integer translation (B,) int32, clipped to the pad."""
    zb = jnp.clip(jnp.round(
        jnp.mean(zs, axis=(1, 2)) - (D - 1) / 2.0), -GZ_MAX, GZ_MAX)
    yb = jnp.clip(jnp.round(
        jnp.mean(ys, axis=(1, 2)) - (H - 1) / 2.0), -GY_MAX, GY_MAX)
    return zb.astype(jnp.int32), yb.astype(jnp.int32)


def _make_kernel(D, H, T, pyh, pz, py, S_rows, PAD, Cp, Rc, Rp,
                 padding_mode, pack, out_dtype, stage_limit=4):
    """Kernel with the most conservative Mosaic scaffolding available:
    channels are a GRID dimension (innermost, so coords/decisions for a slab
    are recomputed per channel — ~10% extra VPU for no in-kernel loop and no
    dynamic stores), the coord/src inputs are 2D flat-row refs in ANY memory
    (a single dynamic-start row-slice DMA each), and the output block store
    is fully static.  An earlier in-kernel channel fori_loop with a
    dynamic-index output store faulted the TPU worker (see PERF.md)."""
    ext_n = T + 2 * pyh
    slab_lo = (pz + 2) * H  # slab row of ext-row -pyh at dz == 0

    def kernel(bases_ref, zs_ref, ys_ref, xs_ref, src_ref, out_ref,
               cz, cy, cx, slab, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)
        c = pl.program_id(2)
        zb = bases_ref[0, 0]
        yb = bases_ref[0, 1]

        # coords for the extended tile (pre-padded by pyh rows on the host);
        # refs are 2D (B*Rc, 128): one dynamic row-slice each
        for ref, dst in ((zs_ref, cz), (ys_ref, cy), (xs_ref, cx)):
            cp = pltpu.make_async_copy(
                ref.at[pl.ds(b * Rc + i * T, ext_n), :], dst, sem)
            cp.start()
            cp.wait()

        row0 = ((b * Cp + c) * Rp
                + i * T - pyh - (pz + 2) * H + PAD + zb * H + yb)
        cp = pltpu.make_async_copy(
            src_ref.at[pl.ds(row0, S_rows), :], slab, sem)
        cp.start()

        R0 = i * T - pyh
        zo, yo = _own_fields(R0, ext_n, H)
        dec = _decisions(cz[:], cy[:], cx[:], zo, yo, zb, yb,
                         D, H, pz, py, padding_mode)
        Zoff_ext = dec["Zoff"]
        Yoff_ext = dec["Yoff"]

        def mid(f):
            return jax.lax.slice_in_dim(f, pyh, pyh + T, axis=0)

        dec_mid = dict(
            Zoff=mid(Zoff_ext), Yoff=mid(Yoff_ext),
            xidx=[mid(x) for x in dec["xidx"]],
            wz=[mid(w) for w in dec["wz"]],
            wy=[mid(w) for w in dec["wy"]],
            wx=[mid(w) for w in dec["wx"]])

        cp.wait()

        def slab_at(dz):
            s = slab_lo + dz * H
            return slab[s:s + ext_n, :]

        # stage_limit: worker-fault bisect knob (DGTTA_PALLAS_STAGE_LIMIT):
        # 0 = DMA plumbing only, 1 = +decisions, 2 = +stage Z, 3 = +stage Y,
        # 4 = full kernel.  Partial stages write a placeholder result.
        if stage_limit == 0:
            out_ref[0, 0] = slab_at(0)[pyh:pyh + T, :].astype(out_dtype)
            return
        if stage_limit == 1:
            out_ref[0, 0] = (dec_mid["wz"][0]
                             + dec_mid["Zoff"].astype(jnp.float32)
                             ).astype(out_dtype)
            return
        A = _stage_z(slab_at, Zoff_ext, pz, H)
        if stage_limit == 2:
            out_ref[0, 0] = jax.lax.slice_in_dim(
                A[0], pyh, pyh + T, axis=0).astype(out_dtype)
            return
        Bf = _stage_y(A, Zoff_ext, Yoff_ext, py, pyh, T)
        if stage_limit == 3:
            out_ref[0, 0] = Bf[(0, 0)].astype(out_dtype)
            return
        res = _stage_x_combine(Bf, dec_mid, pack)
        out_ref[0, 0] = res.astype(out_dtype)

    return kernel


def _pack_bf16_pairs(flat):
    """(B, C, N) bf16 -> (B, ceil(C/2), N) f32 words (c0 in high bits)."""
    B, C, N = flat.shape
    if C % 2:
        flat = jnp.concatenate(
            [flat, jnp.zeros((B, 1, N), flat.dtype)], axis=1)
        C += 1
    u16 = jax.lax.bitcast_convert_type(
        flat.reshape(B, C // 2, 2, N), jnp.uint16).astype(jnp.uint32)
    word = (u16[:, :, 0] << jnp.uint32(16)) | u16[:, :, 1]
    return jax.lax.bitcast_convert_type(word, jnp.float32)


def _unpack_bf16_pairs(packed, C):
    """(B, Cp, N) f32 words -> (B, C, N) bf16."""
    word = jax.lax.bitcast_convert_type(packed, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(
        (word >> jnp.uint32(16)).astype(jnp.uint16), jnp.bfloat16)
    lo = jax.lax.bitcast_convert_type(
        (word & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.bfloat16)
    out = jnp.stack([hi, lo], axis=2).reshape(
        packed.shape[0], -1, packed.shape[-1])
    return out[:, :C]


def pallas_warp_supported(flat_shape, src_spatial, out_spatial,
                          mode="trilinear"):
    D, H, W = src_spatial
    return (mode == "trilinear" and W == 128
            and tuple(out_spatial) == tuple(src_spatial)
            and (D * H) % 2 == 0)


@functools.partial(jax.jit, static_argnames=(
    "src_spatial", "padding_mode", "align_corners", "pz", "py",
    "interpret"))
def grid_sample_flat_pallas(flat, grid, src_spatial, padding_mode="zeros",
                            align_corners=False, pz=9, py=8,
                            interpret=False):
    """Drop-in for `grid_sample_flat` on supported shapes (see module doc).

    flat: (B, C, N); grid: (x, y, z) tuple of (B, D, H, W) normalized
    coords.  Returns (B, C, N) in flat.dtype.
    """
    B, C, N = flat.shape
    D, H, W = src_spatial
    assert W == 128 and N == D * H * W, (flat.shape, src_spatial)
    R = N // 128
    gx, gy, gz = unpack_grid(grid)
    assert gx.shape[1:] == (D, H, W), "endomorphic warps only"
    xs = _unnormalize(gx, W, align_corners).reshape(B, R, 128)
    ys = _unnormalize(gy, H, align_corners).reshape(B, R, 128)
    zs = _unnormalize(gz, D, align_corners).reshape(B, R, 128)
    zs = zs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)
    xs = xs.astype(jnp.float32)
    zb, yb = _global_bases(zs, ys, D, H)
    bases = jnp.stack([zb, yb], axis=1)  # (B, 2) int32

    pyh = py + 2
    PAD = (GZ_MAX + pz + 3) * H + GY_MAX + pyh + py + 3

    pack = flat.dtype == jnp.bfloat16
    if pack:
        src = _pack_bf16_pairs(flat)
        kdtype = jnp.float32
    else:
        src = flat.astype(jnp.float32)
        kdtype = jnp.float32
    Cp = src.shape[1]
    # src as FLAT 2D rows: (B*Cp*Rp, 128), Rp = R + 2*PAD per channel plane
    src = src.reshape(B, Cp, R, 128)
    src = jnp.pad(src, ((0, 0), (0, 0), (PAD, PAD), (0, 0)))
    Rp = R + 2 * PAD
    src = src.reshape(B * Cp * Rp, 128)

    # pick the largest tile (in z-slices) <= 4 that divides D
    tz = 1
    for cand in (4, 3, 2):
        if D % cand == 0:
            tz = cand
            break
    T = tz * H
    n_slab = D // tz
    S_rows = T + 2 * pyh + (2 * pz + 5) * H

    Rc = R + 2 * pyh

    def padc(c):
        return jnp.pad(c, ((0, 0), (pyh, pyh), (0, 0)),
                       mode="edge").reshape(B * Rc, 128)

    import os
    stage_limit = int(os.environ.get("DGTTA_PALLAS_STAGE_LIMIT", "4"))
    kern = _make_kernel(D, H, T, pyh, pz, py, S_rows, PAD, Cp, Rc, Rp,
                        padding_mode, pack, kdtype, stage_limit=stage_limit)
    out = pl.pallas_call(
        kern,
        grid=(B, n_slab, Cp),
        in_specs=[
            pl.BlockSpec((1, 2), lambda b, i, c: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, T, 128),
                               lambda b, i, c: (b, c, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Cp, R, 128), kdtype),
        scratch_shapes=[
            pltpu.VMEM((T + 2 * pyh, 128), jnp.float32),
            pltpu.VMEM((T + 2 * pyh, 128), jnp.float32),
            pltpu.VMEM((T + 2 * pyh, 128), jnp.float32),
            pltpu.VMEM((S_rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(bases, padc(zs), padc(ys), padc(xs), src)

    out = out.reshape(B, Cp, N)
    if pack:
        return _unpack_bf16_pairs(out, C)
    return out.astype(flat.dtype)


def staged_warp_reference(flat, src_spatial, grid, padding_mode="zeros",
                          align_corners=False, pz=9, py=8):
    """Pure-JAX (CPU-runnable) reference of the staged algorithm.

    Runs the kernel's exact stage helpers on the whole volume at once; tests
    validate it against `grid_sample_flat`, and the Pallas kernel against it
    in interpret mode — same code, three execution contexts.
    """
    B, C, N = flat.shape
    D, H, W = src_spatial
    assert W == 128 and N == D * H * W
    R = N // 128
    gx, gy, gz = unpack_grid(grid)
    assert gx.shape[1:] == (D, H, W), "endomorphic warps only"
    xs = _unnormalize(gx, W, align_corners).reshape(B, R, 128)
    ys = _unnormalize(gy, H, align_corners).reshape(B, R, 128)
    zs = _unnormalize(gz, D, align_corners).reshape(B, R, 128)
    zb, yb = _global_bases(zs, ys, D, H)

    pyh = py + 2
    pad = (GZ_MAX + pz + 3) * H + GY_MAX + pyh + py + 3

    zo, yo = _own_fields(0, R, H)
    outs = []
    for b in range(B):
        dec = _decisions(zs[b], ys[b], xs[b], zo, yo, zb[b], yb[b],
                         D, H, pz, py, padding_mode)
        Zoff_ext = jnp.pad(dec["Zoff"], ((pyh, pyh), (0, 0)), mode="edge")
        Yoff_ext = jnp.pad(dec["Yoff"], ((pyh, pyh), (0, 0)), mode="edge")
        base_rows = zb[b] * H + yb[b]
        chans = []
        for c in range(C):
            vol = flat[b, c].reshape(R, 128).astype(jnp.float32)
            padded = jnp.pad(vol, ((pad, pad), (0, 0)))

            def slab_at(dz, padded=padded, base_rows=base_rows):
                start = pad - pyh + base_rows + dz * H
                return jax.lax.dynamic_slice_in_dim(
                    padded, start, R + 2 * pyh, axis=0)

            A = _stage_z(slab_at, Zoff_ext, pz, H)
            Bf = _stage_y(A, Zoff_ext, Yoff_ext, py, pyh, R)
            res = _stage_x_combine(Bf, dec, pack=False)
            chans.append(res.reshape(-1))
        outs.append(jnp.stack(chans))
    return jnp.stack(outs).astype(flat.dtype)
