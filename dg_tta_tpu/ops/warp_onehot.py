"""Gather-free trilinear warp: the staged one-hot formulation in pure XLA.

Same algorithm as the Pallas staged-warp kernel (ops/warp_pallas.py module
docstring: z/y/x handled by bounded one-hot candidate scans with +-1
drift-corrected variant fields), but expressed entirely with static slices,
integer compares, and selects — no gather / take / dynamic-slice-per-element
op anywhere.  On this v5e stack that matters twice over (PERF.md):

  * XLA-TPU's fast dynamic-gather emitter abandons any program with a
    multi-channel warp, a bf16 operand, >2 warps, or a small-channel dot —
    i.e. every real TTA epoch program — and the slow emitter costs
    ~100-120 ms per 1.6M-point multi-channel warp (~75% of the epoch).
    The one-hot scan is plain VPU work: ~10-20x faster at TTA window sizes
    and immune to the emitter choice entirely.
  * The Mosaic route (warp_pallas.py) has faulted the TPU worker on this
    stack (hours-long outage per fault); this path has no custom kernel to
    mis-compile.

Cost model: O((2*pz + 2*py + 2*px) * C * N) select/slice VPU ops, so keep
the candidate windows tight: the per-sample integer translation is absorbed
OUTSIDE the scan windows by dynamic-slicing the padded source volume
(jax.lax.dynamic_slice is not a gather; the extraction path already relies
on it staying fast), and the windows only cover the RESIDUAL offsets of the
TTA augmentation families (rotation/scale/shear across the patch + the
deformable field; see tests/test_warp_onehot.py window-calibration test).

Exactness contract (same as the Pallas kernel): matches grid_sample_flat
wherever the residual offsets stay inside (pz, py, px) and every
cross-stage floor()-decision drift stays within +-1.  Outside those bounds
a corner snaps to the nearest reachable voxel — bounded local error at the
patch extremes.  Calibration at the full TS104 patch (112, 112, 128),
tools/calibrate_onehot_windows.py: the deformable family (factor 0.5,
interp 5) maxes at 14 vox; the affine family (strength 0.05) has worst-
CORNER deviation p50 ~ 7.7 / p99 ~ 16.5 / max 26 vox, so with the default
window 15 every deformable draw is exact and ~93% of affine draws are
exact everywhere, the rest snapping a handful of far-corner voxels of the
1.6M.  Override with DGTTA_ONEHOT_WINDOW=<int> (or per-call pz/py/px).

Differentiable: everything is slices/selects/FMAs, so jax.grad works and
the VJP is again gather-free (selects transpose to selects, slices to
pads).  The engine's approximate-adjoint custom_vjp wraps this unchanged.

Reference semantics: torch F.grid_sample as used by the TTA branch warps,
/root/reference/dg_tta/tta/torch_utils.py:55-73 and tta.py:549-575.
"""

import functools
import os

import jax
import jax.numpy as jnp

from dg_tta_tpu.core.grid import _unnormalize, unpack_grid

# z-corner variant offsets carried through stages Y and X (each consumer can
# drift the floor() decision by +-1): corners {0,1} +- 2 / +- 1
_EZ = (-2, -1, 0, 1, 2, 3)
_E4 = (-1, 0, 1, 2)

# max per-sample integer translation absorbed by the dynamic-slice base
# (beyond this the residual windows must cover it; pad cost only)
_GMAX = 24

# default candidate half-window (see module docstring calibration table)
_DEFAULT_WINDOW = int(os.environ.get("DGTTA_ONEHOT_WINDOW", "15"))


def onehot_warp_supported(src_spatial, out_spatial, mode="trilinear"):
    return (mode == "trilinear"
            and tuple(out_spatial) == tuple(src_spatial)
            and min(src_spatial) >= 4)


def _bases(cs, size):
    """Per-sample integer translation (B,) int32 from (B, D, H, W) coords."""
    b = jnp.round(jnp.mean(cs, axis=(1, 2, 3)) - (size - 1) / 2.0)
    return jnp.clip(b, -_GMAX, _GMAX).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=(
    "src_spatial", "padding_mode", "align_corners", "pz", "py", "px"))
def grid_sample_flat_onehot(flat, grid, src_spatial, padding_mode="zeros",
                            align_corners=False, pz=None, py=None, px=None):
    """Drop-in for `grid_sample_flat` on endomorphic trilinear warps.

    flat: (B, C, N) channels-first flat volume, N = prod(src_spatial).
    grid: (x, y, z) tuple of (B, D, H, W) normalized coords (same spatial
    as the source — the TTA branch warps are endomorphisms).
    Returns (B, C, N) in flat.dtype.
    """
    if pz is None:
        pz = _DEFAULT_WINDOW
    if py is None:
        py = _DEFAULT_WINDOW
    if px is None:
        px = _DEFAULT_WINDOW
    B, C, N = flat.shape
    D, H, W = src_spatial
    assert N == D * H * W, (flat.shape, src_spatial)
    gx, gy, gz = unpack_grid(grid)
    assert gx.shape[1:] == (D, H, W), "endomorphic warps only"

    f32 = jnp.float32
    xs = _unnormalize(gx, W, align_corners).astype(f32)
    ys = _unnormalize(gy, H, align_corners).astype(f32)
    zs = _unnormalize(gz, D, align_corners).astype(f32)
    if padding_mode == "border":
        zs = jnp.clip(zs, 0.0, D - 1.0)
        ys = jnp.clip(ys, 0.0, H - 1.0)
        xs = jnp.clip(xs, 0.0, W - 1.0)

    zb, yb, xb = _bases(zs, D), _bases(ys, H), _bases(xs, W)

    # ---- shifted source with halos: shifted[b, c, i, j, k] =
    #      src[b, c, i - hz + zb[b], j - ey + yb[b], k - ex + xb[b]] or pad.
    # Slicing out of the _GMAX-padded array keeps REAL data in the halo
    # wherever it exists; pad values appear exactly outside the volume.
    hz, ey, ex = pz + 3, py + 2, px + 2
    PZ, PY, PX = _GMAX + hz, _GMAX + ey, _GMAX + ex
    vol = flat.reshape(B, C, D, H, W)
    pad_mode = "edge" if padding_mode == "border" else "constant"
    padded = jnp.pad(vol, ((0, 0), (0, 0), (PZ, PZ), (PY, PY), (PX, PX)),
                     mode=pad_mode)
    sizes = (1, C, D + 2 * hz, H + 2 * ey, W + 2 * ex)
    shifted = jnp.concatenate([
        jax.lax.dynamic_slice(
            padded, (b, 0, PZ - hz + zb[b], PY - ey + yb[b],
                     PX - ex + xb[b]), sizes)
        for b in range(B)], axis=0)

    # ---- per-element decisions on the (y, x)-extended output domain
    zo = jax.lax.broadcasted_iota(jnp.int32, (D, 1, 1), 0)
    yo = jax.lax.broadcasted_iota(jnp.int32, (1, H, 1), 1)
    xo = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    Zci = jnp.floor(zs).astype(jnp.int32)
    Yci = jnp.floor(ys).astype(jnp.int32)
    Xci = jnp.floor(xs).astype(jnp.int32)
    Zoff = jnp.clip(Zci - zo[None] - zb[:, None, None, None], -pz, pz)
    Yoff = jnp.clip(Yci - yo[None] - yb[:, None, None, None], -py, py)
    Xoff = jnp.clip(Xci - xo[None] - xb[:, None, None, None], -px, px)

    def extend(f):
        return jnp.pad(f, ((0, 0), (ey, ey), (ex, ex)), mode="edge")

    Ze = jax.vmap(extend)(Zoff)[:, None]  # (B, 1, D, Hext, Wext)
    Ye = jax.vmap(extend)(Yoff)[:, None]
    Xe = jax.vmap(extend)(Xoff)[:, None]

    # ---- stage Z: A[e] = source at z-corner offset e from the element's
    # own z-decision, on the extended domain (one-hot scan over Zoff)
    def zslice(d):
        return jax.lax.slice_in_dim(shifted, hz + d, hz + d + D, axis=2)

    A = {e: None for e in _EZ}
    for d in range(-pz - 2, pz + 4):
        sh = None
        for e in _EZ:
            want = d - e
            if want < -pz or want > pz:
                continue
            if sh is None:
                sh = zslice(d)
            cond = Ze == want
            A[e] = (jnp.where(cond, sh, A[e]) if A[e] is not None
                    else jnp.where(cond, sh, jnp.zeros_like(sh)))

    # ---- stage Y: Bf[(ez, ey_)] = value at (z-corner ez, y-corner ey_) on
    # the x-extended domain; z-decisions made at the shifted row are
    # corrected by the +-1 drift dzy
    def midy(f, d=0):
        return jax.lax.slice_in_dim(f, ey + d, ey + d + H, axis=3)

    Zm = midy(Ze)
    Ym = midy(Ye)
    Bf = {}
    for d in range(-py - 1, py + 3):
        Zs = midy(Ze, d)
        dzy = Zm - Zs
        neg = dzy <= -1
        pos = dzy >= 1
        sh = {e: midy(A[e], d) for e in _EZ}
        picked = {ez: jnp.where(neg, sh[ez - 1],
                                jnp.where(pos, sh[ez + 1], sh[ez]))
                  for ez in _E4}
        for ey_ in _E4:
            want = d - ey_
            if want < -py or want > py:
                continue
            cond = Ym == want
            for ez in _E4:
                key = (ez, ey_)
                prev = Bf.get(key)
                Bf[key] = (jnp.where(cond, picked[ez], prev)
                           if prev is not None
                           else jnp.where(cond, picked[ez],
                                          jnp.zeros_like(picked[ez])))

    # ---- stage X: one-hot scan over Xoff with 2D (z, y) drift correction;
    # accumulate the 8 exact corner-value fields
    def midx(f, d=0):
        return jax.lax.slice_in_dim(f, ex + d, ex + d + W, axis=4)

    Zm2 = midx(Zm)
    Ym2 = midx(Ym)
    Xm2 = midx(midy(Xe))
    cx = {}
    for d in range(-px - 1, px + 3):
        needed = [kx for kx in (0, 1) if -px <= d - kx <= px]
        if not needed:
            continue
        Zsx = midx(Zm, d)
        Ysx = midx(Ym, d)
        zneg, zpos = (Zm2 - Zsx) <= -1, (Zm2 - Zsx) >= 1
        yneg, ypos = (Ym2 - Ysx) <= -1, (Ym2 - Ysx) >= 1
        shB = {k: midx(Bf[k], d) for k in Bf}

        def pick(kz, ky):
            def py_(dz):
                return jnp.where(yneg, shB[(kz + dz, ky - 1)],
                                 jnp.where(ypos, shB[(kz + dz, ky + 1)],
                                           shB[(kz + dz, ky)]))
            return jnp.where(zneg, py_(-1), jnp.where(zpos, py_(1), py_(0)))

        vals = {(kz, ky): pick(kz, ky) for kz in (0, 1) for ky in (0, 1)}
        for kx in needed:
            cond = Xm2 == d - kx
            for kz in (0, 1):
                for ky in (0, 1):
                    key = (kx, kz, ky)
                    prev = cx.get(key)
                    cx[key] = (jnp.where(cond, vals[(kz, ky)], prev)
                               if prev is not None
                               else jnp.where(cond, vals[(kz, ky)],
                                              jnp.zeros_like(vals[(kz, ky)])))

    # ---- trilinear weights (+ zeros-mode bounds masks) and combination
    fz = (zs - Zci).astype(f32)
    fy = (ys - Yci).astype(f32)
    fx = (xs - Xci).astype(f32)
    if padding_mode == "zeros":
        def bmask(ci, k, size):
            return ((ci + k >= 0) & (ci + k <= size - 1)).astype(f32)
        wz = [(1.0 - fz) * bmask(Zci, 0, D), fz * bmask(Zci, 1, D)]
        wy = [(1.0 - fy) * bmask(Yci, 0, H), fy * bmask(Yci, 1, H)]
        wx = [(1.0 - fx) * bmask(Xci, 0, W), fx * bmask(Xci, 1, W)]
    else:
        wz = [1.0 - fz, fz]
        wy = [1.0 - fy, fy]
        wx = [1.0 - fx, fx]

    out = None
    for kx in (0, 1):
        for kz in (0, 1):
            for ky in (0, 1):
                w = (wz[kz] * wy[ky] * wx[kx])[:, None]
                term = cx[(kx, kz, ky)].astype(f32) * w
                out = term if out is None else out + term
    return out.reshape(B, C, N).astype(flat.dtype)
