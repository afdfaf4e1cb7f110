"""MXU forms of the DA stack's resample stages (train/augment.py).

The on-chip pretrain bench (PERF.md r5c, tools/probe_pretrain.py) measured
the on-device DA stack at 0.673 s/iter = 67% of the TS104 train step.  Its
three resample stages run through layouts this stack is known to hate
(CLAUDE.md gather notes): the spatial affine warp and the low-res
simulation call channels-last C=1 `grid_sample` (the pathological
small-lane gather layout), and the blur materializes 9 shifted windows per
axis on the VPU.  This module re-expresses all three as dense matmuls:

* ``affine_warp_tpu`` — the 3-pass shear factorization of the affine map
  (ops/warp_shear.py docstring; Catmull–Smith multi-pass resampling) with
  the DENSE one-hot-matrix einsum per pass.  The DA family (rotation up to
  ~30 deg, scale 0.7-1.4, nnUNet defaults) puts taps far off-diagonal, so
  the banded form's fallback would fire anyway — the dense (B,D,H,W,S)
  matrix is ~0.4 GB bf16 per pass and the three einsums are ~2 TFLOP of
  MXU work: milliseconds, built from iota compares and dot_generals only.
  ``mode="nearest"`` (the seg warp) uses a single-tap round matrix; the
  factorized rounding can differ from joint-nearest by one voxel near
  tie boundaries (tested agreement contract on blocky labels), which is
  immaterial for a random augmentation as long as img and seg share the
  SAME pass geometry — they do (same (A, b), same pass fields).
* ``lowres_sim_tpu`` — the low-res simulation's sampling map is SEPARABLE
  per axis (each center coordinate depends only on its own base
  coordinate, train/augment._lowres_sim), so three per-axis two-tap
  matrices (B, S, S) reproduce the joint trilinear sample EXACTLY
  (tensor-product identity) at a fraction of the traffic.
* ``gaussian_blur_tpu`` — the separable Gaussian as per-axis banded
  (S, S) matrices with edge-padding semantics folded into the border
  rows: identical math to train/augment._blur_1d, on the MXU.

Reference semantics unchanged: nnUNet v2.2.1 get_training_transforms
(SURVEY §2.2); the stock XLA forms remain the non-TPU default and the
oracle for the parity tests (tests/test_augment_tpu.py).
"""

import jax
import jax.numpy as jnp

from dg_tta_tpu.ops.warp_shear import (affine_vox_map, shear_pass_coeffs,
                                       _pass_field, _resample_axis)


def _nearest_matrix(field, size, padding_mode, m_dtype):
    """Single-tap nearest matrix for one axis: rows (s == round(c)).

    zeros mode: out-of-range rounds never match the iota, so the row is
    zero (torch zeros semantics); border clamps the coordinate first.
    round-half-up matches core/grid.py's nearest (jnp.round there —
    half-to-even — differs only on exact .5 ties of f32 coords, which the
    continuous DA family never produces; we keep floor(c + 0.5) for the
    cheaper lowering).
    """
    if padding_mode == "border":
        field = jnp.clip(field, 0.0, size - 1.0)
    else:
        field = jnp.clip(field, -2.0, float(size) + 1.0)
    idx = jnp.floor(field + 0.5).astype(jnp.int32)
    s = jax.lax.broadcasted_iota(jnp.int32, (size,), 0)
    return (s == idx[..., None]).astype(m_dtype)


def _resample_axis_nearest(vals, field, axis, padding_mode, m_dtype):
    """Nearest-neighbor resample of (B, C, D, H, W) along `axis` at
    per-element coordinates `field` (B, D, H, W) via a one-hot matmul."""
    size = vals.shape[axis]
    M = _nearest_matrix(field, size, padding_mode, m_dtype)
    acc = jnp.float32
    if axis == 4:
        out = jnp.einsum("bczys,bzyxs->bczyx", vals, M,
                         preferred_element_type=acc)
    elif axis == 3:
        out = jnp.einsum("bczsx,bzyxs->bczyx", vals, M,
                         preferred_element_type=acc)
    else:
        out = jnp.einsum("bcsyx,bzyxs->bczyx", vals, M,
                         preferred_element_type=acc)
    return out.astype(vals.dtype)


def affine_warp_tpu(x, theta, mode="trilinear", padding_mode="border",
                    m_dtype_name="bfloat16"):
    """Warp (B, D, H, W, C) by torch-style theta (B, 3, 4), dense 3-pass.

    Drop-in for grid_sample(x, affine_grid(theta, spatial)) up to the
    multi-pass kernel contract (module docstring).  align_corners=False,
    matching train/augment.augment_sample.
    """
    B, D, H, W, C = x.shape
    spatial = (D, H, W)
    m_dtype = jnp.dtype(m_dtype_name) if m_dtype_name else x.dtype
    A, b = affine_vox_map(jax.lax.stop_gradient(jnp.asarray(theta)),
                          spatial, align_corners=False)
    (cz, bz), (cy, by), (cx, bx) = shear_pass_coeffs(A, b)
    vol = jnp.moveaxis(x, -1, 1)  # (B, C, D, H, W)
    res = (_resample_axis_nearest if mode == "nearest" else _resample_axis)
    vol = res(vol, _pass_field(cx, bx, spatial), 4, padding_mode, m_dtype)
    vol = res(vol, _pass_field(cy, by, spatial), 3, padding_mode, m_dtype)
    vol = res(vol, _pass_field(cz, bz, spatial), 2, padding_mode, m_dtype)
    return jnp.moveaxis(vol, 1, -1)


def _apply_axis_matrix(vol, M, axis):
    """vol (B, C, D, H, W) x M (B, out, in) along `axis` (2, 3, or 4)."""
    acc = jnp.float32
    if axis == 4:
        out = jnp.einsum("bczys,bxs->bczyx", vol, M,
                         preferred_element_type=acc)
    elif axis == 3:
        out = jnp.einsum("bczsx,bys->bczyx", vol, M,
                         preferred_element_type=acc)
    else:
        out = jnp.einsum("bcsyx,bzs->bczyx", vol, M,
                         preferred_element_type=acc)
    return out.astype(vol.dtype)


def _lerp_matrix_1d(field, size, m_dtype):
    """Two-tap border-clamped lerp matrix (B, out, size) from per-axis
    coordinates field (B, out) — the 1-D slice of warp_shear's
    _onehot_lerp_matrix (border mode, the low-res sim's padding)."""
    field = jnp.clip(field, 0.0, size - 1.0)
    fc = jnp.floor(field)
    f = (field - fc).astype(m_dtype)
    fci = fc.astype(jnp.int32)
    s = jax.lax.broadcasted_iota(jnp.int32, (size,), 0)
    lo = (s == fci[..., None]).astype(m_dtype)
    hi = (s == (fci + 1)[..., None]).astype(m_dtype)
    return lo * (1.0 - f)[..., None] + hi * f[..., None]


def lowres_sim_tpu(x, zoom, m_dtype_name=None):
    """EXACT per-axis matrix form of train/augment._lowres_sim.

    x: (B, D, H, W, C); zoom: (B, 3) per-axis factors in (D, H, W) order.
    The stock form samples jointly-trilinear at separable per-axis
    nearest-quantized low-res centers; a separable sampling map's joint
    trilinear interpolation IS the tensor product of the per-axis linear
    interpolations, so three (B, S, S) matrices reproduce it exactly
    (border padding is a no-op here — centers live inside [0, S-1]).
    """
    B, D, H, W, C = x.shape
    m_dtype = jnp.dtype(m_dtype_name) if m_dtype_name else x.dtype
    vol = jnp.moveaxis(x, -1, 1)
    for axis, size in ((2, D), (3, H), (4, W)):
        zm = zoom[:, axis - 2]  # (B,)
        low = jnp.maximum(jnp.round(size * zm), 1.0)[:, None]
        o = jax.lax.broadcasted_iota(jnp.float32, (1, size), 1)
        # normalized center of output voxel o (align_corners=False), then
        # the nearest low-res lattice site, back to source voxel coords —
        # the same quantization as _lowres_sim
        c = (2.0 * o + 1.0) / size - 1.0
        u = jnp.round((c + 1.0) * 0.5 * low - 0.5)
        cn = (2.0 * u + 1.0) / low - 1.0
        src = ((cn + 1.0) * size - 1.0) * 0.5
        vol = _apply_axis_matrix(vol, _lerp_matrix_1d(src, size, m_dtype),
                                 axis)
    return jnp.moveaxis(vol, 1, -1)


def gaussian_blur_tpu(x, sigma, radius: int = 4, m_dtype_name=None):
    """Separable Gaussian blur as per-axis banded matrices on the MXU.

    x: (B, D, H, W, C); sigma: (B,).  Identical math to
    train/augment._blur_1d (static radius-4 support, edge padding — the
    out-of-range taps of a border row accumulate onto the clamped edge
    element), batched over per-sample sigmas.
    """
    B, D, H, W, C = x.shape
    m_dtype = jnp.dtype(m_dtype_name) if m_dtype_name else x.dtype
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (offs[None] /
                        jnp.maximum(sigma[:, None], 1e-6)) ** 2)
    k = (k / jnp.sum(k, axis=-1, keepdims=True)).astype(m_dtype)  # (B, 2r+1)
    vol = jnp.moveaxis(x, -1, 1)
    for axis, size in ((2, D), (3, H), (4, W)):
        o = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
        s = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
        M = jnp.zeros((B, size, size), m_dtype)
        for t in range(-radius, radius + 1):
            tap = jnp.clip(o + t, 0, size - 1)
            M = M + k[:, t + radius, None, None] * (s == tap).astype(m_dtype)
        vol = _apply_axis_matrix(vol, M, axis)
    return jnp.moveaxis(vol, 1, -1)
