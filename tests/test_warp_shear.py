"""Correctness of the MXU 3-pass shear warp (ops/warp_shear.py).

Exactness structure mirrors the module's fidelity contract:
  * pure translations and axis-aligned scales are EXACT vs grid_sample_flat
    (tested on white noise, both padding modes, incl. out-of-range regions);
  * the voxel-space affine map (affine_vox_map) must reproduce the
    unnormalized affine_grid coordinates exactly — this pins the torch
    grid conventions independent of the resampling filter;
  * maps with off-diagonal terms use a different (equally valid) multi-pass
    kernel, so they are compared on SMOOTH data where both filters
    approximate the continuous field to O(h^2) — white noise would show
    O(1) pointwise kernel differences by design, not by bug;
  * the warp is linear in the values and jax.grad must give the exact
    transposed-matmul adjoint (checked against the XLA path on an exact
    case, and via the dot-product adjoint identity on a general affine).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dg_tta_tpu.core.fields import get_rand_affine
from dg_tta_tpu.core.grid import (affine_grid, grid_sample_flat,
                                  unpack_grid, _unnormalize)
from dg_tta_tpu.ops.warp_shear import affine_vox_map, warp_affine_shear

DHW = (12, 14, 16)
N = int(np.prod(DHW))


def _theta(rows, batch=1):
    return jnp.tile(jnp.asarray(rows, jnp.float32)[None], (batch, 1, 1))


def translation_theta(shift_vox, dhw, batch=1):
    d, h, w = dhw
    sz, sy, sx = shift_vox
    return _theta([[1.0, 0, 0, 2.0 * sx / w],
                   [0, 1.0, 0, 2.0 * sy / h],
                   [0, 0, 1.0, 2.0 * sz / d]], batch)


def smooth_volume(B, C, dhw, seed=0):
    """Band-limited smooth test data: products of low-frequency harmonics."""
    D, H, W = dhw
    z = np.arange(D)[:, None, None] / D
    y = np.arange(H)[None, :, None] / H
    x = np.arange(W)[None, None, :] / W
    rng = np.random.default_rng(seed)
    vols = []
    for _ in range(B * C):
        a, b, c = rng.uniform(0.5, 1.5, 3)
        p, q, r = rng.uniform(0, 2 * np.pi, 3)
        vols.append(np.sin(2 * np.pi * a * z + p)
                    * np.cos(2 * np.pi * b * y + q)
                    * np.sin(2 * np.pi * c * x + r))
    return jnp.asarray(np.stack(vols).reshape(B, C, -1), jnp.float32)


def test_affine_vox_map_matches_affine_grid():
    theta, theta_inv = get_rand_affine(jax.random.PRNGKey(3), 2)
    for t in (theta, theta_inv):
        A, b = affine_vox_map(t, DHW, align_corners=False)
        gx, gy, gz = unpack_grid(affine_grid(t, DHW, align_corners=False))
        D, H, W = DHW
        zi = jax.lax.broadcasted_iota(jnp.float32, DHW, 0)
        yi = jax.lax.broadcasted_iota(jnp.float32, DHW, 1)
        xi = jax.lax.broadcasted_iota(jnp.float32, DHW, 2)
        for k, (g, size) in enumerate(((gz, D), (gy, H), (gx, W))):
            want = _unnormalize(g, size, False)
            got = (A[:, k, 0, None, None, None] * zi
                   + A[:, k, 1, None, None, None] * yi
                   + A[:, k, 2, None, None, None] * xi
                   + b[:, k, None, None, None])
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.parametrize("shift", [(0.0, 0.0, 0.0), (1.25, -2.5, 3.75),
                                   (-7.6, 5.1, -4.9)])
def test_translation_exact_on_noise(padding_mode, shift):
    B, C = 2, 3
    flat = jax.random.normal(jax.random.PRNGKey(1), (B, C, N), jnp.float32)
    theta = translation_theta(shift, DHW, batch=B)
    ref = grid_sample_flat(flat, DHW, affine_grid(theta, DHW),
                           padding_mode=padding_mode, align_corners=False)
    got = warp_affine_shear(flat, theta, DHW, padding_mode=padding_mode,
                            align_corners=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=2e-5)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_axis_aligned_scale_exact_on_noise(padding_mode):
    B, C = 1, 2
    flat = jax.random.normal(jax.random.PRNGKey(2), (B, C, N), jnp.float32)
    theta = _theta([[1.13, 0, 0, 0.04],
                    [0, 0.91, 0, -0.06],
                    [0, 0, 1.07, 0.02]], B)
    ref = grid_sample_flat(flat, DHW, affine_grid(theta, DHW),
                           padding_mode=padding_mode, align_corners=False)
    got = warp_affine_shear(flat, theta, DHW, padding_mode=padding_mode,
                            align_corners=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=2e-5)


@pytest.mark.parametrize("seed", [5, 17])
def test_reference_affine_family_on_smooth_data(seed):
    """Random strength-0.05 draws (the reference TTA distribution) on smooth
    volumes: the multi-pass kernel must track direct trilinear closely."""
    B, C = 2, 2
    flat = smooth_volume(B, C, DHW, seed=seed)
    theta, theta_inv = get_rand_affine(jax.random.PRNGKey(seed), B)
    for t in (theta, theta_inv):
        ref = grid_sample_flat(flat, DHW, affine_grid(t, DHW),
                               padding_mode="zeros", align_corners=False)
        got = warp_affine_shear(flat, t, DHW, padding_mode="zeros",
                                align_corners=False)
        err = np.abs(np.asarray(got) - np.asarray(ref))
        # interior bound: O(h^2 * offdiag) kernel difference on unit-range
        # smooth data; faces can differ over a ~1-voxel in/out band
        assert err.mean() < 5e-3, err.mean()
        assert err.max() < 0.15, err.max()


def test_grad_exact_case_matches_xla():
    B, C = 1, 2
    theta = translation_theta((1.25, -2.5, 0.75), DHW, batch=B)
    grid = affine_grid(theta, DHW)
    cot = jax.random.normal(jax.random.PRNGKey(9), (B, C, N), jnp.float32)
    flat = jax.random.normal(jax.random.PRNGKey(8), (B, C, N), jnp.float32)

    g_ref = jax.grad(lambda f: jnp.sum(grid_sample_flat(
        f, DHW, grid, padding_mode="zeros", align_corners=False) * cot))(flat)
    g_got = jax.grad(lambda f: jnp.sum(warp_affine_shear(
        f, theta, DHW, padding_mode="zeros",
        align_corners=False) * cot))(flat)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_adjoint_identity_general_affine():
    """<W v, u> == <v, W^T u> — jax.grad must be the exact adjoint of the
    linear map for ANY affine, not just the exact-filter cases."""
    B, C = 1, 2
    theta, _ = get_rand_affine(jax.random.PRNGKey(4), B)
    v = jax.random.normal(jax.random.PRNGKey(5), (B, C, N), jnp.float32)
    u = jax.random.normal(jax.random.PRNGKey(6), (B, C, N), jnp.float32)

    def warp(f):
        return warp_affine_shear(f, theta, DHW, padding_mode="zeros",
                                 align_corners=False)

    lhs = jnp.sum(warp(v) * u)
    wt_u = jax.grad(lambda f: jnp.sum(warp(f) * u))(v)
    rhs = jnp.sum(v * wt_u)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=2e-4)


def test_bf16_smoke():
    B, C = 1, 3
    flat = smooth_volume(B, C, DHW, seed=3).astype(jnp.bfloat16)
    theta, _ = get_rand_affine(jax.random.PRNGKey(7), B)
    got = warp_affine_shear(flat, theta, DHW, padding_mode="zeros",
                            align_corners=False)
    assert got.dtype == jnp.bfloat16
    ref = warp_affine_shear(flat.astype(jnp.float32), theta, DHW,
                            padding_mode="zeros", align_corners=False)
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(ref), rtol=0.05, atol=0.05)


# ---------------------------------------------------------------------------
# banded static-shift form (DGTTA_SHEAR_BAND)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.parametrize("C", [1, 10])
def test_banded_matches_dense(monkeypatch, padding_mode, C):
    """The banded form is numerically the dense form for in-band draws
    (f32: both sum the same two tap products; banded accumulates f32)."""
    key = jax.random.PRNGKey(7)
    theta, _ = get_rand_affine(key, 2)
    vol = smooth_volume(2, C, DHW, seed=3)
    monkeypatch.setenv("DGTTA_SHEAR_BAND", "0")
    dense = warp_affine_shear(vol, theta, DHW, padding_mode=padding_mode)
    monkeypatch.setenv("DGTTA_SHEAR_BAND", "6")
    banded = warp_affine_shear(vol, theta, DHW, padding_mode=padding_mode)
    np.testing.assert_allclose(np.asarray(banded), np.asarray(dense),
                               atol=2e-6, rtol=2e-6)


def test_banded_grad_matches_dense(monkeypatch):
    key = jax.random.PRNGKey(11)
    theta, _ = get_rand_affine(key, 1)
    vol = smooth_volume(1, 4, DHW, seed=5)

    def loss(v):
        out = warp_affine_shear(v, theta, DHW, padding_mode="zeros")
        return jnp.sum(out ** 2)

    monkeypatch.setenv("DGTTA_SHEAR_BAND", "0")
    g_dense = jax.grad(loss)(vol)
    monkeypatch.setenv("DGTTA_SHEAR_BAND", "6")
    g_band = jax.grad(loss)(vol)
    np.testing.assert_allclose(np.asarray(g_band), np.asarray(g_dense),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_banded_out_of_band_falls_back(monkeypatch, padding_mode):
    """A draw whose taps leave the static band must produce the DENSE
    result (lax.cond fallback), not a silently-zeroed band output."""
    # 5-voxel x translation with band=2: out of band everywhere
    theta = translation_theta((0, 0, 5), DHW)
    vol = smooth_volume(1, 3, DHW, seed=9)
    monkeypatch.setenv("DGTTA_SHEAR_BAND", "0")
    dense = warp_affine_shear(vol, theta, DHW, padding_mode=padding_mode)
    monkeypatch.setenv("DGTTA_SHEAR_BAND", "2")
    banded = warp_affine_shear(vol, theta, DHW, padding_mode=padding_mode)
    np.testing.assert_allclose(np.asarray(banded), np.asarray(dense),
                               atol=2e-6, rtol=2e-6)
    # sanity: the translation really is out of band (result nontrivial)
    assert float(jnp.abs(dense).max()) > 0.1


def test_banded_in_band_translation_exact(monkeypatch):
    """Integer translations inside the band are EXACT under the banded
    form (the lerp collapses to a single shifted copy)."""
    monkeypatch.setenv("DGTTA_SHEAR_BAND", "4")
    theta = translation_theta((1, -2, 3), DHW)
    vol = smooth_volume(1, 2, DHW, seed=1)
    got = warp_affine_shear(vol, theta, DHW, padding_mode="zeros")
    ref = grid_sample_flat(vol, DHW, affine_grid(theta, DHW,
                                                 align_corners=False),
                           padding_mode="zeros", align_corners=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# warp_grid_shear: sequential per-axis resample of free displacement grids
# ---------------------------------------------------------------------------

def _disp_grid(seed, B, dhw, factor=0.5):
    from dg_tta_tpu.core.fields import get_disp_field
    from dg_tta_tpu.core.grid import identity_grid
    ident = identity_grid(dhw, align_corners=False)
    disp, disp_inv = get_disp_field(jax.random.PRNGKey(seed), B, dhw,
                                    factor=factor, interpolation_factor=5)
    return (tuple(i[None] + d for i, d in zip(ident, disp)),
            tuple(i[None] + d for i, d in zip(ident, disp_inv)))


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_shear_single_axis_disp_exact(padding_mode):
    """A displacement along ONE axis has no cross terms: the sequential
    form must match the joint trilinear warp exactly (up to f32 order)."""
    from dg_tta_tpu.core.grid import identity_grid
    from dg_tta_tpu.ops.warp_shear import warp_grid_shear
    B, C = 2, 3
    flat = jax.random.normal(jax.random.PRNGKey(0), (B, C, N), jnp.float32)
    ident = identity_grid(DHW, align_corners=False)
    dx = 0.04 * jnp.sin(jnp.linspace(0, 6.0, N)).reshape(1, *DHW)
    dx = jnp.tile(dx, (B, 1, 1, 1))  # grid_sample_flat wants grid batch == B
    grid = (ident[0][None] + dx, ident[1][None] + 0.0 * dx,
            ident[2][None] + 0.0 * dx)
    ref = grid_sample_flat(flat, DHW, grid, padding_mode=padding_mode,
                           align_corners=False)
    got = warp_grid_shear(flat, grid, DHW, padding_mode=padding_mode,
                          align_corners=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("seed", [3, 4])
def test_grid_shear_tta_disp_family_on_smooth_data(seed):
    """The TTA deformable family (get_disp_field, factor 0.5): sequential
    per-axis passes differ from the joint warp by O(|d|*grad d) cross
    terms — compared on smooth data where both approximate the continuous
    field (cf. the affine off-diagonal contract above)."""
    from dg_tta_tpu.ops.warp_shear import warp_grid_shear
    B, C = 2, 2
    flat = smooth_volume(B, C, DHW, seed=seed)
    grid, grid_inv = _disp_grid(seed, B, DHW)
    for g in (grid, grid_inv):
        ref = grid_sample_flat(flat, DHW, g, padding_mode="zeros",
                               align_corners=False)
        got = warp_grid_shear(flat, g, DHW, padding_mode="zeros",
                              align_corners=False)
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err < 0.03, err  # value range ~[-1, 1]


def test_grid_shear_grad_is_exact_adjoint():
    """jax.grad through the banded passes is the exact transpose of the
    (approximate) warp: <W v, u> == <v, W^T u> to f32 accuracy."""
    from dg_tta_tpu.ops.warp_shear import warp_grid_shear
    B, C = 1, 2
    grid, _ = _disp_grid(7, B, DHW)
    v = jax.random.normal(jax.random.PRNGKey(1), (B, C, N), jnp.float32)
    u = jax.random.normal(jax.random.PRNGKey(2), (B, C, N), jnp.float32)

    def f(x):
        return jnp.vdot(warp_grid_shear(x, grid, DHW, padding_mode="zeros",
                                        align_corners=False), u)

    wv = warp_grid_shear(v, grid, DHW, padding_mode="zeros",
                         align_corners=False)
    lhs = float(jnp.vdot(wv, u))
    rhs = float(jnp.vdot(v, jax.grad(f)(v)))
    np.testing.assert_allclose(lhs, rhs, rtol=2e-5)


def test_engine_deformable_disp_shear_tracks_gather_path(monkeypatch):
    """Engine-level: the deformable member with DGTTA_DISP_SHEAR=1 must
    optimize the same objective as the joint-gather path — loss
    trajectories within a small absolute band (cf. the REL_FRAME 0.02
    contract; the warp filters differ by the cross-term contract)."""
    import dataclasses
    from dg_tta_tpu.models.network import Model
    from dg_tta_tpu.models.plans import ArchSpec
    from dg_tta_tpu.tta.engine import tta_one_volume
    from dg_tta_tpu.core.patches import bucket_shape_for, pad_to_bucket
    from dg_tta_tpu.tta.plan import TTAPlan

    spec = ArchSpec(features_per_stage=(4, 8), kernel_sizes=((3, 3, 3),) * 2,
                    strides=((1, 1, 1), (2, 2, 2)),
                    n_conv_per_stage_encoder=(1, 1),
                    n_conv_per_stage_decoder=(1,),
                    num_input_channels=1, num_classes=4)
    model = Model(spec=spec, patch_size=(16, 16, 16),
                  trainer_name="nnUNetTrainer_GIN", uses_gin_internal=True,
                  uses_mind=False, compute_dtype="float32")
    plan = TTAPlan(epochs=2, patches_to_be_accumulated=2, ensemble_count=1,
                   spatial_aug_type="deformable")
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    vol_shape = (24, 24, 24)
    vol = jnp.asarray(rng.normal(size=(*vol_shape, 1)).astype(np.float32))
    bucket = bucket_shape_for(vol_shape)
    padded = pad_to_bucket(vol, bucket, pad_value=-1.0)[None]
    shapes = jnp.asarray([[float(s) for s in vol_shape]])
    idx = np.arange(4, dtype=np.int32)

    losses = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("DGTTA_DISP_SHEAR", flag)
        _, traj, _ = tta_one_volume(model, plan, params, padded, shapes,
                                    idx, idx, jax.random.PRNGKey(5),
                                    ensemble_chunk=1)
        losses[flag] = np.asarray(traj).mean(axis=-1).ravel()
    assert np.all(np.isfinite(losses["0"])) and np.all(
        np.isfinite(losses["1"]))
    np.testing.assert_allclose(losses["1"], losses["0"], atol=0.05)


def test_engine_deformable_halfres_tracks_fullres(monkeypatch):
    """Engine-level: DGTTA_DISP_HALFRES=1 optimizes the same objective as
    the full-res field generation (same contract style as the disp-shear
    tracking test above — the warp FIELDS differ by the O(h^2) lattice
    contract, tests/test_fields.py)."""
    from dg_tta_tpu.models.network import Model
    from dg_tta_tpu.models.plans import ArchSpec
    from dg_tta_tpu.tta.engine import tta_one_volume
    from dg_tta_tpu.core.patches import bucket_shape_for, pad_to_bucket
    from dg_tta_tpu.tta.plan import TTAPlan

    spec = ArchSpec(features_per_stage=(4, 8), kernel_sizes=((3, 3, 3),) * 2,
                    strides=((1, 1, 1), (2, 2, 2)),
                    n_conv_per_stage_encoder=(1, 1),
                    n_conv_per_stage_decoder=(1,),
                    num_input_channels=1, num_classes=4)
    model = Model(spec=spec, patch_size=(16, 16, 16),
                  trainer_name="nnUNetTrainer_GIN", uses_gin_internal=True,
                  uses_mind=False, compute_dtype="float32")
    plan = TTAPlan(epochs=2, patches_to_be_accumulated=2, ensemble_count=1,
                   spatial_aug_type="deformable")
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    vol_shape = (24, 24, 24)
    vol = jnp.asarray(rng.normal(size=(*vol_shape, 1)).astype(np.float32))
    bucket = bucket_shape_for(vol_shape)
    padded = pad_to_bucket(vol, bucket, pad_value=-1.0)[None]
    shapes = jnp.asarray([[float(s) for s in vol_shape]])
    idx = np.arange(4, dtype=np.int32)

    losses = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("DGTTA_DISP_HALFRES", flag)
        _, traj, _ = tta_one_volume(model, plan, params, padded, shapes,
                                    idx, idx, jax.random.PRNGKey(5),
                                    ensemble_chunk=1)
        losses[flag] = np.asarray(traj).mean(axis=-1).ravel()
    assert np.all(np.isfinite(losses["0"])) and np.all(
        np.isfinite(losses["1"]))
    np.testing.assert_allclose(losses["1"], losses["0"], atol=0.05)
