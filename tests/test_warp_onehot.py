"""Correctness of the gather-free one-hot trilinear warp (ops/warp_onehot.py).

Ground truth is grid_sample_flat (the XLA path, itself torch-parity-pinned in
tests/test_grid.py).  The one-hot warp's exactness contract is conditional —
residual offsets inside the (pz, py, px) candidate windows — so every test
here draws from the REFERENCE augmentation distributions (affine strength
0.05, deformable factor 0.5/interp 5; augmentation_utils.py:114-170) at
window settings chosen by tools/calibrate_onehot_windows.py, plus explicit
in/out-of-window translation cases for the base-absorption logic.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dg_tta_tpu.core.fields import get_disp_field, get_rand_affine
from dg_tta_tpu.core.grid import (affine_grid, grid_sample_flat,
                                  identity_grid)
from dg_tta_tpu.ops.warp_onehot import (grid_sample_flat_onehot,
                                        onehot_warp_supported)

DHW = (12, 14, 128)
N = int(np.prod(DHW))
# geometry-matched windows for this small test volume (z/y extents 12/14
# leave tiny residuals; x spans 128).  pz/py cover the border-mode clip
# spread of a fully out-of-range translation (= the axis extent, so 6/7).
# The deformable + routed tests run the full-size defaults instead.
WIN = dict(pz=6, py=7, px=11)


def make_translation_grid(shift_vox, dhw, batch=1, align_corners=False):
    """Pure-translation sampling grid: out[p] = src[p + shift] (voxels).

    shift_vox is (sz, sy, sx); align_corners=False normalized units are
    2/size per voxel.
    """
    d, h, w = dhw
    sz, sy, sx = shift_vox
    theta = jnp.tile(jnp.asarray(
        [[1.0, 0, 0, 2.0 * sx / w],
         [0, 1.0, 0, 2.0 * sy / h],
         [0, 0, 1.0, 2.0 * sz / d]], jnp.float32)[None], (batch, 1, 1))
    return affine_grid(theta, dhw, align_corners=align_corners)


def _affine_grid(seed, B, inverse=False, dhw=DHW):
    theta, theta_inv = get_rand_affine(jax.random.PRNGKey(seed), B)
    return affine_grid(theta_inv if inverse else theta, dhw,
                       align_corners=False)


def test_supported_predicate():
    assert onehot_warp_supported(DHW, DHW)
    assert not onehot_warp_supported(DHW, (12, 14, 64))  # not endomorphic
    assert not onehot_warp_supported((2, 14, 128), (2, 14, 128))  # too thin
    assert not onehot_warp_supported(DHW, DHW, mode="nearest")


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.parametrize("inverse", [False, True])
def test_matches_xla_affine(padding_mode, inverse):
    B, C = 2, 3
    flat = jax.random.normal(jax.random.PRNGKey(1), (B, C, N), jnp.float32)
    grid = _affine_grid(7, B, inverse)
    ref = grid_sample_flat(flat, DHW, grid, padding_mode=padding_mode,
                           align_corners=False)
    got = grid_sample_flat_onehot(flat, grid, DHW, padding_mode=padding_mode,
                                  align_corners=False, **WIN)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=2e-5)


def test_matches_xla_deformable():
    B, C = 1, 2
    flat = jax.random.normal(jax.random.PRNGKey(2), (B, C, N), jnp.float32)
    ident = identity_grid(DHW, align_corners=False)
    disp, disp_inv = get_disp_field(jax.random.PRNGKey(3), B, DHW,
                                    factor=0.5, interpolation_factor=5)
    for d in (disp, disp_inv):
        grid = tuple(i[None] + dd for i, dd in zip(ident, d))
        ref = grid_sample_flat(flat, DHW, grid, padding_mode="zeros",
                               align_corners=False)
        got = grid_sample_flat_onehot(flat, grid, DHW, padding_mode="zeros",
                                      align_corners=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=2e-5)


@pytest.mark.parametrize("shift", [(-15.3, 4.7, 19.9), (20.0, -20.0, 8.5)])
def test_large_translation_absorbed_by_base(shift):
    """Translations far beyond the candidate windows but under _GMAX are
    absorbed by the per-sample dynamic-slice base, so the result stays
    exact (zeros padding appears where the source runs out)."""
    B, C = 1, 2
    flat = jax.random.normal(jax.random.PRNGKey(4), (B, C, N), jnp.float32)
    grid = make_translation_grid(shift, DHW, batch=B, align_corners=False)
    for padding_mode in ("zeros", "border"):
        ref = grid_sample_flat(flat, DHW, grid, padding_mode=padding_mode,
                               align_corners=False)
        got = grid_sample_flat_onehot(flat, grid, DHW,
                                      padding_mode=padding_mode,
                                      align_corners=False, **WIN)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=2e-5)


def test_per_sample_bases_differ():
    """Each batch member gets its own dynamic-slice base."""
    C = 2
    flat = jax.random.normal(jax.random.PRNGKey(5), (2, C, N), jnp.float32)
    g_a = make_translation_grid((12.0, -9.0, 15.0), DHW, batch=1,
                                align_corners=False)
    g_b = make_translation_grid((-12.0, 9.0, -15.0), DHW, batch=1,
                                align_corners=False)
    grid = tuple(jnp.concatenate([a, b]) for a, b in zip(g_a, g_b))
    ref = grid_sample_flat(flat, DHW, grid, padding_mode="zeros",
                           align_corners=False)
    got = grid_sample_flat_onehot(flat, grid, DHW, padding_mode="zeros",
                                  align_corners=False, **WIN)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=2e-5)


def test_bf16_smoke():
    B, C = 1, 4
    flat = jax.random.normal(jax.random.PRNGKey(6), (B, C, N),
                             jnp.float32).astype(jnp.bfloat16)
    grid = _affine_grid(13, B)
    got = grid_sample_flat_onehot(flat, grid, DHW, padding_mode="zeros",
                                  align_corners=False, **WIN)
    assert got.dtype == jnp.bfloat16
    ref = grid_sample_flat(flat.astype(jnp.float32), DHW, grid,
                           padding_mode="zeros", align_corners=False)
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(ref), rtol=0.05, atol=0.05)


def test_differentiable_matches_xla_grad():
    """The one-hot warp is differentiable (selects/slices only) and its VJP
    w.r.t. the source values matches the XLA gather path's.  This is what
    lets the routed path keep exact_warp_grad-style autograd available."""
    B, C = 1, 2
    flat = jax.random.normal(jax.random.PRNGKey(8), (B, C, N), jnp.float32)
    grid = _affine_grid(21, B)
    cot = jax.random.normal(jax.random.PRNGKey(9), (B, C, N), jnp.float32)

    def loss_ref(f):
        return jnp.sum(grid_sample_flat(f, DHW, grid, padding_mode="zeros",
                                        align_corners=False) * cot)

    def loss_got(f):
        return jnp.sum(grid_sample_flat_onehot(f, grid, DHW,
                                               padding_mode="zeros",
                                               align_corners=False,
                                               **WIN) * cot)

    g_ref = jax.grad(loss_ref)(flat)
    g_got = jax.grad(loss_got)(flat)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_routed_on_cpu_via_impl_env(monkeypatch):
    """warp_flat_auto honors DGTTA_WARP_IMPL=onehot on any backend."""
    monkeypatch.setenv("DGTTA_WARP_IMPL", "onehot")
    from dg_tta_tpu.ops.warp_pallas import warp_flat_auto
    B, C = 1, 2
    flat = jax.random.normal(jax.random.PRNGKey(10), (B, C, N), jnp.float32)
    grid = _affine_grid(31, B)
    ref = grid_sample_flat(flat, DHW, grid, padding_mode="zeros",
                           align_corners=False)
    got = warp_flat_auto(flat, DHW, grid, padding_mode="zeros",
                         align_corners=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=2e-5)
