"""Correctness of the Pallas trilinear-warp kernel (ops/warp_pallas.py).

Three execution contexts share the stage code (module docstring there):
  1. staged_warp_reference — pure JAX on CPU, validated against
     grid_sample_flat (the XLA ground truth, itself torch-parity-pinned in
     tests/test_grid.py);
  2. grid_sample_flat_pallas(interpret=True) — the real kernel body through
     the Pallas interpreter (DMA/blocking/scratch paths included);
  3. the Mosaic-compiled kernel on a real chip (tools/probe_warp_pallas.py,
     not run in CI).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dg_tta_tpu.core.fields import get_disp_field, get_rand_affine
from dg_tta_tpu.core.grid import affine_grid, grid_sample_flat, identity_grid
from dg_tta_tpu.ops.experimental.warp_pallas_staged import (
    grid_sample_flat_pallas,
    pallas_warp_supported,
    staged_warp_reference,
)

DHW = (8, 10, 128)
N = int(np.prod(DHW))


def _affine_grid(seed, B, inverse=False):
    theta, theta_inv = get_rand_affine(jax.random.PRNGKey(seed), B)
    return affine_grid(theta_inv if inverse else theta, DHW,
                       align_corners=False)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.parametrize("inverse", [False, True])
def test_staged_reference_matches_xla(padding_mode, inverse):
    B, C = 2, 3
    flat = jax.random.normal(jax.random.PRNGKey(1), (B, C, N), jnp.float32)
    grid = _affine_grid(7, B, inverse)
    ref = grid_sample_flat(flat, DHW, grid, padding_mode=padding_mode,
                           align_corners=False)
    got = staged_warp_reference(flat, DHW, grid, padding_mode=padding_mode,
                                align_corners=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=2e-5)


def test_staged_reference_matches_xla_deformable():
    B, C = 1, 2
    flat = jax.random.normal(jax.random.PRNGKey(2), (B, C, N), jnp.float32)
    ident = identity_grid(DHW, align_corners=False)
    disp, disp_inv = get_disp_field(jax.random.PRNGKey(3), B, DHW,
                                    factor=0.5, interpolation_factor=5)
    for d in (disp, disp_inv):
        grid = tuple(i[None] + dd for i, dd in zip(ident, d))
        ref = grid_sample_flat(flat, DHW, grid, padding_mode="zeros",
                               align_corners=False)
        got = staged_warp_reference(flat, DHW, grid, padding_mode="zeros",
                                    align_corners=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=2e-5)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_kernel_interpret_matches_xla_f32(padding_mode):
    B, C = 1, 3
    flat = jax.random.normal(jax.random.PRNGKey(4), (B, C, N), jnp.float32)
    grid = _affine_grid(11, B)
    ref = grid_sample_flat(flat, DHW, grid, padding_mode=padding_mode,
                           align_corners=False)
    got = grid_sample_flat_pallas(flat, grid, DHW,
                                  padding_mode=padding_mode,
                                  align_corners=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=2e-5)


def test_kernel_interpret_bf16_packed_pairs():
    """bf16 inputs ride packed channel pairs; result is within bf16 rounding
    of the f32 ground truth (the kernel accumulates f32, unlike the XLA
    C>1 bf16 path, so compare against the f32 truth)."""
    B, C = 1, 5  # odd C exercises the pad-to-even path
    flat = jax.random.normal(jax.random.PRNGKey(5), (B, C, N), jnp.float32)
    grid = _affine_grid(13, B, inverse=True)
    ref = grid_sample_flat(flat, DHW, grid, padding_mode="zeros",
                           align_corners=False)
    got = grid_sample_flat_pallas(flat.astype(jnp.bfloat16), grid, DHW,
                                  padding_mode="zeros",
                                  align_corners=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(ref), rtol=0.05, atol=0.05)


def test_kernel_interpret_c1():
    B = 1
    flat = jax.random.normal(jax.random.PRNGKey(6), (B, 1, N), jnp.float32)
    grid = _affine_grid(17, B)
    ref = grid_sample_flat(flat, DHW, grid, padding_mode="zeros",
                           align_corners=False)
    got = grid_sample_flat_pallas(flat, grid, DHW, padding_mode="zeros",
                                  align_corners=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=2e-5)


def test_kernel_interpret_under_vmap():
    """The engine vmaps warps over ensemble members — the Pallas batching
    rule must produce the same values."""
    B, C, M = 1, 2, 3
    flat = jax.random.normal(jax.random.PRNGKey(8), (M, B, C, N),
                             jnp.float32)
    thetas = jnp.stack(
        [get_rand_affine(jax.random.PRNGKey(s), B)[0] for s in range(M)])

    def one(f, th):
        g = affine_grid(th, DHW, align_corners=False)
        return grid_sample_flat_pallas(f, g, DHW, padding_mode="zeros",
                                       align_corners=False, interpret=True)

    got = jax.jit(jax.vmap(one))(flat, thetas)
    ref = jnp.stack([
        grid_sample_flat(flat[m], DHW,
                         affine_grid(thetas[m], DHW, align_corners=False),
                         padding_mode="zeros", align_corners=False)
        for m in range(M)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_supported_predicate():
    assert pallas_warp_supported((1, 3, N), DHW, DHW)
    assert not pallas_warp_supported((1, 3, N), (8, 10, 64), (8, 10, 64))
    assert not pallas_warp_supported((1, 3, N), DHW, (4, 10, 128))
    assert not pallas_warp_supported((1, 3, N), DHW, DHW, mode="nearest")


def test_big_translation_within_global_base():
    """A pure translation of ~14 voxels (beyond the per-axis candidate
    window) must still be exact: the per-sample global base absorbs it."""
    B, C = 1, 2
    flat = jax.random.normal(jax.random.PRNGKey(9), (B, C, N), jnp.float32)
    theta = jnp.asarray([[[1.0, 0, 0, 0.15], [0, 1.0, 0, -0.2],
                          [0, 0, 1.0, 0.9]]], jnp.float32)
    grid = affine_grid(theta, DHW, align_corners=False)
    ref = grid_sample_flat(flat, DHW, grid, padding_mode="zeros",
                           align_corners=False)
    got = staged_warp_reference(flat, DHW, grid, padding_mode="zeros",
                                align_corners=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=2e-5)
