"""Parity tests for affine_grid / grid_sample against torch (CPU oracle)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from dg_tta_tpu.core.grid import affine_grid, grid_sample, identity_grid


def _rand_theta(rng, b):
    return (np.eye(3, 4)[None] + 0.1 * rng.standard_normal((b, 3, 4))).astype(
        np.float32
    )


@pytest.mark.parametrize("align_corners", [False, True])
def test_affine_grid_matches_torch(rng, align_corners):
    theta = _rand_theta(rng, 2)
    size = (5, 6, 7)
    from dg_tta_tpu.core.grid import pack_grid
    ours = np.asarray(pack_grid(affine_grid(theta, size,
                                            align_corners=align_corners)))
    ref = F.affine_grid(
        torch.from_numpy(theta), [2, 1, *size], align_corners=align_corners
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_trilinear_matches_torch(rng, padding_mode, align_corners):
    B, C, D, H, W = 2, 3, 6, 5, 7
    vol = rng.standard_normal((B, C, D, H, W)).astype(np.float32)
    theta = _rand_theta(rng, B)
    out_size = (4, 5, 6)
    grid_t = F.affine_grid(
        torch.from_numpy(theta), [B, 1, *out_size], align_corners=align_corners
    )
    ref = F.grid_sample(
        torch.from_numpy(vol),
        grid_t,
        mode="bilinear",
        padding_mode=padding_mode,
        align_corners=align_corners,
    ).numpy()

    vol_cl = np.moveaxis(vol, 1, -1)  # B,D,H,W,C
    ours = np.asarray(
        grid_sample(
            jnp.asarray(vol_cl),
            jnp.asarray(grid_t.numpy()),
            mode="trilinear",
            padding_mode=padding_mode,
            align_corners=align_corners,
        )
    )
    np.testing.assert_allclose(np.moveaxis(ours, -1, 1), ref, atol=1e-5)


def test_grid_sample_nearest_matches_torch(rng):
    B, C, D, H, W = 1, 2, 8, 8, 8
    vol = rng.standard_normal((B, C, D, H, W)).astype(np.float32)
    theta = _rand_theta(rng, B)
    grid_t = F.affine_grid(torch.from_numpy(theta), [B, 1, D, H, W], align_corners=False)
    ref = F.grid_sample(
        torch.from_numpy(vol), grid_t, mode="nearest", padding_mode="zeros",
        align_corners=False,
    ).numpy()
    vol_cl = np.moveaxis(vol, 1, -1)
    ours = np.asarray(
        grid_sample(jnp.asarray(vol_cl), jnp.asarray(grid_t.numpy()),
                    mode="nearest", padding_mode="zeros", align_corners=False)
    )
    mismatch = np.mean(np.moveaxis(ours, -1, 1) != ref)
    # allow rare ties at exact .5 boundaries
    assert mismatch < 1e-3


def test_identity_grid_roundtrip(rng):
    B, D, H, W, C = 1, 6, 6, 6, 2
    vol = rng.standard_normal((B, D, H, W, C)).astype(np.float32)
    grid = tuple(c[None] for c in identity_grid((D, H, W)))
    out = np.asarray(grid_sample(jnp.asarray(vol), grid))
    np.testing.assert_allclose(out, vol, atol=1e-5)
