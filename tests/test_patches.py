"""Patch extraction tests: parity with the reference's affine/grid_sample
recipe (torch oracle) and bucket-padding invariance."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dg_tta_tpu.core.patches import (
    pad_to_bucket,
    bucket_shape_for,
    extract_patch,
)


def torch_center_patch(vol_np, patch_size):
    """Oracle: the reference's center-patch path (torch_utils.py:25-62)."""
    t_patch = torch.as_tensor(patch_size, dtype=torch.float32)
    t_in = torch.as_tensor(vol_np.shape, dtype=torch.float32)
    scales = t_patch / t_in
    scales = torch.cat([scales.flip(0), torch.tensor([1.0])])
    affine = scales.diag()
    grid = F.affine_grid(
        affine[:3][None], [1, 1, *patch_size], align_corners=False
    )
    data = torch.from_numpy(vol_np)[None, None]
    vmin = data.min()
    out = F.grid_sample(
        data - vmin, grid, align_corners=False, padding_mode="zeros"
    )
    return (out + vmin).numpy()[0, 0]


def test_center_patch_matches_reference_recipe(rng):
    vol = rng.standard_normal((20, 24, 28)).astype(np.float32) + 5.0
    patch_size = (12, 12, 16)
    ref = torch_center_patch(vol, patch_size)

    bucket = bucket_shape_for(vol.shape, multiple=8)
    padded = pad_to_bucket(
        jnp.asarray(vol)[..., None], bucket, pad_value=float(vol.min())
    )
    ours = np.asarray(
        extract_patch(padded, jnp.asarray(vol.shape, jnp.float32), patch_size,
                      fixed=True)
    )[0, ..., 0]
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_patch_larger_than_volume_pads_with_min(rng):
    vol = rng.standard_normal((8, 8, 8)).astype(np.float32) + 10.0
    patch_size = (16, 16, 16)
    ref = torch_center_patch(vol, patch_size)

    bucket = bucket_shape_for(vol.shape, multiple=8)
    padded = pad_to_bucket(
        jnp.asarray(vol)[..., None], bucket, pad_value=float(vol.min())
    )
    ours = np.asarray(
        extract_patch(padded, jnp.asarray(vol.shape, jnp.float32), patch_size,
                      fixed=True)
    )[0, ..., 0]
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_random_patch_in_volume_range(rng):
    vol = (rng.random((32, 30, 40)) * 100).astype(np.float32)
    patch_size = (16, 16, 16)
    bucket = bucket_shape_for(vol.shape, multiple=16)
    padded = pad_to_bucket(
        jnp.asarray(vol)[..., None], bucket, pad_value=float(vol.min())
    )
    for seed in range(4):
        p = np.asarray(
            extract_patch(padded, jnp.asarray(vol.shape, jnp.float32),
                          patch_size, key=jax.random.PRNGKey(seed))
        )
        assert p.min() >= vol.min() - 1e-3
        assert p.max() <= vol.max() + 1e-3


def test_random_patches_differ(rng):
    vol = rng.standard_normal((32, 32, 32)).astype(np.float32)
    padded = jnp.asarray(vol)[..., None]
    ts = jnp.asarray(vol.shape, jnp.float32)
    a = np.asarray(extract_patch(padded, ts, (16, 16, 16),
                                 key=jax.random.PRNGKey(0)))
    b = np.asarray(extract_patch(padded, ts, (16, 16, 16),
                                 key=jax.random.PRNGKey(1)))
    assert np.abs(a - b).max() > 1e-3


def test_bucket_padding_does_not_change_patch(rng):
    vol = rng.standard_normal((24, 24, 24)).astype(np.float32)
    ts = jnp.asarray(vol.shape, jnp.float32)
    key = jax.random.PRNGKey(5)
    small = pad_to_bucket(jnp.asarray(vol)[..., None], (24, 24, 24),
                          pad_value=float(vol.min()))
    big = pad_to_bucket(jnp.asarray(vol)[..., None], (64, 48, 32),
                        pad_value=float(vol.min()))
    pa = np.asarray(extract_patch(small, ts, (12, 12, 12), key=key))
    pb = np.asarray(extract_patch(big, ts, (12, 12, 12), key=key))
    np.testing.assert_allclose(pa, pb, atol=1e-4)


def test_unit_stride_fast_path_matches_gather_path(rng):
    """sample_unit_stride (dynamic_slice + separable lerp) must reproduce the
    general gather-based sample_with_affine bit-for-bit-sample positions for
    patch_affine-style thetas — random offsets, volumes larger and smaller
    than the patch, and bucket padding."""
    from dg_tta_tpu.core.patches import (
        patch_affine, sample_with_affine, sample_unit_stride)

    for true_shape, patch in [((40, 37, 29), (16, 16, 16)),
                              ((12, 40, 10), (16, 16, 16)),  # V < P on 2 axes
                              ((33, 33, 33), (16, 12, 8))]:
        vol = rng.normal(size=true_shape).astype(np.float32) + 3.0
        bucket = bucket_shape_for(true_shape, multiple=16,
                                  min_size=(16, 16, 16))
        padded = pad_to_bucket(jnp.asarray(vol)[..., None], bucket,
                               pad_value=float(vol.min()))
        ts = jnp.asarray([float(s) for s in true_shape])
        for i, fixed in [(0, True), (1, False), (2, False)]:
            theta = patch_affine(jax.random.PRNGKey(i), ts, patch,
                                 fixed=fixed)
            ref = sample_with_affine(padded, ts, theta, patch,
                                     mode="trilinear", pad_with_min=True)
            fast = sample_unit_stride(padded, ts, theta, patch,
                                      pad_with_min=True)
            np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                       rtol=0, atol=2e-5)
