"""Tests for random fields, diffeomorphic displacement, and random affines."""

import numpy as np
import jax
import jax.numpy as jnp

from dg_tta_tpu.core.fields import (
    get_rf_field,
    get_disp_field,
    get_rand_affine,
    calc_consistent_diffeomorphic_field,
)
from dg_tta_tpu.core.grid import grid_sample, identity_grid


def test_rf_field_stats():
    f = np.asarray(get_rf_field(jax.random.PRNGKey(0), 2, (24, 24, 24),
                                interpolation_factor=4, num_fields=3))
    assert f.shape == (2, 24, 24, 24, 3)
    np.testing.assert_allclose(f.mean(axis=(1, 2, 3)), 0.0, atol=1e-5)
    # the reference divides by (1e-3 + std); the pooled field's std is small
    # (~0.01), so the normalized std lands below 1 -- same behavior here
    assert ((f.std(axis=(1, 2, 3)) > 0.8) & (f.std(axis=(1, 2, 3)) <= 1.0)).all()
    # smoothness: neighbouring voxels should be correlated
    dz = np.abs(np.diff(f, axis=1)).mean()
    assert dz < 0.5


def test_rand_affine_inverse():
    theta, theta_inv = get_rand_affine(jax.random.PRNGKey(3), 4)
    theta = np.asarray(theta)
    theta_inv = np.asarray(theta_inv)
    assert theta.shape == (4, 3, 4)
    for b in range(4):
        A = np.eye(4)
        A[:3] = theta[b]
        Ainv = np.eye(4)
        Ainv[:3] = theta_inv[b]
        np.testing.assert_allclose(A @ Ainv, np.eye(4), atol=1e-5)


def test_disp_field_inverse_consistency():
    size = (20, 20, 20)
    disp, inv_disp = get_disp_field(jax.random.PRNGKey(1), 1, size, factor=0.5,
                                    interpolation_factor=5)
    disp = jnp.stack(disp, axis=-1)
    inv_disp = jnp.stack(inv_disp, axis=-1)
    assert disp.shape == (1, *size, 3)

    # compose: warp inv_disp by disp and add -> should nearly cancel
    ident = jnp.stack(identity_grid(size, align_corners=True), axis=-1)[None]
    # normalize to grid units for the composition check
    D, H, W = size
    norm = jnp.asarray([W, H, D], jnp.float32).reshape(1, 1, 1, 1, 3)
    d = disp / norm
    di = inv_disp / norm
    warped_inv = grid_sample(di, ident + d, mode="trilinear",
                             padding_mode="border", align_corners=True)
    residual = np.asarray(d + warped_inv)
    # interior only (borders see clamping)
    core = residual[:, 4:-4, 4:-4, 4:-4]
    assert np.abs(core).mean() < 5e-3


def test_diffeomorphic_zero_field_is_zero():
    z = jnp.zeros((1, 8, 8, 8, 3))
    d, di = calc_consistent_diffeomorphic_field(z, z, 5)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(di), 0.0, atol=1e-7)
