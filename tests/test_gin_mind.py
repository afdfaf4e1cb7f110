"""Tests for GIN and MIND ops.

MIND is checked against an independent torch oracle implementing the
MIND-SSC definition (shifted-patch SSDs, Gaussian smoothing, min-subtraction,
variance normalization, exp) -- two independent implementations agreeing on
random inputs.  GIN is stochastic by design, so it is tested on invariants:
determinism per key, energy preservation, and shape/statistics.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dg_tta_tpu.ops.gin import gin_aug
from dg_tta_tpu.ops.mind import mind3d, _S1, _S2, gaussian_kernel_1d, smooth3d


# ---------------------------------------------------------------- MIND oracle

def torch_mind_oracle(img_t, sigma=1.0, delta=1):
    """img_t: (B,1,D,H,W) torch tensor. Independent MIND-SSC computation."""
    B, _, D, H, W = img_t.shape
    pad = F.pad(img_t, (delta,) * 6, mode="replicate")

    chans = []
    for s1, s2 in zip(_S1, _S2):
        z1, y1, x1 = (int(v) * delta for v in s1)
        z2, y2, x2 = (int(v) * delta for v in s2)
        a = pad[:, :, z1 : z1 + D, y1 : y1 + H, x1 : x1 + W]
        b = pad[:, :, z2 : z2 + D, y2 : y2 + H, x2 : x2 + W]
        chans.append(a - b)
    edge = torch.cat(chans, dim=1)

    w = torch.from_numpy(np.asarray(gaussian_kernel_1d(sigma))).float()
    N = w.numel()
    sq = edge**2
    # separable blur with replicate padding along each spatial dim
    for dim in range(3):
        pads = [0, 0, 0, 0, 0, 0]
        pads[2 * (2 - dim)] = N // 2
        pads[2 * (2 - dim) + 1] = N // 2
        shape = [1, 1, 1, 1, 1]
        shape[2 + dim] = N
        sq = F.conv3d(
            F.pad(sq.reshape(-1, 1, *sq.shape[2:]), pads, mode="replicate"),
            w.reshape(shape),
        ).reshape(B, 12, D, H, W)
    ssd = sq

    mind = ssd - ssd.min(1, keepdim=True)[0]
    var = mind.mean(1, keepdim=True)
    var = torch.clamp(var, var.mean() * 0.001, var.mean() * 1000)
    return torch.exp(-mind / var)


def test_mind_matches_torch_oracle(rng):
    B, D, H, W = 2, 8, 9, 10
    img = rng.standard_normal((B, 1, D, H, W)).astype(np.float32)
    ref = torch_mind_oracle(torch.from_numpy(img)).numpy()

    img_cl = np.moveaxis(img, 1, -1)
    ours = np.asarray(mind3d(jnp.asarray(img_cl), key=None))
    np.testing.assert_allclose(np.moveaxis(ours, -1, 1), ref, atol=1e-4)


def test_mind_output_range(rng):
    img = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 1)).astype(np.float32))
    out = np.asarray(mind3d(img, key=jax.random.PRNGKey(0)))
    assert out.shape == (1, 8, 8, 8, 12)
    assert (out > 0).all() and (out <= 1.0 + 1e-6).all()
    # min-subtracted channel maps to exp(0) = 1 at every voxel
    np.testing.assert_allclose(out.max(-1), 1.0, atol=1e-5)


def test_smooth3d_constant_preserved():
    x = jnp.ones((1, 6, 6, 6, 2))
    out = np.asarray(smooth3d(x, 1.0))
    np.testing.assert_allclose(out, 1.0, atol=1e-6)


# ----------------------------------------------------------------------- GIN

def test_gin_deterministic_per_key(rng):
    img = jnp.asarray(rng.standard_normal((2, 8, 8, 8, 1)).astype(np.float32))
    a = np.asarray(gin_aug(jax.random.PRNGKey(7), img))
    b = np.asarray(gin_aug(jax.random.PRNGKey(7), img))
    c = np.asarray(gin_aug(jax.random.PRNGKey(8), img))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-4


def test_gin_energy_preserved(rng):
    img = jnp.asarray(rng.standard_normal((3, 8, 8, 8, 1)).astype(np.float32))
    for seed in range(5):
        out = np.asarray(gin_aug(jax.random.PRNGKey(seed), img))
        assert out.shape == img.shape
        for b in range(img.shape[0]):
            e_in = np.linalg.norm(np.asarray(img)[b])
            e_out = np.linalg.norm(out[b])
            np.testing.assert_allclose(e_out, e_in, rtol=1e-3)


def test_gin_2d_support(rng):
    img = jnp.asarray(rng.standard_normal((2, 16, 16, 1)).astype(np.float32))
    out = np.asarray(gin_aug(jax.random.PRNGKey(0), img))
    assert out.shape == img.shape


def test_gin_output_differs_from_input(rng):
    img = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 1)).astype(np.float32))
    diffs = []
    for seed in range(8):
        out = np.asarray(gin_aug(jax.random.PRNGKey(seed), img))
        diffs.append(np.abs(out - np.asarray(img)).mean())
    # at least most draws should visibly change the image
    assert np.median(diffs) > 1e-3
