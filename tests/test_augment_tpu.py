"""Parity of the MXU DA resample forms (train/augment_tpu.py) against the
stock XLA forms in train/augment.py — the oracle transcription of the
nnUNet v2.2.1 DA stack (SURVEY §2.2).

Contracts (module docstring of augment_tpu.py):
  * lowres_sim_tpu and gaussian_blur_tpu are EXACT re-expressions
    (separable map / same kernel math) — tight allclose.
  * affine_warp_tpu (trilinear) is the multi-pass resampler: exact for
    translations and axis-aligned scales, O(h^2 * offdiag) kernel
    difference on rotations — smooth-data contract.
  * affine_warp_tpu (nearest) matches joint nearest exactly for
    axis-aligned maps; one-voxel tie deviations under rotation — blocky-
    label agreement contract, and the output alphabet never leaves the
    input's.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dg_tta_tpu.core.grid import affine_grid, grid_sample
from dg_tta_tpu.train import augment as aug
from dg_tta_tpu.train.augment_tpu import (affine_warp_tpu, gaussian_blur_tpu,
                                          lowres_sim_tpu)

DHW = (12, 14, 16)


def _img(B, C, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(B, *DHW, C)).astype(np.float32))


def _smooth(B, C, seed=0):
    x = np.array(_img(B, C, seed))
    from scipy import ndimage
    for b in range(B):
        for c in range(C):
            x[b, ..., c] = ndimage.gaussian_filter(x[b, ..., c], 2.0)
    return jnp.asarray(x / (np.abs(x).max() + 1e-9))


def _blocky_seg(B, seed=1):
    rng = np.random.default_rng(seed)
    seg = np.zeros((B, *DHW, 1), np.float32)
    for b in range(B):
        for _ in range(4):
            z, y, x = (rng.integers(0, s - 4) for s in DHW)
            dz, dy, dx = (int(rng.integers(3, 6)) for _ in range(3))
            seg[b, z:z + dz, y:y + dy, x:x + dx, 0] = float(
                rng.integers(1, 5))
    return jnp.asarray(seg)


# ---------------------------------------------------------------------------
# exact stages
# ---------------------------------------------------------------------------

def test_lowres_sim_tpu_exact():
    B = 3
    x = _img(B, 2)
    zooms = jnp.asarray([[0.5, 0.77, 1.0],
                         [1.0, 1.0, 1.0],
                         [0.51, 0.93, 0.62]], jnp.float32)
    ref = jnp.stack([aug._lowres_sim(x[b], zooms[b], DHW) for b in range(B)])
    got = lowres_sim_tpu(x, zooms, m_dtype_name="float32")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_gaussian_blur_tpu_exact():
    B = 2
    x = _img(B, 1)
    sig = jnp.asarray([0.5, 1.0], jnp.float32)
    ref = jnp.stack([aug._gaussian_blur(x[b], sig[b]) for b in range(B)])
    got = gaussian_blur_tpu(x, sig, m_dtype_name="float32")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


# ---------------------------------------------------------------------------
# affine warp: trilinear contract
# ---------------------------------------------------------------------------

def _joint(x, theta, mode, padding_mode):
    grid = affine_grid(theta, x.shape[1:4], align_corners=False)
    return grid_sample(x, grid, mode=mode, padding_mode=padding_mode,
                       align_corners=False)


@pytest.mark.parametrize("theta_fn", [
    lambda: jnp.eye(3, 4)[None],                                    # identity
    lambda: jnp.asarray(                                            # int shift
        [[[1, 0, 0, 2.0 * 3 / DHW[2]],
          [0, 1, 0, 2.0 * 2 / DHW[1]],
          [0, 0, 1, 2.0 * 1 / DHW[0]]]], jnp.float32),
    lambda: jnp.asarray(                                            # aniso scale
        [[[1.25, 0, 0, 0], [0, 0.8, 0, 0], [0, 0, 1.1, 0]]], jnp.float32),
])
@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
def test_affine_warp_tpu_axis_aligned_exact(theta_fn, padding_mode):
    x = _img(1, 2)
    theta = theta_fn()
    ref = _joint(x, theta, "trilinear", padding_mode)
    got = affine_warp_tpu(x, theta, mode="trilinear",
                          padding_mode=padding_mode, m_dtype_name="float32")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_affine_warp_tpu_rotation_smooth_contract():
    """The DA rotation family (up to ~30 deg + scale): multi-pass vs joint
    trilinear on smooth data stays within a few % of the value range."""
    x = _smooth(2, 1, seed=3)
    thetas = []
    for ang, sc in ((0.3, 1.0), (-0.52, 0.8)):
        ca, sa = np.cos(ang), np.sin(ang)
        rz = np.asarray([[ca, -sa, 0, 0], [sa, ca, 0, 0], [0, 0, 1, 0]],
                        np.float32)
        thetas.append(rz * np.asarray([[sc]], np.float32))
    theta = jnp.asarray(np.stack(thetas))
    ref = _joint(x, theta, "trilinear", "border")
    got = affine_warp_tpu(x, theta, mode="trilinear", padding_mode="border",
                          m_dtype_name="float32")
    d = np.abs(np.asarray(got - ref))
    # interior: the O(h^2 * offdiag) kernel contract; faces: the multi-pass
    # border composition differs from joint clamping at large rotations —
    # a bounded band, immaterial for a random augmentation (value range ~1)
    assert d[:, 3:-3, 3:-3, 3:-3].max() < 0.03, d.max()
    assert np.percentile(d, 99) < 0.08, np.percentile(d, 99)


# ---------------------------------------------------------------------------
# affine warp: nearest (seg) contract
# ---------------------------------------------------------------------------

def test_affine_warp_tpu_nearest_axis_aligned_exact():
    seg = _blocky_seg(1)
    theta = jnp.asarray(
        [[[1.3, 0, 0, 0.21], [0, 0.75, 0, 0], [0, 0, 1.05, -0.13]]],
        jnp.float32)
    ref = _joint(seg, theta, "nearest", "zeros")
    got = affine_warp_tpu(seg, theta, mode="nearest", padding_mode="zeros",
                          m_dtype_name="float32")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_affine_warp_tpu_nearest_rotation_agreement():
    seg = _blocky_seg(2, seed=5)
    ang = 0.4
    ca, sa = np.cos(ang), np.sin(ang)
    rz = np.asarray([[[ca, -sa, 0, 0], [sa, ca, 0, 0], [0, 0, 1, 0]]],
                    np.float32)
    theta = jnp.asarray(np.repeat(rz, 2, axis=0))
    ref = np.asarray(_joint(seg, theta, "nearest", "zeros"))
    got = np.asarray(affine_warp_tpu(seg, theta, mode="nearest",
                                     padding_mode="zeros",
                                     m_dtype_name="float32"))
    # labels never leave the source alphabet (single-tap one-hot rows)
    assert set(np.unique(got)) <= set(np.unique(np.asarray(seg))) | {0.0}
    agree = float((got == ref).mean())
    assert agree > 0.9, agree  # one-voxel tie deviations only


# ---------------------------------------------------------------------------
# end-to-end wiring through augment_batch
# ---------------------------------------------------------------------------

def test_augment_batch_tpu_impl_matches_stock_on_axis_aligned_family(
        monkeypatch):
    """With the rotation gate off (scale stays on), every stage of the TPU
    impl is exact — full-batch outputs must match the stock impl tightly."""
    cfg = aug.DAConfig(p_rotation=0.0)
    key = jax.random.PRNGKey(11)
    imgs, segs = _img(4, 1, seed=7), _blocky_seg(4, seed=8)
    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("DGTTA_DA_TPU", flag)
        outs[flag] = aug.augment_batch(key, imgs, segs, cfg)
    np.testing.assert_allclose(np.asarray(outs["1"][0]),
                               np.asarray(outs["0"][0]),
                               atol=5e-3, rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(outs["1"][1]),
                                  np.asarray(outs["0"][1]))


def test_augment_batch_tpu_impl_default_family_sane(monkeypatch):
    """Full default DA family through the TPU impl: finite, shape-stable,
    seg alphabet preserved, and the batch actually changes the images."""
    monkeypatch.setenv("DGTTA_DA_TPU", "1")
    cfg = aug.DAConfig()
    imgs, segs = _img(4, 1, seed=9), _blocky_seg(4, seed=10)
    out_i, out_s = aug.augment_batch(jax.random.PRNGKey(3), imgs, segs, cfg)
    assert out_i.shape == imgs.shape and out_s.shape == segs.shape
    assert np.all(np.isfinite(np.asarray(out_i)))
    assert set(np.unique(np.asarray(out_s))) <= \
        set(np.unique(np.asarray(segs))) | {0.0}
    assert float(jnp.abs(out_i - imgs).max()) > 1e-3
