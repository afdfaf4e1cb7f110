"""Equivalence of the folded (z-into-H) U-Net path vs the legacy z-tap path.

The folded formulation (models/unet_fold.py) exists purely for TPU layout
reasons; it must be numerically equivalent to models/unet.py on every spec
shape the plans can produce (stride-1 stage, stride-2 downsampling,
transpconv upsampling, deep supervision, head folding, bf16).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dg_tta_tpu.models.plans import ArchSpec
from dg_tta_tpu.models.unet import unet_apply, init_unet_params
from dg_tta_tpu.models.unet_fold import (
    Folded, fold, unfold, conv_folded, unet_apply_folded, foldable)


SPEC3 = ArchSpec(
    features_per_stage=(8, 12, 16),
    kernel_sizes=((3, 3, 3), (3, 3, 3), (3, 3, 3)),
    strides=((1, 1, 1), (2, 2, 2), (2, 2, 2)),
    n_conv_per_stage_encoder=(2, 2, 2),
    n_conv_per_stage_decoder=(2, 2),
    num_input_channels=1,
    num_classes=5,
)


def _data(shape=(2, 8, 12, 16, 1), seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32))


def test_fold_unfold_roundtrip():
    x = _data((1, 4, 6, 8, 3))
    f = fold(x, 1)
    assert f.xf.shape == (1, 4 * 8, 8, 3)
    np.testing.assert_array_equal(np.asarray(unfold(f)), np.asarray(x))


def test_conv_folded_matches_legacy_stride1():
    from dg_tta_tpu.models.unet import _conv
    key = jax.random.PRNGKey(3)
    x = _data((2, 5, 6, 8, 4), 1)
    w = 0.1 * jax.random.normal(key, (3, 3, 3, 4, 7))
    b = 0.01 * jnp.arange(7, dtype=jnp.float32)
    ref = _conv(x, w, b, (1, 1, 1))
    got = unfold(conv_folded(fold(x, 1), w, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("stride", [(2, 2, 2), (1, 2, 2), (2, 1, 1)])
def test_conv_folded_matches_legacy_strided(stride):
    from dg_tta_tpu.models.unet import _conv
    key = jax.random.PRNGKey(4)
    x = _data((1, 6, 8, 8, 3), 2)
    w = 0.1 * jax.random.normal(key, (3, 3, 3, 3, 5))
    b = jnp.zeros((5,))
    ref = _conv(x, w, b, stride)
    out5, D2, H2, W2 = conv_folded(fold(x, 1), w, b, stride)
    assert out5.shape == ref.shape, (out5.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(out5), np.asarray(ref),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("deep", [False, True])
def test_unet_apply_folded_equivalence(deep):
    assert foldable(SPEC3)
    params = init_unet_params(jax.random.PRNGKey(0), SPEC3)
    x = _data((2, 8, 12, 16, 1))
    ref = unet_apply(params, x, SPEC3, deep_supervision=deep)
    got = unet_apply_folded(params, x, SPEC3, deep_supervision=deep)
    if not deep:
        ref, got = [ref], [got]
    for r, g in zip(ref, got):
        assert r.shape == g.shape
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=0, atol=2e-4)


def test_unet_apply_folded_head_idx_bf16():
    params = init_unet_params(jax.random.PRNGKey(1), SPEC3)
    x = _data((1, 8, 12, 16, 1), 5)
    idx = np.asarray([3, 0, 2], np.int32)
    ref = unet_apply(params, x, SPEC3, compute_dtype=jnp.bfloat16,
                     head_channel_idx=idx)
    got = unet_apply_folded(params, x, SPEC3, compute_dtype=jnp.bfloat16,
                            head_channel_idx=idx)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    r = np.asarray(ref, np.float32)
    g = np.asarray(got, np.float32)
    tol = 0.05 * float(np.abs(r).max() + 1e-6)
    assert float(np.abs(r - g).max()) < tol


def test_unet_apply_folded_grads():
    params = init_unet_params(jax.random.PRNGKey(2), SPEC3)
    x = _data((1, 8, 12, 16, 1), 7)

    def loss(fn):
        def f(p):
            return jnp.sum(fn(p, x, SPEC3).astype(jnp.float32) ** 2)
        return f

    g_ref = jax.grad(loss(unet_apply))(params)
    g_fold = jax.grad(loss(unet_apply_folded))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fold)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=5e-3)
