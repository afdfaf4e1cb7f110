"""Tests for soft dice loss, dice coeff, and label mapping semantics."""

import numpy as np
import jax.numpy as jnp

from dg_tta_tpu.core.losses import soft_dice_loss, dice_coeff, consistency_loss
from dg_tta_tpu.core.labels import (
    generate_label_mapping,
    get_map_idxs,
    map_label_logits,
    map_label_argmaxed,
)


def _torch_soft_dice(a, b):
    # independent numpy re-derivation of torch_utils.py:90-104 semantics
    B = a.shape[0]
    C = a.shape[-1]
    af = a.reshape(B, -1, C)
    bf = b.reshape(B, -1, C)
    nom = (2 * af * bf).mean(1)
    den = 0.5 * ((af + bf) ** 2).mean(1)
    if den.sum() == 0:
        return np.ones_like(nom)
    return nom / den


def test_soft_dice_identical_inputs(rng):
    x = np.abs(rng.standard_normal((2, 4, 4, 4, 3))).astype(np.float32)
    d = np.asarray(soft_dice_loss(jnp.asarray(x), jnp.asarray(x)))
    ref = _torch_soft_dice(x, x)
    np.testing.assert_allclose(d, ref, rtol=1e-5)
    np.testing.assert_allclose(d, np.ones_like(d), rtol=1e-5)


def test_soft_dice_zero_guard():
    z = jnp.zeros((1, 2, 2, 2, 2))
    d = np.asarray(soft_dice_loss(z, z))
    np.testing.assert_allclose(d, 1.0)


def test_soft_dice_random(rng):
    a = np.abs(rng.standard_normal((2, 3, 4, 5, 4))).astype(np.float32)
    b = np.abs(rng.standard_normal((2, 3, 4, 5, 4))).astype(np.float32)
    d = np.asarray(soft_dice_loss(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(d, _torch_soft_dice(a, b), rtol=1e-4)


def test_consistency_loss_zero_for_equal(rng):
    logits = rng.standard_normal((1, 4, 4, 4, 3)).astype(np.float32) + 1.0
    loss = float(consistency_loss(jnp.asarray(logits), jnp.asarray(logits)))
    assert loss < 1e-5


def test_dice_coeff_perfect():
    seg = jnp.asarray(np.random.default_rng(1).integers(0, 3, (4, 4, 4)))
    d = np.asarray(dice_coeff(seg, seg, 3))
    np.testing.assert_allclose(d, 1.0, atol=1e-6)


def test_dice_coeff_disjoint():
    a = jnp.ones((4, 4, 4), jnp.int32)
    b = jnp.zeros((4, 4, 4), jnp.int32)
    d = np.asarray(dice_coeff(a, b, 2))
    np.testing.assert_allclose(d, 0.0, atol=1e-6)


def test_generate_label_mapping():
    src = {"background": 0, "liver": 3, "spleen": 5}
    tgt = {"background": 0, "spleen": 1, "kidney": 2, "liver": 4}
    m = generate_label_mapping(src, tgt)
    assert m == {"background": (0, 0), "liver": (3, 4), "spleen": (5, 1)}


def test_get_map_idxs_and_map_label():
    mapping = {"background": (0, 0), "liver": (3, 4), "spleen": (5, 1)}
    opt = ["background", "liver", "spleen"]
    pre = get_map_idxs(mapping, opt, "pretrain_labels")
    tta = get_map_idxs(mapping, opt, "tta_labels")
    np.testing.assert_array_equal(pre, [0, 3, 5])
    np.testing.assert_array_equal(tta, [0, 4, 1])

    logits = np.zeros((1, 2, 2, 2, 6), np.float32)
    logits[..., 3] = 7.0
    out = np.asarray(map_label_logits(jnp.asarray(logits), pre))
    assert out.shape[-1] == 3
    np.testing.assert_allclose(out[..., 1], 7.0)

    seg = np.array([[0, 4, 1, 2]], np.int32)
    mapped = np.asarray(map_label_argmaxed(jnp.asarray(seg), tta))
    np.testing.assert_array_equal(mapped, [[0, 1, 2, 0]])
