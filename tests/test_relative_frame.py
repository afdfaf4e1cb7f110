"""Relative-frame consistency loss (DGTTA_REL_FRAME, tta/engine.py).

The relative path warps branch-a logits once by theta_rel = theta_a^-1 ∘
theta_b into branch-b's frame instead of inverse-warping both branches to
the original frame (reference math: /root/reference/dg_tta/tta/tta.py:
549-575 does the two inverse warps).  For integer-voxel translations the
reparametrization is an exact lattice bijection, so the two losses are
EQUAL — that pins the composition orientation and the analytic inside-
mask.  For the real near-identity affine family the deviation is the
O(h) off-grid/rotation term, bounded here and by tools/approx_budget.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dg_tta_tpu.core.fields import compose_affine, get_rand_affine
from dg_tta_tpu.core.grid import affine_inside_mask_flat
from dg_tta_tpu.core.losses import consistency_loss_flat
from dg_tta_tpu.ops.warp_shear import warp_affine_shear
from tests.test_tta_engine import tiny_model, synth_volume

IDX3 = np.arange(3, dtype=np.int32)


def _translation_theta(tvox, spatial):
    """theta for an integer-voxel translation: sampling coordinate
    x' = x + 2*k/size per axis (align_corners=False)."""
    D, H, W = spatial
    tx, ty, tz = (2.0 * tvox[2] / W, 2.0 * tvox[1] / H, 2.0 * tvox[0] / D)
    th = np.eye(3, 4, dtype=np.float32)
    th[0, 3], th[1, 3], th[2, 3] = tx, ty, tz
    return jnp.asarray(th[None])


def _orig_loss(la, lb, tha_inv, thb_inv, spatial):
    la_u = warp_affine_shear(la, tha_inv, spatial, padding_mode="zeros",
                             align_corners=False)
    lb_u = warp_affine_shear(lb, thb_inv, spatial, padding_mode="zeros",
                             align_corners=False)
    return consistency_loss_flat(la_u, lb_u, start_class=1)


def _rel_loss(la, lb, tha_inv, thb, spatial):
    theta_rel = compose_affine(tha_inv, thb)
    la_b = warp_affine_shear(la, theta_rel, spatial, padding_mode="zeros",
                             align_corners=False)
    mask = affine_inside_mask_flat(thb, spatial)
    return consistency_loss_flat(la_b, lb * mask, start_class=1)


def test_integer_translation_losses_exactly_equal():
    """Integer translations: lattice bijection -> identical loss terms.

    Power-of-2 sizes make the normalized-coordinate arithmetic exact
    (dyadic), so the losses are BIT-equal.  With non-dyadic sizes the two
    framings differ through a numerical artifact of the ORIGINAL form:
    f32 rounding leaves ~1e-7 residues in the zeros band, which pass the
    reference's sum>0 mask quirk (core/losses.py:63-67) and contribute
    uniform-softmax mass — the relative frame's analytic inside-mask has
    no such leak (measured: 0.2117 vs 0.2229 on a (10,12,14) patch)."""
    spatial = (8, 16, 32)
    N = int(np.prod(spatial))
    C = 5
    rng = np.random.default_rng(0)
    la = jnp.asarray(rng.normal(size=(1, C, N)).astype(np.float32))
    lb = jnp.asarray(rng.normal(size=(1, C, N)).astype(np.float32))
    tha = _translation_theta((2, -1, 3), spatial)
    thb = _translation_theta((-1, 2, -2), spatial)
    tha_inv = _translation_theta((-2, 1, -3), spatial)
    thb_inv = _translation_theta((1, -2, 2), spatial)

    l_orig = float(_orig_loss(la, lb, tha_inv, thb_inv, spatial))
    l_rel = float(_rel_loss(la, lb, tha_inv, thb, spatial))
    assert np.isclose(l_orig, l_rel, atol=1e-6), (l_orig, l_rel)


def test_identical_warps_relative_is_identity():
    """theta_a == theta_b: theta_rel == I, so the relative warp returns
    branch-a logits unchanged (up to the inside-mask)."""
    spatial = (8, 10, 12)
    N = int(np.prod(spatial))
    rng = np.random.default_rng(1)
    la = jnp.asarray(rng.normal(size=(1, 4, N)).astype(np.float32))
    th, th_inv = get_rand_affine(jax.random.PRNGKey(3), 1)
    theta_rel = compose_affine(th_inv, th)
    np.testing.assert_allclose(np.asarray(theta_rel)[0],
                               np.eye(3, 4), atol=1e-5)
    la_b = warp_affine_shear(la, theta_rel, spatial, padding_mode="zeros",
                             align_corners=False)
    np.testing.assert_allclose(np.asarray(la_b), np.asarray(la), atol=1e-4)


def test_near_identity_family_loss_deviation_bounded():
    """The reference augmentation family (strength 0.05): relative-frame
    loss tracks the original-frame loss closely."""
    spatial = (12, 14, 16)
    N = int(np.prod(spatial))
    C = 6
    rng = np.random.default_rng(2)
    # structured logits (smooth blobs), not white noise — white noise makes
    # any resampled comparison maximally pessimistic
    base = rng.normal(size=(1, C, *spatial)).astype(np.float32)
    from scipy.ndimage import gaussian_filter
    base = np.stack([[gaussian_filter(b, 2.0) * 8 for b in bb]
                     for bb in base])
    la = jnp.asarray(base.reshape(1, C, N))
    lb = jnp.asarray((base + 0.1 * rng.normal(size=base.shape)
                      ).astype(np.float32).reshape(1, C, N))
    diffs, vals = [], []
    for seed in range(4):
        tha, tha_inv = get_rand_affine(jax.random.PRNGKey(seed), 1)
        thb, thb_inv = get_rand_affine(jax.random.PRNGKey(100 + seed), 1)
        lo = float(_orig_loss(la, lb, tha_inv, thb_inv, spatial))
        lr = float(_rel_loss(la, lb, tha_inv, thb, spatial))
        diffs.append(abs(lo - lr))
        vals.append(lo)
    assert max(diffs) < 0.05, (diffs, vals)


def test_engine_relative_frame_runs_and_tracks_original(monkeypatch):
    """Engine-level: with DGTTA_REL_FRAME=1 (forced shear), member_run
    runs end-to-end, produces finite losses and genuinely adapted params,
    and its loss trajectory tracks the original-frame shear engine
    closely (same patches/augs, only the loss frame differs)."""
    from dg_tta_tpu.tta.engine import make_tta_functions
    from dg_tta_tpu.tta.plan import TTAPlan

    monkeypatch.setenv("DGTTA_AFFINE_SHEAR", "1")
    m = tiny_model()
    plan = TTAPlan(epochs=4, patches_to_be_accumulated=2, lr=1e-3,
                   ensemble_count=1)
    params = m.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    vols = synth_volume(rng)[None]
    shapes = jnp.asarray([[24.0, 28.0, 20.0]])

    out = {}
    for rel in ("0", "1"):
        monkeypatch.setenv("DGTTA_REL_FRAME", rel)
        fns = make_tta_functions(m, plan, IDX3, IDX3)
        p, losses, _ = fns.member_run(params, jax.random.PRNGKey(1), vols,
                                      shapes, None)
        losses = np.asarray(losses)
        assert np.all(np.isfinite(losses)), (rel, losses)
        out[rel] = (p, losses)

    a, b = out["0"][1], out["1"][1]
    assert np.max(np.abs(a - b)) < 0.02, (a, b)
    # adaptation actually moved the parameters in relative mode
    l0 = jax.tree.leaves(params)[0]
    l1 = jax.tree.leaves(out["1"][0])[0]
    assert not np.allclose(np.asarray(l0), np.asarray(l1))
