"""TTA engine behavior tests on a tiny model (CPU backend).

Covers the reference's driver-loop semantics (tta.py:157-374): gradient
accumulation + masked release, the have_grad_in config quirk, warmup epochs,
and that adaptation actually reduces the consistency loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dg_tta_tpu.models.network import Model
from dg_tta_tpu.models.plans import ArchSpec
from dg_tta_tpu.tta.engine import (
    make_tta_functions,
    params_with_grad_mask,
    tta_one_volume,
)
from dg_tta_tpu.tta.plan import TTAPlan


def tiny_model(num_classes=4, in_ch=1):
    spec = ArchSpec(
        features_per_stage=(8, 16),
        kernel_sizes=((3, 3, 3), (3, 3, 3)),
        strides=((1, 1, 1), (2, 2, 2)),
        n_conv_per_stage_encoder=(1, 1),
        n_conv_per_stage_decoder=(1,),
        num_input_channels=in_ch,
        num_classes=num_classes,
    )
    return Model(spec=spec, patch_size=(16, 16, 16), trainer_name="nnUNetTrainer_GIN",
                 uses_gin_internal=True, uses_mind=False)


def synth_volume(rng, shape=(24, 28, 20)):
    """A volume with a bright blob so the consistency task is non-trivial."""
    vol = rng.normal(size=(*shape, 1)).astype(np.float32) * 0.1
    d, h, w = shape
    vol[d // 4: d // 2, h // 4: h // 2, w // 4: w // 2] += 2.0
    return jnp.asarray(vol)


IDX3 = np.arange(3, dtype=np.int32)


def _run(plan, epochs_params=None, seed=0, labels=None):
    m = tiny_model()
    params = m.init_params(jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    vol = synth_volume(rng)
    vols = vol[None]
    shapes = jnp.asarray([[24.0, 28.0, 20.0]])
    out = tta_one_volume(
        m, plan, params, vols, shapes, IDX3, IDX3,
        jax.random.PRNGKey(seed + 1), labels_padded=labels)
    return params, out


def test_loss_decreases_and_params_adapt():
    plan = TTAPlan(epochs=6, patches_to_be_accumulated=4, lr=1e-3,
                   ensemble_count=2)
    params0, (params, losses, dices) = _run(plan)
    assert losses.shape == (6, 2)
    # warmup epoch 0 computes a loss; adaptation should reduce it
    assert float(losses[1:].mean(-1).min()) < float(losses[0].mean())
    # ensembles diverge (different PRNG streams)
    leaf = jax.tree.leaves(params)[0]
    assert not np.allclose(np.asarray(leaf[0]), np.asarray(leaf[1]))


def test_have_grad_in_branch_b_is_noop():
    plan = TTAPlan(epochs=2, patches_to_be_accumulated=2, lr=1e-2,
                   ensemble_count=1, have_grad_in="branch_b")
    params0, (params, losses, _) = _run(plan)
    for p0, p in zip(jax.tree.leaves(params0), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p[0]))


def test_warmup_epoch_does_not_update():
    plan = TTAPlan(epochs=1, patches_to_be_accumulated=2, lr=1e-2,
                   ensemble_count=1, start_tta_at_epoch=1)
    params0, (params, losses, _) = _run(plan)
    for p0, p in zip(jax.tree.leaves(params0), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p[0]))


def test_params_with_grad_masking():
    m = tiny_model()
    params = m.init_params(jax.random.PRNGKey(0))

    mask = params_with_grad_mask(params, "norms")
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    for path, v in flat:
        keys = [p.key for p in path if hasattr(p, "key")]
        assert v == ("norm" in keys)

    mask = params_with_grad_mask(params, "encoder")
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    for path, v in flat:
        keys = [p.key for p in path if hasattr(p, "key")]
        assert v == (keys[0] == "encoder")


def test_norms_only_updates_norm_params():
    plan = TTAPlan(epochs=3, patches_to_be_accumulated=2, lr=1e-2,
                   ensemble_count=1, params_with_grad="norms")
    params0, (params, _, _) = _run(plan)
    flat0 = jax.tree_util.tree_flatten_with_path(params0)[0]
    flat1 = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(lambda p: p[0], params))[0]
    changed_any_norm = False
    for (path, p0), (_, p1) in zip(flat0, flat1):
        keys = [p.key for p in path if hasattr(p, "key")]
        if "norm" in keys:
            changed_any_norm |= not np.allclose(np.asarray(p0), np.asarray(p1))
        else:
            np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    assert changed_any_norm


def test_eval_dice_with_labels():
    plan = TTAPlan(epochs=2, patches_to_be_accumulated=2, lr=1e-3,
                   ensemble_count=1)
    rng = np.random.default_rng(3)
    lab = (rng.integers(0, 3, size=(24, 28, 20, 1))).astype(np.float32)
    _, (params, losses, dices) = _run(plan, labels=jnp.asarray(lab)[None])
    d = np.asarray(dices)
    assert d.shape == (2, 1)
    assert np.all(np.isfinite(d)) and np.all(d >= 0.0) and np.all(d <= 1.0)


def test_deformable_spatial_aug_path():
    plan = TTAPlan(epochs=2, patches_to_be_accumulated=2, lr=1e-3,
                   ensemble_count=1, spatial_aug_type="deformable")
    _, (params, losses, _) = _run(plan)
    assert np.all(np.isfinite(np.asarray(losses)))


def test_across_volumes_mixed_shapes():
    """Stacked volumes of different true shapes share one bucket; patches
    honor each volume's true extent."""
    m = tiny_model()
    params = m.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    v1 = synth_volume(rng, (24, 28, 20))
    v2 = synth_volume(rng, (18, 22, 26))
    from dg_tta_tpu.core.patches import bucket_shape_for, pad_to_bucket
    bucket = bucket_shape_for((24, 28, 26))
    vols = jnp.stack([pad_to_bucket(v1, bucket, float(v1.min())),
                      pad_to_bucket(v2, bucket, float(v2.min()))])
    shapes = jnp.asarray([[24.0, 28.0, 20.0], [18.0, 22.0, 26.0]])
    plan = TTAPlan(epochs=2, patches_to_be_accumulated=2, lr=1e-3,
                   ensemble_count=1, tta_across_all_samples=True)
    params_out, losses, _ = tta_one_volume(
        m, plan, params, vols, shapes, IDX3, IDX3, jax.random.PRNGKey(1))
    assert np.all(np.isfinite(np.asarray(losses)))


def test_intensity_aug_disabled_matches_gin_none():
    """intensity_aug_function='disabled' and do_intensity_aug_in='none' are
    equivalent paths (INTENSITY_AUG_FUNCTION_DICT disabled = identity)."""
    m = tiny_model()
    params = m.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(6)
    vol = synth_volume(rng)[None]
    shapes = jnp.asarray([[24.0, 28.0, 20.0]])
    outs = []
    for kw in (dict(intensity_aug_function="disabled",
                    do_intensity_aug_in="both"),
               dict(intensity_aug_function="GIN",
                    do_intensity_aug_in="none")):
        plan = TTAPlan(epochs=1, patches_to_be_accumulated=2, lr=1e-3,
                       ensemble_count=1, **kw)
        p, losses, _ = tta_one_volume(m, plan, params, vol, shapes, IDX3,
                                      IDX3, jax.random.PRNGKey(2))
        outs.append(np.asarray(losses))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6)


def test_fast_warp_adjoint_close_to_exact():
    """The inverse-map adjoint (backward gather instead of scatter) must give
    gradients close to exact autograd for the near-identity branch warps."""
    m = tiny_model()
    params = m.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    vol = synth_volume(rng)[None]
    shapes = jnp.asarray([[24.0, 28.0, 20.0]])
    plan = TTAPlan(epochs=1, patches_to_be_accumulated=1, lr=1e-3,
                   ensemble_count=1)

    grads = {}
    for exact in (True, False):
        fns = make_tta_functions(m, plan, IDX3, IDX3, exact_warp_grad=exact)
        # reach inside: value_and_grad of one fixed draw via epoch_train with
        # SGD-free comparison -> run one train epoch from identical state and
        # compare the parameter delta (proportional to the gradient step)
        p_in = jax.tree.map(jnp.array, params)  # epoch_train donates its args
        opt = fns.init_opt_state(p_in)
        p2, _, loss = fns.epoch_train(p_in, opt, jax.random.PRNGKey(5),
                                      vol, shapes)
        grads[exact] = jax.tree.map(lambda a, b: np.asarray(a - b),
                                    p2, params)

    flat_e = np.concatenate([g.ravel() for g in jax.tree.leaves(grads[True])])
    flat_f = np.concatenate([g.ravel() for g in jax.tree.leaves(grads[False])])
    denom = np.linalg.norm(flat_e) * np.linalg.norm(flat_f)
    cos = float(flat_e @ flat_f / (denom + 1e-12))
    # AdamW normalizes magnitudes; direction agreement is the meaningful test
    assert cos > 0.95, cos


def test_patch_group_equivalent_distribution():
    """patch_group folds accumulation steps into the batch; the loss scale
    and update magnitude must match the ungrouped run statistically."""
    m = tiny_model()
    params = m.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(9)
    vol = synth_volume(rng)[None]
    shapes = jnp.asarray([[24.0, 28.0, 20.0]])
    plan = TTAPlan(epochs=1, patches_to_be_accumulated=4, lr=1e-3,
                   ensemble_count=1, start_tta_at_epoch=0)

    outs = {}
    for g in (1, 2, 4):
        fns = make_tta_functions(m, plan, IDX3, IDX3, patch_group=g)
        p_in = jax.tree.map(jnp.array, params)
        opt = fns.init_opt_state(p_in)
        p2, _, loss = fns.epoch_train(p_in, opt, jax.random.PRNGKey(7), vol,
                                      shapes)
        delta = np.concatenate([
            np.asarray(a - b).ravel()
            for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(params))])
        outs[g] = (float(loss), float(np.linalg.norm(delta)))

    losses = [outs[g][0] for g in (1, 2, 4)]
    norms = [outs[g][1] for g in (1, 2, 4)]
    # same distribution, different draws: loss values in the same ballpark
    assert max(losses) < 3 * min(losses) + 1e-3, losses
    assert max(norms) < 3 * min(norms), norms


def test_member_streams_stable_under_subset_and_chunking():
    """A member's adaptation must be identical whether it runs in the full
    vmapped ensemble, alone (resume subset), or chunked — the PRNG stream is
    keyed by the GLOBAL member id (per-(sample, ensemble) resume support)."""
    m = tiny_model()
    params = m.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(9)
    vols = synth_volume(rng)[None]
    shapes = jnp.asarray([[24.0, 28.0, 20.0]])
    plan = TTAPlan(epochs=3, patches_to_be_accumulated=2, lr=1e-3,
                   ensemble_count=3)
    key = jax.random.PRNGKey(7)

    full, losses_full, _ = tta_one_volume(
        m, plan, params, vols, shapes, IDX3, IDX3, key)
    solo, losses_solo, _ = tta_one_volume(
        m, plan, params, vols, shapes, IDX3, IDX3, key, member_indices=[1])
    chunked, _, _ = tta_one_volume(
        m, plan, params, vols, shapes, IDX3, IDX3, key, ensemble_chunk=1)

    # The full (vmapped or, under the test mesh, sharded) and single-member
    # programs compile differently, so bit-exactness is not expected.  A
    # wrong PRNG stream would change losses at the ~1e-2 scale of a patch
    # redraw; compile-noise shows up at ~1e-7.  Params need a looser bound:
    # AdamW's first step is ~sign(g)*lr, so float-noise sign flips on
    # near-zero gradients legitimately produce +-2*lr differences.
    np.testing.assert_allclose(np.asarray(losses_full)[:, 1],
                               np.asarray(losses_solo)[:, 0], rtol=1e-3)
    for a, b in zip(jax.tree.leaves(full), jax.tree.leaves(solo)):
        np.testing.assert_allclose(np.asarray(a)[1], np.asarray(b)[0],
                                   atol=3e-3)
    for a, b in zip(jax.tree.leaves(full), jax.tree.leaves(chunked)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-3)


def test_save_member_fn_called_per_member():
    m = tiny_model()
    params = m.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(10)
    vols = synth_volume(rng)[None]
    shapes = jnp.asarray([[24.0, 28.0, 20.0]])
    plan = TTAPlan(epochs=1, patches_to_be_accumulated=1, lr=1e-3,
                   ensemble_count=3)
    saved = {}
    tta_one_volume(m, plan, params, vols, shapes, IDX3, IDX3,
                   jax.random.PRNGKey(1), member_indices=[0, 2],
                   save_member_fn=lambda i, p, l, d: saved.update({i: l}))
    assert sorted(saved) == [0, 2]
    assert all(v.shape == (1,) for v in saved.values())


def test_shear_engine_matches_grid_engine_closely(monkeypatch):
    """DGTTA_AFFINE_SHEAR=1 swaps the affine branch warps for the MXU
    3-pass shear resampler (ops/warp_shear.py).  Same seeds -> same draws,
    so the per-epoch losses must track the XLA-trilinear engine within the
    multi-pass kernel difference, and adaptation must still work."""
    plan = TTAPlan(epochs=3, patches_to_be_accumulated=2, lr=1e-3,
                   params_with_grad="all")
    losses = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("DGTTA_AFFINE_SHEAR", mode)
        from dg_tta_tpu.tta import engine as eng
        eng._TTA_FNS_CACHE.clear()  # env changes invalidate cached fns
        _, out = _run(plan, seed=11)
        losses[mode] = np.asarray(out[1]).mean(axis=-1).ravel()
        eng._TTA_FNS_CACHE.clear()
    for l in losses.values():
        assert np.isfinite(l).all()
        assert l[-1] < l[0]  # both engines adapt
    # same seeds, same augmentation draws; only the resampling filter
    # differs -> losses close but not necessarily identical
    np.testing.assert_allclose(losses["1"], losses["0"], rtol=0.15, atol=0.02)
