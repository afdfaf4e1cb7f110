"""Sliding-window inference tests vs a slow numpy oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from dg_tta_tpu.infer.sliding_window import (
    compute_gaussian,
    compute_steps_for_sliding_window,
    make_sliding_window_predictor,
    predict_volume,
    window_origins,
)
from tests.test_tta_engine import tiny_model


def test_gaussian_properties():
    g = compute_gaussian((16, 16, 16))
    assert g.shape == (16, 16, 16)
    assert np.isclose(g.max(), 10.0)
    assert g.argmax() == np.ravel_multi_index((8, 8, 8), g.shape)
    assert (g > 0).all()


def test_steps_cover_and_overlap():
    steps = compute_steps_for_sliding_window((40, 16, 33), (16, 16, 16))
    # first at 0, last flush with the end, overlap >= 50%
    for st, size in zip(steps, (40, 16, 33)):
        assert st[0] == 0 and st[-1] == size - 16
        assert all(b - a <= 8 for a, b in zip(st, st[1:]))


def test_equals_direct_forward_when_single_window():
    m = tiny_model()
    params = m.init_params(jax.random.PRNGKey(0))
    vol = jnp.asarray(
        np.random.default_rng(0).normal(size=(16, 16, 16, 1)).astype(np.float32))
    stacked = jax.tree.map(lambda p: p[None], params)
    logits = predict_volume(m, stacked, vol, bucket_multiple=1)
    direct = m.apply(params, vol[None])[0]
    np.testing.assert_allclose(np.asarray(logits), np.asarray(direct),
                               atol=1e-4, rtol=1e-4)


def test_matches_numpy_accumulation_oracle():
    m = tiny_model()
    params = m.init_params(jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    vol = jnp.asarray(rng.normal(size=(24, 16, 20, 1)).astype(np.float32))
    stacked = jax.tree.map(lambda p: p[None], params)
    logits = predict_volume(m, stacked, vol)

    # the oracle models predict_volume's bucket-padding: accumulate over the
    # 32-rounded padded volume, then crop back
    vmin = float(np.asarray(vol).min())
    pads = [((32 - s) // 2, (32 - s) - (32 - s) // 2) for s in (24, 16, 20)]
    volp = np.pad(np.asarray(vol), pads + [(0, 0)], constant_values=vmin)
    g = compute_gaussian((16, 16, 16))[..., None]
    acc = np.zeros((32, 32, 32, 4), np.float32)
    wacc = np.zeros((32, 32, 32, 1), np.float32)
    origins, valid = window_origins((32, 32, 32), (16, 16, 16))
    for (z, y, x), v in zip(origins, valid):
        if not v:
            continue
        patch = volp[z:z + 16, y:y + 16, x:x + 16]
        out = np.asarray(m.apply(params, patch[None])[0])
        acc[z:z + 16, y:y + 16, x:x + 16] += out * g
        wacc[z:z + 16, y:y + 16, x:x + 16] += g
    oracle = (acc / wacc)[pads[0][0]:pads[0][0] + 24,
                          pads[1][0]:pads[1][0] + 16,
                          pads[2][0]:pads[2][0] + 20]
    np.testing.assert_allclose(np.asarray(logits), oracle, atol=1e-3, rtol=1e-3)


def test_ensemble_averaging():
    m = tiny_model()
    p1 = m.init_params(jax.random.PRNGKey(2))
    p2 = m.init_params(jax.random.PRNGKey(3))
    vol = jnp.asarray(
        np.random.default_rng(2).normal(size=(16, 16, 16, 1)).astype(np.float32))
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), p1, p2)
    logits = predict_volume(m, stacked, vol, bucket_multiple=1)
    mean_direct = 0.5 * (m.apply(p1, vol[None])[0] + m.apply(p2, vol[None])[0])
    np.testing.assert_allclose(np.asarray(logits), np.asarray(mean_direct),
                               atol=1e-4, rtol=1e-4)


def test_modifiers_applied_at_inference():
    """flip-in/flip-out modifiers on a flipped volume must reproduce the
    flipped prediction of the unmodified volume (reference behavior: the
    modifier hooks live on the model the predictor uses,
    nnunet_utils.py:116-125)."""
    m = tiny_model()
    params = m.init_params(jax.random.PRNGKey(5))
    vol = jnp.asarray(
        np.random.default_rng(5).normal(size=(16, 16, 16, 1)).astype(np.float32))
    stacked = jax.tree.map(lambda p: p[None], params)
    base = predict_volume(m, stacked, vol, bucket_multiple=1)

    flip = lambda x: jnp.flip(x, axis=1)
    mod = predict_volume(m, stacked, jnp.flip(vol, axis=0),
                         modify_input_fn=flip, modify_output_fn=flip,
                         bucket_multiple=1)
    np.testing.assert_allclose(np.asarray(mod),
                               np.asarray(jnp.flip(base, axis=0)),
                               atol=1e-5, rtol=1e-5)


def test_predictor_cache_no_recompile_across_shapes():
    """Two volumes of different sizes in the same 32-bucket must share one
    compiled program (the driver's per-volume recompile bug, VERDICT r1)."""
    from dg_tta_tpu.infer.sliding_window import get_cached_predictor

    m = tiny_model()
    params = m.init_params(jax.random.PRNGKey(6))
    stacked = jax.tree.map(lambda p: p[None], params)
    pred = get_cached_predictor(m)
    assert get_cached_predictor(m) is pred
    rng = np.random.default_rng(6)
    v1 = jnp.asarray(rng.normal(size=(24, 18, 20, 1)).astype(np.float32))
    v2 = jnp.asarray(rng.normal(size=(22, 17, 26, 1)).astype(np.float32))
    predict_volume(m, stacked, v1, predictor=pred)
    n_after_first = pred._cache_size()
    predict_volume(m, stacked, v2, predictor=pred)
    assert pred._cache_size() == n_after_first


def test_window_batch_matches_unbatched():
    """wb>1 groups windows into one member forward (true batch axis); the
    result must match the historical wb=1 program (exact for key-free
    models — the accumulator updates run in the same window order)."""
    m = tiny_model()
    params = m.init_params(jax.random.PRNGKey(7))
    rng = np.random.default_rng(7)
    vol = jnp.asarray(rng.normal(size=(26, 19, 22, 1)).astype(np.float32))
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                           params, m.init_params(jax.random.PRNGKey(8)))
    ref = predict_volume(m, stacked, vol, window_batch=1)
    for wb in (2, 4):
        got = predict_volume(m, stacked, vol, window_batch=wb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_window_batch_mind_noise_finite():
    """MIND models consume the key at inference; wb>1 re-splits it per
    group, so only shape/finiteness (not bit-equality) is pinned."""
    import dataclasses

    m = dataclasses.replace(tiny_model(in_ch=12),
                            trainer_name="nnUNetTrainer_MIND",
                            uses_gin_internal=False, uses_mind=True)
    params = m.init_params(jax.random.PRNGKey(9))
    vol = jnp.asarray(np.random.default_rng(9)
                      .normal(size=(18, 16, 17, 1)).astype(np.float32))
    stacked = jax.tree.map(lambda p: p[None], params)
    out = predict_volume(m, stacked, vol, key=jax.random.PRNGKey(1),
                         window_batch=2)
    assert out.shape == (18, 16, 17, m.spec.num_classes)
    assert np.all(np.isfinite(np.asarray(out)))


def test_small_volume_padded():
    m = tiny_model()
    params = m.init_params(jax.random.PRNGKey(4))
    vol = jnp.asarray(
        np.random.default_rng(4).normal(size=(10, 12, 9, 1)).astype(np.float32))
    stacked = jax.tree.map(lambda p: p[None], params)
    logits = predict_volume(m, stacked, vol)
    assert logits.shape == (10, 12, 9, 4)
    assert np.all(np.isfinite(np.asarray(logits)))
