"""z-packed U-Net (models/unet_zpack.py) vs the reference-pinned z-tap
implementation (models/unet.py — itself torch-pinned in test_unet.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dg_tta_tpu.models.plans import ArchSpec
from dg_tta_tpu.models.unet import _conv, init_unet_params, unet_apply
from dg_tta_tpu.models.unet_zpack import (
    _group_for,
    conv_packed,
    pack_z,
    unpack_z,
    unet_apply_zpack,
)


def small_spec(n_stages=3, feats=(8, 16, 32), classes=5, cin=1):
    return ArchSpec(
        features_per_stage=feats[:n_stages],
        kernel_sizes=((3, 3, 3),) * n_stages,
        strides=((1, 1, 1),) + ((2, 2, 2),) * (n_stages - 1),
        n_conv_per_stage_encoder=(2,) * n_stages,
        n_conv_per_stage_decoder=(2,) * (n_stages - 1),
        num_input_channels=cin,
        num_classes=classes,
    )


def test_pack_roundtrip():
    x = jnp.arange(2 * 8 * 3 * 4 * 6, dtype=jnp.float32).reshape(2, 8, 3, 4, 6)
    for G in (1, 2, 4):
        np.testing.assert_array_equal(unpack_z(pack_z(x, G), G), x)


def test_group_for(monkeypatch):
    # defaults MAXLANES=128 + MAXG=2: the measured-best v5e config
    # (PERF.md round 3k member_run sweep) — G=2 wherever it divides
    assert _group_for(32, 112) == 2
    assert _group_for(64, 56) == 2
    assert _group_for(128, 28) == 1    # 2*128 lanes > MAXLANES
    assert _group_for(32, 7) == 1      # divisibility cap
    # lifting the G cap recovers the wide packing
    monkeypatch.setenv("DGTTA_ZPACK_MAXG", "0")
    assert _group_for(32, 112) == 4
    assert _group_for(32, 112, max_lanes=64) == 2
    assert _group_for(32, 6) == 2      # divisibility cap
    assert _group_for(32, 7) == 1


@pytest.mark.parametrize("G,ci,co", [(4, 8, 8), (2, 8, 16), (4, 16, 8)])
def test_conv_packed_matches_conv(G, ci, co):
    key = jax.random.PRNGKey(0)
    B, D, H, W = 2, 8, 6, 10
    x = jax.random.normal(key, (B, D, H, W, ci))
    w = 0.3 * jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 3, ci, co))
    b = jax.random.normal(jax.random.fold_in(key, 2), (co,))
    ref = _conv(x, w, b)
    out = unpack_z(conv_packed(pack_z(x, G), w, b, G), G)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_conv_packed_grads_match():
    key = jax.random.PRNGKey(3)
    B, D, H, W, C, G = 1, 8, 5, 6, 4, 4
    x = jax.random.normal(key, (B, D, H, W, C))
    w = 0.3 * jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 3, C, C))
    b = jnp.zeros((C,))

    def loss_ref(w, x):
        return jnp.sum(_conv(x, w, b) ** 2)

    def loss_packed(w, x):
        return jnp.sum(conv_packed(pack_z(x, G), w, b, G) ** 2)

    gw_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(w, x)
    gw_pk, gx_pk = jax.grad(loss_packed, argnums=(0, 1))(w, x)
    np.testing.assert_allclose(np.asarray(gw_pk), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_pk), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("G,ci,co", [(4, 8, 16), (2, 8, 8)])
def test_conv_packed_strided_matches_conv(G, ci, co):
    """z-stride-2 packed conv (consumes group G, emits G//2) vs _conv."""
    from dg_tta_tpu.models.unet_zpack import conv_packed_multi
    key = jax.random.PRNGKey(21)
    B, D, H, W = 2, 8, 6, 10
    x = jax.random.normal(key, (B, D, H, W, ci))
    w = 0.3 * jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 3, ci, co))
    b = jax.random.normal(jax.random.fold_in(key, 2), (co,))
    ref = _conv(x, w, b, (2, 2, 2))
    out = conv_packed_multi([pack_z(x, G)], w, b, G, [ci], (2, 2, 2))
    out = unpack_z(out, G // 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_conv_packed_multi_matches_concat():
    """Two-section packed conv == conv of the materialized concat."""
    from dg_tta_tpu.models.unet_zpack import conv_packed_multi
    key = jax.random.PRNGKey(23)
    B, D, H, W, G = 1, 8, 5, 6, 4
    c1, c2, co = 4, 6, 8
    a = jax.random.normal(key, (B, D, H, W, c1))
    s = jax.random.normal(jax.random.fold_in(key, 1), (B, D, H, W, c2))
    w = 0.3 * jax.random.normal(jax.random.fold_in(key, 2),
                                (3, 3, 3, c1 + c2, co))
    b = jnp.zeros((co,))
    ref = _conv(jnp.concatenate([a, s], axis=-1), w, b)
    out = conv_packed_multi([pack_z(a, G), pack_z(s, G)], w, b, G, [c1, c2])
    np.testing.assert_allclose(np.asarray(unpack_z(out, G)), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_transpconv_packed_matches():
    from dg_tta_tpu.models.unet import _conv_transpose
    from dg_tta_tpu.models.unet_zpack import transpconv_packed
    key = jax.random.PRNGKey(29)
    B, D, H, W, ci, o, Gb = 2, 6, 4, 5, 8, 4, 2
    x = jax.random.normal(key, (B, D, H, W, ci))
    w = 0.3 * jax.random.normal(jax.random.fold_in(key, 1), (2, 2, 2, o, ci))
    b = jax.random.normal(jax.random.fold_in(key, 2), (o,))
    ref = _conv_transpose(x, w, b, (2, 2, 2))
    out = transpconv_packed(pack_z(x, Gb), w, b, Gb, (2, 2, 2))
    np.testing.assert_allclose(np.asarray(unpack_z(out, 2 * Gb)),
                               np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_unet_zpack_full_grads_match():
    """End-to-end parameter gradients through the packed network (the TTA
    engine's actual use) against the z-tap network."""
    spec = small_spec()
    key = jax.random.PRNGKey(31)
    params = init_unet_params(key, spec)
    x = jax.random.normal(jax.random.fold_in(key, 1), (1, 8, 8, 8, 1))

    def loss(apply_fn):
        def f(p):
            return jnp.mean(apply_fn(p, x, spec).astype(jnp.float32) ** 2)
        return f

    g_ref = jax.grad(loss(unet_apply))(params)
    g_pk = jax.grad(loss(unet_apply_zpack))(params)
    for pr, pp in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pk)):
        np.testing.assert_allclose(np.asarray(pp), np.asarray(pr),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("deep", [False, True])
def test_unet_zpack_matches_unet(deep):
    spec = small_spec()
    key = jax.random.PRNGKey(7)
    params = init_unet_params(key, spec)
    x = jax.random.normal(jax.random.fold_in(key, 9), (2, 8, 12, 8, 1))
    ref = unet_apply(params, x, spec, deep_supervision=deep)
    out = unet_apply_zpack(params, x, spec, deep_supervision=deep)
    if not deep:
        ref, out = [ref], [out]
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=5e-5, atol=5e-5)


def test_unet_zpack_head_fold_and_bf16():
    spec = small_spec()
    key = jax.random.PRNGKey(11)
    params = init_unet_params(key, spec)
    x = jax.random.normal(jax.random.fold_in(key, 1), (1, 8, 8, 8, 1))
    idx = [0, 3, 4]
    ref = unet_apply(params, x, spec, compute_dtype=jnp.bfloat16,
                     head_channel_idx=idx)
    out = unet_apply_zpack(params, x, spec, compute_dtype=jnp.bfloat16,
                           head_channel_idx=idx)
    assert out.dtype == ref.dtype
    assert out.shape == ref.shape
    # bf16 rounding differs between the banded-dense and z-tap
    # accumulation orders; agreement is at bf16 resolution
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.15, atol=0.15)


def test_unet_zpack_mind_input_channels():
    """MIND trainers feed 12-channel inputs (ops/mind.py -> the U-Net stem);
    the packed stem must agree for cin > 1 too (BENCH_TRAINER=...GIN_MIND)."""
    spec = small_spec(cin=12)
    key = jax.random.PRNGKey(17)
    params = init_unet_params(key, spec)
    x = jax.random.normal(jax.random.fold_in(key, 2), (1, 8, 8, 8, 12))
    ref = unet_apply(params, x, spec)
    out = unet_apply_zpack(params, x, spec)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)


def test_unet_zpack_odd_depth_falls_back():
    """D=6 at stage0 (G=2), deeper stages odd -> unpacked path; must agree."""
    spec = small_spec(n_stages=2, feats=(8, 16))
    key = jax.random.PRNGKey(13)
    params = init_unet_params(key, spec)
    x = jax.random.normal(jax.random.fold_in(key, 1), (1, 6, 6, 8, 1))
    ref = unet_apply(params, x, spec)
    out = unet_apply_zpack(params, x, spec)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)


def test_tta_engine_losses_match_with_zpack(monkeypatch):
    """A real TTA adaptation (tta_one_volume) with the z-packed carrier
    produces near-identical per-epoch losses to the z-tap path — guards the
    env routing, head folding, and both-branch wiring end to end."""
    from dg_tta_tpu.tta.plan import TTAPlan
    from tests.test_tta_engine import IDX3, _run

    plan = TTAPlan.from_dict({"epochs": 3, "ensemble_count": 1,
                              "batch_size": 2, "accumulate_grads": 1})
    monkeypatch.delenv("DGTTA_UNET_ZPACK", raising=False)
    _, (_, losses_ref, _) = _run(plan)
    monkeypatch.setenv("DGTTA_UNET_ZPACK", "1")
    _, (_, losses_pk, _) = _run(plan)
    np.testing.assert_allclose(np.asarray(losses_pk), np.asarray(losses_ref),
                               rtol=2e-4, atol=2e-4)


def test_tta_engine_zpack_sharded_ensemble(monkeypatch):
    """z-packed carrier under the SHARDED ensemble branch (ensemble_count=2
    auto-chunks to 2 on the virtual 8-device mesh -> engine shard_map):
    derisks enabling zpack where multi-chip sharding is active."""
    from dg_tta_tpu.tta.plan import TTAPlan
    from tests.test_tta_engine import _run

    plan = TTAPlan.from_dict({"epochs": 2, "ensemble_count": 2,
                              "batch_size": 2, "accumulate_grads": 1})
    monkeypatch.delenv("DGTTA_UNET_ZPACK", raising=False)
    _, (_, losses_ref, _) = _run(plan)
    monkeypatch.setenv("DGTTA_UNET_ZPACK", "1")
    _, (_, losses_pk, _) = _run(plan)
    assert losses_pk.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(losses_pk), np.asarray(losses_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("stride", [(1, 1, 1), (2, 2, 2)])
def test_conv_packed_halo_mode_matches(monkeypatch, stride):
    """DGTTA_ZPACK_CROSS=halo (single dense conv over a z-halo-extended
    carrier) == the crossing-convs form == the z-tap conv."""
    from dg_tta_tpu.models.unet_zpack import conv_packed_multi
    monkeypatch.setenv("DGTTA_ZPACK_CROSS", "halo")
    key = jax.random.PRNGKey(37)
    B, D, H, W, ci, co, G = 2, 8, 6, 10, 8, 8, 4
    x = jax.random.normal(key, (B, D, H, W, ci))
    w = 0.3 * jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 3, ci, co))
    b = jax.random.normal(jax.random.fold_in(key, 2), (co,))
    ref = _conv(x, w, b, stride)
    out = conv_packed_multi([pack_z(x, G)], w, b, G, [ci], stride)
    out = unpack_z(out, G // stride[0])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
