"""ops/conv2d: the dot_general weight-gradient must match XLA's autodiff.

The custom VJP replaces the backward of every 2D conv in both U-Net
formulations (models/unet.py z-tap path, models/unet_zpack.py packed path),
so grads are pinned against jax.grad of the plain conv_general_dilated form
across the kernel/stride/padding cases those modules emit.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dg_tta_tpu.ops.conv2d import _conv2d_dotwgrad, _plain_conv2d


CASES = [
    # (N, H, W, I, O, kh, kw, sy, sx, py, px)
    (2, 12, 12, 5, 7, 3, 3, 1, 1, 1, 1),     # stage conv
    (2, 12, 12, 5, 7, 3, 3, 2, 2, 1, 1),     # strided downsample
    (2, 12, 12, 5, 7, 1, 1, 1, 1, 0, 0),     # seg head / packed transpconv
    (1, 9, 11, 3, 4, 3, 3, 1, 1, 1, 1),      # odd rectangular
    (1, 10, 10, 3, 4, 3, 3, 2, 2, 1, 1),     # even size, stride 2
    (2, 8, 8, 6, 3, 1, 1, 2, 2, 0, 0),       # 1x1 strided
]


@pytest.mark.parametrize("case", CASES)
def test_grads_match_autodiff(case):
    N, H, W, I, O, kh, kw, sy, sx, py, px = case
    rng = np.random.default_rng(sum(case))
    x = jnp.asarray(rng.normal(size=(N, H, W, I)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(kh, kw, I, O)).astype(np.float32))
    pad = ((py, py), (px, px))
    stride = (sy, sx)

    def loss_plain(x, w):
        out = _plain_conv2d(x, w, pad, stride)
        return jnp.sum(jnp.sin(out))

    def loss_custom(x, w):
        out = _conv2d_dotwgrad(x, w, pad, stride)
        return jnp.sum(jnp.sin(out))

    out_p = _plain_conv2d(x, w, pad, stride)
    out_c = _conv2d_dotwgrad(x, w, pad, stride)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_c))

    gx_p, gw_p = jax.grad(loss_plain, argnums=(0, 1))(x, w)
    gx_c, gw_c = jax.grad(loss_custom, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_p),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_p),
                               rtol=1e-5, atol=1e-5)


def test_bf16_dtypes_and_vmap():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 2, 10, 10, 4)).astype(np.float32),
                    dtype=jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 6)).astype(np.float32),
                    dtype=jnp.bfloat16)

    def loss(x, w):
        return jnp.sum(_conv2d_dotwgrad(
            x, w, ((1, 1), (1, 1)), (1, 1)).astype(jnp.float32) ** 2)

    gx, gw = jax.vmap(jax.grad(loss, argnums=(0, 1)), in_axes=(0, None))(x, w)
    assert gx.dtype == jnp.bfloat16 and gw.dtype == jnp.bfloat16
    assert gx.shape == x.shape and gw.shape == (3,) + w.shape
    assert np.isfinite(np.asarray(gx, dtype=np.float32)).all()


def test_unet_grads_unchanged_by_knob(monkeypatch):
    """End-to-end: flipping DGTTA_CONV_WGRAD must not change U-Net grads
    beyond accumulation-order noise (f32 here, so tight)."""
    from dg_tta_tpu.models.plans import ArchSpec
    from dg_tta_tpu.models.unet import init_unet_params, unet_apply

    spec = ArchSpec(
        features_per_stage=(4, 8),
        kernel_sizes=((3, 3, 3),) * 2,
        strides=((1, 1, 1), (2, 2, 2)),
        n_conv_per_stage_encoder=(1, 1),
        n_conv_per_stage_decoder=(1,),
        num_input_channels=1,
        num_classes=3,
    )
    params = init_unet_params(jax.random.PRNGKey(0), spec)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 8, 1))

    def loss(p):
        return jnp.sum(unet_apply(p, x, spec) ** 2)

    grads = {}
    for mode in ("xla", "dot"):
        monkeypatch.setenv("DGTTA_CONV_WGRAD", mode)
        grads[mode] = jax.grad(loss)(params)
    flat_x, _ = jax.tree_util.tree_flatten(grads["xla"])
    flat_d, _ = jax.tree_util.tree_flatten(grads["dot"])
    for a, b in zip(flat_x, flat_d):
        # f32 accumulation-order noise only (measured max ~1e-5 abs on
        # grads of magnitude ~30)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)
