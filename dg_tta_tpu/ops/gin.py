"""GIN: Global Intensity Non-linear augmentation (random shallow conv nets).

TPU-native re-design of the reference's GINGroupConv stack
(/root/reference/dg_tta/gin.py:36-241, itself after Ouyang et al., TMI 2022):
a 4-layer random grouped conv net (kernel size drawn from {1,3} per layer,
fresh Gaussian weights per call, leaky-ReLU between layers), per-sample
alpha-blend with the input, Frobenius renorm to the input's energy.

Differences from the torch version -- all deliberate:
  * explicit PRNG key instead of global torch RNG;
  * the k in {1,3} choice is realized as a single 3^3 conv whose kernel is
    masked to its center tap when k==1 is drawn -- same distribution (the
    center tap is the same standard normal draw), but a static shape so the
    whole augmentation stays inside one compiled program, no recompiles;
  * channels-last (B, D, H, W, C) layout, conv via lax.conv_general_dilated
    with per-sample weights handled by batch grouping.

Weights never require grad -- the op is used under stop_gradient upstream of
the network in pretraining, and is gated off at TTA time by config, matching
the env-var gate in the reference (gin.py:244-247).
"""

from functools import partial

import jax
import jax.numpy as jnp

GIN_N_LAYER = 4
GIN_INTERM_CHANNELS = 2
LEAKY_SLOPE = 0.01  # torch F.leaky_relu default


def _rand_layer_params(key, nb, cin, cout, ndim, dtype):
    """Per-call random conv weights for one GIN layer.

    Returns (kernel, shift, use3) where kernel is (nb*cout, cin, 3,..,3),
    shift is (nb*cout,), use3 a scalar bool selecting kernel size 3 vs 1.
    """
    k_w, k_b, k_k = jax.random.split(key, 3)
    spatial = (3,) * ndim
    kernel = jax.random.normal(k_w, (nb * cout, cin, *spatial), dtype)
    shift = jax.random.normal(k_b, (nb * cout,), dtype)
    use3 = jax.random.randint(k_k, (), 0, 2) == 1
    # mask all but the center tap when k==1 was drawn; center tap keeps the
    # same N(0,1) draw, so the result is distribution-identical to a 1x1x1 conv
    center = tuple(s // 2 for s in spatial)
    mask = jnp.zeros(spatial, dtype).at[center].set(1.0)
    kernel = jnp.where(use3, kernel, kernel * mask)
    return kernel, shift


def _grouped_conv(x, kernel, nb, cin, cout):
    """Per-sample ("grouped by batch") conv, channels-last, SAME padding.

    x: (nb, *spatial, cin); kernel: (nb*cout, cin, *kspatial).
    Returns (nb, *spatial, cout).

    Mirrors the reference's reshape-to-one-batch grouped conv trick
    (gin.py:104-106) but in XLA: fold batch into channels and use
    feature_group_count=nb, which maps onto the MXU as one big conv.
    """
    ndim = x.ndim - 2
    spatial = x.shape[1:-1]
    # (1, *spatial, nb*cin)
    xg = jnp.moveaxis(x, 0, -2).reshape(1, *spatial, nb * cin)
    # kernel for NDHWC conv with groups: (*kspatial, cin, nb*cout)
    kern = jnp.moveaxis(kernel, (0, 1), (-1, -2))  # (*kspatial, cin, nb*cout)
    dn = jax.lax.conv_dimension_numbers(
        xg.shape, kern.shape,
        ("NDHWC", "DHWIO", "NDHWC") if ndim == 3 else ("NHWC", "HWIO", "NHWC"),
    )
    out = jax.lax.conv_general_dilated(
        xg, kern,
        window_strides=(1,) * ndim,
        padding="SAME",
        dimension_numbers=dn,
        feature_group_count=nb,
    )  # (1, *spatial, nb*cout)
    out = out.reshape(*spatial, nb, cout)
    return jnp.moveaxis(out, -2, 0)


def gin_aug(key, x, n_layer: int = GIN_N_LAYER,
            interm_channels: int = GIN_INTERM_CHANNELS):
    """Apply GIN to a channels-last image batch.

    Args:
      key: PRNG key (fresh weights are drawn per call, as in the reference).
      x: (B, *spatial, C) image, 2D or 3D spatial.
    Returns:
      Augmented image, same shape, energy-matched to the input.
    """
    nb = x.shape[0]
    nc = x.shape[-1]
    ndim = x.ndim - 2
    dtype = x.dtype

    keys = jax.random.split(key, n_layer + 1)
    widths = [nc] + [interm_channels] * (n_layer - 1) + [nc]

    h = x
    for li in range(n_layer):
        cin, cout = widths[li], widths[li + 1]
        kernel, shift = _rand_layer_params(keys[li], nb, cin, cout, ndim, dtype)
        h = _grouped_conv(h, kernel, nb, cin, cout)
        # shift is per (sample, out-channel): broadcast over spatial dims
        h = h + shift.reshape(nb, cout)[(slice(None),) + (None,) * ndim]
        if li < n_layer - 1:
            h = jnp.where(h >= 0, h, LEAKY_SLOPE * h)

    alphas = jax.random.uniform(keys[-1], (nb,), dtype)
    alphas = alphas[(slice(None),) + (None,) * (ndim + 1)]
    mixed = alphas * h + (1.0 - alphas) * x

    # Frobenius renormalization to the input's per-sample energy (gin.py:199-228)
    axes = tuple(range(1, x.ndim))
    in_frob = jnp.sqrt(jnp.sum(x**2, axis=axes, keepdims=True))
    self_frob = jnp.sqrt(jnp.sum(mixed**2, axis=axes, keepdims=True))
    return mixed * (1.0 / (self_frob + 1e-5)) * in_frob
