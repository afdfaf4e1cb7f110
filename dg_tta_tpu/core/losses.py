"""Dice losses and metrics.

Matches the reference's semantics (/root/reference/dg_tta/tta/torch_utils.py:90-117):
the consistency soft-Dice deliberately has NO epsilon in the ratio (only a
global all-zero-denominator guard), and the eval Dice uses a 1e-8 epsilon.
Channels-last layout: (B, D, H, W, C).
"""

import jax
import jax.numpy as jnp


def soft_dice_loss(sm_a, sm_b):
    """Per-(batch, class) soft Dice between two softmaxed predictions.

    Args:
      sm_a, sm_b: (B, D, H, W, C) probabilities (possibly masked).
    Returns:
      (B, C) dice scores. If the global denominator is exactly zero, returns
      all-ones (the reference's guard; torch_utils.py:97-99).
    """
    B = sm_a.shape[0]
    C = sm_a.shape[-1]
    a = sm_a.reshape(B, -1, C)
    b = sm_b.reshape(B, -1, C)
    nominator = jnp.mean(2.0 * a * b, axis=1)
    denominator = jnp.mean(0.5 * (a + b) ** 2, axis=1)
    # No eps: the reference explicitly avoids it to keep the consistency loss
    # un-biased. Guard only the fully-empty case.
    dice = jnp.where(
        jnp.sum(denominator) == 0.0,
        jnp.ones_like(nominator),
        nominator / jnp.where(denominator == 0.0, 1.0, denominator)
        * (denominator != 0.0),
    )
    return dice


def consistency_loss(logits_a, logits_b, start_class: int = 1):
    """The reference TTA loss (tta.py:262-269): mask to commonly-covered
    voxels, softmax both branches, 1 - mean foreground soft Dice."""
    logits_a = logits_a.astype(jnp.float32)  # bf16-safe: loss math in f32
    logits_b = logits_b.astype(jnp.float32)
    mask_a = (jnp.sum(logits_a, axis=-1, keepdims=True) > 0.0).astype(logits_a.dtype)
    mask_b = (jnp.sum(logits_b, axis=-1, keepdims=True) > 0.0).astype(logits_b.dtype)
    common = mask_a * mask_b
    sm_a = jax.nn.softmax(logits_a, axis=-1) * common
    sm_b = jax.nn.softmax(logits_b, axis=-1) * common
    dice = soft_dice_loss(sm_a, sm_b)
    return 1.0 - jnp.mean(dice[:, start_class:])


def consistency_loss_flat(logits_a, logits_b, start_class: int = 1):
    """`consistency_loss` on channels-first FLAT logits (B, C, N).

    Identical math to the channels-last version (tta.py:262-269); exists so
    the TTA hot path never transposes a warp-gather output back to
    channels-last — XLA-TPU fuses that transpose into the gather and falls
    off the fast gather kernel (see core/grid.py:grid_sample_flat).
    """
    logits_a = logits_a.astype(jnp.float32)
    logits_b = logits_b.astype(jnp.float32)
    mask_a = (jnp.sum(logits_a, axis=1, keepdims=True) > 0.0).astype(
        logits_a.dtype)
    mask_b = (jnp.sum(logits_b, axis=1, keepdims=True) > 0.0).astype(
        logits_b.dtype)
    common = mask_a * mask_b
    sm_a = jax.nn.softmax(logits_a, axis=1) * common
    sm_b = jax.nn.softmax(logits_b, axis=1) * common
    nominator = jnp.mean(2.0 * sm_a * sm_b, axis=2)          # (B, C)
    denominator = jnp.mean(0.5 * (sm_a + sm_b) ** 2, axis=2)  # (B, C)
    dice = jnp.where(
        jnp.sum(denominator) == 0.0,
        jnp.ones_like(nominator),
        nominator / jnp.where(denominator == 0.0, 1.0, denominator)
        * (denominator != 0.0),
    )
    return 1.0 - jnp.mean(dice[:, start_class:])


def dice_coeff(outputs, labels, max_label: int):
    """Per-foreground-class hard Dice (torch_utils.py:107-117).

    Args:
      outputs, labels: integer label volumes of identical shape.
    Returns:
      (max_label - 1,) dice per foreground class.
    """
    outputs = outputs.reshape(-1)
    labels = labels.reshape(-1)
    classes = jnp.arange(1, max_label)

    def one(c):
        iflat = (outputs == c).astype(jnp.float32)
        tflat = (labels == c).astype(jnp.float32)
        intersection = jnp.mean(iflat * tflat)
        return 2.0 * intersection / (1e-8 + jnp.mean(iflat) + jnp.mean(tflat))

    return jax.vmap(one)(classes)
