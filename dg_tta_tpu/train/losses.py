"""nnUNet pretraining loss: deep-supervised Dice + cross-entropy.

Semantics follow nnUNetTrainer._build_loss (nnunetv2 2.2.1, the external
training loop the reference invokes — SURVEY §2.2): soft Dice with batch_dice
(plans.json `batch_dice: true`), smooth 1e-5, background excluded, plus mean
voxel CE; deep-supervision weights 1/2^i with the lowest resolution zeroed,
normalized.  Targets are downsampled with nearest sampling per scale.
"""

from typing import List, Sequence

import jax
import jax.numpy as jnp

from dg_tta_tpu.core.grid import grid_sample, identity_grid


def soft_dice_ce(logits, target, batch_dice: bool = True,
                 smooth: float = 1e-5):
    """Dice + CE for one resolution.

    Args:
      logits: (B, D, H, W, C); target: (B, D, H, W) int labels.
    """
    C = logits.shape[-1]
    logits = logits.astype(jnp.float32)  # bf16-safe: loss math in f32
    sm = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(target, C, dtype=logits.dtype)

    axes = (0, 1, 2, 3) if batch_dice else (1, 2, 3)
    tp = jnp.sum(sm * onehot, axis=axes)
    fp = jnp.sum(sm * (1.0 - onehot), axis=axes)
    fn = jnp.sum((1.0 - sm) * onehot, axis=axes)
    dc = (2.0 * tp + smooth) / (2.0 * tp + fp + fn + smooth)
    dc_fg = dc[..., 1:]  # do_bg=False
    dice_loss = -jnp.mean(dc_fg)

    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.mean(jnp.sum(onehot * logp, axis=-1))
    return dice_loss + ce


def downsample_target(target, out_spatial):
    """Nearest-neighbor downsample of (B, D, H, W) int targets."""
    if tuple(target.shape[1:4]) == tuple(out_spatial):
        return target
    B = target.shape[0]
    grid = tuple(jnp.broadcast_to(c[None], (B, *out_spatial))
                 for c in identity_grid(out_spatial, align_corners=False))
    out = grid_sample(target[..., None].astype(jnp.float32), grid,
                      mode="nearest", padding_mode="border",
                      align_corners=False)
    return out[..., 0].astype(target.dtype)


def deep_supervision_weights(n_outputs: int):
    w = [1.0 / (2 ** i) for i in range(n_outputs)]
    if n_outputs > 1:
        w[-1] = 0.0
    s = sum(w)
    return [x / s for x in w]


def deep_supervised_loss(outputs: Sequence, target, batch_dice: bool = True):
    """Weighted Dice+CE across deep-supervision heads (highest-res first)."""
    weights = deep_supervision_weights(len(outputs))
    total = 0.0
    for w, out in zip(weights, outputs):
        if w == 0.0:
            continue
        tgt = downsample_target(target, out.shape[1:4])
        total = total + w * soft_dice_ce(out, tgt, batch_dice=batch_dice)
    return total


def poly_lr(initial_lr: float, epoch: int, max_epochs: int,
            exponent: float = 0.9) -> float:
    """nnUNet PolyLRScheduler."""
    return initial_lr * (1.0 - epoch / max_epochs) ** exponent
