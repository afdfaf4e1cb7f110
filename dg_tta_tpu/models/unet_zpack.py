"""z-packed-channels U-Net formulation: fold G z-slices into the channel dim.

Motivation (PERF.md r3e-r3h): the flagship TS104 stages run 3x3x3 convs at
C=32/64 — the z-tap 2D decomposition leaves the MXU at 1/16-1/4 channel
utilization AND makes every conv instance pick its own operand layout
(EmitInputBatchInLanes wants batch-minor, others W-minor), so XLA inserts
200-400 MB layout copies around each conv (~10 GiB/epoch).  Packing G
consecutive z-slices into channels (G*C = 128 lanes) turns those stages'
convs into dense 128-channel 2D convolutions — the shape XLA:TPU's conv
emitters are best at — at a modest structural-FLOP overhead (the packed
dense weight is block-banded; the off-band blocks are structurally zero but
are multiplied anyway).

Math (exact, not approximate): with g-major lane order (lane = g*C + c),
a true 3x3x3 conv decomposes into
  * one dense 2D conv over the packed carrier with weight
    Wd[ky, kx, g_in*ci + :, g_out*co + :] = w[g_in - g_out + 1, ky, kx]
    for |g_in - g_out| <= 1, zero otherwise (out z = G*dz + g_out reads
    in z = G*dz + g_in  <=>  kz = g_in - g_out + 1), and
  * two small "crossing" 2D convs for the group-boundary taps: out group
    g_out=0 additionally reads group G-1 of packed slice dz-1 through
    w[0], and g_out=G-1 reads group 0 of dz+1 through w[2].
Gradients flow through the (static) weight assembly, so adapting the
canonical (3,3,3,ci,co) parameters under jax.grad is exact.

FLOP overhead vs the true conv: the dense tap multiplies G^2 blocks per
(ky,kx) where only 3G-2 are non-zero -> x1.6 at G=4, x1.0 at G=2 — repaid
many times over by full-width MXU passes (C=32 z-tap convs run at <=1/16
MXU channel utilization).

Reference parity: identical math to models/unet.unet_apply (itself pinned
against the torch nnUNet PlainConvUNet in tests/test_unet.py /
tests/test_parity_torch.py); tests/test_unet_zpack.py pins this module
against unet_apply directly.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from dg_tta_tpu.models.plans import ArchSpec
from dg_tta_tpu.models.unet import (
    _conv,
    _conv_transpose,
    _instance_norm,
    _leaky,
)


def _group_for(channels: int, depth: int, max_lanes: int = 128) -> int:
    """Largest power-of-two G with G*channels <= max_lanes and G | depth."""
    g = 1
    while (2 * g * channels <= max_lanes) and (depth % (2 * g) == 0):
        g *= 2
    return g


def pack_z(x, G):
    """(B, D, H, W, C) -> (B, D//G, H, W, G*C), g-major lanes."""
    B, D, H, W, C = x.shape
    return (x.reshape(B, D // G, G, H, W, C)
             .transpose(0, 1, 3, 4, 2, 5)
             .reshape(B, D // G, H, W, G * C))


def unpack_z(xp, G):
    """Inverse of pack_z."""
    B, Dp, H, W, GC = xp.shape
    C = GC // G
    return (xp.reshape(B, Dp, H, W, G, C)
              .transpose(0, 1, 4, 2, 3, 5)
              .reshape(B, Dp * G, H, W, C))


def _dense_tap0(w, G):
    """Assemble the packed dense 2D weight (kh, kw, G*ci, G*co) from the
    canonical (3, kh, kw, ci, co) kernel.  Static concat of slices/zeros —
    differentiable, and each w[kz] gradient accumulates over its (banded)
    appearances exactly as the true conv's weight gradient does."""
    kd, kh, kw, ci, co = w.shape
    assert kd == 3, kd
    zero = jnp.zeros_like(w[0])
    cols = []
    for g_out in range(G):
        rows = []
        for g_in in range(G):
            d = g_in - g_out + 1
            rows.append(w[d] if 0 <= d <= 2 else zero)
        cols.append(jnp.concatenate(rows, axis=2))   # (kh, kw, G*ci, co)
    return jnp.concatenate(cols, axis=3)             # (kh, kw, G*ci, G*co)


def _conv2d(x4, w4, padding):
    dn = jax.lax.conv_dimension_numbers(
        x4.shape, w4.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x4, w4, (1, 1), padding, dimension_numbers=dn,
        preferred_element_type=x4.dtype)


def conv_packed(xp, w, b, G):
    """3x3x3 conv (stride 1, torch k//2 zero padding) on a z-packed carrier.

    xp: (B, Dp, H, W, G*ci) g-major; w: (3, kh, kw, ci, co) canonical;
    returns (B, Dp, H, W, G*co).
    """
    B, Dp, H, W, GC = xp.shape
    kd, kh, kw, ci, co = w.shape
    assert kd == 3 and GC == G * ci, (w.shape, xp.shape, G)
    py, px = kh // 2, kw // 2
    pad = [(py, py), (px, px)]

    main = _conv2d(xp.reshape(B * Dp, H, W, GC), _dense_tap0(w, G), pad)
    out = main.reshape(B, Dp, H, W, G * co)

    # Group-boundary taps across packed slices (true-z zero padding at the
    # volume boundary falls out of the packed-z zero pad).
    zpad = ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0))
    prev_last = jnp.pad(xp[:, :-1, :, :, (G - 1) * ci:], zpad)
    lo = _conv2d(prev_last.reshape(B * Dp, H, W, ci), w[0], pad)
    zpad2 = ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0))
    nxt_first = jnp.pad(xp[:, 1:, :, :, :ci], zpad2)
    hi = _conv2d(nxt_first.reshape(B * Dp, H, W, ci), w[2], pad)

    cross = (jnp.pad(lo, ((0, 0),) * 3 + ((0, (G - 1) * co),))
             + jnp.pad(hi, ((0, 0),) * 3 + (((G - 1) * co, 0),)))
    out = out + cross.reshape(B, Dp, H, W, G * co)
    return out + jnp.tile(b, G)


def _instance_norm_packed(xp, scale, bias, eps, G):
    """InstanceNorm per (sample, true channel) on a packed carrier: the
    statistics reduce over (Dp, H, W) AND the lane-group axis; scale/bias
    broadcast over groups (g-major => jnp.tile)."""
    B, Dp, H, W, GC = xp.shape
    C = GC // G
    xg = xp.reshape(B, Dp, H, W, G, C)
    if xp.dtype == jnp.float32:
        mean = jnp.mean(xg, axis=(1, 2, 3, 4)).reshape(B, 1, 1, 1, C)
        var = jnp.var(xg, axis=(1, 2, 3, 4)).reshape(B, 1, 1, 1, C)
        meanp = jnp.tile(mean, (1, 1, 1, 1, G))
        invp = jnp.tile(jax.lax.rsqrt(var + eps), (1, 1, 1, 1, G))
        return (xp - meanp) * invp * jnp.tile(scale, G) + jnp.tile(bias, G)
    mean32 = jnp.mean(xg, axis=(1, 2, 3, 4), dtype=jnp.float32)
    m2 = jnp.mean(jnp.square(xg), axis=(1, 2, 3, 4), dtype=jnp.float32)
    var = jnp.maximum(m2 - jnp.square(mean32), 0.0)
    inv = (jax.lax.rsqrt(var + eps)).astype(xp.dtype) * scale
    meanp = jnp.tile(mean32.astype(xp.dtype), (1, G)).reshape(B, 1, 1, 1, GC)
    invp = jnp.tile(inv, (1, G)).reshape(B, 1, 1, 1, GC)
    biasp = jnp.tile(bias, G)
    return (xp - meanp) * invp + biasp


def _block_packed(xp, p, spec, G):
    xp = conv_packed(xp, p["conv"]["w"], p["conv"]["b"], G)
    xp = _instance_norm_packed(xp, p["norm"]["scale"], p["norm"]["bias"],
                               spec.norm_eps, G)
    return _leaky(xp, spec.leaky_slope)


def _block_unpacked(x, p, stride, spec):
    x = _conv(x, p["conv"]["w"], p["conv"]["b"], stride)
    x = _instance_norm(x, p["norm"]["scale"], p["norm"]["bias"], spec.norm_eps)
    return _leaky(x, spec.leaky_slope)


def _packable(blk, D):
    """Pack group for a stage led by this conv: sized from the OUTPUT
    channels (the stage width; a decoder conv0's 2C input just makes the
    contraction dim 2*G*C — fine for the MXU) and constrained to divide D."""
    w = blk["conv"]["w"]
    if w.shape[0] != 3:
        return 1
    return _group_for(int(w.shape[4]), D)


def unet_apply_zpack(params, x, spec: ArchSpec, deep_supervision=False,
                     compute_dtype=None, head_channel_idx=None):
    """unet.unet_apply with stride-1 stage convs routed through the z-packed
    carrier.  Strided downsamples, transpconvs and heads stay on the z-tap
    path; pack/unpack transposes happen once per stage instead of XLA
    re-laying operands around every conv."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        params = jax.tree.map(lambda p: p.astype(compute_dtype), params)

    def head(h, sl):
        # static channel fold; see unet.unet_apply.head (gather cliff)
        w, b = sl["w"], sl["b"]
        if head_channel_idx is not None:
            idx = [int(i) for i in np.asarray(head_channel_idx).tolist()]
            w = jnp.concatenate([w[..., i:i + 1] for i in idx], axis=-1)
            b = jnp.concatenate([b[i:i + 1] for i in idx])
        return _conv(h, w, b)

    def run_stage(h, blocks, first_stride):
        """First conv (possibly strided / channel-changing) unpacked, then
        pack once and run the remaining convs packed.  Returns unpacked."""
        h = _block_unpacked(h, blocks[0], first_stride, spec)
        rest = blocks[1:]
        if not rest:
            return h
        G = _packable(rest[0], h.shape[1])
        if G == 1:
            for blk in rest:
                h = _block_unpacked(h, blk, (1, 1, 1), spec)
            return h
        hp = pack_z(h, G)
        for blk in rest:
            hp = _block_packed(hp, blk, spec, G)
        return unpack_z(hp, G)

    skips = []
    h = x
    for s in range(spec.n_stages):
        stage = params["encoder"]["stages"][s]
        h = run_stage(h, stage["convs"], tuple(spec.strides[s]))
        skips.append(h)

    seg_outputs = []
    lres = skips[-1]
    n_dec = spec.n_stages - 1
    for d in range(n_dec):
        tc = params["decoder"]["transpconvs"][d]
        skip = skips[-(d + 2)]
        up_stride = tuple(spec.strides[spec.n_stages - 1 - d])
        h = _conv_transpose(lres, tc["w"], tc["b"], up_stride)
        h = jnp.concatenate([h, skip], axis=-1)
        stage = params["decoder"]["stages"][d]
        blocks = stage["convs"]
        # decoder stage: conv0 halves channels (2C->C) — still a 3x3x3
        # stride-1 conv, packable; pack the concat once for the whole stage
        G = _packable(blocks[0], h.shape[1])
        if G == 1:
            for blk in blocks:
                h = _block_unpacked(h, blk, (1, 1, 1), spec)
        else:
            hp = pack_z(h, G)
            for blk in blocks:
                hp = _block_packed(hp, blk, spec, G)
            h = unpack_z(hp, G)
        lres = h
        if deep_supervision:
            sl = params["decoder"]["seg_layers"][d]
            seg_outputs.append(head(h, sl))
    if deep_supervision:
        return seg_outputs[::-1]
    sl = params["decoder"]["seg_layers"][n_dec - 1]
    return head(lres, sl)
