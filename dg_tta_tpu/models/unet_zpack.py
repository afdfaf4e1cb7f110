"""z-packed-channels U-Net formulation: fold G z-slices into the channel dim.

Motivation (PERF.md r3e-r3h): the flagship TS104 stages run 3x3x3 convs at
C=32/64 — the z-tap 2D decomposition leaves the MXU at 1/16-1/4 channel
utilization AND makes every conv instance pick its own operand layout
(EmitInputBatchInLanes wants batch-minor, others W-minor), so XLA inserts
200-400 MB layout copies around each conv (~10 GiB/epoch).  Packing G
consecutive z-slices into channels (G*C = 128 lanes) turns those stages'
convs into dense 128-channel 2D convolutions — the shape XLA:TPU's conv
emitters are best at — at a modest structural-FLOP overhead (the packed
dense weight is block-banded; off-band blocks are structurally zero but
multiplied anyway: x1.6 at G=4, x1.0 at G=2).

Math (exact, not approximate): with g-major lane order (lane = g*C + c), a
true 3x3x3 z-stride-sz conv decomposes into
  * one dense 2D conv over the packed carrier with weight
    Wd[ky, kx, g_in*ci + :, g_out*co + :] = w[g_in - sz*g_out + 1, ky, kx]
    when that tap index is in range, zero otherwise (out z = Go*dz + g_out
    reads in z = G*dz + g_in with G = sz*Go), and
  * small "crossing" 2D convs for the group-boundary taps (out group 0
    reads group G-1 of packed slice dz-1 through w[0]; for sz=1 out group
    G-1 reads group 0 of dz+1 through w[2]).
Gradients flow through the (static) weight assembly, so adapting the
canonical (3,3,3,ci,co) parameters under jax.grad is exact.

The whole flagship forward stays packed end-to-end with NO explicit
pack/unpack copies on the main line:
  * the stem packs its (B,D,H,W,1) INPUT (6 MB, not the 205 MB stage
    tensor) and emits packed activations;
  * strided downsamples consume group G and emit G/2 (z-stride folded into
    the group structure), so the C>=128 stages fall out unpacked for free;
  * kernel==stride transposed convs emit packed output directly — the
    z-axis sub-voxel interleave (the largest single copies in the r3e HLO
    attribution, unet.py:97-98) becomes pure lane structure;
  * the decoder concat is never materialized: the stage's first conv runs
    as a SUM of per-section dense convs over [up, skip] (conv_packed_multi);
  * 1x1x1 segmentation heads run packed (block-diagonal dense weight) and
    only the few-channel logits are unpacked.

Reference parity: identical math to models/unet.unet_apply (itself pinned
against the torch nnUNet PlainConvUNet in tests/test_unet.py /
tests/test_parity_torch.py); tests/test_unet_zpack.py pins this module
against unet_apply directly (values and grads).
"""

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
from dg_tta_tpu.ops.conv2d import conv2d as _shared_conv2d


def _group_for(channels: int, depth: int, max_lanes: int = None) -> int:
    """Largest power-of-two G with G*channels <= max_lanes and G | depth.

    max_lanes defaults to DGTTA_ZPACK_MAXLANES (env, default 128) and
    DGTTA_ZPACK_MAXG (default 2) caps G itself, decoupled from lane width.
    The defaults implement the measured-best v5e config (PERF.md round 3k
    member_run sweep): G=2 everywhere it divides — the banded packed weight
    is fully dense at G=2 (structural-FLOP overhead G^2/(3G-2) = x1.0 vs
    x1.6 at G=4), so the C=32 stage runs 64-lane and the C=64 stage
    128-lane dense 2D convs.  27.53 s/member vs 38.3 (z-tap), 30.1
    (MAXLANES=64: C=64 stage unpacked), 28.2 (MAXLANES=256: C=128 stage
    packed too), 134%-of-ztap at G=4 on the hot chain."""
    import os
    if max_lanes is None:
        max_lanes = int(os.environ.get("DGTTA_ZPACK_MAXLANES", "128"))
    max_g = int(os.environ.get("DGTTA_ZPACK_MAXG", "2"))
    g = 1
    while (2 * g * channels <= max_lanes) and (depth % (2 * g) == 0) \
            and (max_g <= 0 or 2 * g <= max_g):
        g *= 2
    return g


def pack_z(x, G):
    """(B, D, H, W, C) -> (B, D//G, H, W, G*C), g-major lanes."""
    if G == 1:
        return x
    B, D, H, W, C = x.shape
    return (x.reshape(B, D // G, G, H, W, C)
             .transpose(0, 1, 3, 4, 2, 5)
             .reshape(B, D // G, H, W, G * C))


def unpack_z(xp, G):
    """Inverse of pack_z."""
    if G == 1:
        return xp
    B, Dp, H, W, GC = xp.shape
    C = GC // G
    return (xp.reshape(B, Dp, H, W, G, C)
              .transpose(0, 1, 4, 2, 3, 5)
              .reshape(B, Dp * G, H, W, C))


def _dense_tap0(w, G, sz=1):
    """Assemble the packed dense 2D weight (kh, kw, G*ci, (G//sz)*co) from
    the canonical (3, kh, kw, ci, co) kernel; sz is the conv's z-stride.
    Block (g_in, g_out) = w[g_in - sz*g_out + 1] when in range, else zero.
    Static concat of slices/zeros — differentiable; each w[kz] gradient
    accumulates over its banded appearances exactly as the true conv's."""
    kd, kh, kw, ci, co = w.shape
    assert kd == 3 and G % sz == 0, (w.shape, G, sz)
    zero = jnp.zeros_like(w[0])
    cols = []
    for g_out in range(G // sz):
        rows = []
        for g_in in range(G):
            d = g_in - sz * g_out + 1
            rows.append(w[d] if 0 <= d <= 2 else zero)
        cols.append(jnp.concatenate(rows, axis=2))   # (kh, kw, G*ci, co)
    return jnp.concatenate(cols, axis=3)


def _conv2d(x4, w4, padding, stride=(1, 1)):
    # ops/conv2d routes the weight gradient through per-tap dot_generals on
    # TPU (DGTTA_CONV_WGRAD) — forward is the same conv_general_dilated.
    return _shared_conv2d(x4, w4, padding, stride)


def _cross_mode() -> str:
    """How the group-boundary z-taps are realized: "convs" (default; two
    small C=ci 2D convs on shifted single-group slabs) or "halo" (extend
    the carrier with one group of z-halo per side and run ONE dense conv
    over (G+2)*ci lanes — more structural FLOPs, one conv instead of
    three).  DGTTA_ZPACK_CROSS selects; both are exact."""
    import os
    return os.environ.get("DGTTA_ZPACK_CROSS", "convs")


def _dense_tap0_halo(w, G, sz=1):
    """Dense weight for the halo form: input lane blocks are
    [prev-group(G-1), g_0..g_{G-1}, next-group(0)] i.e. halo index
    h = g_in + 1 with g_in in {-1, .., G}; block (h, g_out) = w[kz],
    kz = g_in - sz*g_out + 1 when in range."""
    kd, kh, kw, ci, co = w.shape
    assert kd == 3 and G % sz == 0
    zero = jnp.zeros_like(w[0])
    cols = []
    for g_out in range(G // sz):
        rows = []
        for g_in in range(-1, G + 1):
            d = g_in - sz * g_out + 1
            rows.append(w[d] if 0 <= d <= 2 else zero)
        cols.append(jnp.concatenate(rows, axis=2))
    return jnp.concatenate(cols, axis=3)   # (kh, kw, (G+2)*ci, Go*co)


def conv_packed_multi(xps, w, b, G, section_ci, stride=(1, 1, 1)):
    """3x3x3 conv (torch k//2 zero padding) on z-packed carriers, without
    materializing the channel concat of its operands.

    xps: list of packed tensors (B, Dp, H, W, G*ci_k), the canonical input
    channels being the concatenation of the sections (sum ci_k = w.shape[3],
    split per section_ci).  stride (sz, sy, sx) with sz in {1, 2} and
    sz | G; the output is packed at Go = G // sz (z-stride-2 consumes group
    structure, so the downsampled output needs no repack).
    Returns (B, Dp, H_out, W_out, Go*co).
    """
    if _cross_mode() == "halo":
        return _conv_packed_multi_halo(xps, w, b, G, section_ci, stride)
    return _conv_packed_multi_convs(xps, w, b, G, section_ci, stride)


def _conv_packed_multi_halo(xps, w, b, G, section_ci, stride=(1, 1, 1)):
    """Halo form of conv_packed_multi: per section, concat one group of
    z-halo on each side of the packed lanes and run a single dense conv."""
    kd, kh, kw, ci_tot, co = w.shape
    sz, sy, sx = stride
    assert kd == 3 and sz in (1, 2) and G % sz == 0
    assert sum(section_ci) == ci_tot, (section_ci, ci_tot)
    Go = G // sz
    py, px = kh // 2, kw // 2
    pad = [(py, py), (px, px)]
    zlo = ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0))
    zhi = ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0))

    out = None
    off = 0
    for xp, ci in zip(xps, section_ci):
        B, Dp, H, W, GC = xp.shape
        assert GC == G * ci, (xp.shape, G, ci)
        wk = w[:, :, :, off:off + ci, :]
        off += ci
        prev_last = jnp.pad(xp[:, :-1, :, :, (G - 1) * ci:], zlo)
        nxt_first = jnp.pad(xp[:, 1:, :, :, :ci], zhi)
        xe = jnp.concatenate([prev_last, xp, nxt_first], axis=-1)
        r = _conv2d(xe.reshape(B * Dp, H, W, (G + 2) * ci),
                    _dense_tap0_halo(wk, G, sz), pad, (sy, sx))
        out = r if out is None else out + r

    Ho, Wo = out.shape[1:3]
    out = out.reshape(B, Dp, Ho, Wo, Go * co)
    return out if b is None else out + jnp.tile(b, Go)


def _conv_packed_multi_convs(xps, w, b, G, section_ci, stride=(1, 1, 1)):
    """Crossing-convs form of conv_packed_multi (module docstring)."""
    kd, kh, kw, ci_tot, co = w.shape
    sz, sy, sx = stride
    assert kd == 3 and sz in (1, 2) and G % sz == 0
    assert sum(section_ci) == ci_tot, (section_ci, ci_tot)
    Go = G // sz
    py, px = kh // 2, kw // 2
    pad = [(py, py), (px, px)]
    zlo = ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0))
    zhi = ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0))

    out = None
    off = 0
    for xp, ci in zip(xps, section_ci):
        B, Dp, H, W, GC = xp.shape
        assert GC == G * ci, (xp.shape, G, ci)
        wk = w[:, :, :, off:off + ci, :]
        off += ci
        main = _conv2d(xp.reshape(B * Dp, H, W, GC), _dense_tap0(wk, G, sz),
                       pad, (sy, sx))
        r = main

        # group-boundary taps across packed slices (true-z zero padding at
        # the volume boundary falls out of the packed-z zero pad)
        prev_last = jnp.pad(xp[:, :-1, :, :, (G - 1) * ci:], zlo)
        lo = _conv2d(prev_last.reshape(B * Dp, H, W, ci), wk[0], pad,
                     (sy, sx))
        if sz == 1:
            nxt_first = jnp.pad(xp[:, 1:, :, :, :ci], zhi)
            hi = _conv2d(nxt_first.reshape(B * Dp, H, W, ci), wk[2], pad,
                         (sy, sx))
            if Go == 2:
                # lo feeds out-group 0, hi feeds out-group Go-1 == 1: the two
                # crossing outputs tile the full lane range, so a lane concat
                # replaces two full-size zero-padded writes + two adds
                # (measured lever: the pads were most of the crossing bucket).
                r = r + jnp.concatenate([lo, hi], axis=-1)
            else:
                r = r + jnp.pad(lo, ((0, 0),) * 3 + ((0, (Go - 1) * co),))
                r = r + jnp.pad(hi, ((0, 0),) * 3 + (((Go - 1) * co, 0),))
        else:
            r = r + jnp.pad(lo, ((0, 0),) * 3 + ((0, (Go - 1) * co),))
        out = r if out is None else out + r

    Ho, Wo = out.shape[1:3]
    out = out.reshape(B, Dp, Ho, Wo, Go * co)
    return out if b is None else out + jnp.tile(b, Go)


def conv_packed(xp, w, b, G, stride=(1, 1, 1)):
    """Single-operand form of conv_packed_multi."""
    ci = w.shape[3]
    return conv_packed_multi([xp], w, b, G, [ci], stride)


def head_packed(xp, w, b, G):
    """1x1x1 conv (segmentation head) on a packed carrier: block-diagonal
    dense 1x1 2D conv, G*ci -> G*co lanes."""
    kd, kh, kw, ci, co = w.shape
    assert (kd, kh, kw) == (1, 1, 1), w.shape
    B, Dp, H, W, GC = xp.shape
    assert GC == G * ci
    zero = jnp.zeros_like(w[0, 0, 0])
    cols = []
    for g_out in range(G):
        rows = [w[0, 0, 0] if g_in == g_out else zero for g_in in range(G)]
        cols.append(jnp.concatenate(rows, axis=0))
    wd = jnp.concatenate(cols, axis=1)[None, None]     # (1,1,G*ci,G*co)
    out = _conv2d(xp.reshape(B * Dp, H, W, GC), wd, [(0, 0), (0, 0)])
    return out.reshape(B, Dp, H, W, G * co) + jnp.tile(b, G)


def transpconv_packed(xb, w, b, G_b, stride):
    """torch ConvTranspose3d(kernel==stride) emitting a packed carrier.

    xb: (B, Dp, H, W, G_b*ci) packed below-activations; w: (S, ky, kx, o, i)
    torch orientation (unet._conv_transpose docstring); output is packed at
    G_out = S*G_b — the z-axis sub-voxel interleave becomes pure lane
    structure (g_out = g_in*S + a), so no z interleave reshape exists.

    Formulated as a dense 1x1 2D conv (G_b*ci -> ky*kx*G_out*o lanes) with a
    block-diagonal weight, followed by the (H, W) sub-voxel interleave: the
    contraction covers all input lanes in one standard conv (no lane-split
    of the big operand, unlike an einsum over a (..., G_b, ci) view).
    """
    S, ky, kx = w.shape[:3]
    assert (S, ky, kx) == tuple(stride), (w.shape, stride)
    B, Dp, H, W, GC = xb.shape
    o, ci = w.shape[3], w.shape[4]
    assert GC == G_b * ci
    G_out = G_b * S

    zero = jnp.zeros((ci, o), w.dtype)
    blocks = []
    for g2 in range(G_b):
        cols = []
        for y in range(ky):
            for x in range(kx):
                for go in range(G_out):
                    g2p, a = divmod(go, S)
                    cols.append(jnp.transpose(w[a, y, x]) if g2p == g2
                                else zero)
        blocks.append(jnp.concatenate(cols, axis=1))
    wt = jnp.concatenate(blocks, axis=0)[None, None]   # (1,1,GC,ky*kx*Go*o)

    out = _conv2d(xb.reshape(B * Dp, H, W, GC), wt, [(0, 0), (0, 0)])
    out = (out.reshape(B, Dp, H, W, ky, kx, G_out * o)
              .transpose(0, 1, 2, 4, 3, 5, 6)
              .reshape(B, Dp, H * ky, W * kx, G_out * o))
    return (out + jnp.tile(b, G_out)).astype(xb.dtype)


def _instance_norm_packed(xp, scale, bias, eps, G):
    """InstanceNorm per (sample, true channel) on a packed carrier.

    The big tensor is only touched by full-spatial reduces and elementwise
    ops: per-LANE sums over (Dp, H, W) first (keeping the G*C lane dim
    intact — no (G, C) lane restructure of the big operand), then the
    G-way group combine happens on the tiny (B, G*C) sums.  f32
    accumulation in every dtype, elementwise math in the carrier dtype
    (unet._instance_norm's convention)."""
    B, Dp, H, W, GC = xp.shape
    C = GC // G
    n = float(Dp * H * W * G)
    s1 = jnp.sum(xp, axis=(1, 2, 3), dtype=jnp.float32)          # (B, GC)
    s2 = jnp.sum(jnp.square(xp), axis=(1, 2, 3), dtype=jnp.float32)
    mean32 = s1.reshape(B, G, C).sum(axis=1) / n                 # (B, C)
    m2 = s2.reshape(B, G, C).sum(axis=1) / n
    var = jnp.maximum(m2 - jnp.square(mean32), 0.0)
    if xp.dtype == jnp.float32:
        inv = jax.lax.rsqrt(var + eps) * scale
        meanp = jnp.tile(mean32, (1, G)).reshape(B, 1, 1, 1, GC)
    else:
        inv = (jax.lax.rsqrt(var + eps)).astype(xp.dtype) * scale
        meanp = jnp.tile(mean32.astype(xp.dtype), (1, G)).reshape(
            B, 1, 1, 1, GC)
    invp = jnp.tile(inv, (1, G)).reshape(B, 1, 1, 1, GC)
    return (xp - meanp) * invp + jnp.tile(bias, G)


def _in_leaky(hp, p, spec, G):
    if G == 1:
        hp = _instance_norm(hp, p["norm"]["scale"], p["norm"]["bias"],
                            spec.norm_eps)
    else:
        hp = _instance_norm_packed(hp, p["norm"]["scale"], p["norm"]["bias"],
                                   spec.norm_eps, G)
    return _leaky(hp, spec.leaky_slope)


def unet_apply_zpack(params, x, spec: ArchSpec, deep_supervision=False,
                     compute_dtype=None, head_channel_idx=None):
    """unet.unet_apply on the z-packed carrier (module docstring).  Any
    stage whose shape/stride falls outside the packed fast path (odd depth,
    z-kernel != 3, z-stride > 2) transparently falls back to the z-tap
    implementation for that stage."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        params = jax.tree.map(lambda p: p.astype(compute_dtype), params)

    def head(hG, sl):
        # static channel fold; see unet.unet_apply.head (gather cliff)
        h, G = hG
        w, b = sl["w"], sl["b"]
        if head_channel_idx is not None:
            idx = [int(i) for i in np.asarray(head_channel_idx).tolist()]
            w = jnp.concatenate([w[..., i:i + 1] for i in idx], axis=-1)
            b = jnp.concatenate([b[i:i + 1] for i in idx])
        if G == 1:
            return _conv(h, w, b)
        return unpack_z(head_packed(h, w, b, G), G)

    def block_conv(hG, blk, stride, sections=None):
        """One conv through the packed machinery.  hG: (tensor, G) or, with
        `sections`, a list of same-G packed tensors (the unmaterialized
        concat).  Returns (tensor, G_out)."""
        hs, G = hG
        many = sections is not None
        xs = hs if many else [hs]
        # b=None: every block_conv is followed by _in_leaky, and a conv bias
        # is exactly cancelled by InstanceNorm's mean subtraction (zero
        # gradient too — same as unet._conv_block; torch reference behaves
        # identically analytically).
        w, b = blk["conv"]["w"], None
        sz, sy, sx = stride
        co = int(w.shape[4])
        D_true = xs[0].shape[1] * G
        packed_ok = (w.shape[0] == 3 and sz in (1, 2)
                     and (sz == 1 or D_true % 2 == 0))
        if packed_ok:
            D_out = D_true // sz
            G_out = _group_for(co, D_out)
            G_pre = sz * G_out
            if G_pre == 1 and G == 1:
                packed_ok = False       # plain z-tap is the tuned G=1 path
            elif G_pre != G and G % sz == 0 and G > 1:
                # stride conv at the carrier's own G: consume sz from the
                # existing group structure (Go = G // sz) and repack the
                # (sz*sy*sx)-times-smaller OUTPUT to G_out, instead of
                # repacking the big input tensor to sz*G_out (the input
                # repack of the full-res stage tensor was ~1.0 s/member in
                # the r3n profile; the output repack moves 1/4 the bytes).
                secs = sections if many else [int(w.shape[3])]
                h = conv_packed_multi(xs, w, b, G, secs, (sz, sy, sx))
                Go = G // sz
                if Go != G_out:
                    h = pack_z(unpack_z(h, Go), G_out)
                return h, G_out
            else:
                if G_pre != G:
                    xs = [pack_z(unpack_z(h, G), G_pre) for h in xs]
                secs = sections if many else [int(w.shape[3])]
                h = conv_packed_multi(xs, w, b, G_pre, secs, (sz, sy, sx))
                return h, G_out
        # fallback: unpack, z-tap conv
        xs = [unpack_z(h, G) for h in xs]
        h = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=-1)
        return _conv(h, w, b, stride), 1

    skips = []
    hG = (x, 1)
    for s in range(spec.n_stages):
        stage = params["encoder"]["stages"][s]
        for ci_idx, blk in enumerate(stage["convs"]):
            stride = tuple(spec.strides[s]) if ci_idx == 0 else (1, 1, 1)
            h, G = block_conv(hG, blk, stride)
            hG = (_in_leaky(h, blk, spec, G), G)
        skips.append(hG)

    seg_outputs = []
    lres, Gl = skips[-1]
    n_dec = spec.n_stages - 1
    for d in range(n_dec):
        tc = params["decoder"]["transpconvs"][d]
        skip, Gs = skips[-(d + 2)]
        up_stride = tuple(spec.strides[spec.n_stages - 1 - d])
        w_tc = tc["w"]
        if (tuple(w_tc.shape[:3]) == up_stride
                and up_stride[0] * Gl == Gs and Gs > 1):
            up = transpconv_packed(lres, w_tc, tc["b"], Gl, up_stride)
            g_up = Gs
        else:
            up = _conv_transpose(unpack_z(lres, Gl), w_tc, tc["b"], up_stride)
            g_up = 1
            if Gs > 1 and g_up != Gs:
                up = pack_z(up, Gs)
                g_up = Gs
        stage = params["decoder"]["stages"][d]
        blocks = stage["convs"]
        c_up = int(w_tc.shape[3])
        c_skip = skip.shape[-1] // Gs
        h, G = block_conv(([up, skip], Gs), blocks[0], (1, 1, 1),
                          sections=[c_up, c_skip])
        hG = (_in_leaky(h, blocks[0], spec, G), G)
        for blk in blocks[1:]:
            h, G = block_conv(hG, blk, (1, 1, 1))
            hG = (_in_leaky(h, blk, spec, G), G)
        lres, Gl = hG
        if deep_supervision:
            sl = params["decoder"]["seg_layers"][d]
            seg_outputs.append(head(hG, sl))
    if deep_supervision:
        return seg_outputs[::-1]
    sl = params["decoder"]["seg_layers"][n_dec - 1]
    return head((lres, Gl), sl)
