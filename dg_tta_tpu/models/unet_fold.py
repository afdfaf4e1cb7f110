"""Folded (z-into-H) formulation of the PlainConvUNet forward pass.

Motivation (PERF.md round 3f): the z-tap 2D-conv decomposition in
`unet._conv` reshapes 5D->(B*D,H,W,C) around EVERY conv; each reshape breaks
XLA:TPU layout propagation, so operands/results get re-laid-out around every
conv — ~10 of the 14.76 GiB/epoch of layout copies in the TTA epoch program
(tools/hlo_rank.py attribution of the r3e HLO dump: unet.py:72/73/78).

The folded form keeps a whole same-resolution run of conv blocks on ONE 4D
array `(B, D*Hp, W, C)` where `Hp = H + 2*py` and every z-slice's rows are
stored as `[py zero rows, H valid rows, py zero rows]`:

- a 3D SAME conv's z-taps become CONTIGUOUS row slices of the zero-padded
  folded array (`out[p] = sum_kz sum_ky x_f[p + (kz-pz)*Hp + (ky-py)] ...`),
  each consumed by a VALID 2D conv — no reshapes anywhere in the chain, so
  one layout propagates end-to-end;
- the per-block zero rows double as the H halo, and the pad blocks double
  as the z halo;
- InstanceNorm masks the pad rows out of its sums (they hold real conv
  outputs of cross-slice windows — garbage) and re-zeroes them in the
  affine epilogue, restoring the invariant for the next conv.

Strided (downsampling) convs run as strided VALID convs over the folded dim
(output rows land at `j = (sz*Hp//sy)*d' + i'`, valid iff `sy | sz*Hp`),
then REFOLD at the reduced resolution — the only materializing rearranges
left are at stage boundaries, at 1/8-scale cost.

Numerics: identical tap order and accumulation pattern to `unet._conv`
(exact at f32 up to the usual conv reassociation; bf16 path keeps f32 IN
statistics like `unet._instance_norm`).

Parity reference: same PlainConvUNet semantics as models/unet.py
(/root/reference/dg_tta/pretraining/nnUNetTrainer_GIN.py:46-52).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Folded(NamedTuple):
    """A channels-last 5D tensor stored z-folded: xf = (B, D*Hp, W, C)."""
    xf: jax.Array
    D: int
    H: int
    py: int

    @property
    def Hp(self):
        return self.H + 2 * self.py


def fold(x, py: int) -> Folded:
    """(B, D, H, W, C) -> Folded with `py` zero rows around each z-slice."""
    B, D, H, W, C = x.shape
    if py:
        x = jnp.pad(x, ((0, 0), (0, 0), (py, py), (0, 0), (0, 0)))
    return Folded(x.reshape(B, D * (H + 2 * py), W, C), D, H, py)


def unfold(f: Folded) -> jax.Array:
    """Folded -> (B, D, H, W, C) (drops the pad rows)."""
    B, _, W, C = f.xf.shape
    x = f.xf.reshape(B, f.D, f.Hp, W, C)
    if f.py:
        x = jax.lax.slice_in_dim(x, f.py, f.py + f.H, axis=2)
    return x


def refold(f: Folded, py: int) -> Folded:
    """Change the per-block pad count (used after strided convs / at fold
    boundaries).  No-op when py already matches."""
    if py == f.py:
        return f
    return fold(unfold(f), py)


def _row_mask(D: int, H: int, py: int, dtype) -> jax.Array:
    """(1, D*Hp, 1, 1) multiplicative mask: 1 on valid rows, 0 on pad rows."""
    row = np.zeros((H + 2 * py,), np.float32)
    row[py:py + H] = 1.0
    m = np.tile(row, D)
    return jnp.asarray(m, dtype).reshape(1, D * (H + 2 * py), 1, 1)


def conv_folded(f: Folded, w, b, stride=(1, 1, 1)):
    """3D SAME conv (torch k//2 padding) on a Folded input.

    stride (1,1,1): returns a Folded at the same resolution and alignment.
    strided: returns the raw strided-VALID conv output `(out4, D', H', W')`
    for the caller to refold (stage boundary, reduced resolution).
    Requires sy | sz*Hp (uniform and (1,s,s)/(s,1,1) strides all satisfy
    this for even Hp); callers fall back to the legacy path otherwise.
    """
    kd, kh, kw, ci, co = w.shape
    pz, py, px = kd // 2, kh // 2, kw // 2
    sz, sy, sx = stride
    assert f.py == py, (f.py, py)
    B, Fr, W, C = f.xf.shape
    Hp = f.Hp

    dn2 = jax.lax.conv_dimension_numbers(
        (B, Fr, W, C), (kh, kw, ci, co), ("NHWC", "HWIO", "NHWC"))

    if stride == (1, 1, 1):
        # pad A = pz*Hp + py keeps out[j] <-> x_f[j] aligned (valid rows at
        # block offset py), so the output drops straight into the next block
        A = pz * Hp + py
        xp = (jnp.pad(f.xf, ((0, 0), (A, A), (0, 0), (0, 0)))
              if A else f.xf)
        out = None
        for kz in range(kd):
            xs = jax.lax.slice(
                xp, (0, kz * Hp, 0, 0), (B, kz * Hp + Fr + 2 * py, W, C))
            r = jax.lax.conv_general_dilated(
                xs, w[kz], (1, 1), [(0, 0), (px, px)],
                dimension_numbers=dn2, preferred_element_type=f.xf.dtype)
            out = r if out is None else out + r
        # valid rows stayed put; pad rows now hold garbage (masked at IN)
        return Folded(out + b, f.D, f.H, py)

    # strided: pad A = pz*Hp only; out_kz[j] = sum_ky xp[kz*Hp + sy*j + ky]
    # lands valid outputs at j = (sz*Hp//sy)*d' + i'
    assert (sz * Hp) % sy == 0, (stride, Hp)
    A = pz * Hp
    xp = (jnp.pad(f.xf, ((0, 0), (A, A), (0, 0), (0, 0))) if A else f.xf)
    step = sz * Hp // sy
    D2 = (f.D + 2 * pz - kd) // sz + 1
    H2 = (f.H + 2 * py - kh) // sy + 1
    W2 = (W + 2 * px - kw) // sx + 1
    # rows needed: j up to (D2-1)*step + H2-1; slice length before VALID kh
    L = ((D2 - 1) * step + H2 - 1) * sy + kh
    out = None
    for kz in range(kd):
        xs = jax.lax.slice(xp, (0, kz * Hp, 0, 0),
                           (B, min(kz * Hp + L, xp.shape[1]), W, C))
        if xs.shape[1] < L:  # z-edge taps can run past the pad: zero-extend
            xs = jnp.pad(xs, ((0, 0), (0, L - xs.shape[1]), (0, 0), (0, 0)))
        r = jax.lax.conv_general_dilated(
            xs, w[kz], (sy, sx), [(0, 0), (px, px)],
            dimension_numbers=dn2, preferred_element_type=f.xf.dtype)
        out = r if out is None else out + r
    out = out + b
    # extract valid rows: j = step*d' + i', i' < H2  (reduced-res rearrange)
    n_j = out.shape[1]
    need = D2 * step
    if n_j < need:
        out = jnp.pad(out, ((0, 0), (0, need - n_j), (0, 0), (0, 0)))
    elif n_j > need:
        out = jax.lax.slice_in_dim(out, 0, need, axis=1)
    out5 = out.reshape(B, D2, step, W2, co)
    out5 = jax.lax.slice_in_dim(out5, 0, H2, axis=2)
    return out5, D2, H2, W2


def instance_norm_folded(f: Folded, scale, bias, eps, mask=None):
    """Masked InstanceNorm matching unet._instance_norm's accumulation:
    f32 statistics over valid rows only; pad rows re-zeroed in the output."""
    if mask is None:
        mask = _row_mask(f.D, f.H, f.py, f.xf.dtype)
    x = f.xf
    n = float(f.D * f.H * x.shape[2])
    xm = x * mask
    mean32 = jnp.sum(xm, axis=(1, 2), keepdims=True, dtype=jnp.float32) / n
    m2 = jnp.sum(jnp.square(xm), axis=(1, 2), keepdims=True,
                 dtype=jnp.float32) / n
    var = jnp.maximum(m2 - jnp.square(mean32), 0.0)
    if x.dtype == jnp.float32:
        y = (x - mean32) * jax.lax.rsqrt(var + eps)
        return Folded((y * scale + bias) * mask, f.D, f.H, f.py)
    inv = jax.lax.rsqrt(var + eps).astype(x.dtype)
    y = (x - mean32.astype(x.dtype)) * (inv * scale) + bias
    return Folded(y * mask, f.D, f.H, f.py)


def _leaky(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def conv_block_folded(f: Folded, p, spec, mask):
    """stride-1 conv + IN + leaky, staying folded (the hot path)."""
    f = conv_folded(f, p["conv"]["w"], p["conv"]["b"])
    f = instance_norm_folded(f, p["norm"]["scale"], p["norm"]["bias"],
                             spec.norm_eps, mask)
    return Folded(_leaky(f.xf, spec.leaky_slope), f.D, f.H, f.py)


def concat_folded(a: Folded, b: Folded) -> Folded:
    assert (a.D, a.H, a.py) == (b.D, b.H, b.py)
    return Folded(jnp.concatenate([a.xf, b.xf], axis=-1), a.D, a.H, a.py)


def unet_apply_folded(params, x, spec, deep_supervision: bool = False,
                      compute_dtype=None, head_channel_idx=None):
    """Folded-layout PlainConvUNet forward — numerically equivalent to
    `unet.unet_apply` (same tap order / IN statistics dtype / init), with
    all same-resolution conv blocks running reshape-free.

    Falls back is the caller's job: use this only when every stage has
    uniform kernel padding along (z, H) satisfying `sy | sz*Hp` (all
    nnUNet 3d_fullres plans we target do).
    """
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        params = jax.tree.map(lambda p: p.astype(compute_dtype), params)

    def head(fh: Folded, sl):
        """1x1x1 seg head on the folded tensor; returns 5D logits.
        head_channel_idx folds label mapping into the head weights with
        STATIC slicing (never a gather — see unet.unet_apply.head)."""
        w, b = sl["w"], sl["b"]
        if head_channel_idx is not None:
            idx = [int(i) for i in np.asarray(head_channel_idx).tolist()]
            w = jnp.concatenate([w[..., i:i + 1] for i in idx], axis=-1)
            b = jnp.concatenate([b[i:i + 1] for i in idx])
        B, Fr, W, C = fh.xf.shape
        dn2 = jax.lax.conv_dimension_numbers(
            (B, Fr, W, C), (1, 1, C, w.shape[-1]), ("NHWC", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(
            fh.xf, w[0], (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn2,
            preferred_element_type=fh.xf.dtype) + b
        return unfold(Folded(out, fh.D, fh.H, fh.py))

    def block_py(s):
        return spec.kernel_sizes[s][1] // 2

    masks = {}

    def get_mask(D, H, py, dtype):
        k = (D, H, py, jnp.dtype(dtype).name)
        if k not in masks:
            masks[k] = _row_mask(D, H, py, dtype)
        return masks[k]

    def run_block(fh, blk, stride, s_kernel):
        """One conv block (conv+IN+leaky).  stride-1 stays folded; strided
        convs refold at the reduced resolution."""
        if stride == (1, 1, 1):
            fh = conv_folded(fh, blk["conv"]["w"], blk["conv"]["b"])
        else:
            out5, D2, H2, W2 = conv_folded(
                fh, blk["conv"]["w"], blk["conv"]["b"], stride)
            fh = fold(out5, s_kernel[1] // 2)
        fh = instance_norm_folded(
            fh, blk["norm"]["scale"], blk["norm"]["bias"], spec.norm_eps,
            get_mask(fh.D, fh.H, fh.py, fh.xf.dtype))
        return Folded(_leaky(fh.xf, spec.leaky_slope), fh.D, fh.H, fh.py)

    B, D0, H0, W0, _ = x.shape
    skips = []
    fh = fold(x, block_py(0))
    for s in range(spec.n_stages):
        stage = params["encoder"]["stages"][s]
        for ci, blk in enumerate(stage["convs"]):
            stride = tuple(spec.strides[s]) if ci == 0 else (1, 1, 1)
            if ci == 0 and stride != (1, 1, 1) and fh.py != block_py(s):
                # kernel padding changes across the strided boundary are
                # handled by the refold inside run_block; the INPUT pad
                # count must match the consuming kernel's py first
                fh = refold(fh, block_py(s))
            fh = run_block(fh, blk, stride, spec.kernel_sizes[s])
        skips.append(fh)

    seg_outputs = []
    lres = skips[-1]
    n_dec = spec.n_stages - 1
    for d in range(n_dec):
        tc = params["decoder"]["transpconvs"][d]
        skip = skips[-(d + 2)]
        up_stride = tuple(spec.strides[spec.n_stages - 1 - d])
        # transpconv (kernel==stride): matmul + sub-voxel interleave on the
        # 5D view at coarse res, then fold at the fine res (unet.py:97-98)
        x5 = unfold(lres)
        w, bb = tc["w"], tc["b"]
        kd, kh, kw = w.shape[:3]
        assert (kd, kh, kw) == tuple(up_stride), "general transpconv TBD"
        Bc, Dc, Hc, Wc, Cc = x5.shape
        o = w.shape[3]
        up = jnp.einsum("bdhwi,zyxoi->bdzhywxo", x5, w)
        up = up.reshape(Bc, Dc * kd, Hc * kh, Wc * kw, o)
        up = (up + bb).astype(x5.dtype)
        fh = fold(up, skip.py)
        fh = concat_folded(fh, skip)
        stage = params["decoder"]["stages"][d]
        for blk in stage["convs"]:
            fh = run_block(fh, blk, (1, 1, 1),
                           spec.kernel_sizes[spec.n_stages - 2 - d])
        lres = fh
        if deep_supervision:
            seg_outputs.append(head(fh, params["decoder"]["seg_layers"][d]))
    if deep_supervision:
        return seg_outputs[::-1]
    return head(lres, params["decoder"]["seg_layers"][n_dec - 1])


def foldable(spec) -> bool:
    """True when every stage satisfies the folded path's constraints."""
    for s in range(spec.n_stages):
        kd, kh, kw = spec.kernel_sizes[s]
        sz, sy, sx = spec.strides[s]
        H_pad = 2 * (kh // 2)
        # sy | sz*Hp checked at trace time (Hp depends on input H); the
        # common even-H cases always pass.  Transpconv kernel==stride is
        # asserted in unet_apply_folded.
        if kd % 2 == 0 or kh % 2 == 0 or kw % 2 == 0:
            return False
    return True

