"""PlainConvUNet as a pure function over a parameter pytree.

TPU-first re-implementation of the nnUNet v2 `PlainConvUNet` the reference
builds via `get_network_from_plans`
(/root/reference/dg_tta/pretraining/nnUNetTrainer_GIN.py:46-52; architecture
defined by the shipped plans.json).  Conv-IN-LeakyReLU blocks, strided-conv
downsampling, transpose-conv upsampling, per-resolution segmentation heads
(deep supervision).

Layout: channels-last NDHWC everywhere (XLA:TPU's preferred conv layout; the
MXU consumes DHWIO kernels directly).  Parameters are a nested dict pytree
whose leaf names mirror the torch state_dict semantics so the checkpoint
converter (models/convert.py) is a pure relabel + transpose.

Param tree schema:
  {
    "encoder": {"stages": [ {"convs": [ {"conv": {"w","b"},
                                          "norm": {"scale","bias"}} ]} ]},
    "decoder": {
       "transpconvs": [ {"w","b"} ],
       "stages":      [ {"convs": [ ... same as encoder ... ]} ],
       "seg_layers":  [ {"w","b"} ],
    },
  }
Conv w: (kd, kh, kw, cin, cout).  Transpconv w: (kd, kh, kw, c_out_up,
c_in_below) -- the DHWIO layout of the *forward* conv whose transpose this is,
as consumed by lax.conv_transpose(transpose_kernel=True) for exact torch
ConvTranspose3d parity.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dg_tta_tpu.models.plans import ArchSpec
from dg_tta_tpu.ops.conv2d import conv2d

_DN = ("NDHWC", "DHWIO", "NDHWC")


def _conv(x, w, b, stride=(1, 1, 1)):
    """3D conv as a sum of kd shifted 2D convolutions (torch-style k//2
    padding; parity with nnUNet requires the explicit form).

    XLA:TPU lowers direct 3D convolutions at these channel counts through an
    im2col-like path that multiplies HBM traffic ~7x (one 796-GFLOP U-Net
    forward accessed 17.5 GiB); decomposing over the kernel's z-taps into 2D
    convs (depth folded into the conv batch) is 2.5x faster end-to-end and
    numerically identical up to accumulation order.  Output dtype follows the
    compute dtype; the MXU accumulates in f32 internally either way, and an
    f32 preferred_element_type would make the conv's transpose (grad) rule
    mix bf16/f32 operand dtypes.
    """
    B, D, H, W, C = x.shape
    kd, kh, kw, ci, co = w.shape
    sz, sy, sx = stride
    pz, py, px = kd // 2, kh // 2, kw // 2
    oz = (D + 2 * pz - kd) // sz + 1

    if pz:
        x = jnp.pad(x, ((0, 0), (pz, pz), (0, 0), (0, 0), (0, 0)))
    out = None
    for kz in range(kd):
        xs = jax.lax.slice(
            x, (0, kz, 0, 0, 0),
            (B, kz + sz * (oz - 1) + 1, H, W, C),
            (1, sz, 1, 1, 1))
        # ops/conv2d: same forward conv, dot_general weight grad on TPU
        # (DGTTA_CONV_WGRAD).
        r = conv2d(
            xs.reshape(B * oz, H, W, C), w[kz],
            [(py, py), (px, px)], (sy, sx))
        out = r if out is None else out + r
    oh, ow = out.shape[1:3]
    out = out.reshape(B, oz, oh, ow, co)
    return out if b is None else out + b


def _conv_transpose(x, w, b, stride=(2, 2, 2)):
    """torch ConvTranspose3d(k=stride, padding=0) equivalent.

    `w` is stored as (kd, kh, kw, I, O) in *torch orientation* (I = decoder
    input channels, O = output channels); transpose_kernel=True makes
    lax.conv_transpose apply the torch-transposed-conv semantics exactly.
    """
    kd, kh, kw = w.shape[:3]
    if (kd, kh, kw) == tuple(stride):
        # kernel == stride: every output voxel receives exactly one tap, so
        # the transposed conv is a single matmul + sub-voxel interleave —
        # no conv op (and none of XLA's transposed-conv lowering cost).
        # w is (kd, kh, kw, c_out_up, c_in_below) torch orientation (module
        # docstring): contraction over the LAST kernel axis.
        B, D, H, W, C = x.shape
        o = w.shape[3]
        out = jnp.einsum("bdhwi,zyxoi->bdzhywxo", x, w)
        out = out.reshape(B, D * kd, H * kh, W * kw, o)
        return (out + b).astype(x.dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, _DN)
    out = jax.lax.conv_transpose(
        x, w, strides=stride, padding="VALID", dimension_numbers=dn,
        transpose_kernel=True,
    )
    return (out + b).astype(x.dtype)


def _instance_norm(x, scale, bias, eps):
    """InstanceNorm over spatial dims, per (sample, channel); affine.

    Reduction accumulation is float32 in every dtype.  Under bf16 the
    elementwise math stays bf16 (E[x^2]-E[x]^2 form) — materializing f32
    copies of full-res activations here was the dominant HBM cost of the
    whole TTA step (hundreds of 200MB temporaries).
    """
    if x.dtype == jnp.float32:
        mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + eps)
        return y * scale + bias
    mean32 = jnp.mean(x, axis=(1, 2, 3), keepdims=True, dtype=jnp.float32)
    m2 = jnp.mean(jnp.square(x), axis=(1, 2, 3), keepdims=True,
                  dtype=jnp.float32)
    var = jnp.maximum(m2 - jnp.square(mean32), 0.0)
    inv = jax.lax.rsqrt(var + eps).astype(x.dtype)
    return (x - mean32.astype(x.dtype)) * (inv * scale) + bias


def _leaky(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def _conv_block(x, p, stride, spec):
    # b=None: a conv bias is a per-channel spatially-uniform shift, which the
    # following InstanceNorm's mean subtraction cancels EXACTLY — the bias
    # has zero effect on the block output and zero gradient (analytically so
    # in the torch reference too, nnUNet conv->IN->lrelu blocks).  Skipping
    # the add saves a full-tensor elementwise pass per conv and a
    # full-tensor reduce in backward.  Heads/transpconvs (no IN) keep theirs.
    x = _conv(x, p["conv"]["w"], None, stride)
    x = _instance_norm(x, p["norm"]["scale"], p["norm"]["bias"], spec.norm_eps)
    return _leaky(x, spec.leaky_slope)


def unet_apply(params, x, spec: ArchSpec, deep_supervision: bool = False,
               compute_dtype=None, head_channel_idx=None):
    """Forward pass.

    Args:
      params: pytree per the module docstring.
      x: (B, D, H, W, C_in) channels-last input.
      deep_supervision: if True, return a list of per-resolution logits
        (highest resolution first, nnUNet ordering); else the full-res logits.
    Returns:
      (B, D, H, W, num_classes) logits, or a list of such at declining
      resolutions.
    """
    if compute_dtype is not None:
        # bf16 path: weights + activations in compute_dtype; conv accumulate
        # and IN statistics stay f32 (preferred_element_type above); logits
        # are cast back to f32 at the heads
        x = x.astype(compute_dtype)
        params = jax.tree.map(lambda p: p.astype(compute_dtype), params)

    def head(h, sl):
        """Segmentation head; head_channel_idx folds the label-mapping
        channel gather (torch_utils.py:214-227 logits mode) into the 1x1x1
        conv's weights, so the full class-count logits never materialize
        (105ch -> C_opt at TS104 scale saves ~600MB/branch in the TTA step).

        The selection is STATIC python-int slicing + concat — neither a
        jnp.take (any gather op run once permanently flips this process's
        fast XLA-TPU gather emitter ~400x slower) nor a one-hot matmul (a
        K=1-class contraction in a program ALSO poisons the emitter
        process-wide; measured, tools/probe_poison*.py / PERF.md 'gather
        cliff').  The label-mapping indices are run-level config, so they
        are always available as concrete ints at trace time.
        """
        w, b = sl["w"], sl["b"]
        if head_channel_idx is not None:
            idx = [int(i) for i in np.asarray(head_channel_idx).tolist()]
            w = jnp.concatenate([w[..., i:i + 1] for i in idx], axis=-1)
            b = jnp.concatenate([b[i:i + 1] for i in idx])
        # logits stay in the compute dtype; losses/argmax upcast where needed
        return _conv(h, w, b)

    skips = []
    h = x
    for s in range(spec.n_stages):
        stage = params["encoder"]["stages"][s]
        for ci, blk in enumerate(stage["convs"]):
            stride = tuple(spec.strides[s]) if ci == 0 else (1, 1, 1)
            h = _conv_block(h, blk, stride, spec)
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
        for blk in stage["convs"]:
            h = _conv_block(h, blk, (1, 1, 1), spec)
        lres = h
        if deep_supervision:
            sl = params["decoder"]["seg_layers"][d]
            seg_outputs.append(head(h, sl))
    if deep_supervision:
        # nnUNet returns highest resolution first
        return seg_outputs[::-1]
    sl = params["decoder"]["seg_layers"][n_dec - 1]
    return head(lres, sl)


def init_unet_params(key, spec: ArchSpec, dtype=jnp.float32):
    """He-initialized parameters (kaiming a=0.01, matching nnUNet's init)."""

    def conv_init(k, shape):
        fan_in = shape[0] * shape[1] * shape[2] * shape[3]
        gain = jnp.sqrt(2.0 / (1 + spec.leaky_slope**2))
        std = gain / jnp.sqrt(fan_in)
        return std * jax.random.normal(k, shape, dtype)

    # NOTE: not iter(jax.random.split(...)) — iterating a device array does
    # host transfers that degrade the axon tunnel's dispatch path
    _counter = [0]

    def next_key():
        _counter[0] += 1
        return jax.random.fold_in(key, _counter[0])

    def block(cin, cout, ksize):
        return {
            "conv": {
                "w": conv_init(next_key(), (*ksize, cin, cout)),
                "b": jnp.zeros((cout,), dtype),
            },
            "norm": {
                "scale": jnp.ones((cout,), dtype),
                "bias": jnp.zeros((cout,), dtype),
            },
        }

    feats = spec.features_per_stage
    enc_stages = []
    cin = spec.num_input_channels
    for s in range(spec.n_stages):
        convs = []
        for ci in range(spec.n_conv_per_stage_encoder[s]):
            convs.append(block(cin if ci == 0 else feats[s], feats[s],
                               spec.kernel_sizes[s]))
            cin = feats[s]
        enc_stages.append({"convs": convs})

    transpconvs, dec_stages, seg_layers = [], [], []
    n_dec = spec.n_stages - 1
    for d in range(n_dec):
        below = feats[spec.n_stages - 1 - d]      # features coming from below
        here = feats[spec.n_stages - 2 - d]       # features at this skip level
        up_stride = spec.strides[spec.n_stages - 1 - d]
        transpconvs.append({
            "w": conv_init(next_key(), (*up_stride, here, below)),
            "b": jnp.zeros((here,), dtype),
        })
        convs = []
        cin_d = 2 * here
        for ci in range(spec.n_conv_per_stage_decoder[d]):
            convs.append(block(cin_d if ci == 0 else here, here,
                               spec.kernel_sizes[spec.n_stages - 2 - d]))
        dec_stages.append({"convs": convs})
        seg_layers.append({
            "w": conv_init(next_key(), (1, 1, 1, here, spec.num_classes)),
            "b": jnp.zeros((spec.num_classes,), dtype),
        })

    return {
        "encoder": {"stages": enc_stages},
        "decoder": {
            "transpconvs": transpconvs,
            "stages": dec_stages,
            "seg_layers": seg_layers,
        },
    }


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
