"""2D NHWC/HWIO convolution with a hand-written weight-gradient.

XLA:TPU lowers the autodiff weight-gradient of a 2D conv as a
"transposed-operand" convolution whose contraction runs over the batch
dimension.  On this stack that lowering pays two structural costs the
r3o member profile attributes ~1.6 s/member to (PERF.md): batch-in-lanes
layout copies of the activation operand, and a separate f32 partial-reduce
pass over the contraction splits.

This module provides `conv2d(x, w, padding, stride)` — forward-identical to
`lax.conv_general_dilated(..., ("NHWC", "HWIO", "NHWC"))` — with a
`jax.custom_vjp` backward:

  * input gradient: the exact conv_general_dilated transpose rule XLA's
    autodiff emits (spatially-reversed kernel, I/O swapped, lhs_dilation =
    forward stride).  This lowering is already efficient (batch stays in the
    conv batch dimension); no reason to replace it.
  * weight gradient: one `dot_general` per kernel tap, contracting the
    (N, Ho, Wo) axes of the tap-shifted input window against the cotangent:
        dw[dy, dx, i, o] = sum_{n,y,x} xpad[n, y*sy+dy, x*sx+dx, i] g[n,y,x,o]
    Each tap is a plain GEMM with K = N*Ho*Wo in rows and (I, O) in lanes —
    the MXU-native orientation, accumulated in f32 *inside* the matmul
    (preferred_element_type) so no separate reduce pass exists.

Numerics: identical contractions to the autodiff rule up to f32 accumulation
order; the f32 in-MXU accumulation is at least as accurate as XLA's split
partial reduces.

Selection: `DGTTA_CONV_WGRAD` = "xla" | "dot" | "dot11" (see _wgrad_mode).
MEASURED OUTCOME (PERF.md r3s): "dot" is 45% SLOWER end-to-end on the v5e
member program — the per-tap shifted operand slices of a 3x3 kernel each
materialize a full activation copy, which outweighs the wgrad layout copies
they remove.  The stock path therefore stays the default; the dot paths
remain as measured, opt-in alternatives ("dot11" covers only 1x1 kernels,
where the operand needs no shift).  The knob is trace-time: it is included
in models/network.formulation_key so cached TTA function sets rebuild when
it changes.

Reference parity: this replaces the backward of the 2D convs that implement
the reference's Conv3d stacks (dynamic_network_architectures PlainConvUNet;
see models/unet.py / models/unet_zpack.py docstrings for the forward
decompositions).
"""

from functools import partial
import os

import jax
import jax.numpy as jnp


def _wgrad_mode() -> str:
    """"xla" (stock autodiff), "dot" (dot_general wgrad for every kernel),
    "dot11" (dot_general wgrad only for 1x1 kernels, where no tap-shifted
    operand slice exists).  MEASURED on the v5e member program (PERF.md
    r3s): "dot" = 35.75 s/member vs 24.66 stock — the 9 per-tap slice
    materializations of the padded activation cost far more than the
    batch-in-lanes copies they remove — so "auto" resolves to the stock
    path for 3x3 kernels everywhere."""
    mode = os.environ.get("DGTTA_CONV_WGRAD", "auto")
    if mode == "auto":
        return "xla"
    return mode


def _plain_conv2d(x4, w4, padding, stride):
    dn = jax.lax.conv_dimension_numbers(
        x4.shape, w4.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x4, w4, stride, padding, dimension_numbers=dn,
        preferred_element_type=x4.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv2d_dotwgrad(x4, w4, padding, stride):
    return _plain_conv2d(x4, w4, padding, stride)


def _conv2d_fwd(x4, w4, padding, stride):
    return _plain_conv2d(x4, w4, padding, stride), (x4, w4)


def _conv2d_bwd(padding, stride, res, g):
    x4, w4 = res
    kh, kw, ci, co = w4.shape
    (py0, py1), (px0, px1) = padding
    sy, sx = stride
    N, H, W, _ = x4.shape
    Ho, Wo = g.shape[1:3]

    # --- input gradient: conv_general_dilated transpose rule -------------
    # output length check: ((Ho-1)*sy+1) + (kh-1-py0) + pad_hi - kh + 1 == H
    w_rev = jnp.flip(w4, axis=(0, 1)).swapaxes(2, 3)   # (kh, kw, O, I)
    pad_y = (kh - 1 - py0, H + py0 - 1 - (Ho - 1) * sy)
    pad_x = (kw - 1 - px0, W + px0 - 1 - (Wo - 1) * sx)
    dn = jax.lax.conv_dimension_numbers(
        g.shape, w_rev.shape, ("NHWC", "HWIO", "NHWC"))
    dx = jax.lax.conv_general_dilated(
        g, w_rev, (1, 1), (pad_y, pad_x), lhs_dilation=(sy, sx),
        dimension_numbers=dn, preferred_element_type=x4.dtype)

    # --- weight gradient: one GEMM per tap --------------------------------
    if py0 or py1 or px0 or px1:
        xpad = jnp.pad(x4, ((0, 0), (py0, py1), (px0, px1), (0, 0)))
    else:
        xpad = x4
    rows = []
    for dy in range(kh):
        cols = []
        for dx_ in range(kw):
            xs = jax.lax.slice(
                xpad,
                (0, dy, dx_, 0),
                (N, dy + (Ho - 1) * sy + 1, dx_ + (Wo - 1) * sx + 1, ci),
                (1, sy, sx, 1))
            dw = jax.lax.dot_general(
                xs, g, (((0, 1, 2), (0, 1, 2)), ((), ())),
                preferred_element_type=jnp.float32)
            cols.append(dw)
        rows.append(jnp.stack(cols))
    dw = jnp.stack(rows).astype(w4.dtype)              # (kh, kw, I, O)
    return dx, dw


_conv2d_dotwgrad.defvjp(_conv2d_fwd, _conv2d_bwd)


def conv2d(x4, w4, padding, stride=(1, 1)):
    """NHWC/HWIO 2D conv, torch-compatible explicit padding.

    padding: ((py0, py1), (px0, px1)) or a 2-list of pairs; stride (sy, sx).
    Backward follows DGTTA_CONV_WGRAD (module docstring).
    """
    padding = tuple((int(a), int(b)) for a, b in padding)
    stride = tuple(int(s) for s in stride)
    mode = _wgrad_mode()
    if mode == "dot" or (mode == "dot11" and w4.shape[0] == w4.shape[1] == 1):
        return _conv2d_dotwgrad(x4, w4, padding, stride)
    return _plain_conv2d(x4, w4, padding, stride)
