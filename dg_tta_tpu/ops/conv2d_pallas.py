"""Pallas BlockSpec-pipelined 3x3 conv pilot (r4 verdict item 1a).

The member program's conv chain runs at ~38% MFU through XLA's conv
emitters (PERF.md r4b); r3t ruled out JAX-level dot_general rewrites.
This kernel is the one unmeasured lever: a direct Mosaic conv for the
z-packed stage shapes (NHWC, 3x3, stride 1, torch pad 1 — the hot
encoder/decoder blocks of models/unet_zpack.py), built ONLY from
standard BlockSpec pipelining (the kernel class proven to execute on
this stack — probe_pallas_*; manual make_async_copy kernels fault the
worker, see ops/experimental/warp_pallas_staged.py).

Design: grid (N, H/TILE).  The x operand is passed three times with
tile-shifted index maps (prev/cur/next H-tiles) so the kernel owns the
halo rows without overlapping blocks or manual DMA; a VMEM scratch
holds the zero-padded (TILE+2, W+2, C) working set.  The 9 taps are
consumed as lane-aligned PAIRS along the contraction dim (2C lanes per
matmul operand; C=64 packs to the full 128-lane MXU width that a
single-tap K=C matmul would leave half-empty), accumulating in f32.

DGTTA_PALLAS_CONV_MODE: "pairs" (default) | "taps" (9 K=C matmuls) |
"im2col" (one K=9C matmul).  Forward-only pilot: wiring into
ops/conv2d.conv2d is gated on the on-chip microbench
(tools/probe_pallas_conv.py) showing a win over the XLA emitter.
Reference chain being replaced: the Conv3d stacks of nnUNet's
PlainConvUNet (models/unet_zpack.py decomposition).
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mode() -> str:
    return os.environ.get("DGTTA_PALLAS_CONV_MODE", "pairs")


def _pick_tile(H: int) -> int:
    """Largest divisor of H that is <= 16 (VMEM working set ~x3 tiles)."""
    for t in (16, 14, 8, 7, 4, 2, 1):
        if H % t == 0:
            return t
    return 1


def _kernel(x_prev, x_cur, x_nxt, w_ref, o_ref, xbuf, acc, *, TILE, W, C,
            CO, mode):
    i = pl.program_id(1)
    nH = pl.num_programs(1)

    # ---- build the zero-padded (TILE+2, W+2, C) working set -------------
    xbuf[1:TILE + 1, 1:W + 1, :] = x_cur[0]
    xbuf[:, 0, :] = jnp.zeros((TILE + 2, C), x_cur.dtype)
    xbuf[:, W + 1, :] = jnp.zeros((TILE + 2, C), x_cur.dtype)
    # halo rows: last row of the previous tile / first row of the next;
    # volume boundary rows are torch zero padding
    top = jnp.where(i > 0, x_prev[0, TILE - 1], 0).astype(x_cur.dtype)
    bot = jnp.where(i < nH - 1, x_nxt[0, 0], 0).astype(x_cur.dtype)
    xbuf[0, 1:W + 1, :] = top
    xbuf[TILE + 1, 1:W + 1, :] = bot

    # ---- 9 taps -> f32 accumulator ---------------------------------------
    M = TILE * W

    def tap(ky, kx):
        return xbuf[ky:ky + TILE, kx:kx + W, :].reshape(M, C)

    if mode == "im2col":
        cols = [tap(ky, kx) for ky in range(3) for kx in range(3)]
        lhs = jnp.concatenate(cols, axis=1)            # (M, 9C)
        rhs = w_ref[:].reshape(9 * C, CO)
        out = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
    elif mode == "taps":
        out = jnp.zeros((M, CO), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                out += jnp.dot(tap(ky, kx), w_ref[ky * 3 + kx],
                               preferred_element_type=jnp.float32)
    else:  # pairs: lane-aligned 2C contractions (4 pairs + 1 single)
        out = jnp.zeros((M, CO), jnp.float32)
        taps = [(ky, kx) for ky in range(3) for kx in range(3)]
        for p in range(4):
            (ka, xa), (kb, xb) = taps[2 * p], taps[2 * p + 1]
            lhs = jnp.concatenate([tap(ka, xa), tap(kb, xb)], axis=1)
            rhs = jnp.concatenate([w_ref[ka * 3 + xa], w_ref[kb * 3 + xb]],
                                  axis=0)              # (2C, CO)
            out += jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
        ky, kx = taps[8]
        out += jnp.dot(tap(ky, kx), w_ref[ky * 3 + kx],
                       preferred_element_type=jnp.float32)

    o_ref[0] = out.reshape(TILE, W, CO).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "mode_name"))
def conv3x3_pallas(x, w, interpret: bool = False, mode_name: str = None):
    """NHWC 3x3 stride-1 pad-1 conv == lax.conv_general_dilated
    (ops/conv2d._plain_conv2d) for these parameters; forward only."""
    N, H, W, C = x.shape
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3) and ci == C, (x.shape, w.shape)
    mode = mode_name or _mode()
    TILE = _pick_tile(H)
    nH = H // TILE

    w9 = w.reshape(9, C, co)

    def xmap_prev(n, i):
        return (n, jnp.maximum(i - 1, 0), 0, 0)

    def xmap_cur(n, i):
        return (n, i, 0, 0)

    def xmap_next(n, i):
        return (n, jnp.minimum(i + 1, nH - 1), 0, 0)

    xspec = lambda imap: pl.BlockSpec((1, TILE, W, C), imap,
                                      memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, TILE=TILE, W=W, C=C, CO=co, mode=mode)
    return pl.pallas_call(
        kern,
        grid=(N, nH),
        in_specs=[xspec(xmap_prev), xspec(xmap_cur), xspec(xmap_next),
                  pl.BlockSpec((9, C, co), lambda n, i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TILE, W, co), lambda n, i: (n, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TILE + 2, W + 2, C), x.dtype),
            pltpu.VMEM((TILE * W, co), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * W * 9 * C * co,
            bytes_accessed=(3 * N * H * W * C + N * H * W * co)
            * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, x, x, w9)
