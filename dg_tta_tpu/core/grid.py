"""Spatial resampling primitives: affine grids and trilinear grid sampling.

TPU-native equivalents of the torch ops the reference leans on everywhere
(`F.affine_grid` / `F.grid_sample`; see /root/reference/dg_tta/tta/tta.py:143,
torch_utils.py:55-73, augmentation_utils.py:84-129).  Implemented as pure XLA
gather programs over channels-last volumes so they fuse into the surrounding
jitted step; no data-dependent shapes.

Grid representation — PERFORMANCE CRITICAL: sampling grids are tuples
`(x, y, z)` of three (B, D, H, W) float arrays, NOT a packed (B, D, H, W, 3)
tensor.  A trailing length-3 axis sits on the TPU's 128-wide lane dimension
and pads every grid buffer ~42x (a 112x112x128 grid becomes ~820MB instead
of 19MB), which dominated the whole TTA step before this change.  Use
`pack_grid`/`unpack_grid` at torch-interop boundaries only.

Conventions (kept torch-compatible so checkpoint/plan parity is testable):
  * volumes are channels-last: (B, D, H, W, C)
  * coordinates are xyz-ordered and normalized to [-1, 1]: x indexes W,
    y indexes H, z indexes D
  * `align_corners` follows torch semantics exactly
"""

from functools import partial

import jax
import jax.numpy as jnp


def _base_coords(size: int, align_corners: bool, dtype) -> jnp.ndarray:
    """Normalized sample coordinates along one axis, torch convention."""
    if align_corners:
        return jnp.linspace(-1.0, 1.0, size, dtype=dtype)
    # pixel centers of a size-`size` axis mapped into [-1, 1]
    return (2.0 * jnp.arange(size, dtype=dtype) + 1.0) / size - 1.0


def identity_grid(spatial_size, align_corners: bool = False,
                  dtype=jnp.float32):
    """Identity grid as an (x, y, z) tuple of (D, H, W) arrays."""
    D, H, W = spatial_size
    z = _base_coords(D, align_corners, dtype)[:, None, None]
    y = _base_coords(H, align_corners, dtype)[None, :, None]
    x = _base_coords(W, align_corners, dtype)[None, None, :]
    shape = (D, H, W)
    return (jnp.broadcast_to(x, shape), jnp.broadcast_to(y, shape),
            jnp.broadcast_to(z, shape))


def affine_grid(theta, spatial_size, align_corners: bool = False):
    """Sampling grid for a batch of affine maps, torch `F.affine_grid`
    semantics.

    Args:
      theta: (B, 3, 4) affine matrices acting on xyz-ordered homogeneous
        normalized coordinates.
      spatial_size: (D, H, W) of the output grid.
    Returns:
      (x, y, z) tuple of (B, D, H, W) arrays.
    """
    theta = jnp.asarray(theta)
    D, H, W = spatial_size
    xb, yb, zb = identity_grid((D, H, W), align_corners, theta.dtype)
    out = []
    for i in range(3):
        t = theta[:, i]  # (B, 4)
        coord = (t[:, 0, None, None, None] * xb[None]
                 + t[:, 1, None, None, None] * yb[None]
                 + t[:, 2, None, None, None] * zb[None]
                 + t[:, 3, None, None, None])
        out.append(coord)
    return tuple(out)  # x, y, z each (B, D, H, W)


def pack_grid(grid):
    """(x, y, z) tuple -> (B, D, H, W, 3) packed tensor (torch interop)."""
    if isinstance(grid, (tuple, list)):
        return jnp.stack(grid, axis=-1)
    return grid


def unpack_grid(grid):
    """(…, 3) packed tensor or tuple -> (x, y, z) tuple."""
    if isinstance(grid, (tuple, list)):
        return tuple(grid)
    assert grid.shape[-1] == 3, grid.shape
    return (grid[..., 0], grid[..., 1], grid[..., 2])


def _unnormalize(coord, size: int, align_corners: bool):
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample_flat(
    flat,
    src_spatial,
    grid,
    mode: str = "trilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
):
    """grid_sample on a channels-first FLAT volume: (B, C, N) -> (B, C, N').

    This is the TPU-fast form.  PERF (measured on v5e): XLA-TPU has a fast
    dynamic-gather kernel (~0.03 ms / 1.6M f32 indices), but layout
    assignment fuses any downstream transpose of the gather output INTO the
    gather (kCustom transposing-gather), which falls back to a ~400x slower
    serial emitter — even through optimization_barrier, and those fusions
    were ~78% of the whole TTA adaptation step.  Keeping the result in
    channels-first flat (B, C, N) means no transpose exists to fuse; the
    consistency loss and the adjoint warp consume this layout directly.
    The barriers keep index arithmetic and the corner weighting out of the
    gather op itself (kLoop fusion with arithmetic hits the same slow
    emitter).

    Args:
      flat: (B, C, N) with N = D*H*W of `src_spatial`.
      src_spatial: (D, H, W) of the SOURCE volume.
      grid: (x, y, z) tuple of (B, Do, Ho, Wo) normalized coordinates.
    Returns:
      (B, C, N') with N' = Do*Ho*Wo, in output-voxel-linear order.
    """
    assert mode in ("trilinear", "nearest"), mode
    assert padding_mode in ("zeros", "border"), padding_mode
    B, C, N = flat.shape
    D, H, W = src_spatial
    assert N == D * H * W, (flat.shape, src_spatial)
    gx, gy, gz = unpack_grid(grid)

    x = _unnormalize(gx, W, align_corners)
    y = _unnormalize(gy, H, align_corners)
    z = _unnormalize(gz, D, align_corners)

    # PERF (v5e, measured in tools/probe_bisect.py + PERF.md): XLA-TPU's fast
    # gather emitter handles ONLY 32-bit, scalar-slice gathers in small
    # per-program doses (~0.02 ms / 1.6M idx).  For C == 1 we guarantee that
    # form (f32 upcast + 2D (1, N) operand takes).  For C > 1 NO fast
    # formulation exists (multi-channel slices, per-channel unrolls, and
    # separate-buffer variants all fall onto serial emitters, and >2 warps'
    # worth of unrolled gathers in one program can fault the TPU worker) —
    # keep the single multi-channel take, which runs on the ~23 ms/gather
    # serial path but is robust.
    out_dtype = flat.dtype
    fast_form = (C == 1)
    gather_dtype = (jnp.float32
                    if fast_form and flat.dtype in (jnp.bfloat16, jnp.float16)
                    else flat.dtype)
    flat = jax.lax.optimization_barrier(flat.astype(gather_dtype))

    def gather(zi, yi, xi, w=None):
        """Gather flat[b, :, lin(zi,yi,xi)] with clamping; weight applied."""
        inb = (
            (zi >= 0) & (zi <= D - 1)
            & (yi >= 0) & (yi <= H - 1)
            & (xi >= 0) & (xi <= W - 1)
        )
        zc = jnp.clip(zi, 0, D - 1)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        lin = (zc * H + yc) * W + xc  # (B, Do, Ho, Wo)
        lin2 = jax.lax.optimization_barrier(lin.reshape(B, -1))  # (B, N')
        if fast_form:
            vals = jnp.stack([jnp.take(flat[b], lin2[b], axis=1)
                              for b in range(B)])
        else:
            # per-batch gather with indices SHARED across channels
            vals = jax.vmap(lambda f, i: jnp.take(f, i, axis=1))(flat, lin2)
        vals = jax.lax.optimization_barrier(vals)
        if padding_mode == "zeros":
            scale = inb.astype(vals.dtype) if w is None else (
                w * inb.astype(vals.dtype))
        else:
            scale = w
        if scale is not None:
            vals = vals * scale.reshape(B, 1, -1).astype(vals.dtype)
        return vals

    if mode == "nearest":
        # torch rounds half away from floor via round-to-nearest-even on the
        # unnormalized coordinate; jnp.round matches numpy (banker's). torch
        # uses std::nearbyint (also even-rounding), so jnp.round is parity.
        zi = jnp.round(z).astype(jnp.int32)
        yi = jnp.round(y).astype(jnp.int32)
        xi = jnp.round(x).astype(jnp.int32)
        return gather(zi, yi, xi).astype(out_dtype)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    tx = x - x0
    ty = y - y0
    tz = z - z0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    z0 = z0.astype(jnp.int32)
    x1, y1, z1 = x0 + 1, y0 + 1, z0 + 1

    out = (
        gather(z0, y0, x0, (1 - tz) * (1 - ty) * (1 - tx))
        + gather(z0, y0, x1, (1 - tz) * (1 - ty) * tx)
        + gather(z0, y1, x0, (1 - tz) * ty * (1 - tx))
        + gather(z0, y1, x1, (1 - tz) * ty * tx)
        + gather(z1, y0, x0, tz * (1 - ty) * (1 - tx))
        + gather(z1, y0, x1, tz * (1 - ty) * tx)
        + gather(z1, y1, x0, tz * ty * (1 - tx))
        + gather(z1, y1, x1, tz * ty * tx)
    )
    return out.astype(out_dtype)


@partial(jax.jit, static_argnames=("mode", "padding_mode", "align_corners"))
def grid_sample(
    vol,
    grid,
    mode: str = "trilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
):
    """Sample a channels-last volume at grid locations (torch `F.grid_sample`).

    Convenience wrapper over `grid_sample_flat` (the TPU-fast channels-first
    form — see its docstring for why).  NOTE for hot paths: the moveaxis
    back to channels-last below is a transpose that XLA may fuse into the
    gathers, hitting the slow emitter; inside jitted training steps prefer
    grid_sample_flat and keep consumers channels-first.

    Args:
      vol: (B, D, H, W, C) input volume.
      grid: (x, y, z) tuple of (B, Do, Ho, Wo) normalized coordinates
        (a packed (B, Do, Ho, Wo, 3) tensor is accepted for interop).
      mode: "trilinear" | "nearest".
      padding_mode: "zeros" | "border".
    Returns:
      (B, Do, Ho, Wo, C) resampled volume.
    """
    B, D, H, W, C = vol.shape
    gx = unpack_grid(grid)[0]
    out_spatial = gx.shape[1:4]
    flat = jnp.moveaxis(vol, -1, 1).reshape(B, C, D * H * W)
    if mode == "trilinear":
        # trilinear endomorphic W==128 warps take the Pallas staged-gather
        # kernel on TPU (ops/warp_pallas.py) — NOT differentiable; every
        # grid_sample call site is grad-free (fields/extraction/aug/eval),
        # the exact-autograd TTA path differentiates grid_sample_flat
        # directly (tta/engine.py exact_warp_grad)
        from dg_tta_tpu.ops.warp_pallas import warp_flat_auto
        out = warp_flat_auto(flat, (D, H, W), grid,
                             padding_mode=padding_mode,
                             align_corners=align_corners)
    else:
        out = grid_sample_flat(flat, (D, H, W), grid, mode=mode,
                               padding_mode=padding_mode,
                               align_corners=align_corners)
    return jnp.moveaxis(out.reshape(B, C, *out_spatial), 1, -1)


def warp(vol, disp_grid, **kw):
    """Convenience: sample `vol` at `identity + displacement` positions."""
    return grid_sample(vol, disp_grid, **kw)


def affine_inside_mask_flat(theta, spatial_size, align_corners: bool = False):
    """(B, 1, N) float32 mask: 1 where theta maps the output voxel inside
    the normalized cube [-1, 1]^3.

    The analytic analog of the zero band a zeros-padded resample stamps
    into warped content (tta.py:549-551 reference semantics): pure iota
    math, no resample, nothing gather-lowering.  Used by the
    relative-frame consistency path to reproduce the original-frame
    domain Omega ∩ theta_b Omega without warping a ones-channel.
    """
    gx, gy, gz = affine_grid(theta, spatial_size, align_corners)
    inside = ((jnp.abs(gx) <= 1.0) & (jnp.abs(gy) <= 1.0)
              & (jnp.abs(gz) <= 1.0))
    B = inside.shape[0]
    return inside.astype(jnp.float32).reshape(B, 1, -1)
