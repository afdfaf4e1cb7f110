"""Random spatial augmentation fields: smooth random fields, inverse-consistent
diffeomorphic displacement fields, and random affines.

Reference semantics: /root/reference/dg_tta/tta/augmentation_utils.py:8-170.
All randomness is explicit-key JAX PRNG. The reference's `get_disp_field`
carries a latent TypeError (it forwards a nonexistent `alternating_fields`
kwarg, augmentation_utils.py:141-148); here the deformable path is implemented
correctly and covered by tests.
"""

import jax
import jax.numpy as jnp

from dg_tta_tpu.core.grid import grid_sample, identity_grid


def _avg_pool3d_same(x, k: int):
    """Average pool with stride 1 and torch-style padding k//2 on both sides.

    x: (B, D, H, W, C). Matches F.avg_pool3d(kernel, stride=1, padding=k//2)
    with count_include_pad=True (the torch default used by the reference).
    """
    p = k // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (p, p), (0, 0)))
    win = jax.lax.reduce_window(
        xp,
        0.0,
        jax.lax.add,
        window_dimensions=(1, k, k, k, 1),
        window_strides=(1, 1, 1, 1, 1),
        padding="VALID",
    )
    return win / float(k**3)


def _resize_axis_matrix(n_in: int, n_out: int, dtype=jnp.float32):
    """(n_out, n_in) linear-interp matrix: output-pixel centers mapped into
    the input lattice (align_corners=False), border clamp — per-axis factor
    of F.interpolate(mode='trilinear', align_corners=False)."""
    import numpy as np
    pos = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
    pos = np.clip(pos, 0.0, n_in - 1.0)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    f = pos - lo
    M = np.zeros((n_out, n_in), np.float64)
    M[np.arange(n_out), lo] += 1.0 - f
    M[np.arange(n_out), hi] += f
    return jnp.asarray(M, dtype)


def _resize_trilinear(x, size_3d):
    """Trilinear resize matching F.interpolate(mode='trilinear',
    align_corners=False): sample at output-pixel centers with border clamp.

    Axis-SEPARABLE, so implemented as three small interpolation matmuls
    (MXU work, gather-free) instead of a grid_sample — a C=3 whole-volume
    gather here would ride the slow serial emitter inside the deformable
    TTA epoch program (PERF.md gather cliff).  Bit-for-bit the same math:
    trilinear at a separable grid == product of per-axis linear interps.
    """
    B, d, h, w, C = x.shape
    D, H, W = size_3d
    Mz = _resize_axis_matrix(d, D, x.dtype)
    My = _resize_axis_matrix(h, H, x.dtype)
    Mx = _resize_axis_matrix(w, W, x.dtype)
    x = jnp.einsum("Dd,bdhwc->bDhwc", Mz, x)
    x = jnp.einsum("Hh,bdhwc->bdHwc", My, x)
    return jnp.einsum("Ww,bdhwc->bdhWc", Mx, x)


def get_rf_field(key, num_batch, size_3d, interpolation_factor: int = 4,
                 num_fields: int = 4, dtype=jnp.float32):
    """Smoothed, zero-mean, unit-std random field.

    Reference: augmentation_utils.py:8-43 -- randn at size/interp_factor,
    3x avg_pool3d(k=interp_factor, stride=1, pad=k//2), trilinear upsample,
    normalize mean/std per (batch, field).

    Returns (B, D, H, W, num_fields) channels-last.
    """
    small = tuple(s // interpolation_factor for s in size_3d)
    field = jax.random.normal(key, (num_batch, *small, num_fields), dtype)
    for _ in range(3):
        field = _avg_pool3d_same(field, interpolation_factor)
    field = _resize_trilinear(field, size_3d)
    mean = jnp.mean(field, axis=(1, 2, 3), keepdims=True)
    field = field - mean
    std = jnp.std(field, axis=(1, 2, 3), keepdims=True)
    return field / (1e-3 + std)


def _warp_field(field_cl, positions_xyz, impl: str = "gather",
                padding_mode: str = "border"):
    """grid_sample a (B,D,H,W,3) displacement field at given xyz positions.

    impl="shear" routes through the banded per-axis resampler
    (ops/warp_shear.warp_grid_shear) instead of the joint gather: this is
    the ONLY gather in the deformable field generation, it runs channels-
    last with C=3 (the pathological small-lane gather layout, CLAUDE/PERF
    gather notes) at full patch size inside a fori_loop, and the full-size
    deformable member program FAULTS the v5e worker at runtime with it
    (PERF.md r5d).  The fields here are tiny (scaled by 1/2^time_steps),
    so the sequential-pass cross terms are negligible.
    """
    if impl == "shear":
        from dg_tta_tpu.ops.warp_shear import warp_grid_shear
        B, D, H, W, C = field_cl.shape
        flat = jnp.moveaxis(field_cl, -1, 1).reshape(B, C, -1)
        grid = tuple(positions_xyz[..., i] for i in range(3))
        out = warp_grid_shear(flat, grid, (D, H, W),
                              padding_mode=padding_mode, align_corners=True)
        return jnp.moveaxis(out.reshape(B, C, D, H, W), 1, -1)
    return grid_sample(field_cl, positions_xyz, mode="trilinear",
                       padding_mode=padding_mode, align_corners=True)


def calc_consistent_diffeomorphic_field(
    disp_field,
    inverse_disp_field,
    time_steps: int = 1,
    ensure_inverse_consistency: bool = True,
    iter_steps_override=None,
    warp_impl: str = "gather",
    dim_corr_override=None,
):
    """Scaling-and-squaring with optional inverse-consistency iterations.

    Reference: augmentation_utils.py:46-135 (Arsigny log-Euclidean framework).
    Fields are channels-last (B, D, H, W, 3) normalized-grid offsets,
    xyz-ordered to match grid convention; internally scaled by the
    reference's (D, H, W) dim-correction quirk (see below).

    dim_corr_override: pass the FULL patch size when running the loop on a
    downsampled field lattice (get_disp_field field_res="half") so the
    internal scaling — and hence the composed field — matches the full-res
    computation instead of picking up the lattice's own dims.

    Returns (disp, inverse_disp), channels-last, same units as the input.
    """
    B, D, H, W, _ = disp_field.shape
    corr_dims = tuple(dim_corr_override) if dim_corr_override else (D, H, W)
    # PARITY over plausibility: the reference divides the xyz-ordered field
    # channels by (D, H, W) (augmentation_utils.py:58-60) — i.e. the
    # x-component (which indexes W) is scaled by D.  That only matches the
    # "natural" per-axis normalization for cubic patches, but the
    # inverse-consistency iterations compose in this scaled space, so we
    # reproduce it exactly (tests/test_fields.py pins the convention).
    dim_corr = jnp.asarray(corr_dims, disp_field.dtype).reshape(1, 1, 1, 1, 3)
    dt = 1.0 / time_steps
    steps = iter_steps_override if iter_steps_override else time_steps

    # packed (1, D, H, W, 3) identity for field-space arithmetic; internal to
    # this jitted computation (the tuple convention applies at boundaries)
    identity = jnp.stack(identity_grid((D, H, W), align_corners=True,
                                       dtype=disp_field.dtype), axis=-1)[None]

    if ensure_inverse_consistency:
        ds = disp_field / dim_corr / (2**time_steps) * dt
        inv_ds = inverse_disp_field / dim_corr / (2**time_steps) * dt

        def body(_, carry):
            ds, inv_ds = carry
            new_ds = 0.5 * ds - 0.5 * _warp_field(inv_ds, identity + ds,
                                                  warp_impl)
            new_inv = 0.5 * inv_ds - 0.5 * _warp_field(ds, identity + inv_ds,
                                                       warp_impl)
            return new_ds, new_inv

        ds, inv_ds = jax.lax.fori_loop(0, steps, body, (ds, inv_ds))
        out = ds * (2**time_steps) * dim_corr
        out_inv = inv_ds * (2**time_steps) * dim_corr
    else:
        ds = disp_field / dim_corr / (2**time_steps) * dt
        inv_ds = inverse_disp_field / dim_corr / (2**time_steps) * dt

        def body(_, carry):
            ds, inv_ds = carry
            new_ds = ds + _warp_field(ds, identity + ds, warp_impl,
                                      padding_mode="zeros")
            new_inv = inv_ds + _warp_field(inv_ds, identity + inv_ds,
                                           warp_impl, padding_mode="zeros")
            return new_ds, new_inv

        ds, inv_ds = jax.lax.fori_loop(0, steps, body, (ds, inv_ds))
        out = ds * dim_corr
        out_inv = inv_ds * dim_corr

    return out, out_inv


def get_disp_field(key, batch_num, size_3d, factor: float = 0.1,
                   interpolation_factor: int = 5, warp_impl: str = "gather",
                   field_res: str = "full"):
    """Random inverse-consistent displacement grids (normalized units).

    Reference: augmentation_utils.py:138-153 (with its latent kwarg bug fixed).
    Returns (disp, inverse_disp), each an (x, y, z) tuple of (B, D, H, W)
    grid offsets (add to an identity grid tuple before grid_sample).

    field_res="half": run the scaling-and-squaring + inverse-consistency
    loop on a 2x-downsampled lattice and trilinearly upsample the results.
    The random field itself is still drawn at FULL resolution (so its
    normalized-space statistics are unchanged — the knot lattice is
    size/interpolation_factor either way) and the loop keeps the full-res
    dim-correction (dim_corr_override), so the half-res computation is the
    same math on a coarser grid: O(h^2) discretization error on fields
    that are smooth by construction (knot spacing ~interpolation_factor
    voxels), for ~8x fewer field-warp FLOPs — the dominant cost of the
    deformable member program on TPU (PERF.md r5d/r5h).
    """
    from dg_tta_tpu.core.grid import unpack_grid

    field = get_rf_field(key, batch_num, size_3d, num_fields=3,
                         interpolation_factor=interpolation_factor)
    STEPS = 5
    if field_res == "half":
        half = tuple(max(s // 2, 4) for s in size_3d)
        field_h = _resize_trilinear(field, half)
        disp, inv_disp = calc_consistent_diffeomorphic_field(
            field_h * factor, jnp.zeros_like(field_h), STEPS,
            ensure_inverse_consistency=True, warp_impl=warp_impl,
            dim_corr_override=size_3d,
        )
        disp = _resize_trilinear(disp, size_3d)
        inv_disp = _resize_trilinear(inv_disp, size_3d)
    else:
        disp, inv_disp = calc_consistent_diffeomorphic_field(
            field * factor, jnp.zeros_like(field), STEPS,
            ensure_inverse_consistency=True, warp_impl=warp_impl,
        )
    return unpack_grid(disp), unpack_grid(inv_disp)


def get_rand_affine(key, batch_size: int, strength: float = 0.05,
                    flip: bool = False, dtype=jnp.float32):
    """Random affine near identity plus its inverse (augmentation_utils.py:156-170).

    Returns (theta, theta_inverse), each (B, 3, 4).
    """
    k1, k2 = jax.random.split(key)
    noise = jax.random.normal(k1, (batch_size, 3, 4), dtype) * strength
    affine = jnp.concatenate(
        [
            noise + jnp.eye(3, 4, dtype=dtype)[None],
            jnp.tile(jnp.asarray([[[0.0, 0.0, 0.0, 1.0]]], dtype), (batch_size, 1, 1)),
        ],
        axis=1,
    )
    if flip:
        signs = 2.0 * (jax.random.uniform(k2, (3,)) > 0.5).astype(dtype) - 1.0
        diag_vals = jnp.concatenate([signs, jnp.ones((1,), dtype)])
        flip_affine = jnp.eye(4, dtype=dtype) * diag_vals[None, :]
        affine = affine @ flip_affine
    # closed-form inverse of the (R | t) block instead of jnp.linalg.inv:
    # the LU path emits pivot GATHERS, and any gather op inside a TPU
    # program can flip the process's dynamic-gather emitter into its ~400x
    # slower serial mode (PERF.md 'gather cliff'; tools/probe_bisect.py)
    R = affine[:, :3, :3]
    t = affine[:, :3, 3]
    c0, c1, c2 = R[:, :, 0], R[:, :, 1], R[:, :, 2]
    det = jnp.einsum("bi,bi->b", c0, jnp.cross(c1, c2))
    r_inv = jnp.stack([jnp.cross(c1, c2), jnp.cross(c2, c0),
                       jnp.cross(c0, c1)], axis=1) / det[:, None, None]
    t_inv = -jnp.einsum("bij,bj->bi", r_inv, t)
    inverse = jnp.concatenate([r_inv, t_inv[:, :, None]], axis=2)
    return affine[:, :3], inverse


def compose_affine(P, Q):
    """Composition z -> P(Q(z)) of two torch-style (B, 3, 4) affines.

    Both act on xyz-ordered homogeneous normalized coordinates (the
    affine_grid convention): P(z) = R_P z + t_P, so the composite has
    R = R_P R_Q and t = R_P t_Q + t_P.  Used by the relative-frame
    consistency path (tta/engine.py): theta_rel = theta_a_inv o theta_b
    warps branch-a logits directly into branch-b's frame with ONE
    resample instead of inverse-warping both branches.
    """
    P, Q = jnp.asarray(P), jnp.asarray(Q)
    R = jnp.einsum("bij,bjk->bik", P[:, :, :3], Q[:, :, :3])
    t = jnp.einsum("bij,bj->bi", P[:, :, :3], Q[:, :, 3]) + P[:, :, 3]
    return jnp.concatenate([R, t[:, :, None]], axis=2)
