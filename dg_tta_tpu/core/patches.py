"""Random / center patch extraction from full volumes via affine resampling.

Reference semantics: /root/reference/dg_tta/tta/torch_utils.py:13-76
(`get_batch`): build a diagonal affine with scale = patch_size / volume_size
and a uniform random translation keeping the patch inside the volume, then
`grid_sample` (trilinear for the image with the volume's minimum as the
padding value, nearest for labels).

TPU twist: XLA needs static shapes, but volumes vary per sample.  Volumes are
zero-padded (at the high end) to a bucket shape; the *true* shape enters the
jitted program as a runtime array and is folded into the sampling affine, so
one compiled program serves every volume in a bucket.
"""

import jax
import jax.numpy as jnp

from dg_tta_tpu.core.grid import affine_grid, grid_sample, _unnormalize


def pad_to_bucket(vol, bucket_shape, pad_value=0.0):
    """Pad a (D, H, W, C) volume at the high end to bucket_shape.

    For IMAGE volumes pass pad_value=float(vol.min()): the reference treats
    everything outside the volume as the volume minimum (torch_utils.py:58-62),
    and min-padding the bucket band preserves that semantics exactly (and
    keeps the padded volume's min equal to the true min).  Labels pad with 0.
    """
    D, H, W, C = vol.shape
    bd, bh, bw = bucket_shape
    assert bd >= D and bh >= H and bw >= W, (vol.shape, bucket_shape)
    return jnp.pad(vol, ((0, bd - D), (0, bh - H), (0, bw - W), (0, 0)),
                   constant_values=pad_value)


def bucket_shape_for(shape, multiple: int = 32, min_size=None):
    """Round a volume shape up to `multiple` (bounding compile count)."""
    out = tuple(-(-int(s) // multiple) * multiple for s in shape)
    if min_size is not None:
        out = tuple(max(o, m) for o, m in zip(out, min_size))
    return out


def patch_affine(key, true_shape, patch_size, fixed: bool = False):
    """Patch-sampling affine (1, 3, 4) in the *true-volume* normalized frame.

    true_shape: (3,) float array (D, H, W) of the unpadded volume.
    The grid convention is xyz-ordered, so scales are flipped to (W, H, D),
    exactly as the reference flips them (torch_utils.py:28).
    """
    t_patch = jnp.asarray(patch_size, jnp.float32)
    t_in = jnp.asarray(true_shape, jnp.float32)
    scales = t_patch / t_in                      # (D, H, W) order
    scales_xyz = scales[::-1]                    # (W, H, D) -> x, y, z

    if fixed:
        offset_xyz = jnp.zeros((3,), jnp.float32)
    else:
        rand = 2.0 * jax.random.uniform(key, (3,)) - 1.0   # (D,H,W) order
        offset_range = jnp.clip((t_in - t_patch) / t_in, 0.0, None)
        offset_xyz = (rand * offset_range)[::-1]

    # eye*broadcast instead of jnp.diag: diag's scatter lowering risks the
    # TPU gather/scatter poison (PERF.md 'gather cliff')
    theta = jnp.concatenate(
        [jnp.eye(3, dtype=scales_xyz.dtype) * scales_xyz[None, :],
         offset_xyz[:, None]], axis=1
    )
    return theta[None]


def _compose_pad_correction(theta, true_shape, padded_shape):
    """Map true-volume normalized coords into padded-volume normalized coords.

    With align_corners=False, voxel i of axis size S sits at (2i+1)/S - 1;
    padding at the high end means u_padded = a * t_true + (a - 1) with
    a = S_true / S_padded, applied per xyz axis.
    """
    t_in = jnp.asarray(true_shape, jnp.float32)
    t_pad = jnp.asarray(padded_shape, jnp.float32)
    a_xyz = (t_in / t_pad)[::-1]
    # compose: theta' = diag(a) @ theta + [a - 1] on the translation column
    scale = a_xyz[None, :, None]
    theta2 = theta * scale
    theta2 = theta2.at[:, :, 3].add(a_xyz[None] - 1.0)
    return theta2


def sample_with_affine(vol_padded, true_shape, theta, patch_size,
                       mode: str = "trilinear", pad_with_min: bool = True):
    """Sample one patch given a precomputed true-frame affine (1, 3, 4)."""
    theta = _compose_pad_correction(theta, true_shape, vol_padded.shape[:3])
    grid = affine_grid(theta, patch_size, align_corners=False)
    vol = vol_padded[None]
    if pad_with_min:
        vmin = jnp.min(vol)
        patch = grid_sample(vol - vmin, grid, mode=mode, padding_mode="zeros",
                            align_corners=False)
        return patch + vmin
    return grid_sample(vol, grid, mode=mode, padding_mode="zeros",
                       align_corners=False)


def sample_unit_stride(vol_padded, true_shape, theta, patch_size,
                       pad_with_min: bool = True):
    """Fast trilinear path for patch_affine-style (diagonal) affines.

    `patch_affine` builds theta = diag(patch/true) + translation, so the
    sampling locations form an axis-aligned grid with EXACTLY unit voxel
    spacing (d input_voxel / d output_voxel = (P/V)·(V/P) = 1) and one
    constant fractional offset per axis.  Trilinear interpolation therefore
    reduces to one contiguous `dynamic_slice` of a (P+1)³ block plus three
    separable lerps with scalar weights — no gathers at all, where the
    general `grid_sample` route costs 8 full-volume gathers (the TTA
    profile's single largest cost).  Bit-for-bit the same sampling positions
    as `sample_with_affine`; out-of-volume reads resolve to the volume
    minimum exactly like the reference's min-shift + zero-pad trick
    (torch_utils.py:58-62) because the low/high pad bands are written as 0
    on the min-shifted volume.

    Only `mode="trilinear"` lives here: nearest (labels) keeps the gather
    route so exact-.5 coordinate ties keep torch's round-to-even semantics.
    """
    Dp, Hp, Wp, C = vol_padded.shape
    Pd, Ph, Pw = patch_size
    theta2 = _compose_pad_correction(theta, true_shape, vol_padded.shape[:3])

    # start coordinate (input voxel of output voxel 0) per xyz axis
    def start(ax, p_out, size_in):
        s = theta2[0, ax, ax]
        t = theta2[0, ax, 3]
        base0 = 1.0 / p_out - 1.0  # first align_corners=False sample coord
        return _unnormalize(s * base0 + t, size_in, False)

    cx = start(0, Pw, Wp)
    cy = start(1, Ph, Hp)
    cz = start(2, Pd, Dp)

    vmin = jnp.min(vol_padded) if pad_with_min else jnp.zeros(
        (), vol_padded.dtype)
    v = vol_padded - vmin
    # pad by the patch size both ways: the start can reach (V-P)/2 < 0 and
    # the +1-corner slice end (V+P)/2 + 1 > V when the true volume is
    # smaller than the patch; anything less lets dynamic_slice clamp-shift
    v = jnp.pad(v, ((Pd, Pd + 1), (Ph, Ph + 1), (Pw, Pw + 1), (0, 0)))

    oz = jnp.floor(cz)
    oy = jnp.floor(cy)
    ox = jnp.floor(cx)
    fz = (cz - oz).astype(v.dtype)
    fy = (cy - oy).astype(v.dtype)
    fx = (cx - ox).astype(v.dtype)
    blk = jax.lax.dynamic_slice(
        v,
        (oz.astype(jnp.int32) + Pd, oy.astype(jnp.int32) + Ph,
         ox.astype(jnp.int32) + Pw, jnp.int32(0)),
        (Pd + 1, Ph + 1, Pw + 1, C),
    )
    blk = blk[:-1] * (1.0 - fz) + blk[1:] * fz
    blk = blk[:, :-1] * (1.0 - fy) + blk[:, 1:] * fy
    blk = blk[:, :, :-1] * (1.0 - fx) + blk[:, :, 1:] * fx
    return blk[None] + vmin


def extract_batch(key, vols_padded, true_shapes, patch_size, batch_size: int,
                  labels_padded=None, fixed: bool = False):
    """Sample a batch of patches from a stack of bucketed volumes.

    The reference's `get_batch` (torch_utils.py:13-76): draw `batch_size`
    volume indices with replacement, then one patch per draw; image and label
    share the SAME sampling affine (image trilinear/min-padded, label
    nearest/zero-padded).

    Args:
      vols_padded: (N, D, H, W, C) bucket-padded volumes.
      true_shapes: (N, 3) float true (D, H, W) per volume.
      labels_padded: optional (N, D, H, W, 1) label volumes.
    Returns:
      imgs (B, *patch_size, C) and labels (B, *patch_size, 1) or None.
    """
    n = vols_padded.shape[0]
    k_idx, k_patch = jax.random.split(key)
    idxs = jax.random.randint(k_idx, (batch_size,), 0, n)
    keys = jax.random.split(k_patch, batch_size)

    def one(i, k):
        theta = patch_affine(k, true_shapes[i], patch_size, fixed=fixed)
        img = sample_unit_stride(vols_padded[i], true_shapes[i], theta,
                                 patch_size, pad_with_min=True)[0]
        if labels_padded is None:
            return img, jnp.zeros((), jnp.float32)
        lab = sample_with_affine(labels_padded[i], true_shapes[i], theta,
                                 patch_size, mode="nearest",
                                 pad_with_min=False)[0]
        return img, lab

    imgs, labs = jax.vmap(one)(idxs, keys)
    return (imgs, labs) if labels_padded is not None else (imgs, None)


def extract_patch(vol_padded, true_shape, patch_size, key=None,
                  fixed: bool = False, mode: str = "trilinear",
                  pad_with_min: bool = True):
    """Extract one patch from a padded (D, H, W, C) volume.

    Returns (1, *patch_size, C).  For images, out-of-volume regions take the
    volume minimum (the reference shifts by img.min() so zero-padding equals
    min-padding, torch_utils.py:58-62).  Pass pad_with_min=False for labels /
    one-hot channels (plain zero padding) and mode="nearest".
    """
    theta = patch_affine(key, true_shape, patch_size, fixed=fixed)
    if mode == "trilinear":
        return sample_unit_stride(vol_padded, true_shape, theta, patch_size,
                                  pad_with_min=pad_with_min)
    return sample_with_affine(vol_padded, true_shape, theta, patch_size,
                              mode=mode, pad_with_min=pad_with_min)
