"""nnUNet-style training data augmentation as one fused jittable program.

The reference delegates DA to batchgenerators CPU worker processes
(nnUNetTrainer.get_training_transforms, see SURVEY §2.2); the MultiRes
trainers splice a discrete low-res simulation into that stack
(/root/reference/dg_tta/pretraining/nnUNetTrainer_GIN_MultiRes.py:46-72,
discrete_downsampling.py:8-37).  Here the whole stack is pure JAX on-device:
every transform is vectorized over the batch with per-sample Bernoulli gates
(lax.select keeps shapes static), so DA fuses into the training step.

Transforms (nnUNet v2.2.1 defaults for 3d_fullres; mirroring is intentionally
absent — the DG trainers disable it, nnUNetTrainer_GIN.py:31-36):
  rotation+scaling (affine, p=0.2), Gaussian noise (p=0.1), Gaussian blur
  (p=0.2), multiplicative brightness (p=0.15), contrast (p=0.15), low-res
  simulation (continuous p=0.25 | discrete MultiRes zooms {1/6,1/4,1/2}
  p=0.5), gamma on inverted image (p=0.1), gamma (p=0.3).
Divergence: transform order and parameters follow nnUNet, but interpolation
uses our trilinear grid_sample everywhere (batchgenerators mixes spline
orders), and per-channel gates are per-sample here (C=1 in all DG configs).
"""

import dataclasses
import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dg_tta_tpu.core.grid import affine_grid, grid_sample, identity_grid
from dg_tta_tpu.ops.mind import gaussian_kernel_1d


@dataclasses.dataclass(frozen=True)
class DAConfig:
    rotation_rad: float = 0.52          # ~30deg, nnUNet 3d default
    p_rotation: float = 0.2
    scale_range: Tuple[float, float] = (0.7, 1.4)
    p_scale: float = 0.2
    p_noise: float = 0.1
    noise_sigma: Tuple[float, float] = (0.0, 0.1)
    p_blur: float = 0.2
    blur_sigma: Tuple[float, float] = (0.5, 1.0)
    p_brightness: float = 0.15
    brightness: Tuple[float, float] = (0.75, 1.25)
    p_contrast: float = 0.15
    contrast: Tuple[float, float] = (0.75, 1.25)
    p_lowres: float = 0.25
    lowres_zoom: Tuple[float, float] = (0.5, 1.0)
    discrete_lowres_zooms: Optional[Tuple[float, ...]] = None  # MultiRes
    p_gamma_invert: float = 0.1
    p_gamma: float = 0.3
    gamma_range: Tuple[float, float] = (0.7, 1.5)


MULTIRES_ZOOMS = (1.0 / 6.0, 0.25, 0.5)  # discrete_downsampling.py:20-24


def _da_impl() -> str:
    """Resolve the DA resampler implementation at trace time.

    DGTTA_DA_TPU: "0" = stock XLA forms (grid_sample + window blur),
    "1" = force the MXU matrix forms (train/augment_tpu.py), "auto"
    (default) = MXU forms on the TPU backend.  Read at trace time — the
    pretrain step jits once per run; probes that flip it mid-process must
    rebuild their jitted functions (tools/probe_da.py does).
    """
    import os
    v = os.environ.get("DGTTA_DA_TPU", "auto")
    if v == "auto":
        return "tpu" if jax.default_backend() == "tpu" else "stock"
    return "tpu" if v == "1" else "stock"


def _bernoulli(key, p, shape=()):
    return jax.random.uniform(key, shape) < p


def _rand_rot_scale_affine(key, cfg: DAConfig):
    """Random rotation (per-axis euler) + isotropic scale affine (3, 4)."""
    ks = jax.random.split(key, 5)
    ang = jax.random.uniform(ks[0], (3,), minval=-cfg.rotation_rad,
                             maxval=cfg.rotation_rad)
    do_rot = _bernoulli(ks[1], cfg.p_rotation)
    ang = jnp.where(do_rot, ang, 0.0)
    ca, sa = jnp.cos(ang), jnp.sin(ang)
    rx = jnp.array([[1, 0, 0], [0, ca[0], -sa[0]], [0, sa[0], ca[0]]])
    ry = jnp.array([[ca[1], 0, sa[1]], [0, 1, 0], [-sa[1], 0, ca[1]]])
    rz = jnp.array([[ca[2], -sa[2], 0], [sa[2], ca[2], 0], [0, 0, 1]])
    rot = rz @ ry @ rx
    scale = jax.random.uniform(ks[2], (), minval=cfg.scale_range[0],
                               maxval=cfg.scale_range[1])
    do_scale = _bernoulli(ks[3], cfg.p_scale)
    scale = jnp.where(do_scale, scale, 1.0)
    # nnUNet zooms the sampled patch: scale > 1 means zoom OUT (sample a
    # larger source region); the sampling grid multiplies by scale.
    mat = rot * scale
    return jnp.concatenate([mat, jnp.zeros((3, 1))], axis=1)


def _blur_1d(x, sigma, axis):
    """Gaussian blur along one spatial axis with a fixed-support kernel whose
    width is data-dependent through the sigma value (kernel size static)."""
    # static kernel radius for the max sigma (1.0) -> radius 4
    radius = 4
    offs = jnp.arange(-radius, radius + 1, dtype=x.dtype)
    k = jnp.exp(-0.5 * (offs / jnp.maximum(sigma, 1e-6)) ** 2)
    k = k / jnp.sum(k)
    x_m = jnp.moveaxis(x, axis, -1)
    pad = [(0, 0)] * (x_m.ndim - 1) + [(radius, radius)]
    x_p = jnp.pad(x_m, pad, mode="edge")
    windows = [x_p[..., i:i + x_m.shape[-1]] for i in range(2 * radius + 1)]
    out = sum(w * k[i] for i, w in enumerate(windows))
    return jnp.moveaxis(out, -1, axis)


def _gaussian_blur(x, sigma):
    for ax in (0, 1, 2):
        x = _blur_1d(x, sigma, ax)
    return x


import functools


@functools.lru_cache(maxsize=None)
def _lowres_axis_matrices(size: int, zooms: Tuple[float, ...]):
    """Exact per-axis operators for the discrete low-res simulation.

    The reference's SimulateDiscreteLowResolutionTransform
    (discrete_downsampling.py:8-37 with nnUNetTrainer_GIN_MultiRes.py:62-67
    params) does skimage.resize down (order 0, mode='edge', no AA) then up
    (order 3): a LINEAR map of the input, separable per axis (nearest pick
    and tensor-product cubic splines both are).  For a discrete zoom set the
    per-axis composite is a fixed (size, size) matrix — computed here by
    pushing the identity through the scipy oracle (skimage.resize without AA
    delegates to scipy.ndimage.zoom(grid_mode=True, mode='nearest') for
    mode='edge'), so the on-device einsum reproduces the reference EXACTLY
    instead of the old trilinear-at-snapped-centers approximation.

    Returns (len(zooms)+1, size, size) float32; the last entry is identity
    (the p_per_sample gate's 'off' branch).
    """
    from scipy import ndimage

    mats = []
    for zm in zooms:
        tgt = max(int(round(size * zm)), 1)
        eye = np.eye(size, dtype=np.float64)
        down = ndimage.zoom(eye, (tgt / size, 1.0), order=0, mode="nearest",
                            grid_mode=True)
        up = ndimage.zoom(down, (size / down.shape[0], 1.0), order=3,
                          mode="nearest", grid_mode=True)
        assert up.shape == (size, size), (up.shape, size, zm)
        mats.append(up)
    mats.append(np.eye(size, dtype=np.float64))
    return np.stack(mats).astype(np.float32)


def _discrete_lowres(x, zoom_idx, zoom_set, patch_size):
    """Apply the exact discrete low-res operator, one matrix per axis.

    Args:
      x: (D, H, W, C); zoom_idx: (3,) int32 index into zoom_set+[identity].
    """
    for ax in range(3):
        mats = jnp.asarray(_lowres_axis_matrices(patch_size[ax], zoom_set))
        # static-slice + where chain, NOT jnp.take: a small dynamic gather in
        # device code would poison the process-wide fast gather emitter
        # (PERF.md 'gather cliff'); the matrix set is tiny and static.
        m = mats[-1]
        for i in range(mats.shape[0] - 1):
            m = jnp.where(zoom_idx[ax] == i, mats[i], m)  # (size, size)
        x = jnp.moveaxis(jnp.tensordot(m, x, axes=(1, ax)), 0, ax)
    return x


def _lowres_sim(x, zoom, patch_size):
    """Downsample (nearest, matching order-0) then upsample (trilinear) by a
    per-axis zoom factor, emulated with two grid_sample passes."""
    D, H, W = patch_size
    # zoom: (3,) factors <= 1. Downsample to round(size*zoom) would be a
    # dynamic shape; instead sample the full-size grid from a nearest-
    # neighbor grid quantized to the low-res lattice.
    base = identity_grid(patch_size, align_corners=False)  # (x, y, z) tuple
    # zoom is (3,) in (D, H, W) order; grid components are xyz-ordered
    sizes = (float(W), float(H), float(D))
    zooms = (zoom[2], zoom[1], zoom[0])
    centers = []
    for c, size, zm in zip(base, sizes, zooms):
        low = jnp.maximum(jnp.round(size * zm), 1.0)
        # voxel index on the low-res lattice (align_corners=False convention)
        u = jnp.round((c + 1.0) * 0.5 * low - 0.5)
        centers.append(((2.0 * u + 1.0) / low - 1.0)[None])
    return grid_sample(x[None], tuple(centers), mode="trilinear",
                       padding_mode="border", align_corners=False)[0]


def _gamma(x, key, gamma_range, invert: bool):
    g = jax.random.uniform(key, (), minval=gamma_range[0],
                           maxval=gamma_range[1])
    y = -x if invert else x
    mn = jnp.min(y)
    rng = jnp.maximum(jnp.max(y) - mn, 1e-7)
    yn = (y - mn) / rng
    out = jnp.power(yn, g) * rng + mn
    return -out if invert else out


def augment_sample(key, img, seg, cfg: DAConfig, patch_size):
    """Augment one (D, H, W, C) image and (D, H, W, 1) seg patch.

    Every transform draws its Bernoulli gate and its magnitude from DISTINCT
    keys — reusing one key for both correlates the decision with the value
    (jax.random.uniform with the same key returns the same underlying
    uniform, so e.g. a shared brightness key would fire the transform only
    for multipliers in the low tail of its range).
    """
    keys = jax.random.split(key, 16)
    impl = _da_impl()

    # ---- spatial: rotation + scale (shared grid for img & seg) ----------
    theta = _rand_rot_scale_affine(keys[0], cfg)
    if impl == "tpu":
        from dg_tta_tpu.train.augment_tpu import affine_warp_tpu
        img = affine_warp_tpu(img[None], theta[None], mode="trilinear",
                              padding_mode="border")[0]
        seg = affine_warp_tpu(seg[None], theta[None], mode="nearest",
                              padding_mode="zeros")[0]
    else:
        grid = affine_grid(theta[None], patch_size, align_corners=False)
        img = grid_sample(img[None], grid, mode="trilinear",
                          padding_mode="border", align_corners=False)[0]
        seg = grid_sample(seg[None], grid, mode="nearest",
                          padding_mode="zeros", align_corners=False)[0]

    # ---- Gaussian noise -------------------------------------------------
    sig = jax.random.uniform(keys[1], (), minval=cfg.noise_sigma[0],
                             maxval=cfg.noise_sigma[1])
    noise = jax.random.normal(keys[2], img.shape) * sig
    img = jnp.where(_bernoulli(keys[11], cfg.p_noise), img + noise, img)

    # ---- Gaussian blur --------------------------------------------------
    bs = jax.random.uniform(keys[3], (), minval=cfg.blur_sigma[0],
                            maxval=cfg.blur_sigma[1])
    if impl == "tpu":
        from dg_tta_tpu.train.augment_tpu import gaussian_blur_tpu
        blurred = gaussian_blur_tpu(img[None], bs[None])[0]
    else:
        blurred = _gaussian_blur(img, bs)
    img = jnp.where(_bernoulli(keys[4], cfg.p_blur), blurred, img)

    # ---- brightness (multiplicative) ------------------------------------
    b = jax.random.uniform(keys[5], (), minval=cfg.brightness[0],
                           maxval=cfg.brightness[1])
    img = jnp.where(_bernoulli(keys[12], cfg.p_brightness), img * b, img)

    # ---- contrast (preserve mean) ---------------------------------------
    c = jax.random.uniform(keys[6], (), minval=cfg.contrast[0],
                           maxval=cfg.contrast[1])
    mean = jnp.mean(img)
    img = jnp.where(_bernoulli(keys[13], cfg.p_contrast),
                    (img - mean) * c + mean, img)

    # ---- low-resolution simulation -------------------------------------
    if cfg.discrete_lowres_zooms is not None:
        # MultiRes: per-axis independent choice from the discrete zoom set,
        # identity when the p_per_sample=0.5 gate is off
        # (nnUNetTrainer_GIN_MultiRes.py:58-71 via
        # SimulateDiscreteLowResolutionTransform); applied as the EXACT
        # order0-down/order3-up linear operator (see _lowres_axis_matrices)
        n_zooms = len(cfg.discrete_lowres_zooms)
        zi = jax.random.randint(keys[7], (3,), 0, n_zooms)
        do = _bernoulli(keys[8], 0.5)
        zi = jnp.where(do, zi, n_zooms)  # last matrix = identity
        img = _discrete_lowres(img, zi, tuple(cfg.discrete_lowres_zooms),
                               patch_size)
    else:
        zoom = jax.random.uniform(keys[7], (3,), minval=cfg.lowres_zoom[0],
                                  maxval=cfg.lowres_zoom[1])
        do = _bernoulli(keys[8], cfg.p_lowres)
        zoom = jnp.where(do, zoom, 1.0)
        if impl == "tpu":
            from dg_tta_tpu.train.augment_tpu import lowres_sim_tpu
            img = lowres_sim_tpu(img[None], zoom[None])[0]
        else:
            img = _lowres_sim(img, zoom, patch_size)

    # ---- gamma (inverted, then plain) -----------------------------------
    img = jnp.where(_bernoulli(keys[14], cfg.p_gamma_invert),
                    _gamma(img, keys[9], cfg.gamma_range, invert=True), img)
    img = jnp.where(_bernoulli(keys[15], cfg.p_gamma),
                    _gamma(img, keys[10], cfg.gamma_range, invert=False), img)

    return img, seg


def augment_batch(key, imgs, segs, cfg: DAConfig):
    """Vectorized DA over a (B, D, H, W, C) batch."""
    patch_size = imgs.shape[1:4]
    keys = jax.random.split(key, imgs.shape[0])
    fn = partial(augment_sample, cfg=cfg, patch_size=patch_size)
    return jax.vmap(fn)(keys, imgs, segs)
