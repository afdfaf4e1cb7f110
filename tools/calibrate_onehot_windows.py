"""Calibrate the one-hot warp candidate windows (ops/warp_onehot.py pz/py/px).

Measures the RESIDUAL integer offsets the staged one-hot scans must cover at
the full TS104 patch (112, 112, 128) after the per-sample translation base
is absorbed (warp_onehot._bases), for both reference TTA augmentation
families (affine strength 0.05, augmentation_utils.py:156-170; deformable
factor 0.5/interp 5, augmentation_utils.py:114-153).

Affine residuals are computed ANALYTICALLY: the coordinate field is linear,
so after mean-translation absorption the worst-case per-axis deviation is
sum_j |A_ij - I_ij| * half_extent_j voxels (attained at a patch corner),
plus <=1 for the base rounding and floor().  That gives exact per-draw
maxima for thousands of draws in milliseconds.  Deformable residuals use a
handful of real full-size field draws (the field amplitude is bounded by
`factor`, so few draws suffice).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dg_tta_tpu.core.fields import get_disp_field, get_rand_affine
from dg_tta_tpu.core.grid import _unnormalize, identity_grid, unpack_grid

PATCH = (112, 112, 128)
D, H, W = PATCH
B = 2


def affine_residual_bounds(draws=5000):
    """Per-draw per-axis worst-case residual (voxels) for theta AND inverse."""
    half = np.asarray([W / 2, H / 2, D / 2])  # x, y, z order (theta is xyz)
    out = []
    for s in range(draws):
        theta, theta_inv = get_rand_affine(jax.random.PRNGKey(s), B)
        for t in (theta, theta_inv):
            A = np.asarray(t)[:, :3, :3]  # (B, 3, 3) xyz rows
            dev = np.abs(A - np.eye(3)[None]) @ half  # (B, 3) voxels
            out.append(dev)
    dev = np.concatenate(out)  # (draws*2*B, 3) x, y, z
    return dev[:, ::-1]  # -> z, y, x


def deformable_residuals(draws=8):
    ident = identity_grid(PATCH, align_corners=False)

    @jax.jit
    def one(key):
        disp, disp_inv = get_disp_field(key, B, PATCH, factor=0.5,
                                        interpolation_factor=5)
        maxs = []
        for d in (disp, disp_inv):
            grid = tuple(i[None] + dd for i, dd in zip(ident, d))
            gx, gy, gz = unpack_grid(grid)
            per_axis = []
            for cs, size, ax in ((gz, D, 0), (gy, H, 1), (gx, W, 2)):
                u = _unnormalize(cs, size, False)
                base = jnp.round(jnp.mean(u, axis=(1, 2, 3))
                                 - (size - 1) / 2.0)
                idx = jax.lax.broadcasted_iota(
                    jnp.int32, (1, D, H, W), ax + 1).astype(jnp.float32)
                off = jnp.floor(u) - idx - base[:, None, None, None]
                per_axis.append(jnp.max(jnp.abs(off)))
            maxs.append(jnp.stack(per_axis))
        return jnp.max(jnp.stack(maxs), axis=0)

    res = [np.asarray(one(jax.random.PRNGKey(10_000 + s)))
           for s in range(draws)]
    return np.stack(res)  # (draws, 3) z, y, x


def main():
    dev = affine_residual_bounds()
    print(f"== affine strength 0.05, patch {PATCH}, "
          f"{dev.shape[0]} (draw, member, dir) combos ==")
    for i, name in enumerate("zyx"):
        a = dev[:, i] + 1.0  # floor + base-rounding slack
        qs = np.percentile(a, [50, 99, 99.9, 100])
        print(f"  {name}: p50={qs[0]:.1f} p99={qs[1]:.1f} "
              f"p99.9={qs[2]:.1f} max={qs[3]:.1f} vox")
    worst = dev.max(axis=1) + 1.0
    for w in (7, 9, 11, 13, 15, 17, 19, 21):
        frac = float((worst > w).mean())
        print(f"  window {w}: fraction of draws with ANY snapping "
              f"{frac:.3e}")

    d = deformable_residuals()
    print(f"== deformable factor 0.5 interp 5, {d.shape[0]} draws ==")
    print("  per-draw max |offset| (z, y, x):")
    print("  " + np.array2string(d, precision=1))
    print(f"  overall max: {d.max(axis=0)}")


if __name__ == "__main__":
    main()
