"""Shear-pass dot_general variants: the r3h trace shows each pass's batched
matmul runs ~80x below roofline (fusion.2930/2954/...: ~50 ms for ~0.43 GB
of traffic), with XLA assigning M pathological layouts ({3,0,2,1} etc) and
re-laying-out operands per consumer.  Variants:

  v0  warp_affine_shear as shipped (3 passes, per-axis einsum forms)
  v1  operand-swapped einsums (M as LHS: "bzyxs,bczys->bczyx")
  v2  transpose-to-last: every pass resamples the LAST axis via one shared
      einsum form, with explicit cyclic transposes between passes
  v3  v2 but with the einsum replaced by a (z,y)-slab dot_general written
      with merged batch dims

Full-size member shapes: B=1, C=10, (112,112,128) bf16, fwd + bwd wrt vals.

Env: PROBE_C (10), PROBE_BF16 (1), PROBE_VARIANTS.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from dg_tta_tpu.core.fields import get_rand_affine
    from dg_tta_tpu.ops import warp_shear as ws

    C = int(os.environ.get("PROBE_C", 10))
    dt = (jnp.bfloat16 if os.environ.get("PROBE_BF16", "1") == "1"
          else jnp.float32)
    D, H, W = 112, 112, 128
    N = D * H * W
    variants = os.environ.get("PROBE_VARIANTS", "v0,v1,v2").split(",")

    key = jax.random.PRNGKey(0)
    flat = jax.random.normal(key, (1, C, N), dt)
    theta, _ = get_rand_affine(jax.random.PRNGKey(1), 1)

    def passes_fields():
        A, b = ws.affine_vox_map(theta, (D, H, W), False)
        (cz, bz), (cy, by), (cx, bx) = ws.shear_pass_coeffs(A, b)
        fx = ws._pass_field(cx, bx, (D, H, W))
        fy = ws._pass_field(cy, by, (D, H, W))
        fz = ws._pass_field(cz, bz, (D, H, W))
        return fx, fy, fz

    def v0(flat):
        return ws.warp_affine_shear(flat, theta, (D, H, W))

    def make_M(field, size):
        return ws._onehot_lerp_matrix(field, size, "zeros", dt)

    def v1(flat):
        fx, fy, fz = passes_fields()
        vol = flat.reshape(1, C, D, H, W)
        M = make_M(fx, W)
        vol = jnp.einsum("bzyxs,bczys->bczyx", M, vol,
                         preferred_element_type=jnp.float32).astype(dt)
        M = make_M(fy, H)
        vol = jnp.einsum("bzyxs,bczsx->bczyx", M, vol,
                         preferred_element_type=jnp.float32).astype(dt)
        M = make_M(fz, D)
        vol = jnp.einsum("bzyxs,bcsyx->bczyx", M, vol,
                         preferred_element_type=jnp.float32).astype(dt)
        return vol.reshape(1, C, N)

    def resample_last(vol, field, size):
        # vol (..., S) resampled along the last axis at field (..., X)
        M = make_M(field, size)          # (1, U, V, X, S)
        return jnp.einsum("bcuvs,buvxs->bcuvx", vol, M,
                          preferred_element_type=jnp.float32).astype(dt)

    def v2(flat):
        fx, fy, fz = passes_fields()
        vol = flat.reshape(1, C, D, H, W)
        # x pass: x is last already; field (1, D, H, W)
        vol = resample_last(vol, fx, W)
        # y pass: rotate y to last: (b,c,z,y,x) -> (b,c,z,x,y)
        vol = jnp.swapaxes(vol, 3, 4)
        fy_t = jnp.swapaxes(fy, 2, 3)    # (1, D, W, H) coordinates
        vol = resample_last(vol, fy_t, H)
        vol = jnp.swapaxes(vol, 3, 4)
        # z pass: rotate z to last: (b,c,z,y,x) -> (b,c,y,x,z)
        vol = jnp.moveaxis(vol, 2, 4)
        fz_t = jnp.transpose(fz, (0, 2, 3, 1))
        vol = resample_last(vol, fz_t, D)
        vol = jnp.moveaxis(vol, 4, 2)
        return vol.reshape(1, C, N)

    impls = {"v0": v0, "v1": v1, "v2": v2}
    ref = None
    res = {}
    for name in variants:
        fn0 = impls[name]
        f = jax.jit(fn0)
        g = jax.jit(jax.grad(
            lambda x: jnp.sum(fn0(x).astype(jnp.float32) ** 2)))
        out = np.asarray(f(flat), np.float32)
        if ref is None:
            ref = out
        else:
            res[f"{name}_err"] = round(float(np.abs(out - ref).max()), 4)
        for tag, fn in ((f"fwd_{name}", lambda: f(flat)),
                        (f"bwd_{name}", lambda: g(flat))):
            o = fn()
            jax.block_until_ready(o)
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                o = fn()
                jax.block_until_ready(o)
                ts.append(time.perf_counter() - t0)
            res[f"{tag}_ms"] = round(min(ts) * 1e3, 2)
            print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
