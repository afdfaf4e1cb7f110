"""Prototype of the split-dispatch TTA step: every measured-fast piece runs
as its own XLA program, so the warp gathers never share a program with the
U-Net (PERF.md gather-cliff mechanism 2).

Programs per accumulation step:
  P1 jit(extract + branch aug warps)        -> xa, xb, inverse grids
  P2 jit(model fwd) via jax.vjp             -> logits (2B), vjp handle
  P3 jit(unwarp both + consistency + grad)  -> loss, d loss / d logits
  P4 vjp_fn(g_logits)                       -> param cotangent (model bwd)

Compares steady-state per-step time against the fused epoch_train step cost.
PROBE_FULL=1 uses the full TS104 model (default tiny).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dg_tta_tpu.core.fields import get_rand_affine
from dg_tta_tpu.core.grid import affine_grid, grid_sample_flat, identity_grid
from dg_tta_tpu.core.losses import consistency_loss_flat
from dg_tta_tpu.core.patches import bucket_shape_for, extract_batch, pad_to_bucket

PATCH = (112, 112, 128)
VOL = (224, 224, 240)
NCLS = 10


def build_model():
    import dataclasses
    if os.environ.get("PROBE_FULL"):
        from bench import flagship
        model, _ = flagship()
    else:
        from dg_tta_tpu.models.network import Model
        from dg_tta_tpu.models.plans import ArchSpec
        spec = ArchSpec(
            features_per_stage=(8, 16),
            kernel_sizes=((3, 3, 3), (3, 3, 3)),
            strides=((1, 1, 1), (2, 2, 2)),
            n_conv_per_stage_encoder=(1, 1),
            n_conv_per_stage_decoder=(1,),
            num_input_channels=1,
            num_classes=105,
        )
        model = Model(spec=spec, patch_size=PATCH,
                      trainer_name="nnUNetTrainer_GIN",
                      uses_gin_internal=True, uses_mind=False)
    return dataclasses.replace(model, compute_dtype="bfloat16")


def main():
    model = build_model()
    params = model.init_params(jax.random.PRNGKey(0))
    map_pre = jnp.asarray(np.arange(NCLS, dtype=np.int32))
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(*VOL, 1)).astype(np.float32)
    padded = pad_to_bucket(jnp.asarray(vol), bucket_shape_for(VOL),
                           pad_value=-1.0)[None]
    shapes = jnp.asarray([[float(s) for s in VOL]])
    key = jax.random.PRNGKey(1)
    N = int(np.prod(PATCH))

    # ---- P1: extract + both branch warps (gathers only) -----------------
    @jax.jit
    def p1(key, vols, shapes):
        k_patch, ka, kb = jax.random.split(key, 3)
        imgs, _ = extract_batch(k_patch, vols, shapes, PATCH, 1)
        outs = []
        ctxs = []
        for k in (ka, kb):
            theta, theta_inv = get_rand_affine(k, 1)
            grid = affine_grid(theta, PATCH, align_corners=False)
            grid_inv = affine_grid(theta_inv, PATCH, align_corners=False)
            xf = imgs.reshape(1, 1, -1)
            xf = grid_sample_flat(xf, PATCH, grid, padding_mode="border",
                                  align_corners=False)
            outs.append(xf.reshape(1, *PATCH, 1))
            R = theta[:, :, :3]
            adj = jnp.abs(jnp.einsum("bi,bi->b", R[:, :, 0],
                                     jnp.cross(R[:, :, 1], R[:, :, 2],
                                               axis=-1)))
            ctxs.append((grid, grid_inv, adj))
        x = jnp.concatenate(outs, axis=0)
        return x, ctxs

    # ---- P2: model fwd (vjp-able jit; key-free — the GIN trainer's apply
    # uses no randomness at TTA, and MIND noise would enter as a
    # precomputed array input instead) --------------------------------------
    @jax.jit
    def model_fwd(params, x):
        return model.apply(params, x, head_channel_idx=map_pre)

    # ---- P3: unwarp + loss + grad wrt logits ------------------------------
    @jax.jit
    def p3(logits, ga, ga_inv, adj_a, gb, gb_inv, adj_b):
        def loss_fn(lg):
            lf = jnp.moveaxis(lg, -1, 1).reshape(2, NCLS, -1)
            la = grid_sample_flat(lf[:1], PATCH, ga_inv,
                                  padding_mode="zeros", align_corners=False)
            lb = grid_sample_flat(lf[1:], PATCH, gb_inv,
                                  padding_mode="zeros", align_corners=False)
            return consistency_loss_flat(la, lb, start_class=1)
        return jax.value_and_grad(loss_fn)(logits)

    # ---- steady state ----------------------------------------------------
    def step(k):
        x, (ctx_a, ctx_b) = p1(k, padded, shapes)
        # vjp over ALL args (never close over device arrays: a closure
        # embeds them as constants -> recompile per step + slow dispatch)
        logits, vjp_fn = jax.vjp(model_fwd, params, x)
        loss, g_logits = p3(logits, *ctx_a, *ctx_b)
        g_params, _ = vjp_fn(g_logits)
        return loss, g_params

    loss, g = step(key)
    jax.block_until_ready(loss)
    jax.block_until_ready(jax.tree.leaves(g)[0])
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        loss, g = step(jax.random.fold_in(key, i))
        jax.block_until_ready(jax.tree.leaves(g)[0])
        ts.append(time.perf_counter() - t0)
    print(f"split step: {min(ts)*1e3:.2f} ms "
          f"(x16 acc -> {16*min(ts):.2f} s/epoch equivalent)", flush=True)


if __name__ == "__main__":
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    main()
