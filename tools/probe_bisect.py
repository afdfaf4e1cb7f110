"""Bisect which epoch-program ingredient flips the warp gathers onto the slow
emitter (PERF.md open item).  Tiny model (fast compiles), full-size patch.

Variants, cumulative toward the real epoch program:
  warp        : one forward warp (8 corner gathers), C=1
  branch      : extract_batch + 2x branch_aug + concat + tiny model
                + unwarp + consistency loss (the fwd path), no grad
  grad        : jax.grad of `branch`
  scan        : lax.scan of `grad` over 2 keys (grad accumulation)
  epoch       : the real fns.epoch_train (adds masked AdamW)

Run: python tools/probe_bisect.py [names...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dg_tta_tpu.core.fields import get_rand_affine
from dg_tta_tpu.core.grid import affine_grid, grid_sample_flat
from dg_tta_tpu.core.losses import consistency_loss_flat
from dg_tta_tpu.core.patches import bucket_shape_for, extract_batch, pad_to_bucket
from dg_tta_tpu.models.network import Model
from dg_tta_tpu.models.plans import ArchSpec
from dg_tta_tpu.tta.engine import make_tta_functions
from dg_tta_tpu.tta.plan import TTAPlan

PATCH = (112, 112, 128)
N = int(np.prod(PATCH))
VOL = (224, 224, 240)


def tiny_model():
    spec = ArchSpec(
        features_per_stage=(8, 16),
        kernel_sizes=((3, 3, 3), (3, 3, 3)),
        strides=((1, 1, 1), (2, 2, 2)),
        n_conv_per_stage_encoder=(1, 1),
        n_conv_per_stage_decoder=(1,),
        num_input_channels=1,
        num_classes=105,
    )
    return Model(spec=spec, patch_size=PATCH,
                 trainer_name="nnUNetTrainer_GIN",
                 uses_gin_internal=True, uses_mind=False,
                 compute_dtype="bfloat16")


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:10s}: {min(ts)*1e3:9.2f} ms", flush=True)


def main(names):
    model = tiny_model()
    params = model.init_params(jax.random.PRNGKey(0))
    idx = np.arange(10, dtype=np.int32)
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(*VOL, 1)).astype(np.float32)
    bucket = bucket_shape_for(VOL)
    padded = pad_to_bucket(jnp.asarray(vol), bucket, pad_value=-1.0)[None]
    shapes = jnp.asarray([[float(s) for s in VOL]])
    key = jax.random.PRNGKey(1)
    map_pre = jnp.asarray(idx)

    if "warp" in names:
        @jax.jit
        def warp(flat, theta):
            grid = affine_grid(theta, PATCH, align_corners=False)
            return grid_sample_flat(flat, PATCH, grid,
                                    padding_mode="border",
                                    align_corners=False)
        flat = jnp.asarray(rng.normal(size=(1, 1, N)), jnp.float32)
        theta, _ = get_rand_affine(jax.random.PRNGKey(0), 1)
        timeit("warp", warp, flat, theta)

    def branch_fwd(params, key, vols, shapes):
        k_patch, ka, kb, k_model = jax.random.split(key, 4)
        imgs, _ = extract_batch(k_patch, vols, shapes, PATCH, 1)

        def aug(k, x):
            theta, theta_inv = get_rand_affine(k, 1)
            grid = affine_grid(theta, PATCH, align_corners=False)
            grid_inv = affine_grid(theta_inv, PATCH, align_corners=False)
            xf = jnp.moveaxis(x, -1, 1).reshape(1, 1, -1)
            xf = grid_sample_flat(xf, PATCH, grid, padding_mode="border",
                                  align_corners=False)
            x = jnp.moveaxis(xf.reshape(1, 1, *PATCH), 1, -1)
            return x, grid_inv

        xa, ga = aug(ka, imgs)
        xb, gb = aug(kb, imgs)
        x = jnp.concatenate([xa, xb], axis=0)
        logits = model.apply(params, x, key=k_model, head_channel_idx=map_pre)
        lf = jnp.moveaxis(logits, -1, 1).reshape(2, 10, -1)
        la = grid_sample_flat(lf[:1], PATCH, ga, padding_mode="zeros",
                              align_corners=False)
        lb = grid_sample_flat(lf[1:], PATCH, gb, padding_mode="zeros",
                              align_corners=False)
        return consistency_loss_flat(la, lb, start_class=1)

    if "branch" in names:
        timeit("branch", jax.jit(branch_fwd), params, key, padded, shapes)

    def aug1(k, x):
        theta, theta_inv = get_rand_affine(k, 1)
        grid = affine_grid(theta, PATCH, align_corners=False)
        grid_inv = affine_grid(theta_inv, PATCH, align_corners=False)
        xf = jnp.moveaxis(x, -1, 1).reshape(1, 1, -1)
        xf = grid_sample_flat(xf, PATCH, grid, padding_mode="border",
                              align_corners=False)
        return jnp.moveaxis(xf.reshape(1, 1, *PATCH), 1, -1), grid_inv

    patch_fixed = jnp.asarray(rng.normal(size=(1, *PATCH, 1)), jnp.float32)

    if "b_fix" in names:
        # no extract_batch: fixed patch operand
        def b_fix(params, key, imgs):
            ka, kb, k_model = jax.random.split(key, 3)
            xa, ga = aug1(ka, imgs)
            xb, gb = aug1(kb, imgs)
            x = jnp.concatenate([xa, xb], axis=0)
            logits = model.apply(params, x, key=k_model,
                                 head_channel_idx=map_pre)
            lf = jnp.moveaxis(logits, -1, 1).reshape(2, 10, -1)
            la = grid_sample_flat(lf[:1], PATCH, ga, padding_mode="zeros",
                                  align_corners=False)
            lb = grid_sample_flat(lf[1:], PATCH, gb, padding_mode="zeros",
                                  align_corners=False)
            return consistency_loss_flat(la, lb, start_class=1)
        timeit("b_fix", jax.jit(b_fix), params, key, patch_fixed)

    if "b_nomodel" in names:
        # no model: fake 10-channel logits from the augmented input
        def b_nomodel(key, imgs):
            ka, kb = jax.random.split(key)
            xa, ga = aug1(ka, imgs)
            xb, gb = aug1(kb, imgs)
            la = jnp.moveaxis(jnp.repeat(xa, 10, -1), -1, 1).reshape(1, 10, -1)
            lb = jnp.moveaxis(jnp.repeat(xb, 10, -1), -1, 1).reshape(1, 10, -1)
            la = grid_sample_flat(la, PATCH, ga, padding_mode="zeros",
                                  align_corners=False)
            lb = grid_sample_flat(lb, PATCH, gb, padding_mode="zeros",
                                  align_corners=False)
            return consistency_loss_flat(la, lb, start_class=1)
        timeit("b_nomodel", jax.jit(b_nomodel), key, patch_fixed)

    if "b_extract" in names:
        # extract_batch + ONE warp only
        def b_extract(key, vols, shapes):
            k_patch, ka = jax.random.split(key)
            imgs, _ = extract_batch(k_patch, vols, shapes, PATCH, 1)
            xa, _ = aug1(ka, imgs)
            return jnp.sum(xa)
        timeit("b_extract", jax.jit(b_extract), key, padded, shapes)

    if "b_model" in names:
        # model only on a fixed patch (no warps at all)
        def b_model(params, key, imgs):
            logits = model.apply(params, imgs, key=key,
                                 head_channel_idx=map_pre)
            return jnp.sum(logits)
        timeit("b_model", jax.jit(b_model), params, key, patch_fixed)

    if "grad" in names:
        timeit("grad", jax.jit(jax.grad(branch_fwd)), params, key, padded,
               shapes)

    if "scan" in names:
        @jax.jit
        def scan2(params, key, vols, shapes):
            def body(acc, k):
                loss, g = jax.value_and_grad(branch_fwd)(params, k, vols,
                                                         shapes)
                return jax.tree.map(jnp.add, acc,
                                    g), loss
            zeros = jax.tree.map(jnp.zeros_like, params)
            g, losses = jax.lax.scan(body, zeros, jax.random.split(key, 2))
            return losses
        timeit("scan", scan2, params, key, padded, shapes)

    if "epoch" in names:
        plan = TTAPlan(patches_to_be_accumulated=2)
        fns = make_tta_functions(model, plan, idx, idx, patch_group=1)
        opt = fns.init_opt_state(params)
        # epoch_train donates (params, opt) — feed outputs back instead of
        # reusing donated buffers
        p, o, loss = fns.epoch_train(params, opt, key, padded, shapes)
        jax.block_until_ready(loss)
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            p, o, loss = fns.epoch_train(p, o, jax.random.fold_in(key, i),
                                         padded, shapes)
            jax.block_until_ready(loss)
            ts.append(time.perf_counter() - t0)
        print(f"{'epoch':10s}: {min(ts)*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    main(sys.argv[1:] or ["warp", "branch", "grad", "scan", "epoch"])
