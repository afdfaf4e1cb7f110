"""On-chip DG-pretraining benchmark (r4 verdict item 4).

Times the fused pretrain step (`train/pretrain.make_train_step`: on-device
DA -> GIN/MIND -> U-Net deep-sup fwd+bwd -> SGD) at the TS104 spec —
patch 112x112x128, batch 2 (nnUNet 3d_fullres plans), flagship
PlainConvUNet — over a fixed iteration window, and reports s/iter, the
DA stack's share (a second jitted program with augment_batch replaced by
identity), and the projected epoch / 1000-epoch wall-clock at the
reference's 250 it/epoch budget (SURVEY §3.1; reference hot loop reached
via /root/reference/dg_tta/run.py:64-69 -> nnUNet trainer).

Env: PROBE_ITERS (25), PROBE_TRAINER (nnUNetTrainer_GIN), PROBE_BATCH (2),
PROBE_BF16 (1).  Run under `timeout` in a subprocess (big compile).
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS_PER_EPOCH = 250
EPOCHS = 1000


def main():
    import jax
    import jax.numpy as jnp
    from bench import flagship
    from dg_tta_tpu.train.augment import DAConfig, augment_batch
    from dg_tta_tpu.train.pretrain import make_train_step

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    os.environ.setdefault("BENCH_TRAINER",
                          os.environ.get("PROBE_TRAINER",
                                         "nnUNetTrainer_GIN"))
    model, _ = flagship()
    if os.environ.get("PROBE_BF16", "1") == "1":
        model = dataclasses.replace(model, compute_dtype="bfloat16")
    B = int(os.environ.get("PROBE_BATCH", 2))
    iters = int(os.environ.get("PROBE_ITERS", 25))
    patch = model.patch_size

    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(B, *patch, 1)).astype(np.float32))
    segs = jnp.asarray(rng.integers(
        0, model.spec.num_classes, (B, *patch, 1)).astype(np.float32))
    lr = jnp.float32(1e-2)

    def window(step_fn, tx, tag):
        p = jax.tree.map(jnp.copy, params)
        o = tx.init(p)
        # warm-up step pays the compile
        p, o, loss = step_fn(p, o, jax.random.PRNGKey(1), imgs, segs, lr)
        float(loss)
        t0 = time.perf_counter()
        for i in range(iters):
            p, o, loss = step_fn(p, o, jax.random.fold_in(
                jax.random.PRNGKey(2), i), imgs, segs, lr)
        final = float(loss)   # fences the chain
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({tag: {"s_per_iter": round(dt, 4),
                                "final_loss": round(final, 4)}}), flush=True)
        return dt

    tx, step = make_train_step(model, DAConfig())
    t_full = window(step, tx, "full(DA+GIN+unet)")

    # DA share: identical step with augment_batch bypassed
    import dg_tta_tpu.train.pretrain as pt
    orig = pt.augment_batch
    try:
        pt.augment_batch = lambda k, a, b, cfg: (a, b)
        tx2, step2 = make_train_step(model, DAConfig())
        t_noda = window(step2, tx2, "no_DA")
    finally:
        pt.augment_batch = orig

    out = {
        "trainer": os.environ["BENCH_TRAINER"],
        "patch": list(patch), "batch": B, "iters": iters,
        "s_per_iter": round(t_full, 4),
        "da_share_s": round(t_full - t_noda, 4),
        "da_share_pct": round(100 * (t_full - t_noda) / t_full, 1),
        "epoch_s(250it)": round(t_full * ITERS_PER_EPOCH, 1),
        "projected_1000ep_h": round(
            t_full * ITERS_PER_EPOCH * EPOCHS / 3600, 2),
    }
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
