"""Approximation-budget check: shipped-default engine vs exact engine.

The shipped TTA defaults on TPU are approximate in three places (PARITY.md
§7): the 3-pass MXU shear resampler for affine warps (O(h^2) kernel
deviation, ops/warp_shear.py), the analytic |det|-scaled warp adjoint, and
bf16 compute.  The exact engine (DGTTA_AFFINE_SHEAR=0 + exact_warp_grad +
f32 + the z-tap U-Net) is the direct transcription of the reference math
(/root/reference/dg_tta/tta/tta.py:549-575 warps).

This tool adapts the SAME volume with both engines from the SAME initial
parameters and reports the Dice between the two final argmax segmentations
— the missing half of the "equal Dice" target (VERDICT r3 item 2).  The CI
test (tests/test_approx_budget.py) runs it at a mid-size config (64^3
patch, 21 classes) with a reduced budget and asserts the stated bound;
this tool's __main__ runs it at any scale on the chip.

Usage: python tools/approx_budget.py [--patch 64] [--classes 21]
           [--epochs 6] [--acc 8] [--ensemble 1] [--vol 96]
"""

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _phantom(vol_shape, n_classes, seed=0):
    """Structured multi-class phantom WITH ground truth: intensity-coded
    boxes whose class identity is known by construction, so the engines'
    accuracy (Dice vs GT) is measurable — not just their agreement
    (r4 verdict item 3)."""
    rng = np.random.default_rng(seed)
    vol = rng.normal(0.0, 0.25, size=vol_shape).astype(np.float32)
    gt = np.zeros(vol_shape, np.int32)
    D, H, W = vol_shape
    k = 0
    for z in range(2):
        for y in range(2):
            for x in range(2):
                c = (k % (n_classes - 1)) + 1
                sl = (slice(z * D // 2 + D // 8, z * D // 2 + 3 * D // 8),
                      slice(y * H // 2 + H // 8, y * H // 2 + 3 * H // 8),
                      slice(x * W // 2 + W // 8, x * W // 2 + 3 * W // 8))
                vol[sl] += 0.8 + 0.35 * c
                gt[sl] = c
                k += 1
    return vol, gt


def _pretrain_briefly(model, params, vol, gt, steps=40, lr=1e-2, seed=3):
    """A few supervised CE steps on random phantom crops, so the engines
    start from CONFIDENT logits (the realistic TTA regime) instead of the
    near-tie random-init worst case.  Returns (params, final_loss).

    Calibration (r5, 1-core CPU, CI arch (8,16) patch 64 / vol 80): the
    original 25-40 steps at lr 3e-3 left the model at CE ~1-2 and GT Dice
    0.04-0.26 — NOT the confident regime the docstring claimed (and the
    r5-committed >=0.5 asserts failed).  200 steps at lr 1e-2 reach
    CE 0.12 / crop Dice 0.66; tests use those."""
    import jax
    import jax.numpy as jnp
    import optax

    patch = model.patch_size
    rng = np.random.default_rng(seed)
    tx = optax.adam(lr)
    opt = tx.init(params)
    n_classes = model.spec.num_classes

    @jax.jit
    def step_fn(p, o, img, lab):
        def loss_fn(p):
            logp = jax.nn.log_softmax(
                model.apply(p, img).astype(jnp.float32), -1)
            onehot = jax.nn.one_hot(lab, n_classes)
            return -jnp.mean(jnp.sum(onehot * logp, -1))
        l, g = jax.value_and_grad(loss_fn)(p)
        upd, o = tx.update(g, o, p)
        return optax.apply_updates(p, upd), o, l

    loss = float("nan")
    for _ in range(steps):
        org = [int(rng.integers(0, s - ps + 1))
               for s, ps in zip(vol.shape, patch)]
        sl = tuple(slice(o, o + ps) for o, ps in zip(org, patch))
        img = jnp.asarray(vol[sl][None, ..., None])
        lab = jnp.asarray(gt[sl][None].astype(np.int32))
        params, opt, l = step_fn(params, opt, img, lab)
        loss = float(l)
    return params, loss


def _run_engine(model, plan, params, vol, vol_shape, idx, exact: bool,
                seed: int = 7):
    """One full adaptation + sliding-window inference -> argmax seg."""
    import jax
    import jax.numpy as jnp
    from dg_tta_tpu.core.patches import bucket_shape_for, pad_to_bucket
    from dg_tta_tpu.infer.sliding_window import predict_volume
    from dg_tta_tpu.tta.engine import tta_one_volume

    volj = jnp.asarray(vol[..., None])
    bucket = bucket_shape_for(vol_shape)
    padded = pad_to_bucket(volj, bucket, pad_value=float(volj.min()))[None]
    shapes = jnp.asarray([[float(s) for s in vol_shape]])
    adapted, losses, _ = tta_one_volume(
        model, plan, params, padded, shapes, idx, idx,
        jax.random.PRNGKey(seed), ensemble_chunk=1,
        exact_warp_grad=exact)
    stacked = jax.tree.map(jnp.asarray, adapted)
    logits = predict_volume(model, stacked, volj,
                            key=jax.random.PRNGKey(seed + 1))
    seg = np.asarray(jnp.argmax(logits, axis=-1))
    return seg, [float(np.mean(e)) for e in np.asarray(losses)]


def _dice_between(a, b, n_classes):
    """Per-foreground-class Dice between two argmax maps; nan where a class
    is absent from both."""
    out = {}
    for c in range(1, n_classes):
        pa, pb = (a == c), (b == c)
        denom = pa.sum() + pb.sum()
        out[c] = (float(2.0 * (pa & pb).sum() / denom) if denom
                  else float("nan"))
    vals = [v for v in out.values() if np.isfinite(v)]
    return (float(np.mean(vals)) if vals else float("nan")), out


def compare_engines(patch=64, n_classes=21, epochs=6, acc=8, ensemble=1,
                    vol_size=96, features=(8, 16, 32), seed=0,
                    pretrain_steps=0, relative=False, verbose=True):
    """Returns (mean_fg_dice_between_runs, detail dict).

    With pretrain_steps > 0, the shared initial parameters are first
    briefly fit to the phantom's GT, and the detail dict additionally
    carries each engine's accuracy vs GT and the shipped-vs-exact
    ACCURACY DELTA |Dice_shipped(GT) - Dice_exact(GT)| — the bound the
    "equal Dice" target actually names (r4 verdict item 3)."""
    import jax
    from dg_tta_tpu.models.network import Model
    from dg_tta_tpu.models.plans import ArchSpec
    from dg_tta_tpu.tta.plan import TTAPlan

    n_st = len(features)
    spec = ArchSpec(
        features_per_stage=tuple(features),
        kernel_sizes=((3, 3, 3),) * n_st,
        strides=((1, 1, 1),) + ((2, 2, 2),) * (n_st - 1),
        n_conv_per_stage_encoder=(1,) * n_st,
        n_conv_per_stage_decoder=(1,) * (n_st - 1),
        num_input_channels=1,
        num_classes=n_classes,
    )
    vol_shape = (vol_size, vol_size, vol_size)
    vol, gt = _phantom(vol_shape, n_classes, seed)
    plan = TTAPlan(epochs=epochs, patches_to_be_accumulated=acc,
                   ensemble_count=ensemble, lr=1e-4)
    idx = np.arange(n_classes, dtype=np.int32)

    def build(dtype):
        return Model(spec=spec, patch_size=(patch, patch, patch),
                     trainer_name="nnUNetTrainer_GIN",
                     uses_gin_internal=True, uses_mind=False,
                     compute_dtype=dtype)

    params0 = build("float32").init_params(jax.random.PRNGKey(1))
    if pretrain_steps:
        params0, pre_loss = _pretrain_briefly(
            build("float32"), params0, vol, gt, steps=pretrain_steps)
        if verbose:
            print(f"pretrained {pretrain_steps} steps, CE {pre_loss:.4f}",
                  flush=True)

    results = {}
    shipped_envs = {"DGTTA_AFFINE_SHEAR": "1", "DGTTA_UNET_ZPACK": "1"}
    if relative:
        # relative-frame consistency loss (engine.py DGTTA_REL_FRAME):
        # bound THIS approximation stack before any default flip
        shipped_envs["DGTTA_REL_FRAME"] = "1"
    for name, envs, dtype, exact in (
        ("shipped", shipped_envs, "bfloat16", False),
        ("exact", {"DGTTA_AFFINE_SHEAR": "0", "DGTTA_UNET_ZPACK": "0",
                   "DGTTA_REL_FRAME": "0"},
         "float32", True),
    ):
        old = {k: os.environ.get(k) for k in envs}
        os.environ.update(envs)
        try:
            model = build(dtype)
            seg, traj = _run_engine(model, plan, params0, vol, vol_shape,
                                    idx, exact)
            results[name] = {"seg": seg, "loss_trajectory": traj}
            if verbose:
                print(f"{name}: final loss {traj[-1]:.5f}, "
                      f"fg voxels {(seg > 0).sum()}", flush=True)
        finally:
            for k, v in old.items():
                (os.environ.pop(k, None) if v is None
                 else os.environ.__setitem__(k, v))

    mean_dice, per_class = _dice_between(results["shipped"]["seg"],
                                         results["exact"]["seg"], n_classes)
    detail = {
        "mean_fg_dice_between_engines": mean_dice,
        "per_class": per_class,
        "shipped_final_loss": results["shipped"]["loss_trajectory"][-1],
        "exact_final_loss": results["exact"]["loss_trajectory"][-1],
        "config": {"patch": patch, "classes": n_classes, "epochs": epochs,
                   "acc": acc, "ensemble": ensemble, "vol": vol_size,
                   "pretrain_steps": pretrain_steps, "relative": relative},
    }
    # Accuracy vs the phantom's ground truth (classes present in GT).
    gt_classes = sorted(int(c) for c in np.unique(gt) if c > 0)
    acc_detail = {}
    for name in ("shipped", "exact"):
        _, pc = _dice_between(results[name]["seg"], gt, n_classes)
        acc_detail[name] = {c: pc[c] for c in gt_classes}
        acc_detail[f"{name}_mean"] = float(np.mean(
            [pc[c] for c in gt_classes]))
    deltas = {c: abs(acc_detail["shipped"][c] - acc_detail["exact"][c])
              for c in gt_classes}
    detail["dice_vs_gt"] = acc_detail
    detail["accuracy_delta_mean"] = abs(acc_detail["shipped_mean"]
                                        - acc_detail["exact_mean"])
    detail["accuracy_delta_per_class_max"] = max(deltas.values())
    return mean_dice, detail


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--patch", type=int, default=64)
    ap.add_argument("--classes", type=int, default=21)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--acc", type=int, default=8)
    ap.add_argument("--ensemble", type=int, default=1)
    ap.add_argument("--vol", type=int, default=96)
    ap.add_argument("--bound", type=float, default=0.99)
    ap.add_argument("--pretrain-steps", type=int, default=0)
    ap.add_argument("--relative", action="store_true",
                    help="shipped engine += relative-frame consistency")
    args = ap.parse_args(argv)
    dice, detail = compare_engines(args.patch, args.classes, args.epochs,
                                   args.acc, args.ensemble, args.vol,
                                   pretrain_steps=args.pretrain_steps,
                                   relative=args.relative)
    print(json.dumps(detail, default=float))
    print(f"mean fg Dice shipped-vs-exact = {dice:.4f} "
          f"(bound {args.bound})")
    return 0 if dice >= args.bound else 1


if __name__ == "__main__":
    sys.exit(main())
