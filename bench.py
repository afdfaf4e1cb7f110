"""Headline benchmark: TTA seconds per volume at the reference's default
budget (12 epochs x 16 accumulated patches x 2 branches x 3 ensembles,
112x112x128 patches — /root/reference/dg_tta/tta/config_log_utils.py:24-41)
on the TS104 flagship PlainConvUNet.

Prints ONE JSON line:
  {"metric": "tta_sec_per_volume", "value": N, "unit": "s",
   "vs_baseline": <baseline_target / N>, "extra": {...}}
vs_baseline compares against the driver-set north-star of 10 s/volume
(BASELINE.md; the reference repo publishes no timings). >1.0 beats it.

"extra" couples the timing to the math (r2 verdict: a perf number from
broken math must not "pass") and records the second BASELINE metric:
  final_loss           mean final-epoch TTA consistency loss (deterministic
                       for the fixed seeds — any math regression moves it)
  member_consistency   pseudo-Dice between member-0 and member-1 argmax
                       segmentations of the phantom after adaptation
  infer_vol_per_min    sliding-window inference throughput on the phantom
                       (BASELINE.json metric line: "inference volumes/min")

Env knobs: BENCH_SMALL=1 (tiny model, smoke), BENCH_ENSEMBLE_CHUNK,
BENCH_REMAT=0/1, BENCH_EPOCHS, BENCH_SPLIT, BENCH_PATCH_GROUP;
BENCH_INFER=0 skips the inference/consistency section.
"""

import json
import os
import time

import numpy as np

BASELINE_TARGET_S = 10.0


def flagship():
    import jax
    from dg_tta_tpu.models.network import build_model, Model
    from dg_tta_tpu.models.plans import ArchSpec

    if os.environ.get("BENCH_SMALL"):
        # BENCH_SMALL honors BENCH_TRAINER too, so the exact bench code path
        # for a flagship variant (e.g. GIN_MIND's 12-channel MIND input) can
        # be smoke-tested on CPU before burning a 6-12 min on-chip compile.
        trainer = os.environ.get("BENCH_TRAINER", "nnUNetTrainer_GIN")
        mind = "MIND" in trainer
        spec = ArchSpec(
            features_per_stage=(8, 16),
            kernel_sizes=((3, 3, 3), (3, 3, 3)),
            strides=((1, 1, 1), (2, 2, 2)),
            n_conv_per_stage_encoder=(1, 1),
            n_conv_per_stage_decoder=(1,),
            num_input_channels=12 if mind else 1,
            num_classes=4,
        )
        return Model(spec=spec, patch_size=(16, 16, 16),
                     trainer_name=trainer,
                     uses_gin_internal="GIN" in trainer,
                     uses_mind=mind), (48, 48, 48)
    # BENCH_TRAINER selects the flagship variant; GIN_MIND is the config the
    # paper's headline results use (r2 verdict item 7)
    trainer = os.environ.get("BENCH_TRAINER", "nnUNetTrainer_GIN")
    base = ("/root/reference/dg_tta/__resources__/dummy_results/"
            f"{trainer}__nnUNetPlans__3d_fullres")
    plans = json.load(open(f"{base}/plans.json"))
    dsj = json.load(open(f"{base}/dataset.json"))
    # benchmark volume ~= the TS104 median shape (231,228,242) at 1.5mm
    return build_model(plans, dsj, trainer), (224, 224, 240)


GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "tests", "golden", "bench_small.json")


def _golden_knobs():
    return {
        "trainer": os.environ.get("BENCH_TRAINER", "nnUNetTrainer_GIN"),
        "epochs": int(os.environ.get("BENCH_EPOCHS", 12)),
        "bf16": os.environ.get("BENCH_BF16", "1"),
        "split": os.environ.get("BENCH_SPLIT", "0"),
        "patch_group": int(os.environ.get("BENCH_PATCH_GROUP", 1)),
    }


def _check_golden(losses, adapted):
    """BENCH_SMALL oracle coupling (VERDICT r3 item 8): the small-scale
    adaptation trajectory is frozen per backend in tests/golden/; a math
    regression moves the per-epoch losses or the adapted-parameter digest
    and flags here WITHOUT depending on member self-consistency.
    BENCH_GOLDEN=record refreshes the golden file."""
    import jax

    traj = [round(float(np.mean(e)), 6) for e in np.asarray(losses)]
    leaves = jax.tree.leaves(adapted)
    lead = np.asarray(leaves[0], np.float32)
    digest = {"loss_trajectory": traj,
              "param_mean": round(float(lead.mean()), 6),
              "param_absmean": round(float(np.abs(lead).mean()), 6)}
    backend = jax.default_backend()
    try:
        with open(GOLDEN_PATH) as f:
            golden = json.load(f)
    except FileNotFoundError:
        golden = {}
    if os.environ.get("BENCH_GOLDEN") == "record":
        golden[backend] = {"knobs": _golden_knobs(), "digest": digest}
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(golden, f, indent=2)
        return {"golden": "recorded"}
    entry = golden.get(backend)
    if entry is None:
        return {"golden": f"no golden for backend {backend}"}
    if entry["knobs"] != _golden_knobs():
        return {"golden": "knobs differ from recorded golden — skipped"}
    ref = entry["digest"]
    ok = (np.allclose(ref["loss_trajectory"], digest["loss_trajectory"],
                      atol=5e-4)
          and np.isclose(ref["param_mean"], digest["param_mean"],
                         rtol=1e-3, atol=1e-6)
          and np.isclose(ref["param_absmean"], digest["param_absmean"],
                         rtol=1e-3))
    if ok:
        return {"golden": "ok"}
    return {"golden": "MISMATCH", "golden_expected": ref,
            "golden_got": digest}


def _pallas_preflight(timeout_s: int = 1500) -> bool:
    """Compile+run a small Pallas warp in a SUBPROCESS with a hard timeout.

    The remote Mosaic compile helper on this stack has been observed to
    wedge (PERF.md round 3); a hung compile inside the bench would hang the
    whole recorded run.  A subprocess pre-flight contains that risk: on
    timeout/failure the bench falls back to the XLA warp path
    (DGTTA_PALLAS_WARP=0), which is the measured r2 configuration.
    """
    import subprocess
    import sys

    code = (
        "import jax, jax.numpy as jnp, numpy as np\n"
        "from dg_tta_tpu.core.fields import get_rand_affine\n"
        "from dg_tta_tpu.core.grid import affine_grid, grid_sample_flat\n"
        "from dg_tta_tpu.ops.experimental.warp_pallas_staged import grid_sample_flat_pallas\n"
        "D,H,W=8,16,128; N=D*H*W\n"
        "flat = jax.random.normal(jax.random.PRNGKey(1),(1,2,N),jnp.float32)\n"
        "th,_ = get_rand_affine(jax.random.PRNGKey(2),1)\n"
        "g = affine_grid(th,(D,H,W),align_corners=False)\n"
        "got = np.asarray(grid_sample_flat_pallas(flat, g, (D,H,W)))\n"
        "ref = np.asarray(grid_sample_flat(flat,(D,H,W),g))\n"
        "assert np.allclose(got, ref, atol=2e-5), np.abs(got-ref).max()\n"
        "print('PALLAS_PREFLIGHT_OK')\n"
    )
    try:
        res = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        return False
    return "PALLAS_PREFLIGHT_OK" in (res.stdout or "")


def main():
    import jax

    # the axon TPU plugin overrides the JAX_PLATFORMS env var (CLAUDE.md);
    # BENCH_BACKEND=cpu forces the CPU backend programmatically so the
    # BENCH_SMALL golden-oracle CI check never touches the chip
    if os.environ.get("BENCH_BACKEND"):
        jax.config.update("jax_platforms", os.environ["BENCH_BACKEND"])
    import jax.numpy as jnp

    # Default warp routing never touches Mosaic: affine branches take the
    # MXU shear resampler (ops/warp_shear.py, DGTTA_AFFINE_SHEAR=auto) and
    # grid warps take the XLA gather path (DGTTA_WARP_IMPL=auto).  The
    # Pallas kernel is explicit opt-in via DGTTA_WARP_IMPL=pallas, and only
    # then is the wedge-containment subprocess pre-flight worth its cost.
    if (os.environ.get("DGTTA_WARP_IMPL") == "pallas"
            and os.environ.get("DGTTA_PALLAS_WARP") is None
            and not os.environ.get("BENCH_SMALL")):
        if not _pallas_preflight():
            os.environ["DGTTA_PALLAS_WARP"] = "0"
            print("# pallas warp preflight failed -> XLA warp fallback",
                  flush=True)

    if os.environ.get("BENCH_COMPILE_CACHE", "1") == "1":
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".cache", "jax")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from dg_tta_tpu.core.patches import bucket_shape_for, pad_to_bucket
    from dg_tta_tpu.tta.engine import tta_one_volume
    from dg_tta_tpu.tta.plan import TTAPlan

    import dataclasses

    model, vol_shape = flagship()
    epochs = int(os.environ.get("BENCH_EPOCHS", 12))
    chunk = int(os.environ.get("BENCH_ENSEMBLE_CHUNK", 1))
    remat = os.environ.get("BENCH_REMAT", "0") == "1"
    if os.environ.get("BENCH_BF16", "1") == "1":
        model = dataclasses.replace(model, compute_dtype="bfloat16")
    plan = TTAPlan(epochs=epochs)

    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(*vol_shape, 1)).astype(np.float32)
    vol[tuple(slice(s // 4, s // 2) for s in vol_shape)] += 2.0
    volj = jnp.asarray(vol)
    bucket = bucket_shape_for(vol_shape)
    padded = pad_to_bucket(volj, bucket, pad_value=float(volj.min()))[None]
    shapes = jnp.asarray([[float(s) for s in vol_shape]])
    idx = np.arange(min(10, model.spec.num_classes), dtype=np.int32)

    import sys
    verbose = os.environ.get("BENCH_VERBOSE")
    log = (lambda e, l, d: print(f"  epoch {e} loss={np.mean(l):.4f}",
                                 file=sys.stderr)) if verbose else None
    # group=1 measured faster than group=2 on v5e (PERF.md: the B=4 program
    # runs ~2x slower per step than 2x the B=2 step)
    group = int(os.environ.get("BENCH_PATCH_GROUP", 1))
    # BENCH_SPLIT=1 uses the split-dispatch engine (engine_split.py);
    # default is the fused epoch program
    split = os.environ.get("BENCH_SPLIT", "0") == "1"
    run = lambda key: tta_one_volume(
        model, plan, params, padded, shapes, idx, idx, key,
        ensemble_chunk=chunk, remat=remat, log_fn=log, patch_group=group,
        split=split)

    # warm-up volume: pays all compilations.  The fence is a HOST TRANSFER
    # of a param leaf: block_until_ready on donated outputs can return
    # before the compute finishes on this stack (PERF.md).
    out = run(jax.random.PRNGKey(1))
    np.asarray(jax.tree.leaves(out[0])[0])
    del out  # member params live on device now — free before the real run

    # measured volume: steady-state sec/volume
    t0 = time.perf_counter()
    adapted, losses, _ = run(jax.random.PRNGKey(2))
    np.asarray(jax.tree.leaves(adapted)[0])
    dt = time.perf_counter() - t0

    extra = {"final_loss": round(float(np.mean(losses[-1])), 6)}
    from dg_tta_tpu.models.network import _use_zpack_unet
    extra["unet"] = "zpack" if _use_zpack_unet() else "ztap"
    if (not os.environ.get("BENCH_SMALL")
            and os.environ.get("BENCH_TRAINER",
                               "nnUNetTrainer_GIN") == "nnUNetTrainer_GIN"):
        # Absolute MFU next to the timing (PERF.md r4b): 2.1756 TF per
        # fwd+bwd branch pass is the XLA-counted cost of the TS104 GIN
        # U-Net at the flagship patch (tools/mfu_accounting.py, AOT);
        # v5e bf16 peak 197 TF/s.  dt covers the whole adaptation
        # (ensemble x epochs x acc x 2 branch passes).
        passes = plan.ensemble_count * epochs * plan.patches_to_be_accumulated * 2
        extra["mfu_pct"] = round(100 * passes * 2.1756e12 / dt / 197e12, 2)
    if os.environ.get("BENCH_SMALL"):
        extra.update(_check_golden(losses, adapted))

    # member-consistency pseudo-dice + inference throughput on the phantom.
    # Never let this section lose the headline number: any failure here
    # (e.g. HBM pressure from the inference programs) is recorded in
    # "extra" instead of crashing before the JSON prints.
    if os.environ.get("BENCH_INFER", "1") == "1":
        try:
            from dg_tta_tpu.infer.sliding_window import predict_volume

            stacked = jax.tree.map(jnp.asarray, adapted)
            # warm-up pays the predictor compiles; the timed call is
            # steady-state throughput (the BASELINE.json metric).  Fence
            # with a scalar pull — never the full logits through the tunnel.
            float(jnp.max(predict_volume(model, stacked, volj,
                                         key=jax.random.PRNGKey(3))))
            t0 = time.perf_counter()
            logits = predict_volume(model, stacked, volj,
                                    key=jax.random.PRNGKey(3))
            seg = np.asarray(jnp.argmax(logits, axis=-1))
            del logits, seg
            dt_inf = time.perf_counter() - t0
            extra["infer_vol_per_min"] = round(60.0 / dt_inf, 2)
            # On-device throughput: same program, fenced by a scalar pull
            # instead of hauling the full argmax volume through the dev
            # tunnel — this is what a colocated user sees (r4 verdict #8).
            t0 = time.perf_counter()
            float(jnp.max(jnp.argmax(predict_volume(
                model, stacked, volj, key=jax.random.PRNGKey(3)),
                axis=-1)))
            extra["infer_vol_per_min_device"] = round(
                60.0 / (time.perf_counter() - t0), 2)
            # per-member segs for the consistency metric (members 0 and 1)
            m0 = jax.tree.map(lambda p: p[0:1], stacked)
            m1 = jax.tree.map(lambda p: p[1:2], stacked) if (
                jax.tree.leaves(stacked)[0].shape[0] > 1) else m0
            s0 = np.asarray(jnp.argmax(predict_volume(
                model, m0, volj, key=jax.random.PRNGKey(3)), axis=-1))
            s1 = np.asarray(jnp.argmax(predict_volume(
                model, m1, volj, key=jax.random.PRNGKey(3)), axis=-1))
            del m0, m1, stacked
            inter = float(((s0 == s1) & (s0 > 0)).sum())
            denom = float((s0 > 0).sum() + (s1 > 0).sum())
            extra["member_consistency"] = round(
                2.0 * inter / denom if denom else 1.0, 4)
        except Exception as e:  # pragma: no cover - device-dependent
            extra["infer_error"] = f"{type(e).__name__}: {e}"[:200]

    print(json.dumps({
        "metric": "tta_sec_per_volume",
        "value": round(dt, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_TARGET_S / dt, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
