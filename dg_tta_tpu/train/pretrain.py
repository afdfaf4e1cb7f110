"""DG pretraining: the nnUNet training loop, TPU-native.

Replaces the external `nnunetv2` training entry the reference shells into
(`dgtta pretrain` -> run_training_entry, /root/reference/dg_tta/run.py:64-69)
plus the six DG trainer subclasses (pretraining/nnUNetTrainer_*.py): 250
iterations/epoch, SGD-momentum(0.99, nesterov) + poly LR decay, weight decay
3e-5, deep-supervised Dice+CE, on-device DA (train/augment.py) with GIN /
MIND input transforms fused into the jitted train step, mirroring disabled
(nnUNetTrainer_GIN.py:31-36).

Scaling: with several devices, the batch is sharded over the mesh's data
axis; params replicated; XLA inserts the gradient all-reduce.

Outputs land in the nnUNet results layout
(`nnUNet_results/{dataset}/{trainer}__nnUNetPlans__{config}/fold_{f}/
checkpoint_final.npz` + plans/dataset jsons) so `prepare_tta`/`run_tta`
consume them directly.
"""

import json
import shutil
import time
from functools import partial
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dg_tta_tpu.models.network import (
    MULTIRES_TRAINERS,
    TRAINER_REGISTRY,
    build_model,
)
from dg_tta_tpu.models.convert import flat_npz_to_params, params_to_flat_npz
from dg_tta_tpu.train.augment import DAConfig, MULTIRES_ZOOMS, augment_batch
from dg_tta_tpu.train.dataset import (
    PatchSampler,
    fingerprint_dataset,
    make_splits,
    plan_experiment,
    preprocess_dataset,
)
from dg_tta_tpu.train.losses import deep_supervised_loss, poly_lr
from dg_tta_tpu.utils.paths import (
    maybe_convert_to_dataset_name,
    nnunet_raw,
    nnunet_results,
)

ITERS_PER_EPOCH = 250
INITIAL_LR = 1e-2
WEIGHT_DECAY = 3e-5
MOMENTUM = 0.99


VAL_ITERS_PER_EPOCH = 50  # nnUNet num_val_iterations_per_epoch default


def make_val_step(model):
    """Per-class tp/fp/fn on un-augmented patches.

    nnUNet's validation protocol (mirrored here): a fixed number of val
    iterations per epoch accumulates per-foreground-class true/false
    positives/negatives over ALL val batches, then the epoch's pseudo-Dice
    is the GLOBAL 2tp/(2tp+fp+fn) per class (nan where a class never
    occurs), nanmean'd over foreground classes — not a per-batch Dice mean.
    Gather-free: per-class masks are == compares (PERF.md gather-cliff
    rule)."""

    n_cls = model.spec.num_classes

    @jax.jit
    def val_step(params, imgs, segs):
        logits = model.apply(params, imgs)
        pred = jnp.argmax(logits, axis=-1)
        gt = segs[..., 0].astype(jnp.int32)
        match = pred == gt

        def one(c):
            p = (pred == c)
            g = (gt == c)
            tp = jnp.sum(jnp.where(g & match, 1.0, 0.0))
            fp = jnp.sum(jnp.where(p, 1.0, 0.0)) - tp
            fn = jnp.sum(jnp.where(g, 1.0, 0.0)) - tp
            return tp, fp, fn

        return jax.vmap(one)(jnp.arange(1, n_cls))

    return val_step


def _global_pseudo_dice(tp, fp, fn):
    """nnUNet on_validation_epoch_end semantics: global per-class Dice from
    accumulated counts; classes absent from both pred and GT give nan and
    are excluded from the foreground mean."""
    denom = 2.0 * tp + fp + fn
    per_class = np.where(denom > 0, 2.0 * tp / np.maximum(denom, 1e-8),
                         np.nan)
    if np.all(np.isnan(per_class)):
        return 0.0, per_class
    return float(np.nanmean(per_class)), per_class


def make_train_step(model, da_cfg: DAConfig, batch_dice: bool = True):
    """One fused jitted step: DA -> GIN/MIND -> U-Net -> deep-sup loss ->
    SGD update.  lr is passed as data so poly decay never recompiles."""

    # torch-SGD semantics (nnUNet: momentum 0.99, nesterov, wd 3e-5): weight
    # decay added to the raw grad, then the momentum trace; the -lr scale is
    # applied in-step so poly decay is plain data (no recompilation).
    tx = optax.chain(
        optax.add_decayed_weights(WEIGHT_DECAY),
        optax.trace(decay=MOMENTUM, nesterov=True),
    )

    def loss_fn(params, key, imgs, segs):
        k_da, k_model = jax.random.split(key)
        imgs_aug, segs_aug = augment_batch(k_da, imgs, segs, da_cfg)
        outputs = model.apply(params, imgs_aug, key=k_model,
                              deep_supervision=True, internal_aug=True)
        target = segs_aug[..., 0].astype(jnp.int32)
        return deep_supervised_loss(outputs, target, batch_dice=batch_dice)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, key, imgs, segs, lr):
        loss, grads = jax.value_and_grad(loss_fn)(params, key, imgs, segs)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return tx, step


def _ensure_preprocessed(dataset_name: str, plans: Optional[dict],
                         preprocessed_dir: Path,
                         configuration: str = "3d_fullres",
                         plans_name: str = "nnUNetPlans"):
    raw_dir = nnunet_raw() / dataset_name
    with open(raw_dir / "dataset.json") as f:
        dataset_json = json.load(f)
    # custom plans identifiers (the reference's `-p` nnUNet passthrough,
    # run.py:64-69) live at {plans_name}.json; "nnUNetPlans" keeps the
    # historical plans.json filename so existing stores keep working
    plans_fname = ("plans.json" if plans_name == "nnUNetPlans"
                   else f"{plans_name}.json")
    plans_path = preprocessed_dir / plans_fname
    if plans is None:
        if plans_path.is_file():
            plans = json.load(open(plans_path))
        else:
            fp = fingerprint_dataset(raw_dir)
            plans = plan_experiment(dataset_json, fp, dataset_name)
            plans["plans_name"] = plans_name
            for c in plans.get("configurations", {}).values():
                if "data_identifier" in c:
                    c["data_identifier"] = (
                        f"{plans_name}_"
                        f"{c['data_identifier'].split('_', 1)[1]}")
            preprocessed_dir.mkdir(parents=True, exist_ok=True)
            with open(preprocessed_dir / "dataset_fingerprint.json", "w") as f:
                json.dump(fp, f, indent=2)
    preprocessed_dir.mkdir(parents=True, exist_ok=True)
    with open(plans_path, "w") as f:
        json.dump(plans, f, indent=2)

    if configuration not in plans.get("configurations", {}):
        raise KeyError(
            f"configuration {configuration!r} not in plans "
            f"(available: {sorted(plans.get('configurations', {}))})")
    # the preprocessed store is named by the configuration's data_identifier
    # (nnUNet semantics: plans['configurations'][cfg]['data_identifier'],
    # reference reachable via run.py:64-69 argv passthrough) — a hardcoded
    # nnUNetPlans_3d_fullres here would silently read wrong-resolution data
    # for any other configuration
    cfg = plans["configurations"][configuration]
    store = preprocessed_dir / cfg.get(
        "data_identifier", f"{plans.get('plans_name', plans_name)}"
                           f"_{configuration}")
    splits_path = preprocessed_dir / "splits_final.json"
    # A store is only complete if its completion marker lists exactly the
    # cases present — `any(*.npz)` alone would silently accept (and bake
    # into splits_final.json) a preprocessing run interrupted mid-dataset.
    marker = store / ".preprocess_complete.json"
    complete = False
    if marker.is_file():
        listed = json.load(open(marker)).get("cases", [])
        complete = bool(listed) and all(
            (store / f"{c}.npz").is_file() for c in listed)
    if not complete:
        cases = preprocess_dataset(raw_dir, plans, store,
                                   configuration=configuration)
        with open(marker, "w") as f:
            json.dump({"cases": sorted(cases)}, f)
    else:
        cases = sorted(json.load(open(marker))["cases"])
    if not splits_path.is_file():
        splits = make_splits(cases)
        with open(splits_path, "w") as f:
            json.dump(splits, f, indent=2)
    with open(splits_path) as f:
        splits = json.load(f)
    return dataset_json, plans, store, splits


def run_pretraining(dataset_id, configuration: str = "3d_fullres",
                    fold=0, trainer_name: str = "nnUNetTrainer_GIN",
                    num_epochs: int = 1000, continue_training: bool = False,
                    plans: Optional[dict] = None,
                    iters_per_epoch: int = ITERS_PER_EPOCH,
                    val_iters_per_epoch: int = VAL_ITERS_PER_EPOCH,
                    batch_size: Optional[int] = None,
                    num_devices: int = 1, plans_name: str = "nnUNetPlans",
                    seed: int = 0, verbose: bool = True):
    """The `dgtta pretrain` entry (run.py:64-69 surface)."""
    assert trainer_name in TRAINER_REGISTRY, trainer_name
    dataset_name = maybe_convert_to_dataset_name(dataset_id)
    fold = int(fold) if str(fold).isnumeric() else fold

    import os
    preprocessed_root = Path(os.environ.get(
        "nnUNet_preprocessed", nnunet_results().parent / "nnUNet_preprocessed"))
    preprocessed_dir = preprocessed_root / dataset_name
    dataset_json, plans, store, splits = _ensure_preprocessed(
        dataset_name, plans, preprocessed_dir, configuration=configuration,
        plans_name=plans_name)

    cfg = plans["configurations"][configuration]
    patch_size = tuple(cfg["patch_size"])
    if batch_size is None:
        batch_size = int(cfg.get("batch_size", 2))

    out_dir = (nnunet_results() / dataset_name /
               f"{trainer_name}__{plans_name}__{configuration}" /
               (f"fold_{fold}" if fold != "all" else "all"))
    out_dir.mkdir(parents=True, exist_ok=True)
    # the results folder always carries `plans.json` (nnUNet convention),
    # whatever the preprocessed-side plans file was called
    with open(out_dir.parent / "plans.json", "w") as f:
        json.dump(plans, f, indent=2)
    src = preprocessed_dir / "dataset_fingerprint.json"
    if src.is_file():
        shutil.copy(src, out_dir.parent / "dataset_fingerprint.json")
    with open(out_dir.parent / "dataset.json", "w") as f:
        json.dump(dataset_json, f, indent=2)

    if fold == "all":
        train_cases = sorted({c for s in splits for c in s["train"]}
                             | {c for s in splits for c in s["val"]})
        val_cases = train_cases
    else:
        train_cases = splits[fold]["train"]
        val_cases = splits[fold]["val"] or train_cases
    sampler = PatchSampler(store, train_cases, patch_size, seed=seed)
    val_sampler = PatchSampler(store, val_cases, patch_size,
                               oversample_fg=1.0, seed=seed + 1)

    model = build_model(plans, dataset_json, trainer_name, configuration)
    da_cfg = DAConfig(
        discrete_lowres_zooms=(MULTIRES_ZOOMS
                               if trainer_name in MULTIRES_TRAINERS else None))
    tx, step = make_train_step(model, da_cfg,
                               batch_dice=bool(cfg.get("batch_dice", True)))
    val_step = make_val_step(model)

    # data parallelism: batch sharded over the mesh, params replicated;
    # XLA inserts the gradient all-reduce (the `-num_gpus` analog of the
    # reference's DDP path, run.py:64-69 -> nnUNet DDP)
    shard_batch = lambda x: x
    if num_devices > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from dg_tta_tpu.parallel.mesh import make_mesh
        assert batch_size % num_devices == 0, (batch_size, num_devices)
        mesh = make_mesh(num_devices)
        batch_sharding = NamedSharding(mesh, P("data"))
        replicated = NamedSharding(mesh, P())
        shard_batch = lambda x: jax.device_put(x, batch_sharding)

    key = jax.random.PRNGKey(seed)
    ckpt_latest = out_dir / "checkpoint_latest.npz"
    ckpt_best = out_dir / "checkpoint_best.npz"
    ckpt_opt = out_dir / "checkpoint_latest_optimizer.npz"
    start_epoch = 0
    ema_dice = None  # nnUNet _best_ema tracking (0.9 EMA of val pseudo-Dice)
    best_ema = None
    if continue_training and ckpt_latest.is_file():
        # full training-state resume (the nnUNet checkpoint contract carries
        # optimizer state and RNG too): params + momentum trace + PRNG key —
        # `--c` continues the exact optimization trajectory instead of
        # silently resetting the 0.99 momentum trace
        params = flat_npz_to_params(ckpt_latest)
        meta = json.load(open(out_dir / "training_state.json"))
        start_epoch = meta["epoch"] + 1
        opt_state = tx.init(params)
        if ckpt_opt.is_file():
            # full optimizer-state pytree restore by flattened leaf order —
            # robust to the optax chain gaining members (any structure change
            # fails loudly with a leaf-count mismatch instead of silently
            # corrupting state the way positional TraceState surgery would)
            data = np.load(ckpt_opt)
            if any(k.startswith("leaf_") for k in data.files):
                leaves, treedef = jax.tree_util.tree_flatten(opt_state)
                assert len(leaves) == len(data.files), (
                    f"optimizer checkpoint has {len(data.files)} leaves, "
                    f"current optimizer state has {len(leaves)}")
                new_leaves = [
                    jnp.asarray(data[f"leaf_{i:05d}"], leaves[i].dtype)
                    for i in range(len(leaves))]
                opt_state = jax.tree_util.tree_unflatten(treedef, new_leaves)
            else:
                # pre-r3 checkpoints stored only the momentum trace
                trace = flat_npz_to_params(ckpt_opt)
                trace = jax.tree.map(lambda t, p: jnp.asarray(t, p.dtype),
                                     trace, params)
                opt_state = (opt_state[0], optax.TraceState(trace=trace))
        elif verbose:
            print("WARNING: no optimizer checkpoint found; momentum trace "
                  "restarts from zero")
        if "rng_key" in meta:
            key = jnp.asarray(np.asarray(meta["rng_key"], dtype=np.uint32))
        ema_dice = meta.get("ema_dice")
        best_ema = meta.get("best_ema")
        if verbose:
            print(f"Resuming from epoch {start_epoch}")
    else:
        params = model.init_params(key)
        opt_state = tx.init(params)

    # host-side prefetch: sampling (numpy, IO) overlaps device compute
    import queue
    import threading

    batch_q: "queue.Queue" = queue.Queue(maxsize=4)
    stop_flag = threading.Event()

    def _producer():
        while not stop_flag.is_set():
            b = sampler.batch(batch_size)
            while not stop_flag.is_set():
                try:
                    batch_q.put(b, timeout=0.5)
                    break
                except queue.Full:
                    continue

    producer = threading.Thread(target=_producer, daemon=True)
    producer.start()

    log_path = out_dir / "training_log.jsonl"
    for epoch in range(start_epoch, num_epochs):
        lr = poly_lr(INITIAL_LR, epoch, num_epochs)
        t0 = time.perf_counter()
        losses = []
        for it in range(iters_per_epoch):
            key, k_step = jax.random.split(key)
            imgs, segs = batch_q.get()
            params, opt_state, loss = step(
                params, opt_state, k_step, shard_batch(jnp.asarray(imgs)),
                shard_batch(jnp.asarray(segs.astype(np.float32))),
                jnp.float32(lr))
            losses.append(loss)
        mean_loss = float(np.mean(jax.device_get(jnp.stack(losses))))
        # nnUNet validation protocol: fixed val-iteration count, global
        # tp/fp/fn accumulation, EMA'd pseudo-Dice drives checkpoint_best
        tp = fp = fn = 0.0
        acc = None
        for _ in range(val_iters_per_epoch):
            vi, vs = val_sampler.batch(batch_size)
            t, p, n = val_step(params, jnp.asarray(vi),
                               jnp.asarray(vs.astype(np.float32)))
            acc = ((t, p, n) if acc is None
                   else jax.tree.map(jnp.add, acc, (t, p, n)))
        tp, fp, fn = (np.asarray(x) for x in acc)
        val_dice, _ = _global_pseudo_dice(tp, fp, fn)
        ema_dice = (val_dice if ema_dice is None
                    else 0.9 * ema_dice + 0.1 * val_dice)
        dt = time.perf_counter() - t0
        if verbose:
            print(f"epoch {epoch:4d}  loss={mean_loss:.4f}  "
                  f"val_pseudo_dice={val_dice:.4f}  ema={ema_dice:.4f}  "
                  f"lr={lr:.2e}  {dt:.1f}s")
        with open(log_path, "a") as f:
            f.write(json.dumps({"epoch": epoch, "loss": mean_loss,
                                "val_pseudo_dice": val_dice,
                                "ema_dice": ema_dice,
                                "lr": lr, "seconds": dt}) + "\n")
        params_to_flat_npz(params, ckpt_latest)
        if best_ema is None or ema_dice > best_ema:
            best_ema = ema_dice
            params_to_flat_npz(params, ckpt_best)
            if verbose:
                print(f"  new best EMA pseudo-Dice {best_ema:.4f} "
                      f"-> checkpoint_best")
        _leaves = jax.tree_util.tree_leaves(opt_state)
        np.savez(ckpt_opt, **{f"leaf_{i:05d}": np.asarray(l)
                              for i, l in enumerate(_leaves)})
        with open(out_dir / "training_state.json", "w") as f:
            json.dump({"epoch": epoch, "trainer": trainer_name,
                       "rng_key": np.asarray(key).tolist(),
                       "ema_dice": ema_dice, "best_ema": best_ema}, f)

    stop_flag.set()
    params_to_flat_npz(params, out_dir / "checkpoint_final.npz")
    if verbose:
        print(f"Training done -> {out_dir / 'checkpoint_final.npz'}")
    return out_dir
