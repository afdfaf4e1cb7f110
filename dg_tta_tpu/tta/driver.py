"""The TTA program driver: adaptation -> inference -> evaluation.

TPU-native re-implementation of `tta_main`
(/root/reference/dg_tta/tta/tta.py:93-477) and its nnUNet adapter layer
(nnunet_utils.py).  Differences by design:

* The model is a functional bundle (Model + param pytree) loaded from either
  an nnUNet torch checkpoint (converted) or a native .npz tree — no
  predictor object, no hook registration.
* The 3 ensemble members adapt simultaneously (vmapped) in
  `tta_one_volume`; resume granularity is per-sample (the reference resumes
  per (sample, ensemble), tta.py:169-173 — if only some member files exist
  the sample is re-run in full here).
* Volumes live bucket-padded in HBM; every hot step is one XLA program.
"""

import dataclasses
import json
import os
import re
import shutil
from pathlib import Path
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dg_tta_tpu.core.labels import get_map_idxs, map_label_argmaxed
from dg_tta_tpu.core.patches import bucket_shape_for, pad_to_bucket
from dg_tta_tpu.data.io import (SUPPORTED_ENDINGS, read_image,
                                write_image)
from dg_tta_tpu.data.preprocess import preprocess_case, undo_preprocessing_logits
from dg_tta_tpu.infer.sliding_window import predict_volume
from dg_tta_tpu.models.convert import (
    flat_npz_to_params,
    load_torch_checkpoint,
    params_to_flat_npz,
    torch_state_dict_to_params,
)
from dg_tta_tpu.models.network import Model, build_model
from dg_tta_tpu.obs.plots import plot_run_results
from dg_tta_tpu.obs.timers import PhaseTimer
from dg_tta_tpu.eval.metrics import compute_metrics_on_folder
from dg_tta_tpu.obs.wandb_log import wandb_log, wandb_run_is_available
from dg_tta_tpu.tta.config import get_global_idx, get_parameters_save_path
from dg_tta_tpu.tta.engine import tta_one_volume
from dg_tta_tpu.tta.plan import TTAPlan


@dataclasses.dataclass
class TTASample:
    sample_id: str               # e.g. "tta_outputTs/mycase"
    case_name: str
    bucket: str                  # "Ts" | "Tr"
    file_extension: str
    data: np.ndarray             # (C, D', H', W') preprocessed
    label: Optional[np.ndarray]  # (1, D', H', W') dense GT ids or None
    info: object                 # PreprocInfo
    props: dict


def load_pretrained_bundle(weights_file):
    """Build (Model, params, plans, dataset_json) from a checkpoint path in
    the nnUNet results layout `{trainer}__nnUNetPlans__{config}/fold_*/
    checkpoint_final.{pth,npz}` (reference load_network,
    nnunet_utils.py:88-113)."""
    weights_file = Path(weights_file)
    model_dir = weights_file.parents[1]
    trainer, _, configuration = model_dir.name.split("__")
    with open(model_dir / "plans.json") as f:
        plans = json.load(f)
    with open(model_dir / "dataset.json") as f:
        dataset_json = json.load(f)
    model = build_model(plans, dataset_json, trainer, configuration)
    cd = os.environ.get("DGTTA_COMPUTE_DTYPE")
    if cd:
        model = dataclasses.replace(model, compute_dtype=cd)
    if weights_file.suffix == ".npz":
        params = flat_npz_to_params(weights_file)
    else:
        ckpt = load_torch_checkpoint(weights_file)
        state_dict = ckpt.get("network_weights", ckpt)
        params = torch_state_dict_to_params(state_dict)
    return model, params, plans, dataset_json


_CHANNEL_SUFFIX = re.compile(r"(.*)_\d{4}$")


def case_name_from_image_path(path) -> str:
    """Strip the nnUNet channel suffix: case_0000.nii.gz -> case."""
    name = Path(path).name
    for ext in SUPPORTED_ENDINGS:
        if name.endswith(ext):
            name = name[: -len(ext)]
            break
    m = _CHANNEL_SUFFIX.match(name)
    return m.group(1) if m else name


def load_tta_data(plan: TTAPlan, tta_data_dir, plans: dict,
                  configuration: str = "3d_fullres") -> List[TTASample]:
    """Preprocess every file in the plan's tta_data_filepaths (the reference
    treats each image file as its own case, nnunet_utils.py:29-33)."""
    tta_data_dir = Path(tta_data_dir)
    samples = []
    for bucket in ("Ts", "Tr"):
        image_dirname = f"images{bucket}"
        for fp in plan.tta_data_filepaths or ():
            fp = Path(fp)
            if fp.parts[-2] != image_dirname:
                continue
            case = case_name_from_image_path(fp)
            ext = "".join(fp.suffixes)
            data, props = read_image(fp)
            label_fp = tta_data_dir / f"labels{bucket}" / f"{case}{ext}"
            seg = None
            if label_fp.is_file():
                seg_raw, _ = read_image(label_fp)
                seg = seg_raw.astype(np.int16)
            data_pp, seg_pp, info = preprocess_case(
                data, props, plans, configuration, seg=seg)
            samples.append(TTASample(
                sample_id=f"tta_output{bucket}/{case}",
                case_name=case,
                bucket=bucket,
                file_extension=ext,
                data=data_pp,
                label=seg_pp,
                info=info,
                props=props,
            ))
    return samples


def _to_device_volume(sample: TTASample, bucket_shape):
    """(C, D, H, W) -> bucket-padded channels-last (D, H, W, C) + true shape."""
    vol = np.moveaxis(sample.data, 0, -1)
    volj = jnp.asarray(vol)
    padded = pad_to_bucket(volj, bucket_shape, pad_value=float(volj.min()))
    lab = None
    if sample.label is not None:
        labj = jnp.asarray(np.moveaxis(sample.label, 0, -1).astype(np.float32))
        lab = pad_to_bucket(labj, bucket_shape, pad_value=0.0)
    true_shape = jnp.asarray([float(s) for s in vol.shape[:3]])
    return padded, lab, true_shape


def tta_main(run_name: str, plan: TTAPlan, tta_data_dir, save_base_path,
             label_mapping: dict, modifier_fn_module=None,
             timer: Optional[PhaseTimer] = None, verbose: bool = True):
    """Run the full TTA pipeline. Returns {bucket: summary dict}."""
    timer = timer or PhaseTimer()
    save_path = Path(save_base_path) / run_name
    save_path.mkdir(exist_ok=True, parents=True)
    plan.save(save_path / "tta_plan.json")

    mod = getattr(modifier_fn_module, "ModifierFunctions", None)
    modify_input_fn = getattr(mod, "modify_tta_input_fn", None)
    # the reference's model-output hook (modfify_tta_model_output_fn,
    # model_utils.py:21-35) runs on the raw logits BEFORE map_label
    # (tta.py:561); here label mapping is folded into the seg head during
    # adaptation, so the hook runs on mapped logits — equivalent for the
    # spatial (flip/permute) modifiers the hook exists for, which commute
    # with the channel gather.  At inference it runs on raw full-class
    # logits, exactly like the reference.
    modify_model_output_fn = getattr(mod, "modify_tta_model_output_fn", None)
    modify_after_mapping_fn = getattr(
        mod, "modify_tta_output_after_mapping_fn", None)
    postprocess_fn = getattr(mod, "postprocess_results_fn", lambda d: None)

    optimized_labels = list(plan.optimized_labels)
    map_pre = get_map_idxs(label_mapping, optimized_labels, "pretrain_labels")
    map_tta = get_map_idxs(label_mapping, optimized_labels, "tta_labels")

    with timer.phase("load_model"):
        model, pretrained_params, plans, dataset_json = \
            load_pretrained_bundle(plan.pretrained_weights_filepath)

    with timer.phase("preprocess"):
        samples = load_tta_data(plan, tta_data_dir, plans)
    if verbose:
        print(f"# Loaded {len(samples)} samples")

    key = jax.random.PRNGKey(0)

    # ---- Phase 1: adaptation -------------------------------------------
    if plan.tta_across_all_samples:
        groups = [samples] if samples else []
    else:
        groups = [[s] for s in samples]

    for smp_idx, group in enumerate(groups):
        group_id = ("all_samples" if plan.tta_across_all_samples
                    else group[0].sample_id)
        sub_dir = (save_path / "tta_output" if plan.tta_across_all_samples
                   else save_path / Path(group[0].sample_id).parent)
        sub_dir.mkdir(exist_ok=True, parents=True)
        param_id = group_id.split("/")[-1]
        member_paths = [get_parameters_save_path(sub_dir, param_id, i)
                        for i in range(plan.ensemble_count)]
        # per-(sample, ensemble) resume granularity (tta.py:169-173): only
        # members whose parameter files are missing are re-adapted
        missing = [i for i, p in enumerate(member_paths) if not p.is_file()]
        if not missing:
            if verbose:
                print(f"TTA parameters exist, skipping {group_id}")
            continue

        shapes = [s.data.shape[1:] for s in group]
        bucket = bucket_shape_for(np.max(shapes, axis=0))
        vols, labs, tshapes = [], [], []
        has_labels = all(s.label is not None for s in group)
        for s in group:
            v, l, t = _to_device_volume(s, bucket)
            vols.append(v)
            tshapes.append(t)
            if has_labels:
                labs.append(l)
        vols = jnp.stack(vols)
        tshapes = jnp.stack(tshapes)
        labs = jnp.stack(labs) if has_labels else None

        logs = []

        def log_fn(epoch, loss, dice, smp_idx=smp_idx, param_id=param_id):
            logs.append((epoch, float(np.mean(loss)), float(np.mean(dice))))
            if verbose:
                print(f"  epoch {epoch:3d} loss={np.mean(loss):.4f} "
                      f"pseudo-dice={100 * np.mean(dice):.1f}%")
            if wandb_run_is_available():
                step = get_global_idx([(smp_idx, len(groups)),
                                       (0, plan.ensemble_count),
                                       (epoch, plan.epochs)])
                wandb_log({f"losses/loss__{param_id}": float(np.mean(loss)),
                           f"scores/eval_dice__{param_id}":
                               float(np.mean(dice))}, step=step)

        if verbose:
            print(f"# TTA {group_id} (members {missing})")
        # group-id-derived key: a resumed run reproduces the exact PRNG
        # streams of the members it re-adapts regardless of which other
        # groups/members were skipped
        k_run = jax.random.fold_in(key, smp_idx)

        def save_member(m, params_m, loss_m, dice_m, sub_dir=sub_dir,
                        param_id=param_id, member_paths=member_paths):
            # saved as soon as the member's chunk finishes — a crash loses at
            # most the chunk in flight, resume re-runs only missing members
            params_to_flat_npz(params_m, member_paths[m])
            plot_run_results(sub_dir, param_id, m, loss_m, dice_m)

        # knobs come from the plan (editable per run, reference workflow);
        # env vars override for experiments.  ensemble_chunk default is
        # device-aware: full-size models (>=1M-voxel patches) run one member
        # per DEVICE step — chunk=1 on a single chip (HBM bound), but
        # chunk=min(E, n_dev) on a multi-chip mesh, where the ensemble axis
        # shards one member per device at the same per-device footprint
        # (engine.py sharding branch).
        big = int(np.prod(model.patch_size)) >= 2 ** 20
        n_dev = len(jax.devices())
        chunk = plan.ensemble_chunk
        if os.environ.get("DGTTA_ENSEMBLE_CHUNK"):
            chunk = int(os.environ["DGTTA_ENSEMBLE_CHUNK"])
        if chunk is None:
            if big:
                chunk = min(plan.ensemble_count, n_dev) if n_dev > 1 else 1
            # small models: chunk=None lets the engine batch all members
        group = int(os.environ.get("DGTTA_PATCH_GROUP", plan.patch_group))
        remat = bool(int(os.environ.get("DGTTA_REMAT", int(plan.remat))))
        split = (os.environ.get("DGTTA_ENGINE", plan.engine) == "split")
        with timer.phase("adaptation"):
            adapted, losses, dices = tta_one_volume(
                model, plan, pretrained_params, vols, tshapes,
                map_pre, map_tta, k_run, labels_padded=labs,
                modify_input_fn=modify_input_fn,
                modify_output_fn=modify_model_output_fn,
                modify_after_mapping_fn=modify_after_mapping_fn,
                log_fn=log_fn,
                ensemble_chunk=chunk, remat=remat, split=split,
                exact_warp_grad=bool(os.environ.get(
                    "DGTTA_EXACT_WARP_GRAD")),
                patch_group=group,
                member_indices=missing, save_member_fn=save_member)
            jax.block_until_ready(jax.tree.leaves(adapted)[0])

    # ---- Phase 2: inference --------------------------------------------
    prediction_paths = []
    for sample in samples:
        sub_dir = save_path / Path(sample.sample_id).parent
        param_id = ("all_samples" if plan.tta_across_all_samples
                    else sample.sample_id.split("/")[-1])
        param_dir = (save_path / "tta_output" if plan.tta_across_all_samples
                     else sub_dir)
        member_paths = [get_parameters_save_path(param_dir, param_id, i)
                        for i in range(plan.ensemble_count)]
        members = [flat_npz_to_params(p) for p in member_paths]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *members)

        vol = jnp.asarray(np.moveaxis(sample.data, 0, -1))
        if verbose:
            print(f"# Inference {sample.sample_id}")
        key, k_inf = jax.random.split(key)
        with timer.phase("inference"):
            # modifier hooks stay active at inference (nnunet_utils.py:116-125
            # uses the hooked model); the raw-logit output hook applies here,
            # label mapping happens argmaxed after export (tta.py:407)
            logits = predict_volume(
                model, stacked, vol, key=k_inf,
                modify_input_fn=modify_input_fn,
                modify_output_fn=modify_model_output_fn)
            logits = np.asarray(logits)
        with timer.phase("export"):
            seg = undo_preprocessing_logits(logits, sample.info)
            seg_mapped = np.asarray(map_label_argmaxed(
                jnp.asarray(seg.astype(np.int32)), map_pre))
            out_path = save_path / (sample.sample_id + sample.file_extension)
            out_path.parent.mkdir(exist_ok=True, parents=True)
            write_image(out_path, seg_mapped.astype(np.uint8), sample.props)
        prediction_paths.append((out_path, sample))

    # ---- Phase 3: evaluation -------------------------------------------
    summaries = {}
    tta_data_dir = Path(tta_data_dir)
    for out_path, sample in prediction_paths:
        orig_label = (tta_data_dir / f"labels{sample.bucket}" /
                      f"{sample.case_name}{sample.file_extension}")
        if not orig_label.is_file():
            continue
        mapped_dir = save_path / f"mapped_target_labels{sample.bucket}"
        mapped_dir.mkdir(exist_ok=True)
        target = mapped_dir / out_path.name
        shutil.copy(orig_label, target)
        seg_raw, props = read_image(target)
        mapped = np.asarray(map_label_argmaxed(
            jnp.asarray(seg_raw[0].astype(np.int32)), map_tta))
        write_image(target, mapped.astype(np.uint8), props)

    for bucket in ("Ts", "Tr"):
        mapped_dir = save_path / f"mapped_target_labels{bucket}"
        pred_dir = save_path / f"tta_output{bucket}"
        if not (mapped_dir.is_dir() and pred_dir.is_dir()):
            continue
        postprocess_fn(pred_dir)
        with timer.phase("evaluation"):
            summary = compute_metrics_on_folder(
                pred_dir, mapped_dir,
                labels=list(range(len(optimized_labels))),
                num_processes=plan.num_processes,
                output_file=f"../summary_{bucket}.json")
        summaries[bucket] = summary
        if verbose:
            print(f"summary_{bucket}: foreground mean Dice = "
                  f"{summary['foreground_mean']['Dice']:.4f}")
        if wandb_run_is_available():
            wandb_log({f"scores/tta_dice_mean_{bucket}":
                       summary["foreground_mean"]["Dice"]})

    if verbose:
        print(timer.report())
    return summaries
