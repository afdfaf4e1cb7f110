"""End-to-end walkthrough on synthetic data (CPU-friendly).

Builds a miniature source model + target dataset, then runs the same
commands a real user runs:

    dgtta pretrain        (miniature DG pretraining, GIN trainer)
    dgtta prepare_tta     (plan directory with label mappings + notebook)
    dgtta run_tta         (adaptation -> ensemble inference -> Dice summary)

Usage:  python examples/synthetic_walkthrough.py /tmp/dgtta_demo
"""

import json
import os
import sys
from pathlib import Path

import numpy as np

# Running the file directly puts examples/ (not the repo root) on sys.path;
# make the walkthrough work from a source checkout without pip install.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(base: Path):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass
    print(f"[walkthrough] jax backend: {jax.default_backend()}", flush=True)

    from dg_tta_tpu.data.nifti import write_nifti
    from dg_tta_tpu.cli.main import main as dgtta

    raw = base / "nnUNet_raw"
    results = base / "nnUNet_results"
    root = base / "dg_tta_root"
    pre = base / "nnUNet_preprocessed"
    for d in (raw, results, root, pre):
        d.mkdir(parents=True, exist_ok=True)
    os.environ["nnUNet_raw"] = str(raw)
    os.environ["nnUNet_results"] = str(results)
    os.environ["nnUNet_preprocessed"] = str(pre)
    os.environ["DG_TTA_ROOT"] = str(root)

    rng = np.random.default_rng(0)

    def make_case(shape=(24, 26, 22)):
        vol = rng.normal(0, 0.3, size=shape).astype(np.float32)
        seg = np.zeros(shape, np.uint8)
        vol[5:14, 6:16, 5:15] += 2.5
        seg[5:14, 6:16, 5:15] = 1
        return vol, seg

    # --- source (pretraining) dataset -----------------------------------
    src = raw / "Dataset910_DemoSrc"
    (src / "imagesTr").mkdir(parents=True, exist_ok=True)
    (src / "labelsTr").mkdir(exist_ok=True)
    json.dump({"labels": {"background": 0, "organ": 1},
               "channel_names": {"0": "CT"}, "file_ending": ".nii.gz"},
              open(src / "dataset.json", "w"))
    for i in range(3):
        vol, seg = make_case()
        props = {"spacing": (1.5, 1.5, 1.5)}
        write_nifti(src / "imagesTr" / f"src{i}_0000.nii.gz", vol, props,
                    dtype=np.float32)
        write_nifti(src / "labelsTr" / f"src{i}.nii.gz", seg, props)

    # --- target (TTA) dataset -------------------------------------------
    tgt = raw / "Dataset911_DemoTgt"
    (tgt / "imagesTs").mkdir(parents=True, exist_ok=True)
    (tgt / "labelsTs").mkdir(exist_ok=True)
    json.dump({"labels": {"background": 0, "organ": 1},
               "channel_names": {"0": "MR"}, "file_ending": ".nii.gz"},
              open(tgt / "dataset.json", "w"))
    vol, seg = make_case()
    # a mild "domain shift": gain + bias + extra noise
    vol = 0.7 * vol + 0.4 + rng.normal(0, 0.15, vol.shape).astype(np.float32)
    props = {"spacing": (1.5, 1.5, 1.5)}
    write_nifti(tgt / "imagesTs" / "case0_0000.nii.gz", vol, props,
                dtype=np.float32)
    write_nifti(tgt / "labelsTs" / "case0.nii.gz", seg, props)

    # --- miniature plans so the demo runs in minutes on CPU --------------
    from dg_tta_tpu.train.dataset import fingerprint_dataset, plan_experiment
    fp = fingerprint_dataset(src)
    plans = plan_experiment(json.load(open(src / "dataset.json")), fp,
                            "Dataset910_DemoSrc", max_patch=(16, 16, 16))
    cfg = plans["configurations"]["3d_fullres"]
    cfg.update(UNet_base_num_features=8, unet_max_num_features=16,
               n_conv_per_stage_encoder=[1, 1], n_conv_per_stage_decoder=[1],
               pool_op_kernel_sizes=[[1, 1, 1], [2, 2, 2]],
               conv_kernel_sizes=[[3, 3, 3]] * 2)
    (pre / "Dataset910_DemoSrc").mkdir(exist_ok=True)
    json.dump(plans, open(pre / "Dataset910_DemoSrc" / "plans.json", "w"))

    print("\n=== dgtta pretrain (2 miniature epochs) ===")
    dgtta(["pretrain", "910", "3d_fullres", "0", "-tr", "nnUNetTrainer_GIN",
           "--num_epochs", "2"])
    # shrink iters via direct call instead? keep CLI surface: the loop above
    # used the default 250 iters/epoch; acceptable for the demo scale.

    print("\n=== dgtta prepare_tta ===")
    dgtta(["prepare_tta", "910", "911", "--pretrainer", "nnUNetTrainer_GIN",
           "--pretrainer_config", "3d_fullres", "--pretrainer_fold", "0"])

    plan_dir = (root / "plans" /
                "Pretrained_Dataset910_DemoSrc_at_Dataset911_DemoTgt" /
                "nnUNetTrainer_GIN__3d_fullres" / "fold_0")
    plan = json.load(open(plan_dir / "tta_plan.json"))
    plan.update(epochs=3, patches_to_be_accumulated=2, ensemble_count=2,
                lr=1e-3)
    json.dump(plan, open(plan_dir / "tta_plan.json", "w"))
    print(f"plan edited: {plan_dir / 'tta_plan.json'}")

    print("\n=== dgtta run_tta ===")
    dgtta(["run_tta", "910", "911", "--pretrainer", "nnUNetTrainer_GIN",
           "--pretrainer_config", "3d_fullres", "--pretrainer_fold", "0"])

    results_dir = (root / "results" /
                   "Pretrained_Dataset910_DemoSrc_at_Dataset911_DemoTgt" /
                   "nnUNetTrainer_GIN__3d_fullres" / "fold_0")
    run = next(results_dir.iterdir())
    summary = json.load(open(run / "summary_Ts.json"))
    print(f"\nDemo complete. Foreground mean Dice: "
          f"{summary['foreground_mean']['Dice']:.3f}")
    print(f"Artifacts: {run}")


if __name__ == "__main__":
    base = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/dgtta_demo")
    main(base)
