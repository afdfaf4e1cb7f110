"""End-to-end pipeline test: prepare_tta -> run_tta on a synthetic mini
dataset through the CLI surface, exercising every layer (config, NIfTI IO,
preprocessing, TTA engine, sliding-window inference, export, metrics)."""

import json
import os
from pathlib import Path

import jax
import numpy as np
import pytest

from dg_tta_tpu.data.nifti import write_nifti

TRAINER = "nnUNetTrainer_GIN"

MINI_PLANS = {
    "dataset_name": "Dataset901_MiniSrc",
    "plans_name": "nnUNetPlans",
    "transpose_forward": [0, 1, 2],
    "transpose_backward": [0, 1, 2],
    "foreground_intensity_properties_per_channel": {
        "0": {"mean": 0.0, "std": 1.0,
              "percentile_00_5": -3.0, "percentile_99_5": 3.0}},
    "configurations": {
        "3d_fullres": {
            "patch_size": [16, 16, 16],
            "spacing": [1.5, 1.5, 1.5],
            "normalization_schemes": ["CTNormalization"],
            "use_mask_for_norm": [False],
            "UNet_base_num_features": 8,
            "unet_max_num_features": 16,
            "n_conv_per_stage_encoder": [1, 1],
            "n_conv_per_stage_decoder": [1],
            "pool_op_kernel_sizes": [[1, 1, 1], [2, 2, 2]],
            "conv_kernel_sizes": [[3, 3, 3], [3, 3, 3]],
            "batch_size": 1,
        }
    },
}

SRC_LABELS = {"background": 0, "liver": 1, "spleen": 2, "kidney": 3}
TGT_LABELS = {"background": 0, "spleen": 1, "liver": 2}


def make_volume(rng, shape=(22, 20, 24)):
    vol = rng.normal(0.0, 0.3, size=shape).astype(np.float32)
    seg = np.zeros(shape, np.uint8)
    vol[4:12, 4:12, 4:12] += 2.0
    seg[4:12, 4:12, 4:12] = 2   # liver in TGT space
    vol[13:19, 12:18, 14:22] -= 2.0
    seg[13:19, 12:18, 14:22] = 1  # spleen in TGT space
    vol[vol == 0] += 0.01  # keep crop-to-nonzero honest
    return vol, seg


@pytest.fixture
def workspace(tmp_path, monkeypatch):
    root = tmp_path / "dg_tta_root"
    raw = tmp_path / "nnUNet_raw"
    results = tmp_path / "nnUNet_results"
    for d in (root, raw, results):
        d.mkdir()
    monkeypatch.setenv("DG_TTA_ROOT", str(root))
    monkeypatch.setenv("nnUNet_raw", str(raw))
    monkeypatch.setenv("nnUNet_results", str(results))

    # --- pretrained source dataset + checkpoint (numeric-id path) -------
    src = raw / "Dataset901_MiniSrc"
    src.mkdir()
    with open(src / "dataset.json", "w") as f:
        json.dump({"labels": SRC_LABELS, "channel_names": {"0": "CT"},
                   "numTraining": 1, "file_ending": ".nii.gz"}, f)

    model_dir = (results / "Dataset901_MiniSrc" /
                 f"{TRAINER}__nnUNetPlans__3d_fullres")
    fold_dir = model_dir / "fold_0"
    fold_dir.mkdir(parents=True)
    with open(model_dir / "plans.json", "w") as f:
        json.dump(MINI_PLANS, f)
    with open(model_dir / "dataset.json", "w") as f:
        json.dump({"labels": SRC_LABELS, "channel_names": {"0": "CT"},
                   "file_ending": ".nii.gz"}, f)

    from dg_tta_tpu.models.network import build_model
    from dg_tta_tpu.models.convert import params_to_flat_npz
    model = build_model(MINI_PLANS,
                        {"labels": SRC_LABELS, "channel_names": {"0": "CT"}},
                        TRAINER)
    params = model.init_params(jax.random.PRNGKey(42))
    params_to_flat_npz(params, fold_dir / "checkpoint_final.npz")

    # --- target dataset with 2 labeled volumes --------------------------
    tgt = raw / "Dataset902_MiniTgt"
    (tgt / "imagesTs").mkdir(parents=True)
    (tgt / "labelsTs").mkdir()
    with open(tgt / "dataset.json", "w") as f:
        json.dump({"labels": TGT_LABELS, "channel_names": {"0": "MR"},
                   "numTraining": 0, "file_ending": ".nii.gz"}, f)
    rng = np.random.default_rng(0)
    for case in ("caseA", "caseB"):
        vol, seg = make_volume(rng)
        props = {"spacing": (1.5, 1.5, 1.5)}
        write_nifti(tgt / "imagesTs" / f"{case}_0000.nii.gz", vol, props,
                    dtype=np.float32)
        write_nifti(tgt / "labelsTs" / f"{case}.nii.gz", seg, props)
    return root, raw, results


def test_prepare_and_run_tta_cli(workspace):
    root, raw, results = workspace
    from dg_tta_tpu.cli.main import main

    main(["prepare_tta", "901", "902",
          "--pretrainer", TRAINER,
          "--pretrainer_config", "3d_fullres",
          "--pretrainer_fold", "0"])

    plan_dir = (root / "plans" /
                "Pretrained_Dataset901_MiniSrc_at_Dataset902_MiniTgt" /
                f"{TRAINER}__3d_fullres" / "fold_0")
    assert (plan_dir / "tta_plan.json").is_file()
    assert (plan_dir / "modifier_functions.py").is_file()
    assert (plan_dir / "Dataset901_MiniSrc_label_mapping.json").is_file()

    plan = json.load(open(plan_dir / "tta_plan.json"))
    assert plan["optimized_labels"] == ["background", "liver", "spleen"]
    assert len(plan["tta_data_filepaths"]) == 2

    # shrink for CPU test speed
    plan.update(epochs=2, patches_to_be_accumulated=2, ensemble_count=2,
                lr=1e-3)
    with open(plan_dir / "tta_plan.json", "w") as f:
        json.dump(plan, f)

    main(["run_tta", "901", "902",
          "--pretrainer", TRAINER,
          "--pretrainer_config", "3d_fullres",
          "--pretrainer_fold", "0"])

    results_dir = (root / "results" /
                   "Pretrained_Dataset901_MiniSrc_at_Dataset902_MiniTgt" /
                   f"{TRAINER}__3d_fullres" / "fold_0")
    runs = list(results_dir.iterdir())
    assert len(runs) == 1
    run_dir = runs[0]

    # phase 1 artifacts: params + plots per (sample, ensemble)
    for case in ("caseA", "caseB"):
        for i in range(2):
            assert (run_dir / "tta_outputTs" /
                    f"{case}__ensemble_idx_{i}_tta_parameters.npz").is_file()
            assert (run_dir / "tta_outputTs" /
                    f"{case}__ensemble_idx_{i}_tta_results.png").is_file()

    # phase 2: predictions in original geometry
    from dg_tta_tpu.data.nifti import read_nifti
    for case in ("caseA", "caseB"):
        pred, _ = read_nifti(run_dir / "tta_outputTs" / f"{case}.nii.gz")
        assert pred.shape == (1, 22, 20, 24)
        assert set(np.unique(pred)).issubset({0.0, 1.0, 2.0})

    # phase 3: metrics summary with mapped labels
    summary = json.load(open(run_dir / "summary_Ts.json"))
    assert set(summary["mean"].keys()) == {"0", "1", "2"}
    assert len(summary["metric_per_case"]) == 2
    assert np.isfinite(summary["foreground_mean"]["Dice"])

    # mapped GT must use optimized ids (liver=1, spleen=2 in optimized order)
    gt, _ = read_nifti(run_dir / "mapped_target_labelsTs" / "caseA.nii.gz")
    assert set(np.unique(gt)).issubset({0.0, 1.0, 2.0})


def test_resume_skips_existing(workspace, capsys):
    root, raw, results = workspace
    from dg_tta_tpu.cli.main import main
    main(["prepare_tta", "901", "902", "--pretrainer", TRAINER,
          "--pretrainer_config", "3d_fullres", "--pretrainer_fold", "0"])
    plan_dir = (root / "plans" /
                "Pretrained_Dataset901_MiniSrc_at_Dataset902_MiniTgt" /
                f"{TRAINER}__3d_fullres" / "fold_0")
    plan = json.load(open(plan_dir / "tta_plan.json"))
    plan.update(epochs=1, patches_to_be_accumulated=1, ensemble_count=1)
    with open(plan_dir / "tta_plan.json", "w") as f:
        json.dump(plan, f)

    main(["run_tta", "901", "902", "--pretrainer", TRAINER,
          "--pretrainer_config", "3d_fullres", "--pretrainer_fold", "0"])
    results_dir = (root / "results" /
                   "Pretrained_Dataset901_MiniSrc_at_Dataset902_MiniTgt" /
                   f"{TRAINER}__3d_fullres" / "fold_0")
    run_name = next(results_dir.iterdir()).name
    run_no = int(run_name.rsplit("-", 1)[-1])

    capsys.readouterr()
    main(["run_tta", "901", "902", "--pretrainer", TRAINER,
          "--pretrainer_config", "3d_fullres", "--pretrainer_fold", "0",
          "--run_no", str(run_no)])
    out = capsys.readouterr().out
    assert "skipping" in out
