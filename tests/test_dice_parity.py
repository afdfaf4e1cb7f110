"""Smoke test of the Dice-parity procedure (tools/dice_parity.py).

On real TS104 checkpoints + volumes the tool is the BASELINE.md "equal
Dice" verification against a stored torch-run summary.json
(/root/reference/dg_tta/tta/tta.py:420-477 semantics); here it runs the
identical code path on a fabricated checkpoint + synthetic volumes
(VERDICT r3 item 3 'Done' criterion)."""

import importlib.util
import json
from pathlib import Path

import jax
import numpy as np
import pytest

from tests.test_pipeline_e2e import (
    MINI_PLANS,
    SRC_LABELS,
    TGT_LABELS,
    TRAINER,
    make_volume,
)
from dg_tta_tpu.data.nifti import write_nifti


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "dice_parity",
        Path(__file__).parents[1] / "tools" / "dice_parity.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def parity_workspace(tmp_path, monkeypatch):
    raw = tmp_path / "nnUNet_raw"
    results = tmp_path / "nnUNet_results"
    raw.mkdir()
    results.mkdir()
    monkeypatch.setenv("nnUNet_raw", str(raw))
    monkeypatch.setenv("nnUNet_results", str(results))

    model_dir = (results / "Dataset901_MiniSrc" /
                 f"{TRAINER}__nnUNetPlans__3d_fullres")
    fold_dir = model_dir / "fold_0"
    fold_dir.mkdir(parents=True)
    with open(model_dir / "plans.json", "w") as f:
        json.dump(MINI_PLANS, f)
    with open(model_dir / "dataset.json", "w") as f:
        json.dump({"labels": SRC_LABELS, "channel_names": {"0": "CT"},
                   "file_ending": ".nii.gz"}, f)
    from dg_tta_tpu.models.convert import params_to_flat_npz
    from dg_tta_tpu.models.network import build_model
    model = build_model(MINI_PLANS,
                        {"labels": SRC_LABELS, "channel_names": {"0": "CT"}},
                        TRAINER)
    params = model.init_params(jax.random.PRNGKey(42))
    params_to_flat_npz(params, fold_dir / "checkpoint_final.npz")

    tgt = raw / "Dataset902_MiniTgt"
    (tgt / "imagesTs").mkdir(parents=True)
    (tgt / "labelsTs").mkdir()
    with open(tgt / "dataset.json", "w") as f:
        json.dump({"labels": TGT_LABELS, "channel_names": {"0": "MR"},
                   "numTraining": 0, "file_ending": ".nii.gz"}, f)
    rng = np.random.default_rng(0)
    vol, seg = make_volume(rng)
    props = {"spacing": (1.5, 1.5, 1.5)}
    write_nifti(tgt / "imagesTs" / "caseA_0000.nii.gz", vol, props,
                dtype=np.float32)
    write_nifti(tgt / "labelsTs" / "caseA.nii.gz", seg, props)
    return fold_dir / "checkpoint_final.npz", tgt


def test_dice_parity_tool(parity_workspace, tmp_path):
    ckpt, tgt = parity_workspace
    tool = _load_tool()
    out = tmp_path / "parity_out"

    # first run produces our summary (the full pipeline end-to-end)
    rc = tool.main([str(ckpt), str(tgt), "--out", str(out),
                    "--epochs", "1", "--ensemble-count", "1",
                    "--patches", "2"])
    assert rc == 0
    summary_path = out / "dice_parity" / "summary_Ts.json"
    assert summary_path.is_file()
    summary = json.load(open(summary_path))
    assert np.isfinite(summary["foreground_mean"]["Dice"])

    # identical run vs its own summary -> parity passes with delta 0
    out2 = tmp_path / "parity_out2"
    rc = tool.main([str(ckpt), str(tgt), "--out", str(out2),
                    "--epochs", "1", "--ensemble-count", "1",
                    "--patches", "2",
                    "--reference-summary", str(summary_path),
                    "--tol", "1e-6"])
    assert rc == 0
    report = json.load(open(out2 / "dice_parity" / "parity_report.json"))
    assert report["pass"]
    assert report["max_class_mean_abs_delta"] <= 1e-6
    assert report["per_class"], "no foreground classes compared"

    # a perturbed reference summary must fail the tolerance gate
    bad = json.loads(json.dumps(summary))
    for cls in bad["mean"]:
        if cls != "0":
            bad["mean"][cls]["Dice"] = bad["mean"][cls]["Dice"] + 0.5
    bad_path = tmp_path / "bad_summary.json"
    with open(bad_path, "w") as f:
        json.dump(bad, f)
    out3 = tmp_path / "parity_out3"
    rc = tool.main([str(ckpt), str(tgt), "--out", str(out3),
                    "--epochs", "1", "--ensemble-count", "1",
                    "--patches", "2",
                    "--reference-summary", str(bad_path),
                    "--tol", "0.05"])
    assert rc == 1


def test_dice_parity_no_tta_is_inference_only(parity_workspace, tmp_path):
    """--no-tta (lr=0) leaves the prediction identical to the pretrained
    model's plain ensemble inference."""
    ckpt, tgt = parity_workspace
    tool = _load_tool()
    out = tmp_path / "nt"
    rc = tool.main([str(ckpt), str(tgt), "--out", str(out), "--no-tta"])
    assert rc == 0
    assert (out / "dice_parity" / "summary_Ts.json").is_file()
