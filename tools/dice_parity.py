"""Dice-parity procedure against a reference torch DG-TTA run.

Given a REAL pretrained checkpoint (nnUNet `checkpoint_final.pth` or native
`.npz`, sitting in the nnUNet results layout with plans.json/dataset.json
two levels up), a target dataset directory in nnUNet raw layout
(dataset.json + imagesTs/labelsTs ...), and optionally a `summary.json`
produced by a reference torch run, this tool:

  1. runs the FULL pipeline — preprocess -> per-volume TTA adaptation ->
     ensemble sliding-window inference -> export -> per-class Dice metrics
     (the tta_main semantics of /root/reference/dg_tta/tta/tta.py:93-477,
     evaluation at :420-477 via compute_metrics_on_folder_simple);
  2. writes our summary.json (same nnUNet schema, eval/metrics.py);
  3. if --reference-summary is given, diffs per-class Dice per case and
     overall, writes parity_report.json, and exits nonzero when any
     foreground class mean differs by more than --tol.

Smoke-tested on fabricated checkpoints + synthetic volumes in
tests/test_dice_parity.py; on a machine with the released TS104 checkpoints
and real volumes it is the "equal Dice" verification procedure
(BASELINE.md: Dice parity on CT->MRI TS104->AMOS).

Example:
  python tools/dice_parity.py \
      $RESULTS/Dataset620_AMOS/.../fold_0/checkpoint_final.pth \
      $RAW/Dataset620_AMOS \
      --reference-summary torch_run/summary_Ts.json --tol 0.01
"""

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_plan(checkpoint, tta_data_dir, bucket, overrides):
    from dg_tta_tpu.tta.plan import TTAPlan

    tta_data_dir = Path(tta_data_dir)
    dirs = {"imagesTr": ["imagesTr"], "imagesTs": ["imagesTs"],
            "imagesTrAndTs": ["imagesTr", "imagesTs"]}[bucket]
    files = []
    for d in dirs:
        p = tta_data_dir / d
        if p.is_dir():
            files.extend(sorted(str(f) for f in p.iterdir() if f.is_file()))
    if not files:
        sys.exit(f"No images found under {tta_data_dir} bucket {bucket}")

    with open(Path(checkpoint).parents[1] / "dataset.json") as f:
        pre_labels = json.load(f)["labels"]
    with open(tta_data_dir / "dataset.json") as f:
        tta_labels = json.load(f)["labels"]
    intersection = sorted(set(pre_labels) & set(tta_labels))
    assert "background" in intersection, \
        "Background class must be present in both datasets!"
    intersection.remove("background")
    intersection.insert(0, "background")

    plan = TTAPlan(
        pretrained_weights_filepath=str(checkpoint),
        optimized_labels=intersection,
        tta_data_filepaths=files,
        **overrides)
    return plan, pre_labels, tta_labels


def diff_summaries(ours: dict, ref: dict, tol: float):
    """Per-class and per-case Dice deltas between two nnUNet summaries."""
    report = {"per_class": {}, "per_case": [], "tol": tol}
    worst = 0.0
    for cls, vals in ours["mean"].items():
        if cls == "0" or cls not in ref.get("mean", {}):
            continue
        d_ours, d_ref = vals["Dice"], ref["mean"][cls]["Dice"]
        delta = (abs(d_ours - d_ref)
                 if np.isfinite(d_ours) and np.isfinite(d_ref) else 0.0)
        worst = max(worst, delta)
        report["per_class"][cls] = {
            "ours": d_ours, "reference": d_ref, "abs_delta": delta}
    ref_cases = {Path(c["reference_file"]).name: c["metrics"]
                 for c in ref.get("metric_per_case", [])}
    for c in ours.get("metric_per_case", []):
        name = Path(c["reference_file"]).name
        if name not in ref_cases:
            continue
        deltas = {}
        for cls, m in c["metrics"].items():
            if cls == "0" or cls not in ref_cases[name]:
                continue
            a, b = m["Dice"], ref_cases[name][cls]["Dice"]
            deltas[cls] = (abs(a - b)
                           if np.isfinite(a) and np.isfinite(b) else 0.0)
        report["per_case"].append({"case": name, "abs_delta": deltas})
    report["max_class_mean_abs_delta"] = worst
    fg_ours = ours["foreground_mean"]["Dice"]
    fg_ref = ref.get("foreground_mean", {}).get("Dice", float("nan"))
    report["foreground_mean"] = {
        "ours": fg_ours, "reference": fg_ref,
        "abs_delta": (abs(fg_ours - fg_ref)
                      if np.isfinite(fg_ours) and np.isfinite(fg_ref)
                      else float("nan"))}
    report["pass"] = bool(worst <= tol)
    return report


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Run the full TTA pipeline on real data and diff "
                    "per-class Dice against a reference torch summary.json")
    ap.add_argument("checkpoint", help="checkpoint_final.pth or .npz in the "
                    "nnUNet results layout")
    ap.add_argument("tta_data_dir", help="target dataset dir (nnUNet raw "
                    "layout: dataset.json + imagesTs/labelsTs)")
    ap.add_argument("--reference-summary", default=None,
                    help="summary.json from a reference torch run")
    ap.add_argument("--bucket", default="imagesTs",
                    choices=["imagesTr", "imagesTs", "imagesTrAndTs"])
    ap.add_argument("--out", default="dice_parity_out")
    ap.add_argument("--tol", type=float, default=0.01,
                    help="max allowed per-class mean Dice delta")
    ap.add_argument("--epochs", type=int, default=None,
                    help="override plan epochs (smoke runs)")
    ap.add_argument("--ensemble-count", type=int, default=None)
    ap.add_argument("--patches", type=int, default=None,
                    help="override patches_to_be_accumulated")
    ap.add_argument("--no-tta", action="store_true",
                    help="skip adaptation (pure inference parity)")
    args = ap.parse_args(argv)

    overrides = {}
    if args.epochs is not None:
        overrides["epochs"] = args.epochs
    if args.ensemble_count is not None:
        overrides["ensemble_count"] = args.ensemble_count
    if args.patches is not None:
        overrides["patches_to_be_accumulated"] = args.patches
    if args.no_tta:
        # lr=0 makes adaptation a no-op (AdamW scales the weight-decay term
        # by lr too) -> the ensemble stays the pretrained params and the
        # comparison isolates preprocess/inference/export parity
        overrides.update(epochs=1, lr=0.0, patches_to_be_accumulated=1)
        overrides.setdefault("ensemble_count", 1)

    plan, pre_labels, tta_labels = build_plan(
        args.checkpoint, args.tta_data_dir, args.bucket, overrides)

    from dg_tta_tpu.core.labels import generate_label_mapping
    from dg_tta_tpu.tta.driver import tta_main

    label_mapping = generate_label_mapping(pre_labels, tta_labels)
    summaries = tta_main("dice_parity", plan, args.tta_data_dir,
                         Path(args.out), label_mapping)
    if not summaries:
        sys.exit("No labelled cases found — cannot compute Dice. Put "
                 "ground-truth files in labelsTs/labelsTr.")
    # single-bucket runs produce one summary; prefer the requested bucket
    bucket_key = {"imagesTs": "Ts", "imagesTr": "Tr"}.get(args.bucket)
    ours = summaries.get(bucket_key) or next(iter(summaries.values()))
    print(f"ours: foreground_mean Dice = "
          f"{ours['foreground_mean']['Dice']:.4f}")

    if not args.reference_summary:
        return 0
    with open(args.reference_summary) as f:
        ref = json.load(f)
    report = diff_summaries(ours, ref, args.tol)
    report_path = Path(args.out) / "dice_parity" / "parity_report.json"
    report_path.parent.mkdir(parents=True, exist_ok=True)
    with open(report_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"reference: foreground_mean Dice = "
          f"{report['foreground_mean']['reference']:.4f}")
    print(f"max per-class mean |delta| = "
          f"{report['max_class_mean_abs_delta']:.4f} (tol {args.tol})")
    print(f"report -> {report_path}")
    if not report["pass"]:
        print("DICE PARITY FAILED")
        return 1
    print("DICE PARITY OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
