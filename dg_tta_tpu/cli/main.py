"""The `dgtta` command-line program.

Same subcommand surface as the reference's DGTTAProgram
(/root/reference/dg_tta/run.py:33-221): inject_trainers / pretrain /
prepare_tta / run_tta.  `inject_trainers` is a no-op here — trainers live in
an explicit registry (models/network.py) instead of being copied into an
installed package tree.
"""

import argparse
import json
import os
import secrets
import sys
import time
from pathlib import Path


def _cmd_inject_trainers(args):
    from dg_tta_tpu.models.network import TRAINER_REGISTRY
    print("Nothing to inject: DG trainers are a built-in registry "
          "(no nnUNet package patching needed).")
    print("Available trainers:")
    for name in TRAINER_REGISTRY:
        print(f"  {name}")
    if args.num_epochs is not None:
        print(f"(pretraining epochs are passed at `dgtta pretrain` time; "
              f"requested default {args.num_epochs})")


def _cmd_pretrain(args):
    from dg_tta_tpu.train.pretrain import run_pretraining
    run_pretraining(
        dataset_id=args.dataset_id,
        configuration=args.configuration,
        fold=args.fold,
        trainer_name=args.trainer,
        num_epochs=args.num_epochs,
        val_iters_per_epoch=args.val_iters_per_epoch,
        num_devices=args.num_devices,
        plans_name=args.plans_name,
        continue_training=args.continue_training,
    )


def _cmd_prepare_tta(args):
    from dg_tta_tpu.tta.config import prepare_tta
    from dg_tta_tpu.utils.paths import check_dga_root_is_set
    check_dga_root_is_set()
    prepare_tta(
        pretrained_dataset_id=args.pretrained_dataset_id,
        tta_dataset_id=args.tta_dataset_id,
        pretrainer=args.pretrainer,
        pretrainer_config=args.pretrainer_config,
        pretrainer_fold=args.pretrainer_fold,
        tta_dataset_bucket=args.tta_dataset_bucket,
    )


def _cmd_run_tta(args):
    from dg_tta_tpu.core.labels import generate_label_mapping
    from dg_tta_tpu.tta.config import (
        check_dataset_pretrain_config,
        get_tta_folders,
        load_current_modifier_functions,
    )
    from dg_tta_tpu.tta.driver import tta_main
    from dg_tta_tpu.tta.plan import TTAPlan
    from dg_tta_tpu.utils.paths import check_dga_root_is_set

    check_dga_root_is_set()
    (pre_id, pretrainer, pretrainer_config, pretrainer_fold) = \
        check_dataset_pretrain_config(args.pretrained_dataset_id,
                                      args.pretrainer, args.pretrainer_config,
                                      args.pretrainer_fold)
    (tta_data_dir, plan_dir, results_dir, pre_name, tta_name) = \
        get_tta_folders(pre_id, args.tta_dataset_id, pretrainer,
                        pretrainer_config, pretrainer_fold)

    plan_path = plan_dir / "tta_plan.json"
    if not plan_path.is_file():
        sys.exit(f"No tta_plan.json in {plan_dir}. Run `dgtta prepare_tta` "
                 f"first.")
    plan = TTAPlan.load(plan_path)

    with open(plan_dir / f"{pre_name}_label_mapping.json") as f:
        pre_classes = json.load(f)
    with open(plan_dir / f"{tta_name}_label_mapping.json") as f:
        tta_classes = json.load(f)
    label_mapping = generate_label_mapping(pre_classes, tta_classes)

    modifier_mod = load_current_modifier_functions(plan_dir)

    # {timestamp}_{nonce}-{run_no} (run.py:167-176 uses randomname)
    run_no = args.run_no
    existing = sorted(results_dir.glob("*-???"))
    if run_no is None:
        run_name = (time.strftime("%Y%m%d__%H_%M_%S") +
                    f"_{secrets.token_hex(3)}-000")
    else:
        matches = [p for p in existing if p.name.endswith(f"-{run_no:03d}")]
        if not matches:
            sys.exit(f"No existing run with number {run_no} in {results_dir}")
        run_name = matches[-1].name

    from dg_tta_tpu.obs.wandb_log import wandb_run
    wandb_run(
        "dg_tta", lambda run_name, plan, **kw: tta_main(run_name, plan, **kw),
        run_name=run_name, plan=plan, tta_data_dir=tta_data_dir,
        save_base_path=results_dir, label_mapping=label_mapping,
        modifier_fn_module=modifier_mod)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="dgtta",
        description=("DG-TTA for TPU: domain-generalized pretraining and "
                     "test-time adaptation for 3D medical segmentation "
                     "(JAX/XLA)."))
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("inject_trainers",
                       help="No-op compatibility command (trainer registry "
                            "is built in)")
    p.add_argument("--num_epochs", type=int, default=None)
    p.set_defaults(fn=_cmd_inject_trainers)

    p = sub.add_parser("pretrain", help="Run DG pretraining")
    p.add_argument("dataset_id", help="nnUNet dataset id or name")
    p.add_argument("configuration", nargs="?", default="3d_fullres")
    p.add_argument("fold", nargs="?", default="0")
    p.add_argument("-tr", "--trainer", default="nnUNetTrainer_GIN")
    p.add_argument("--num_epochs", type=int, default=1000)
    p.add_argument("--val_iters_per_epoch", type=int, default=50,
                   help="Validation iterations per epoch (nnUNet default 50)")
    p.add_argument("--num_devices", "-num_gpus", type=int, default=1,
                   help="Data-parallel devices (the nnUNet -num_gpus analog)")
    p.add_argument("-p", "--plans_name", default="nnUNetPlans",
                   help="Plans identifier (nnUNet -p passthrough, "
                        "run.py:64-69)")
    p.add_argument("--c", dest="continue_training", action="store_true")
    p.set_defaults(fn=_cmd_pretrain)

    p = sub.add_parser("prepare_tta", help="Prepare plan dir for TTA")
    p.add_argument("pretrained_dataset_id",
                   help="TS104_* alias or numeric dataset id")
    p.add_argument("tta_dataset_id", help="Target dataset id")
    p.add_argument("--pretrainer", default=None)
    p.add_argument("--pretrainer_config", default=None)
    p.add_argument("--pretrainer_fold", default=None)
    p.add_argument("--tta_dataset_bucket", default="imagesTs",
                   choices=["imagesTr", "imagesTs", "imagesTrAndTs"])
    p.set_defaults(fn=_cmd_prepare_tta)

    p = sub.add_parser("run_tta", help="Run test-time adaptation")
    p.add_argument("pretrained_dataset_id")
    p.add_argument("tta_dataset_id")
    p.add_argument("--pretrainer", default=None)
    p.add_argument("--pretrainer_config", default=None)
    p.add_argument("--pretrainer_fold", default=None)
    p.add_argument("--run_no", type=int, default=None,
                   help="Resume an existing run number")
    p.set_defaults(fn=_cmd_run_tta)

    return parser


def _enable_compile_cache():
    """Persistent XLA compile cache: full-size TTA programs take ~10 min to
    compile; cached reruns skip that entirely."""
    if os.environ.get("DGTTA_COMPILE_CACHE", "1") != "1":
        return
    import jax
    cache = os.environ.get(
        "DGTTA_COMPILE_CACHE_DIR",
        str(Path.home() / ".cache" / "dg_tta_tpu" / "xla"))
    Path(cache).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.command in ("run_tta", "pretrain"):
        _enable_compile_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
