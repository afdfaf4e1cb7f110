"""Model bundle: architecture spec + input-pipeline flags per trainer family.

Replaces the reference's trainer-injection + forward-pre-hook machinery
(/root/reference/dg_tta/__build__.py, pretraining/nnUNetTrainer_*.py) with an
explicit registry and functional composition: a trainer name declares whether
GIN runs as an *internal* augmentation (pretraining only, gated off at TTA,
mirroring the DG_TTA_INTERNAL_AUGMENTATION env gate) and whether the MIND
descriptor is a permanent part of the model's input transform (active at TTA
and inference, mirroring the unconditional mind_hook, mind.py:167-168).
"""

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dg_tta_tpu.models.plans import (
    ArchSpec,
    arch_spec_from_plans,
    num_classes_from_dataset_json,
    patch_size_from_plans,
)
from dg_tta_tpu.models.unet import unet_apply, init_unet_params
from dg_tta_tpu.models.unet_fold import unet_apply_folded, foldable
from dg_tta_tpu.models.unet_zpack import unet_apply_zpack
from dg_tta_tpu.ops.gin import gin_aug
from dg_tta_tpu.ops.mind import mind3d, MIND_OUT_CHANNELS


def _use_folded_unet(spec) -> bool:
    """Route the U-Net through the folded (z-into-H) formulation.

    OPT-IN ONLY (DGTTA_UNET_FOLD=1): on-chip measurement (PERF.md r3g,
    tools/probe_fold.py) showed the tall folded image runs the convs ~3x
    slower than the batched z-tap decomposition — the layout copies it
    removes are cheaper than the conv-shape it creates.  Kept for layout
    experiments; never auto-selected.
    """
    import os
    return os.environ.get("DGTTA_UNET_FOLD", "0") == "1" and foldable(spec)


def formulation_key(spec) -> tuple:
    """Everything env-routed that changes the TRACED model program
    (apply reads these at trace time).  Any cache of traced/jitted model
    programs (engine._TTA_FNS_CACHE, engine split_cache) must include this
    key, or an env flip mid-process silently reuses stale programs.
    Includes the warp-routing envs too (read at closure-build time in
    engine.make_tta_functions / ops.warp_pallas.warp_flat_auto)."""
    import os
    env = os.environ.get
    return (_use_folded_unet(spec), _use_zpack_unet(),
            env("DGTTA_ZPACK_CROSS", "convs"),
            env("DGTTA_ZPACK_MAXLANES", "128"),
            env("DGTTA_ZPACK_MAXG", "2"),
            env("DGTTA_AFFINE_SHEAR", "auto"),
            env("DGTTA_SHEAR_BAND", "auto"),
            env("DGTTA_REL_FRAME", "auto"),
            env("DGTTA_DISP_SHEAR", "auto"),
            env("DGTTA_DISP_HALFRES", "auto"),
            env("DGTTA_WARP_IMPL", "auto"),
            env("DGTTA_PALLAS_WARP", "1"),
            env("DGTTA_PALLAS_STAGE_LIMIT", "4"),
            env("DGTTA_CONV_WGRAD", "auto"))


def _use_zpack_unet() -> bool:
    """Route stride-1 stage convs through the z-packed-channels carrier
    (models/unet_zpack.py): G z-slices folded into lanes so the C=32/64
    stages run dense 128-channel 2D convs at full MXU width instead of
    1/16-width z-tap convs wrapped in per-conv layout copies.

    DGTTA_UNET_ZPACK: 1 = on, 0 = off, auto (default) = on for the TPU
    backend.  Measured on the v5e (PERF.md round 3k): G=2 z-pack runs the
    full member program 21% faster than the z-tap baseline (30.1 vs 38.3
    s/member), exact math pinned by tests/test_unet_zpack.py.
    """
    import os
    v = os.environ.get("DGTTA_UNET_ZPACK", "auto")
    if v in ("1", "0"):
        return v == "1"
    import jax
    return jax.default_backend() == "tpu"

# trainer name -> (internal GIN at pretraining, MIND descriptor always)
TRAINER_REGISTRY = {
    "nnUNetTrainer": (False, False),
    "nnUNetTrainer_GIN": (True, False),
    "nnUNetTrainer_MIND": (False, True),
    "nnUNetTrainer_GIN_MIND": (True, True),
    "nnUNetTrainer_GIN_MultiRes": (True, False),
    "nnUNetTrainer_MIND_MultiRes": (False, True),
    "nnUNetTrainer_GIN_MIND_MultiRes": (True, True),
}

MULTIRES_TRAINERS = {t for t in TRAINER_REGISTRY if t.endswith("_MultiRes")}


@dataclasses.dataclass(frozen=True)
class Model:
    """Static model description; apply() is pure and jit-friendly."""

    spec: ArchSpec
    patch_size: Tuple[int, int, int]
    trainer_name: str
    uses_gin_internal: bool
    uses_mind: bool
    mind_noise_scale: float = 0.05  # reference keeps noise on at inference
    compute_dtype: Optional[str] = None  # e.g. "bfloat16"; None = float32

    def apply(self, params, x, key=None, deep_supervision: bool = False,
              internal_aug: bool = False, head_channel_idx=None):
        """Forward pass including the trainer's input transforms.

        Args:
          x: (B, D, H, W, C_img) channels-last image.
          key: PRNG key; required when internal_aug (GIN) or MIND noise runs.
          internal_aug: True during DG pretraining (GIN active); False at
            TTA/inference -- the reference's env-var gate.
        """
        k_gin = k_mind = None
        if key is not None:
            k_gin, k_mind = jax.random.split(key)
        if internal_aug and self.uses_gin_internal:
            assert k_gin is not None, "GIN internal augmentation needs a key"
            x = gin_aug(k_gin, x)
        if self.uses_mind:
            x = mind3d(x, key=k_mind, noise_scale=self.mind_noise_scale)
        if _use_folded_unet(self.spec):
            return unet_apply_folded(params, x, self.spec,
                                     deep_supervision=deep_supervision,
                                     compute_dtype=self.compute_dtype,
                                     head_channel_idx=head_channel_idx)
        if _use_zpack_unet():
            return unet_apply_zpack(params, x, self.spec,
                                    deep_supervision=deep_supervision,
                                    compute_dtype=self.compute_dtype,
                                    head_channel_idx=head_channel_idx)
        return unet_apply(params, x, self.spec,
                          deep_supervision=deep_supervision,
                          compute_dtype=self.compute_dtype,
                          head_channel_idx=head_channel_idx)

    def init_params(self, key, dtype=jnp.float32):
        return init_unet_params(key, self.spec, dtype)


def build_model(plans: dict, dataset_json: dict, trainer_name: str,
                configuration: str = "3d_fullres",
                mind_noise_scale: float = 0.05) -> Model:
    """Build the Model for a trainer/plans/dataset triple (the TPU analog of
    nnUNet's get_network_from_plans call in the reference trainers)."""
    gin_flag, mind_flag = TRAINER_REGISTRY[trainer_name]
    num_classes = num_classes_from_dataset_json(dataset_json)
    n_img_channels = len(dataset_json.get("channel_names",
                                          dataset_json.get("modality", {"0": "CT"})))
    in_ch = MIND_OUT_CHANNELS if mind_flag else n_img_channels
    spec = arch_spec_from_plans(
        plans, configuration,
        num_input_channels=in_ch,
        num_classes=num_classes,
    )
    return Model(
        spec=spec,
        patch_size=tuple(patch_size_from_plans(plans, configuration)),
        trainer_name=trainer_name,
        uses_gin_internal=gin_flag,
        uses_mind=mind_flag,
        mind_noise_scale=mind_noise_scale,
    )
