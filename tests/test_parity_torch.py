"""End-to-end numerical parity vs a torch oracle of the reference pipeline.

Reconstructs the reference's TTA computation in torch (the oracle U-Net from
tests/test_unet.py with nnUNet state_dict naming + the exact branch/loss
formulas of /root/reference/dg_tta/tta/tta.py:480-579, tta.py:262-279,
torch_utils.py:90-117) and asserts the JAX engine produces the same TTA-step
loss and the same final sliding-window segmentation/Dice with identical
weights, stochastic parts disabled (GIN off, MIND absent) and fixed warps
injected into both sides.

Also fabricates a full nnUNet-style checkpoint_final.pth (network_weights +
optimizer/epoch keys, the contract load_network consumes via
nnunet_utils.py:88-113) and loads it through load_pretrained_bundle.
"""

import json

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dg_tta_tpu.models.convert import torch_state_dict_to_params
from dg_tta_tpu.models.network import Model
from dg_tta_tpu.tta.plan import TTAPlan
from tests.test_unet import SMALL_SPEC, _TUNet

PATCH = (16, 16, 16)
MAP_IDXS = np.array([0, 2, 3], dtype=np.int32)  # optimized-label gather


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(3)
    net = _TUNet(SMALL_SPEC)
    net.eval()
    params = torch_state_dict_to_params(net.state_dict())
    model = Model(spec=SMALL_SPEC, patch_size=PATCH,
                  trainer_name="nnUNetTrainer_GIN",
                  uses_gin_internal=True, uses_mind=False)
    return net, model, params


def _fixed_affine():
    """A deterministic near-identity affine + its exact inverse, (1, 3, 4)."""
    rng = np.random.default_rng(11)
    mat = np.eye(3) + 0.05 * rng.standard_normal((3, 3))
    t = 0.03 * rng.standard_normal((3,))
    inv = np.linalg.inv(mat)
    theta = np.concatenate([mat, t[:, None]], 1)[None].astype(np.float32)
    theta_inv = np.concatenate([inv, (-inv @ t)[:, None]], 1)[None] \
        .astype(np.float32)
    return theta, theta_inv


def torch_calc_branch(net, imgs, theta, theta_inv, map_idxs):
    """Reference calc_branch (tta.py:517-579) with GIN disabled: affine warp
    (border pad), forward, map_label channel gather, inverse warp (zero
    pad)."""
    B = imgs.shape[0]
    size = (B, 1, *PATCH)
    grid = F.affine_grid(torch.from_numpy(theta).expand(B, 3, 4), size,
                         align_corners=False)
    imgs_aug = F.grid_sample(imgs, grid, padding_mode="border",
                             align_corners=False)
    with torch.no_grad():
        logits = net(imgs_aug)
    logits = logits[:, torch.from_numpy(map_idxs).long()]  # map_label logits
    grid_inv = F.affine_grid(torch.from_numpy(theta_inv).expand(B, 3, 4),
                             size, align_corners=False)
    return F.grid_sample(logits, grid_inv, align_corners=False)


def torch_consistency_loss(target_a, target_b, start_class=1):
    """tta.py:262-269 + torch_utils.py:90-104 (no eps, by design)."""
    mask = ((target_a.sum(1, keepdim=True) > 0).float()
            * (target_b.sum(1, keepdim=True) > 0).float())
    sm_a = target_a.softmax(1) * mask
    sm_b = target_b.softmax(1) * mask
    B, _, D, H, W = sm_a.shape
    nom = (2.0 * sm_a * sm_b).reshape(B, -1, D * H * W).mean(2)
    den = 0.5 * ((sm_a + sm_b) ** 2).reshape(B, -1, D * H * W).mean(2)
    dice = (nom * 0.0) + 1.0 if den.sum() == 0.0 else nom / den
    return 1 - dice[:, start_class:].mean()


def test_tta_step_loss_matches_reference(oracle, monkeypatch):
    """The engine's two-branch consistency loss == the reference formula,
    with identical weights, fixed patch, fixed warps (branch_a warped with
    theta_a, branch_b with theta_b — do_spatial_aug_in='both')."""
    net, model, params = oracle
    rng = np.random.default_rng(4)
    patch = rng.standard_normal((1, *PATCH, 1)).astype(np.float32) * 0.5

    theta_a, theta_a_inv = _fixed_affine()
    rng2 = np.random.default_rng(12)
    mat_b = np.eye(3) + 0.04 * rng2.standard_normal((3, 3))
    inv_b = np.linalg.inv(mat_b)
    theta_b = np.concatenate([mat_b, np.zeros((3, 1))], 1)[None] \
        .astype(np.float32)
    theta_b_inv = np.concatenate([inv_b, np.zeros((3, 1))], 1)[None] \
        .astype(np.float32)

    # ---- torch reference ------------------------------------------------
    imgs_t = torch.from_numpy(np.moveaxis(patch, -1, 1))
    ta = torch_calc_branch(net, imgs_t, theta_a, theta_a_inv, MAP_IDXS)
    tb = torch_calc_branch(net, imgs_t, theta_b, theta_b_inv, MAP_IDXS)
    ref_loss = float(torch_consistency_loss(ta, tb))

    # ---- JAX engine with the same warps/patch injected -------------------
    import dg_tta_tpu.tta.engine as engine

    thetas = iter([(jnp.asarray(theta_a), jnp.asarray(theta_a_inv)),
                   (jnp.asarray(theta_b), jnp.asarray(theta_b_inv))])
    monkeypatch.setattr(engine, "get_rand_affine",
                        lambda k, B: next(thetas))
    monkeypatch.setattr(engine, "extract_batch",
                        lambda *a, **kw: (jnp.asarray(patch), None))

    plan = TTAPlan(epochs=1, patches_to_be_accumulated=1, batch_size=1,
                   intensity_aug_function="disabled",
                   do_spatial_aug_in="both")
    fns = engine.make_tta_functions(model, plan, MAP_IDXS, MAP_IDXS)
    vols = jnp.zeros((1, *PATCH, 1))
    shapes = jnp.asarray([[16.0, 16.0, 16.0]])
    loss = float(fns.epoch_fwd(params, jax.random.PRNGKey(0), vols, shapes))

    assert abs(loss - ref_loss) < 2e-4, (loss, ref_loss)


def test_sliding_window_dice_matches_reference(oracle):
    """Full inference parity: our jitted sliding-window predictor vs the
    reference's Gaussian-weighted accumulation (nnUNet semantics) computed
    with the torch net — argmaxed segmentations must agree and per-class
    Dice vs a synthetic GT must match."""
    from dg_tta_tpu.core.losses import dice_coeff as jax_dice
    from dg_tta_tpu.infer.sliding_window import (
        compute_gaussian,
        predict_volume,
        window_origins,
    )

    net, model, params = oracle
    rng = np.random.default_rng(5)
    shape = (22, 18, 20)
    vol = (rng.standard_normal((*shape, 1)) * 0.5).astype(np.float32)
    vol[4:12, 4:12, 4:12] += 2.0

    stacked = jax.tree.map(lambda p: p[None], params)
    ours = predict_volume(model, stacked, jnp.asarray(vol), bucket_multiple=1)
    seg_ours = np.argmax(np.asarray(ours), axis=-1)

    # torch oracle accumulation over the same window grid
    g = compute_gaussian(PATCH)
    acc = np.zeros((*shape, SMALL_SPEC.num_classes), np.float32)
    wacc = np.zeros((*shape, 1), np.float32)
    origins, valid = window_origins(shape, PATCH)
    for (z, y, x), v in zip(origins, valid):
        if not v:
            continue
        p = vol[z:z + 16, y:y + 16, x:x + 16]
        with torch.no_grad():
            out = net(torch.from_numpy(np.moveaxis(p, -1, 0)[None]))
        out = np.moveaxis(out.numpy()[0], 0, -1)
        acc[z:z + 16, y:y + 16, x:x + 16] += out * g[..., None]
        wacc[z:z + 16, y:y + 16, x:x + 16] += g[..., None]
    seg_ref = np.argmax(acc / wacc, axis=-1)

    agree = (seg_ours == seg_ref).mean()
    assert agree > 0.999, agree

    # Dice vs synthetic GT, reference dice_coeff formula
    # (torch_utils.py:107-117) against ours
    gt = np.zeros(shape, np.int32)
    gt[4:12, 4:12, 4:12] = 2
    d_ref = []
    for label in range(1, SMALL_SPEC.num_classes):
        i = (seg_ref == label).astype(np.float64).ravel()
        t = (gt == label).astype(np.float64).ravel()
        d_ref.append(2.0 * (i * t).mean() / (1e-8 + i.mean() + t.mean()))
    d_ours = np.asarray(jax_dice(jnp.asarray(seg_ours)[None],
                                 jnp.asarray(gt)[None],
                                 SMALL_SPEC.num_classes))  # classes 1..C-1
    np.testing.assert_allclose(np.nan_to_num(d_ours), d_ref, atol=1e-3)


def test_fabricated_nnunet_checkpoint_loads(oracle, tmp_path):
    """A full nnUNet-style checkpoint dict (network_weights + optimizer state
    + metadata, the keys nnUNetTrainer.save_checkpoint writes) converts
    through load_pretrained_bundle and reproduces the torch forward."""
    net, model, _ = oracle
    sd = net.state_dict()
    ckpt = {
        "network_weights": sd,
        "optimizer_state": {"state": {}, "param_groups": [
            {"lr": 1e-2, "momentum": 0.99, "nesterov": True}]},
        "grad_scaler_state": None,
        "logging": {},
        "_best_ema": 0.0,
        "current_epoch": 150,
        "init_args": {"plans": {}, "configuration": "3d_fullres"},
        "trainer_name": "nnUNetTrainer_GIN",
        "inference_allowed_mirroring_axes": None,
    }
    model_dir = tmp_path / "nnUNetTrainer_GIN__nnUNetPlans__3d_fullres"
    (model_dir / "fold_0").mkdir(parents=True)
    torch.save(ckpt, model_dir / "fold_0" / "checkpoint_final.pth")
    plans = {
        "dataset_name": "DatasetX",
        "plans_name": "nnUNetPlans",
        "transpose_forward": [0, 1, 2],
        "transpose_backward": [0, 1, 2],
        "foreground_intensity_properties_per_channel": {
            "0": {"mean": 0.0, "std": 1.0,
                  "percentile_00_5": -3.0, "percentile_99_5": 3.0}},
        "configurations": {"3d_fullres": {
            "patch_size": list(PATCH),
            "spacing": [1.5, 1.5, 1.5],
            "normalization_schemes": ["CTNormalization"],
            "use_mask_for_norm": [False],
            "UNet_base_num_features": SMALL_SPEC.features_per_stage[0],
            "unet_max_num_features": SMALL_SPEC.features_per_stage[-1],
            "n_conv_per_stage_encoder": list(
                SMALL_SPEC.n_conv_per_stage_encoder),
            "n_conv_per_stage_decoder": list(
                SMALL_SPEC.n_conv_per_stage_decoder),
            "pool_op_kernel_sizes": [list(s) for s in SMALL_SPEC.strides],
            "conv_kernel_sizes": [list(k) for k in SMALL_SPEC.kernel_sizes],
        }},
    }
    labels = {"background": 0, "a": 1, "b": 2, "c": 3}
    json.dump(plans, open(model_dir / "plans.json", "w"))
    json.dump({"labels": labels, "channel_names": {"0": "CT"},
               "file_ending": ".nii.gz"}, open(model_dir / "dataset.json", "w"))

    from dg_tta_tpu.tta.driver import load_pretrained_bundle
    model2, params2, _, _ = load_pretrained_bundle(
        model_dir / "fold_0" / "checkpoint_final.pth")
    assert model2.spec.num_classes == 4

    x = np.random.default_rng(6).standard_normal(
        (1, 1, *PATCH)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    ours = np.asarray(model2.apply(params2, jnp.asarray(np.moveaxis(x, 1, -1))))
    np.testing.assert_allclose(np.moveaxis(ours, -1, 1), ref, atol=2e-4)
