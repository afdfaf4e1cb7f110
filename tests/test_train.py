"""Pretraining subsystem tests: losses, DA, dataset pipeline, mini training
run through the nnUNet results layout."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dg_tta_tpu.train.augment import DAConfig, MULTIRES_ZOOMS, augment_batch
from dg_tta_tpu.train.dataset import (
    PatchSampler,
    fingerprint_dataset,
    make_splits,
    plan_experiment,
    preprocess_dataset,
)
from dg_tta_tpu.train.losses import (
    deep_supervision_weights,
    deep_supervised_loss,
    downsample_target,
    poly_lr,
    soft_dice_ce,
)


def test_soft_dice_ce_perfect_prediction_is_low():
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.integers(0, 3, size=(2, 8, 8, 8)))
    perfect = jax.nn.one_hot(target, 3) * 20.0 - 10.0
    bad = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 3)).astype(np.float32))
    assert float(soft_dice_ce(perfect, target)) < float(soft_dice_ce(bad, target))
    # perfect: dice ~ -1, ce ~ 0
    assert float(soft_dice_ce(perfect, target)) < -0.95


def test_deep_supervision_weights():
    w = deep_supervision_weights(4)
    assert w[-1] == 0.0
    assert abs(sum(w) - 1.0) < 1e-9
    assert w[0] > w[1] > w[2]


def test_downsample_target_preserves_labels():
    t = jnp.asarray(np.random.default_rng(1).integers(0, 5, (1, 16, 16, 16)))
    d = downsample_target(t, (8, 8, 8))
    assert d.shape == (1, 8, 8, 8)
    assert set(np.unique(d)).issubset(set(np.unique(t)))


def test_poly_lr():
    assert poly_lr(1e-2, 0, 100) == 1e-2
    assert poly_lr(1e-2, 99, 100) < 1e-3
    assert poly_lr(1e-2, 50, 100) < poly_lr(1e-2, 10, 100)


def test_augment_batch_shapes_and_gates():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1)).astype(np.float32))
    segs = jnp.asarray(rng.integers(0, 3, size=(2, 16, 16, 16, 1)).astype(np.float32))
    cfg = DAConfig()
    out_i, out_s = jax.jit(
        lambda k, i, s: augment_batch(k, i, s, cfg))(
            jax.random.PRNGKey(0), imgs, segs)
    assert out_i.shape == imgs.shape and out_s.shape == segs.shape
    assert np.all(np.isfinite(np.asarray(out_i)))
    # seg stays integer-valued under nearest sampling
    assert set(np.unique(out_s)).issubset({0.0, 1.0, 2.0})

    # all probabilities zero -> identity (except spatial p=0 too)
    cfg_off = DAConfig(p_rotation=0, p_scale=0, p_noise=0, p_blur=0,
                       p_brightness=0, p_contrast=0, p_lowres=0,
                       p_gamma_invert=0, p_gamma=0)
    out_i, out_s = augment_batch(jax.random.PRNGKey(1), imgs, segs, cfg_off)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(imgs), atol=2e-5)


def test_augment_multires_discrete():
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.normal(size=(4, 12, 12, 12, 1)).astype(np.float32))
    segs = jnp.zeros((4, 12, 12, 12, 1), jnp.float32)
    cfg = DAConfig(discrete_lowres_zooms=MULTIRES_ZOOMS,
                   p_rotation=0, p_scale=0, p_noise=0, p_blur=0,
                   p_brightness=0, p_contrast=0,
                   p_gamma_invert=0, p_gamma=0)
    out_i, _ = augment_batch(jax.random.PRNGKey(3), imgs, segs, cfg)
    assert np.all(np.isfinite(np.asarray(out_i)))


@pytest.fixture
def mini_raw(tmp_path):
    from dg_tta_tpu.data.nifti import write_nifti
    raw = tmp_path / "Dataset903_TrainMini"
    (raw / "imagesTr").mkdir(parents=True)
    (raw / "labelsTr").mkdir()
    with open(raw / "dataset.json", "w") as f:
        json.dump({"labels": {"background": 0, "organ": 1},
                   "channel_names": {"0": "CT"},
                   "file_ending": ".nii.gz"}, f)
    rng = np.random.default_rng(0)
    for i in range(3):
        vol = rng.normal(50, 200, size=(20, 18, 22)).astype(np.float32)
        seg = np.zeros((20, 18, 22), np.uint8)
        seg[5:12, 5:12, 5:12] = 1
        vol[5:12, 5:12, 5:12] += 400
        write_nifti(raw / "imagesTr" / f"case{i}_0000.nii.gz", vol,
                    {"spacing": (1.5, 1.5, 1.5)}, dtype=np.float32)
        write_nifti(raw / "labelsTr" / f"case{i}.nii.gz", seg,
                    {"spacing": (1.5, 1.5, 1.5)})
    return raw


def test_fingerprint_and_plan(mini_raw):
    fp = fingerprint_dataset(mini_raw)
    assert len(fp["spacings"]) == 3
    p = fp["foreground_intensity_properties_per_channel"]["0"]
    assert p["mean"] > 100  # foreground is shifted by +400
    dsj = json.load(open(mini_raw / "dataset.json"))
    plans = plan_experiment(dsj, fp, "Dataset903_TrainMini")
    cfg = plans["configurations"]["3d_fullres"]
    assert cfg["normalization_schemes"] == ["CTNormalization"]
    assert all(p % 16 == 0 for p in cfg["patch_size"])


def test_preprocess_store_and_sampler(mini_raw, tmp_path):
    fp = fingerprint_dataset(mini_raw)
    dsj = json.load(open(mini_raw / "dataset.json"))
    plans = plan_experiment(dsj, fp, "Dataset903_TrainMini")
    store = tmp_path / "store"
    cases = preprocess_dataset(mini_raw, plans, store)
    assert len(cases) == 3
    z = np.load(store / "case0.npz")
    assert z["data"].ndim == 4 and z["seg"].ndim == 4
    assert z["fg_coords"].shape[1] == 3

    splits = make_splits(cases, n_folds=3)
    assert len(splits) == 3
    for s in splits:
        assert set(s["train"]) | set(s["val"]) == set(cases)
        assert not set(s["train"]) & set(s["val"])

    sampler = PatchSampler(store, cases, (16, 16, 16), oversample_fg=1.0)
    imgs, labs = sampler.batch(2)
    assert imgs.shape == (2, 16, 16, 16, 1)
    assert labs.shape == (2, 16, 16, 16, 1)
    # forced-foreground patches must contain foreground
    assert (labs > 0).any(axis=(1, 2, 3, 4)).all()


def test_run_pretraining_mini(mini_raw, tmp_path, monkeypatch):
    monkeypatch.setenv("nnUNet_raw", str(mini_raw.parent))
    monkeypatch.setenv("nnUNet_results", str(tmp_path / "results"))
    monkeypatch.setenv("nnUNet_preprocessed", str(tmp_path / "preprocessed"))
    (tmp_path / "results").mkdir()

    from dg_tta_tpu.train.pretrain import run_pretraining

    # tiny plans to keep CPU compile fast
    fp = fingerprint_dataset(mini_raw)
    dsj = json.load(open(mini_raw / "dataset.json"))
    plans = plan_experiment(dsj, fp, "Dataset903_TrainMini",
                            max_patch=(16, 16, 16))
    cfg = plans["configurations"]["3d_fullres"]
    cfg["UNet_base_num_features"] = 8
    cfg["unet_max_num_features"] = 16
    cfg["n_conv_per_stage_encoder"] = [1, 1]
    cfg["n_conv_per_stage_decoder"] = [1]
    cfg["pool_op_kernel_sizes"] = [[1, 1, 1], [2, 2, 2]]
    cfg["conv_kernel_sizes"] = [[3, 3, 3], [3, 3, 3]]

    out_dir = run_pretraining("903", fold=0,
                              trainer_name="nnUNetTrainer_GIN",
                              num_epochs=2, iters_per_epoch=3,
                              plans=plans, batch_size=2, verbose=False)
    assert (out_dir / "checkpoint_final.npz").is_file()
    assert (out_dir.parent / "plans.json").is_file()
    assert (out_dir.parent / "dataset.json").is_file()
    log = [json.loads(l) for l in open(out_dir / "training_log.jsonl")]
    assert len(log) == 2
    assert np.isfinite(log[-1]["loss"])

    # the produced layout must be consumable by the TTA bundle loader
    from dg_tta_tpu.tta.driver import load_pretrained_bundle
    model, params, plans2, dsj2 = load_pretrained_bundle(
        out_dir / "checkpoint_final.npz")
    assert model.trainer_name == "nnUNetTrainer_GIN"

    # resume path
    out_dir = run_pretraining("903", fold=0,
                              trainer_name="nnUNetTrainer_GIN",
                              num_epochs=3, iters_per_epoch=3,
                              plans=plans, batch_size=2, verbose=False,
                              continue_training=True)
    log = [json.loads(l) for l in open(out_dir / "training_log.jsonl")]
    assert log[-1]["epoch"] == 2
