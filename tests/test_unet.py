"""PlainConvUNet forward + torch-checkpoint converter parity tests.

Builds a torch oracle network with the nnUNet module/state_dict naming scheme
(encoder.stages.N.0.convs.M.{conv,norm}, decoder.{stages,transpconvs,
seg_layers}), converts its state_dict with models/convert.py, and checks the
JAX forward matches the torch forward to float tolerance.
"""

import json
import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from dg_tta_tpu.models.plans import ArchSpec, arch_spec_from_plans, load_plans
from dg_tta_tpu.models.unet import init_unet_params, unet_apply, param_count
from dg_tta_tpu.models.convert import torch_state_dict_to_params

REF_PLANS = (
    "/root/reference/dg_tta/__resources__/dummy_results/"
    "nnUNetTrainer_GIN__nnUNetPlans__3d_fullres/plans.json"
)


# ------------------------------------------------------------- torch oracle

class _TBlock(nn.Module):
    def __init__(self, cin, cout, k, stride):
        super().__init__()
        self.conv = nn.Conv3d(cin, cout, k, stride, padding=k // 2)
        self.norm = nn.InstanceNorm3d(cout, affine=True, eps=1e-5)
        self.nonlin = nn.LeakyReLU(0.01)

    def forward(self, x):
        return self.nonlin(self.norm(self.conv(x)))


class _TStage(nn.Module):
    def __init__(self, blocks):
        super().__init__()
        self.convs = nn.Sequential(*blocks)

    def forward(self, x):
        return self.convs(x)


class _TEncoder(nn.Module):
    def __init__(self, spec):
        super().__init__()
        stages = []
        cin = spec.num_input_channels
        for s in range(spec.n_stages):
            blocks = []
            for ci in range(spec.n_conv_per_stage_encoder[s]):
                stride = spec.strides[s][0] if ci == 0 else 1
                blocks.append(
                    _TBlock(cin if ci == 0 else spec.features_per_stage[s],
                            spec.features_per_stage[s],
                            spec.kernel_sizes[s][0], stride)
                )
                cin = spec.features_per_stage[s]
            # wrap in Sequential to produce the `stages.N.0.convs` key shape
            stages.append(nn.Sequential(_TStage(blocks)))
        self.stages = nn.Sequential(*stages)

    def forward(self, x):
        skips = []
        for st in self.stages:
            x = st(x)
            skips.append(x)
        return skips


class _TDecoder(nn.Module):
    def __init__(self, spec):
        super().__init__()
        f = spec.features_per_stage
        n_dec = spec.n_stages - 1
        self.transpconvs = nn.ModuleList()
        self.stages = nn.ModuleList()
        self.seg_layers = nn.ModuleList()
        for d in range(n_dec):
            below = f[spec.n_stages - 1 - d]
            here = f[spec.n_stages - 2 - d]
            stride = spec.strides[spec.n_stages - 1 - d][0]
            self.transpconvs.append(
                nn.ConvTranspose3d(below, here, stride, stride)
            )
            k = spec.kernel_sizes[spec.n_stages - 2 - d][0]
            blocks = [
                _TBlock(2 * here if ci == 0 else here, here, k, 1)
                for ci in range(spec.n_conv_per_stage_decoder[d])
            ]
            self.stages.append(_TStage(blocks))
            self.seg_layers.append(nn.Conv3d(here, spec.num_classes, 1))

    def forward(self, skips, deep_supervision):
        lres = skips[-1]
        outs = []
        for d in range(len(self.stages)):
            up = self.transpconvs[d](lres)
            x = torch.cat([up, skips[-(d + 2)]], dim=1)
            lres = self.stages[d](x)
            if deep_supervision:
                outs.append(self.seg_layers[d](lres))
        if deep_supervision:
            return outs[::-1]
        return self.seg_layers[-1](lres)


class _TUNet(nn.Module):
    def __init__(self, spec):
        super().__init__()
        self.encoder = _TEncoder(spec)
        self.decoder = _TDecoder(spec)

    def forward(self, x, deep_supervision=False):
        return self.decoder(self.encoder(x), deep_supervision)


SMALL_SPEC = ArchSpec(
    features_per_stage=(8, 16, 32),
    kernel_sizes=((3, 3, 3),) * 3,
    strides=((1, 1, 1), (2, 2, 2), (2, 2, 2)),
    n_conv_per_stage_encoder=(2, 2, 2),
    n_conv_per_stage_decoder=(2, 2),
    num_input_channels=1,
    num_classes=4,
)


@pytest.fixture(scope="module")
def torch_net():
    torch.manual_seed(0)
    net = _TUNet(SMALL_SPEC)
    net.eval()
    return net


def test_forward_matches_torch(torch_net, rng):
    x = rng.standard_normal((2, 1, 16, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = torch_net(torch.from_numpy(x)).numpy()

    params = torch_state_dict_to_params(torch_net.state_dict())
    x_cl = jnp.asarray(np.moveaxis(x, 1, -1))
    ours = np.asarray(unet_apply(params, x_cl, SMALL_SPEC))
    np.testing.assert_allclose(np.moveaxis(ours, -1, 1), ref, atol=2e-4)


def test_deep_supervision_matches_torch(torch_net, rng):
    x = rng.standard_normal((1, 1, 16, 16, 16)).astype(np.float32)
    with torch.no_grad():
        refs = torch_net(torch.from_numpy(x), deep_supervision=True)

    params = torch_state_dict_to_params(torch_net.state_dict())
    outs = unet_apply(params, jnp.asarray(np.moveaxis(x, 1, -1)), SMALL_SPEC,
                      deep_supervision=True)
    assert len(outs) == len(refs) == 2
    for o, r in zip(outs, refs):
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(o), -1, 1), r.numpy(), atol=2e-4
        )
    # highest resolution first
    assert outs[0].shape[1] == 16 and outs[1].shape[1] == 8


def test_converter_handles_prefixes(torch_net):
    sd = {"_orig_mod." + k: v for k, v in torch_net.state_dict().items()}
    params = torch_state_dict_to_params(sd)
    assert len(params["encoder"]["stages"]) == 3


def test_init_params_shapes_match_converted(torch_net):
    converted = torch_state_dict_to_params(torch_net.state_dict())
    inited = init_unet_params(jax.random.PRNGKey(0), SMALL_SPEC)
    conv_shapes = [p.shape for p in jax.tree.leaves(converted)]
    init_shapes = [p.shape for p in jax.tree.leaves(inited)]
    assert conv_shapes == init_shapes


def test_flagship_spec_from_reference_plans():
    plans = load_plans(REF_PLANS)
    spec = arch_spec_from_plans(plans, num_input_channels=1, num_classes=105)
    assert spec.n_stages == 5
    assert spec.features_per_stage == (32, 64, 128, 256, 320)
    assert spec.strides[0] == (1, 1, 1) and spec.strides[4] == (2, 2, 2)
    params = init_unet_params(jax.random.PRNGKey(0), spec)
    n = param_count(params)
    # the 5-stage 32..320 plans spec works out to ~16.6M parameters
    assert 15e6 < n < 20e6


def test_bf16_compute_close_to_f32():
    params = init_unet_params(jax.random.PRNGKey(0), SMALL_SPEC)
    x = jnp.asarray(
        np.random.default_rng(0).normal(
            size=(1, 16, 16, 16, SMALL_SPEC.num_input_channels))
        .astype(np.float32))
    f32 = unet_apply(params, x, SMALL_SPEC)
    bf16 = unet_apply(params, x, SMALL_SPEC, compute_dtype=jnp.bfloat16)
    assert bf16.dtype == jnp.bfloat16  # logits stay in compute dtype
    bf16 = bf16.astype(jnp.float32)
    rel = np.abs(np.asarray(f32) - np.asarray(bf16)).max() / (
        np.abs(np.asarray(f32)).max() + 1e-8)
    assert rel < 0.05, rel


def test_torch_state_dict_roundtrip(torch_net):
    from dg_tta_tpu.models.convert import (
        params_to_torch_state_dict,
        torch_state_dict_to_params,
    )
    params = torch_state_dict_to_params(torch_net.state_dict())
    sd = params_to_torch_state_dict(params)
    params2 = torch_state_dict_to_params(
        {k: np.asarray(v) for k, v in sd.items()})
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # exported names match the torch module's own keys
    ref_keys = {k for k in torch_net.state_dict().keys()}
    assert set(sd.keys()) == ref_keys


def test_stage_conv_bias_invariance():
    """Stage-conv biases are exact no-ops: conv->InstanceNorm cancels a
    per-channel uniform shift (PARITY.md round 3o), so the forward must be
    BIT-identical under arbitrary stage-conv bias values, for the z-tap and
    the z-packed formulations alike.  Head biases must still matter."""
    import os
    from dg_tta_tpu.models.unet_zpack import unet_apply_zpack

    params = init_unet_params(jax.random.PRNGKey(0), SMALL_SPEC)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 16, 16, 16, 1)).astype(np.float32))

    def scrambled(params, include_heads):
        k = [jax.random.PRNGKey(99)]

        def visit(p, path=""):
            if isinstance(p, dict):
                return {n: visit(v, f"{path}/{n}") for n, v in p.items()}
            if isinstance(p, (list, tuple)):
                return type(p)(visit(v, f"{path}/{i}")
                               for i, v in enumerate(p))
            touch = (path.endswith("/b")
                     and ("seg_layers" in path) == include_heads
                     and ("conv/b" in path or "seg_layers" in path))
            if touch:
                k[0], sub = jax.random.split(k[0])
                return p + jax.random.normal(sub, p.shape, p.dtype)
            return p

        return visit(params)

    ref = unet_apply(params, x, SMALL_SPEC)
    got = unet_apply(scrambled(params, False), x, SMALL_SPEC)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    os.environ["DGTTA_UNET_ZPACK"] = "1"
    try:
        refz = unet_apply_zpack(params, x, SMALL_SPEC)
        gotz = unet_apply_zpack(scrambled(params, False), x, SMALL_SPEC)
        np.testing.assert_array_equal(np.asarray(refz), np.asarray(gotz))
    finally:
        del os.environ["DGTTA_UNET_ZPACK"]

    # head biases are NOT dead: scrambling them must change the logits
    head = unet_apply(scrambled(params, True), x, SMALL_SPEC)
    assert float(jnp.max(jnp.abs(head - ref))) > 1e-3
