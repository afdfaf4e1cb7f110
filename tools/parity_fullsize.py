"""Full-size forward parity vs the torch oracle (verdict r2 item 4a).

Builds the flagship TS104-spec PlainConvUNet (16.6M params) in BOTH stacks —
the torch oracle from tests/test_unet.py (nnUNet naming) and the JAX model —
converts the torch weights, runs ONE full-size 112x112x128 patch on CPU, and
reports logits max-abs/rel error.  Slow (minutes on CPU); run as a tool, the
result is recorded in PARITY.md.

Ref: /root/reference/dg_tta/tta/tta.py:262-338 (the pipeline whose quality
these logits feed) and nnunet_utils.py:88-113 (weights contract).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from dg_tta_tpu.models.convert import torch_state_dict_to_params
    from dg_tta_tpu.models.network import build_model
    from tests.test_unet import _TUNet

    base = ("/root/reference/dg_tta/__resources__/dummy_results/"
            "nnUNetTrainer_GIN__nnUNetPlans__3d_fullres")
    plans = json.load(open(f"{base}/plans.json"))
    dsj = json.load(open(f"{base}/dataset.json"))
    model = build_model(plans, dsj, "nnUNetTrainer_GIN")
    spec = model.spec
    print(f"spec: {spec.features_per_stage} classes={spec.num_classes} "
          f"patch={model.patch_size}", flush=True)

    torch.manual_seed(0)
    net = _TUNet(spec)
    net.eval()
    n_par = sum(p.numel() for p in net.parameters())
    print(f"torch params: {n_par/1e6:.1f}M", flush=True)
    params = torch_state_dict_to_params(net.state_dict())

    rng = np.random.default_rng(0)
    patch = rng.standard_normal((1, *model.patch_size, 1)).astype(np.float32)

    t0 = time.perf_counter()
    with torch.no_grad():
        ref = net(torch.from_numpy(
            np.moveaxis(patch, -1, 1))).numpy()  # (1, C, D, H, W)
    print(f"torch fwd: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    got = np.asarray(model.apply(params, jnp.asarray(patch)))
    got = np.moveaxis(got, -1, 1)
    print(f"jax fwd:  {time.perf_counter()-t0:.1f}s", flush=True)

    err = np.abs(ref - got)
    scale = np.abs(ref).max()
    print(json.dumps({
        "patch": list(model.patch_size),
        "classes": int(spec.num_classes),
        "max_abs_err": float(err.max()),
        "logits_scale": float(scale),
        "max_rel_err": float(err.max() / scale),
        "argmax_agree": float((ref.argmax(1) == got.argmax(1)).mean()),
    }), flush=True)


if __name__ == "__main__":
    main()
