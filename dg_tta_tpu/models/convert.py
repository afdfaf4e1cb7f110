"""torch -> JAX checkpoint conversion for nnUNet-v2 PlainConvUNet weights.

Consumes either a raw state_dict or a full nnUNet `checkpoint_final.pth` dict
(key 'network_weights'), as produced by the pretraining the reference relies
on (/root/reference/dg_tta/tta/nnunet_utils.py:88-113 loads these through
nnUNetPredictor).  Emits the channels-last param pytree of models/unet.py.

Weight-layout moves:
  Conv3d          (O, I, kd, kh, kw) -> (kd, kh, kw, I, O)
  ConvTranspose3d (I, O, kd, kh, kw) -> (kd, kh, kw, O, I)
  InstanceNorm3d  weight/bias        -> norm.scale / norm.bias
Prefixes `module.` (DDP) and `_orig_mod.` (torch.compile) are stripped; the
`all_modules.*` aliases nnUNet blocks register are ignored.
"""

import re
from typing import Dict

import numpy as np
import jax.numpy as jnp


def _to_np(t):
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return t.detach().cpu().numpy()


def _clean_key(k: str) -> str:
    for pre in ("module.", "_orig_mod."):
        if k.startswith(pre):
            k = k[len(pre):]
    return k


_ENC = re.compile(
    r"^encoder\.stages\.(\d+)\.(?:(\d+)\.)?convs\.(\d+)\.(conv|norm)\.(weight|bias)$"
)
_DEC_STAGE = re.compile(
    r"^decoder\.stages\.(\d+)\.(?:(\d+)\.)?convs\.(\d+)\.(conv|norm)\.(weight|bias)$"
)
_TRANSP = re.compile(r"^decoder\.transpconvs\.(\d+)\.(weight|bias)$")
_SEG = re.compile(r"^decoder\.seg_layers\.(\d+)\.(weight|bias)$")


def torch_state_dict_to_params(state_dict: Dict, dtype=jnp.float32):
    """Convert an nnUNet PlainConvUNet state_dict to the unet_apply pytree."""
    if "network_weights" in state_dict:
        state_dict = state_dict["network_weights"]

    enc: Dict[int, Dict[int, dict]] = {}
    dec: Dict[int, Dict[int, dict]] = {}
    transp: Dict[int, dict] = {}
    seg: Dict[int, dict] = {}
    skipped = []

    def block_slot(d, s, c):
        return d.setdefault(s, {}).setdefault(
            c, {"conv": {}, "norm": {}}
        )

    for k, v in state_dict.items():
        k = _clean_key(k)
        if "all_modules" in k:
            continue
        arr = _to_np(v)

        m = _ENC.match(k) or _DEC_STAGE.match(k)
        if m:
            target = enc if k.startswith("encoder") else dec
            s, _, c, mod, wb = m.groups()
            blk = block_slot(target, int(s), int(c))
            if mod == "conv":
                if wb == "weight":
                    blk["conv"]["w"] = jnp.asarray(
                        arr.transpose(2, 3, 4, 1, 0), dtype
                    )
                else:
                    blk["conv"]["b"] = jnp.asarray(arr, dtype)
            else:
                blk["norm"]["scale" if wb == "weight" else "bias"] = jnp.asarray(
                    arr, dtype
                )
            continue

        m = _TRANSP.match(k)
        if m:
            d, wb = int(m.group(1)), m.group(2)
            slot = transp.setdefault(d, {})
            if wb == "weight":
                slot["w"] = jnp.asarray(arr.transpose(2, 3, 4, 1, 0), dtype)
            else:
                slot["b"] = jnp.asarray(arr, dtype)
            continue

        m = _SEG.match(k)
        if m:
            d, wb = int(m.group(1)), m.group(2)
            slot = seg.setdefault(d, {})
            if wb == "weight":
                slot["w"] = jnp.asarray(arr.transpose(2, 3, 4, 1, 0), dtype)
            else:
                slot["b"] = jnp.asarray(arr, dtype)
            continue

        skipped.append(k)

    def as_stage_list(d):
        return [
            {"convs": [d[s][c] for c in sorted(d[s])]} for s in sorted(d)
        ]

    params = {
        "encoder": {"stages": as_stage_list(enc)},
        "decoder": {
            "transpconvs": [transp[i] for i in sorted(transp)],
            "stages": as_stage_list(dec),
            "seg_layers": [seg[i] for i in sorted(seg)],
        },
    }
    if skipped:
        # norm running stats (None for InstanceNorm) / num_batches etc.
        benign = [s for s in skipped if not s.endswith(("weight", "bias"))]
        rest = [s for s in skipped if s.endswith(("weight", "bias"))]
        if rest:
            raise ValueError(f"Unrecognized parameter keys: {rest[:10]}")
    return params


def load_torch_checkpoint(path):
    """Load a torch .pth checkpoint file (CPU) without requiring CUDA."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def params_to_torch_state_dict(params):
    """Inverse of `torch_state_dict_to_params`: emit an nnUNet-named
    state_dict of numpy arrays (torch-layout weights), so TTA-adapted
    parameters can be consumed by the original torch nnUNet (the reference
    stores its TTA output as torch state_dicts, tta.py:364-365)."""
    out = {}

    def put_conv(prefix, blk):
        out[f"{prefix}.conv.weight"] = np.asarray(
            blk["conv"]["w"]).transpose(4, 3, 0, 1, 2)
        out[f"{prefix}.conv.bias"] = np.asarray(blk["conv"]["b"])
        out[f"{prefix}.norm.weight"] = np.asarray(blk["norm"]["scale"])
        out[f"{prefix}.norm.bias"] = np.asarray(blk["norm"]["bias"])

    # nnUNet naming: encoder stages are wrapped in an nn.Sequential (extra
    # .0), decoder stages are bare StackedConvBlocks
    for s, stage in enumerate(params["encoder"]["stages"]):
        for c, blk in enumerate(stage["convs"]):
            put_conv(f"encoder.stages.{s}.0.convs.{c}", blk)
    for s, stage in enumerate(params["decoder"]["stages"]):
        for c, blk in enumerate(stage["convs"]):
            put_conv(f"decoder.stages.{s}.convs.{c}", blk)
    for i, tc in enumerate(params["decoder"]["transpconvs"]):
        # stored (kd, kh, kw, O_up, I_below); torch ConvTranspose3d wants
        # (I, O, kd, kh, kw)
        out[f"decoder.transpconvs.{i}.weight"] = np.asarray(
            tc["w"]).transpose(4, 3, 0, 1, 2)
        out[f"decoder.transpconvs.{i}.bias"] = np.asarray(tc["b"])
    for i, sl in enumerate(params["decoder"]["seg_layers"]):
        out[f"decoder.seg_layers.{i}.weight"] = np.asarray(
            sl["w"]).transpose(4, 3, 0, 1, 2)
        out[f"decoder.seg_layers.{i}.bias"] = np.asarray(sl["b"])
    return out


def flat_npz_to_params(path):
    """Inverse of `params_to_flat_npz`: rebuild the nested pytree (numeric
    path segments become list indices)."""
    import jax.numpy as jnp

    with np.load(path) as z:
        items = {k: z[k] for k in z.files}

    root = {}
    for name, arr in items.items():
        parts = name.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def params_to_flat_npz(params, path):
    """Persist a param pytree as .npz (framework-independent archive)."""
    import jax

    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in keypath)
        flat[name] = np.asarray(leaf)
    np.savez(path, **flat)
