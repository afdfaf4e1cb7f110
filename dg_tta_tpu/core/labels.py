"""Label-space mapping between a pretrained model's classes and a TTA dataset.

Reference semantics: /root/reference/dg_tta/tta/torch_utils.py:214-263.
`map_label(logits)` is a channel gather onto the optimized label list;
`map_label(argmaxed)` rewrites label values. `generate_label_mapping` is the
name-intersection of two `{name: idx}` dicts.
"""

import jax
import jax.numpy as jnp
import numpy as np


def generate_label_mapping(source_label_dict: dict, target_label_dict: dict) -> dict:
    """{name: (source_idx, target_idx)} over the intersecting label names."""
    assert all(isinstance(k, str) for k in source_label_dict)
    assert all(isinstance(k, str) for k in target_label_dict)
    common = set(source_label_dict) & set(target_label_dict)
    assert common, "There are no intersecting label names in given dicts."
    mapping = {}
    # preserve source-dict insertion order first, then target-only (none remain)
    for key in list(source_label_dict) + list(target_label_dict):
        if key in common and key not in mapping:
            mapping[key] = (source_label_dict[key], target_label_dict[key])
    return mapping


def get_map_idxs(label_mapping: dict, optimized_labels: list, input_type: str):
    """Index vector selecting, per optimized label, its id in the source
    (pretrain) or target (tta) label space."""
    assert input_type in ("pretrain_labels", "tta_labels")
    assert optimized_labels[0] == "background"
    idxs = []
    for eval_label in optimized_labels:
        src_idx, tgt_idx = label_mapping[eval_label]
        # nnUNet dataset.json may store ids as str or list (region-based)
        pick = src_idx if input_type == "pretrain_labels" else tgt_idx
        if isinstance(pick, (list, tuple)):
            pick = pick[0]
        idxs.append(int(pick))
    return np.asarray(idxs, dtype=np.int32)


def map_label_logits(logits, map_idxs):
    """Gather logits channels onto the optimized label set.

    Args:
      logits: (B, D, H, W, C_model) channels-last.
      map_idxs: (C_opt,) int channel indices into C_model.
    Returns:
      (B, D, H, W, C_opt)
    """
    # STATIC slicing + concat, not jnp.take and not a one-hot matmul: on
    # XLA-TPU both a gather op and a small-K contraction permanently degrade
    # the process's fast dynamic-gather path for all subsequent programs
    # (PERF.md 'gather cliff', tools/probe_poison*.py).  The mapping indices
    # are run-level config, always concrete at trace time.
    idx = [int(i) for i in np.asarray(map_idxs).tolist()]
    return jnp.concatenate([logits[..., i:i + 1] for i in idx], axis=-1)


def map_label_argmaxed(label, map_idxs):
    """Rewrite label values: voxels equal to map_idxs[i] become i, all other
    values become 0 (reference: zeros_like + per-index assignment)."""
    map_idxs = jnp.asarray(map_idxs)
    out = jnp.zeros_like(label)
    for lbl_idx in range(map_idxs.shape[0]):
        out = jnp.where(label == map_idxs[lbl_idx], lbl_idx, out)
    return out
