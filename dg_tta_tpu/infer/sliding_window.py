"""Sliding-window inference as one jitted XLA program.

Re-implements the predictor surface the reference delegates to nnUNet
(nnUNetPredictor.predict_logits_from_preprocessed_data, used at
/root/reference/dg_tta/tta/nnunet_utils.py:116-230): a 0.5-overlap patch
grid, Gaussian importance weighting, logit accumulation, and averaging over
an ensemble of parameter sets (the 3 TTA-adapted param files,
nnunet_utils.py:120-123).  Mirroring-TTA is intentionally absent — the DG
trainers disable it (nnUNetTrainer_GIN.py:34-35).

TPU design: window origins are precomputed host-side, padded to a fixed
count, and scanned inside the compiled program with read-modify-write
dynamic slices; the ensemble dimension is vmapped so the E forwards of one
window batch into a single device program (sequentially over members —
vmap over per-member params lowers grouped convs, +79% on this stack).
One compilation serves every volume sharing a bucket shape and
origin-count bucket; bf16-computing models accumulate in bf16 (halves the
read-modify-write traffic of the full-class accumulator, the dominant
inference cost) and normalize in f32.
"""

import math
import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter


def _default_window_batch() -> int:
    """Windows per member forward (DGTTA_INFER_WB, auto = _TPU_AUTO_WB=2
    on TPU — measured winner of the r4a on-chip sweep, see below).

    Each sliding-window forward at batch 1 is a small program dominated by
    per-op emitter overhead, not MXU FLOPs; batching `wb` windows into one
    forward amortizes that.  The batch axis here is a true batch dim (shared
    params), so it does NOT hit the grouped-conv vmap cliff the member axis
    does (PERF.md round 3d).  wb=1 reproduces the unbatched program
    bit-for-bit.
    """
    v = os.environ.get("DGTTA_INFER_WB", "auto")
    if v != "auto":
        return max(1, int(v))
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover - backend probe
        backend = "cpu"
    return _TPU_AUTO_WB if backend == "tpu" else 1


# TPU auto default, set by the on-chip wb sweep (tools/probe_infer.py,
# PERF.md r4a): full-size TS104 E=3 predict_volume measured 18.1 vol/min at
# wb=1, 20.65 at wb=2 (winner, +14%), 18.5 at wb=4, OOM at wb=8
_TPU_AUTO_WB = 2


def compute_gaussian(patch_size, sigma_scale: float = 1.0 / 8,
                     value_scaling_factor: float = 10.0) -> np.ndarray:
    """Gaussian importance map, nnUNet semantics: unit impulse at the patch
    center, blurred with sigma = patch_size * sigma_scale, peak-normalized,
    scaled, and floored to its smallest nonzero value."""
    tmp = np.zeros(patch_size, dtype=np.float32)
    center = tuple(s // 2 for s in patch_size)
    tmp[center] = 1.0
    g = gaussian_filter(tmp, sigma=[s * sigma_scale for s in patch_size])
    g = g / g.max() * value_scaling_factor
    g = g.astype(np.float32)
    nonzero_min = g[g > 0].min()
    g[g == 0] = nonzero_min
    return g


def compute_steps_for_sliding_window(image_size, patch_size,
                                     step_fraction: float = 0.5):
    """Per-axis window start positions, nnUNet semantics: cover [0, I-k] with
    ceil((I-k)/(k*f))+1 evenly spread, rounded starts."""
    steps = []
    for i, k in zip(image_size, patch_size):
        assert i >= k, (image_size, patch_size)
        if i == k:
            steps.append([0])
            continue
        target = k * step_fraction
        num = int(math.ceil((i - k) / target)) + 1
        actual = (i - k) / (num - 1)
        steps.append([int(round(actual * j)) for j in range(num)])
    return steps


def window_origins(image_size, patch_size, step_fraction: float = 0.5,
                   pad_multiple: int = 8):
    """All (z, y, x) window origins plus a validity mask, padded to a
    multiple of `pad_multiple` so origin count buckets compilations."""
    steps = compute_steps_for_sliding_window(image_size, patch_size,
                                             step_fraction)
    origins = np.array([(z, y, x) for z in steps[0] for y in steps[1]
                        for x in steps[2]], dtype=np.int32)
    n = origins.shape[0]
    n_pad = -(-n // pad_multiple) * pad_multiple
    valid = np.zeros((n_pad,), np.float32)
    valid[:n] = 1.0
    origins = np.concatenate(
        [origins, np.zeros((n_pad - n, 3), np.int32)], axis=0)
    return origins, valid


def make_sliding_window_predictor(model, num_out_channels: Optional[int] = None,
                                  dtype=jnp.float32, modify_input_fn=None,
                                  modify_output_fn=None, mesh=None,
                                  window_batch: Optional[int] = None):
    """Build the jitted accumulation program.

    Returns fn(params_stacked, vol_padded, origins, valid) -> (D, H, W, C)
    Gaussian-normalized mean logits, where params_stacked has a leading
    ensemble axis and vol_padded is (D, H, W, C_in) already covered by the
    origin grid.

    modify_input_fn / modify_output_fn are the user modifier functions: in the
    reference they are forward-(pre-)hooks on the model object used by the
    predictor (model_utils.py:21-35 via nnunet_utils.py:116-125), so they run
    on every sliding-window patch at inference — orientation fixes stay active
    during Phase 2.  Both take/return (B, D, H, W, C).

    mesh: optional jax.sharding.Mesh — shards the WINDOW-ORIGIN axis over
    the mesh's data axis (each device scans its share of windows into local
    accumulators, one psum combines them; params/volume replicated).  The
    padded origin count must be divisible by the mesh size
    (window_origins pads to a multiple of 8).

    window_batch: windows per member forward (None = _default_window_batch).
    Each device's origin count must be divisible by it (predict_volume pads
    accordingly).  wb=1 is the exact historical program; wb>1 runs each
    member's forward on a true batch of wb patches and applies the wb
    accumulator updates in window order, so GIN-model logits are
    bit-identical to wb=1 (the key is unused at inference) and MIND noise
    remains per-voxel i.i.d. (mind3d draws noise at batch shape), just under
    a different key split.
    """
    patch_size = model.patch_size
    gauss = jnp.asarray(compute_gaussian(patch_size))[..., None]
    n_out = num_out_channels or model.spec.num_classes
    wb = _default_window_batch() if window_batch is None else int(window_batch)

    def scan_origins(params_stacked, vol_padded, origins, valid, keys,
                     psum_axis=None):
        D, H, W, _ = vol_padded.shape
        acc = jnp.zeros((D, H, W, n_out), dtype)
        wacc = jnp.zeros((D, H, W, 1), dtype)

        def fwd_batch(params, x, k):
            # x: (B, *patch, C) — a true batch of windows
            if modify_input_fn is not None:
                x = modify_input_fn(x)
            logits = model.apply(params, x, key=k)
            if modify_output_fn is not None:
                logits = modify_output_fn(logits)
            return logits

        E = jax.tree.leaves(params_stacked)[0].shape[0]

        def body(carry, inp):
            acc, wacc = carry
            origin, v, k = inp
            z, y, x = origin[0], origin[1], origin[2]
            patch = jax.lax.dynamic_slice(
                vol_padded, (z, y, x, 0),
                (*patch_size, vol_padded.shape[3]))
            # sequential member loop (lax.map = scan), NOT vmap: vmapping
            # over per-member params lowers the convs as grouped convs,
            # measured +79% on this stack (PERF.md round 3d)
            logits = jax.lax.map(
                lambda pk: fwd_batch(pk[0], patch[None], pk[1])[0],
                (params_stacked, jax.random.split(k, E)))
            logits = (jnp.mean(logits, axis=0) * gauss * v).astype(dtype)
            upd = jax.lax.dynamic_slice(acc, (z, y, x, 0),
                                        (*patch_size, n_out)) + logits
            acc = jax.lax.dynamic_update_slice(acc, upd, (z, y, x, 0))
            wupd = jax.lax.dynamic_slice(wacc, (z, y, x, 0),
                                         (*patch_size, 1)) + (
                gauss * v).astype(dtype)
            wacc = jax.lax.dynamic_update_slice(wacc, wupd, (z, y, x, 0))
            return (acc, wacc), None

        def body_grouped(carry, inp):
            # wb windows per member forward: the patch stack is a TRUE batch
            # axis (shared params), so the convs stay dense; the wb
            # accumulator updates run in window order after the forwards.
            acc, wacc = carry
            origins_g, valid_g, k = inp  # (wb, 3), (wb,), key
            patches = jnp.stack([
                jax.lax.dynamic_slice(
                    vol_padded,
                    (origins_g[i, 0], origins_g[i, 1], origins_g[i, 2], 0),
                    (*patch_size, vol_padded.shape[3]))
                for i in range(wb)])
            # member accumulation (f32) instead of lax.map-stacking: the
            # (E, wb, *patch, C) stack would cost E*wb patch-volumes of HBM
            def member_body(s, pk):
                return (s + fwd_batch(pk[0], patches, pk[1])
                        .astype(jnp.float32), None)
            zero = jnp.zeros((wb, *patch_size, n_out), jnp.float32)
            s, _ = jax.lax.scan(member_body, zero,
                                (params_stacked, jax.random.split(k, E)))
            mean = s / E
            for i in range(wb):
                z, y, x = origins_g[i, 0], origins_g[i, 1], origins_g[i, 2]
                li = (mean[i] * gauss * valid_g[i]).astype(dtype)
                upd = jax.lax.dynamic_slice(acc, (z, y, x, 0),
                                            (*patch_size, n_out)) + li
                acc = jax.lax.dynamic_update_slice(acc, upd, (z, y, x, 0))
                wupd = jax.lax.dynamic_slice(wacc, (z, y, x, 0),
                                             (*patch_size, 1)) + (
                    gauss * valid_g[i]).astype(dtype)
                wacc = jax.lax.dynamic_update_slice(wacc, wupd, (z, y, x, 0))
            return (acc, wacc), None

        if wb == 1:
            (acc, wacc), _ = jax.lax.scan(body, (acc, wacc),
                                          (origins, valid, keys))
        else:
            n = origins.shape[0]
            assert n % wb == 0, (n, wb)
            (acc, wacc), _ = jax.lax.scan(
                body_grouped, (acc, wacc),
                (origins.reshape(n // wb, wb, 3),
                 valid.reshape(n // wb, wb),
                 keys[::wb]))
        if psum_axis is not None:
            acc = jax.lax.psum(acc, psum_axis)
            wacc = jax.lax.psum(wacc, psum_axis)
        return acc, wacc

    @partial(jax.jit, static_argnames=())
    def predict(params_stacked, vol_padded, origins, valid, key):
        keys = jax.random.split(key, origins.shape[0])
        if mesh is None:
            acc, wacc = scan_origins(params_stacked, vol_padded, origins,
                                     valid, keys)
        else:
            from jax.sharding import PartitionSpec as P
            from dg_tta_tpu.parallel.mesh import DATA_AXIS
            from dg_tta_tpu.parallel.tta import shard_map
            acc, wacc = shard_map(
                partial(scan_origins, psum_axis=DATA_AXIS), mesh,
                in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS),
                          P(DATA_AXIS)),
                out_specs=(P(), P()),
            )(params_stacked, vol_padded, origins, valid, keys)
        # No epsilon: every voxel is covered by >=1 valid window whose floored
        # Gaussian weight is > 0 (corner weights are ~1e-11 — an epsilon
        # clamp would corrupt exactly those voxels).  Normalize in f32 (the
        # accumulators may be bf16).
        return acc.astype(jnp.float32) / wacc.astype(jnp.float32)

    return predict


_PREDICTOR_CACHE = {}


def get_cached_predictor(model, num_out_channels=None, dtype=jnp.float32,
                         modify_input_fn=None, modify_output_fn=None,
                         mesh=None, window_batch=None):
    """One jitted predictor per (model, out-channels, modifiers, mesh, wb):
    jit's own shape cache then buckets compilations — with `predict_volume`'s
    bucket-padding, every volume sharing a (bucket shape, origin count)
    reuses one compilation instead of recompiling per volume."""
    wb = _default_window_batch() if window_batch is None else int(window_batch)
    key = (model, num_out_channels, jnp.dtype(dtype).name,
           modify_input_fn, modify_output_fn, mesh, wb)
    if key not in _PREDICTOR_CACHE:
        _PREDICTOR_CACHE[key] = make_sliding_window_predictor(
            model, num_out_channels, dtype,
            modify_input_fn=modify_input_fn,
            modify_output_fn=modify_output_fn, mesh=mesh, window_batch=wb)
    return _PREDICTOR_CACHE[key]


def predict_volume(model, params_stacked, vol, key=None,
                   step_fraction: float = 0.5, predictor=None,
                   modify_input_fn=None, modify_output_fn=None,
                   bucket_multiple: int = 32, mesh=None, dtype=None,
                   window_batch=None):
    """Convenience wrapper: pad `vol` (D, H, W, C) to cover the window grid,
    run the jitted predictor, crop back.  Returns (D, H, W, C_out) logits.

    nnUNet pads symmetrically when the volume is smaller than the patch
    (predict_logits path via pad_nd_image); we pad at both ends with the
    volume minimum for images.  On top of that the padded shape is rounded
    up to a multiple of `bucket_multiple` per axis so distinct volume shapes
    share compilations (the pad band's logits are cropped away; the origin
    grid covers the bucket so normalization inside the crop is exact).
    """
    from dg_tta_tpu.core.patches import bucket_shape_for

    D, H, W, _ = vol.shape
    patch = model.patch_size
    covered = [max(s, k) for s, k in zip((D, H, W), patch)]
    if bucket_multiple > 1:
        covered = bucket_shape_for(covered, multiple=bucket_multiple)
    pads = []
    for s, target in zip((D, H, W), covered):
        extra = target - s
        pads.append((extra // 2, extra - extra // 2))
    pads.append((0, 0))
    vmin = float(jnp.min(vol))
    volp = jnp.pad(vol, pads, constant_values=vmin)
    # Padded (invalid) origins run the full model forward with their
    # accumulation masked, so the pad multiple is pure dead work: 4 keeps
    # compilation bucketing (origin counts 25-28 share one program) at
    # <=12% worst-case waste vs 28% at 8 (e.g. the TS104 median volume's
    # 27-window grid padded to 32 burned 5 of 32 forwards).  Mesh runs
    # need the count divisible by the mesh size for the even shard_map
    # split.
    wb = (_default_window_batch() if window_batch is None
          else int(window_batch))
    # each device's share of the origin count must be divisible by the
    # window batch (scan_origins groups wb windows per member forward)
    pad_multiple = int(np.lcm(4, wb))
    if mesh is not None:
        pad_multiple = int(np.lcm(pad_multiple, wb * mesh.size))
    origins, valid = window_origins(volp.shape[:3], patch, step_fraction,
                                    pad_multiple=pad_multiple)
    if predictor is None:
        if dtype is None:
            # match the model: bf16 accumulators halve the dominant
            # accumulator RMW traffic; the normalize happens in f32
            dtype = (jnp.bfloat16
                     if getattr(model, "compute_dtype", None) == "bfloat16"
                     else jnp.float32)
        predictor = get_cached_predictor(
            model, dtype=dtype, modify_input_fn=modify_input_fn,
            modify_output_fn=modify_output_fn, mesh=mesh, window_batch=wb)
    if key is None:
        key = jax.random.PRNGKey(0)
    logits = predictor(params_stacked, volp, jnp.asarray(origins),
                       jnp.asarray(valid), key)
    return logits[pads[0][0]: pads[0][0] + D,
                  pads[1][0]: pads[1][0] + H,
                  pads[2][0]: pads[2][0] + W]
