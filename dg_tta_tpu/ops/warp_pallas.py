"""Warp-implementation router (`warp_flat_auto`).

Routes `core.grid.grid_sample_flat`-shaped calls to the selected warp
implementation.  Production implementations are the XLA gather warp
(core/grid.py) and the gather-free one-hot warp (ops/warp_onehot.py); the
affine TTA branches additionally bypass this router entirely via the MXU
shear resampler (ops/warp_shear.py, tta/engine.py).

The Mosaic staged-gather kernel that used to live in this module is
quarantined in ops/experimental/warp_pallas_staged.py: it has NEVER executed
on the target TPU (it faults the remote worker even with its compute stages
disabled — PERF.md round 3) and is kept only as a CPU-interpret-mode
documented algorithm.  Selecting it (DGTTA_WARP_IMPL=pallas) is explicit
opt-in and emits a RuntimeWarning.

Reference semantics being routed: torch F.grid_sample at
/root/reference/dg_tta/tta/torch_utils.py:55-73 and tta.py:549-575.
"""

import os
import warnings


def warp_flat_auto(flat, src_spatial, grid, padding_mode="zeros",
                   align_corners=False, need_grad=False):
    """`grid_sample_flat` routed to the selected implementation.

    DGTTA_WARP_IMPL selects: "auto" (default), "mixed", "onehot", "pallas",
    "xla".  On-chip measurements (PERF.md round 3) drive the default:
      * auto = the XLA gather path everywhere.  The gather-free one-hot
        warp (ops/warp_onehot.py) measured 2.6x FASTER standalone at C=1
        but 2x SLOWER in the fused acc2 epoch at C=10 (XLA materializes
        every select of the variant-field chains: acc2 2.76 s vs 1.35 s),
        so it is NOT the default.
      * mixed = one-hot for C==1 warps, XLA for multi-channel (probe knob).
      * onehot = one-hot wherever supported (any backend).
      * pallas = the quarantined experimental Mosaic kernel — explicit
        opt-in only (faults the TPU worker on this stack; RuntimeWarning on
        use), NOT differentiable (`need_grad=True` call sites never take
        it); DGTTA_PALLAS_WARP=0 also vetoes it.
    """
    import jax
    import jax.numpy as jnp

    from dg_tta_tpu.core.grid import grid_sample_flat, unpack_grid

    gx = unpack_grid(grid)[0]
    out_spatial = tuple(gx.shape[-3:])
    impl = os.environ.get("DGTTA_WARP_IMPL", "auto")
    if impl == "pallas" and not need_grad:
        from dg_tta_tpu.ops.experimental.warp_pallas_staged import (
            grid_sample_flat_pallas, pallas_warp_supported)

        if (os.environ.get("DGTTA_PALLAS_WARP", "1") == "1"
                and jax.default_backend() == "tpu"
                and flat.dtype in (jnp.float32, jnp.bfloat16)
                and pallas_warp_supported(flat.shape, tuple(src_spatial),
                                          out_spatial)):
            warnings.warn(
                "DGTTA_WARP_IMPL=pallas selects the EXPERIMENTAL staged "
                "Mosaic warp kernel, which has never executed successfully "
                "on this TPU stack and can fault the TPU worker for hours "
                "(PERF.md round 3).", RuntimeWarning, stacklevel=2)
            return grid_sample_flat_pallas(flat, grid, tuple(src_spatial),
                                           padding_mode=padding_mode,
                                           align_corners=align_corners)
        impl = "auto"
    if impl == "onehot" or (impl == "mixed" and flat.shape[1] == 1):
        from dg_tta_tpu.ops.warp_onehot import (grid_sample_flat_onehot,
                                                onehot_warp_supported)
        if onehot_warp_supported(tuple(src_spatial), out_spatial):
            return grid_sample_flat_onehot(flat, grid, tuple(src_spatial),
                                           padding_mode=padding_mode,
                                           align_corners=align_corners)
    return grid_sample_flat(flat, src_spatial, grid,
                            padding_mode=padding_mode,
                            align_corners=align_corners)
