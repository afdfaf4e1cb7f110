"""Correctness of the Pallas 3x3-conv pilot (ops/conv2d_pallas.py).

Runs the real kernel body through the Pallas interpreter on CPU
(DMA/BlockSpec/scratch paths included) against the XLA ground truth
`ops/conv2d._plain_conv2d` — the same oracle the on-chip microbench
(tools/probe_pallas_conv.py) compares on the v5e.  Covers all three
contraction modes and the multi-tile halo path (nH > 1: prev/next
tile-shifted index maps supply the boundary rows).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dg_tta_tpu.ops.conv2d import _plain_conv2d
from dg_tta_tpu.ops.conv2d_pallas import _pick_tile, conv3x3_pallas


def _case(seed, N, H, W, C, CO, dtype):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(N, H, W, C)), dtype)
    w = jnp.asarray(rng.normal(size=(3, 3, C, CO)) * 0.1, dtype)
    return x, w


@pytest.mark.parametrize("mode", ["pairs", "taps", "im2col"])
def test_modes_match_xla_multitile(mode):
    # H=8 -> TILE=8 single tile; H=16 with _pick_tile forced small via H=28
    # (TILE=14, nH=2) exercises the halo rows between tiles.
    x, w = _case(0, 2, 28, 12, 8, 16, jnp.float32)
    assert _pick_tile(28) == 14 and 28 // 14 == 2
    ref = _plain_conv2d(x, w, ((1, 1), (1, 1)), (1, 1))
    got = conv3x3_pallas(x, w, interpret=True, mode_name=mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_three_plus_tiles_and_bf16():
    # nH = 4: interior tiles take BOTH halo rows from neighbours.
    x, w = _case(1, 1, 64, 10, 8, 8, jnp.bfloat16)
    assert 64 // _pick_tile(64) == 4
    ref = _plain_conv2d(x, w, ((1, 1), (1, 1)), (1, 1))
    got = conv3x3_pallas(x, w, interpret=True, mode_name="pairs")
    # bf16 in/out, f32 accumulate in both paths
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.03, atol=0.05)


def test_single_row_tile():
    # H prime -> TILE=1: every working set is pure halo.
    x, w = _case(2, 1, 5, 9, 4, 4, jnp.float32)
    assert _pick_tile(5) == 1
    ref = _plain_conv2d(x, w, ((1, 1), (1, 1)), (1, 1))
    got = conv3x3_pallas(x, w, interpret=True, mode_name="taps")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)
