"""On-chip microbench: Pallas 3x3 conv pilot vs the XLA conv emitter.

Times `ops/conv2d_pallas.conv3x3_pallas` (modes pairs/taps/im2col) against
`ops/conv2d._plain_conv2d` on the EXACT z-packed stage shapes of the
flagship member program (models/unet_zpack.py, TS104 patch 112x112x128,
G=2, TTA branch batch 2):

  stage0: (112, 112, 128,  64) -> 64    (C=32 packed; the widest stage)
  stage1: ( 56,  56,  64, 128) -> 128   (C=64 packed)

Run this under `timeout` in a SUBPROCESS (Mosaic compiles can wedge the
remote worker — CLAUDE.md); it is the r4-verdict item-1a measurement,
win or negative.  PROBE_SHAPES / PROBE_MODES env override the matrix.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = {
    # compile smoke first: same kernel structure (multi-tile halo, all
    # modes) at trivial size — validates Mosaic handles the program shape
    # before the big compiles are attempted (wedge-risk protocol, CLAUDE.md)
    "tiny": (2, 32, 128, 64, 64),
    "stage0": (112, 112, 128, 64, 64),
    "stage1": (56, 56, 64, 128, 128),
}


def bench(fn, args, iters=5):
    """fn must return a SCALAR: fencing by pulling the full output array
    would ship hundreds of MB through the dev tunnel per iteration (the
    first run of this probe measured 13-15 s of pure transfer per conv)."""
    out = fn(*args)
    float(np.asarray(out))  # 4-byte scalar pull fences the whole program
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out))
        ts.append(time.perf_counter() - t0)
    return min(ts)


K_LO, K_HI = 8, 40


def bench_chained(conv_one, x, w, repeats=4):
    """Per-conv seconds, dispatch-free: the second probe run measured every
    variant pinned at ~23-27 ms — pure tunnel dispatch+scalar-pull latency
    burying the ~1.6 ms compute.  This chains K convs inside ONE jitted
    fori_loop (CO == C on both stage shapes, so the output feeds back as
    the next input) and returns the K_HI/K_LO slope, cancelling the
    constant dispatch/fence cost exactly."""
    import jax
    import jax.numpy as jnp

    def chained(k):
        @jax.jit
        def run(x, w):
            y = jax.lax.fori_loop(
                0, k, lambda i, a: conv_one(a, w).astype(x.dtype), x)
            return y.astype(jnp.float32).sum()
        return run

    lo, hi = chained(K_LO), chained(K_HI)
    t_lo, t_hi = bench(lo, (x, w), repeats), bench(hi, (x, w), repeats)
    return (t_hi - t_lo) / (K_HI - K_LO)


def main():
    import jax
    import jax.numpy as jnp
    from dg_tta_tpu.ops.conv2d import _plain_conv2d
    from dg_tta_tpu.ops.conv2d_pallas import conv3x3_pallas

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    names = os.environ.get("PROBE_SHAPES", "stage0,stage1").split(",")
    modes = os.environ.get("PROBE_MODES", "pairs,im2col,taps").split(",")
    dt = jnp.bfloat16
    results = {}
    for name in names:
        N, H, W, C, CO = SHAPES[name]
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(N, H, W, C)), dt)
        w = jnp.asarray(rng.normal(size=(3, 3, C, CO)) * 0.05, dt)
        gflop = 2 * N * H * W * 9 * C * CO / 1e9

        t_xla = bench_chained(
            lambda a, b: _plain_conv2d(a, b, ((1, 1), (1, 1)), (1, 1)),
            x, w)
        row = {"gflop": round(gflop, 1),
               "xla_ms": round(t_xla * 1e3, 3),
               "xla_tfps": round(gflop / t_xla / 1e3, 1)}
        for mode in modes:
            try:
                t = bench_chained(
                    lambda a, b, m=mode: conv3x3_pallas(a, b, mode_name=m),
                    x, w)
                # on-device compare: only the scalar max crosses the tunnel
                errf = jax.jit(lambda a, b, m=mode: jnp.abs(
                    conv3x3_pallas(a, b, mode_name=m).astype(jnp.float32)
                    - _plain_conv2d(a, b, ((1, 1), (1, 1)), (1, 1))
                    .astype(jnp.float32)).max())
                err = float(np.asarray(errf(x, w)))
                row[f"{mode}_ms"] = round(t * 1e3, 3)
                row[f"{mode}_tfps"] = round(gflop / t / 1e3, 1)
                row[f"{mode}_maxerr"] = err
            except Exception as e:  # pragma: no cover - device-dependent
                row[f"{mode}_error"] = f"{type(e).__name__}: {e}"[:160]
            print(json.dumps({name: row}), flush=True)
        results[name] = row
    print("FINAL " + json.dumps(results))


if __name__ == "__main__":
    main()
