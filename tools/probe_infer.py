"""Time the sliding-window predictor at different window batches (wb).

The r3r bench records infer at ~12.8 vol/min (4.7 s/volume) for 28 padded
windows x 3 members = 84 forwards, ~56 ms each — far above the conv-FLOP
floor of a single fwd patch, i.e. the per-window program is emitter/overhead
bound.  DGTTA_INFER_WB batches wb windows into one member forward (true
batch axis, no grouped-conv cliff); this probe times predict_volume at each
wb and prints one JSON line per setting.

Env: PROBE_WB ("1,2,4"), PROBE_BF16 (1), PROBE_CLASSES ignored (inference
runs the full class head like production).  Args: --time / --analyze
(AOT memory per wb, chipless).
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build():
    import jax
    import jax.numpy as jnp
    from bench import flagship

    model, vol_shape = flagship()
    if os.environ.get("PROBE_BF16", "1") == "1":
        model = dataclasses.replace(model, compute_dtype="bfloat16")
    params = model.init_params(jax.random.PRNGKey(0))
    stacked = jax.tree.map(
        lambda p: jnp.stack([p, p, p]), params)  # E=3 like production
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(*vol_shape, 1)).astype(np.float32)
    vol[tuple(slice(s // 4, s // 2) for s in vol_shape)] += 2.0
    return model, stacked, jnp.asarray(vol)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--analyze", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from dg_tta_tpu.infer.sliding_window import predict_volume

    if os.environ.get("PROBE_COMPILE_CACHE", "1") == "1":
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".cache", "jax")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    model, stacked, vol = build()
    wbs = [int(w) for w in os.environ.get("PROBE_WB", "1,2,4").split(",")]

    for wb in wbs:
        if args.analyze:
            from dg_tta_tpu.infer.sliding_window import (
                get_cached_predictor, window_origins)
            from dg_tta_tpu.core.patches import bucket_shape_for
            covered = bucket_shape_for(
                [max(s, k) for s, k in zip(vol.shape[:3], model.patch_size)],
                multiple=32)
            volp = jnp.zeros((*covered, vol.shape[3]), vol.dtype)
            pm = int(np.lcm(4, wb))
            origins, valid = window_origins(covered, model.patch_size,
                                            pad_multiple=pm)
            pred = get_cached_predictor(model, dtype=jnp.bfloat16,
                                        window_batch=wb)
            lowered = pred.lower(stacked, volp, jnp.asarray(origins),
                                 jnp.asarray(valid), jax.random.PRNGKey(0))
            ma = lowered.compile().memory_analysis()
            print(json.dumps({
                "wb": wb, "n_windows": int(origins.shape[0]),
                "peak_gib": round(
                    (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                     + ma.output_size_in_bytes) / 2**30, 2),
                "temp_gib": round(ma.temp_size_in_bytes / 2**30, 2),
            }), flush=True)
            continue
        # warm-up pays the compile; fence with a scalar pull
        float(jnp.max(predict_volume(model, stacked, vol,
                                     key=jax.random.PRNGKey(3),
                                     window_batch=wb)))
        t0 = time.perf_counter()
        reps = int(os.environ.get("PROBE_REPS", 2))
        for r in range(reps):
            float(jnp.max(predict_volume(model, stacked, vol,
                                         key=jax.random.PRNGKey(4 + r),
                                         window_batch=wb)))
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({"wb": wb, "sec_per_volume": round(dt, 3),
                          "vol_per_min": round(60.0 / dt, 2)}), flush=True)


if __name__ == "__main__":
    main()
