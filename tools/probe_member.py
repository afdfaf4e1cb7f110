"""Time / memory-analyze engine.member_run (the whole-member program).

The r3e bench measured 190 s/volume where 3 members x 12 epochs x 3.34 s
(the raw epoch steady state) + overhead predicts ~125 s — this probe times
one member_run dispatch directly and divides by the epoch count, and
--analyze reports the AOT memory picture (a peak above the ~15.75 GiB HBM
budget would trigger XLA's compressed-spill copies and explain a slow-down
vs the bare epoch program).

Env: PROBE_ACC (16), PROBE_EPOCHS (12), PROBE_GROUP (1), PROBE_CLASSES (10),
PROBE_BF16 (1).  Args: --time / --analyze.
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
    from dg_tta_tpu.core.patches import bucket_shape_for, pad_to_bucket
    from dg_tta_tpu.tta.engine import make_tta_functions
    from dg_tta_tpu.tta.plan import TTAPlan

    model, vol_shape = flagship()
    if os.environ.get("PROBE_BF16", "1") == "1":
        model = dataclasses.replace(model, compute_dtype="bfloat16")
    acc = int(os.environ.get("PROBE_ACC", 16))
    n_ep = int(os.environ.get("PROBE_EPOCHS", 12))
    group = int(os.environ.get("PROBE_GROUP", 1))
    ncls = int(os.environ.get("PROBE_CLASSES", 10))
    remat = os.environ.get("PROBE_REMAT", "0") == "1"
    # PROBE_SPATIAL=deformable measures the spatial_aug_type="deformable"
    # member program (r4 verdict item 5: it bypasses the shear fast path
    # and rides the XLA gather warp — quantify whether the cliff bites)
    spatial = os.environ.get("PROBE_SPATIAL", "affine")
    plan = TTAPlan(patches_to_be_accumulated=acc, epochs=n_ep,
                   spatial_aug_type=spatial)
    idx = np.arange(min(ncls, model.spec.num_classes), dtype=np.int32)
    fns = make_tta_functions(model, plan, idx, idx, patch_group=group,
                             remat=remat)

    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(*vol_shape, 1)).astype(np.float32)
    bucket = bucket_shape_for(vol_shape)
    padded = pad_to_bucket(jnp.asarray(vol), bucket, pad_value=-1.0)[None]
    shapes = jnp.asarray([[float(s) for s in vol_shape]])
    return fns.member_run, (params, jax.random.PRNGKey(1), padded, shapes), n_ep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--analyze", action="store_true")
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--hlo", metavar="PATH",
                    help="dump the compiled member program's optimized HLO "
                         "text (AOT, cache-warm: no big compile) so trace op "
                         "names (fusion.NNNN) can be looked up by metadata")
    a = ap.parse_args()
    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    fn, args, n_ep = build()
    params, key, padded, shapes = args
    if a.hlo:
        compiled = fn.lower(params, key, padded, shapes, None).compile()
        with open(a.hlo, "w") as f:
            f.write(compiled.as_text())
        print(f"optimized HLO -> {a.hlo}")
    if a.analyze:
        compiled = fn.lower(params, key, padded, shapes, None).compile()
        ma = compiled.memory_analysis()
        print(f"member_run epochs={n_ep}: temp {ma.temp_size_in_bytes/2**30:.2f}"
              f" GiB args {ma.argument_size_in_bytes/2**30:.2f}"
              f" out {ma.output_size_in_bytes/2**30:.2f} GiB")
        txt = compiled.as_text()
        n_spill = txt.count("remat_compressed")
        print(f"remat_compressed copies in HLO: {n_spill}")
    if a.time or a.profile:
        out = fn(params, key, padded, shapes, None)
        float(np.asarray(out[1]).sum())
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            out = fn(params, jax.random.fold_in(key, i), padded, shapes, None)
            float(np.asarray(out[1]).sum())
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(json.dumps({"member_s": round(best, 4),
                          "per_epoch_s": round(best / n_ep, 4),
                          "all": [round(t, 4) for t in ts]}))
        if a.profile:
            with jax.profiler.trace("/tmp/member_trace"):
                out = fn(params, jax.random.fold_in(key, 9), padded, shapes,
                         None)
                float(np.asarray(out[1]).sum())
            print("trace -> /tmp/member_trace")


if __name__ == "__main__":
    main()
