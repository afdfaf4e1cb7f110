"""On-chip breakdown of the DA stack (train/augment.augment_batch).

probe_pretrain measured the on-device DA pipeline at 0.673 s/iter = 67%
of the full TS104 pretrain step (PERF.md r5c) — this probe attributes it:
times the jitted augment_batch at the TS104 batch (2, 112, 112, 128, 1)
with each resample stage knocked out in turn (monkeypatched to identity
at trace time), so the delta is that stage's share.

Stages: spatial (img trilinear + seg nearest affine grid_sample),
lowres (the continuous low-res simulation's grid_sample), blur (the
static-support separable Gaussian).  The pointwise tail (noise,
brightness, contrast, 2x gamma) is the remainder.

Env: PROBE_BATCH (2), PROBE_IMPL (stock|tpu — tpu times the MXU-form DA
resamplers, train/augment_tpu.py, via DGTTA_DA_TPU), PROBE_STAGES (1;
0 = time the full program only, skip the knockout matrix).  Run under
`timeout` in a subprocess.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import dg_tta_tpu.train.augment as aug

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    B = int(os.environ.get("PROBE_BATCH", 2))
    patch = tuple(int(s) for s in
                  os.environ.get("PROBE_PATCH", "112,112,128").split(","))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(B, *patch, 1)).astype(np.float32))
    segs = jnp.asarray(rng.integers(0, 10, (B, *patch, 1)).astype(np.float32))
    cfg = aug.DAConfig()
    key = jax.random.PRNGKey(0)

    def timed(tag, fn):
        out = fn(key, imgs, segs, cfg)
        float(np.asarray(jnp.asarray(out[0]).astype(jnp.float32).sum()
                         if isinstance(out, tuple) else out))
        ts = []
        for i in range(5):
            k = jax.random.fold_in(key, i)
            t0 = time.perf_counter()
            o = fn(k, imgs, segs, cfg)
            # fence with a cheap on-device scalar (img sum)
            float(np.asarray(jnp.asarray(o[0]).astype(jnp.float32).sum()))
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(json.dumps({tag: round(best, 4)}), flush=True)
        return best

    impl = os.environ.get("PROBE_IMPL", "stock")
    os.environ["DGTTA_DA_TPU"] = "1" if impl == "tpu" else "0"

    results = {}
    full_fn = jax.jit(lambda k, a, b: aug.augment_batch(k, a, b, cfg))
    results["full"] = timed("full", lambda k, a, b, c: full_fn(k, a, b))

    if os.environ.get("PROBE_STAGES", "1") == "1":
        if impl == "tpu":
            import dg_tta_tpu.train.augment_tpu as aug_tpu
            mods, knocks = aug_tpu, {
                "no_spatial": ("affine_warp_tpu", lambda x, th, **kw: x),
                "no_lowres": ("lowres_sim_tpu", lambda x, z, **kw: x),
                "no_blur": ("gaussian_blur_tpu", lambda x, s, **kw: x),
            }
        else:
            mods, knocks = aug, {
                # spatial: pass the values through (img AND seg warp)
                "no_spatial": ("grid_sample", lambda x, grid, **kw: x),
                "no_lowres": ("_lowres_sim", lambda x, zoom, ps: x),
                "no_blur": ("_gaussian_blur", lambda x, s: x),
            }
        for tag, (name, repl) in knocks.items():
            orig = getattr(mods, name)
            setattr(mods, name, repl)
            try:
                fn = jax.jit(lambda k, a, b: aug.augment_batch(k, a, b, cfg))
                results[tag] = timed(tag, lambda k, a, b, c, f=fn: f(k, a, b))
            finally:
                setattr(mods, name, orig)

    shares = {f"{t}_share_s": round(results["full"] - v, 4)
              for t, v in results.items() if t != "full"}
    print("FINAL " + json.dumps({**{k: round(v, 4)
                                    for k, v in results.items()}, **shares}))


if __name__ == "__main__":
    main()
