"""Perf probe for the TTA epoch program (PERF.md "gather cliff" open item).

Builds the full-size epoch_train program at a configurable accumulation count
and either
  * --analyze : AOT-compile (chipless OK) and scan the optimized HLO for
    gather fusions, their emitters and operand memory-space annotations;
  * --time    : run steady-state timing on the real chip;
  * --profile : dump a profiler trace to /tmp/probe_trace.

Env knobs: PROBE_ACC (default 2), PROBE_GROUP (1), PROBE_CLASSES (10),
PROBE_BF16 (1), PROBE_VARIANT (engine variant selector, see engine.py).
"""

import argparse
import dataclasses
import json
import os
import re
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
    if os.environ.get("PROBE_TINY"):
        # full-size patch, near-empty model: isolates whether the gather
        # slowdown is triggered by model size (VMEM/MSA pressure)
        from dg_tta_tpu.models.network import Model
        from dg_tta_tpu.models.plans import ArchSpec
        spec = ArchSpec(
            features_per_stage=(8, 16),
            kernel_sizes=((3, 3, 3), (3, 3, 3)),
            strides=((1, 1, 1), (2, 2, 2)),
            n_conv_per_stage_encoder=(1, 1),
            n_conv_per_stage_decoder=(1,),
            num_input_channels=1,
            num_classes=105,
        )
        model = Model(spec=spec, patch_size=model.patch_size,
                      trainer_name="nnUNetTrainer_GIN",
                      uses_gin_internal=True, uses_mind=False)
    if os.environ.get("PROBE_BF16", "1") == "1":
        model = dataclasses.replace(model, compute_dtype="bfloat16")
    acc = int(os.environ.get("PROBE_ACC", 2))
    group = int(os.environ.get("PROBE_GROUP", 1))
    ncls = int(os.environ.get("PROBE_CLASSES", 10))
    plan = TTAPlan(patches_to_be_accumulated=acc)
    idx = np.arange(min(ncls, model.spec.num_classes), dtype=np.int32)
    fns = make_tta_functions(model, plan, idx, idx, patch_group=group)

    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = fns.init_opt_state(params)
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(*vol_shape, 1)).astype(np.float32)
    bucket = bucket_shape_for(vol_shape)
    padded = pad_to_bucket(jnp.asarray(vol), bucket, pad_value=-1.0)[None]
    shapes = jnp.asarray([[float(s) for s in vol_shape]])
    key = jax.random.PRNGKey(1)
    if os.environ.get("PROBE_VMAP"):
        # the driver-path program: jit(vmap(epoch_train)) at chunk size
        # PROBE_VMAP (engine.tta_one_volume wraps this way even for chunk=1)
        n = int(os.environ["PROBE_VMAP"])
        fn = jax.jit(jax.vmap(fns.epoch_train.__wrapped__,
                              in_axes=(0, 0, 0, None, None)),
                     donate_argnums=(0, 1))
        params = jax.tree.map(
            lambda p: jnp.broadcast_to(p[None], (n, *p.shape)), params)
        opt_state = jax.vmap(fns.init_opt_state)(params)
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(n, dtype=jnp.int32))
        args = (params, opt_state, keys, padded, shapes)
        return fn, args
    args = (params, opt_state, key, padded, shapes)
    return fns.epoch_train, args


def analyze(fn, args):
    lowered = fn.lower(*args)
    compiled = lowered.compile()
    txt = compiled.as_text()
    ma = compiled.memory_analysis()
    print(f"temp {ma.temp_size_in_bytes/2**30:.2f} GiB "
          f"args {ma.argument_size_in_bytes/2**30:.2f} GiB")
    # every gather instruction with its enclosing fusion kind + layouts
    lines = txt.splitlines()
    n_gather = 0
    for i, ln in enumerate(lines):
        if " gather(" in ln or " = gather" in ln or "gather(" in ln and "=" in ln:
            if "all_gather" in ln:
                continue
            n_gather += 1
            print(f"--- gather #{n_gather} (line {i}):")
            print("   ", ln.strip()[:400])
    # fusion kinds histogram
    kinds = re.findall(r'kind=(\w+)', txt)
    from collections import Counter
    print("fusion kinds:", Counter(kinds))
    # dump full HLO for manual inspection
    out = os.environ.get("PROBE_HLO_OUT", "/tmp/probe_hlo.txt")
    with open(out, "w") as f:
        f.write(txt)
    print(f"full optimized HLO -> {out} ({len(txt)} bytes)")


def run_timed(fn, args, iters=5):
    import jax
    params, opt_state, key, padded, shapes = args
    out = fn(params, opt_state, key, padded, shapes)
    jax.block_until_ready(out[2])
    # steady state: feed updated state back in.  Sync via a HOST TRANSFER of
    # the loss each iteration — on this stack block_until_ready on donated
    # outputs can return before the compute finishes (measured 0.004 s for a
    # 4.3 TFLOP program), so float() is the only trustworthy fence.
    params, opt_state = out[0], out[1]
    float(np.asarray(out[2]).sum())
    def next_key(i):
        if key.ndim > 1:  # vmapped driver-path probe: a batch of keys
            return jax.vmap(lambda k: jax.random.fold_in(k, i))(key)
        return jax.random.fold_in(key, i)

    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        params, opt_state, loss = fn(params, opt_state, next_key(i),
                                     padded, shapes)
        float(np.asarray(loss).sum())
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"epoch_s": round(min(ts), 4), "all": [round(t, 4) for t in ts]}))
    return params, opt_state


def profile(fn, args):
    import jax
    params, opt_state = run_timed(fn, args, iters=1)
    with jax.profiler.trace("/tmp/probe_trace"):
        _, _, loss = fn(params, opt_state, jax.random.PRNGKey(9),
                        args[3], args[4])
        jax.block_until_ready(loss)
    print("trace -> /tmp/probe_trace")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--analyze", action="store_true")
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--profile", action="store_true")
    a = ap.parse_args()
    import jax
    if os.environ.get("PROBE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    fn, args = build()
    if a.analyze:
        analyze(fn, args)
    if a.time:
        run_timed(fn, args)
    if a.profile:
        profile(fn, args)
