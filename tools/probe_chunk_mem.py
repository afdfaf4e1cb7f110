"""AOT memory analysis of the fused epoch at ensemble chunk sizes (chipless).

Usage: python tools/probe_chunk_mem.py [chunk ...]
Env: CHUNK_ACC (default 16), CHUNK_REMAT (0), CHUNK_BF16 (1), CHUNK_GROUP (1)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bench import flagship
    from dg_tta_tpu.core.patches import bucket_shape_for
    from dg_tta_tpu.tta.engine import make_tta_functions
    from dg_tta_tpu.tta.plan import TTAPlan

    model, vol_shape = flagship()
    if os.environ.get("CHUNK_BF16", "1") == "1":
        model = dataclasses.replace(model, compute_dtype="bfloat16")
    acc = int(os.environ.get("CHUNK_ACC", 16))
    remat = os.environ.get("CHUNK_REMAT", "0") == "1"
    group = int(os.environ.get("CHUNK_GROUP", 1))
    plan = TTAPlan(patches_to_be_accumulated=acc)
    idx = np.arange(10, dtype=np.int32)
    fns = make_tta_functions(model, plan, idx, idx, remat=remat,
                             patch_group=group)

    bucket = bucket_shape_for(vol_shape)
    params = jax.eval_shape(model.init_params, jax.random.PRNGKey(0))
    vols = jax.ShapeDtypeStruct((1, *bucket, 1), jnp.float32)
    shapes = jax.ShapeDtypeStruct((1, 3), jnp.float32)
    key = jax.eval_shape(lambda: jax.random.PRNGKey(0))

    for chunk in [int(a) for a in (sys.argv[1:] or ["1", "3"])]:
        pc = jax.tree.map(
            lambda p: jax.ShapeDtypeStruct((chunk, *p.shape), p.dtype),
            params)
        opt = jax.eval_shape(jax.vmap(fns.init_opt_state), pc)
        keys = jax.ShapeDtypeStruct((chunk, *key.shape), key.dtype)
        train_v = jax.jit(
            jax.vmap(fns.epoch_train.__wrapped__,
                     in_axes=(0, 0, 0, None, None)),
            donate_argnums=(0, 1))
        lowered = train_v.lower(pc, opt, keys, vols, shapes)
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        gib = 1024 ** 3
        print(f"chunk={chunk} acc={acc} remat={remat} group={group}: "
              f"temp={ma.temp_size_in_bytes/gib:.2f} GiB "
              f"args={ma.argument_size_in_bytes/gib:.2f} "
              f"out={ma.output_size_in_bytes/gib:.2f} "
              f"alias={ma.alias_size_in_bytes/gib:.2f} "
              f"peak~={(ma.temp_size_in_bytes+ma.argument_size_in_bytes+ma.output_size_in_bytes-ma.alias_size_in_bytes)/gib:.2f} GiB",
              flush=True)


if __name__ == "__main__":
    main()
