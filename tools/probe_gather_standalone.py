"""Standalone warp-gather probe: same shapes as the TTA hot path, outside the
big program.  Dumps optimized HLO + times it — the 'fast emitter' reference
against which tools/probe_acc2.py's in-program gathers are compared."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dg_tta_tpu.core.fields import get_rand_affine
from dg_tta_tpu.core.grid import affine_grid, grid_sample_flat

PATCH = (112, 112, 128)
N = int(np.prod(PATCH))


@jax.jit
def warp(flat, theta):
    grid = affine_grid(theta, PATCH, align_corners=False)
    return grid_sample_flat(flat, PATCH, grid, padding_mode="border",
                            align_corners=False)


def main():
    C = int(os.environ.get("PROBE_C", 1))
    dtype = jnp.float32 if os.environ.get("PROBE_F32", "1") == "1" else jnp.bfloat16
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.normal(size=(1, C, N)), dtype)
    theta, _ = get_rand_affine(jax.random.PRNGKey(0), 1)

    lowered = warp.lower(flat, theta)
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = os.environ.get("PROBE_HLO_OUT", "/tmp/probe_hlo_standalone.txt")
    with open(out, "w") as f:
        f.write(txt)
    print("HLO ->", out)
    import re
    for m in re.finditer(r"%\S+ = \S+ fusion\([^\n]*kind=(kCustom|kOutput)[^\n]*", txt):
        print("  ", m.group(0)[:220])

    o = warp(flat, theta)
    jax.block_until_ready(o)
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(warp(flat, theta))
        ts.append(time.perf_counter() - t0)
    print(f"warp C={C} {dtype}: {min(ts)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
