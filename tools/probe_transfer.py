"""Measure device->host transfer throughput through the axon tunnel.

The r3f gap: 3 x member_run = 114.8 s of device work vs 190.2 s measured
bench — suspicion is tta_one_volume's host-side params concatenation
(3 x 66 MB device->host pulls).  Times np.asarray on param-sized arrays,
standalone and straight after a big dispatch.
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

    res = {}
    # NOTE: no x[0] indexing anywhere — a scalar index is a gather and
    # poisons the process (gather cliff, PERF.md); fence with sum().
    for mb in (0.01, 1, 16, 66):
        n = int(mb * 1024 * 1024 // 4)
        x = jnp.arange(n, dtype=jnp.float32) + 1.0
        float(jnp.sum(x))  # materialize + fence
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            h = np.asarray(x)
            ts.append(time.perf_counter() - t0)
        res[f"pull_{mb}MB_s"] = round(min(ts), 4)
        res[f"pull_{mb}MB_MBps"] = round(mb / min(ts), 1)
        print(json.dumps(res), flush=True)

    # a params-tree-shaped pull: ~60 leaves summing ~66 MB
    leaves = [jnp.ones((s,), jnp.float32)
              for s in [276480] * 50 + [2764800] * 4 + [80] * 10]
    float(leaves[0][0])
    t0 = time.perf_counter()
    hs = [np.asarray(l) for l in leaves]
    dt = time.perf_counter() - t0
    tot_mb = sum(l.size for l in leaves) * 4 / 2**20
    res["tree_pull_MB"] = round(tot_mb, 1)
    res["tree_pull_s"] = round(dt, 4)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
