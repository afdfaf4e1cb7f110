"""Validate the z-into-H folded conv-block formulation against the current
z-tap 2D decomposition, before rewriting unet.py around it.

HLO attribution (tools/hlo_rank.py on the r3e epoch dump) shows ~10 of the
14.76 GiB/epoch of layout copies come from _conv's 5D<->4D reshapes
(unet.py:72/73/78): every tap's (B,oz,H,W,C)->(B*oz,H,W,C) reshape breaks
XLA layout propagation, so operands get re-laid-out around every conv.
The folded form keeps a whole same-resolution stage on (B, D*(H+2p), W, C)
with z-taps as contiguous row slices and VALID convs — no reshapes, one
layout end-to-end.

Runs a 3-conv-block chain (conv+IN+leaky, stride 1, full-size decoder-top
shape) both ways: checks numerical equality, then times fwd+bwd.

Env: PROBE_B (2), PROBE_D/H/W (112,112,128), PROBE_C (32), PROBE_BF16 (1).
"""
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    B = int(os.environ.get("PROBE_B", 2))
    D = int(os.environ.get("PROBE_D", 112))
    H = int(os.environ.get("PROBE_H", 112))
    W = int(os.environ.get("PROBE_W", 128))
    C = int(os.environ.get("PROBE_C", 32))
    dt = jnp.bfloat16 if os.environ.get("PROBE_BF16", "1") == "1" else jnp.float32
    n_layers = int(os.environ.get("PROBE_LAYERS", 3))
    eps = 1e-5

    from dg_tta_tpu.models.unet import _conv, _instance_norm, _leaky

    key = jax.random.PRNGKey(0)
    ws = [0.05 * jax.random.normal(jax.random.fold_in(key, i),
                                   (3, 3, 3, C, C), dt)
          for i in range(n_layers)]
    bs = [jnp.zeros((C,), dt) for _ in range(n_layers)]
    sc = [jnp.ones((C,), dt) for _ in range(n_layers)]
    bi = [jnp.zeros((C,), dt) for _ in range(n_layers)]
    x = jax.random.normal(jax.random.fold_in(key, 99), (B, D, H, W, C), dt)

    def chain_ref(x, ws, bs, sc, bi):
        h = x
        for w, b, s, bb in zip(ws, bs, sc, bi):
            h = _conv(h, w, b, (1, 1, 1))
            h = _instance_norm(h, s, bb, eps)
            h = _leaky(h, 0.01)
        return h

    # ---- folded formulation -------------------------------------------
    Hp = H + 2  # one zero row each side per z-slice
    F = D * Hp

    def fold(x):
        return jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0))
                       ).reshape(B, F, W, C)

    def unfold(xf):
        return xf.reshape(B, D, Hp, W, C)[:, :, 1:1 + H]

    dn2 = None

    def conv_folded(xf, w, b):
        # out[p] = sum_{kz,ky} x_f[p + (kz-1)*Hp + (ky-1)] w[kz,ky] (zeros
        # out of range).  With xp = pad(x_f, Hp+1 each side), tap kz's VALID
        # conv over rows [kz*Hp : kz*Hp+F+2] yields exactly that alignment.
        nonlocal dn2
        xp = jnp.pad(xf, ((0, 0), (Hp + 1, Hp + 1), (0, 0), (0, 0)))
        if dn2 is None:
            dn2 = jax.lax.conv_dimension_numbers(
                (B, F, W, C), (3, 3, C, C), ("NHWC", "HWIO", "NHWC"))
        out = None
        for kz in range(3):
            xs = jax.lax.slice(
                xp, (0, kz * Hp, 0, 0), (B, kz * Hp + F + 2, W, C))
            # VALID in H (the zero rows are the halo), SAME in W
            r = jax.lax.conv_general_dilated(
                xs, w[kz], (1, 1), [(0, 0), (1, 1)],
                dimension_numbers=dn2, preferred_element_type=xf.dtype)
            out = r if out is None else out + r
        return out + b

    row_valid = jnp.pad(jnp.ones((H,), dt), (1, 1)).reshape(1, Hp, 1, 1)
    mask = jnp.tile(row_valid, (1, D, 1, 1)).reshape(1, F, 1, 1)
    n_valid = float(D * H * W)

    def in_folded(xf, scale, bias):
        xm = xf * mask
        mean32 = (jnp.sum(xm, axis=(1, 2), keepdims=True,
                          dtype=jnp.float32) / n_valid)
        m2 = (jnp.sum(jnp.square(xm.astype(jnp.float32)), axis=(1, 2),
                      keepdims=True) / n_valid)
        var = jnp.maximum(m2 - jnp.square(mean32), 0.0)
        inv = jax.lax.rsqrt(var + eps).astype(xf.dtype)
        # garbage rows get (0-mean)*inv — harmless, re-zeroed by next mask
        return (xf - mean32.astype(xf.dtype)) * (inv * scale) + bias

    def chain_fold(x, ws, bs, sc, bi):
        hf = fold(x)
        for w, b, s, bb in zip(ws, bs, sc, bi):
            hf = conv_folded(hf * mask, w, b)
            hf = in_folded(hf, s, bb)
            hf = _leaky(hf, 0.01)
        return unfold(hf)

    f_ref = jax.jit(chain_ref)
    f_fold = jax.jit(chain_fold)

    a = np.asarray(f_ref(x, ws, bs, sc, bi), np.float32)
    b_ = np.asarray(f_fold(x, ws, bs, sc, bi), np.float32)
    err = float(np.max(np.abs(a - b_)))
    scale = float(np.max(np.abs(a)) + 1e-9)
    print(json.dumps({"max_abs_err": err, "rel": err / scale}), flush=True)

    def loss_ref(ws, x):
        return jnp.sum(chain_ref(x, ws, bs, sc, bi).astype(jnp.float32) ** 2)

    def loss_fold(ws, x):
        return jnp.sum(chain_fold(x, ws, bs, sc, bi).astype(jnp.float32) ** 2)

    g_ref = jax.jit(jax.grad(loss_ref))
    g_fold = jax.jit(jax.grad(loss_fold))

    res = {}
    for name, fn in (("fwd_ref", lambda: f_ref(x, ws, bs, sc, bi)),
                     ("fwd_fold", lambda: f_fold(x, ws, bs, sc, bi)),
                     ("bwd_ref", lambda: g_ref(ws, x)),
                     ("bwd_fold", lambda: g_fold(ws, x))):
        out = fn()
        jax.block_until_ready(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        res[name + "_ms"] = round(min(ts) * 1e3, 2)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
