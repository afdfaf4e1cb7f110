"""Compare conv formulations for the U-Net's hot full-res blocks on TPU.

The r3f trace + HLO show each conv instance picks its own emitter
(EmitInputBatchInLanes wants batch-minor operands, others want W-minor),
forcing 200-400 MB layout copies around every conv (~10 GiB/epoch).  The
candidates:

  v_ztap   current unet._conv (z-tap 2D decomposition)      [baseline]
  v_3d     direct lax 3D convolution NDHWC (round-1 verdict was 7x im2col
           HBM blowup in f32 — re-measured here under bf16 + current XLA)
  v_dotin  z-tap 2D + IN statistics via dot_general (ones-contraction on
           the MXU) instead of reduce — tests whether the reduce's layout
           preference causes the flips

Each runs a 3-block conv+IN+leaky chain at the decoder-top shape
(B=2,D=112,H=112,W=128,C=32), fwd and bwd, bf16.

Env: PROBE_VARIANTS comma list (default all), PROBE_LAYERS, PROBE_* dims
as tools/probe_fold.py.
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
    from dg_tta_tpu.models.unet import _conv, _instance_norm, _leaky

    B = int(os.environ.get("PROBE_B", 2))
    D = int(os.environ.get("PROBE_D", 112))
    H = int(os.environ.get("PROBE_H", 112))
    W = int(os.environ.get("PROBE_W", 128))
    C = int(os.environ.get("PROBE_C", 32))
    dt = (jnp.bfloat16 if os.environ.get("PROBE_BF16", "1") == "1"
          else jnp.float32)
    n_layers = int(os.environ.get("PROBE_LAYERS", 3))
    eps = 1e-5
    variants = os.environ.get("PROBE_VARIANTS", "ztap,3d,dotin").split(",")

    key = jax.random.PRNGKey(0)
    ws = [0.05 * jax.random.normal(jax.random.fold_in(key, i),
                                   (3, 3, 3, C, C), dt)
          for i in range(n_layers)]
    bs = [jnp.zeros((C,), dt) for _ in range(n_layers)]
    sc = [jnp.ones((C,), dt) for _ in range(n_layers)]
    bi = [jnp.zeros((C,), dt) for _ in range(n_layers)]
    x = jax.random.normal(jax.random.fold_in(key, 99), (B, D, H, W, C), dt)

    def conv3d_direct(h, w, b):
        dn = jax.lax.conv_dimension_numbers(
            h.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
        r = jax.lax.conv_general_dilated(
            h, w, (1, 1, 1), [(1, 1), (1, 1), (1, 1)],
            dimension_numbers=dn, preferred_element_type=h.dtype)
        return r + b

    def conv_ztap_nchw(x5, w, b):
        """z-tap decomposition with NCHW operands: W (=128 lanes) is the
        minor dim, testing whether feeding the conv the layout its
        preferred emitter wants kills the per-conv operand copies."""
        B_, D_, H_, W_, C_ = x5.shape
        kd, kh, kw, ci, co = w.shape
        x = jnp.pad(x5, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        dn2 = jax.lax.conv_dimension_numbers(
            (B_ * D_, C_, H_, W_), (co, ci, kh, kw),
            ("NCHW", "OIHW", "NCHW"))
        out = None
        for kz in range(kd):
            xs = jax.lax.slice(
                x, (0, kz, 0, 0, 0), (B_, kz + D_, H_, W_, C_))
            xs = jnp.moveaxis(xs.reshape(B_ * D_, H_, W_, C_), -1, 1)
            wk = jnp.transpose(w[kz], (3, 2, 0, 1))   # (co, ci, kh, kw)
            r = jax.lax.conv_general_dilated(
                xs, wk, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn2,
                preferred_element_type=x5.dtype)
            out = r if out is None else out + r
        out = jnp.moveaxis(out, 1, -1).reshape(B_, D_, H_, W_, co)
        return out + b

    def in_dot(h, scale, bias):
        B_, D_, H_, W_, C_ = h.shape
        n = float(D_ * H_ * W_)
        h2 = h.reshape(B_, D_ * H_ * W_, C_)
        ones = jnp.ones((D_ * H_ * W_,), h.dtype)
        s1 = jax.lax.dot_general(
            ones, h2, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (B, C) f32
        s2 = jax.lax.dot_general(
            ones, (h2 * h2), (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        mean32 = (s1 / n).reshape(B_, 1, 1, 1, C_)
        m2 = (s2 / n).reshape(B_, 1, 1, 1, C_)
        var = jnp.maximum(m2 - jnp.square(mean32), 0.0)
        inv = jax.lax.rsqrt(var + eps).astype(h.dtype)
        return (h - mean32.astype(h.dtype)) * (inv * scale) + bias

    def make_chain(conv_fn, in_fn):
        def chain(x, ws):
            h = x
            for w, b, s, bb in zip(ws, bs, sc, bi):
                h = conv_fn(h, w, b)
                h = in_fn(h, s, bb)
                h = _leaky(h, 0.01)
            return h
        return chain

    def chain_bdchw(x, ws):
        """End-to-end (B, D, C, H, W) carrier: tap slices on D, the (B,D)
        batch merge is a leading-dims reshape (layout-free), convs NCHW,
        IN reduces dims (1,3,4)."""
        h = jnp.moveaxis(x, -1, 2)   # (B, D, C, H, W) — once per chain
        for w, b, s, bb in zip(ws, bs, sc, bi):
            kd, kh, kw, ci, co = w.shape
            B_, D_, C_, H_, W_ = h.shape
            xpad = jnp.pad(h, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
            dn2 = jax.lax.conv_dimension_numbers(
                (B_ * D_, C_, H_, W_), (co, ci, kh, kw),
                ("NCHW", "OIHW", "NCHW"))
            out = None
            for kz in range(kd):
                xs = jax.lax.slice(
                    xpad, (0, kz, 0, 0, 0), (B_, kz + D_, C_, H_, W_))
                r = jax.lax.conv_general_dilated(
                    xs.reshape(B_ * D_, C_, H_, W_),
                    jnp.transpose(w[kz], (3, 2, 0, 1)), (1, 1),
                    [(1, 1), (1, 1)], dimension_numbers=dn2,
                    preferred_element_type=h.dtype)
                out = r if out is None else out + r
            h = out.reshape(B_, D_, co, H_, W_) + b[None, None, :, None, None]
            # IN over (D, H, W) with channel on dim 2
            mean32 = jnp.mean(h, axis=(1, 3, 4), keepdims=True,
                              dtype=jnp.float32)
            m2 = jnp.mean(jnp.square(h), axis=(1, 3, 4), keepdims=True,
                          dtype=jnp.float32)
            var = jnp.maximum(m2 - jnp.square(mean32), 0.0)
            inv = jax.lax.rsqrt(var + eps).astype(h.dtype)
            h = ((h - mean32.astype(h.dtype))
                 * (inv * s[None, None, :, None, None])
                 + bb[None, None, :, None, None])
            h = _leaky(h, 0.01)
        return jnp.moveaxis(h, 2, -1)

    def chain_zpackh(x, ws, max_lanes=128):
        """zpack chain with DGTTA_ZPACK_CROSS=halo (single dense conv over
        a z-halo-extended carrier instead of main + 2 crossing convs)."""
        os.environ["DGTTA_ZPACK_CROSS"] = "halo"
        try:
            return chain_zpack(x, ws, max_lanes=max_lanes)
        finally:
            os.environ.pop("DGTTA_ZPACK_CROSS", None)

    def chain_zpack(x, ws, max_lanes=128):
        """z-packed-channels carrier (models/unet_zpack.py): pack G z-slices
        into lanes once, run the convs as dense G*C-channel 2D convs + tiny
        crossing convs, IN/leaky in packed space, unpack once."""
        from dg_tta_tpu.models.unet_zpack import (
            _group_for, _instance_norm_packed, conv_packed, pack_z, unpack_z)
        G = _group_for(x.shape[-1], x.shape[1], max_lanes)
        h = pack_z(x, G)
        for w, b, s, bb in zip(ws, bs, sc, bi):
            h = conv_packed(h, w, b, G)
            h = _instance_norm_packed(h, s, bb, eps, G)
            h = _leaky(h, 0.01)
        return unpack_z(h, G)

    chains = {
        "ztap": make_chain(lambda h, w, b: _conv(h, w, b, (1, 1, 1)),
                           lambda h, s, b: _instance_norm(h, s, b, eps)),
        "zpack": chain_zpack,
        # G=2 cap: fully-dense band (x1.0 structural FLOPs) at 64 lanes vs
        # zpack's G=4 (x1.6 FLOPs, 128 lanes) — see unet_zpack._group_for
        "zpack64": lambda x, ws: chain_zpack(x, ws, max_lanes=64),
        "zpackh": chain_zpackh,
        "zpack64h": lambda x, ws: chain_zpackh(x, ws, max_lanes=64),
        "3d": make_chain(conv3d_direct,
                         lambda h, s, b: _instance_norm(h, s, b, eps)),
        "dotin": make_chain(lambda h, w, b: _conv(h, w, b, (1, 1, 1)),
                            in_dot),
        "nchw": make_chain(conv_ztap_nchw,
                           lambda h, s, b: _instance_norm(h, s, b, eps)),
        "bdchw": chain_bdchw,
    }

    ref_out = None
    res = {}
    for name in variants:
        chain = chains[name]
        f = jax.jit(chain)
        g = jax.jit(jax.grad(
            lambda ws, x: jnp.sum(chain(x, ws).astype(jnp.float32) ** 2)))
        out = np.asarray(f(x, ws), np.float32)
        if ref_out is None:
            ref_out = out
        else:
            err = float(np.abs(out - ref_out).max())
            res[f"{name}_err"] = round(err, 5)
        for tag, fn in ((f"fwd_{name}", lambda: f(x, ws)),
                        (f"bwd_{name}", lambda: g(ws, x))):
            o = fn()
            jax.block_until_ready(o)
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                o = fn()
                jax.block_until_ready(o)
                ts.append(time.perf_counter() - t0)
            res[f"{tag}_ms"] = round(min(ts) * 1e3, 2)
            print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
