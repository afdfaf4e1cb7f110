"""Split-dispatch TTA epoch: warps and the U-Net never share an XLA program.

Measured on v5e (tools/probe_*.py, PERF.md "gather cliff"): XLA-TPU's fast
dynamic-gather emitter (~2.5 us per 1.6M-index corner gather) only fires
when the gather's operand is a small (~6 MB) f32 PROGRAM INPUT and the
program contains at most ~2 warps' worth of gathers and no dot-lowered
ops.  Everything else — bf16 operands, multi-channel slices, intermediates
produced next to convolutions, or >~4 warps in one program — falls onto a
serial emitter 400-1000x slower.  The fused epoch program was ~90% gather
time because of this.

This module therefore runs the reference TTA step (tta.py:221-279) as a
pipeline of small reusable programs, dispatched from Python:

  p_extract   patch draw per member                 (no gathers)
  p_gin       GIN intensity aug (optional)          (convs, no gathers)
  p_thetas    branch affines + inverses + |det|     (tiny)
  warp_border one (member, branch) input warp       (8B gathers - fast form)
  P2          U-Net forward via jax.vjp             (convs/dots)
  unwarp_zero one (member, branch, channel) unwarp  (8B gathers - fast form)
  p_loss      consistency loss + d loss/d unwarped  (elementwise only)
  unwarp_T    adjoint warp per channel cotangent    (8B gathers - fast form)
  P4          U-Net backward (the vjp call)         (convs/dots)
  p_accum     gradient accumulation                 (donated add)
  p_update    masked AdamW                          (donated)

Per-step dispatch count is ~(4 + 4*E*n_opt); at ~40 us a dispatch this is
single-digit milliseconds against ~100 ms of U-Net compute.

Scope: affine spatial augmentation and non-MIND models (the deformable
field generator and the MIND noise key would re-introduce mixed programs);
`tta_one_volume` falls back to the fused engine otherwise.  The math is
the reference's exactly (same primitives as tta/engine.py); the PRNG
streams are member-id-keyed and member-stable for resume, but differ at
the bit level from the fused engine's.
"""

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dg_tta_tpu.core.fields import get_rand_affine
from dg_tta_tpu.core.grid import affine_grid, grid_sample_flat
from dg_tta_tpu.core.losses import consistency_loss_flat
from dg_tta_tpu.core.patches import extract_batch
from dg_tta_tpu.models.network import Model
from dg_tta_tpu.tta.engine import _in_branch, make_optimizer
from dg_tta_tpu.tta.plan import TTAPlan


def split_supported(model: Model, plan: TTAPlan) -> bool:
    """The split path covers the flagship configs; see module docstring."""
    return (plan.spatial_aug_type == "affine"
            and not (model.uses_mind and model.mind_noise_scale))


@dataclasses.dataclass(frozen=True)
class SplitTTAFunctions:
    init_opt_state: Callable
    epoch_train: Callable
    epoch_fwd: Callable
    eval_step: Callable
    grads_enabled: bool


def make_split_tta_functions(
    model: Model,
    plan: TTAPlan,
    map_idxs_pretrain,
    map_idxs_tta,
    modify_input_fn: Optional[Callable] = None,
    modify_output_fn: Optional[Callable] = None,
    modify_after_mapping_fn: Optional[Callable] = None,
    patch_group: int = 1,
    ensemble: int = 1,
) -> SplitTTAFunctions:
    """Build the split-dispatch pipeline for chunks of `ensemble` members.

    Global member ids are DATA, not trace constants: every per-epoch entry
    point takes a `member_ids` (E,) int32 array and folds it into the PRNG
    streams with `jax.random.fold_in` on traced values.  One compile of the
    big model fwd/bwd programs therefore serves every member chunk of the
    same size (the driver's full-size default is chunk=1 over 3 members —
    id-keyed programs would recompile the 6-12-minute U-Net programs 3x per
    volume for identical HLO)."""
    patch_size = model.patch_size
    assert plan.patches_to_be_accumulated % patch_group == 0
    assert split_supported(model, plan)
    B = plan.batch_size * patch_group
    n_acc = plan.patches_to_be_accumulated // patch_group
    E = ensemble
    map_pre_static = [int(i) for i in np.asarray(map_idxs_pretrain).tolist()]
    map_tta_static = [int(i) for i in np.asarray(map_idxs_tta).tolist()]
    n_opt = len(map_pre_static)
    intensity_on = plan.intensity_aug_function == "GIN"
    grads_enabled = plan.have_grad_in in ("branch_a", "both")
    N = int(np.prod(patch_size))
    spatial_a = _in_branch(plan.do_spatial_aug_in, "branch_a")
    spatial_b = _in_branch(plan.do_spatial_aug_in, "branch_b")
    gin_a = intensity_on and _in_branch(plan.do_intensity_aug_in, "branch_a")
    gin_b = intensity_on and _in_branch(plan.do_intensity_aug_in, "branch_b")

    # ---- small reusable programs ----------------------------------------
    @jax.jit
    def p_extract(key, member_ids, vols, shapes):
        """Per-member patch draws; no gathers (sample_unit_stride)."""
        out = []
        for e in range(E):
            mk = jax.random.fold_in(key, member_ids[e])
            k_patch, _ = jax.random.split(mk)
            out.append(extract_batch(k_patch, vols, shapes, patch_size, B)[0])
        return tuple(out)                                  # E x (B,*patch,C)

    @jax.jit
    def p_thetas(key, member_ids):
        """Branch affines for every member: (E, B, 3, 4) x4 + |det| (E, B)."""
        tha, thai, thb, thbi, adja, adjb = [], [], [], [], [], []
        for e in range(E):
            mk = jax.random.fold_in(key, member_ids[e])
            _, k_aug = jax.random.split(mk)
            ka, kb = jax.random.split(k_aug)
            ta, tai = get_rand_affine(jax.random.split(ka)[1], B)
            tb, tbi = get_rand_affine(jax.random.split(kb)[1], B)
            for th, lst in ((ta, tha), (tai, thai), (tb, thb), (tbi, thbi)):
                lst.append(th)
            for th, lst in ((ta, adja), (tb, adjb)):
                R = th[:, :, :3]
                lst.append(jnp.abs(jnp.einsum(
                    "bi,bi->b", R[:, :, 0],
                    jnp.cross(R[:, :, 1], R[:, :, 2], axis=-1))))
        return (jnp.stack(tha), jnp.stack(thai), jnp.stack(thb),
                jnp.stack(thbi), jnp.stack(adja), jnp.stack(adjb))

    @jax.jit
    def p_gin(key, mid, imgs, salt):
        """GIN intensity aug on one member-branch batch (convs, no warps)."""
        from dg_tta_tpu.ops.gin import gin_aug
        return gin_aug(jax.random.fold_in(jax.random.fold_in(key, mid), salt),
                       imgs)

    @jax.jit
    def warp_border(x, theta):
        """Forward branch warp of one (member, branch): x (B, *patch, C=1)."""
        grid = affine_grid(theta, patch_size, align_corners=False)
        xf = x.reshape(B, 1, N).astype(jnp.float32)
        xf = grid_sample_flat(xf, patch_size, grid, padding_mode="border",
                              align_corners=False)
        return xf.reshape(B, *patch_size, 1)

    @jax.jit
    def unwarp_zero(ch, theta_inv):
        """Inverse warp of one logits channel: ch (B, 1, N) f32."""
        grid_inv = affine_grid(theta_inv, patch_size, align_corners=False)
        return grid_sample_flat(ch, patch_size, grid_inv,
                                padding_mode="zeros", align_corners=False)

    @jax.jit
    def unwarp_transpose(g, theta, adj):
        """Adjoint of unwarp_zero (engine._wwi_bwd): gather the cotangent by
        the FORWARD grid, scale by |det| (exact-inverse adjoint)."""
        grid = affine_grid(theta, patch_size, align_corners=False)
        out = grid_sample_flat(g, patch_size, grid, padding_mode="zeros",
                               align_corners=False)
        return out * adj.reshape(-1, 1, 1)

    # ---- model forward / backward (dot programs) --------------------------
    def _model_fwd_inner(params_stacked, xs):
        """xs: tuple of 2E (B, *patch, C) warped inputs, order
        (m0_a, m0_b, m1_a, ...).  Returns tuple of 2*E*n_opt channel buffers
        (B, 1, N) f32 — separate small outputs so every unwarp dispatch gets
        a whole prefetchable operand."""
        x = jnp.stack(xs).reshape(E, 2, B, *xs[0].shape[1:])
        x = x.reshape(E, 2 * B, *xs[0].shape[1:])

        def one(p, xx):
            if modify_input_fn is not None:
                xx = modify_input_fn(xx)
            # full class-count head: a tiny-channel (C_out=n_opt) head conv
            # would poison the fast gather emitter process-wide (PERF.md);
            # the label mapping happens below as static row slices
            lg = model.apply(p, xx)
            if modify_output_fn is not None:
                lg = modify_output_fn(lg)
            return jnp.moveaxis(lg, -1, 1).astype(jnp.float32)  # (2B,C,*p)

        # python-unrolled over members: vmap over the params axis would turn
        # every conv into a grouped conv (invalid when E doesn't divide the
        # output features, and a worse MXU shape when it does)
        lg = jnp.stack([
            one(jax.tree.map(lambda a: a[e], params_stacked), x[e])
            for e in range(E)])                        # (E, 2B, C, *patch)
        n_cls = lg.shape[2]
        lg = lg.reshape(E, 2, B, n_cls, N)
        return tuple(lg[e, br, :, map_pre_static[c]][:, None]
                     for e in range(E) for br in range(2)
                     for c in range(n_opt))

    model_fwd = jax.jit(_model_fwd_inner)

    @jax.jit
    def model_bwd(params_stacked, xs, g_chans):
        """Fixed backward program: grad wrt params of <model(params, xs), g>.
        Linear in the model output, so this IS the vjp with cotangent
        g_chans; the forward is recomputed inside (rematerialization).  A
        per-step jax.vjp would re-linearize the huge U-Net jaxpr on the host
        every call (~seconds); this program traces once."""
        def inner(p):
            outs = _model_fwd_inner(p, xs)
            return sum(jnp.vdot(o, g) for o, g in zip(outs, g_chans))
        return jax.grad(inner)(params_stacked)

    # ---- loss on unwarped channels (elementwise program) ------------------
    def _after_mapping(l):
        """Apply the user's after-mapping hook to (E, B, n_opt, N) mapped
        logits in the channels-last layout the hook contract uses (the fused
        engine applies it right after the head-folded mapping; here mapping
        happened as static slices in model_fwd, so this is the first point
        where mapped channels exist — driver.py hook-order note)."""
        if modify_after_mapping_fn is None:
            return l
        ll = jnp.moveaxis(l.reshape(E * B, n_opt, *patch_size), 1, -1)
        ll = modify_after_mapping_fn(ll)
        return jnp.moveaxis(ll, -1, 1).reshape(E, B, n_opt, N)

    @jax.jit
    def p_loss(chans_a, chans_b):
        """chans_{a,b}: tuples of E*n_opt (B, 1, N) f32 unwarped channels.
        Returns per-member losses (E,) and the cotangents for each input."""
        la = jnp.stack(chans_a).reshape(E, n_opt, B, N).transpose(0, 2, 1, 3)
        lb = jnp.stack(chans_b).reshape(E, n_opt, B, N).transpose(0, 2, 1, 3)

        def f(la, lb):
            losses = jax.vmap(
                lambda a, b: consistency_loss_flat(a, b, start_class=1))(
                _after_mapping(la), _after_mapping(lb))
            return jnp.sum(losses), losses

        (_, losses), (ga, gb) = jax.value_and_grad(
            f, argnums=(0, 1), has_aux=True)(la, lb)
        ga = ga.transpose(0, 2, 1, 3).reshape(E * n_opt, B, 1, N)
        gb = gb.transpose(0, 2, 1, 3).reshape(E * n_opt, B, 1, N)
        return (losses, tuple(ga[i] for i in range(E * n_opt)),
                tuple(gb[i] for i in range(E * n_opt)))

    @jax.jit
    def p_loss_only(chans_a, chans_b):
        la = jnp.stack(chans_a).reshape(E, n_opt, B, N).transpose(0, 2, 1, 3)
        lb = jnp.stack(chans_b).reshape(E, n_opt, B, N).transpose(0, 2, 1, 3)
        return jax.vmap(
            lambda a, b: consistency_loss_flat(a, b, start_class=1))(
            _after_mapping(la), _after_mapping(lb))

    # ---- accumulate + update ---------------------------------------------
    @partial(jax.jit, donate_argnums=(0, 1))
    def p_accum(grads, loss_sum, g, loss):
        return jax.tree.map(jnp.add, grads, g), loss_sum + loss

    _tx = {}

    def _get_tx(params_one):
        if "tx" not in _tx:
            _tx["tx"] = make_optimizer(plan, params_one)
        return _tx["tx"]

    @partial(jax.jit, donate_argnums=(0, 1))
    def p_update(params_stacked, opt_state, grads):
        def one(p, o, g):
            g = jax.tree.map(lambda x: x / n_acc, g)
            updates, o = _get_tx(p).update(g, o, p)
            return optax.apply_updates(p, updates), o
        return jax.vmap(one)(params_stacked, opt_state, grads)

    def init_opt_state(params_stacked):
        t = _get_tx(jax.tree.map(lambda a: a[0], params_stacked))
        return jax.jit(jax.vmap(t.init))(params_stacked)

    # ---- one accumulation step (python-orchestrated pipeline) -------------
    def _aug_inputs(k, member_ids, vols, shapes):
        patches = p_extract(k, member_ids, vols, shapes)
        tha, thai, thb, thbi, adja, adjb = p_thetas(k, member_ids)
        xs = []
        for e in range(E):
            xa = patches[e]
            xb = patches[e]
            if gin_a:
                xa = p_gin(k, member_ids[e], xa, 2 * 1)
            if gin_b:
                xb = p_gin(k, member_ids[e], xb, 2 * 2)
            if spatial_a:
                xa = warp_border(xa, tha[e])
            if spatial_b:
                xb = warp_border(xb, thb[e])
            xs.extend([xa, xb])
        return tuple(xs), (tha, thai, adja), (thb, thbi, adjb)

    def _unwarp_all(chans, thetas_inv, spatial):
        """chans: tuple of 2*E*n_opt model outputs; pick one branch's E*n_opt
        channels and unwarp each in its own dispatch."""
        out = []
        for e in range(E):
            for c in range(n_opt):
                ch = chans[(2 * e + (0 if spatial == "a" else 1)) * n_opt + c]
                th_inv = thetas_inv[e]
                out.append(unwarp_zero(ch, th_inv))
        return tuple(out)

    def train_step(params_stacked, k, member_ids, vols, shapes):
        import os
        import time as _time
        timing = os.environ.get("DGTTA_SPLIT_TIMING")

        def tick(label, val):
            if timing:
                jax.block_until_ready(val)
                t = _time.perf_counter()
                dt = t - tick.t0
                tick.t0 = t
                print(f"    [split] {label}: {dt*1e3:8.2f} ms", flush=True)
            return val
        tick.t0 = _time.perf_counter()

        xs, (tha, thai, adja), (thb, thbi, adjb) = _aug_inputs(
            k, member_ids, vols, shapes)
        tick("aug", xs)
        logits = tick("model_fwd", model_fwd(params_stacked, xs))
        ua = (_unwarp_all(logits, thai, "a") if spatial_a
              else tuple(logits[2 * e * n_opt + c]
                         for e in range(E) for c in range(n_opt)))
        ub = (_unwarp_all(logits, thbi, "b") if spatial_b
              else tuple(logits[(2 * e + 1) * n_opt + c]
                         for e in range(E) for c in range(n_opt)))
        tick("unwarp", (ua, ub))
        losses, ga, gb = p_loss(ua, ub)
        tick("loss", losses)
        # adjoint warps per channel, then model backward
        g_chans = []
        for e in range(E):
            for br, (g_all, th, adj, spatial) in enumerate(
                    ((ga, tha, adja, spatial_a), (gb, thb, adjb, spatial_b))):
                for c in range(n_opt):
                    g = g_all[e * n_opt + c]
                    if spatial:
                        g = unwarp_transpose(g, th[e], adj[e])
                    g_chans.append(g)
        tick("unwarp_T", g_chans)
        g_params = tick("model_bwd",
                        model_bwd(params_stacked, xs, tuple(g_chans)))
        return losses, g_params

    def epoch_train(params_stacked, opt_state, key, member_ids, vols, shapes):
        grads = jax.tree.map(jnp.zeros_like, params_stacked)
        loss_sum = jnp.zeros((E,), jnp.float32)
        for i in range(n_acc):
            k = jax.random.fold_in(key, i)
            loss, g_params = train_step(params_stacked, k, member_ids, vols,
                                        shapes)
            grads, loss_sum = p_accum(grads, loss_sum, g_params, loss)
        params_stacked, opt_state = p_update(params_stacked, opt_state,
                                             grads)
        return params_stacked, opt_state, loss_sum / n_acc

    def epoch_fwd(params_stacked, key, member_ids, vols, shapes):
        loss_sum = jnp.zeros((E,), jnp.float32)
        for i in range(n_acc):
            k = jax.random.fold_in(key, i)
            xs, (tha, thai, adja), (thb, thbi, adjb) = _aug_inputs(
                k, member_ids, vols, shapes)
            logits = model_fwd(params_stacked, xs)
            ua = (_unwarp_all(logits, thai, "a") if spatial_a
                  else tuple(logits[2 * e * n_opt + c]
                             for e in range(E) for c in range(n_opt)))
            ub = (_unwarp_all(logits, thbi, "b") if spatial_b
                  else tuple(logits[(2 * e + 1) * n_opt + c]
                             for e in range(E) for c in range(n_opt)))
            loss_sum = loss_sum + p_loss_only(ua, ub)
        return loss_sum / n_acc

    # ---- eval: split-local, gather-safe -----------------------------------
    # The fused eval folds the label mapping into the seg head; that tiny-
    # channel head conv would permanently poison the process-wide fast
    # gather emitter (PERF.md mechanism 1), flipping every subsequent
    # warp_border/unwarp dispatch onto the ~400x serial path and negating
    # the split engine entirely.  Run the FULL class-count head here and map
    # channels with static slices, like model_fwd does (advisor r2 finding).
    from dg_tta_tpu.core.labels import map_label_argmaxed
    from dg_tta_tpu.core.losses import dice_coeff

    B_eval = plan.batch_size

    def _eval_one(params, key, vols, shapes, labels):
        """Center-patch pseudo-Dice vs GT (tta.py:283-338), full-width head."""
        k_patch, k_model = jax.random.split(key)
        imgs, labs = extract_batch(k_patch, vols, shapes, patch_size, B_eval,
                                   labels_padded=labels, fixed=True)
        if modify_input_fn is not None:
            imgs = modify_input_fn(imgs)
        logits = model.apply(params, imgs, key=k_model)  # full class count
        if modify_output_fn is not None:
            logits = modify_output_fn(logits)
        lg = jnp.concatenate([logits[..., c:c + 1] for c in map_pre_static],
                             axis=-1)
        if modify_after_mapping_fn is not None:
            lg = modify_after_mapping_fn(lg)
        pred = jnp.argmax(lg, axis=-1)
        gt = map_label_argmaxed(labs[..., 0].astype(jnp.int32),
                                jnp.asarray(map_tta_static))
        return jnp.nanmean(dice_coeff(pred, gt, n_opt))

    eval_step = jax.jit(jax.vmap(_eval_one, in_axes=(0, 0, None, None, None)))

    return SplitTTAFunctions(
        init_opt_state=init_opt_state,
        epoch_train=epoch_train,
        epoch_fwd=epoch_fwd,
        eval_step=eval_step,
        grads_enabled=grads_enabled,
    )
