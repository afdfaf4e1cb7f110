"""The TTA adaptation engine: one fused jitted epoch per optimizer step.

Reference semantics: /root/reference/dg_tta/tta/tta.py:157-374 (driver loop)
and tta.py:480-579 (`calc_branch`).  Re-designed for XLA:

* One EPOCH is one compiled program: a `lax.scan` over
  `patches_to_be_accumulated` patch draws, each computing the two-branch
  consistency loss and its gradient, accumulated and applied once via a
  parameter-masked AdamW — instead of 16 eager backward() calls.
* The `ensemble_count` independent adaptation runs of a volume are `vmap`-ed
  into one program (they differ only in their PRNG streams), turning the
  reference's serial ensemble loop into batched device work.
* Patch extraction happens inside the program from bucket-padded volumes
  resident in HBM; no host transfers inside the adaptation loop.

Reference quirks preserved (documented):
* `have_grad_in` gates on the CONFIG value only, never the branch id
  (tta.py:496-498): "branch_a" and "both" put gradients in BOTH branches;
  "branch_b" disables gradients everywhere (adaptation becomes a no-op).
* The inverse warp pads with zeros while the forward warp pads with border
  values (tta.py:549-551 vs :573-575); the zero band defines the
  common-content mask of the loss (tta.py:262-265).
* MIND's descriptor noise stays active during TTA and eval (mind.py:150-152).
* Epochs before `start_tta_at_epoch` compute/log the loss but do not update
  (tta.py:274-279).
"""

import dataclasses
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dg_tta_tpu.core.fields import get_disp_field, get_rand_affine
from dg_tta_tpu.core.grid import (affine_grid, grid_sample, grid_sample_flat,
                                  identity_grid)
from dg_tta_tpu.core.labels import map_label_argmaxed, map_label_logits
from dg_tta_tpu.core.losses import (consistency_loss, consistency_loss_flat,
                                    dice_coeff)
from dg_tta_tpu.core.patches import extract_batch
from dg_tta_tpu.models.network import Model
from dg_tta_tpu.tta.plan import TTAPlan


def _in_branch(setting: str, branch_id: str) -> bool:
    return setting in (branch_id, "both")


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _warp_with_inverse(x, grid, grid_inv, inv_det, spatial, padding_mode):
    """grid_sample_flat whose backward uses the analytically inverse warp.

    Operates on channels-first FLAT (B, C, N) logits — the TPU-fast gather
    form (core/grid.py:grid_sample_flat) — with N = prod(spatial) on both
    sides (the TTA warps are endomorphisms of the patch).

    The true VJP of a resample is a scatter-add — pathologically slow on
    TPU.  For the TTA branch warps we always hold the exact inverse map
    (affine theta_inv / inverse-consistent displacement field), and the
    continuous adjoint of x -> x∘θ is y -> |det θ|^-1 · y∘θ^-1; with
    near-identity warps the trilinear-discretization error of this adjoint
    is O(h^2).  The TTA loss is itself a stochastic patch objective, so the
    approximation changes gradients far less than one patch redraw.  Exact
    autograd remains available via make_tta_functions(exact_warp_grad=True).

    On TPU the C=n_opt forward/adjoint warps route through the Pallas
    staged-gather kernel (ops/warp_pallas.py) — the XLA gather emitters run
    these ~400x slower inside the fused program (PERF.md gather cliff).
    """
    from dg_tta_tpu.ops.warp_pallas import warp_flat_auto
    return warp_flat_auto(x, spatial, grid, padding_mode=padding_mode,
                          align_corners=False)


def _wwi_fwd(x, grid, grid_inv, inv_det, spatial, padding_mode):
    out = _warp_with_inverse(x, grid, grid_inv, inv_det, spatial,
                             padding_mode)
    return out, (grid_inv, inv_det)


def _wwi_bwd(spatial, padding_mode, res, g):
    from dg_tta_tpu.ops.warp_pallas import warp_flat_auto
    grid_inv, inv_det = res
    dx = warp_flat_auto(g, spatial, grid_inv, padding_mode="zeros",
                        align_corners=False)
    dx = dx * jnp.reshape(inv_det, (-1,) + (1,) * (dx.ndim - 1)).astype(dx.dtype)
    return dx, None, None, None


_warp_with_inverse.defvjp(_wwi_fwd, _wwi_bwd)


def params_with_grad_mask(params, mode: str):
    """Trainability mask replicating fix_all/release_{all,norms}/encoder
    (torch_utils.py:120-137, applied at tta.py:203-212)."""
    assert mode in ("all", "norms", "encoder")
    if mode == "all":
        return jax.tree.map(lambda _: True, params)

    def label_leaf(path, _):
        keys = [p.key for p in path if hasattr(p, "key")]
        if mode == "norms":
            return "norm" in keys
        return keys[0] == "encoder"

    return jax.tree_util.tree_map_with_path(label_leaf, params)


def make_optimizer(plan: TTAPlan, params):
    """AdamW with torch defaults (betas 0.9/0.999, eps 1e-8, wd 0.01 —
    tta.py:185 uses torch.optim.AdamW defaults), applied only to the released
    parameter subset; frozen leaves receive a hard zero update."""
    mask = params_with_grad_mask(params, plan.params_with_grad)
    labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
    tx = optax.multi_transform(
        {
            "train": optax.adamw(plan.lr, b1=0.9, b2=0.999, eps=1e-8,
                                 weight_decay=0.01),
            "freeze": optax.set_to_zero(),
        },
        labels,
    )
    return tx


@dataclasses.dataclass(frozen=True)
class TTAFunctions:
    """Jitted entry points for one (model, plan, bucket-shape) combination."""

    init_opt_state: Callable
    epoch_train: Callable  # (params, opt, key, vols, shapes) -> (params, opt, loss)
    epoch_fwd: Callable    # (params, key, vols, shapes) -> loss
    eval_step: Callable    # (params, key, vols, shapes, labels) -> dice
    member_run: Callable   # (params, key, vols, shapes[, labels]) ->
    #                        (params, losses (epochs,), dices (epochs,))
    grads_enabled: bool


def make_tta_functions(
    model: Model,
    plan: TTAPlan,
    map_idxs_pretrain,
    map_idxs_tta,
    modify_input_fn: Optional[Callable] = None,
    modify_output_fn: Optional[Callable] = None,
    num_tta_classes: Optional[int] = None,
    remat: bool = False,
    exact_warp_grad: bool = False,
    patch_group: int = 1,
) -> TTAFunctions:
    """Build the jitted TTA step functions.

    Args:
      map_idxs_pretrain: (C_opt,) channel gather indices model->optimized.
      map_idxs_tta: (C_opt,) value rewrite indices tta-GT->optimized.
      modify_input_fn / modify_output_fn: the user "modifier functions"
        (config_log_utils.py:44-69) as plain callables; input runs after the
        branch augmentation, before the model (hook order, model_utils.py:21-33),
        output runs after label mapping (tta.py:566).
      patch_group: fold this many accumulation steps into the batch dimension
        — mathematically identical (the consistency loss and the accumulated
        gradient both average per-sample), but each device step carries
        patch_group x more MXU work.  Must divide patches_to_be_accumulated.
        Memory scales ~linearly with it.
    """
    patch_size = model.patch_size
    assert plan.patches_to_be_accumulated % patch_group == 0, (
        plan.patches_to_be_accumulated, patch_group)
    B = plan.batch_size * patch_group
    B_eval = plan.batch_size
    n_acc = plan.patches_to_be_accumulated // patch_group
    map_pre = jnp.asarray(map_idxs_pretrain)
    map_tta = jnp.asarray(map_idxs_tta)
    _map_pre_static = [int(i) for i in np.asarray(map_idxs_pretrain).tolist()]
    n_opt = int(map_pre.shape[0])
    intensity_on = plan.intensity_aug_function == "GIN"
    grads_enabled = plan.have_grad_in in ("branch_a", "both")
    ident = identity_grid(patch_size, align_corners=False)
    # Affine branch warps route through the MXU 3-pass shear resampler
    # (ops/warp_shear.py) on TPU: gather-free, exact autodiff adjoint, and
    # ~20x cheaper than the slow-emitter gathers in the fused program
    # (PERF.md round 3).  DGTTA_AFFINE_SHEAR=0 disables, =1 forces (any
    # backend); "auto" enables on the TPU backend.  exact_warp_grad keeps
    # the strict trilinear XLA path (the shear filter differs O(h^2) on
    # rotation/shear terms — warp_shear.py fidelity contract).
    import os
    _shear_env = os.environ.get("DGTTA_AFFINE_SHEAR", "auto")
    use_shear = (plan.spatial_aug_type == "affine" and not exact_warp_grad
                 and (_shear_env == "1"
                      or (_shear_env == "auto"
                          and jax.default_backend() == "tpu")))
    shear_m_dtype = ("bfloat16"
                     if getattr(model, "compute_dtype", None) == "bfloat16"
                     else None)
    # Relative-frame consistency (r4 verdict item 1b): when BOTH branches
    # warp affinely, warp branch-a's logits ONCE by theta_rel =
    # theta_a^-1 ∘ theta_b into branch-b's frame instead of inverse-warping
    # both branches to the original frame — one C=n_opt resample (forward
    # AND backward) instead of two, halving the warp tail.  Exactly the
    # original loss reparametrized by theta_b: the domain
    # Omega ∩ theta_a Omega ∩ theta_b Omega is reproduced by the relative
    # warp's own zero band plus the analytic inside-mask of theta_b, and
    # the constant Jacobian |det theta_b| cancels in the dice ratio (it is
    # EXACT for integer-voxel translations — tests/test_relative_frame.py —
    # and O(h) in the off-grid/rotation terms).  Approximation of the same
    # class as the shear resampler/analytic adjoint: DEFAULT on TPU since
    # r5 (-9.9% member_run measured, PERF.md r5a) with the end-to-end
    # accuracy delta vs ground truth bounded <=0.01 Dice in CI
    # (tests/test_approx_budget.py::test_relative_frame_accuracy_delta...).
    # DGTTA_REL_FRAME: 0 = off, 1 = force any backend, auto = TPU only.
    _rel_env = os.environ.get("DGTTA_REL_FRAME", "auto")
    use_relative = (use_shear and plan.do_spatial_aug_in == "both"
                    and (_rel_env == "1"
                         or (_rel_env == "auto"
                             and jax.default_backend() == "tpu")))
    # Deformable branch warps: the joint gather form FAULTS the v5e worker
    # at runtime in the full-size member program (PERF.md r5d), so on TPU
    # they route through the sequential per-axis banded resampler
    # (ops/warp_shear.warp_grid_shear, O(|d|*grad d) cross-term contract).
    # DGTTA_DISP_SHEAR: 0 = joint gather everywhere, 1 = force, auto = TPU.
    _disp_env = os.environ.get("DGTTA_DISP_SHEAR", "auto")
    use_disp_shear = (plan.spatial_aug_type == "deformable"
                      and not exact_warp_grad
                      and (_disp_env == "1"
                           or (_disp_env == "auto"
                               and jax.default_backend() == "tpu")))
    # Half-resolution field generation for the deformable family: the
    # scaling-and-squaring + inverse-consistency loop is the dominant cost
    # of the deformable member on TPU; running it on a 2x lattice is the
    # same math on a coarser grid (core/fields.get_disp_field docstring).
    # DGTTA_DISP_HALFRES: 0 = full-res, 1 = force, auto = TPU.
    _halfres_env = os.environ.get("DGTTA_DISP_HALFRES", "auto")
    disp_field_res = ("half"
                      if (plan.spatial_aug_type == "deformable"
                          and not exact_warp_grad
                          and (_halfres_env == "1"
                               or (_halfres_env == "auto"
                                   and jax.default_backend() == "tpu")))
                      else "full")

    def branch_aug(key, imgs, branch_id):
        """Pre-model augmentation of one branch; returns the augmented input
        and the (grid, grid_inv, adj_scale) needed to undo the warp."""
        k_int, k_sp = jax.random.split(key)
        x = imgs
        if intensity_on and _in_branch(plan.do_intensity_aug_in, branch_id):
            from dg_tta_tpu.ops.gin import gin_aug
            x = gin_aug(k_int, x)

        spatial = _in_branch(plan.do_spatial_aug_in, branch_id)
        warp_ctx = None
        if spatial:
            Cin = x.shape[-1]
            xf = jnp.moveaxis(x, -1, 1).reshape(B, Cin, -1)
            if plan.spatial_aug_type == "affine":
                theta, theta_inv = get_rand_affine(k_sp, B)
                if use_shear:
                    # MXU shear path: no grids, no adjoint scale — the
                    # unwarp differentiates exactly through the matmuls
                    from dg_tta_tpu.ops.warp_shear import warp_affine_shear
                    xf = warp_affine_shear(xf, theta, patch_size,
                                           padding_mode="border",
                                           align_corners=False,
                                           m_dtype_name=shear_m_dtype)
                    x = jnp.moveaxis(xf.reshape(B, Cin, *patch_size), 1, -1)
                    return x, ("shear", theta_inv, theta)
                grid = affine_grid(theta, patch_size, align_corners=False)
                grid_inv = affine_grid(theta_inv, patch_size,
                                       align_corners=False)
                # adjoint scale of the INVERSE warp: 1/|det(theta_inv)|.
                # Closed form (not jnp.linalg.det): the LU path emits pivot
                # gathers, which poison the process's fast gather emitter
                # (PERF.md 'gather cliff').
                R = theta[:, :, :3]
                adj_scale = jnp.abs(jnp.einsum(
                    "bi,bi->b", R[:, :, 0],
                    jnp.cross(R[:, :, 1], R[:, :, 2], axis=-1)))
            else:
                disp, disp_inv = get_disp_field(
                    k_sp, B, patch_size, factor=0.5, interpolation_factor=5,
                    warp_impl="shear" if use_disp_shear else "gather",
                    field_res=disp_field_res)
                grid = tuple(i[None] + d for i, d in zip(ident, disp))
                grid_inv = tuple(i[None] + d
                                 for i, d in zip(ident, disp_inv))
                if use_disp_shear:
                    from dg_tta_tpu.ops.warp_shear import warp_grid_shear
                    xf = warp_grid_shear(xf, grid, patch_size,
                                         padding_mode="border",
                                         align_corners=False,
                                         m_dtype_name=shear_m_dtype)
                    x = jnp.moveaxis(xf.reshape(B, Cin, *patch_size), 1, -1)
                    return x, ("dispshear", grid, grid_inv)
                # diffeomorphic near-identity field: |det(I + grad d)| ~ 1
                adj_scale = jnp.ones((B,))
            # warp in channels-first flat form (the TPU-fast gather layout;
            # for the 1-channel input both moveaxis are free dim-1 permutes).
            # No gradient flows here (x is input-derived), so the
            # non-differentiable Pallas path is safe.
            from dg_tta_tpu.ops.warp_pallas import warp_flat_auto
            xf = warp_flat_auto(xf, patch_size, grid,
                                padding_mode="border", align_corners=False)
            x = jnp.moveaxis(xf.reshape(B, Cin, *patch_size), 1, -1)
            warp_ctx = ("grid", grid, grid_inv, adj_scale)
        return x, warp_ctx

    def branch_unwarp_flat(logits_flat, warp_ctx):
        """Undo the branch warp on channels-first flat (B, C, N) logits."""
        if warp_ctx is None:
            return logits_flat
        if warp_ctx[0] == "shear":
            from dg_tta_tpu.ops.warp_shear import warp_affine_shear
            return warp_affine_shear(logits_flat, warp_ctx[1], patch_size,
                                     padding_mode="zeros",
                                     align_corners=False,
                                     m_dtype_name=shear_m_dtype)
        if warp_ctx[0] == "dispshear":
            # unwarp by the analytic inverse field; jax.grad through the
            # banded passes is the exact adjoint of this (approximate)
            # warp, so no |det| scale is needed (cf. the shear path)
            from dg_tta_tpu.ops.warp_shear import warp_grid_shear
            return warp_grid_shear(logits_flat, warp_ctx[2], patch_size,
                                   padding_mode="zeros",
                                   align_corners=False,
                                   m_dtype_name=shear_m_dtype)
        _, grid, grid_inv, adj_scale = warp_ctx
        if exact_warp_grad:
            return grid_sample_flat(logits_flat, patch_size, grid_inv,
                                    padding_mode="zeros",
                                    align_corners=False)
        # backward = gather by the forward grid (exact inverse at hand),
        # not a TPU-hostile scatter-add
        return _warp_with_inverse(logits_flat, grid_inv, grid, adj_scale,
                                  patch_size, "zeros")

    def both_branches(params, key, imgs):
        """Both branches through ONE batched model forward (2B batch): same
        math as two separate forwards, but twice the conv batch for MXU
        utilization and half the op dispatches.  Returns channels-first
        FLAT (B, C, N) logit pairs — unwarping and the consistency loss
        stay in the gather-friendly layout (no transposed gather outputs,
        see core/grid.py:grid_sample_flat)."""
        ka, kb, k_model = jax.random.split(key, 3)
        xa, ctx_a = branch_aug(ka, imgs, "branch_a")
        xb, ctx_b = branch_aug(kb, imgs, "branch_b")
        x = jnp.concatenate([xa, xb], axis=0)
        if modify_input_fn is not None:
            x = modify_input_fn(x)
        # label mapping folded into the seg head (static weight slices in
        # unet.head).  NOTE: this makes the head conv a tiny-channel op that
        # poisons the fast gather emitter (PERF.md), but the poisoned fused
        # program is still the fastest known full-size configuration — the
        # full-head + row-select alternative measured 3x slower end-to-end.
        logits = model.apply(params, x, key=k_model,
                             head_channel_idx=map_pre)
        if modify_output_fn is not None:
            logits = modify_output_fn(logits)
        lf = jnp.moveaxis(logits, -1, 1).reshape(2 * B, n_opt, -1)
        la, lb = lf[:B], lf[B:]
        if (use_relative and ctx_a is not None and ctx_b is not None
                and ctx_a[0] == "shear" and ctx_b[0] == "shear"):
            from dg_tta_tpu.core.fields import compose_affine
            from dg_tta_tpu.core.grid import affine_inside_mask_flat
            from dg_tta_tpu.ops.warp_shear import warp_affine_shear
            theta_rel = compose_affine(ctx_a[1], ctx_b[2])  # θa⁻¹ ∘ θb
            la_b = warp_affine_shear(la, theta_rel, patch_size,
                                     padding_mode="zeros",
                                     align_corners=False,
                                     m_dtype_name=shear_m_dtype)
            mask = affine_inside_mask_flat(ctx_b[2], patch_size)
            return la_b, lb * mask.astype(lb.dtype)
        return branch_unwarp_flat(la, ctx_a), branch_unwarp_flat(lb, ctx_b)

    if remat:
        # recompute the batched forward during backward instead of holding
        # its activations live (memory control for very large configs)
        both_branches = jax.checkpoint(both_branches)

    def patch_loss(params, key, imgs):
        la, lb = both_branches(params, key, imgs)   # channels-first flat
        return consistency_loss_flat(la, lb, start_class=1)

    def draw_and_loss(params, key, vols, shapes):
        k_patch, k_aug = jax.random.split(key)
        imgs, _ = extract_batch(k_patch, vols, shapes, patch_size, B)
        return patch_loss(params, k_aug, imgs)

    grad_fn = jax.value_and_grad(draw_and_loss)

    def epoch_train(params, opt_state, key, vols, shapes):
        def body(carry, k):
            g_acc, l_acc = carry
            loss, grads = grad_fn(params, k, vols, shapes)
            g_acc = jax.tree.map(jnp.add, g_acc, grads)
            return (g_acc, l_acc + loss), None

        zeros = jax.tree.map(jnp.zeros_like, params)
        (grads, loss_sum), _ = jax.lax.scan(
            body, (zeros, 0.0), jax.random.split(key, n_acc))
        grads = jax.tree.map(lambda g: g / n_acc, grads)
        tx = make_optimizer(plan, params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_sum / n_acc

    def epoch_fwd(params, key, vols, shapes):
        def body(l_acc, k):
            return l_acc + draw_and_loss(params, k, vols, shapes), None

        loss_sum, _ = jax.lax.scan(body, 0.0, jax.random.split(key, n_acc))
        return loss_sum / n_acc

    def eval_step(params, key, vols, shapes, labels):
        """Center-patch pseudo-Dice vs GT (tta.py:283-338)."""
        k_patch, k_model = jax.random.split(key)
        imgs, labs = extract_batch(k_patch, vols, shapes, patch_size, B_eval,
                                   labels_padded=labels, fixed=True)
        if modify_input_fn is not None:
            imgs = modify_input_fn(imgs)
        logits = model.apply(params, imgs, key=k_model,
                             head_channel_idx=map_pre)
        if modify_output_fn is not None:
            logits = modify_output_fn(logits)
        pred = jnp.argmax(logits, axis=-1)
        gt = map_label_argmaxed(labs[..., 0].astype(jnp.int32), map_tta)
        d = dice_coeff(pred, gt, n_opt)
        return jnp.nanmean(d)

    def init_opt_state(params):
        return make_optimizer(plan, params).init(params)

    n_ep = int(plan.epochs)
    start_ep = int(plan.start_tta_at_epoch)

    def member_run(params, key, vols, shapes, labels=None):
        """One ensemble member's FULL adaptation as ONE program.

        lax.scan over the epochs (reference driver loop tta.py:157-374) with
        the optimizer initialized in-program: the driver dispatches once per
        member instead of 2x/epoch, which removes the per-dispatch and
        post-host-transfer penalties of this stack entirely (PERF.md r3).
        `key` is the member's base key (fold_in(run_key, member_id)); epoch
        and salt folds reproduce tta_one_volume's historical member_keys
        derivation bit-exactly, so losses/resume artifacts are unchanged.
        Labels (optional, compile-time presence) enable the per-epoch
        center-patch pseudo-Dice eval (tta.py:283-338).
        """
        opt_state = init_opt_state(params)
        deterministic = not (model.uses_mind and model.mind_noise_scale)
        single_vol = vols.shape[0] == 1
        eval_reps = (1 if (deterministic and single_vol)
                     else plan.tta_eval_patches)

        def body(carry, ep):
            params, opt_state = carry
            k_ep = jax.random.fold_in(key, ep)
            k_tr = jax.random.fold_in(k_ep, 0)

            def do_train(p, o):
                return epoch_train(p, o, k_tr, vols, shapes)

            def do_fwd(p, o):
                return p, o, epoch_fwd(p, k_tr, vols, shapes)

            if not grads_enabled:
                params, opt_state, loss = do_fwd(params, opt_state)
            elif start_ep <= 0:
                params, opt_state, loss = do_train(params, opt_state)
            else:
                # epochs before start_tta_at_epoch log the loss but do not
                # update (tta.py:274-279)
                params, opt_state, loss = jax.lax.cond(
                    ep >= start_ep, do_train, do_fwd, params, opt_state)
            if labels is None:
                dice = jnp.float32(jnp.nan)
            else:
                evals = [eval_step(params, jax.random.fold_in(k_ep, 1 + e),
                                   vols, shapes, labels)
                         for e in range(eval_reps)]
                dice = jnp.mean(jnp.stack(evals))
            return (params, opt_state), (loss, dice)

        (params, _), (losses, dices) = jax.lax.scan(
            body, (params, opt_state), jnp.arange(n_ep, dtype=jnp.int32))
        return params, losses, dices

    return TTAFunctions(
        init_opt_state=init_opt_state,
        epoch_train=jax.jit(epoch_train, donate_argnums=(0, 1)),
        epoch_fwd=jax.jit(epoch_fwd),
        eval_step=jax.jit(eval_step),
        member_run=jax.jit(member_run),
        grads_enabled=grads_enabled,
    )


_TTA_FNS_CACHE = {}


@jax.jit
def _fold_member_keys(key, ids_arr):
    """Per-member base keys in ONE dispatch (member_run folds epoch/salt)."""
    return jax.vmap(lambda m: jax.random.fold_in(key, m))(ids_arr)


@jax.jit
def _expand0(tree):
    """Re-add the leading member axis to a single member's params (one
    dispatch instead of one tiny op per leaf)."""
    return jax.tree.map(lambda x: x[None], tree)


@jax.jit
def _concat0(trees):
    """Concatenate a list of member-param trees along the member axis in ONE
    dispatch (per-leaf dispatches cost ~90 ms each once the process has done
    any host transfer — PERF.md)."""
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *trees)


def tta_one_volume(
    model: Model,
    plan: TTAPlan,
    pretrained_params,
    vols_padded,
    true_shapes,
    map_idxs_pretrain,
    map_idxs_tta,
    key,
    labels_padded=None,
    modify_input_fn: Optional[Callable] = None,
    modify_output_fn: Optional[Callable] = None,
    modify_after_mapping_fn: Optional[Callable] = None,
    log_fn: Optional[Callable] = None,
    ensemble_chunk: Optional[int] = None,
    remat: bool = False,
    exact_warp_grad: bool = False,
    patch_group: int = 1,
    member_indices=None,
    save_member_fn: Optional[Callable] = None,
    split: Optional[bool] = None,
) -> Tuple[Any, Any, Any]:
    """Adapt ensemble parameter sets on one volume (or, with
    tta_across_all_samples, on a stack of volumes).

    The reference runs the ensemble loop serially (tta.py:165); here the
    members of one chunk share every compiled program and run vmapped — they
    differ only by PRNG stream, exactly like the reference's ensembles differ
    only by torch RNG state.  Each member's stream is derived by folding its
    GLOBAL member id into `key`, so a member's draws are identical whether it
    runs alone, in a chunk, or in a resume subset.

    Args:
      member_indices: global member ids to adapt (default
        range(plan.ensemble_count)).  Supports the reference's
        per-(sample, ensemble) resume granularity (tta.py:169-173): pass only
        the members whose parameter files are missing.
      save_member_fn: optional callback (member_id, params, losses, dices)
        invoked as soon as a member's adaptation finishes (losses/dices are
        (epochs,) numpy arrays) — chunks run their full epoch loop to
        completion one after another, so a crash loses at most the chunk in
        flight.
      split: use the split-dispatch epoch (engine_split.py — warps and the
        U-Net in separate XLA programs).  Strict opt-in (None/False = fused);
        incompatible with exact_warp_grad/remat.

    Returns:
      (stacked adapted params with leading axis over `member_indices`,
       losses (epochs, M), eval dices (epochs, M)).
    """
    E = plan.ensemble_count
    members = list(range(E)) if member_indices is None else list(member_indices)
    chunk = min(ensemble_chunk or E, len(members))
    # fused engine: label mapping is folded into the seg head, so the model-
    # output hook already sees mapped channels — the after-mapping hook
    # composes directly after it (reference hook order: model_utils.py:21-35
    # then tta.py:566)
    if modify_after_mapping_fn is not None:
        _out_fn, _after_fn = modify_output_fn, modify_after_mapping_fn
        fused_output_fn = ((lambda x: _after_fn(_out_fn(x)))
                           if _out_fn is not None else _after_fn)
    else:
        fused_output_fn = modify_output_fn
    # process-level cache: tta_one_volume runs once per sample, and a fresh
    # make_tta_functions per call would RETRACE (and re-look-up/compile)
    # every epoch program for every volume — several seconds each on the
    # full-size model even with a warm persistent compile cache
    from dg_tta_tpu.models.network import formulation_key
    fns_key = (model, plan,
               tuple(int(i) for i in np.asarray(map_idxs_pretrain)),
               tuple(int(i) for i in np.asarray(map_idxs_tta)),
               modify_input_fn, fused_output_fn if (
                   modify_after_mapping_fn is None) else
               (modify_output_fn, modify_after_mapping_fn),
               remat, exact_warp_grad, patch_group,
               # env-routed trace-time formulation (zpack/fold/warp impl):
               # without this an env flip mid-process would silently reuse
               # programs traced under the old routing
               formulation_key(model.spec))
    try:
        cached = _TTA_FNS_CACHE.get(fns_key)
    except TypeError:  # unhashable modifier callables: skip caching
        fns_key, cached = None, None
    if cached is None:
        fns = make_tta_functions(
            model, plan, map_idxs_pretrain, map_idxs_tta,
            modify_input_fn=modify_input_fn,
            modify_output_fn=fused_output_fn,
            remat=remat, exact_warp_grad=exact_warp_grad,
            patch_group=patch_group)
        # single-device vmapped entry points live with fns so their jit
        # caches survive across volumes too (vmap is batch-size-polymorphic:
        # one callable serves every chunk size; also used for a trailing
        # partial chunk the mesh does not divide)
        cached = (
            fns,
            jax.jit(jax.vmap(fns.epoch_train.__wrapped__,
                             in_axes=(0, 0, 0, None, None)),
                    donate_argnums=(0, 1)),
            jax.jit(jax.vmap(fns.epoch_fwd.__wrapped__,
                             in_axes=(0, 0, None, None))),
            jax.jit(jax.vmap(fns.eval_step.__wrapped__,
                             in_axes=(0, 0, None, None, None))),
            # whole-member program batched over a chunk: initial params are
            # UNMAPPED (vmap broadcasts; no materialized copies), labels may
            # be None (jit specializes on pytree structure)
            jax.jit(jax.vmap(fns.member_run.__wrapped__,
                             in_axes=(None, 0, None, None, None))),
        )
        if fns_key is not None:
            _TTA_FNS_CACHE[fns_key] = cached
    fns, train_v, fwd_v, eval_v, member_v = cached

    # multi-chip: the members of a chunk are independent adaptation streams —
    # shard them over the mesh's data axis (shard_map; plain vmap+sharding
    # can't split the per-member grouped convs).  The mesh size is the
    # largest divisor of the chunk size <= device count, so e.g. the default
    # 3-member ensemble uses 3 of 8 chips.
    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1 and chunk > 1:
        n_use = max(d for d in range(1, min(n_dev, chunk) + 1)
                    if chunk % d == 0)
        if n_use > 1:
            from dg_tta_tpu.parallel.mesh import make_mesh, shard_ensemble_axis
            from dg_tta_tpu.parallel.tta import make_sharded_member_run
            mesh = make_mesh(n_use)
            member_sh = make_sharded_member_run(
                fns, mesh, with_labels=labels_padded is not None)
    # ONE dispatch per epoch for the member PRNG streams: on the axon tunnel
    # every small dispatch after a host transfer costs ~100ms (PERF.md), so
    # the per-epoch key plumbing must not fan out into several ops
    @partial(jax.jit, static_argnames=())
    def _member_keys(key, ids_arr, epoch, salt):
        def one(m):
            k = jax.random.fold_in(key, m)
            k = jax.random.fold_in(k, epoch)
            return jax.random.fold_in(k, salt)
        return jax.vmap(one)(ids_arr)

    def member_keys(ids, epoch, salt):
        return _member_keys(key, jnp.asarray(ids, jnp.int32),
                            jnp.int32(epoch), jnp.int32(salt))

    from dg_tta_tpu.tta.engine_split import split_supported
    # The FUSED epoch is the shipped default on every backend: it is the
    # configuration bench.py measures (BENCH_r02+) and, with the Pallas warp
    # kernel (ops/warp_pallas.py), no longer pays the XLA gather cliff.  The
    # split-dispatch engine remains an explicit opt-in (split=True /
    # BENCH_SPLIT=1) for stacks where fused dispatch is pathological; it
    # ignores exact_warp_grad/remat, so never auto-select it.
    use_split = bool(split) and split_supported(model, plan)
    if use_split and (exact_warp_grad or remat):
        raise ValueError(
            "split=True is incompatible with exact_warp_grad/remat: the "
            "split engine always uses the approximate |det|-scaled adjoint "
            "and never rematerializes; use the fused engine for these.")
    # cache keyed by chunk SIZE only: member ids are passed as data to the
    # split programs, so one compile of the 6-12-minute big-model programs
    # serves every member chunk of the same size (advisor r2 finding)
    split_cache = {}

    def get_split_fns(ids):
        n = len(ids)
        if n not in split_cache:
            from dg_tta_tpu.tta.engine_split import make_split_tta_functions
            split_cache[n] = make_split_tta_functions(
                model, plan, map_idxs_pretrain, map_idxs_tta,
                modify_input_fn=modify_input_fn,
                modify_output_fn=modify_output_fn,
                modify_after_mapping_fn=modify_after_mapping_fn,
                patch_group=patch_group, ensemble=n)
        return split_cache[n]

    # chunks run their FULL epoch loop sequentially (memory control for the
    # full-size model on a single chip + save-as-you-finish resume support)
    params_parts, losses_parts, dices_parts = [], [], []
    for c0 in range(0, len(members), chunk):
        ids = members[c0:c0 + chunk]
        sharded = mesh is not None and len(ids) % mesh.size == 0
        if not use_split:
            kms = _fold_member_keys(key, jnp.asarray(ids, jnp.int32))
            if sharded:
                kms = shard_ensemble_axis(kms, mesh)
                lab = ((labels_padded,) if labels_padded is not None else ())
                params_c, lm, dm = member_sh(pretrained_params, kms,
                                             vols_padded, true_shapes, *lab)
            elif len(ids) == 1:
                p1, lm, dm = fns.member_run(pretrained_params, kms[0],
                                            vols_padded, true_shapes,
                                            labels_padded)
                params_c, lm, dm = _expand0(p1), lm[:, None].T, dm[:, None].T
            else:
                params_c, lm, dm = member_v(pretrained_params, kms,
                                            vols_padded, true_shapes,
                                            labels_padded)
            losses = np.asarray(lm).T    # (epochs, len(ids))
            dices = np.asarray(dm).T
            if log_fn is not None:
                for ep in range(plan.epochs):
                    log_fn(ep, losses[ep], dices[ep])
            if save_member_fn is not None:
                for i, m in enumerate(ids):
                    save_member_fn(m, jax.tree.map(lambda p: p[i], params_c),
                                   losses[:, i], dices[:, i])
            params_parts.append(params_c)
            losses_parts.append(losses)
            dices_parts.append(dices)
            continue
        sfns = get_split_fns(ids)
        params_c = jax.tree.map(
            lambda p: jnp.broadcast_to(p[None], (len(ids), *p.shape)),
            pretrained_params)
        opt_c = sfns.init_opt_state(params_c)
        eval_c = sfns.eval_step
        losses, dices = [], []
        for epoch in range(plan.epochs):
            # the split engine folds global member ids (passed as data)
            k_ep = jax.random.fold_in(jax.random.fold_in(key, epoch), 0)
            ids_arr = jnp.asarray(ids, jnp.int32)
            if sfns.grads_enabled and epoch >= plan.start_tta_at_epoch:
                params_c, opt_c, loss = sfns.epoch_train(
                    params_c, opt_c, k_ep, ids_arr, vols_padded,
                    true_shapes)
            else:
                loss = sfns.epoch_fwd(params_c, k_ep, ids_arr,
                                      vols_padded, true_shapes)
            if labels_padded is not None:
                # tta_eval_patches averages repeated center-patch evals
                # (tta.py:285-338 uses fixed "center" patches).  A repeat
                # only differs through MIND descriptor noise or, with
                # multiple volumes (tta_across_all_samples), through the
                # random volume draw in extract_batch — when neither varies
                # every repeat is bit-identical and one eval equals the mean.
                deterministic = not (model.uses_mind and model.mind_noise_scale)
                single_vol = int(vols_padded.shape[0]) == 1
                eval_reps = (1 if (deterministic and single_vol)
                             else plan.tta_eval_patches)
                evals = []
                for e in range(eval_reps):
                    kse = member_keys(ids, epoch, 1 + e)
                    evals.append(eval_c(params_c, kse, vols_padded,
                                        true_shapes, labels_padded))
                dice = jnp.mean(jnp.stack(evals), axis=0)
            else:
                dice = np.full((len(ids),), np.nan, np.float32)  # host-side
            losses.append(loss)
            dices.append(dice)
            if log_fn is not None:
                log_fn(epoch, jax.device_get(loss), jax.device_get(dice))
        losses = np.asarray(jnp.stack(losses))   # (epochs, len(ids))
        dices = np.asarray(jnp.stack(dices))
        if save_member_fn is not None:
            for i, m in enumerate(ids):
                save_member_fn(m, jax.tree.map(lambda p: p[i], params_c),
                               losses[:, i], dices[:, i])
        params_parts.append(params_c)
        losses_parts.append(losses)
        dices_parts.append(dices)

    if len(params_parts) == 1:
        params = params_parts[0]
    else:
        # DEVICE-side concat.  The extra HBM is only n_members x ~66 MB of
        # params (temps are freed between dispatches), while a host concat
        # pulls every member tree through the axon tunnel — measured at
        # well under 1 MB/s device->host (tools/probe_transfer.py timed out
        # at >580 s for ~315 MB), which alone accounted for the ~75 s gap
        # between member_run compute (114.8 s) and the r3e bench (190.2 s).
        params = _concat0(params_parts)
    return (params, np.concatenate(losses_parts, axis=1),
            np.concatenate(dices_parts, axis=1))
