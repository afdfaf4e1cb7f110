"""Sharded ensemble/volume parallelism for the TTA engine.

The ensemble members (and, across volumes, the samples) are independent
adaptation streams — no collectives needed.  Expressed with shard_map over
the mesh's data axis: each device vmaps over its local members.  (Plain
vmap+NamedSharding does not partition here: vmap turns the per-member conv
kernels into grouped convolutions whose group axis XLA cannot shard.)
"""

from functools import partial

import jax
from jax.sharding import Mesh, PartitionSpec as P

try:  # JAX >= 0.5 exposes shard_map at top level
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_rep=check_rep)

from dg_tta_tpu.parallel.mesh import DATA_AXIS


def make_sharded_ensemble_train(fns, mesh: Mesh, axis_name: str = DATA_AXIS):
    """jit(shard_map(vmap(epoch_train))): params/opt_state/keys sharded on
    their leading ensemble axis, volumes replicated.

    The stacked ensemble axis must be divisible by the mesh size.
    Returns fn(stacked_params, stacked_opt_state, keys, vols, shapes)
    -> (params, opt_state, losses)."""
    local = jax.vmap(fns.epoch_train.__wrapped__,
                     in_axes=(0, 0, 0, None, None))
    sharded = shard_map(
        local, mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(), P()),
        out_specs=(P(axis_name), P(axis_name), P(axis_name)),
    )
    return jax.jit(sharded, donate_argnums=(0, 1))


def make_sharded_ensemble_eval(fns, mesh: Mesh, axis_name: str = DATA_AXIS):
    local = jax.vmap(fns.eval_step.__wrapped__,
                     in_axes=(0, 0, None, None, None))
    sharded = shard_map(
        local, mesh,
        in_specs=(P(axis_name), P(axis_name), P(), P(), P()),
        out_specs=P(axis_name),
    )
    return jax.jit(sharded)


def make_sharded_ensemble_fwd(fns, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Warm-up epochs (no update) sharded like the train step."""
    local = jax.vmap(fns.epoch_fwd.__wrapped__, in_axes=(0, 0, None, None))
    sharded = shard_map(
        local, mesh,
        in_specs=(P(axis_name), P(axis_name), P(), P()),
        out_specs=P(axis_name),
    )
    return jax.jit(sharded)


def make_sharded_member_run(fns, mesh: Mesh, with_labels: bool,
                            axis_name: str = DATA_AXIS):
    """jit(shard_map(vmap(member_run))): each device runs its local members'
    FULL adaptation (all epochs in one program — engine.member_run) with the
    initial params and volumes replicated and only the member keys sharded.

    Returns fn(pretrained_params, keys (M, 2), vols, shapes[, labels])
    -> (params (M, ...), losses (M, epochs), dices (M, epochs))."""
    raw = fns.member_run.__wrapped__
    if with_labels:
        local = jax.vmap(raw, in_axes=(None, 0, None, None, None))
        in_specs = (P(), P(axis_name), P(), P(), P())
    else:
        local = jax.vmap(lambda p, k, v, s: raw(p, k, v, s),
                         in_axes=(None, 0, None, None))
        in_specs = (P(), P(axis_name), P(), P())
    sharded = shard_map(
        local, mesh,
        in_specs=in_specs,
        out_specs=(P(axis_name),) * 3,
    )
    return jax.jit(sharded)


def make_sharded_stream_train(fns, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Joint (sample x member) stream parallelism: every argument carries a
    leading stream axis, INCLUDING the volume stack — stream s adapts on its
    own volume(s).  This is the volume-axis sharding of SURVEY §2.3 for the
    per-sample TTA mode: with V pending samples and E members, V*E fully
    independent adaptation streams spread over the mesh (each sample's
    volumes live only on the devices adapting it).

    Returns fn(params (S,...), opt (S,...), keys (S,2), vols (S, Nv, ...),
    shapes (S, Nv, 3)) -> (params, opt, losses (S,))."""
    local = jax.vmap(fns.epoch_train.__wrapped__, in_axes=(0, 0, 0, 0, 0))
    sharded = shard_map(
        local, mesh,
        in_specs=(P(axis_name),) * 5,
        out_specs=(P(axis_name),) * 3,
    )
    return jax.jit(sharded, donate_argnums=(0, 1))


def make_sharded_stream_eval(fns, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Per-stream center-patch eval with per-stream volumes AND labels."""
    local = jax.vmap(fns.eval_step.__wrapped__, in_axes=(0, 0, 0, 0, 0))
    sharded = shard_map(
        local, mesh,
        in_specs=(P(axis_name),) * 5,
        out_specs=P(axis_name),
    )
    return jax.jit(sharded)
