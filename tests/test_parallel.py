"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dg_tta_tpu.parallel.mesh import make_mesh, shard_ensemble_axis
from dg_tta_tpu.parallel.tta import (
    make_sharded_ensemble_eval,
    make_sharded_ensemble_train,
)
from dg_tta_tpu.tta.engine import make_tta_functions
from dg_tta_tpu.tta.plan import TTAPlan
from tests.test_tta_engine import tiny_model, synth_volume

IDX3 = np.arange(3, dtype=np.int32)


@pytest.fixture(scope="module")
def setup():
    m = tiny_model()
    plan = TTAPlan(epochs=1, patches_to_be_accumulated=2, lr=1e-3,
                   ensemble_count=8)
    fns = make_tta_functions(m, plan, IDX3, IDX3)
    params = m.init_params(jax.random.PRNGKey(0))
    return m, plan, fns, params


def test_sharded_ensemble_train_matches_vmap(setup):
    m, plan, fns, params = setup
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    E = 8
    stacked = jax.tree.map(
        lambda p: jnp.broadcast_to(p[None], (E, *p.shape)), params)
    opt = jax.vmap(fns.init_opt_state)(stacked)
    keys = jax.random.split(jax.random.PRNGKey(1), E)

    rng = np.random.default_rng(0)
    vols = synth_volume(rng)[None]
    shapes = jnp.asarray([[24.0, 28.0, 20.0]])

    # reference result: plain vmap on one device
    train_ref = jax.jit(
        jax.vmap(fns.epoch_train.__wrapped__, in_axes=(0, 0, 0, None, None)))
    p_ref, _, loss_ref = train_ref(stacked, opt, keys, vols, shapes)

    stacked_s = shard_ensemble_axis(
        jax.tree.map(lambda p: jnp.broadcast_to(p[None], (E, *p.shape)),
                     params), mesh)
    opt_s = shard_ensemble_axis(jax.vmap(fns.init_opt_state)(stacked_s), mesh)
    train_sh = make_sharded_ensemble_train(fns, mesh)
    p_sh, _, loss_sh = train_sh(stacked_s, opt_s,
                                shard_ensemble_axis(keys, mesh), vols, shapes)

    np.testing.assert_allclose(np.asarray(loss_ref), np.asarray(loss_sh),
                               rtol=1e-5, atol=1e-6)
    a = jax.tree.leaves(p_ref)[0]
    b = jax.tree.leaves(p_sh)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_sharded_eval(setup):
    m, plan, fns, params = setup
    mesh = make_mesh(8)
    E = 8
    stacked = shard_ensemble_axis(jax.tree.map(
        lambda p: jnp.broadcast_to(p[None], (E, *p.shape)), params), mesh)
    keys = shard_ensemble_axis(jax.random.split(jax.random.PRNGKey(2), E),
                               mesh)
    rng = np.random.default_rng(1)
    vols = synth_volume(rng)[None]
    labs = jnp.asarray(
        rng.integers(0, 3, size=(1, 24, 28, 20, 1)).astype(np.float32))
    shapes = jnp.asarray([[24.0, 28.0, 20.0]])
    eval_sh = make_sharded_ensemble_eval(fns, mesh)
    dice = eval_sh(stacked, keys, vols, shapes, labs)
    assert dice.shape == (E,)
    assert np.all(np.isfinite(np.asarray(dice)))


def test_dp_pretrain_step_on_mesh():
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dg_tta_tpu.train.augment import DAConfig
    from dg_tta_tpu.train.pretrain import make_train_step

    m = tiny_model()
    mesh = make_mesh(8)
    tx, step = make_train_step(m, DAConfig())
    params = m.init_params(jax.random.PRNGKey(0))
    opt = tx.init(params)
    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        jnp.asarray(rng.normal(size=(8, 16, 16, 16, 1)).astype(np.float32)),
        NamedSharding(mesh, P("data")))
    segs = jax.device_put(
        jnp.asarray(rng.integers(0, 4, (8, 16, 16, 16, 1)).astype(np.float32)),
        NamedSharding(mesh, P("data")))
    params, opt, loss = step(params, opt, jax.random.PRNGKey(1), imgs, segs,
                             jnp.float32(1e-2))
    assert np.isfinite(float(loss))
    # params remain replicated after the update
    leaf = jax.tree.leaves(params)[0]
    assert leaf.sharding.is_fully_replicated
