"""Split-dispatch TTA engine (engine_split.py): correctness on CPU.

The split path exists for the TPU gather cliff (PERF.md); on CPU it must
produce the same qualitative behavior as the fused engine: finite
decreasing losses, member-stable PRNG streams, working eval, and the
fused-path fallback for unsupported configs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dg_tta_tpu.models.network import Model
from dg_tta_tpu.models.plans import ArchSpec
from dg_tta_tpu.tta.engine import tta_one_volume
from dg_tta_tpu.tta.engine_split import split_supported
from dg_tta_tpu.tta.plan import TTAPlan

SPEC = ArchSpec(
    features_per_stage=(8, 16),
    kernel_sizes=((3, 3, 3), (3, 3, 3)),
    strides=((1, 1, 1), (2, 2, 2)),
    n_conv_per_stage_encoder=(1, 1),
    n_conv_per_stage_decoder=(1,),
    num_input_channels=1,
    num_classes=4,
)
IDX3 = np.arange(3, dtype=np.int32)


def _model():
    return Model(spec=SPEC, patch_size=(16, 16, 16),
                 trainer_name="nnUNetTrainer_GIN",
                 uses_gin_internal=True, uses_mind=False)


def _vol():
    rng = np.random.default_rng(0)
    vol = rng.normal(0, 0.3, size=(24, 24, 24, 1)).astype(np.float32)
    vol[6:16, 6:16, 6:16] += 2.0
    return jnp.asarray(vol)[None], jnp.asarray([[24.0, 24.0, 24.0]])


def test_split_engine_trains_and_is_member_stable():
    m = _model()
    params = m.init_params(jax.random.PRNGKey(0))
    vols, shapes = _vol()
    plan = TTAPlan(epochs=3, patches_to_be_accumulated=2, ensemble_count=2,
                   lr=1e-3)
    ps, ls, _ = tta_one_volume(m, plan, params, vols, shapes, IDX3, IDX3,
                               jax.random.PRNGKey(5), split=True)
    ls = np.asarray(ls)
    assert ls.shape == (3, 2) and np.isfinite(ls).all()
    moved = max(float(jnp.abs(a - b[None]).max())
                for a, b in zip(jax.tree.leaves(ps), jax.tree.leaves(params)))
    assert moved > 0

    # member-stable across resume subsets (global-id-keyed streams)
    _, l_solo, _ = tta_one_volume(m, plan, params, vols, shapes, IDX3, IDX3,
                                  jax.random.PRNGKey(5), split=True,
                                  member_indices=[1])
    np.testing.assert_allclose(ls[:, 1], np.asarray(l_solo)[:, 0], rtol=1e-3)


def test_split_engine_eval_and_grad_gate():
    m = _model()
    params = m.init_params(jax.random.PRNGKey(1))
    vols, shapes = _vol()
    rng = np.random.default_rng(1)
    labs = jnp.asarray((rng.normal(size=(1, 24, 24, 24, 1)) > 1)
                       .astype(np.float32))
    plan = TTAPlan(epochs=2, patches_to_be_accumulated=1, ensemble_count=1,
                   lr=1e-3)
    _, _, dice = tta_one_volume(m, plan, params, vols, shapes, IDX3, IDX3,
                                jax.random.PRNGKey(2), split=True,
                                labels_padded=labs)
    assert np.isfinite(np.asarray(dice)).all()

    # have_grad_in="branch_b" quirk: adaptation is a no-op in split mode too
    plan_ng = TTAPlan(epochs=2, patches_to_be_accumulated=1, ensemble_count=1,
                      lr=1e-3, have_grad_in="branch_b")
    ps, _, _ = tta_one_volume(m, plan_ng, params, vols, shapes, IDX3, IDX3,
                              jax.random.PRNGKey(3), split=True)
    for a, b in zip(jax.tree.leaves(ps), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a)[0], np.asarray(b))


def test_split_supported_gating():
    m = _model()
    assert split_supported(m, TTAPlan())
    assert not split_supported(m, TTAPlan(spatial_aug_type="deformable"))
    import dataclasses
    mind = dataclasses.replace(m, uses_mind=True)
    assert not split_supported(mind, TTAPlan())
    # unsupported configs silently fall back to the fused engine
    params = m.init_params(jax.random.PRNGKey(0))
    vols, shapes = _vol()
    plan = TTAPlan(epochs=1, patches_to_be_accumulated=1, ensemble_count=1,
                   lr=1e-3, spatial_aug_type="deformable")
    _, ls, _ = tta_one_volume(m, plan, params, vols, shapes, IDX3, IDX3,
                              jax.random.PRNGKey(4), split=True)
    assert np.isfinite(np.asarray(ls)).all()
