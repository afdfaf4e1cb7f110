"""Device-mesh helpers.

The reference is single-GPU (SURVEY §2.3); the TPU framework's parallelism
surfaces are (a) the ensemble/volume axis of TTA — embarrassingly parallel
adaptation streams sharded data-parallel over ICI — and (b) batch
data-parallelism with gradient psum for DG pretraining (dg_tta_tpu/train).
"""

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    return Mesh(devices[:n_devices], (axis_name,))


def shard_ensemble_axis(tree, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place every leaf with its leading (ensemble/batch) axis sharded over
    the mesh; the rest replicated."""
    def place(x):
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(place, tree)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
