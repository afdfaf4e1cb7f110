from dg_tta_tpu.parallel.mesh import make_mesh, shard_ensemble_axis
