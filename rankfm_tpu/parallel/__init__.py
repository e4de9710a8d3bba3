from rankfm_tpu.parallel.mesh import make_mesh, weight_shardings, batch_sharding

__all__ = ["make_mesh", "weight_shardings", "batch_sharding"]
