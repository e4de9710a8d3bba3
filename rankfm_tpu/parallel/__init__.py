from rankfm_tpu.parallel.mesh import (
    batch_sharding,
    init_distributed,
    make_mesh,
    weight_shardings,
)

__all__ = ["make_mesh", "weight_shardings", "batch_sharding",
           "init_distributed"]
