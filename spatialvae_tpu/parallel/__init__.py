from spatialvae_tpu.parallel.mesh import MeshConfig, create_mesh
from spatialvae_tpu.parallel.pixel import (
    can_pixel_shard,
    make_pixel_sharded_loss,
)
from spatialvae_tpu.parallel.sharding import (
    batch_sharding,
    param_shardings,
    shard_params,
)

__all__ = [
    "MeshConfig",
    "create_mesh",
    "batch_sharding",
    "param_shardings",
    "shard_params",
    "can_pixel_shard",
    "make_pixel_sharded_loss",
]
