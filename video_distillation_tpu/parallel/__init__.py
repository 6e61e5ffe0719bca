from .mesh import (data_sharding, get_mesh, make_mesh, mesh_size,
                   pad_and_shard_plan, replicate, replicate_array,
                   shard_batch, shard_divisible)

__all__ = ["data_sharding", "get_mesh", "make_mesh", "mesh_size",
           "pad_and_shard_plan", "replicate", "replicate_array",
           "shard_batch", "shard_divisible"]
