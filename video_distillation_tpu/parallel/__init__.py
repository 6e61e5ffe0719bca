from .mesh import (data_sharding, get_mesh, init_distributed,
                   is_coordinator, make_mesh, mesh_size,
                   pad_and_shard_plan, process_index, replicate,
                   replicate_array, shard_batch, shard_divisible)

__all__ = ["data_sharding", "get_mesh", "init_distributed",
           "is_coordinator", "make_mesh", "mesh_size",
           "pad_and_shard_plan", "process_index", "replicate",
           "replicate_array", "shard_batch", "shard_divisible"]
