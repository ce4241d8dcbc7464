from ribca_tpu.parallel.mesh import (
    cell_sharding,
    get_mesh,
    pad_cells,
    replicated_sharding,
    shard_chunk,
)

__all__ = [
    "get_mesh",
    "cell_sharding",
    "replicated_sharding",
    "pad_cells",
    "shard_chunk",
]
