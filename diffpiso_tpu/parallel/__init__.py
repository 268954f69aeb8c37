from diffpiso_tpu.parallel.sharding import (
    make_mesh,
    shard_field,
    shard_piso_args,
    spatial_spec,
    with_spatial_sharding,
)

__all__ = [
    "make_mesh",
    "shard_field",
    "shard_piso_args",
    "spatial_spec",
    "with_spatial_sharding",
]
