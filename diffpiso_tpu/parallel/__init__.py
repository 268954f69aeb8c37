from diffpiso_tpu.ops.pallas_stencil import no_pallas
from diffpiso_tpu.parallel.sharding import (
    make_mesh,
    shard_field,
    shard_piso_args,
    spatial_spec,
    with_spatial_sharding,
)

__all__ = [
    "no_pallas",
    "make_mesh",
    "shard_field",
    "shard_piso_args",
    "spatial_spec",
    "with_spatial_sharding",
]
