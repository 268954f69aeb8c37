from diffpiso_tpu.ops.pallas_stencil import no_pallas
from diffpiso_tpu.parallel.halo import make_sharded_cg, make_sharded_laplacian_apply
from diffpiso_tpu.parallel.shard_kernels import sharded_solvers
from diffpiso_tpu.parallel.sharding import (
    PaddedSpatialLayout,
    make_mesh,
    shard_field,
    shard_piso_args,
    spatial_spec,
    with_spatial_sharding,
)

__all__ = [
    "no_pallas",
    "sharded_solvers",
    "make_mesh",
    "make_sharded_cg",
    "make_sharded_laplacian_apply",
    "PaddedSpatialLayout",
    "shard_field",
    "shard_piso_args",
    "spatial_spec",
    "with_spatial_sharding",
]
