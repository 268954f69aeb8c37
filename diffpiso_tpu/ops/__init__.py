from diffpiso_tpu.ops.fv import (
    pad_centered,
    pad_staggered,
    fv_divergence,
    fv_gradient,
    centered_to_faces,
    centered_to_staggered,
    vorticity,
)
from diffpiso_tpu.ops.stencil import (
    AdvectionStencil,
    assemble_advection_stencil,
    apply_stencil,
    apply_stencil_transpose,
    explicit_H,
    stencil_to_dense,
)
from diffpiso_tpu.ops.laplace import (
    LaplaceStencil,
    assemble_pressure_laplacian,
    apply_laplacian,
    laplacian_to_dense,
)
from diffpiso_tpu.ops.resample import grid_sample, resample_field
from diffpiso_tpu.ops.advect import (
    advect_centered,
    advect_semi_lagrangian,
    sample_bilinear,
)

__all__ = [
    "pad_centered",
    "pad_staggered",
    "fv_divergence",
    "fv_gradient",
    "centered_to_faces",
    "centered_to_staggered",
    "vorticity",
    "AdvectionStencil",
    "assemble_advection_stencil",
    "apply_stencil",
    "apply_stencil_transpose",
    "explicit_H",
    "stencil_to_dense",
    "LaplaceStencil",
    "assemble_pressure_laplacian",
    "apply_laplacian",
    "laplacian_to_dense",
    "grid_sample",
    "resample_field",
    "advect_centered",
    "advect_semi_lagrangian",
    "sample_bilinear",
]
