"""diffpiso_tpu — TPU-native differentiable PISO solver framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
tum-pbs/differentiable-piso (learned turbulence modelling with a
differentiable second-order PISO solver for the 2-D incompressible
Navier-Stokes equations on staggered grids).

Architecture (bottom-up):
  fields/    grids, domains, boundary materials (JAX pytrees)
  ops/       finite-volume operators, stencil assembly (matrix-free), Pallas kernels
  solvers/   matrix-free Krylov solvers (BiCGSTAB, CG) with implicit-function
             -theorem adjoints via jax.custom_vjp
  core/      the PISO step, simulation parameters, case setups
  models/    CNN closure models, algebraic LES models
  learning/  losses, unrolled differentiable training, data pipeline
  eval/      energy spectra, vorticity statistics
  physics/   World orchestration + classic physics (Burgers, heat,
             Schroedinger, reaction-diffusion, Kuramoto-Sivashinsky, Chorin
             incompressible flow)
  parallel/  device-mesh sharding (pjit/shard_map), halo exchange

Unlike the reference (TF1 graphs + CUDA CSR solvers), everything here is
matrix-free: the implicit advection-diffusion operator and the pressure
Laplacian are 5-point stencil coefficient tensors applied with fused
shift-multiply-accumulate, which XLA maps onto the TPU VPU without any
sparse formats or host round-trips.
"""

from diffpiso_tpu.fields import (
    Box,
    CenteredField,
    Domain,
    Material,
    OPEN,
    CLOSED,
    NO_SLIP,
    NO_STICK,
    PERIODIC,
    SLIPPERY,
    STICKY,
    SampledField,
    StaggeredField,
)

from diffpiso_tpu.ops.math_ext import set_precision, get_precision, get_dtype

__version__ = "0.1.0"
