from diffpiso_tpu.solvers.krylov import (
    SolveResult,
    bicgstab,
    cg,
    pcg,
    print_residual,
    tree_vdot,
)
from diffpiso_tpu.solvers.fourier import (
    FourierPressureSolver,
    NeumannSpectralSolver,
    fourier_poisson,
)
from diffpiso_tpu.solvers.base import (
    AdvectionSolver,
    PressureSolver,
    solve_advection_system,
    solve_pressure_system,
)
from diffpiso_tpu.solvers.poisson import cg_differentiable, poisson_solve

__all__ = [
    "SolveResult",
    "bicgstab",
    "cg",
    "pcg",
    "print_residual",
    "tree_vdot",
    "FourierPressureSolver",
    "NeumannSpectralSolver",
    "fourier_poisson",
    "AdvectionSolver",
    "PressureSolver",
    "solve_advection_system",
    "solve_pressure_system",
    "cg_differentiable",
    "poisson_solve",
]
