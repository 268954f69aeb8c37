from diffpiso_tpu.solvers.krylov import (
    SolveResult,
    bicgstab,
    cg,
    tree_vdot,
)
from diffpiso_tpu.solvers.base import (
    AdvectionSolver,
    PressureSolver,
    solve_advection_system,
    solve_pressure_system,
)

__all__ = [
    "SolveResult",
    "bicgstab",
    "cg",
    "tree_vdot",
    "AdvectionSolver",
    "PressureSolver",
    "solve_advection_system",
    "solve_pressure_system",
]
