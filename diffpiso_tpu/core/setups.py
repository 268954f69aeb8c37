"""Flow-case setups.

  spatial_mixing_layer_setup <- spatialMixingLayer_setup
      (diffpiso/combined_training_integrated.py:481-539)
  boundary_perturbation      <- boundary_perturbation_fun
      (combined_training_integrated.py:7-14 / spatial_mixing_layer.py:24-32)

A spatially-evolving mixing layer: tanh inflow profile with two-mode
sinusoidal perturbations at the left boundary, open top/bottom, convective
outflow at the right preceded by a linear sponge-viscosity ramp.
"""

from __future__ import annotations

import dataclasses
import math as _math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffpiso_tpu.fields.box import Box
from diffpiso_tpu.fields.domain import Domain
from diffpiso_tpu.fields.grid import StaggeredField
from diffpiso_tpu.fields.material import CLOSED, OPEN
from diffpiso_tpu.core.masks import mixing_layer_masks
from diffpiso_tpu.core.piso import SimulationParameters
from diffpiso_tpu.ops.fv import centered_to_staggered
from diffpiso_tpu.solvers import AdvectionSolver, PressureSolver

def decaying_turbulence_setup(
    resolution: Tuple[int, ...] = (128, 128),
    box_size: Tuple[float, ...] | None = None,
    viscosity: float = 1e-3,
    solver_precision: float = 1e-6,
    max_iterations: Tuple[int, int] = (200, 1000),
    solver_dtype: str | None = None,
):
    """Fully periodic box for decaying turbulence (the no-model forward
    configuration in BASELINE.json). Rank-generic (2-D or 3-D — the
    reference's CUDA kernels are natively 3-D, calcCellFluxesZ,
    central_difference_csr_op.cu.cc:103). All faces are unique (no
    duplicated wrap columns), masks are all-fluid, and the pressure system
    is singular (all-Neumann) -> rank-one shift + mean deflation.

    Returns (domain, sim)."""
    from diffpiso_tpu.fields.material import PERIODIC

    rank = len(resolution)
    if box_size is None:
        box_size = (2 * _math.pi,) * rank
    domain = Domain(resolution, Box.from_size(box_size), boundaries=PERIODIC)
    res = tuple(int(r) for r in resolution)
    periodic = (True,) * rank
    dm = StaggeredField(
        tuple(jnp.zeros(res, bool) for _ in range(rank)), periodic=periodic
    )
    dv = StaggeredField(
        tuple(jnp.zeros(res, jnp.float32) for _ in range(rank)), periodic=periodic
    )
    ones = jnp.ones(tuple(r + 2 for r in res), jnp.float32)  # wrap pad of ones
    sim = SimulationParameters(
        dirichlet_mask=dm,
        dirichlet_values=dv,
        active_mask=ones,
        accessible_mask=ones,
        no_slip_mask=None,
        viscosity=viscosity,
        laplace_rank_deficient=True,
        bool_periodic=periodic,
        linear_solver=AdvectionSolver(
            max_iterations=max_iterations[0], dtype=solver_dtype
        ),
        pressure_solver=PressureSolver(
            max_iterations=max_iterations[1],
            residual_reset=50,
            deflate_mean=True,
            dtype=solver_dtype,
            # periodic box: the spectral inverse is near-exact (mean
            # stencil weights). The matmul eigenbasis variant beats the FFT
            # custom-call on the MXU at full-f32 precision — measured r3 at
            # 512^2: fwd 1835 vs 1110 steps/s, grad30 553 vs 429, identical
            # iteration counts — and it also shards/batches (GSPMD/vmap).
            preconditioner="fft_mm",
            adjoint_preconditioner="fft_mm",
        ),
    )
    return domain, sim


DEFAULT_PHYSICAL = dict(
    average_velocity=1.0,
    velocity_difference=1.0,
    inlet_profile_sharpness=2.0,
    viscosity=0.002,
)

DEFAULT_SIMULATION = dict(
    HRres=(128, 512),
    dx_ratio=1,
    dt=0.2,
    dt_ratio=1,
    box_size=(64.0, 256.0),
    sponge_ratio=0.875,
    relative_sponge_max=20.0,
)


@dataclasses.dataclass(frozen=True)
class MixingLayerSetup:
    domain: Domain
    sim: SimulationParameters
    inflow_profile: np.ndarray  # (ny + 2,) tanh profile incl. ghost entries
    viscosity_field: StaggeredField  # per-face nu with sponge ramp
    sponge_start: int  # x-index where the sponge begins
    dt: float

    def perturbation(self, time, amplitudes=(0.082, 0.018), average_velocity=1.0):
        """Two-mode inflow perturbation (J. Ko et al. sensitivity study):
        sum_i eps_i cos(n_i y) sech^2(2y) sin(omega_i t), on the ny+2 ghost
        -inclusive profile points."""
        ny = self.domain.resolution[0]
        l_y = self.domain.box.size[0]
        y = np.linspace(0, l_y, ny + 2) - l_y / 2
        y = jnp.asarray(y, jnp.float32)
        eps = [a * average_velocity for a in amplitudes]
        n = [0.4 * np.pi, 0.3 * np.pi]
        omeg = [0.22, 0.11]
        return sum(
            eps[i]
            * jnp.cos(n[i] * y)
            * (1 - jnp.tanh(y * 2) ** 2)
            * jnp.sin(omeg[i] * time)
            for i in range(len(eps))
        )

    def dirichlet_values(self, perturbation=None) -> StaggeredField:
        """Dirichlet values with the given inflow perturbation (length ny+2)
        added to the base profile; equivalent to update_dirichlet_values
        (piso_helpers.py:58-70) applied to the inflow column."""
        base = self.sim.dirichlet_values
        if perturbation is None:
            return base
        u = base.components[1]
        profile = jnp.asarray(self.inflow_profile, u.dtype)[1:-1] + perturbation[1:-1]
        # cast: x64 oracle runs produce f64 perturbations; the scatter into the
        # f32 dirichlet array must not rely on implicit down-cast (FutureWarning
        # -> error in future JAX)
        u = u.at[:, 0].set(profile.astype(u.dtype))
        return StaggeredField((base.components[0], u), periodic=base.periodic)

    def initial_state(self):
        """u = inflow profile everywhere, v = 0, p = 0
        (spatial_mixing_layer.py:54-56)."""
        ny, nx = self.domain.resolution
        u = jnp.broadcast_to(
            jnp.asarray(self.inflow_profile[1:-1], jnp.float32)[:, None], (ny, nx + 1)
        )
        vel = StaggeredField((jnp.zeros((ny + 1, nx), jnp.float32), u))
        return vel, self.domain.centered_grid(0.0)


def spatial_mixing_layer_setup(
    physical: dict | None = None,
    simulation: dict | None = None,
    solver_precision: float = 1e-6,
    max_iterations: Tuple[int, int] = (10000, 10000),
    solver_dtype: str | None = None,
) -> MixingLayerSetup:
    phys = {**DEFAULT_PHYSICAL, **(physical or {})}
    simp = {**DEFAULT_SIMULATION, **(simulation or {})}

    dx_ratio = simp["dx_ratio"]
    res = (int(simp["HRres"][0] // dx_ratio), int(simp["HRres"][1] // dx_ratio))
    box = Box.from_size(simp["box_size"])
    domain = Domain(res, box, boundaries=((OPEN, OPEN), (OPEN, CLOSED)))
    ny, nx = res

    # tanh inflow profile over ny+2 ghost-inclusive points
    # (combined_training_integrated.py:497-501)
    l_y = box.size[0]
    y = np.linspace(0, l_y, ny + 2)
    inflow = (
        phys["velocity_difference"] / 2
        * np.tanh(phys["inlet_profile_sharpness"] * (y - l_y / 2))
        + phys["average_velocity"]
    ).astype(np.float32)

    dm, dv_base, active, accessible, _ = mixing_layer_masks(res, inflow)

    # sponge-layer viscosity: linear ramp from nu to nu*(1+relative_sponge_max)
    # beyond sponge_ratio of the domain (combined_training_integrated.py:494-531)
    sponge_start = int(simp["HRres"][1] * simp["sponge_ratio"] / dx_ratio)
    sponge_max = phys["viscosity"] * simp["relative_sponge_max"]
    nu_centered = np.full(res, phys["viscosity"], np.float32)
    nu_centered[:, sponge_start:] += np.linspace(
        0, sponge_max, nx - sponge_start, dtype=np.float32
    )[None, :]
    viscosity_field = centered_to_staggered(jnp.asarray(nu_centered))

    sim = SimulationParameters(
        dirichlet_mask=dm,
        dirichlet_values=dv_base,
        active_mask=active,
        accessible_mask=accessible,
        no_slip_mask=None,
        viscosity=viscosity_field,
        laplace_rank_deficient=False,
        linear_solver=AdvectionSolver(
            max_iterations=max_iterations[0], dtype=solver_dtype
        ),
        pressure_solver=PressureSolver(
            max_iterations=max_iterations[1],
            residual_reset=1000 if solver_dtype == "float64" else 50,
            dtype=solver_dtype,
            # channel spectral preconditioner (Neumann walls/inflow +
            # Dirichlet outflow basis, solvers/fourier.py): measured on the
            # 128x512 DNS it cuts corrector-1 from 992 CG iterations to
            # 2.25 and lifts throughput 114 -> 572 steps/s. The matmul
            # eigenbasis variant replaces the DCT custom-calls with MXU
            # contractions (faster at these sizes, r3; and shards/batches).
            preconditioner="channel_mm",
            adjoint_preconditioner="channel_mm",
        ),
    )
    return MixingLayerSetup(
        domain=domain,
        sim=sim,
        inflow_profile=inflow,
        viscosity_field=viscosity_field,
        sponge_start=sponge_start,
        dt=float(simp["dt"] * simp["dt_ratio"]),
    )
