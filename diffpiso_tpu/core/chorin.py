"""First-order Chorin-projection incompressible flow solver.

Capability parity with the reference's IncompressibleFlow.step
(PhiFlow/phi/physics/fluid.py:75-118,216): semi-Lagrangian advection ->
body forces -> divergence-free projection. This is the simpler solver the
PISO scheme supersedes (kept for parity, fast previews, and as a baseline
for accuracy comparisons — e.g. the PhiFlow smoke demos).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from diffpiso_tpu.fields.domain import Domain
from diffpiso_tpu.fields.grid import StaggeredField
from diffpiso_tpu.ops.advect import advect_centered, advect_semi_lagrangian
from diffpiso_tpu.ops.fv import centered_to_staggered, fv_divergence, fv_gradient
from diffpiso_tpu.ops.laplace import assemble_pressure_laplacian
from diffpiso_tpu.solvers.fourier import FourierPressureSolver, fourier_poisson
from diffpiso_tpu.solvers.krylov import cg


def divergence_free(
    velocity: StaggeredField,
    domain: Domain,
    accessible_mask: Optional[jax.Array] = None,
    tol=1e-5,
    max_iter: int = 2000,
    obstacles=(),
    rank_deficient: Optional[bool] = None,
    return_info: bool = False,
):
    """Project a staggered velocity onto its divergence-free part
    (fluid.py:203-250). Periodic boxes use the exact spectral solve; bounded
    domains run CG on the masked unit-coefficient Laplacian.

    obstacles — sequence of physics.obstacle.Obstacle: their cells leave the
    active mask; hard boundary conditions are applied to the input velocity
    FIRST and the rigid-body velocities of moving obstacles are imprinted
    AFTER (fluid.py:239-244) so the imprinted surface/normal velocities
    survive into the divergence source. Obstacles force the bounded CG path
    (the spectral inverse assumes an unobstructed periodic box).

    rank_deficient — pass an explicit singularity flag when the masks are
    traced values (jit/vmap arguments): the auto-detect
    (piso_cuda_pressure_solver.py:84-87) needs concrete masks, and the
    conservative all-Neumann fallback corrupts OPEN-domain solves.

    return_info — also return the CG SolveResult (iterations/residual/warn;
    None on the direct spectral path) so callers can detect failed
    projection solves instead of consuming values silently.

    Returns (velocity_div_free, pressure-like potential[, solve_info])."""
    if obstacles:
        from diffpiso_tpu.physics.obstacle import (
            apply_obstacle_velocities,
            obstacle_accessible_mask,
        )

        accessible_mask = obstacle_accessible_mask(
            obstacles, domain.resolution, domain.box, accessible_mask,
            periodic=domain.periodic,
        )
    dx = domain.dx
    rank = len(domain.resolution)
    dxprod = 1.0
    for d_ in dx:
        dxprod *= float(d_)
    div = fv_divergence(velocity, dx) / dxprod  # point divergence
    if all(domain.periodic) and accessible_mask is None:
        # discrete-symbol spectral solve: exactly inverts the (2*rank+1)-point
        # Laplacian the staggered divergence/gradient pair induces, so the
        # projection is divergence-free to machine precision
        solver = FourierPressureSolver()
        q = solver.solve(tuple(1.0 / float(d_) ** 2 for d_ in dx), div)
        comps_fd = []
        for d, v in enumerate(velocity.components):
            gq = (q - jnp.roll(q, 1, axis=d)) / dx[d]
            comps_fd.append(v - gq)
        out_ = StaggeredField(tuple(comps_fd), periodic=velocity.periodic)
        return (out_, q, None) if return_info else (out_, q)
    # bounded/masked: CG on the unit-influence masked Laplacian (also the
    # periodic-with-obstacles case — the spectral inverse assumes an
    # unobstructed box)
    res = tuple(domain.resolution)
    if accessible_mask is None:
        # assemble_pressure_laplacian reads neighbor masks through the pad
        # ring, which must WRAP on periodic axes (else wrap links get
        # dropped while the gradient wraps, leaving O(1) divergence in the
        # wrap columns). Bounded axes keep the OPEN default: active ring 0,
        # accessible ring 1 (Dirichlet ghost pressure).
        accessible_mask = jnp.ones(tuple(r + 2 for r in res), jnp.float32)
        active = jnp.ones(res, jnp.float32)
        for d in range(rank):
            pads = [(0, 0)] * rank
            pads[d] = (1, 1)
            active = jnp.pad(
                active, pads, mode="wrap" if domain.periodic[d] else "constant"
            )
    else:
        active = accessible_mask
    # per-axis face layout: unique faces on periodic axes, +1 duplicated
    # face on bounded axes (handles mixed periodicity, e.g. channels)
    comps = []
    for d in range(rank):
        shape = list(res)
        if not domain.periodic[d]:
            shape[d] += 1
        comps.append(jnp.ones(tuple(shape), velocity.dtype))
    influence = StaggeredField(tuple(comps), periodic=domain.periodic)
    # the system is singular (all-Neumann) only when no open boundary exists
    # — OPEN domains get Dirichlet-like ring rows that absorb net flux, and
    # deflating/shifting THOSE corrupts the solve (constant residual). Use
    # the reference's mask auto-detect (piso_cuda_pressure_solver.py:84-87)
    # when the masks are concrete; traced masks fall back to the
    # conservative singular treatment.
    from diffpiso_tpu.ops.laplace import detect_rank_deficiency

    if rank_deficient is not None:
        deficient = bool(rank_deficient)
    elif isinstance(active, jax.core.Tracer) or isinstance(
        accessible_mask, jax.core.Tracer
    ):
        raise ValueError(
            "divergence_free: masks are traced values, so singularity cannot "
            "be auto-detected at trace time — pass rank_deficient explicitly "
            "(True for all-Neumann/closed-periodic domains, False when an "
            "open boundary absorbs net flux)."
        )
    else:
        deficient = bool(detect_rank_deficiency(active, accessible_mask))
    # Singular systems are solved WITHOUT the rank-one shift here (always
    # rank_deficient=False at assembly): with solid cells the shift s*11^T
    # couples every row — including the otherwise-decoupled empty solid rows
    # — and its lone eigenvalue s*n (~1.5e5 at 64^3) amplifies the f32
    # roundoff leak of the residual mean until CG emits NaN (measured: the
    # deflated+shifted solve blew up at iteration ~1828 on the 64^3 sphere;
    # the unshifted consistent-rhs solve converges in 233). Instead the
    # singular-CG treatment below projects the rhs onto the range space
    # (active-mean removal) and leaves the inert null mode alone — the
    # returned q is gauge-arbitrary, and only its gradient is used.
    lap = assemble_pressure_laplacian(
        influence, active, accessible_mask, domain.periodic, rank_deficient=False
    )

    # hard boundary conditions: a face is open only if BOTH adjacent cells
    # are accessible (PoissonDomain.with_hard_boundary_conditions,
    # solver_api.py:114-122) — zeroing velocity through solid faces is what
    # puts a stationary obstacle's blockage into the divergence source.
    face_acc = _face_accessibility(accessible_mask, domain.periodic, res)
    velocity = StaggeredField(
        tuple(v * f for v, f in zip(velocity.components, face_acc)),
        periodic=velocity.periodic,
    )
    # moving obstacles imprint their rigid-body velocity AFTER the face
    # filter (fluid.py:239-244): the imprinted surface velocities are the
    # divergence forcing that actually pushes the fluid — filtering after
    # the imprint would wipe them and the obstacle would barely move flow.
    if obstacles:
        velocity = apply_obstacle_velocities(velocity, obstacles, domain.box)
    div = fv_divergence(velocity, dx) / dxprod
    # zero the rhs on inactive (solid) cells: their Laplacian rows are empty,
    # so any imprint-ramp divergence left inside the solid would make the
    # system inconsistent and CG diverges (q ~ 1e6 at surface-adjacent solid
    # cells before this mask)
    active_int = active[tuple(slice(1, -1) for _ in range(rank))]
    div = div * active_int
    if deficient:
        # consistent rhs for the unshifted singular system: remove the
        # active-cell mean ON active cells (a GLOBAL mean would dump the
        # compensation onto decoupled solid cells, where no operator row
        # can ever reduce it and max|r| stalls)
        div = div - (jnp.sum(div) / jnp.maximum(jnp.sum(active_int), 1.0)) * active_int
    from diffpiso_tpu.ops.laplace import apply_laplacian

    res = cg(
        lambda p: apply_laplacian(lap, p),
        div * (dx[0] ** 2),
        tol=tol,
        max_iter=max_iter,
        residual_reset=50,
        deflate_mean=False,
    )
    q = res.x
    comps_fd = []
    for d, v in enumerate(velocity.components):
        if domain.periodic[d]:
            # unique faces: grad at face i = (q_i - q_{i-1}) / dx, wrapped
            gq = (q - jnp.roll(q, 1, axis=d)) / dx[d]
        else:
            # zero ghost values: the Laplacian's boundary rows treat the
            # ring pressure as 0 (Dirichlet for OPEN boundaries), so the
            # face gradient must use the same ghost convention or the
            # projection leaves O(1) divergence in boundary rows. Closed
            # faces are zeroed by face_acc regardless.
            pad = [(0, 0)] * rank
            pad[d] = (1, 1)
            qp = jnp.pad(q, pad)
            lo = jax.lax.slice_in_dim(qp, 0, qp.shape[d] - 1, axis=d)
            hi = jax.lax.slice_in_dim(qp, 1, qp.shape[d], axis=d)
            gq = (hi - lo) / dx[d]
        comps_fd.append(v - gq * face_acc[d])
    out_ = StaggeredField(tuple(comps_fd), periodic=velocity.periodic)
    return (out_, q, res) if return_info else (out_, q)


def _face_accessibility(accessible_mask, periodic, res):
    """Per-component face-open masks: min of the two adjacent cells'
    accessibility (solver_api.py:114-122). accessible_mask is padded by one;
    periodic axes use unique faces (face i between cells i-1 and i, wrapped)."""
    rank = len(res)
    interior = accessible_mask[tuple(slice(1, -1) for _ in range(rank))]
    faces = []
    for d in range(rank):
        if periodic[d]:
            faces.append(jnp.minimum(interior, jnp.roll(interior, 1, axis=d)))
        else:
            n = res[d]
            sl_all = [slice(1, -1)] * rank
            lo_idx, hi_idx = list(sl_all), list(sl_all)
            lo_idx[d] = slice(0, n + 1)
            hi_idx[d] = slice(1, n + 2)
            faces.append(
                jnp.minimum(accessible_mask[tuple(lo_idx)], accessible_mask[tuple(hi_idx)])
            )
    return tuple(faces)


class FlowState(NamedTuple):
    velocity: StaggeredField
    density: Optional[jax.Array] = None


def incompressible_flow_step(
    state: FlowState,
    domain: Domain,
    dt,
    buoyancy_factor: float = 0.0,
    forces: Optional[StaggeredField] = None,
    accessible_mask=None,
    tol=1e-5,
    obstacles=(),
    density_effects=(),
    velocity_effects=(),
    rank_deficient=None,
) -> FlowState:
    """One operator-splitting step: advect density & velocity, apply
    effects, then buoyancy/forces, project (IncompressibleFlow.step,
    fluid.py:92-118: density_effects apply to the advected density;
    velocity_effects apply BEFORE buoyancy is added, fluid.py:104-109, so a
    FIX-mode effect region reads `value + buoyancy` rather than clamping
    the buoyancy away)."""
    from diffpiso_tpu.physics.effect import effect_applied

    vel = state.velocity
    density = state.density
    if density is not None:
        density = advect_centered(density, vel, dt, domain.dx)
        for eff in density_effects:
            density = effect_applied(eff, density, dt)
    vel = advect_semi_lagrangian(vel, vel, dt, domain.dx)
    for eff in velocity_effects:
        vel = effect_applied(eff, vel, dt)
    # buoyancy_factor may be a traced value (live EditableValue controls feed
    # it through jit) — never branch on its value, only on None
    if density is not None and buoyancy_factor is not None:
        buoy = centered_to_faces_like(density * buoyancy_factor * dt, vel)
        vel = StaggeredField(
            (vel.components[0] + buoy,) + vel.components[1:],
            periodic=vel.periodic,
        )
    if forces is not None:
        vel = vel + forces * dt
    vel, _ = divergence_free(
        vel, domain, accessible_mask, tol=tol, obstacles=obstacles,
        rank_deficient=rank_deficient,
    )
    return FlowState(velocity=vel, density=density)


def centered_to_faces_like(data: jax.Array, vel: StaggeredField) -> jax.Array:
    """Resample a centered field to the y-face locations of `vel`."""
    from diffpiso_tpu.ops.fv import centered_to_faces
    from diffpiso_tpu.fields.material import CIRCULAR, REPLICATE

    mode = CIRCULAR if vel.periodic[0] else REPLICATE
    return centered_to_faces(data, 0, mode)
