"""The differentiable PISO step.

TPU-native equivalent of the reference's piso_step (diffpiso/piso_tf.py:11-81):
one predictor (implicit advection-diffusion solve) and two pressure
correctors, all matrix-free, all under jit, with implicit-function-theorem
adjoints inside the solver wrappers. Unlike the reference (TF1 session with
host round-trips every step), states stay on device and steps compose with
jax.lax.scan.

Algorithm (same math, term by term):

  beta  = prod(dx)/dt                                      (piso_tf.py:26)
  M, A  = advection-diffusion stencil around current v     (piso_tf.py:29-33)
  rhs   = v*beta - grad(p) [+ f*prod(dx)], Dirichlet rows -> -dirichlet_values
                                                           (piso_tf.py:36-40)
  v*    : solve (-M) v* = rhs                              (piso_tf.py:42-47)
  corrector 1:
    lap  = Laplacian with influence 1/(beta-A)*dx_factor   (piso_tf.py:16-19,54)
    p1   : solve lap p1 = div(v*)                          (piso_tf.py:51-55)
    v**  = v* - grad(p1)/(beta-A)/prod(dx)                 (piso_tf.py:58)
  corrector 2:
    H    = (M - diag(A-beta)) (v** - v*)                   (piso_tf.py:61-63)
    p2   : solve lap p2 = div(H/(beta-A))                  (piso_tf.py:66-68)
    v*** = v** + (H - grad(p2)/prod(dx))/(beta-A)          (piso_tf.py:71-73)
  p    += p1 + p2                                          (piso_tf.py:75)

One deliberate improvement: the pressure Laplacian is assembled once and
reused by both correctors (the reference rebuilds the identical matrix
inside each PressureSolveOp call).
"""

from __future__ import annotations

import dataclasses
import math as _math
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from diffpiso_tpu.fields.domain import Domain
from diffpiso_tpu.fields.grid import StaggeredField
from diffpiso_tpu.ops.fv import fv_divergence, fv_gradient
from diffpiso_tpu.ops.laplace import assemble_pressure_laplacian
from diffpiso_tpu.ops.stencil import assemble_advection_stencil, explicit_H
from diffpiso_tpu.solvers.base import (
    AdvectionSolver,
    PressureSolver,
    solve_advection_system,
    solve_pressure_system,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SimulationParameters:
    """Boundary/solver configuration for a PISO simulation.

    Mirrors the reference's SimulationParameters (piso_tf.py:165-182). Mask
    semantics (reference README.md:61-66): dirichlet_* live on staggered
    faces; active/accessible/no_slip are centered masks padded by one cell.
    """

    dirichlet_mask: StaggeredField  # bool components
    dirichlet_values: StaggeredField
    active_mask: jax.Array  # (res+2,) centered, padded
    accessible_mask: jax.Array
    no_slip_mask: Optional[jax.Array]  # (res+2,) bool, padded; None = no walls
    viscosity: Any  # scalar or StaggeredField (per-face)
    laplace_rank_deficient: jax.Array | bool = False
    bool_periodic: Tuple[bool, ...] = dataclasses.field(
        default=(False, False), metadata=dict(static=True)
    )
    linear_solver: AdvectionSolver = dataclasses.field(
        default=AdvectionSolver(), metadata=dict(static=True)
    )
    pressure_solver: PressureSolver = dataclasses.field(
        default=PressureSolver(), metadata=dict(static=True)
    )


class PisoOutput(NamedTuple):
    velocity: StaggeredField
    pressure: jax.Array
    pressure_inc1: jax.Array
    pressure_inc2: jax.Array
    warn: jax.Array  # bool: any solve failed - momentum or pressure (gradients gated)
    adv_residual: jax.Array
    p_iterations: jax.Array  # iterations of the two pressure solves (stacked)
    intermediates: Any  # dict when full_output else None
    # adjoint warm-start channels (solvers/base.py solve_*_ws): present iff
    # `adjoint_channels` was passed in; wire into the NEXT step's
    # adjoint_channels through the rollout scan carry. Primal values are
    # zeros; under reverse-mode AD the chain delivers each backward step's
    # adjoint solutions to the preceding backward step as warm starts.
    adjoint_channels: Any = None


def piso_step(
    velocity: StaggeredField,
    pressure: jax.Array,
    dt,
    domain: Domain,
    sim: SimulationParameters,
    dirichlet_values: StaggeredField | None = None,
    viscosity_field=None,
    forcing_term: StaggeredField | None = None,
    pressure_inc1_guess: jax.Array | None = None,
    pressure_inc2_guess: jax.Array | None = None,
    advection_tol=1e-6,
    pressure_tol=1e-6,
    full_output: bool = False,
    adjoint_channels=None,
) -> PisoOutput:
    """Advance one PISO step. All args trace under jit; dt/tolerances may be
    runtime values (the reference feeds them via placeholders).

    adjoint_channels — optional (momentum_channel, p1_channel, p2_channel)
    from the PREVIOUS step's output.adjoint_channels (or zeros-shaped
    initials, see `zero_adjoint_channels`): enables warm-started adjoint
    solves in unrolled-gradient rollouts (VERDICT r2 item 8). Forward
    results are identical; only the backward pass changes (each adjoint
    solve starts from the succeeding step's adjoint solution)."""
    dx = domain.dx
    dxprod = _math.prod(dx)
    beta = dxprod / dt
    if dirichlet_values is None:
        dirichlet_values = sim.dirichlet_values
    viscosity = viscosity_field if viscosity_field is not None else sim.viscosity

    # -- operator assembly (zero gradient through coefficients, handled by the
    #    solver's custom_vjp; assembly itself is stop_gradient'ed to keep the
    #    autodiff graph lean, matching piso_tf.py:116-128)
    stencil = assemble_advection_stencil(
        jax.tree_util.tree_map(jax.lax.stop_gradient, velocity),
        dx,
        domain.velocity_pad_modes(),
        viscosity,
        beta,
        sim.dirichlet_mask,
        sim.active_mask,
        sim.accessible_mask,
        sim.no_slip_mask,
        sim.bool_periodic,
    )
    A = StaggeredField(stencil.diag_A, periodic=velocity.periodic)

    # -- predictor ---------------------------------------------------------------
    p_grad = fv_gradient(
        pressure, dx, domain.pressure_pad_modes(), sim.accessible_mask
    )
    rhs = velocity * beta - p_grad
    if forcing_term is not None:
        rhs = rhs + forcing_term * dxprod
    rhs = StaggeredField(
        tuple(
            jnp.where(dm, -dv, r)
            for dm, dv, r in zip(
                sim.dirichlet_mask.components,
                dirichlet_values.components,
                rhs.components,
            )
        ),
        periodic=velocity.periodic,
    )
    if adjoint_channels is not None:
        from diffpiso_tpu.solvers.base import solve_advection_system_ws

        am_ch, a1_ch, a2_ch = adjoint_channels
        velocity_star, warn, am_out = solve_advection_system_ws(
            sim.linear_solver, stencil, rhs, velocity, advection_tol, am_ch
        )
    else:
        velocity_star, warn = solve_advection_system(
            sim.linear_solver, stencil, rhs, velocity, advection_tol
        )

    # -- corrector 1 --------------------------------------------------------------
    # dx_factor: FV integration of d2p/dx2 over the cell divided by dx for the
    # derivative at the face (assumes dx == dy, like the reference,
    # piso_tf.py:50-53)
    dx_factor = dxprod / (dx[0] ** 2)
    beta_minus_A = StaggeredField(
        tuple(beta - a for a in A.components), periodic=velocity.periodic
    )
    influence = StaggeredField(
        tuple(dx_factor / c for c in beta_minus_A.components),
        periodic=velocity.periodic,
    )
    laplacian = assemble_pressure_laplacian(
        jax.tree_util.tree_map(jax.lax.stop_gradient, influence),
        sim.active_mask,
        sim.accessible_mask,
        sim.bool_periodic,
        sim.laplace_rank_deficient,
    )

    # The pressure systems are only defined on active cells (the Laplacian has
    # zero rows elsewhere, laplace_op.cu.cc:118-135 semantics): a nonzero rhs
    # on an inactive cell makes the singular system inconsistent and CG
    # diverges. The reference never hits this because its Dirichlet values are
    # constant along each boundary row, so the ghost-row divergence vanishes;
    # state-dependent ghost values (core/masks.py second_order_lid_values)
    # break that invariant — mask the rhs explicitly.
    active_int = sim.active_mask[tuple(slice(1, -1) for _ in range(len(dx)))]

    v1_div = fv_divergence(velocity_star, dx) * active_int
    if adjoint_channels is not None:
        from diffpiso_tpu.solvers.base import solve_pressure_system_ws

        p_inc1, iters1, pw1, a1_out = solve_pressure_system_ws(
            sim.pressure_solver, laplacian, v1_div, pressure_inc1_guess,
            pressure_tol, a1_ch,
        )
    else:
        p_inc1, iters1, pw1 = solve_pressure_system(
            sim.pressure_solver, laplacian, v1_div, pressure_inc1_guess,
            pressure_tol,
        )

    # fused corrector-1 bridge: the whole grad -> velocity update ->
    # explicit_H -> scale -> divergence chain between the two pressure
    # solves as ONE launch (ops/pallas_corrector.py; VERDICT r3 item 5 —
    # the inter-solve glue was the largest remaining share of the forward
    # step's 3.1x-over-HBM-floor device time). Periodic unmasked domains
    # only; masks are trace-time constants, so the condition is static.
    _bridge_ok = False
    if all(velocity.periodic):
        from diffpiso_tpu.ops import pallas_corrector as _pc

        comps_ = velocity_star.components
        import numpy as _np

        # the mask triviality check must run on the HOST (np on the
        # concrete arrays): jnp ops on closed-over constants inside a
        # jit/scan trace yield tracers, and bool(tracer) throws
        _bridge_ok = (
            all(c.shape == p_inc1.shape for c in comps_)
            and _pc.eligible(p_inc1.shape, p_inc1.dtype)
            and not isinstance(sim.active_mask, jax.core.Tracer)
            and bool(_np.all(_np.asarray(sim.active_mask) == 1))
            and (sim.accessible_mask is None
                 or (not isinstance(sim.accessible_mask, jax.core.Tracer)
                     and bool(_np.all(_np.asarray(sim.accessible_mask) == 1))))
        )
    if _bridge_ok:
        v2_c, h_c, h_div = _pc.corrector1_bridge(
            p_inc1, velocity_star.components, beta_minus_A.components,
            stencil, stencil.diag_A, beta, dx,
        )
        velocity_s2 = StaggeredField(v2_c, periodic=velocity.periodic)
        h = StaggeredField(h_c, periodic=velocity.periodic)
    else:
        grad_p1 = fv_gradient(p_inc1, dx, domain.pressure_pad_modes(), sim.accessible_mask)
        velocity_s2 = velocity_star - StaggeredField(
            tuple(
                g / bma / dxprod
                for g, bma in zip(grad_p1.components, beta_minus_A.components)
            ),
            periodic=velocity.periodic,
        )

        # -- corrector 2 ----------------------------------------------------------
        h = explicit_H(stencil, velocity_s2 - velocity_star, beta)
        h_over = StaggeredField(
            tuple(hc / bma for hc, bma in zip(h.components, beta_minus_A.components)),
            periodic=velocity.periodic,
        )
        h_div = fv_divergence(h_over, dx) * active_int
    if adjoint_channels is not None:
        from diffpiso_tpu.solvers.base import solve_pressure_system_ws

        p_inc2, iters2, pw2, a2_out = solve_pressure_system_ws(
            sim.pressure_solver, laplacian, h_div, pressure_inc2_guess,
            pressure_tol, a2_ch,
        )
    else:
        p_inc2, iters2, pw2 = solve_pressure_system(
            sim.pressure_solver, laplacian, h_div, pressure_inc2_guess,
            pressure_tol,
        )

    if _bridge_ok:
        velocity_s3 = StaggeredField(
            _pc.corrector2_tail(
                p_inc2, velocity_s2.components, h.components,
                beta_minus_A.components, dx,
            ),
            periodic=velocity.periodic,
        )
    else:
        grad_p2 = fv_gradient(p_inc2, dx, domain.pressure_pad_modes(), sim.accessible_mask)
        velocity_s3 = velocity_s2 + StaggeredField(
            tuple(
                (hc - g / dxprod) / bma
                for hc, g, bma in zip(
                    h.components, grad_p2.components, beta_minus_A.components
                )
            ),
            periodic=velocity.periodic,
        )

    new_pressure = pressure + p_inc1 + p_inc2

    intermediates = None
    if full_output:
        # parity with the reference's 17 full_output returns
        # (piso_tf.py:77-79), matrix-free analogs noted per key. The first
        # four (velocity_s3, pressure, pressure_inc1/2) and warn are the
        # regular PisoOutput fields; the rest land here.
        intermediates = dict(
            # matrix_values/column_indices/row_pointers -> the stencil
            # coefficient planes (the CSR triplet collapses to per-face
            # coefficient tensors in the matrix-free design)
            stencil=stencil,
            # Aflat -> the diagonal array A (piso_tf.py:29-33)
            diag_A=stencil.diag_A,
            # implicit_rhs (piso_tf.py:36-40)
            rhs=rhs,
            implicit_rhs=rhs,
            # sol -> the raw predictor solution; identical to velocity_star
            # here (no flatten/re-stagger round trip exists)
            sol=velocity_star,
            velocity_star=velocity_star,
            velocity_s2=velocity_s2,
            # velocity_s3_data -> the output velocity's raw components
            velocity_s3_data=velocity_s3.components,
            v1div=v1_div,
            v1_div=v1_div,
            # Lap1/Lap2 -> assembled once and reused by both correctors (a
            # deliberate improvement; the reference rebuilds it per solve)
            Lap1=laplacian,
            Lap2=laplacian,
            laplacian=laplacian,
            # extras beyond the reference's list (debugging the corrector-2
            # chain): H and its scaled divergence
            h=h,
            h_div=h_div,
        )
    return PisoOutput(
        velocity=velocity_s3,
        pressure=new_pressure,
        pressure_inc1=p_inc1,
        pressure_inc2=p_inc2,
        # any failed solve taints the step: momentum OR either pressure
        # corrector (the reference surfaces only the BiCGSTAB warn,
        # piso_tf.py:44,81; the pressure flags close the recovery gap for
        # stalled/non-finite CG — each solve's gradient is gated separately)
        warn=warn | pw1 | pw2,
        adv_residual=jnp.zeros(()),
        p_iterations=jnp.stack([iters1, iters2]),
        intermediates=intermediates,
        adjoint_channels=(
            (am_out, a1_out, a2_out) if adjoint_channels is not None else None
        ),
    )


def zero_adjoint_channels(velocity: StaggeredField, pressure: jax.Array):
    """Initial (momentum, p1, p2) adjoint warm-start channels for a rollout
    scan carry: zeros shaped like the solver rhs's. See piso_step's
    `adjoint_channels` and solvers/base.py solve_pressure_system_ws."""
    zvel = jax.tree_util.tree_map(jnp.zeros_like, velocity)
    zp = jnp.zeros_like(pressure)
    return (zvel, zp, zp)
