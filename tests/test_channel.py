"""Plane-channel (pipe) flow: the mixed-periodicity PISO configuration
(channel_masks: no-slip y walls + periodic x, bool_periodic=(False, True))
driven by a body force must converge to the analytic Poiseuille profile
u(y) = G/(2 nu) y (H - y) — an exact steady NS solution, so this is a
physics oracle for the wall treatment (the 2-nu no-slip diagonal penalty,
central_difference_csr_op.cu.cc:265-288) AND the periodic-x stencil wraps
in one test."""

import jax
import jax.numpy as jnp
import numpy as np

from diffpiso_tpu import Box, Domain, OPEN, PERIODIC
from diffpiso_tpu.core import SimulationParameters, channel_masks, piso_step
from diffpiso_tpu.fields import StaggeredField
from diffpiso_tpu.solvers import AdvectionSolver, PressureSolver


def test_poiseuille_profile():
    ny, nx, nu, G = 16, 16, 0.1, 0.01
    dm, dv, active, accessible, no_slip = channel_masks(ny, nx)
    domain = Domain((ny, nx), Box.from_size((float(ny), float(nx))),
                    boundaries=(OPEN, PERIODIC))
    sim = SimulationParameters(
        dirichlet_mask=dm, dirichlet_values=dv, active_mask=active,
        accessible_mask=accessible, no_slip_mask=no_slip, viscosity=nu,
        laplace_rank_deficient=True, bool_periodic=(False, True),
        linear_solver=AdvectionSolver(max_iterations=100),
        pressure_solver=PressureSolver(max_iterations=300, deflate_mean=True),
    )
    vel = StaggeredField(
        (jnp.zeros((ny + 1, nx), jnp.float32), jnp.zeros((ny, nx), jnp.float32)),
        periodic=(False, True),
    )
    p = domain.centered_grid(0.0)
    forcing = StaggeredField(
        (jnp.zeros((ny + 1, nx), jnp.float32),
         jnp.full((ny, nx), G, jnp.float32)),
        periodic=(False, True),
    )
    dt = 0.25 * min(domain.dx) ** 2 / nu

    @jax.jit
    def run(vel, p, g1, g2):
        def body(carry, _):
            vel, p, g1, g2 = carry
            out = piso_step(
                vel, p, dt, domain, sim, forcing_term=forcing,
                pressure_inc1_guess=g1, pressure_inc2_guess=g2,
                advection_tol=1e-7, pressure_tol=1e-7,
            )
            return (out.velocity, out.pressure, out.pressure_inc1,
                    out.pressure_inc2), out.warn

        (vel, p, g1, g2), warns = jax.lax.scan(
            body, (vel, p, g1, g2), None, length=100
        )
        return vel, p, g1, g2, warns

    g1 = jnp.zeros_like(p)
    g2 = jnp.zeros_like(p)
    # ~3 diffusive times H^2/nu = 2560 time units; dt = 2.5 -> 1100 steps
    for _ in range(11):
        vel, p, g1, g2, warns = run(vel, p, g1, g2)
        assert not bool(jnp.any(warns))

    H = float(ny) * domain.dx[0]
    yc = (np.arange(ny) + 0.5) * domain.dx[0]
    u_exact = G / (2 * nu) * yc * (H - yc)
    u_num = np.asarray(vel.components[1]).mean(axis=1)
    rel = np.linalg.norm(u_num - u_exact) / np.linalg.norm(u_exact)
    assert rel < 0.03, (rel, u_num, u_exact)
    # x-invariance: periodic channel, uniform forcing -> columns identical
    u = np.asarray(vel.components[1])
    assert np.abs(u - u.mean(axis=1, keepdims=True)).max() < 1e-5
    # wall-normal velocity negligible
    assert np.abs(np.asarray(vel.components[0])).max() < 1e-5
