"""End-to-end PISO step tests on the lid-driven cavity (the reference's
validation case, lid_driven_cavity_2d.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpiso_tpu import Box, Domain, OPEN, StaggeredField
from diffpiso_tpu.core import SimulationParameters, lid_driven_cavity_masks, piso_step
from diffpiso_tpu.ops import fv_divergence
from diffpiso_tpu.solvers import AdvectionSolver, PressureSolver


def cavity_setup(N=32, re=1000.0, dtype="float64"):
    dm, dv, active, accessible, no_slip = lid_driven_cavity_masks(N)
    domain = Domain(
        (N + 1, N), Box.from_size((1.0 + 1.0 / N, 1.0)), boundaries=OPEN
    )
    sim = SimulationParameters(
        dirichlet_mask=dm,
        dirichlet_values=dv,
        active_mask=active,
        accessible_mask=accessible,
        no_slip_mask=no_slip,
        viscosity=1.0 / re,
        laplace_rank_deficient=True,
        linear_solver=AdvectionSolver(max_iterations=100, dtype=dtype),
        pressure_solver=PressureSolver(
            max_iterations=1000, dtype=dtype, deflate_mean=True
        ),
    )
    return domain, sim


def run_steps(domain, sim, n_steps, dt=0.01, tol=1e-6):
    vel = domain.staggered_grid(0.0)
    p = domain.centered_grid(0.0)

    @jax.jit
    def step(vel, p):
        out = piso_step(
            vel, p, dt, domain, sim, advection_tol=tol, pressure_tol=tol
        )
        return out.velocity, out.pressure, out.warn, out.p_iterations

    warns = []
    for _ in range(n_steps):
        vel, p, warn, p_iters = step(vel, p)
        warns.append(bool(warn))
    return vel, p, warns


def test_cavity_steps_stable_and_divergence_free():
    domain, sim = cavity_setup(N=24)
    vel, p, warns = run_steps(domain, sim, 5, dt=0.01, tol=1e-8)
    assert not any(warns)
    for c in vel.components:
        assert bool(jnp.all(jnp.isfinite(c)))
    # interior divergence should be at solver-tolerance level
    div = np.asarray(fv_divergence(vel, domain.dx))
    active = np.asarray(sim.active_mask)[1:-1, 1:-1]
    assert np.abs(div * active).max() < 1e-5
    # the lid drags fluid: u in the top active row must be positive
    u = np.asarray(vel.components[1])
    assert u[-2, 1:-1].mean() > 0.01
    # Dirichlet faces hold their values
    np.testing.assert_allclose(u[-1, :], 1.0, atol=1e-5)
    # side walls at rest (the top corner face belongs to the lid row)
    np.testing.assert_allclose(u[:-1, 0], 0.0, atol=1e-6)


def test_second_order_lid_stable_and_deeper():
    """The state-dependent ghost row (2*U - u_int, core/masks.py
    second_order_lid_values) must run stably — its column-varying ghost
    values put nonzero divergence on INACTIVE dummy-row cells, which the
    piso_step rhs masking must zero (else the singular pressure system is
    inconsistent and CG diverges) — and must deepen the centerline compared
    to the first-order lid at equal step count (the Ghia-gap fix,
    examples/validate_ghia.py)."""
    from diffpiso_tpu.core import second_order_lid_values

    N = 24
    domain, sim = cavity_setup(N=N)

    @jax.jit
    def step(vel, p, lid2):
        dv = jax.tree_util.tree_map(
            lambda a, b: jnp.where(lid2, a, b),
            second_order_lid_values(sim.dirichlet_values, vel),
            sim.dirichlet_values,
        )
        out = piso_step(
            vel, p, 0.02, domain, sim, dirichlet_values=dv,
            advection_tol=1e-8, pressure_tol=1e-8,
        )
        return out.velocity, out.pressure, out.warn

    mins = {}
    for lid2 in (False, True):
        vel = domain.staggered_grid(0.0)
        p = domain.centered_grid(0.0)
        for _ in range(40):
            u_pre_top = np.asarray(vel.components[1])[-2, 1:-1]
            vel, p, warn = step(vel, p, jnp.asarray(lid2))
            assert not bool(warn)
        u = np.asarray(vel.components[1])
        assert np.all(np.isfinite(u))
        mins[lid2] = u[:N, N // 2].min()
        if lid2:
            # ghost row holds 2*U - u_interior (lagged: dv is computed from
            # the pre-step state, like the reference's explicit BC updates)
            np.testing.assert_allclose(
                u[-1, 1:-1], 2.0 - u_pre_top, atol=1e-5
            )
    # stronger effective lid -> deeper return flow
    assert mins[True] < mins[False] - 1e-4, mins


def test_cavity_velocity_magnitude_bounded():
    domain, sim = cavity_setup(N=16)
    vel, p, warns = run_steps(domain, sim, 10, dt=0.02, tol=1e-7)
    assert not any(warns)
    # no velocity should exceed the lid speed (physics sanity)
    for c in vel.components:
        assert float(jnp.max(jnp.abs(c))) <= 1.0 + 1e-3


def test_piso_step_differentiable():
    domain, sim = cavity_setup(N=12, dtype=None)
    vel = domain.staggered_grid(0.0)
    p = domain.centered_grid(0.0)

    def loss(vel0):
        out = piso_step(
            vel0, p, 0.01, domain, sim, advection_tol=1e-7, pressure_tol=1e-6
        )
        out2 = piso_step(
            out.velocity, out.pressure, 0.01, domain, sim,
            advection_tol=1e-7, pressure_tol=1e-6,
        )
        return sum(jnp.sum(c**2) for c in out2.velocity.components)

    g = jax.jit(jax.grad(loss))(vel)
    for leaf in jax.tree_util.tree_leaves(g):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert total > 0.0


def test_scan_rollout_matches_python_loop():
    domain, sim = cavity_setup(N=12, dtype=None)
    vel0 = domain.staggered_grid(0.0)
    p0 = domain.centered_grid(0.0)

    def step_fn(carry, _):
        vel, p = carry
        out = piso_step(
            vel, p, 0.01, domain, sim, advection_tol=1e-7, pressure_tol=1e-6
        )
        return (out.velocity, out.pressure), out.warn

    (vel_s, p_s), warns = jax.lax.scan(step_fn, (vel0, p0), None, length=3)

    vel_l, p_l = vel0, p0
    for _ in range(3):
        out = piso_step(
            vel_l, p_l, 0.01, domain, sim, advection_tol=1e-7, pressure_tol=1e-6
        )
        vel_l, p_l = out.velocity, out.pressure

    for a, b in zip(vel_s.components, vel_l.components):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_obstacle_channel_masks_and_flow():
    """Flow past a cylinder (obstacle_channel_masks): masks consistent, a few
    PISO steps finite, velocity inside the obstacle ~ 0."""
    import numpy as np
    import jax.numpy as jnp

    from diffpiso_tpu import Box, Domain, OPEN
    from diffpiso_tpu.core import SimulationParameters, piso_step
    from diffpiso_tpu.core.masks import obstacle_channel_masks
    from diffpiso_tpu.fields import Sphere
    from diffpiso_tpu.solvers import AdvectionSolver, PressureSolver

    ny, nx = 24, 48
    box = Box.from_size((1.0, 2.0))
    cyl = Sphere(center=(0.5, 0.5), radius=0.15)
    dm, dv, active, accessible, no_slip = obstacle_channel_masks(
        (ny, nx), np.ones(ny + 2, np.float32), cyl, box
    )
    # solid cells are inactive and inaccessible
    solid = np.asarray(no_slip)[1:-1, 1:-1]
    assert solid.sum() > 10
    assert (np.asarray(active)[1:-1, 1:-1][solid] == 0).all()
    assert (np.asarray(accessible)[1:-1, 1:-1][solid] == 0).all()

    domain = Domain((ny, nx), box, boundaries=OPEN)
    sim = SimulationParameters(
        dirichlet_mask=dm, dirichlet_values=dv, active_mask=active,
        accessible_mask=accessible, no_slip_mask=no_slip, viscosity=5e-3,
        laplace_rank_deficient=False,
        linear_solver=AdvectionSolver(max_iterations=60),
        pressure_solver=PressureSolver(max_iterations=400, preconditioner="channel"),
    )
    vel = domain.staggered_grid(0.0)
    vel = type(vel)(
        (vel.components[0], jnp.ones_like(vel.components[1])), periodic=vel.periodic
    )
    p = domain.centered_grid(0.0)
    for _ in range(3):
        out = piso_step(vel, p, 0.01, domain, sim, advection_tol=1e-5,
                        pressure_tol=1e-5)
        vel, p = out.velocity, out.pressure
    for c in vel.components:
        assert np.isfinite(np.asarray(c)).all()
    # u inside the cylinder stays pinned at the no-slip value
    ju, iu = ny // 2, nx // 4  # cylinder center in cell coords
    assert abs(float(vel.components[1][ju, iu])) < 1e-5
