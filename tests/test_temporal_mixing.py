"""Temporal mixing layer (periodic-x shear layer) — exercises
temporal_mixing_layer_masks (parity with piso_helpers.py:136-166) through a
few PISO steps."""

import numpy as np
import jax
import jax.numpy as jnp

from diffpiso_tpu import Box, CLOSED, Domain, PERIODIC
from diffpiso_tpu.core import SimulationParameters, piso_step
from diffpiso_tpu.core.masks import temporal_mixing_layer_masks
from diffpiso_tpu.fields.grid import StaggeredField
from diffpiso_tpu.ops.fv import fv_divergence
from diffpiso_tpu.solvers import AdvectionSolver, PressureSolver


def _setup(ny=32, nx=32):
    upper = np.full(nx, 0.5, np.float32)
    lower = np.full(nx, -0.5, np.float32)
    dm, dv, active, accessible, _ = temporal_mixing_layer_masks(
        (ny, nx), upper, lower
    )
    domain = Domain(
        (ny, nx), Box.from_size((1.0, 1.0)), boundaries=[(CLOSED, CLOSED), PERIODIC]
    )
    sim = SimulationParameters(
        dirichlet_mask=dm,
        dirichlet_values=dv,
        active_mask=active,
        accessible_mask=accessible,
        no_slip_mask=None,
        viscosity=1e-3,
        laplace_rank_deficient=True,
        bool_periodic=(False, True),
        linear_solver=AdvectionSolver(max_iterations=200),
        pressure_solver=PressureSolver(max_iterations=2000, deflate_mean=True),
    )
    # tanh shear profile with a small sinusoidal v perturbation to trigger KH
    y = (np.arange(ny) + 0.5) / ny - 0.5
    u = np.tanh(y * 10.0)[:, None].repeat(nx, 1) * 0.5
    x = np.arange(nx) / nx
    v = 0.02 * np.sin(2 * np.pi * 2 * x)[None, :].repeat(ny + 1, 0)
    vel = StaggeredField(
        (jnp.asarray(v, jnp.float32), jnp.asarray(u, jnp.float32)),
        periodic=(False, True),
    )
    return domain, sim, vel


def test_temporal_mixing_layer_masks_shapes():
    dm, dv, active, accessible, noslip = temporal_mixing_layer_masks(
        (16, 24), np.ones(24), -np.ones(24)
    )
    assert dm.components[0].shape == (17, 24)  # v faces, unique in periodic x
    assert dm.components[1].shape == (16, 24)
    assert active.shape == (18, 26)
    assert noslip is None
    # boundary u rows carry the wall velocities
    np.testing.assert_allclose(np.asarray(dv.components[1][0]), -1.0)
    np.testing.assert_allclose(np.asarray(dv.components[1][-1]), 1.0)


def test_temporal_mixing_layer_piso_steps():
    domain, sim, vel = _setup()
    p = domain.centered_grid(0.0)
    dt = 0.01
    for _ in range(3):
        out = piso_step(
            vel, p, dt, domain, sim, advection_tol=1e-5, pressure_tol=1e-5
        )
        vel, p = out.velocity, out.pressure
    assert not bool(out.warn)
    for c in vel.components:
        assert np.isfinite(np.asarray(c)).all()
    div = np.asarray(fv_divergence(vel, domain.dx))
    assert np.abs(div[1:-1, :]).max() < 1e-3
    # the shear structure survives (u still ~ +-0.5 at the walls)
    u = np.asarray(vel.components[1])
    assert u[0].mean() < -0.3 and u[-1].mean() > 0.3
