"""Full-PISO-step integration of the r3 fused-kernel families in interpret
mode: every gate forced ON at once (masked assembly + bounded FV + fused
spectral/PCG paths), compared against the all-jnp step. The per-kernel unit
tests pin each kernel's math; this pins their composition inside piso_step
(operand layouts, dispatch interactions, custom-VJP chaining through the
unrolled gradient)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpiso_tpu import Box, Domain, OPEN
from diffpiso_tpu.core import (
    SimulationParameters,
    lid_driven_cavity_masks,
    piso_step,
)
from diffpiso_tpu.core.setups import decaying_turbulence_setup
from diffpiso_tpu.fields.grid import StaggeredField
from diffpiso_tpu.ops import pallas_advassembly, pallas_fv
from diffpiso_tpu.solvers import AdvectionSolver, PressureSolver, pallas_krylov


def _force_all(monkeypatch):
    for mod in (pallas_fv, pallas_advassembly, pallas_krylov):
        monkeypatch.setattr(mod, "_INTERPRET", True)
        if hasattr(mod, "_roll"):
            monkeypatch.setattr(mod, "_roll",
                                lambda a, s, ax: jnp.roll(a, s, ax))
    monkeypatch.setattr(pallas_advassembly, "_rollp",
                        lambda x, s, ax: jnp.roll(x, s, ax))
    monkeypatch.setenv("DIFFPISO_FUSED_ADVM", "auto")
    monkeypatch.setenv("DIFFPISO_FUSED_FVM", "auto")
    monkeypatch.setenv("DIFFPISO_FUSED_SPECTRAL", "auto")
    monkeypatch.setattr(pallas_advassembly, "advassembly_masked_eligible",
                        lambda *a, **k: True)
    monkeypatch.setattr(pallas_fv, "eligible2m", lambda *a, **k: True)
    monkeypatch.setattr(pallas_krylov, "spectral_eligible",
                        lambda *a, **k: True)


def _cavity_step(n=24, tol=1e-6):
    dm, dv, active, accessible, no_slip = lid_driven_cavity_masks(n)
    domain = Domain((n + 1, n), Box.from_size((1.0 + 1.0 / n, 1.0)),
                    boundaries=OPEN)
    sim = SimulationParameters(
        dirichlet_mask=dm, dirichlet_values=dv, active_mask=active,
        accessible_mask=accessible, no_slip_mask=no_slip, viscosity=1e-3,
        laplace_rank_deficient=True,
        linear_solver=AdvectionSolver(max_iterations=100),
        pressure_solver=PressureSolver(
            max_iterations=300, deflate_mean=True,
            preconditioner="dct_mm", adjoint_preconditioner="dct_mm",
        ),
    )
    dt = 0.2 / n

    def rollout(vel, p, steps=3):
        def body(carry, _):
            vel, p, g1, g2 = carry
            out = piso_step(
                vel, p, dt, domain, sim,
                pressure_inc1_guess=g1, pressure_inc2_guess=g2,
                advection_tol=tol, pressure_tol=tol,
            )
            return (out.velocity, out.pressure, out.pressure_inc1,
                    out.pressure_inc2), out.warn

        (vel, p, _, _), warns = jax.lax.scan(
            body, (vel, p, jnp.zeros_like(p), jnp.zeros_like(p)), None,
            length=steps,
        )
        return vel, p, warns

    vel0 = domain.staggered_grid(0.0)
    p0 = domain.centered_grid(0.0)
    return rollout, vel0, p0


def test_cavity_fullstep_all_fused_matches_jnp(monkeypatch):
    rollout, vel0, p0 = _cavity_step()
    vel_ref, p_ref, warns = rollout(vel0, p0)
    assert not bool(jnp.any(warns))

    _force_all(monkeypatch)
    vel_f, p_f, warns_f = rollout(vel0, p0)
    assert not bool(jnp.any(warns_f))
    for a, b in zip(vel_f.components, vel_ref.components):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_cavity_fullstep_all_fused_gradient_matches_jnp(monkeypatch):
    rollout, vel0, p0 = _cavity_step()
    lid = jnp.asarray(np.random.RandomState(0).randn(*vel0.components[1].shape),
                      jnp.float32) * 0.01

    def loss(scale):
        v0 = StaggeredField(
            (vel0.components[0], vel0.components[1] + scale * lid),
            periodic=vel0.periodic,
        )
        vel, p, warns = rollout(v0, p0, steps=2)
        return sum(jnp.sum(c ** 2) for c in vel.components)

    g_ref = jax.grad(loss)(jnp.float32(1.0))
    _force_all(monkeypatch)
    g_f = jax.grad(loss)(jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_ref),
                               rtol=5e-3, atol=1e-8)


def test_turb_fullstep_all_fused_matches_jnp(monkeypatch):
    """Periodic turbulence config: uniform fused assembly + periodic fused
    FV + fused Krylov/BiCGSTAB/Jacobi + fused spectral preconditioner (incl.
    the folded mm p-update), all forced, vs the all-jnp step."""
    n = 32
    domain, sim = decaying_turbulence_setup((n, n), viscosity=1e-3)
    rng = np.random.RandomState(1)
    vel0 = StaggeredField(
        tuple(jnp.asarray(0.3 * rng.randn(n, n), jnp.float32)
              for _ in range(2)),
        periodic=(True, True),
    )
    p0 = domain.centered_grid(0.0)
    dt = 0.4 / n

    def rollout(vel, p, steps=3):
        def body(carry, _):
            vel, p, g1, g2 = carry
            out = piso_step(
                vel, p, dt, domain, sim,
                pressure_inc1_guess=g1, pressure_inc2_guess=g2,
                advection_tol=1e-6, pressure_tol=1e-7,
            )
            return (out.velocity, out.pressure, out.pressure_inc1,
                    out.pressure_inc2), out.warn

        (vel, p, _, _), warns = jax.lax.scan(
            body, (vel, p, jnp.zeros_like(p), jnp.zeros_like(p)), None,
            length=steps,
        )
        return vel, p, warns

    vel_ref, _, warns = rollout(vel0, p0)
    assert not bool(jnp.any(warns))

    _force_all(monkeypatch)
    # also force the periodic kernel families the cavity test can't reach
    monkeypatch.setattr(pallas_krylov, "eligible", lambda *a, **k: True)
    monkeypatch.setattr(pallas_fv, "eligible2", lambda *a, **k: True)
    monkeypatch.setattr(pallas_fv, "eligible2m", lambda *a, **k: False)
    monkeypatch.setattr(pallas_advassembly, "_INTERPRET", True)
    vel_f, _, warns_f = rollout(vel0, p0)
    assert not bool(jnp.any(warns_f))
    for a, b in zip(vel_f.components, vel_ref.components):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
