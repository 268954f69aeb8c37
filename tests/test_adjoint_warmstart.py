"""Adjoint warm-start channels (VERDICT r2 item 8; solvers/base.py
solve_pressure_system_ws / solve_advection_system_ws, core/piso.py
adjoint_channels).

The channels thread each backward-scan step's adjoint solutions to the
preceding backward step as warm-start guesses via cotangent plumbing.
Correctness bar: gradients of an unrolled rollout loss with channels must
match the channel-free gradients to (tight) solver tolerance — the warm
start changes ONLY the adjoint solves' starting points, and the IFT
adjoint converges to the same solution from any guess."""

import jax
import jax.numpy as jnp
import numpy as np

from diffpiso_tpu import StaggeredField
from diffpiso_tpu.core import piso_step, zero_adjoint_channels
from diffpiso_tpu.core.setups import decaying_turbulence_setup


def _rollouts(n=32, unroll=6, tol=1e-7):
    domain, sim = decaying_turbulence_setup(
        (n, n), viscosity=0.01, max_iterations=(80, 400)
    )
    rng = np.random.RandomState(0)
    vel = StaggeredField(
        (
            jnp.asarray(0.3 * rng.randn(n, n), jnp.float32),
            jnp.asarray(0.3 * rng.randn(n, n), jnp.float32),
        ),
        periodic=(True, True),
    )
    p = domain.centered_grid(0.0)
    dt = 0.4 / n

    def loss_plain(forcing, vel, p):
        def body(carry, _):
            vel, p, g1, g2 = carry
            out = piso_step(
                vel, p, dt, domain, sim, forcing_term=forcing,
                pressure_inc1_guess=g1, pressure_inc2_guess=g2,
                advection_tol=tol, pressure_tol=tol,
            )
            return (out.velocity, out.pressure, out.pressure_inc1,
                    out.pressure_inc2), out.warn

        (vel, p, _, _), warns = jax.lax.scan(
            body, (vel, p, jnp.zeros_like(p), jnp.zeros_like(p)), None,
            length=unroll,
        )
        return sum(jnp.sum(c**2) for c in vel.components), warns

    def loss_ws(forcing, vel, p):
        def body(carry, _):
            vel, p, g1, g2, ch = carry
            out = piso_step(
                vel, p, dt, domain, sim, forcing_term=forcing,
                pressure_inc1_guess=g1, pressure_inc2_guess=g2,
                advection_tol=tol, pressure_tol=tol,
                adjoint_channels=ch,
            )
            return (out.velocity, out.pressure, out.pressure_inc1,
                    out.pressure_inc2, out.adjoint_channels), out.warn

        ch0 = zero_adjoint_channels(vel, p)
        (vel, p, _, _, _), warns = jax.lax.scan(
            body, (vel, p, jnp.zeros_like(p), jnp.zeros_like(p), ch0), None,
            length=unroll,
        )
        return sum(jnp.sum(c**2) for c in vel.components), warns

    forcing = StaggeredField(
        (
            jnp.asarray(0.05 * rng.randn(n, n), jnp.float32),
            jnp.asarray(0.05 * rng.randn(n, n), jnp.float32),
        ),
        periodic=(True, True),
    )
    return loss_plain, loss_ws, forcing, vel, p


def test_warmstart_forward_identical():
    loss_plain, loss_ws, forcing, vel, p = _rollouts()
    l0, w0 = jax.jit(lambda f, v, pp: loss_plain(f, v, pp))(forcing, vel, p)
    l1, w1 = jax.jit(lambda f, v, pp: loss_ws(f, v, pp))(forcing, vel, p)
    assert not bool(jnp.any(w0)) and not bool(jnp.any(w1))
    # the forward path is bit-identical: channels only carry zeros
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


def test_warmstart_gradients_match_cold():
    loss_plain, loss_ws, forcing, vel, p = _rollouts()
    g0 = jax.jit(jax.grad(lambda f, v, pp: loss_plain(f, v, pp)[0]))(
        forcing, vel, p
    )
    g1 = jax.jit(jax.grad(lambda f, v, pp: loss_ws(f, v, pp)[0]))(
        forcing, vel, p
    )
    for a, b in zip(g1.components, g0.components):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max()
        assert scale > 0
        # both adjoints converge to the same solution to solver tolerance;
        # the warm start only changes the Krylov starting point
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5 * scale)


def test_warmstart_channels_shapes():
    loss_plain, loss_ws, forcing, vel, p = _rollouts(n=16, unroll=2)
    ch = zero_adjoint_channels(vel, p)
    assert len(ch) == 3
    assert ch[1].shape == p.shape and ch[2].shape == p.shape
    for c, v in zip(ch[0].components, vel.components):
        assert c.shape == v.shape
