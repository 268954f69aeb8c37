"""Gradient-fidelity audit at training scale (VERDICT round-1 item 6).

The IFT adjoints relax the backward solves to `tol * max|cotangent|`
(solvers/base.py _adjoint_tol) — a deviation from the reference's
fully-converged float64 adjoints (piso_cuda_pressure_solver.py:38,56-58).
These tests quantify the end-to-end gradient error of a 10-step unrolled
rollout loss at float32 training tolerances (1e-6, the reference's
solver_precision) against a float64 tight-tolerance ground truth, and
validate the ground truth itself against central finite differences.

Measured on the 32^2 periodic-turbulence rollout:
  f32 @ tol 1e-6 vs f64 @ tol 1e-11 (10 steps): rel l2 error  well under 2e-3
  f64 1-step adjoint vs FD:                     exact (< 1e-6)
  f64 10-step adjoint vs FD:                    ~3.3e-3 — NOT solver error
    but the deliberate Picard linearization (matrix coefficients carry zero
    gradient, piso_tf.py:116-128): FD sees the dropped d(M)/d(velocity)
    terms, the adjoint intentionally does not.
"""

import jax
import jax.numpy as jnp
import numpy as np

from diffpiso_tpu import StaggeredField
from diffpiso_tpu.core import piso_step
from diffpiso_tpu.core.setups import decaying_turbulence_setup
from diffpiso_tpu.fields.noise import random_solenoidal
from diffpiso_tpu.solvers import AdvectionSolver, PressureSolver

N = 32
STEPS = 10


def _setup(dtype_str):
    domain, sim = decaying_turbulence_setup((N, N), viscosity=1e-3)
    import dataclasses

    sim = dataclasses.replace(
        sim,
        linear_solver=AdvectionSolver(max_iterations=400, dtype=dtype_str),
        pressure_solver=dataclasses.replace(
            sim.pressure_solver, max_iterations=2000, dtype=dtype_str,
            residual_reset=1000 if dtype_str == "float64" else 50,
        ),
    )
    return domain, sim


def _loss_fn(domain, sim, vel0, p0, tol, steps=STEPS):
    dt = 0.4 / N

    def loss(forcing):
        def body(carry, _):
            vel, p, g1, g2 = carry
            out = piso_step(
                vel, p, dt, domain, sim,
                forcing_term=forcing,
                pressure_inc1_guess=g1,
                pressure_inc2_guess=g2,
                advection_tol=tol,
                pressure_tol=tol,
            )
            return (
                out.velocity, out.pressure, out.pressure_inc1, out.pressure_inc2,
            ), out.warn

        (vel, p, _, _), warns = jax.lax.scan(
            body, (vel0, p0, jnp.zeros_like(p0), jnp.zeros_like(p0)), None,
            length=steps,
        )
        # L2-to-target style loss (the training losses are sums of squares)
        return sum(jnp.sum((c - 0.1) ** 2) for c in vel.components), warns

    return loss


def _state(seed=0):
    domain, _ = decaying_turbulence_setup((N, N))
    vel = random_solenoidal(domain, jax.random.PRNGKey(seed), amplitude=0.5)
    p = domain.centered_grid(0.0)
    forcing = StaggeredField(
        (jnp.zeros((N, N), jnp.float32), jnp.zeros((N, N), jnp.float32)),
        periodic=(True, True),
    )
    return vel, p, forcing


def test_f32_training_gradient_matches_f64_truth():
    """10-step rollout gradient at f32 training tolerance (with the
    _adjoint_tol relaxation in effect) vs f64 tight-tolerance ground truth:
    relative l2 error < 2e-3 (measured ~2e-4)."""
    vel, p, forcing = _state()

    dom32, sim32 = _setup(None)
    loss32 = _loss_fn(dom32, sim32, vel, p, 1e-6)
    g32, warns32 = jax.jit(jax.grad(loss32, has_aux=True))(forcing)
    assert not bool(jnp.any(warns32))

    dom64, sim64 = _setup("float64")
    vel64 = vel.astype(jnp.float64)
    p64 = p.astype(jnp.float64)
    forcing64 = forcing.astype(jnp.float64)
    loss64 = _loss_fn(dom64, sim64, vel64, p64, 1e-11)
    g64, warns64 = jax.jit(jax.grad(loss64, has_aux=True))(forcing64)
    assert not bool(jnp.any(warns64))

    num = den = 0.0
    for a, b in zip(g32.components, g64.components):
        a = np.asarray(a, np.float64)
        b = np.asarray(b)
        num += np.sum((a - b) ** 2)
        den += np.sum(b**2)
    rel = np.sqrt(num / den)
    assert den > 0
    assert rel < 2e-3, f"f32 training-tolerance gradient off by {rel:.2e} (rel l2)"


def _fd_vs_adjoint(steps, seed):
    """Max relative error of the adjoint directional derivative vs central
    finite differences over 2 random directions (f64, tight tolerances)."""
    vel, p, forcing = _state(seed=seed)
    dom, sim = _setup("float64")
    vel, p, forcing = (
        vel.astype(jnp.float64), p.astype(jnp.float64), forcing.astype(jnp.float64)
    )
    loss = _loss_fn(dom, sim, vel, p, 1e-12, steps=steps)
    loss_val = jax.jit(lambda f: loss(f)[0])
    g, _ = jax.jit(jax.grad(loss, has_aux=True))(forcing)

    rng = np.random.RandomState(0)
    worst = 0.0
    for _ in range(2):
        d = StaggeredField(
            tuple(
                jnp.asarray(rng.randn(*c.shape), jnp.float64)
                for c in forcing.components
            ),
            periodic=(True, True),
        )
        eps = 1e-5
        plus = float(loss_val(forcing + d * eps))
        minus = float(loss_val(forcing + d * (-eps)))
        fd = (plus - minus) / (2 * eps)
        adj = float(
            sum(jnp.sum(gc * dc) for gc, dc in zip(g.components, d.components))
        )
        worst = max(worst, abs(fd - adj) / max(abs(fd), 1e-30))
    return worst


def test_f64_single_step_gradient_is_exact_vs_fd():
    """For a SINGLE step the forcing gradient has no dropped terms (the
    operator coefficients depend only on the input velocity), so the IFT
    adjoint must match finite differences to solver/FD precision."""
    rel = _fd_vs_adjoint(steps=1, seed=1)
    assert rel < 1e-6, f"single-step adjoint off by rel {rel:.2e}"


def test_f64_multistep_picard_bias_is_bounded():
    """Across a 10-step rollout the adjoint DELIBERATELY drops the matrix
    -coefficient Jacobian (Picard linearization — exact reference semantics,
    piso_tf.py:116-128), so FD and adjoint differ by the linearization bias.
    Measured ~3.3e-3 relative on this workload; assert it stays below 2e-2
    (a blow-up here would mean the dropped terms dominate training signal)."""
    rel = _fd_vs_adjoint(steps=STEPS, seed=1)
    assert 1e-7 < rel < 2e-2, f"multi-step Picard bias rel {rel:.2e}"


def test_remat_policies_gradient_parity():
    """The remat policies used at scale must not change the gradient:
    whole-step jax.checkpoint, the 'diffpiso_solve_res' policy (save
    operator coefficients, replay linear chains) and the r5
    'diffpiso_solve_out' policy (save solve outputs, replay assembly/FV —
    the Krylov loops are never re-run) all reproduce the un-remat'd
    gradient to f32 reduction-order tolerance."""
    import functools

    domain, sim = _setup("float32")
    vel0, p0, forcing = _state(seed=3)
    dt = 0.4 / N

    def make_loss(wrap):
        def body(carry, _):
            vel, p, g1, g2 = carry
            out = piso_step(
                vel, p, dt, domain, sim,
                forcing_term=body.forcing,
                pressure_inc1_guess=g1,
                pressure_inc2_guess=g2,
                advection_tol=1e-6,
                pressure_tol=1e-6,
            )
            return (
                out.velocity, out.pressure, out.pressure_inc1,
                out.pressure_inc2,
            ), None

        def step_like(carry, _):
            return body(carry, _)

        def loss(forcing):
            body.forcing = forcing
            stepped = wrap(step_like) if wrap is not None else step_like
            (vel, p, _, _), _ = jax.lax.scan(
                stepped, (vel0, p0, jnp.zeros_like(p0), jnp.zeros_like(p0)),
                None, length=5,
            )
            return sum(jnp.sum((c - 0.1) ** 2) for c in vel.components)

        return loss

    g_ref = jax.jit(jax.grad(make_loss(None)))(forcing)
    wraps = {
        "step": jax.checkpoint,
        "solves": functools.partial(
            jax.checkpoint,
            policy=jax.checkpoint_policies.save_only_these_names(
                "diffpiso_solve_res"),
        ),
        "outputs": functools.partial(
            jax.checkpoint,
            policy=jax.checkpoint_policies.save_only_these_names(
                "diffpiso_solve_out"),
        ),
    }
    for name, wrap in wraps.items():
        g = jax.jit(jax.grad(make_loss(wrap)))(forcing)
        for a, b in zip(g.components, g_ref.components):
            scale = float(jnp.max(jnp.abs(b))) + 1e-12
            err = float(jnp.max(jnp.abs(a - b))) / scale
            assert err < 2e-4, (name, err)
