"""poisson_solve with selectable gradient modes.

Parity with the reference's PoissonSolver API entry point
(PhiFlow/phi/physics/pressuresolver/solver_api.py:133-175), which exposes
``gradient in ('autodiff', 'implicit', 'inverse')``:

  implicit  — backward pass is ANOTHER Poisson solve on the cotangent
              (solver_api.py:166-167). Here: the existing
              solve_pressure_system custom_vjp (solvers/base.py), including
              warn gating and adjoint-failure gating.
  autodiff  — differentiate straight through the solver iterations; "the
              intermediate results of each loop iteration will be permanently
              stored if backpropagation is used" (solver_api.py:139-141).
              JAX cannot reverse-differentiate lax.while_loop, so the
              TPU-native equivalent is a FIXED-length lax.scan CG whose
              iterates the AD tape stores — the same memory/accuracy
              trade-off the reference documents.
  inverse   — backward pass applies the forward Laplacian to the cotangent
              (solver_api.py:168-170: ``laplace(grad)``). NOTE: this is the
              reference's cheap mode for pipelines that use the solve as the
              exact inverse of a laplace op (e.g. PhiFlow's optimize_pressure
              demo); it is NOT the adjoint of the solve itself.

All modes return (pressure, iterations, warn) like solve_pressure_system.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from diffpiso_tpu.ops.laplace import LaplaceStencil, apply_laplacian
from diffpiso_tpu.solvers.base import (
    PressureSolver,
    _pressure_solve_impl,
    solve_pressure_system,
)


def cg_differentiable(
    matvec,
    b,
    x0=None,
    tol=1e-6,
    n_iter: int = 100,
    deflate_mean: bool = False,
):
    """Fixed-length, reverse-differentiable CG.

    lax.scan stores every iterate, so jax.grad backpropagates through the
    actual iteration history (the reference's gradient='autodiff' semantics,
    solver_api.py:139-141). Converged iterations freeze their state via
    jnp.where, which keeps late iterations from injecting roundoff noise
    into the tape. Returns (x, iterations_used, warn)."""
    x = jnp.zeros_like(b) if x0 is None else x0
    if deflate_mean:
        b = b - jnp.mean(b)
        x = x - jnp.mean(x)
    r = b - matvec(x)
    p = r
    rs = jnp.vdot(r, r).real
    b_norm2 = jnp.maximum(jnp.vdot(b, b).real, jnp.finfo(b.dtype).tiny)
    tol2 = jnp.asarray(tol, b.dtype) ** 2 * b_norm2

    def body(carry, _):
        x, r, p, rs, iters = carry
        done = rs <= tol2
        Ap = matvec(p)
        pAp = jnp.vdot(p, Ap).real
        alpha = rs / jnp.where(pAp == 0, 1.0, pAp)
        x2 = x + alpha * p
        r2 = r - alpha * Ap
        if deflate_mean:
            x2 = x2 - jnp.mean(x2)
            r2 = r2 - jnp.mean(r2)
        rs2 = jnp.vdot(r2, r2).real
        beta = rs2 / jnp.where(rs == 0, 1.0, rs)
        p2 = r2 + beta * p
        sel = lambda new, old: jnp.where(done, old, new)
        return (
            sel(x2, x),
            sel(r2, r),
            sel(p2, p),
            sel(rs2, rs),
            iters + (~done).astype(jnp.int32),
        ), None

    (x, r, p, rs, iters), _ = jax.lax.scan(
        body, (x, r, p, rs, jnp.zeros((), jnp.int32)), None, length=n_iter
    )
    warn = (rs > tol2) | ~jnp.isfinite(rs)
    return x, iters, warn


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _poisson_solve_inverse(cfg: PressureSolver, laplacian, rhs, guess, tol):
    x, result = _pressure_solve_impl(cfg, laplacian, rhs, guess, tol)
    return x, result.iterations, result.warn


def _inverse_fwd(cfg, laplacian, rhs, guess, tol):
    x, result = _pressure_solve_impl(cfg, laplacian, rhs, guess, tol)
    return (x, result.iterations, result.warn), (laplacian, guess, tol)


def _inverse_bwd(cfg, residuals, cotangents):
    laplacian, guess, tol = residuals
    g, _gi, _gw = cotangents
    # solver_api.py:168-170: d(rhs) = laplace(cotangent) — the vjp of the
    # inverse relation rhs = L p, not of the solve
    db = apply_laplacian(laplacian, g)
    zeros_lap = jax.tree_util.tree_map(jnp.zeros_like, laplacian)
    dguess = None if guess is None else jnp.zeros_like(guess)
    return (zeros_lap, db, dguess, jnp.zeros_like(tol))


_poisson_solve_inverse.defvjp(_inverse_fwd, _inverse_bwd)


def poisson_solve(
    cfg: PressureSolver,
    laplacian: LaplaceStencil,
    rhs,
    guess=None,
    tol=1e-6,
    gradient: str = "implicit",
):
    """Solve L p = rhs with the chosen backprop strategy.

    gradient='implicit' (default, solver_api.py:133) delegates to
    solve_pressure_system; 'autodiff' runs the fixed-length differentiable
    CG (preconditioners don't apply — the tape IS the iteration); 'inverse'
    runs the production solver forward with the laplace-of-cotangent
    backward. Returns (pressure, iterations, warn)."""
    assert gradient in ("autodiff", "implicit", "inverse"), gradient
    if gradient == "implicit":
        return solve_pressure_system(cfg, laplacian, rhs, guess, tol)
    if gradient == "inverse":
        return _poisson_solve_inverse(cfg, laplacian, rhs, guess, tol)
    if cfg.deflate_mean:
        rhs = rhs - jnp.mean(rhs)
    return cg_differentiable(
        lambda p: apply_laplacian(laplacian, p),
        rhs,
        guess,
        tol=tol,
        n_iter=cfg.max_iterations,
        deflate_mean=cfg.deflate_mean,
    )
