"""poisson_solve gradient modes (reference solver_api.py:133-175):
forward equality across modes, autodiff-vs-implicit gradient agreement
against finite differences, and the inverse mode's laplace-of-cotangent
backward."""

import jax
import jax.numpy as jnp
import numpy as np

from diffpiso_tpu import StaggeredField
from diffpiso_tpu.ops import apply_laplacian, assemble_pressure_laplacian
from diffpiso_tpu.solvers import PressureSolver, cg_differentiable, poisson_solve


def make_system(res=(6, 5), rank_deficient=True, seed=0):
    """All-Neumann masked Laplacian (the cavity-like singular case) and a
    compatible (mean-free) rhs."""
    ny, nx = res
    rng = np.random.RandomState(seed)
    infl = StaggeredField(
        (
            jnp.asarray(np.abs(rng.rand(ny + 1, nx)) + 0.5, jnp.float64),
            jnp.asarray(np.abs(rng.rand(ny, nx + 1)) + 0.5, jnp.float64),
        )
    )
    active = np.zeros((ny + 2, nx + 2), np.float64)
    active[1:-1, 1:-1] = 1
    lap = assemble_pressure_laplacian(
        infl,
        jnp.asarray(active),
        jnp.asarray(active),
        periodic=(False, False),
        rank_deficient=rank_deficient,
    )
    rhs = rng.randn(ny, nx)
    rhs -= rhs.mean()
    return lap, jnp.asarray(rhs)


def _solver(**kw):
    return PressureSolver(max_iterations=400, deflate_mean=True, **kw)


def test_forward_equal_across_modes():
    lap, rhs = make_system()
    cfg = _solver()
    outs = {}
    for mode in ("implicit", "autodiff", "inverse"):
        x, iters, warn = poisson_solve(cfg, lap, rhs, None, 1e-10, gradient=mode)
        assert not bool(warn), mode
        # compare mean-free representers (singular system: gauge freedom)
        outs[mode] = np.asarray(x - jnp.mean(x))
        res = np.asarray(apply_laplacian(lap, x) - rhs)
        assert np.abs(res).max() < 1e-7, mode
    np.testing.assert_allclose(outs["implicit"], outs["autodiff"], atol=1e-7)
    np.testing.assert_allclose(outs["implicit"], outs["inverse"], atol=1e-12)


def test_autodiff_gradient_matches_implicit_and_fd():
    lap, rhs = make_system()
    cfg = _solver()

    def loss(mode):
        def f(b):
            x, _, _ = poisson_solve(cfg, lap, b, None, 1e-11, gradient=mode)
            return jnp.sum(jnp.sin(x - jnp.mean(x)))

        return f

    g_imp = jax.grad(loss("implicit"))(rhs)
    g_auto = jax.grad(loss("autodiff"))(rhs)
    np.testing.assert_allclose(np.asarray(g_auto), np.asarray(g_imp), atol=1e-6)

    # finite differences on a few entries (perturbations kept mean-free so
    # the singular system stays compatible; both gradient modes are
    # insensitive to the mean shift through the mean-free loss)
    f = loss("implicit")
    eps = 1e-5
    rng = np.random.RandomState(1)
    for _ in range(3):
        d = rng.randn(*rhs.shape)
        d -= d.mean()
        d = jnp.asarray(d)
        fd = (f(rhs + eps * d) - f(rhs - eps * d)) / (2 * eps)
        ad = jnp.vdot(g_auto, d)
        np.testing.assert_allclose(float(ad), float(fd), rtol=1e-4)


def test_inverse_mode_backward_is_laplace_of_cotangent():
    lap, rhs = make_system()
    cfg = _solver()

    def f(b):
        x, _, _ = poisson_solve(cfg, lap, b, None, 1e-10, gradient="inverse")
        return x

    x, vjp = jax.vjp(f, rhs)
    g = jnp.asarray(np.random.RandomState(2).randn(*rhs.shape))
    (db,) = vjp(g)
    np.testing.assert_allclose(
        np.asarray(db), np.asarray(apply_laplacian(lap, g)), rtol=1e-12
    )


def test_cg_differentiable_solves_and_counts():
    lap, rhs = make_system(rank_deficient=False)
    x, iters, warn = cg_differentiable(
        lambda p: apply_laplacian(lap, p), rhs, tol=1e-9, n_iter=300,
        deflate_mean=True,
    )
    assert not bool(warn)
    assert 0 < int(iters) < 300
    res = np.asarray(apply_laplacian(lap, x) - (rhs - jnp.mean(rhs)))
    assert np.abs(res - res.mean()).max() < 1e-6
