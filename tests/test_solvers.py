"""Solver tests: Krylov convergence vs dense oracles, IFT adjoints, warn gating."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpiso_tpu import StaggeredField
from diffpiso_tpu.fields.material import SYMMETRIC
from diffpiso_tpu.ops import (
    apply_laplacian,
    apply_stencil,
    assemble_advection_stencil,
    assemble_pressure_laplacian,
    laplacian_to_dense,
    stencil_to_dense,
)
from diffpiso_tpu.ops.fv import centered_to_staggered
from diffpiso_tpu.solvers import (
    AdvectionSolver,
    PressureSolver,
    bicgstab,
    cg,
    solve_advection_system,
    solve_pressure_system,
)


def physical_case(res=(6, 8), seed=0, dtype=jnp.float32):
    """A well-posed cavity-like advection system."""
    rng = np.random.RandomState(seed)
    ny, nx = res
    vel = StaggeredField(
        (
            jnp.asarray(0.3 * rng.randn(ny + 1, nx), dtype),
            jnp.asarray(0.3 * rng.randn(ny, nx + 1), dtype),
        )
    )
    dm_v = np.zeros((ny + 1, nx), bool)
    dm_v[0] = dm_v[-1] = True
    dm_u = np.zeros((ny, nx + 1), bool)
    dm_u[:, 0] = dm_u[:, -1] = True
    dmask = StaggeredField((jnp.asarray(dm_v), jnp.asarray(dm_u)))
    active = np.zeros((ny + 2, nx + 2), np.float32)
    active[1:-1, 1:-1] = 1
    no_slip = np.zeros((ny + 2, nx + 2), bool)
    no_slip[0] = no_slip[-1] = True
    no_slip[:, 0] = no_slip[:, -1] = True
    dx = (0.25, 0.25)
    beta = float(np.prod(dx)) / 0.02
    st = assemble_advection_stencil(
        vel, dx, SYMMETRIC, 0.01, beta, dmask,
        jnp.asarray(active), jnp.asarray(active), jnp.asarray(no_slip),
        (False, False),
    )
    rhs = StaggeredField(
        (
            jnp.asarray(rng.randn(ny + 1, nx), dtype),
            jnp.asarray(rng.randn(ny, nx + 1), dtype),
        )
    )
    return st, rhs, dx, beta


def dense_solution(st, rhs, transpose=False):
    sols = []
    for c in range(2):
        M = -stencil_to_dense(st, c)
        if transpose:
            M = M.T
        b = np.asarray(rhs.components[c], np.float64).reshape(-1)
        sols.append(np.linalg.solve(M, b).reshape(rhs.components[c].shape))
    return sols


def test_bicgstab_matches_dense_solve():
    st, rhs, _, _ = physical_case()
    cfg = AdvectionSolver(max_iterations=500)
    x, warn = cfg.solve(st, rhs, tol=1e-6)
    assert not bool(warn)
    expected = dense_solution(st, rhs)
    for c in range(2):
        np.testing.assert_allclose(
            np.asarray(x.components[c]), expected[c], rtol=1e-4, atol=1e-5
        )


def test_bicgstab_warm_start_converges_fast():
    st, rhs, _, _ = physical_case()
    cfg = AdvectionSolver(max_iterations=500)
    x, _ = cfg.solve(st, rhs, tol=1e-6)
    res = bicgstab(
        lambda v: apply_stencil(st, v, negate=True), rhs, x, tol=1e-6,
        max_iter=500,
    )
    assert int(res.iterations) <= 1


def test_advection_adjoint_is_transposed_solve():
    st, rhs, _, _ = physical_case(seed=3)
    cfg = AdvectionSolver(max_iterations=500)

    def f(rhs):
        x, _ = solve_advection_system(cfg, st, rhs, None, 1e-8)
        return x

    g = StaggeredField(
        tuple(
            jnp.asarray(np.random.RandomState(5).randn(*c.shape), jnp.float32)
            for c in rhs.components
        )
    )
    _, vjp_fn = jax.vjp(f, rhs)
    (db,) = vjp_fn(g)
    expected = dense_solution(st, g, transpose=True)
    for c in range(2):
        np.testing.assert_allclose(
            np.asarray(db.components[c]), expected[c], rtol=1e-3, atol=1e-4
        )


def test_stencil_coefficients_get_zero_gradient():
    st, rhs, _, _ = physical_case(seed=4)
    cfg = AdvectionSolver(max_iterations=500)

    def loss(st_in):
        x, _ = solve_advection_system(cfg, st_in, rhs, None, 1e-7)
        return sum(jnp.sum(c**2) for c in x.components)

    grads = jax.grad(loss)(st)
    for leaf in jax.tree_util.tree_leaves(grads):
        np.testing.assert_array_equal(np.asarray(leaf), 0.0)


def laplace_case(res=(6, 7), rank_deficient=False):
    ny, nx = res
    infl = centered_to_staggered(jnp.ones((ny, nx), jnp.float32) * 0.8)
    active = np.zeros((ny + 2, nx + 2), np.float32)
    active[1:-1, 1:-1] = 1
    if not rank_deficient:
        # open top boundary: accessible outside -> Dirichlet-like row
        accessible = active.copy()
        accessible[0, 1:-1] = 1
    else:
        accessible = active.copy()
    lap = assemble_pressure_laplacian(
        infl, jnp.asarray(active), jnp.asarray(accessible), (False, False),
        rank_deficient,
    )
    return lap


def test_cg_matches_dense_nonsingular():
    lap = laplace_case(rank_deficient=False)
    rng = np.random.RandomState(0)
    b = jnp.asarray(rng.randn(6, 7), jnp.float32)
    # 2e-5 sits just above the measured float32 residual-evaluation floor
    # for this system (~1.2e-5); tighter tolerances need the float64 /
    # compensated path (PressureSolver(dtype="float64")).
    res = cg(
        lambda p: apply_laplacian(lap, p), b, tol=2e-5, max_iter=2000,
        residual_reset=50,
    )
    assert bool(res.converged), float(res.residual_norm)
    dense = laplacian_to_dense(lap)
    expected = np.linalg.solve(dense, np.asarray(b, np.float64).reshape(-1))
    np.testing.assert_allclose(
        np.asarray(res.x).reshape(-1), expected, rtol=1e-3, atol=1e-4
    )


def test_cg_rank_one_shift_solves_singular_system():
    lap = laplace_case(rank_deficient=True)
    rng = np.random.RandomState(1)
    b = rng.randn(6, 7)
    b -= b.mean()  # compatible RHS for the all-Neumann system
    b = jnp.asarray(b, jnp.float32)
    res = cg(lambda p: apply_laplacian(lap, p), b, tol=1e-5, max_iter=4000)
    assert bool(res.converged)
    # solution satisfies the *unshifted* equation up to the shift null-space
    # component: L x + s*sum(x) = b with sum(x) ~ 0
    assert abs(float(jnp.sum(res.x))) < 1e-2


def test_pressure_adjoint_matches_fd():
    lap = laplace_case(rank_deficient=False)
    cfg = PressureSolver(max_iterations=4000, dtype="float64")
    rng = np.random.RandomState(2)
    b = jnp.asarray(rng.randn(6, 7), jnp.float32)
    w = jnp.asarray(rng.randn(6, 7), jnp.float32)

    def loss(b_in):
        p, _, _ = solve_pressure_system(cfg, lap, b_in, None, 1e-10)
        return jnp.sum(w * p)

    g = jax.grad(loss)(b)
    eps = 1e-3
    d = jnp.asarray(rng.randn(6, 7), jnp.float32)
    fd = (loss(b + eps * d) - loss(b - eps * d)) / (2 * eps)
    np.testing.assert_allclose(
        float(jnp.sum(g * d)), float(fd), rtol=2e-2
    )


def test_warn_gates_gradient_to_zero():
    st, rhs, _, _ = physical_case(seed=6)
    # cripple the solver so it cannot converge -> warn -> zero gradient
    cfg = AdvectionSolver(max_iterations=1, precondition=False)

    _, warn = solve_advection_system(cfg, st, rhs, None, 1e-30)
    assert bool(warn)

    def f(rhs_in):
        x, _ = solve_advection_system(cfg, st, rhs_in, None, 1e-30)
        return sum(jnp.sum(c) for c in x.components)

    db = jax.grad(f)(rhs)
    for leaf in jax.tree_util.tree_leaves(db):
        np.testing.assert_array_equal(np.asarray(leaf), 0.0)


def test_solve_under_jit_with_traced_tol():
    st, rhs, _, _ = physical_case(seed=7)
    cfg = AdvectionSolver(max_iterations=500)

    @jax.jit
    def run(rhs, tol):
        return solve_advection_system(cfg, st, rhs, None, tol)

    x1, w1 = run(rhs, jnp.float32(1e-3))
    x2, w2 = run(rhs, jnp.float32(1e-7))
    assert not bool(w2)
    expected = dense_solution(st, rhs)
    np.testing.assert_allclose(
        np.asarray(x2.components[0]), expected[0], rtol=1e-4, atol=1e-5
    )


def test_dct_preconditioned_pcg_matches_plain_cg():
    # Neumann-exact spectral preconditioner (solvers/fourier.py
    # NeumannSpectralSolver) must converge to the same solution as plain CG
    # on the all-Neumann variable-coefficient system — in far fewer
    # iterations.
    from diffpiso_tpu.solvers.base import PressureSolver, _make_pressure_precond
    from diffpiso_tpu.solvers.krylov import pcg

    lap = laplace_case(res=(16, 16), rank_deficient=True)
    rng = np.random.RandomState(3)
    b = rng.randn(16, 16)
    b -= b.mean()
    b = jnp.asarray(b, jnp.float32)

    plain = cg(
        lambda p: apply_laplacian(lap, p), b, tol=1e-5, max_iter=4000,
        residual_reset=50, deflate_mean=True,
    )
    precond = _make_pressure_precond("dct", lap)
    fast = pcg(
        lambda p: apply_laplacian(lap, p), b, precond=precond, tol=1e-5,
        max_iter=2000, residual_reset=50, deflate_mean=True,
    )
    assert bool(fast.converged), float(fast.residual_norm)
    assert int(fast.iterations) < int(plain.iterations) / 3
    a = np.asarray(plain.x) - np.asarray(plain.x).mean()
    c = np.asarray(fast.x) - np.asarray(fast.x).mean()
    np.testing.assert_allclose(c, a, atol=2e-4)


def test_dct_solver_exact_on_constant_coefficients():
    from diffpiso_tpu.solvers.fourier import NeumannSpectralSolver

    lap = laplace_case(res=(8, 10), rank_deficient=True)
    dense = laplacian_to_dense(lap)
    rng = np.random.RandomState(4)
    b = rng.randn(8, 10)
    b -= b.mean()
    # constant influence 0.8 -> DCT solve is exact (up to the rank-one shift
    # which acts on the mean = 0 component)
    p = np.asarray(NeumannSpectralSolver().solve((0.8, 0.8), jnp.asarray(b)))
    shift_free = dense - dense.mean()  # remove rank-one shift s*ee^T rows? no:
    # apply the stencil directly instead: residual of the unshifted operator
    from diffpiso_tpu.ops.laplace import apply_laplacian as apl
    r = np.asarray(apl(lap, jnp.asarray(p, jnp.float32))) - b
    # the rank-one shift contributes s*sum(p)=0 since p is zero-mean
    assert np.abs(r).max() < 1e-4


def test_scipy_solver_oracle_and_adjoint():
    """scipy_sparse_solve (LinearSolverScipy parity, linear_solver.py:33-57):
    exact solve via pure_callback + transposed-solve adjoint."""
    from diffpiso_tpu.solvers.scipy_solver import ScipySolver, scipy_sparse_solve

    lap = laplace_case(res=(6, 7), rank_deficient=False)
    rng = np.random.RandomState(7)
    b = jnp.asarray(rng.randn(6, 7), jnp.float32)
    x = ScipySolver().solve_pressure(lap, b)
    dense = laplacian_to_dense(lap)
    want = np.linalg.solve(dense, np.asarray(b, np.float64).ravel())
    np.testing.assert_allclose(np.asarray(x).ravel(), want, rtol=1e-4, atol=1e-5)

    # adjoint == transposed solve applied to the cotangent
    dense_j = jnp.asarray(dense, jnp.float32)

    def loss(bb):
        return jnp.sum(scipy_sparse_solve(dense_j, bb) ** 2)

    g = jax.grad(loss)(b)
    want_g = np.linalg.solve(dense.T, 2 * np.asarray(x, np.float64).ravel())
    np.testing.assert_allclose(np.asarray(g).ravel(), want_g, rtol=1e-3, atol=1e-4)

    # the matrix itself gets zero gradient (Picard linearization)
    gm = jax.grad(lambda m: jnp.sum(scipy_sparse_solve(m, b)))(dense_j)
    np.testing.assert_array_equal(np.asarray(gm), 0.0)


def test_float64_pressure_path_converges_tighter():
    """PressureSolver(dtype='float64') — the cast_to_double parity path
    (piso_cuda_pressure_solver.py:38,56-58) — reaches tolerances f32 cannot."""
    from diffpiso_tpu.solvers.base import PressureSolver, solve_pressure_system

    lap = laplace_case(res=(24, 24), rank_deficient=True)
    rng = np.random.RandomState(5)
    b = rng.randn(24, 24)
    b -= b.mean()
    b = jnp.asarray(b, jnp.float32)
    tol = 1e-9  # far below the f32 residual floor for this system

    f64 = PressureSolver(max_iterations=5000, deflate_mean=True, dtype="float64",
                         residual_reset=200)
    p64, iters, warn = solve_pressure_system(f64, lap, b, None, tol)
    assert p64.dtype == jnp.float32  # cast back to the graph dtype
    assert not bool(warn)
    # verify against the f64 dense solve
    dense = laplacian_to_dense(lap)
    want = np.linalg.lstsq(dense, np.asarray(b, np.float64).ravel(), rcond=None)[0]
    got = np.asarray(p64, np.float64).ravel()
    got -= got.mean(); want -= want.mean()
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_randomized_restarts_compile_and_recover():
    """randomized_restarts (pressure_solve_op.cu.cc:359-396 parity): a solve
    capped too low to converge triggers perturbed-guess retries; with enough
    budget across attempts the final result must improve or match."""
    from diffpiso_tpu.solvers.base import PressureSolver, solve_pressure_system

    lap = laplace_case(res=(16, 16), rank_deficient=True)
    rng = np.random.RandomState(6)
    b = rng.randn(16, 16)
    b -= b.mean()
    b = jnp.asarray(b, jnp.float32)

    # no-restart baseline: starved iteration budget -> warn
    starved = PressureSolver(max_iterations=3, deflate_mean=True, residual_reset=0)
    _, _, warn0 = solve_pressure_system(starved, lap, b, None, 1e-10)
    # restarts configured: still traces/executes fine and returns sane output
    retrying = PressureSolver(max_iterations=3, deflate_mean=True, residual_reset=0,
                              randomized_restarts=2)
    p, iters, warn = jax.jit(
        lambda bb: solve_pressure_system(retrying, lap, bb, None, 1e-10)
    )(b)
    assert np.isfinite(np.asarray(p)).all()
    # healthy-budget solve with restarts enabled behaves like without
    healthy = PressureSolver(max_iterations=2000, deflate_mean=True,
                             randomized_restarts=2)
    p2, _, warn2 = solve_pressure_system(healthy, lap, b, None, 1e-5)
    assert not bool(warn2)


def test_dct4_matches_scipy_and_roundtrips():
    import scipy.fft as sfft

    from diffpiso_tpu.solvers.fourier import dct4, idct4

    x = np.random.RandomState(0).randn(4, 16).astype(np.float32)
    got = np.asarray(dct4(jnp.asarray(x), axis=1))
    want = sfft.dct(x, type=4, axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    back = np.asarray(idct4(dct4(jnp.asarray(x), axis=0), axis=0))
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-5)


def test_channel_spectral_solver_exact_on_oracle():
    """ChannelSpectralSolver inverts the Neumann-walls/Neumann-inflow/
    half-sample-Dirichlet-outflow constant-coefficient operator exactly."""
    from diffpiso_tpu.solvers.fourier import ChannelSpectralSolver

    ny, nx = 6, 8
    wy, wx = 1.3, 0.7
    N = ny * nx
    A = np.zeros((N, N))
    for j in range(ny):
        for i in range(nx):
            r = j * nx + i
            for dj in (-1, 1):
                jj = j + dj
                if 0 <= jj < ny:
                    A[r, jj * nx + i] += wy
                    A[r, r] -= wy
            for di in (-1, 1):
                ii = i + di
                if 0 <= ii < nx:
                    A[r, j * nx + ii] += wx
                    A[r, r] -= wx
                elif di == 1:  # outflow face: ghost = -p
                    A[r, r] -= 2 * wx
    rhs = np.random.RandomState(1).randn(ny, nx)
    sol = np.asarray(ChannelSpectralSolver().solve((wy, wx), jnp.asarray(rhs)))
    res = A @ sol.ravel() - rhs.ravel()
    assert np.abs(res).max() < 1e-4


def test_channel_preconditioner_on_mixing_layer_system():
    """PCG with the channel preconditioner converges the REAL mixing-layer
    pressure system in a fraction of plain CG's iterations (measured 992 ->
    2.25 per corrector at 128x512 on TPU)."""
    from diffpiso_tpu.core import piso_step, spatial_mixing_layer_setup
    from diffpiso_tpu.solvers.base import _make_pressure_precond
    from diffpiso_tpu.solvers.krylov import pcg

    setup = spatial_mixing_layer_setup(
        simulation=dict(HRres=(16, 64), box_size=(8.0, 32.0), dt=0.4),
        max_iterations=(100, 2000),
    )
    vel, p = setup.initial_state()
    out = piso_step(vel, p, setup.dt, setup.domain, setup.sim,
                    advection_tol=1e-5, pressure_tol=1e-5, full_output=True)
    lap = out.intermediates["laplacian"]
    rhs = out.intermediates["v1_div"]

    plain = cg(lambda x: apply_laplacian(lap, x), rhs, tol=1e-6, max_iter=4000,
               residual_reset=50)
    pc = _make_pressure_precond("channel", lap)
    fast = pcg(lambda x: apply_laplacian(lap, x), rhs, precond=pc, tol=1e-6,
               max_iter=2000, residual_reset=50)
    assert bool(fast.converged), float(fast.residual_norm)
    assert int(fast.iterations) * 5 < int(plain.iterations)
    a = np.asarray(plain.x) - np.asarray(plain.x).mean()
    b2 = np.asarray(fast.x) - np.asarray(fast.x).mean()
    np.testing.assert_allclose(b2, a, atol=1e-3)


def test_sparse_csr_bridge_matches_dense():
    """stencil_to_scipy_csr / laplacian_to_scipy_csr (the production-scale
    oracle bridge used by the measured baseline protocol) agree with the
    scalar-loop dense constructions."""
    from diffpiso_tpu.solvers.scipy_solver import (
        laplacian_to_scipy_csr,
        stencil_to_scipy_csr,
    )

    st, _, _, _ = physical_case(seed=11)
    lap = laplace_case(rank_deficient=True)
    for c in range(2):
        dense = stencil_to_dense(st, c)
        sparse = stencil_to_scipy_csr(st, c).toarray()
        np.testing.assert_allclose(sparse, dense, rtol=0, atol=1e-12)
    dense_l = laplacian_to_dense(lap)
    csr, shift = laplacian_to_scipy_csr(lap)
    n = dense_l.shape[0]
    np.testing.assert_allclose(
        csr.toarray() + shift * np.ones((n, n)), dense_l, rtol=0, atol=1e-12
    )


def test_bicgstab_residual_fn_plumbing():
    """bicgstab with an explicit residual_fn (the fused-kernel hook,
    solvers/base.py _make_adv_residual_fn) must reproduce the default
    path exactly."""
    import jax.numpy as jnp
    import numpy as np

    from diffpiso_tpu.solvers.krylov import bicgstab, tree_vdot

    rng = np.random.RandomState(11)
    n = 40
    A = np.eye(n) * 4.0 + 0.3 * rng.randn(n, n)
    A = (A + A.T) / 2  # symmetric, diagonally dominant
    b = jnp.asarray(rng.randn(n).astype(np.float32))
    Aj = jnp.asarray(A.astype(np.float32))

    apply_A = lambda v: Aj @ v

    def residual_fn(bb, x):
        r = bb - Aj @ x
        return r, jnp.max(jnp.abs(r))

    ref = bicgstab(apply_A, b, tol=1e-6, max_iter=200)
    got = bicgstab(apply_A, b, tol=1e-6, max_iter=200, residual_fn=residual_fn)
    assert not bool(ref.warn) and not bool(got.warn)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x), rtol=1e-6)
    assert int(got.iterations) == int(ref.iterations)
