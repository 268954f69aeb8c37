"""Per-shard Pallas solver kernels (parallel/shard_kernels.py) on the
8-device virtual CPU mesh, interpret mode: the multi-chip path that keeps
the whole-solve kernel speedups (VERDICT r3 item 1).

Covers (a) the kernel solvers against the single-device jnp solvers,
(b) the FULL piso_step traced under `sharded_solvers` — forward AND
gradient parity vs the unsharded step (the gradient goes through the IFT
custom_vjp adjoints, whose transpose/adjoint solves re-dispatch to the
same per-shard kernels), and (c) the eligibility gates (non-divisible
pressure planes fall back to the GSPMD jnp path inside the same trace).

Reference anchor: the fused solve loop these kernels distribute is
/root/reference/CUDAsrc/pressure_solve_op.cu.cc:291-356 (single-GPU);
the mesh/collective design is SURVEY.md par.5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpiso_tpu import StaggeredField
from diffpiso_tpu.core import piso_step
from diffpiso_tpu.ops import apply_laplacian, assemble_pressure_laplacian
from diffpiso_tpu.ops.stencil import (
    AdvectionStencil,
    apply_stencil,
    apply_stencil_transpose,
)
from diffpiso_tpu.parallel import shard_kernels as sk
from diffpiso_tpu.parallel.sharding import make_mesh, shard_piso_args
from diffpiso_tpu.solvers import bicgstab, pcg

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _force_interpret(monkeypatch):
    try:
        from jax.experimental import pallas as pl  # noqa: F401
    except Exception:  # pragma: no cover
        pytest.skip("pallas unavailable")
    monkeypatch.setattr(sk, "_INTERPRET", True)
    monkeypatch.setattr(sk, "_roll", lambda a, s, ax: jnp.roll(a, s, ax))


def _momentum_system(shapes, seed=11, coupling=0.15):
    """coupling 0.15 ~ the production CFL-bound dominance ratio: the
    per-shard trips converge, exercising the exit-by-convergence (exact
    reported norm) path. Larger ratios stall to the conservative
    max_trips exit (see test_sharded_momentum_stall_is_conservative)."""
    rng = np.random.RandomState(seed)
    comps = []
    for sh in shapes:
        center = jnp.asarray(-4.0 + 0.3 * rng.randn(*sh), jnp.float32)
        lo = [np.asarray(coupling * rng.randn(*sh), np.float32)
              for _ in range(2)]
        hi = [np.asarray(coupling * rng.randn(*sh), np.float32)
              for _ in range(2)]
        # non-periodic axes carry ZERO wrap couplings — the assembly
        # invariant that makes both the roll trick and the sharded
        # zero-padding exact
        for d in range(2):
            sl = [slice(None)] * 2
            sl[d] = 0
            lo[d][tuple(sl)] = 0.0
            sl[d] = -1
            hi[d][tuple(sl)] = 0.0
        comps.append(
            (center, tuple(jnp.asarray(l) for l in lo),
             tuple(jnp.asarray(h) for h in hi))
        )
    st = AdvectionStencil(
        center=tuple(c[0] for c in comps),
        lo=tuple(c[1] for c in comps),
        hi=tuple(c[2] for c in comps),
        diag_A=tuple(c[0] for c in comps),
    )
    b = StaggeredField(
        tuple(jnp.asarray(rng.randn(*sh), jnp.float32) for sh in shapes),
        periodic=(False, False),
    )
    return st, b


@pytest.mark.parametrize("transpose", [False, True])
def test_sharded_momentum_solve_matches_bicgstab(transpose, monkeypatch):
    _force_interpret(monkeypatch)
    mesh = make_mesh((2, 4), ("y", "x"))
    ctx = sk.ShardedSolveCtx(mesh, ("y", "x"))
    # staggered +1 faces: exercises the zero-padding path on both axes
    st, b = _momentum_system([(17, 32), (16, 33)])
    diag = StaggeredField(tuple(-c for c in st.center), periodic=b.periodic)

    apply_fn = apply_stencil_transpose if transpose else apply_stencil
    ref = bicgstab(
        lambda v: apply_fn(st, v, negate=True), b, None,
        tol=1e-6, max_iter=300, diag=diag,
    )
    assert not bool(ref.warn)

    st_cs = [(st.center[i], st.lo[i], st.hi[i]) for i in range(2)]
    x0 = tuple(jnp.zeros_like(c) for c in b.components)
    xs, n = jax.jit(
        lambda: sk.sharded_momentum_solve(
            ctx, st_cs, tuple(b.components), x0, -1.0, transpose, 1e-6
        )
    )()
    for a, r in zip(xs, ref.x.components):
        scale = float(jnp.max(jnp.abs(r))) or 1.0
        assert float(jnp.max(jnp.abs(a - r))) / scale < 1e-4
    # exit-by-convergence: the reported norm IS the exact residual of the
    # returned iterate (the converged trip ran zero sweeps)
    xf = StaggeredField(xs, periodic=b.periodic)
    rr = jax.tree_util.tree_map(
        lambda bb, aa: bb - aa, b, apply_fn(st, xf, negate=True)
    )
    rn = max(float(jnp.max(jnp.abs(c))) for c in rr.components)
    assert rn < 1e-4
    assert float(n) < 1e-6 and abs(float(n) - rn) < 1e-6


def test_sharded_momentum_stall_is_conservative(monkeypatch):
    """Weakly-dominant couplings at a tight tol exhaust max_trips; the
    reported norm must be >= the true residual so solvers/base.py routes
    the iterate to the BiCGSTAB fallback rather than skipping it."""
    _force_interpret(monkeypatch)
    mesh = make_mesh((2, 4), ("y", "x"))
    ctx = sk.ShardedSolveCtx(mesh, ("y", "x"))
    st, b = _momentum_system([(16, 32)], seed=5, coupling=0.4)
    x0 = (jnp.zeros_like(b.components[0]),)
    st_cs = [(st.center[0], st.lo[0], st.hi[0])]
    xs, n = jax.jit(
        lambda: sk.sharded_momentum_solve(
            ctx, st_cs, tuple(b.components), x0, -1.0, False, 1e-7
        )
    )()
    xf = StaggeredField(xs, periodic=b.periodic)
    rr = jax.tree_util.tree_map(
        lambda bb, aa: bb - aa, b, apply_stencil(st, xf, negate=True)
    )
    rn = max(float(jnp.max(jnp.abs(c))) for c in rr.components)
    assert float(n) >= rn * 0.99


def _pressure_system(ny=16, nx=32, seed=3):
    rng = np.random.RandomState(seed)
    infl = StaggeredField(
        (
            jnp.asarray(rng.rand(ny + 1, nx) + 0.5, jnp.float32),
            jnp.asarray(rng.rand(ny, nx + 1) + 0.5, jnp.float32),
        )
    )
    act = np.zeros((ny + 2, nx + 2), np.float32)
    act[1:-1, 1:-1] = 1
    lap = assemble_pressure_laplacian(
        infl, jnp.asarray(act), jnp.asarray(act), (False, False), True
    )
    rhs = rng.randn(ny, nx).astype(np.float32)
    rhs -= rhs.mean()
    return lap, jnp.asarray(rhs)


@pytest.mark.parametrize("warm", [False, True])
def test_sharded_pressure_pcg_matches_pcg(warm, monkeypatch):
    from diffpiso_tpu.solvers.fourier import MatmulSpectralSolver

    _force_interpret(monkeypatch)
    mesh = make_mesh((2, 4), ("y", "x"))
    ctx = sk.ShardedSolveCtx(mesh, ("y", "x"))
    lap, rhs = _pressure_system()
    mss = MatmulSpectralSolver(kinds=("dct2", "dct2"), shape=rhs.shape)
    weights = tuple(jnp.mean(jnp.abs(l)) for l in lap.lo)
    ref = pcg(
        lambda p: apply_laplacian(lap, p), rhs, None,
        precond=lambda r: mss.precondition(weights, r),
        tol=1e-6, max_iter=200, deflate_mean=True, precond_zero_mean=True,
    )
    assert not bool(ref.warn)

    x0 = ref.x if warm else None
    x, k, rn = jax.jit(
        lambda: sk.sharded_pressure_pcg(
            ctx, lap, rhs, x0, 1e-5, 200, True, mm_solver=mss,
            weights=weights,
        )
    )()
    res = apply_laplacian(lap, x) - rhs
    res = res - jnp.mean(res)
    assert float(jnp.max(jnp.abs(res))) < 1e-4
    if warm:
        # a converged guess re-measures near the tolerance floor: at most
        # one polish iteration (the preconditioner keeps its bite)
        assert int(k) <= 1


def test_sharded_pressure_pcg_early_exit(monkeypatch):
    from diffpiso_tpu.solvers.fourier import MatmulSpectralSolver

    _force_interpret(monkeypatch)
    mesh = make_mesh((2, 4), ("y", "x"))
    ctx = sk.ShardedSolveCtx(mesh, ("y", "x"))
    lap, rhs = _pressure_system()
    mss = MatmulSpectralSolver(kinds=("dct2", "dct2"), shape=rhs.shape)
    weights = tuple(jnp.mean(jnp.abs(l)) for l in lap.lo)
    x, k, rn = jax.jit(
        lambda: sk.sharded_pressure_pcg(
            ctx, lap, jnp.zeros_like(rhs), None, 1e-5, 200, True,
            mm_solver=mss, weights=weights,
        )
    )()
    assert int(k) == 0 and float(rn) == 0.0


# -- full-step dispatch through solvers/base.py ---------------------------------------


def _cavity(n, max_iters=(60, 200)):
    from diffpiso_tpu import Box, Domain, OPEN
    from diffpiso_tpu.core import SimulationParameters, lid_driven_cavity_masks
    from diffpiso_tpu.solvers import AdvectionSolver, PressureSolver

    dm, dv, active, accessible, no_slip = lid_driven_cavity_masks(n)
    domain = Domain(
        (n + 1, n), Box.from_size((1.0 + 1.0 / n, 1.0)), boundaries=OPEN
    )
    sim = SimulationParameters(
        dirichlet_mask=dm,
        dirichlet_values=dv,
        active_mask=active,
        accessible_mask=accessible,
        no_slip_mask=no_slip,
        viscosity=1e-3,
        laplace_rank_deficient=True,
        linear_solver=AdvectionSolver(max_iterations=max_iters[0]),
        pressure_solver=PressureSolver(
            max_iterations=max_iters[1],
            deflate_mean=True,
            preconditioner="dct_mm",
            adjoint_preconditioner="dct_mm",
        ),
    )
    return domain, sim


def test_full_step_sharded_solvers_forward_parity(monkeypatch):
    """piso_step traced inside sharded_solvers() on a (2,4) mesh matches
    the single-device step. The cavity pressure plane is (65,64): NOT
    divisible by the y-extent, so the pressure path exercises the
    divisibility fallback (GSPMD jnp PCG) while momentum runs the
    per-shard kernels — mixed dispatch inside one trace."""
    _force_interpret(monkeypatch)
    n = 64
    domain, sim = _cavity(n)
    rng = np.random.RandomState(0)
    vel = StaggeredField(
        tuple(
            jnp.asarray(0.05 * rng.randn(*domain.staggered_component_shape(i)),
                        jnp.float32)
            for i in range(2)
        )
    )
    p = domain.centered_grid(0.0)
    dt = 0.2 / n

    @jax.jit
    def step_ref(vel, p):
        out = piso_step(vel, p, dt, domain, sim,
                        advection_tol=1e-6, pressure_tol=1e-6)
        return out.velocity, out.pressure, out.warn

    vel_ref, p_ref, warn_ref = step_ref(vel, p)
    assert not bool(warn_ref)

    mesh = make_mesh((2, 4), ("y", "x"))

    @jax.jit
    def step_sharded(vel, p):
        with sk.sharded_solvers(mesh, ("y", "x")):
            out = piso_step(vel, p, dt, domain, sim,
                            advection_tol=1e-6, pressure_tol=1e-6)
            return out.velocity, out.pressure, out.warn

    vel_s, p_s = shard_piso_args(vel, p, mesh)
    vel_out, p_out, warn_s = step_sharded(vel_s, p_s)
    assert not bool(warn_s)
    for a, b in zip(vel_out.components, vel_ref.components):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p_out), np.asarray(p_ref),
                               rtol=1e-3, atol=1e-3)


def test_full_step_sharded_solvers_pressure_kernel_parity(monkeypatch):
    """A periodic domain (64x64 pressure plane, mesh-divisible) dispatches
    BOTH solves to the per-shard kernels; rollout forward parity vs the
    unsharded step."""
    from diffpiso_tpu.core.setups import decaying_turbulence_setup

    _force_interpret(monkeypatch)
    domain, sim = decaying_turbulence_setup(
        (64, 64), viscosity=0.01, max_iterations=(50, 300)
    )
    # the periodic setup's preconditioner must be in the sharded family
    assert sim.pressure_solver.preconditioner in (
        None, "dct_mm", "fft_mm", "channel_mm",
    )
    rng = np.random.RandomState(1)
    vel = StaggeredField(
        (
            jnp.asarray(0.3 * rng.randn(64, 64), jnp.float32),
            jnp.asarray(0.3 * rng.randn(64, 64), jnp.float32),
        ),
        periodic=(True, True),
    )
    p = domain.centered_grid(0.0)

    @jax.jit
    def roll_ref(vel, p):
        def body(carry, _):
            vel, p = carry
            out = piso_step(vel, p, 0.05, domain, sim,
                            advection_tol=1e-6, pressure_tol=1e-6)
            return (out.velocity, out.pressure), out.warn

        (vel, p), warns = jax.lax.scan(body, (vel, p), None, length=2)
        return vel, p, warns

    vel_ref, p_ref, warns_ref = roll_ref(vel, p)
    assert not bool(jnp.any(warns_ref))

    mesh = make_mesh((2, 4), ("y", "x"))

    @jax.jit
    def roll_sharded(vel, p):
        with sk.sharded_solvers(mesh, ("y", "x")):
            def body(carry, _):
                vel, p = carry
                out = piso_step(vel, p, 0.05, domain, sim,
                                advection_tol=1e-6, pressure_tol=1e-6)
                return (out.velocity, out.pressure), out.warn

            (vel, p), warns = jax.lax.scan(body, (vel, p), None, length=2)
            return vel, p, warns

    vel_s, p_s = shard_piso_args(vel, p, mesh)
    vel_out, p_out, warns_s = roll_sharded(vel_s, p_s)
    assert not bool(jnp.any(warns_s))
    for a, b in zip(vel_out.components, vel_ref.components):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_full_step_sharded_solvers_gradient_parity(monkeypatch):
    """Gradient of a 2-step rollout loss traced under sharded_solvers
    matches the unsharded gradient: the IFT adjoints (transpose momentum
    solve, adjoint pressure solve) re-dispatch to the per-shard kernels
    inside the same trace."""
    from diffpiso_tpu.core.setups import decaying_turbulence_setup

    _force_interpret(monkeypatch)
    domain, sim = decaying_turbulence_setup(
        (64, 64), viscosity=0.01, max_iterations=(50, 300)
    )
    rng = np.random.RandomState(2)
    vel = StaggeredField(
        (
            jnp.asarray(0.3 * rng.randn(64, 64), jnp.float32),
            jnp.asarray(0.3 * rng.randn(64, 64), jnp.float32),
        ),
        periodic=(True, True),
    )
    p = domain.centered_grid(0.0)

    def loss_of(vel, p):
        def body(carry, _):
            vel, p = carry
            out = piso_step(vel, p, 0.05, domain, sim,
                            advection_tol=1e-7, pressure_tol=1e-8)
            return (out.velocity, out.pressure), None

        (vel, p), _ = jax.lax.scan(body, (vel, p), None, length=2)
        return sum(jnp.sum(c ** 2) for c in vel.components)

    @jax.jit
    def grad_ref(vel, p):
        return jax.grad(lambda v: loss_of(v, p))(vel)

    g_ref = grad_ref(vel, p)

    mesh = make_mesh((2, 4), ("y", "x"))

    @jax.jit
    def grad_sharded(vel, p):
        with sk.sharded_solvers(mesh, ("y", "x")):
            return jax.grad(lambda v: loss_of(v, p))(vel)

    vel_s, p_s = shard_piso_args(vel, p, mesh)
    g_s = grad_sharded(vel_s, p_s)
    for a, b in zip(g_s.components, g_ref.components):
        scale = float(jnp.max(jnp.abs(b))) or 1.0
        assert float(jnp.max(jnp.abs(a - b))) / scale < 5e-3


def test_eligibility_gates():
    mesh = make_mesh((2, 4), ("y", "x"))
    ctx = sk.ShardedSolveCtx(mesh, ("y", "x"))
    # pressure: divisibility + preconditioner family + rank
    ok = dict(shape=(64, 64), dtype=jnp.float32, precond_kind="dct_mm")
    if sk.kernels_available():  # pragma: no cover - TPU-only branch
        assert sk.pressure_eligible(ctx, **ok)
    assert not sk.pressure_eligible(ctx, (65, 64), jnp.float32, "dct_mm")
    assert not sk.pressure_eligible(ctx, (64, 64), jnp.float64, "dct_mm")
    assert not sk.pressure_eligible(ctx, (64, 64), jnp.float32, "mg")
    # momentum: rank-2 f32 within the padded 20-plane ceiling
    assert not sk.momentum_eligible(ctx, ((16, 16, 16),), jnp.float32)
    assert not sk.momentum_eligible(ctx, ((65, 64),), jnp.float64)


def test_adjoint_solves_default_to_gspmd(monkeypatch):
    """ADJOINT solves keep the GSPMD path by default (measured loss,
    runs/ab_shard_attr.log: grad30 -11%/-25% per family);
    DIFFPISO_SHARDED_KERNELS_ADJ=auto re-enables."""
    _force_interpret(monkeypatch)
    mesh = make_mesh((2, 4), ("y", "x"))
    ctx = sk.ShardedSolveCtx(mesh, ("y", "x"))
    shapes = ((64, 64),)
    assert sk.momentum_eligible(ctx, shapes, jnp.float32, transpose=False)
    assert not sk.momentum_eligible(ctx, shapes, jnp.float32, transpose=True)
    assert sk.pressure_eligible(ctx, (64, 64), jnp.float32, "dct_mm",
                                adjoint=False)
    assert not sk.pressure_eligible(ctx, (64, 64), jnp.float32, "dct_mm",
                                    adjoint=True)
    monkeypatch.setenv("DIFFPISO_SHARDED_KERNELS_ADJ", "auto")
    assert sk.momentum_eligible(ctx, shapes, jnp.float32, transpose=True)
    assert sk.pressure_eligible(ctx, (64, 64), jnp.float32, "dct_mm",
                                adjoint=True)


def test_sharded_solvers_context_nests_no_pallas(monkeypatch):
    """The context must force the REST of the trace onto the GSPMD
    roll/reduction formulation (assembly/FV/correctors) — the no_pallas
    depth is raised inside."""
    from diffpiso_tpu.ops import pallas_stencil

    mesh = make_mesh((2, 4), ("y", "x"))
    assert sk.current() is None
    depth0 = pallas_stencil._DISABLED_DEPTH
    with sk.sharded_solvers(mesh, ("y", "x")) as ctx:
        assert sk.current() is ctx
        assert pallas_stencil._DISABLED_DEPTH == depth0 + 1
    assert sk.current() is None
    assert pallas_stencil._DISABLED_DEPTH == depth0


# -- r5 whole-solve block-Jacobi pressure tier -----------------------------------------


def _periodic_pressure_system(ny=16, nx=32, seed=7):
    """All-periodic uniform-inflow Laplacian — the turbulence workload's
    pressure system (fourier eigenbasis family, rank-one shift)."""
    rng = np.random.RandomState(seed)
    infl = StaggeredField(
        (
            jnp.ones((ny, nx), jnp.float32),
            jnp.ones((ny, nx), jnp.float32),
        ),
        periodic=(True, True),
    )
    act = np.ones((ny + 2, nx + 2), np.float32)
    lap = assemble_pressure_laplacian(
        infl, jnp.asarray(act), jnp.asarray(act), (True, True), True
    )
    rhs = rng.randn(ny, nx).astype(np.float32)
    rhs -= rhs.mean()
    return lap, jnp.asarray(rhs)


def _count_whole_launches(monkeypatch):
    calls = []
    orig = sk._pressure_whole_launch

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(sk, "_pressure_whole_launch", spy)
    return calls


@pytest.mark.parametrize("kinds", [("dct2", "dct2"), ("fourier", "fourier")])
def test_pressure_whole_tier_parity(kinds, monkeypatch):
    """The block-Jacobi whole-solve tier (one local pcg2-style launch per
    round) converges to the same solution as the single-device PCG, for
    both the bounded (dct2) and periodic (fourier) eigenbasis families,
    and actually ENGAGES (the launch is traced)."""
    from diffpiso_tpu.solvers.fourier import MatmulSpectralSolver

    _force_interpret(monkeypatch)
    # cut-axis engagement needs `always` since the r5 measured-negative
    # default (see _whole_tier_ok): correctness still holds and is pinned
    monkeypatch.setenv("DIFFPISO_SHARD_PCG2", "always")
    calls = _count_whole_launches(monkeypatch)
    mesh = make_mesh((2, 4), ("y", "x"))
    ctx = sk.ShardedSolveCtx(mesh, ("y", "x"))
    if kinds[0] == "fourier":
        lap, rhs = _periodic_pressure_system()
    else:
        lap, rhs = _pressure_system()
    mss = MatmulSpectralSolver(kinds=kinds, shape=rhs.shape)
    weights = tuple(jnp.mean(jnp.abs(l)) for l in lap.lo)
    x, k, rn = jax.jit(
        lambda: sk.sharded_pressure_pcg(
            ctx, lap, rhs, None, 1e-5, 200, True, mm_solver=mss,
            weights=weights,
        )
    )()
    assert calls, "whole-solve tier did not engage"
    res = apply_laplacian(lap, x) - rhs
    res = res - jnp.mean(res)
    assert float(jnp.max(jnp.abs(res))) < 1e-4
    assert float(rn) < 1e-5


def test_pressure_whole_tier_warm_is_measure_only(monkeypatch):
    """A converged warm start must exit on the FIRST trip's entry measure
    with zero local CG iterations (the analytic deflation constant makes
    the trip-1 measure exactly the projected residual norm)."""
    from diffpiso_tpu.solvers.fourier import MatmulSpectralSolver

    _force_interpret(monkeypatch)
    mesh = make_mesh((2, 4), ("y", "x"))
    ctx = sk.ShardedSolveCtx(mesh, ("y", "x"))
    lap, rhs = _pressure_system()
    mss = MatmulSpectralSolver(kinds=("dct2", "dct2"), shape=rhs.shape)
    weights = tuple(jnp.mean(jnp.abs(l)) for l in lap.lo)
    ref = pcg(
        lambda p: apply_laplacian(lap, p), rhs, None,
        precond=lambda r: mss.precondition(weights, r),
        tol=1e-7, max_iter=200, deflate_mean=True, precond_zero_mean=True,
    )
    assert not bool(ref.warn)
    x, k, rn = jax.jit(
        lambda: sk.sharded_pressure_pcg(
            ctx, lap, rhs, ref.x, 1e-5, 200, True, mm_solver=mss,
            weights=weights,
        )
    )()
    assert int(k) == 0
    assert float(rn) < 1e-5
    assert float(jnp.max(jnp.abs(x - ref.x))) == 0.0


def test_pressure_whole_tier_force_slivers_1x1(monkeypatch):
    """DIFFPISO_SHARD_FORCE_SLIVERS=1 on a (1,1)-extent mesh runs the REAL
    multi-device program structure (frozen self-slivers = the true wrap
    rows): parity must hold — the cut drops only the wrap couplings, which
    converge through the outer trips."""
    from diffpiso_tpu.solvers.fourier import MatmulSpectralSolver

    _force_interpret(monkeypatch)
    monkeypatch.setenv("DIFFPISO_SHARD_FORCE_SLIVERS", "1")
    monkeypatch.setenv("DIFFPISO_SHARD_PCG2", "always")
    mesh = make_mesh((1, 1), ("y", "x"))
    ctx = sk.ShardedSolveCtx(mesh, ("y", "x"))
    lap, rhs = _periodic_pressure_system()
    mss = MatmulSpectralSolver(kinds=("fourier", "fourier"),
                               shape=rhs.shape)
    weights = tuple(jnp.mean(jnp.abs(l)) for l in lap.lo)
    x, k, rn = jax.jit(
        lambda: sk.sharded_pressure_pcg(
            ctx, lap, rhs, None, 1e-5, 200, True, mm_solver=mss,
            weights=weights,
        )
    )()
    res = apply_laplacian(lap, x) - rhs
    res = res - jnp.mean(res)
    assert float(jnp.max(jnp.abs(res))) < 1e-4


def test_pressure_whole_tier_gate(monkeypatch):
    """Default (auto) must NOT engage the whole-solve tier on cut axes
    (the r5 measured-negative: frozen-cut block-Jacobi septupled pressure
    iterations at tight tol, runs/ab_shard_kernels_r5.log) — the r4
    per-iteration phase PCG keeps the solve; parity still holds."""
    from diffpiso_tpu.solvers.fourier import MatmulSpectralSolver

    _force_interpret(monkeypatch)
    calls = _count_whole_launches(monkeypatch)
    mesh = make_mesh((2, 4), ("y", "x"))
    ctx = sk.ShardedSolveCtx(mesh, ("y", "x"))
    lap, rhs = _pressure_system()
    mss = MatmulSpectralSolver(kinds=("dct2", "dct2"), shape=rhs.shape)
    weights = tuple(jnp.mean(jnp.abs(l)) for l in lap.lo)
    x, k, rn = jax.jit(
        lambda: sk.sharded_pressure_pcg(
            ctx, lap, rhs, None, 1e-5, 200, True, mm_solver=mss,
            weights=weights,
        )
    )()
    assert not calls
    res = apply_laplacian(lap, x) - rhs
    res = res - jnp.mean(res)
    assert float(jnp.max(jnp.abs(res))) < 1e-4


def test_local_basis_blocks_diagonalize_cut_operator():
    """_local_basis(cut=True) must return exact eigendecompositions of the
    1-D operator's diagonal blocks with all cross-shard couplings (incl.
    the periodic wrap) dropped."""
    from diffpiso_tpu.solvers.fourier import _BASIS, _eigs

    for kind in ("fourier", "dct2", "dct4"):
        n, e = 16, 4
        Vg = _BASIS[kind](n)
        wg = _eigs(n, kind)
        T = Vg.T @ (wg[:, None] * Vg)
        i = np.arange(n)
        T = np.where(np.abs(i[:, None] - i[None, :]) <= 1, T, 0.0)
        Vs, ws = sk._local_basis(kind, n, e, cut=True)
        m = n // e
        for s in range(e):
            blk = T[s * m:(s + 1) * m, s * m:(s + 1) * m]
            rec = Vs[s].T @ (ws[s][:, None] * Vs[s])
            np.testing.assert_allclose(rec, blk, atol=1e-10)
            # orthonormal rows
            np.testing.assert_allclose(
                Vs[s] @ Vs[s].T, np.eye(m), atol=1e-10
            )
            # cut blocks are strictly negative definite except the
            # all-Neumann edge block of dct2 (its corner keeps the global
            # boundary), whose top eigenvalue still exceeds the singular
            # threshold only at the global scale
            assert ws[s].max() < 1e-9


def test_trivial_mesh_fast_path(monkeypatch):
    """sharded_solvers on an all-extent-1 mesh is a no-op: the trace keeps
    ALL kernels (the plain single-chip program is the correct program for
    one device — measured 2x the sharded structure,
    runs/ab_shard_kernels_r5.log). DIFFPISO_SHARD_FORCE_SLIVERS=1
    suppresses the fast path for structural A/Bs."""
    from diffpiso_tpu.ops import pallas_stencil

    mesh = make_mesh((1, 1), ("y", "x"))
    depth0 = pallas_stencil._DISABLED_DEPTH
    with sk.sharded_solvers(mesh, ("y", "x")) as ctx:
        assert ctx is None
        assert sk.current() is None
        assert pallas_stencil._DISABLED_DEPTH == depth0
    monkeypatch.setenv("DIFFPISO_SHARD_FORCE_SLIVERS", "1")
    with sk.sharded_solvers(mesh, ("y", "x")) as ctx:
        assert ctx is not None
        assert sk.current() is ctx
        assert pallas_stencil._DISABLED_DEPTH == depth0 + 1
    assert sk.current() is None
