"""Fused Pallas Krylov kernels vs the jnp solver path, end-to-end through
cg / solve_pressure_system, in interpret mode on CPU (the compiled path is
the TPU default at <= 512^2 and is exercised by the benchmarks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpiso_tpu import StaggeredField
from diffpiso_tpu.ops import apply_laplacian, assemble_pressure_laplacian
from diffpiso_tpu.solvers import PressureSolver, cg, solve_pressure_system
from diffpiso_tpu.solvers import pallas_krylov


def _system(res=(16, 32), rank_deficient=True, seed=0):
    ny, nx = res
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
        infl, jnp.asarray(act), jnp.asarray(act), (False, False), rank_deficient
    )
    rhs = rng.randn(ny, nx).astype(np.float32)
    rhs -= rhs.mean()
    return lap, jnp.asarray(rhs)


def _force_fused(monkeypatch):
    try:
        from jax.experimental import pallas as pl  # noqa: F401
    except Exception:
        pytest.skip("pallas unavailable")
    monkeypatch.setattr(pallas_krylov, "_INTERPRET", True)
    monkeypatch.setattr(pallas_krylov, "_roll", lambda a, s, ax: jnp.roll(a, s, ax))
    monkeypatch.setattr(pallas_krylov, "eligible", lambda *a, **k: True)


@pytest.mark.parametrize("deflate", [False, True])
def test_fused_cg_solve_matches_jnp(deflate, monkeypatch):
    lap, rhs = _system(rank_deficient=deflate)

    ref = cg(
        lambda p: apply_laplacian(lap, p), rhs, None,
        tol=1e-6, max_iter=400, residual_reset=50, deflate_mean=deflate,
        stencil=None,  # jnp path
    )
    assert not bool(ref.warn)

    _force_fused(monkeypatch)
    fused = cg(
        lambda p: apply_laplacian(lap, p), rhs, None,
        tol=1e-6, max_iter=400, residual_reset=50, deflate_mean=deflate,
        stencil=lap,
    )
    assert not bool(fused.warn)
    # same system, same tolerance: solutions agree to solver accuracy
    a = np.asarray(fused.x) - np.asarray(fused.x).mean()
    b = np.asarray(ref.x) - np.asarray(ref.x).mean()
    np.testing.assert_allclose(a, b, atol=5e-5)
    # and the fused solve really converged on the operator
    res = np.asarray(apply_laplacian(lap, fused.x) - rhs)
    assert np.abs(res - (res.mean() if deflate else 0.0)).max() < 5e-5


def test_fused_pcg_through_pressure_solver(monkeypatch):
    """solve_pressure_system with the DCT preconditioner: fused pcg halves
    (apply/update kernels around the spectral solve) vs the jnp path."""
    lap, rhs = _system(rank_deficient=True)
    cfg = PressureSolver(
        max_iterations=200, deflate_mean=True,
        preconditioner="dct", adjoint_preconditioner="dct",
    )
    x_ref, it_ref, warn_ref = solve_pressure_system(cfg, lap, rhs, None, 1e-7)
    assert not bool(warn_ref)

    _force_fused(monkeypatch)
    x_fused, it_fused, warn_fused = solve_pressure_system(cfg, lap, rhs, None, 1e-7)
    assert not bool(warn_fused)
    a = np.asarray(x_fused) - np.asarray(x_fused).mean()
    b = np.asarray(x_ref) - np.asarray(x_ref).mean()
    np.testing.assert_allclose(a, b, atol=5e-5)
    # warm start with the previous solution converges (near-)immediately
    _, it2, w2 = solve_pressure_system(cfg, lap, rhs, x_fused, 1e-6)
    assert not bool(w2) and int(it2) <= 2


def test_fused_bicgstab_matches_generic(monkeypatch):
    """The 3-launch-per-component fused BiCGSTAB phases must solve the same
    joint 2-component advection system to the same answer as the generic
    pytree loop (interpret mode; jnp.roll stands in for pltpu.roll)."""
    try:
        from jax.experimental import pallas as pl  # noqa: F401
    except Exception:
        pytest.skip("pallas unavailable")
    from diffpiso_tpu import StaggeredField
    from diffpiso_tpu.ops.stencil import (
        AdvectionStencil,
        apply_stencil,
    )
    from diffpiso_tpu.solvers import krylov

    monkeypatch.setattr(pallas_krylov, "_INTERPRET", True)
    monkeypatch.setattr(pallas_krylov, "_roll",
                        lambda a, s, ax: jnp.roll(a, s, ax))
    # isolate the BiCGSTAB phase kernels from the Jacobi accelerator
    monkeypatch.setenv("DIFFPISO_ADV_JACOBI", "never")
    rng = np.random.RandomState(11)
    n = 24

    def planes(scale):
        return jnp.asarray(scale * rng.randn(n, n), jnp.float32)

    # diagonally dominant joint system (the momentum-solve structure)
    comps = []
    for _ in range(2):
        center = jnp.asarray(-8.0 + 0.5 * rng.randn(n, n), jnp.float32)
        lo = (planes(0.4), planes(0.4))
        hi = (planes(0.4), planes(0.4))
        comps.append((center, lo, hi))
    st = AdvectionStencil(
        center=(comps[0][0], comps[1][0]),
        lo=(comps[0][1], comps[1][1]),
        hi=(comps[0][2], comps[1][2]),
        diag_A=(comps[0][0], comps[1][0]),
    )
    b = StaggeredField(
        (planes(1.0), planes(1.0)), periodic=(True, True)
    )
    diag = StaggeredField(
        tuple(-c for c in st.center), periodic=(True, True)
    )  # diag of -M

    apply_A = lambda v: apply_stencil(st, v, negate=True)

    ref = krylov.bicgstab(apply_A, b, tol=1e-6, max_iter=300, diag=diag)
    assert not bool(ref.warn)

    # force the fused path on CPU
    monkeypatch.setattr(pallas_krylov, "eligible", lambda shape, dtype: True)
    out = krylov.bicgstab(
        apply_A, b, tol=1e-6, max_iter=300, diag=diag,
        stencil=st, negate=True, transpose=False,
    )
    assert not bool(out.warn)
    for a, r in zip(out.x.components, ref.x.components):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=1e-4,
                                   atol=1e-5)
    # same algorithm -> comparable iteration counts
    assert abs(int(out.iterations) - int(ref.iterations)) <= 2

    # transpose variant solves the transposed system
    from diffpiso_tpu.ops.stencil import apply_stencil_transpose

    apply_T = lambda v: apply_stencil_transpose(st, v, negate=True)
    refT = krylov.bicgstab(apply_T, b, tol=1e-6, max_iter=300, diag=diag)
    outT = krylov.bicgstab(
        apply_T, b, tol=1e-6, max_iter=300, diag=diag,
        stencil=st, negate=True, transpose=True,
    )
    assert not bool(outT.warn)
    for a, r in zip(outT.x.components, refT.x.components):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=1e-4,
                                   atol=1e-5)


def _adv_system(n, center_mag, seed=11):
    from diffpiso_tpu.ops.stencil import AdvectionStencil

    rng = np.random.RandomState(seed)

    def planes(scale):
        return jnp.asarray(scale * rng.randn(n, n), jnp.float32)

    comps = []
    for _ in range(2):
        center = jnp.asarray(
            -center_mag + 0.3 * rng.randn(n, n), jnp.float32
        )
        comps.append((center, (planes(0.4), planes(0.4)),
                      (planes(0.4), planes(0.4))))
    st = AdvectionStencil(
        center=(comps[0][0], comps[1][0]),
        lo=(comps[0][1], comps[1][1]),
        hi=(comps[0][2], comps[1][2]),
        diag_A=(comps[0][0], comps[1][0]),
    )
    b = StaggeredField((planes(1.0), planes(1.0)), periodic=(True, True))
    diag = StaggeredField(tuple(-c for c in st.center), periodic=(True, True))
    return st, b, diag


@pytest.mark.parametrize("jac2,jac1", [
    ("auto", "auto"),    # joint whole-solve kernel (fused_jacobi2_solve)
    ("never", "auto"),   # per-component whole-solve tier (fused_jacobi1_solve)
    ("never", "never"),  # per-launch sweep loop (fused_jacobi_sweeps)
])
@pytest.mark.parametrize("transpose", [False, True])
def test_jacobi_accelerator_matches_generic(transpose, jac2, jac1,
                                            monkeypatch):
    """The fused Jacobi-sweep accelerator must reach the same solution as
    the generic BiCGSTAB on a diagonally dominant system — and must
    short-circuit the Krylov loop entirely (iterations == 0) — through all
    three dispatch tiers (joint whole-solve, per-component whole-solve,
    per-launch sweep loop)."""
    from diffpiso_tpu.ops.stencil import apply_stencil, apply_stencil_transpose
    from diffpiso_tpu.solvers import krylov

    monkeypatch.setattr(pallas_krylov, "_INTERPRET", True)
    monkeypatch.setattr(pallas_krylov, "_roll",
                        lambda a, s, ax: jnp.roll(a, s, ax))
    monkeypatch.setenv("DIFFPISO_ADV_JACOBI", "all")  # auto = adjoint-only
    monkeypatch.setenv("DIFFPISO_FUSED_JAC2", jac2)
    monkeypatch.setenv("DIFFPISO_FUSED_JAC1", jac1)
    st, b, diag = _adv_system(24, center_mag=10.0)
    ap = apply_stencil_transpose if transpose else apply_stencil
    apply_A = lambda v: ap(st, v, negate=True)

    ref = krylov.bicgstab(apply_A, b, tol=1e-6, max_iter=300, diag=diag)
    assert not bool(ref.warn)

    monkeypatch.setattr(pallas_krylov, "eligible", lambda shape, dtype: True)
    out = krylov.bicgstab(
        apply_A, b, tol=1e-6, max_iter=300, diag=diag,
        stencil=st, negate=True, transpose=transpose,
    )
    assert not bool(out.warn)
    assert int(out.iterations) == 0  # Jacobi converged; Krylov never ran
    assert float(out.residual_norm) < 1e-6
    for a, r in zip(out.x.components, ref.x.components):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=1e-4,
                                   atol=1e-5)


@pytest.mark.parametrize("jac2,jac1", [
    ("auto", "auto"), ("never", "auto"), ("never", "never"),
])
def test_jacobi_accelerator_falls_back_when_not_dominant(jac2, jac1,
                                                         monkeypatch):
    """On a NON-dominant system the sweeps miss tol and BiCGSTAB must take
    over from wherever they stopped — same answer, no warn."""
    from diffpiso_tpu.ops.stencil import apply_stencil
    from diffpiso_tpu.solvers import krylov

    monkeypatch.setattr(pallas_krylov, "_INTERPRET", True)
    monkeypatch.setattr(pallas_krylov, "_roll",
                        lambda a, s, ax: jnp.roll(a, s, ax))
    monkeypatch.setenv("DIFFPISO_ADV_JACOBI", "all")  # auto = adjoint-only
    monkeypatch.setenv("DIFFPISO_FUSED_JAC2", jac2)
    monkeypatch.setenv("DIFFPISO_FUSED_JAC1", jac1)
    # |center| ~ 1.6 vs off-diagonal mass ~ 4*0.4: Jacobi diverges/stalls
    st, b, diag = _adv_system(16, center_mag=1.6, seed=3)
    apply_A = lambda v: apply_stencil(st, v, negate=True)

    ref = krylov.bicgstab(apply_A, b, tol=1e-6, max_iter=400, diag=diag)
    assert not bool(ref.warn)

    monkeypatch.setattr(pallas_krylov, "eligible", lambda shape, dtype: True)
    out = krylov.bicgstab(
        apply_A, b, tol=1e-6, max_iter=400, diag=diag,
        stencil=st, negate=True, transpose=False,
    )
    assert not bool(out.warn)
    assert int(out.iterations) > 0  # the Krylov loop actually ran
    assert float(out.residual_norm) < 1e-4
    for a, r in zip(out.x.components, ref.x.components):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=5e-3,
                                   atol=5e-4)


@pytest.mark.parametrize("transpose", [False, True])
def test_jacobi2_whole_solve_mixed_shapes(transpose, monkeypatch):
    """Direct kernel test on a STAGGERED-like system whose two components
    have different plane shapes (the bounded-domain case): the whole-solve
    launch must match running the per-component sweep kernels to the same
    sweep budget, and its reported norm must be the true residual."""
    from diffpiso_tpu.ops.stencil import AdvectionStencil

    monkeypatch.setattr(pallas_krylov, "_INTERPRET", True)
    monkeypatch.setattr(pallas_krylov, "_roll",
                        lambda a, s, ax: jnp.roll(a, s, ax))
    rng = np.random.RandomState(5)
    shapes = [(24, 32), (25, 32)]

    def mk(shape, scale):
        return jnp.asarray(scale * rng.randn(*shape), jnp.float32)

    comps = []
    for shp in shapes:
        comps.append((
            jnp.asarray(-9.0 + 0.3 * rng.randn(*shp), jnp.float32),
            (mk(shp, 0.4), mk(shp, 0.4)),
            (mk(shp, 0.4), mk(shp, 0.4)),
        ))
    st_cs = [(c[0], c[1], c[2]) for c in comps]
    b_c = tuple(mk(shp, 1.0) for shp in shapes)
    x_c = tuple(jnp.zeros(shp, jnp.float32) for shp in shapes)

    xo0, xo1, n = pallas_krylov.fused_jacobi2_solve(
        st_cs, b_c, x_c, -1.0, transpose, 1e-6, 33)
    assert float(n) < 1e-6

    # reference: per-component sweep kernels run to convergence
    for ci, (xo, shp) in enumerate(((xo0, shapes[0]), (xo1, shapes[1]))):
        xr = jnp.zeros(shp, jnp.float32)
        for _ in range(9):
            xr, nr = pallas_krylov.fused_jacobi_sweeps(
                st_cs[ci], b_c[ci], xr, 4, -1.0, transpose)
        assert float(nr) < 1e-6
        np.testing.assert_allclose(np.asarray(xo), np.asarray(xr),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("jac13d", ["auto", "never"])
@pytest.mark.parametrize("transpose", [False, True])
def test_jacobi_accelerator_3d(transpose, jac13d, monkeypatch):
    """3-D: both momentum tiers — the single-program WHOLE-SOLVE kernel
    (jac13d=auto: fused_jacobi1_solve_3d) and the z-plane-gridded sweep
    launches (never) — must solve the dominant 7-point system to the
    generic loop's answer and short-circuit the Krylov loop."""
    from diffpiso_tpu.ops.stencil import AdvectionStencil, apply_stencil, apply_stencil_transpose
    from diffpiso_tpu.solvers import krylov

    monkeypatch.setattr(pallas_krylov, "_INTERPRET", True)
    monkeypatch.setattr(pallas_krylov, "_roll",
                        lambda a, s, ax: jnp.roll(a, s, ax))
    monkeypatch.setenv("DIFFPISO_ADV_JACOBI", "all")
    monkeypatch.setenv("DIFFPISO_FUSED_JAC13D", jac13d)
    rng = np.random.RandomState(7)
    shape = (6, 12, 16)

    def planes(scale):
        return jnp.asarray(scale * rng.randn(*shape), jnp.float32)

    comps = []
    for _ in range(3):
        center = jnp.asarray(-12.0 + 0.3 * rng.randn(*shape), jnp.float32)
        comps.append((
            center,
            (planes(0.4), planes(0.4), planes(0.4)),
            (planes(0.4), planes(0.4), planes(0.4)),
        ))
    st = AdvectionStencil(
        center=tuple(c[0] for c in comps),
        lo=tuple(c[1] for c in comps),
        hi=tuple(c[2] for c in comps),
        diag_A=tuple(c[0] for c in comps),
    )
    b = StaggeredField(
        tuple(planes(1.0) for _ in range(3)), periodic=(True, True, True)
    )
    diag = StaggeredField(
        tuple(-c for c in st.center), periodic=(True, True, True)
    )
    ap = apply_stencil_transpose if transpose else apply_stencil
    apply_A = lambda v: ap(st, v, negate=True)

    ref = krylov.bicgstab(apply_A, b, tol=1e-6, max_iter=300, diag=diag)
    assert not bool(ref.warn)

    monkeypatch.setattr(pallas_krylov, "eligible_3d",
                        lambda shape, dtype: True)
    out = krylov.bicgstab(
        apply_A, b, tol=1e-6, max_iter=300, diag=diag,
        stencil=st, negate=True, transpose=transpose,
    )
    assert not bool(out.warn)
    assert int(out.iterations) == 0  # sweeps converged, Krylov never ran
    for a, r in zip(out.x.components, ref.x.components):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=1e-4,
                                   atol=1e-5)


@pytest.mark.parametrize("transpose", [False, True])
def test_jacobi_accelerator_3d_zblock(transpose, monkeypatch):
    """The 256^3-class z-BLOCK tier (fused_jacobi_zblock_3d: k full 3-D
    sweeps per launch, z-coupling live within blocks, frozen at block
    edges) must solve the dominant 7-point system to the generic loop's
    answer through the same bicgstab accelerator dispatch."""
    from diffpiso_tpu.ops.stencil import (
        AdvectionStencil,
        apply_stencil,
        apply_stencil_transpose,
    )
    from diffpiso_tpu.solvers import krylov

    monkeypatch.setattr(pallas_krylov, "_INTERPRET", True)
    monkeypatch.setattr(pallas_krylov, "_roll",
                        lambda a, s, ax: jnp.roll(a, s, ax))
    monkeypatch.setenv("DIFFPISO_ADV_JACOBI", "all")
    monkeypatch.setenv("DIFFPISO_FUSED_JAC13D", "never")
    # force the z-block tier with bz=3 (2 programs over nz=6)
    monkeypatch.setattr(pallas_krylov, "zblock_eligible",
                        lambda shape, dtype: 3)
    rng = np.random.RandomState(8)
    shape = (6, 12, 16)

    def planes(scale):
        return jnp.asarray(scale * rng.randn(*shape), jnp.float32)

    comps = []
    for _ in range(3):
        center = jnp.asarray(-12.0 + 0.3 * rng.randn(*shape), jnp.float32)
        comps.append((
            center,
            (planes(0.4), planes(0.4), planes(0.4)),
            (planes(0.4), planes(0.4), planes(0.4)),
        ))
    st = AdvectionStencil(
        center=tuple(c[0] for c in comps),
        lo=tuple(c[1] for c in comps),
        hi=tuple(c[2] for c in comps),
        diag_A=tuple(c[0] for c in comps),
    )
    b = StaggeredField(
        tuple(planes(1.0) for _ in range(3)), periodic=(True, True, True)
    )
    diag = StaggeredField(
        tuple(-c for c in st.center), periodic=(True, True, True)
    )
    ap = apply_stencil_transpose if transpose else apply_stencil
    apply_A = lambda v: ap(st, v, negate=True)

    ref = krylov.bicgstab(apply_A, b, tol=1e-6, max_iter=300, diag=diag)
    assert not bool(ref.warn)

    out = krylov.bicgstab(
        apply_A, b, tol=1e-6, max_iter=300, diag=diag,
        stencil=st, negate=True, transpose=transpose,
    )
    assert not bool(out.warn)
    assert int(out.iterations) == 0  # block sweeps converged, Krylov idle
    for a, r in zip(out.x.components, ref.x.components):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=1e-4,
                                   atol=1e-5)
    # exit-by-convergence reports the exact entry residual of the
    # returned iterate (zero sweeps in the converged launch)
    rr = jax.tree_util.tree_map(lambda bb, aa: bb - aa, b, apply_A(out.x))
    rn = max(float(jnp.max(jnp.abs(c))) for c in rr.components)
    assert float(out.residual_norm) < 1e-6
    assert abs(float(out.residual_norm) - rn) < 1e-6


@pytest.mark.parametrize(
    "kinds", [("dct2", "dct2"), ("fourier", "fourier"), ("dct2", "dct4")]
)
def test_fused_spectral_apply_matches_xla(kinds, monkeypatch):
    """One-launch MatmulSpectralSolver apply == the tensordot chain, for
    every basis family used by the dct_mm/fft_mm/channel_mm kernels,
    including the singular-mode zeroing."""
    from diffpiso_tpu.solvers import fourier as fo

    _force_fused(monkeypatch)
    shape = (16, 24)
    solver = fo.MatmulSpectralSolver(kinds=kinds, shape=shape)
    rng = np.random.RandomState(3)
    rhs = jnp.asarray(rng.randn(*shape), jnp.float32)
    w = (jnp.float32(0.7), jnp.float32(1.3))

    ref = fo._mm_solve_xla(solver, w, rhs)
    wa = jnp.stack([w[0], w[1]])
    out = fo._mm_solve_fused(solver, wa, rhs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # the class dispatch itself (backend gate forced open)
    monkeypatch.setattr(pallas_krylov, "spectral_eligible",
                        lambda *a, **k: True)
    out2 = solver.solve(w, rhs)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_spectral_gradients_match_xla(monkeypatch):
    """custom_vjp backward (XLA recompute) == autodiff of the XLA path, for
    both the rhs and the (traced) axis weights."""
    from diffpiso_tpu.solvers import fourier as fo

    _force_fused(monkeypatch)
    shape = (8, 16)
    solver = fo.MatmulSpectralSolver(kinds=("dct2", "dct2"), shape=shape)
    rng = np.random.RandomState(7)
    rhs = jnp.asarray(rng.randn(*shape), jnp.float32)
    ct_seed = jnp.asarray(rng.randn(*shape), jnp.float32)
    wa = jnp.asarray([0.9, 1.1], jnp.float32)

    def loss_fused(w, r):
        return jnp.sum(fo._mm_solve_fused(solver, w, r) * ct_seed)

    def loss_xla(w, r):
        return jnp.sum(fo._mm_solve_xla(solver, (w[0], w[1]), r) * ct_seed)

    gw_f, gr_f = jax.grad(loss_fused, argnums=(0, 1))(wa, rhs)
    gw_x, gr_x = jax.grad(loss_xla, argnums=(0, 1))(wa, rhs)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gr_f), np.asarray(gr_x),
                               rtol=1e-4, atol=1e-5)


def test_spectral_eligible_budget():
    """Aspect-ratio and VMEM gates: DNS 512x2048 must stay on XLA."""
    if not pallas_krylov._PALLAS_AVAILABLE:
        pytest.skip("pallas unavailable")
    # pure budget arithmetic (backend gate bypassed by calling the math)
    f = jnp.float32
    n0, n1 = 512, 2048
    assert (n0 * n0 + n1 * n1 + 4 * n0 * n1) * 4 > pallas_krylov._VMEM_BUDGET_BYTES
    n0 = n1 = 512
    assert (n0 * n0 + n1 * n1 + 4 * n0 * n1) * 4 <= pallas_krylov._VMEM_BUDGET_BYTES


@pytest.mark.parametrize("shape", [(8, 16, 24), (6, 8, 8)])
def test_fused_spectral3d_matches_xla(shape, monkeypatch):
    """Three-launch rank-3 apply == the tensordot chain (fft_mm basis — the
    3-D turbulence preconditioner), incl. the singular k=0 mode zeroing and
    a non-divisor-friendly ny*nx column count."""
    from diffpiso_tpu.solvers import fourier as fo

    _force_fused(monkeypatch)
    solver = fo.MatmulSpectralSolver(kinds=("fourier",) * 3, shape=shape)
    rng = np.random.RandomState(11)
    rhs = jnp.asarray(rng.randn(*shape), jnp.float32)
    w = (jnp.float32(0.8), jnp.float32(1.1), jnp.float32(0.6))

    ref = fo._mm_solve_xla(solver, w, rhs)
    wa = jnp.stack(list(w))
    out = fo._mm_solve_fused(solver, wa, rhs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    monkeypatch.setattr(pallas_krylov, "spectral_eligible_3d",
                        lambda *a, **k: True)
    out2 = solver.solve(w, rhs)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_spectral3d_gradients_match_xla(monkeypatch):
    from diffpiso_tpu.solvers import fourier as fo

    _force_fused(monkeypatch)
    shape = (4, 8, 8)
    solver = fo.MatmulSpectralSolver(kinds=("fourier",) * 3, shape=shape)
    rng = np.random.RandomState(13)
    rhs = jnp.asarray(rng.randn(*shape), jnp.float32)
    ct = jnp.asarray(rng.randn(*shape), jnp.float32)
    wa = jnp.asarray([0.9, 1.2, 0.7], jnp.float32)

    def loss_fused(w, r):
        return jnp.sum(fo._mm_solve_fused(solver, w, r) * ct)

    def loss_xla(w, r):
        return jnp.sum(fo._mm_solve_xla(solver, (w[0], w[1], w[2]), r) * ct)

    gw_f, gr_f = jax.grad(loss_fused, argnums=(0, 1))(wa, rhs)
    gw_x, gr_x = jax.grad(loss_xla, argnums=(0, 1))(wa, rhs)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gr_f), np.asarray(gr_x),
                               rtol=1e-4, atol=1e-5)


def test_fused_pcg_mm_update_through_pressure_solver(monkeypatch):
    """dct_mm PCG with the preconditioner FOLDED into the p-update launch
    (precond_mm path: one kernel per iteration, z never leaves VMEM) must
    match both the jnp path and the two-launch fused path."""
    lap, rhs = _system(rank_deficient=True)
    cfg = PressureSolver(
        max_iterations=200, deflate_mean=True,
        preconditioner="dct_mm", adjoint_preconditioner="dct_mm",
    )
    x_ref, it_ref, warn_ref = solve_pressure_system(cfg, lap, rhs, None, 1e-7)
    assert not bool(warn_ref)

    _force_fused(monkeypatch)
    monkeypatch.setattr(pallas_krylov, "spectral_eligible",
                        lambda *a, **k: True)
    x_mm, it_mm, warn_mm = solve_pressure_system(cfg, lap, rhs, None, 1e-7)
    assert not bool(warn_mm)
    a = np.asarray(x_mm) - np.asarray(x_mm).mean()
    b = np.asarray(x_ref) - np.asarray(x_ref).mean()
    np.testing.assert_allclose(a, b, atol=5e-5)
    # same iteration count: the folded update is the same math
    assert abs(int(it_mm) - int(it_ref)) <= 1
    # warm start with the previous solution converges (near-)immediately
    _, it2, w2 = solve_pressure_system(cfg, lap, rhs, x_mm, 1e-6)
    assert not bool(w2) and int(it2) <= 2


def test_fused_pcg2_whole_solve_through_pressure_solver(monkeypatch):
    """The whole-solve rank-2 spectral PCG (ONE launch: init residual,
    preconditioned while-loop with exact in-kernel mean deflation, final
    verification) must match the jnp pcg path through solve_pressure_system:
    same solution up to the singular system's constant gauge, same
    iteration count, immediate warm-start convergence."""
    lap, rhs = _system(rank_deficient=True)
    cfg = PressureSolver(
        max_iterations=200, deflate_mean=True,
        preconditioner="dct_mm", adjoint_preconditioner="dct_mm",
    )
    x_ref, it_ref, warn_ref = solve_pressure_system(cfg, lap, rhs, None, 1e-6)
    assert not bool(warn_ref)

    _force_fused(monkeypatch)
    monkeypatch.setattr(pallas_krylov, "pcg2_eligible", lambda *a, **k: True)
    x_f, it_f, warn_f = solve_pressure_system(cfg, lap, rhs, None, 1e-6)
    assert not bool(warn_f)
    a = np.asarray(x_f) - np.asarray(x_f).mean()
    b = np.asarray(x_ref) - np.asarray(x_ref).mean()
    np.testing.assert_allclose(a, b, atol=5e-5)
    assert abs(int(it_f) - int(it_ref)) <= 1
    # warm start with the previous solution converges (near-)immediately,
    # through the same single launch (the in-kernel while just never runs)
    _, it2, w2 = solve_pressure_system(cfg, lap, rhs, x_f, 1e-5)
    assert not bool(w2) and int(it2) <= 2
    # under jit (the production trace context)
    x_j, it_j, w_j = jax.jit(
        lambda l, r: solve_pressure_system(cfg, l, r, None, 1e-6)
    )(lap, rhs)
    assert not bool(w_j)
    np.testing.assert_allclose(
        np.asarray(x_j) - np.asarray(x_j).mean(), b, atol=5e-5
    )


def test_fused_pcg2_whole_solve_unaligned_rows(monkeypatch):
    """The pad-to-aligned wrapper (r4): an odd-row plane (the 513-row
    cavity's shape class) pads to sublane/lane multiples with masked
    shift/deflation — solution must match the jnp pcg path on the TRUE
    plane. (16,32) tests lane padding implicitly; this covers row padding
    and both paddings combined."""
    lap, rhs = _system(res=(17, 32), rank_deficient=True)
    cfg = PressureSolver(
        max_iterations=200, deflate_mean=True,
        preconditioner="dct_mm", adjoint_preconditioner="dct_mm",
    )
    x_ref, it_ref, warn_ref = solve_pressure_system(cfg, lap, rhs, None, 1e-6)
    assert not bool(warn_ref)

    _force_fused(monkeypatch)
    monkeypatch.setattr(pallas_krylov, "pcg2_eligible", lambda *a, **k: True)
    x_f, it_f, warn_f = solve_pressure_system(cfg, lap, rhs, None, 1e-6)
    assert not bool(warn_f)
    assert x_f.shape == rhs.shape
    a = np.asarray(x_f) - np.asarray(x_f).mean()
    b = np.asarray(x_ref) - np.asarray(x_ref).mean()
    np.testing.assert_allclose(a, b, atol=5e-5)
    assert abs(int(it_f) - int(it_ref)) <= 1


def test_fused_pcg2_whole_solve_vmap_batches(monkeypatch):
    """jax.vmap over the whole-solve pcg2 must dispatch the grid-over-batch
    custom_vmap rule (one program per sample, each with its own while-loop
    and (1,1) SMEM scalar block) and match per-sample solves — the property
    that lets make_batched_train_step keep the fused pressure solve."""
    lap, rhs0 = _system(rank_deficient=True)
    rng = np.random.RandomState(7)
    rhs = jnp.stack([
        rhs0,
        jnp.asarray(rng.randn(*rhs0.shape), jnp.float32)
        - jnp.mean(jnp.asarray(rng.randn(*rhs0.shape), jnp.float32)),
        jnp.zeros_like(rhs0),
    ])
    rhs = rhs - jnp.mean(rhs, axis=(1, 2), keepdims=True)
    cfg = PressureSolver(
        max_iterations=200, deflate_mean=True,
        preconditioner="dct_mm", adjoint_preconditioner="dct_mm",
    )
    _force_fused(monkeypatch)
    monkeypatch.setattr(pallas_krylov, "pcg2_eligible", lambda *a, **k: True)

    solve = lambda r: solve_pressure_system(cfg, lap, r, None, 1e-6)
    xb, itb, warnb = jax.vmap(solve)(rhs)
    assert not bool(jnp.any(warnb))
    for i in range(rhs.shape[0]):
        xi, iti, warni = solve(rhs[i])
        a = np.asarray(xb[i]) - np.asarray(xb[i]).mean()
        bexp = np.asarray(xi) - np.asarray(xi).mean()
        np.testing.assert_allclose(a, bexp, atol=5e-5)
        assert int(itb[i]) == int(iti)


@pytest.mark.parametrize("fold", ["auto", "never"])
def test_jacobi_whole_solve_vmap_batches(fold, monkeypatch):
    """vmap over the whole-solve momentum kernels (jac1 + jac2) must match
    per-sample execution — fold='auto' routes jac2 through the r5
    batch-FOLDED single program (per-sample masked sweeps), 'never'
    through the grid-over-batch rule; jac1 always grids."""
    monkeypatch.setenv("DIFFPISO_FUSED_JAC2_FOLD", fold)
    monkeypatch.setattr(pallas_krylov, "_INTERPRET", True)
    monkeypatch.setattr(pallas_krylov, "_roll",
                        lambda a, s, ax: jnp.roll(a, s, ax))
    rng = np.random.RandomState(3)
    B, n = 3, 16

    def mk(scale, shp=(B, n, n)):
        return jnp.asarray(scale * rng.randn(*shp), jnp.float32)

    c = jnp.asarray(-8.0 + 0.2 * rng.randn(B, n, n), jnp.float32)
    ly, hy, lx, hx = mk(0.3), mk(0.3), mk(0.3), mk(0.3)
    b = mk(1.0)
    x = jnp.zeros((B, n, n), jnp.float32)

    def solve1(c, ly, hy, lx, hx, b, x):
        return pallas_krylov.fused_jacobi1_solve(
            (c, (ly, hy), (lx, hx)), b, x, -1.0, False, 1e-6, 33)

    xo, nrm = jax.vmap(solve1)(c, ly, hy, lx, hx, b, x)
    for i in range(B):
        xr, nr = solve1(c[i], ly[i], hy[i], lx[i], hx[i], b[i], x[i])
        np.testing.assert_allclose(np.asarray(xo[i]), np.asarray(xr),
                                   rtol=1e-5, atol=1e-6)
        assert float(nrm[i]) < 1e-6

    c2 = jnp.asarray(-8.0 + 0.2 * rng.randn(B, n, n), jnp.float32)
    args = (c, ly, hy, lx, hx, b, x,
            c2, mk(0.3), mk(0.3), mk(0.3), mk(0.3), mk(1.0), x)

    def solve2(args):
        (c0, ly0, hy0, lx0, hx0, b0, x0,
         c1, ly1, hy1, lx1, hx1, b1, x1) = args
        return pallas_krylov.fused_jacobi2_solve(
            [(c0, (ly0, hy0), (lx0, hx0)), (c1, (ly1, hy1), (lx1, hx1))],
            (b0, b1), (x0, x1), -1.0, True, 1e-6, 33)

    xo0, xo1, nrm2 = jax.vmap(solve2)(args)
    for i in range(B):
        r0, r1, nr = solve2(jax.tree_util.tree_map(lambda a: a[i], args))
        np.testing.assert_allclose(np.asarray(xo0[i]), np.asarray(r0),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(xo1[i]), np.asarray(r1),
                                   rtol=1e-5, atol=1e-6)
        assert float(nrm2[i]) < 1e-6


def test_jac2_fold_engages_and_masks_per_sample(monkeypatch):
    """The batch-FOLDED jac2 program must (a) actually dispatch under vmap
    at fold-eligible sizes (spy on the kernel body), (b) match per-sample
    solo solves even when samples need very different sweep counts (the
    per-sample mask freezes converged samples exactly)."""
    monkeypatch.setattr(pallas_krylov, "_INTERPRET", True)
    monkeypatch.setattr(pallas_krylov, "_roll",
                        lambda a, s, ax: jnp.roll(a, s, ax))
    calls = []
    orig = pallas_krylov._jacobi2_solve_kernel_bf
    monkeypatch.setattr(
        pallas_krylov, "_jacobi2_solve_kernel_bf",
        lambda *a, **k: calls.append("bf") or orig(*a, **k))
    rng = np.random.RandomState(7)
    B, n = 4, 16
    # wildly different diagonal dominance per sample -> different sweep
    # counts (sample 0 converges in ~2 sweeps, sample 3 needs many)
    doms = [50.0, 12.0, 6.0, 3.5]
    c = jnp.asarray(np.stack([
        -d + 0.2 * rng.randn(n, n) for d in doms]), jnp.float32)
    mk = lambda s: jnp.asarray(s * rng.randn(B, n, n), jnp.float32)
    ly, hy, lx, hx = mk(0.4), mk(0.4), mk(0.4), mk(0.4)
    b = mk(1.0)
    x = jnp.zeros((B, n, n), jnp.float32)
    c2, b2 = c + 0.5, mk(1.0)
    args = (c, ly, hy, lx, hx, b, x, c2, mk(0.4), mk(0.4), mk(0.4),
            mk(0.4), b2, x)

    def solve2(args):
        (c0, ly0, hy0, lx0, hx0, b0, x0,
         c1, ly1, hy1, lx1, hx1, b1, x1) = args
        return pallas_krylov.fused_jacobi2_solve(
            [(c0, (ly0, hy0), (lx0, hx0)), (c1, (ly1, hy1), (lx1, hx1))],
            (b0, b1), (x0, x1), -1.0, False, 1e-6, 60)

    xo0, xo1, nrm = jax.vmap(solve2)(args)
    assert calls, "folded kernel did not engage"
    for i in range(B):
        r0, r1, nr = solve2(jax.tree_util.tree_map(lambda a: a[i], args))
        np.testing.assert_allclose(np.asarray(xo0[i]), np.asarray(r0),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(xo1[i]), np.asarray(r1),
                                   rtol=1e-5, atol=1e-6)
        assert float(nrm[i]) < 1e-6


def test_jac2_fold_batched_tolerances(monkeypatch):
    """Batched sc (per-sample tolerances — the adjoint-solve regime, where
    adj_tol derives from the batched cotangent) must dispatch the
    batched-sc folded kernel and honour each sample's OWN tolerance."""
    monkeypatch.setattr(pallas_krylov, "_INTERPRET", True)
    monkeypatch.setattr(pallas_krylov, "_roll",
                        lambda a, s, ax: jnp.roll(a, s, ax))
    calls = []
    orig = pallas_krylov._jacobi2_solve_kernel_bfs
    monkeypatch.setattr(
        pallas_krylov, "_jacobi2_solve_kernel_bfs",
        lambda *a, **k: calls.append("bfs") or orig(*a, **k))
    rng = np.random.RandomState(11)
    B, n = 3, 16
    mk = lambda s, shp=(B, n, n): jnp.asarray(s * rng.randn(*shp), jnp.float32)
    c = jnp.asarray(-7.0 + 0.2 * rng.randn(B, n, n), jnp.float32)
    ly, hy, lx, hx = mk(0.3), mk(0.3), mk(0.3), mk(0.3)
    b = mk(1.0)
    x = jnp.zeros((B, n, n), jnp.float32)
    c2 = c - 0.5
    args = (c, ly, hy, lx, hx, b, x,
            c2, mk(0.3), mk(0.3), mk(0.3), mk(0.3), mk(1.0), x)
    tols = jnp.asarray([1e-3, 1e-5, 1e-7], jnp.float32)

    def solve2(args, tol):
        (c0, ly0, hy0, lx0, hx0, b0, x0,
         c1, ly1, hy1, lx1, hx1, b1, x1) = args
        return pallas_krylov.fused_jacobi2_solve(
            [(c0, (ly0, hy0), (lx0, hx0)), (c1, (ly1, hy1), (lx1, hx1))],
            (b0, b1), (x0, x1), -1.0, False, tol, 80)

    xo0, xo1, nrm = jax.vmap(solve2)(args, tols)
    assert calls, "batched-sc folded kernel did not engage"
    for i in range(B):
        r0, r1, nr = solve2(jax.tree_util.tree_map(lambda a: a[i], args),
                            tols[i])
        np.testing.assert_allclose(np.asarray(xo0[i]), np.asarray(r0),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(xo1[i]), np.asarray(r1),
                                   rtol=1e-5, atol=1e-7)
        # the broadcasted per-sample sgn changes fp association in the
        # final true-residual reduction — x matches to 1e-7, the reported
        # norm only to f32 rounding
        np.testing.assert_allclose(float(nrm[i]), float(nr), rtol=1e-6,
                                   atol=5e-8)


def test_fold_only_context_lets_jac2_through_no_pallas(monkeypatch):
    """fold_only_pallas() + no_pallas(): every pallas gate stays off
    EXCEPT jac2_eligible (the small-plane batched training escape)."""
    from diffpiso_tpu.ops import pallas_stencil as ps

    monkeypatch.setattr(pallas_krylov, "_INTERPRET", True)
    monkeypatch.setattr(ps, "_INTERPRET", True, raising=False)
    shapes = ((32, 32), (32, 32))
    with ps.no_pallas():
        assert not pallas_krylov.jac2_eligible(shapes, jnp.float32)
        with ps.fold_only_pallas():
            assert pallas_krylov.jac2_eligible(shapes, jnp.float32)
            # the other solver gates stay disabled
            assert not pallas_krylov.jac1_eligible((32, 32), jnp.float32)
            assert not ps.pallas_eligible((32, 32), jnp.float32)
    assert pallas_krylov.jac2_eligible(shapes, jnp.float32)


def _system3_periodic(res=(6, 8, 16), seed=2):
    """Rank-deficient all-periodic 3-D pressure system (the turb3d shape)."""
    nz, ny, nx = res
    rng = np.random.RandomState(seed)
    infl = StaggeredField(
        tuple(
            jnp.asarray(rng.rand(nz, ny, nx) + 0.5, jnp.float32)
            for _ in range(3)
        ),
        periodic=(True, True, True),
    )
    act = np.ones((nz + 2, ny + 2, nx + 2), np.float32)
    lap = assemble_pressure_laplacian(
        infl, jnp.asarray(act), jnp.asarray(act), (True, True, True), True
    )
    rhs = rng.randn(nz, ny, nx).astype(np.float32)
    rhs -= rhs.mean()
    return lap, jnp.asarray(rhs)


def test_fused_pcg3_through_pressure_solver(monkeypatch):
    """The fully-fused rank-3 spectral-PCG loop (6 z-gridded launches per
    iteration, scalars through SMEM accumulators, shift via carried sum(p))
    must match the jnp pcg path through solve_pressure_system: same
    solution (up to the singular system's constant gauge), iteration count
    within 1 (the fused loop omits the in-loop mean deflation, which is
    algebraically inert under the mean-zeroing preconditioner)."""
    lap, rhs = _system3_periodic()
    cfg = PressureSolver(
        max_iterations=300, deflate_mean=True,
        preconditioner="fft_mm", adjoint_preconditioner="fft_mm",
    )
    x_ref, it_ref, warn_ref = solve_pressure_system(cfg, lap, rhs, None, 1e-6)
    assert not bool(warn_ref)

    _force_fused(monkeypatch)
    monkeypatch.setattr(pallas_krylov, "pcg3_eligible", lambda *a, **k: True)
    x_f, it_f, warn_f = solve_pressure_system(cfg, lap, rhs, None, 1e-6)
    assert not bool(warn_f)
    a = np.asarray(x_f) - np.asarray(x_f).mean()
    b = np.asarray(x_ref) - np.asarray(x_ref).mean()
    np.testing.assert_allclose(a, b, atol=5e-5)
    assert abs(int(it_f) - int(it_ref)) <= 1
    # warm start with the previous solution converges (near-)immediately
    _, it2, w2 = solve_pressure_system(cfg, lap, rhs, x_f, 1e-5)
    assert not bool(w2) and int(it2) <= 2


def test_fused_phase3_through_pressure_solver(monkeypatch):
    """The monolithic rank-3 per-iteration phase kernels (fused_residual /
    fused_pcg_apply / fused_pcg_update over whole VMEM-resident volumes —
    the 128^3-class tier, pallas_krylov.eligible3) must match the jnp pcg
    path through solve_pressure_system. PCG3 (z-gridded per-iteration) is
    forced OFF so the dispatch lands here, exactly like production where
    DIFFPISO_FUSED_PCG3 defaults never."""
    lap, rhs = _system3_periodic(seed=4)
    cfg = PressureSolver(
        max_iterations=300, deflate_mean=True,
        preconditioner="fft_mm", adjoint_preconditioner="fft_mm",
    )
    x_ref, it_ref, warn_ref = solve_pressure_system(cfg, lap, rhs, None, 1e-6)
    assert not bool(warn_ref)

    _force_fused(monkeypatch)
    monkeypatch.setenv("DIFFPISO_FUSED_PCG3", "never")
    monkeypatch.setattr(pallas_krylov, "eligible3", lambda *a, **k: True)
    x_f, it_f, warn_f = solve_pressure_system(cfg, lap, rhs, None, 1e-6)
    assert not bool(warn_f)
    a = np.asarray(x_f) - np.asarray(x_f).mean()
    b = np.asarray(x_ref) - np.asarray(x_ref).mean()
    np.testing.assert_allclose(a, b, atol=5e-5)
    assert abs(int(it_f) - int(it_ref)) <= 1
    # warm start converges (near-)immediately through the same kernels
    _, it2, w2 = solve_pressure_system(cfg, lap, rhs, x_f, 1e-5)
    assert not bool(w2) and int(it2) <= 2


def test_fused_cg3_iteration_matches_jnp(monkeypatch):
    """Unpreconditioned rank-3 CG through the monolithic iteration kernel
    (fused_cg_iteration rank-3 branch) matches the jnp loop."""
    from diffpiso_tpu.solvers import cg

    lap, rhs = _system3_periodic(seed=5)
    ref = cg(lambda p: apply_laplacian(lap, p), rhs, None,
             tol=1e-6, max_iter=600, deflate_mean=True, stencil=None)
    assert not bool(ref.warn)

    _force_fused(monkeypatch)
    monkeypatch.setattr(pallas_krylov, "eligible3", lambda *a, **k: True)
    out = cg(lambda p: apply_laplacian(lap, p), rhs, None,
             tol=1e-6, max_iter=600, deflate_mean=True, stencil=lap)
    assert not bool(out.warn)
    a = np.asarray(out.x) - np.asarray(out.x).mean()
    b = np.asarray(ref.x) - np.asarray(ref.x).mean()
    np.testing.assert_allclose(a, b, atol=5e-5)


def test_pcg2_eligibility_adjoint_gate(monkeypatch):
    """DIFFPISO_FUSED_PCG2 mode semantics (pallas_krylov.pcg2_eligible):
    since the r4 pad-to-aligned wrapper, auto fuses forward AND adjoint
    solves on unaligned planes too (the 513-row cavity pads once per solve
    instead of paying Mosaic re-padding per in-loop op — the r3 loss that
    excluded its adjoint). fwd restricts to forward solves; never
    disables."""
    monkeypatch.setattr(pallas_krylov, "_INTERPRET", True)  # skip backend gate
    elig = pallas_krylov.pcg2_eligible
    aligned, unaligned = (512, 512), (513, 512)

    monkeypatch.setenv("DIFFPISO_FUSED_PCG2", "auto")
    assert elig(aligned, jnp.float32)
    assert elig(unaligned, jnp.float32)
    assert elig(aligned, jnp.float32, early_exit=False)
    assert elig(unaligned, jnp.float32, early_exit=False)

    monkeypatch.setenv("DIFFPISO_FUSED_PCG2", "fwd")
    assert elig(unaligned, jnp.float32)
    assert not elig(aligned, jnp.float32, early_exit=False)

    monkeypatch.setenv("DIFFPISO_FUSED_PCG2", "all")
    assert elig(unaligned, jnp.float32, early_exit=False)

    monkeypatch.setenv("DIFFPISO_FUSED_PCG2", "never")
    assert not elig(aligned, jnp.float32)

    # the VMEM-residency bound is mode-independent (1024^2 exceeds the
    # 24 MiB plane budget; f64 always ineligible)
    monkeypatch.setenv("DIFFPISO_FUSED_PCG2", "all")
    assert not elig((1024, 1024), jnp.float32)
    assert not elig(aligned, jnp.float64)


def test_mm_update_large_eligible_all_mode(monkeypatch):
    """DIFFPISO_FUSED_KRYLOV_LARGE=all lifts the fourier-only family
    restriction (the r5 re-measurement mode); auto keeps it."""
    from diffpiso_tpu.solvers.pallas_krylov import mm_update_large_eligible

    monkeypatch.setattr(pallas_krylov, "_INTERPRET", True)
    monkeypatch.setattr(pallas_krylov, "_krylov_plumbing_ok",
                        lambda *a, **k: True)
    shape, dt = (512, 2048), jnp.float32
    monkeypatch.setenv("DIFFPISO_FUSED_KRYLOV_LARGE", "auto")
    assert not mm_update_large_eligible(shape, dt, kinds=("dct2", "dct4"))
    monkeypatch.setenv("DIFFPISO_FUSED_KRYLOV_LARGE", "all")
    assert mm_update_large_eligible(shape, dt, kinds=("dct2", "dct4"))
    monkeypatch.setenv("DIFFPISO_FUSED_KRYLOV_LARGE", "never")
    assert not mm_update_large_eligible(shape, dt, kinds=("dct2", "dct4"))
