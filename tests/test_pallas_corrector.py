"""Fused corrector-1 bridge (ops/pallas_corrector.py) vs the XLA chain:
kernel equality, custom_vjp gradient parity, and full-piso_step
integration on the periodic turbulence config — interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpiso_tpu import StaggeredField
from diffpiso_tpu.core import piso_step
from diffpiso_tpu.core.setups import decaying_turbulence_setup
from diffpiso_tpu.ops import pallas_corrector as pc
from diffpiso_tpu.ops.stencil import AdvectionStencil


def _force(monkeypatch):
    try:
        from jax.experimental import pallas as pl  # noqa: F401
    except Exception:  # pragma: no cover
        pytest.skip("pallas unavailable")
    monkeypatch.setattr(pc, "_INTERPRET", True)
    monkeypatch.setattr(pc, "_roll", lambda a, s, ax: jnp.roll(a, s, ax))
    monkeypatch.setattr(pc, "eligible", lambda *a, **k: True)


def _inputs(n=16, m=24, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda s=1.0: jnp.asarray(s * rng.randn(n, m), jnp.float32)
    p_inc = mk()
    vel_star = (mk(0.5), mk(0.5))
    bma = (mk(0.1) + 4.0, mk(0.1) + 4.0)
    st = AdvectionStencil(
        center=(mk(0.3) - 4.0, mk(0.3) - 4.0),
        lo=((mk(0.2), mk(0.2)), (mk(0.2), mk(0.2))),
        hi=((mk(0.2), mk(0.2)), (mk(0.2), mk(0.2))),
        diag_A=(mk(0.3) - 1.0, mk(0.3) - 1.0),
    )
    return p_inc, vel_star, bma, st


def test_bridge_matches_jnp_chain(monkeypatch):
    _force(monkeypatch)
    p_inc, vel_star, bma, st = _inputs()
    dx = (0.1, 0.1)
    beta = 2.5
    v2, h, hdiv = pc.corrector1_bridge(
        p_inc, vel_star, bma, st, st.diag_A, beta, dx
    )
    dxprod = dx[0] * dx[1]
    v2r, hr, hdr = pc._bridge1_jnp(
        dxprod / dx[0], dxprod / dx[1], dxprod, beta, p_inc, vel_star, bma,
        tuple(st.center), tuple(st.lo), tuple(st.hi), tuple(st.diag_A),
    )
    for a, b in zip(v2 + h + (hdiv,), v2r + hr + (hdr,)):
        # not bitwise even in interpret mode: XLA contracts/fuses the two
        # graphs differently (FMA formation), worth ~1 ulp per op chain
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_bridge_gradients_match_jnp_chain(monkeypatch):
    """custom_vjp backward (XLA recompute) must equal autodiff through the
    plain chain — including the cotangents into the stencil coefficients
    (they carry velocity dependence in the real step)."""
    _force(monkeypatch)
    p_inc, vel_star, bma, st = _inputs(seed=1)
    dx = (0.1, 0.2)
    beta = 1.5
    dxprod = dx[0] * dx[1]

    def loss_fused(p, v, c0):
        st2 = AdvectionStencil(center=(c0, st.center[1]), lo=st.lo,
                               hi=st.hi, diag_A=st.diag_A)
        v2, h, hdiv = pc.corrector1_bridge(
            p, v, bma, st2, st2.diag_A, beta, dx
        )
        return (sum(jnp.sum(x ** 2) for x in v2 + h)
                + jnp.sum(hdiv ** 3))

    def loss_ref(p, v, c0):
        v2, h, hdiv = pc._bridge1_jnp(
            dxprod / dx[0], dxprod / dx[1], dxprod, beta, p, v, bma,
            (c0, st.center[1]), tuple(st.lo), tuple(st.hi),
            tuple(st.diag_A),
        )
        return (sum(jnp.sum(x ** 2) for x in v2 + h)
                + jnp.sum(hdiv ** 3))

    args = (p_inc, vel_star, st.center[0])
    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(*args)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_r)):
        scale = float(jnp.max(jnp.abs(b))) or 1.0
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5 * scale)


def _force_tiled(monkeypatch, tile=8):
    """Force the row-tiled variant (the 1024^2-class path) in interpret
    mode with a tiny tile so small test planes exercise >= 2 grid steps."""
    _force(monkeypatch)
    monkeypatch.setattr(pc, "_variant", lambda *a, **k: "tiled")
    monkeypatch.setattr(pc, "_bridge_tile", lambda shape, item: tile)


def test_tiled_bridge_matches_jnp_chain(monkeypatch):
    _force_tiled(monkeypatch)
    p_inc, vel_star, bma, st = _inputs(n=32, m=24, seed=3)
    dx = (0.1, 0.3)
    beta = 2.5
    v2, h, hdiv = pc.corrector1_bridge(
        p_inc, vel_star, bma, st, st.diag_A, beta, dx
    )
    dxprod = dx[0] * dx[1]
    v2r, hr, hdr = pc._bridge1_jnp(
        dxprod / dx[0], dxprod / dx[1], dxprod, beta, p_inc, vel_star, bma,
        tuple(st.center), tuple(st.lo), tuple(st.hi), tuple(st.diag_A),
    )
    for a, b in zip(v2 + h + (hdiv,), v2r + hr + (hdr,)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_tiled_tail_matches_jnp_chain(monkeypatch):
    _force_tiled(monkeypatch)
    rng = np.random.RandomState(4)
    n, m = 32, 24
    mk = lambda s=1.0: jnp.asarray(s * rng.randn(n, m), jnp.float32)
    p_inc = mk()
    vel_s2 = (mk(0.5), mk(0.5))
    h = (mk(0.3), mk(0.3))
    bma = (mk(0.1) + 4.0, mk(0.1) + 4.0)
    dx = (0.2, 0.1)
    dxprod = dx[0] * dx[1]
    got = pc.corrector2_tail(p_inc, vel_s2, h, bma, dx)
    want = pc._tail2_jnp(dxprod / dx[0], dxprod / dx[1], dxprod, p_inc,
                         vel_s2, h, bma)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_tiled_bridge_gradients_match_jnp_chain(monkeypatch):
    _force_tiled(monkeypatch)
    p_inc, vel_star, bma, st = _inputs(n=32, m=24, seed=5)
    dx = (0.1, 0.2)
    beta = 1.5
    dxprod = dx[0] * dx[1]

    def loss_fused(p, v, c0):
        st2 = AdvectionStencil(center=(c0, st.center[1]), lo=st.lo,
                               hi=st.hi, diag_A=st.diag_A)
        v2, h, hdiv = pc.corrector1_bridge(
            p, v, bma, st2, st2.diag_A, beta, dx
        )
        return sum(jnp.sum(x ** 2) for x in v2 + h) + jnp.sum(hdiv ** 3)

    def loss_ref(p, v, c0):
        v2, h, hdiv = pc._bridge1_jnp(
            dxprod / dx[0], dxprod / dx[1], dxprod, beta, p, v, bma,
            (c0, st.center[1]), tuple(st.lo), tuple(st.hi),
            tuple(st.diag_A),
        )
        return sum(jnp.sum(x ** 2) for x in v2 + h) + jnp.sum(hdiv ** 3)

    args = (p_inc, vel_star, st.center[0])
    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(*args)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_r)):
        scale = float(jnp.max(jnp.abs(b))) or 1.0
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5 * scale)


def test_full_step_with_tiled_bridge_matches_plain(monkeypatch):
    """piso_step with the TILED bridge forced on must match the plain
    chain — forward and gradient (the 1024^2-class dispatch, shrunk)."""
    _force_tiled(monkeypatch)
    n = 32
    domain, sim = decaying_turbulence_setup(
        (n, n), viscosity=0.01, max_iterations=(50, 300)
    )
    rng = np.random.RandomState(6)
    vel = StaggeredField(
        (jnp.asarray(0.3 * rng.randn(n, n), jnp.float32),
         jnp.asarray(0.3 * rng.randn(n, n), jnp.float32)),
        periodic=(True, True),
    )
    p = domain.centered_grid(0.0)

    @jax.jit
    def run(vel, p):
        out = piso_step(vel, p, 0.05, domain, sim,
                        advection_tol=1e-7, pressure_tol=1e-8)
        return out.velocity, out.pressure, out.warn

    def loss(vel, p):
        v, _, _ = run(vel, p)
        return sum(jnp.sum(c ** 2) for c in v.components)

    vel_f, p_f, warn_f = run(vel, p)
    g_f = jax.grad(lambda v: loss(v, p))(vel)
    assert not bool(warn_f)

    monkeypatch.setattr(pc, "eligible", lambda *a, **k: False)
    monkeypatch.setattr(pc, "_variant", lambda *a, **k: None)
    vel_r, p_r, warn_r = run(vel, p)
    g_r = jax.grad(lambda v: loss(v, p))(vel)
    assert not bool(warn_r)

    for a, b in zip(vel_f.components, vel_r.components):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_f), np.asarray(p_r),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(g_f.components, g_r.components):
        scale = float(jnp.max(jnp.abs(b))) or 1.0
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4 * scale)


def test_full_step_with_bridge_matches_plain(monkeypatch):
    """piso_step with the bridge forced on (periodic turbulence) must match
    the plain chain — forward AND gradient."""
    _force(monkeypatch)
    n = 32
    domain, sim = decaying_turbulence_setup(
        (n, n), viscosity=0.01, max_iterations=(50, 300)
    )
    rng = np.random.RandomState(2)
    vel = StaggeredField(
        (jnp.asarray(0.3 * rng.randn(n, n), jnp.float32),
         jnp.asarray(0.3 * rng.randn(n, n), jnp.float32)),
        periodic=(True, True),
    )
    p = domain.centered_grid(0.0)

    @jax.jit  # jit: mask-triviality checks must not trace (host np only)
    def run(vel, p):
        out = piso_step(vel, p, 0.05, domain, sim,
                        advection_tol=1e-7, pressure_tol=1e-8)
        return out.velocity, out.pressure, out.warn

    def loss(vel, p):
        v, _, _ = run(vel, p)
        return sum(jnp.sum(c ** 2) for c in v.components)

    vel_f, p_f, warn_f = run(vel, p)
    g_f = jax.grad(lambda v: loss(v, p))(vel)
    assert not bool(warn_f)

    monkeypatch.setattr(pc, "eligible", lambda *a, **k: False)
    vel_r, p_r, warn_r = run(vel, p)
    g_r = jax.grad(lambda v: loss(v, p))(vel)
    assert not bool(warn_r)

    for a, b in zip(vel_f.components, vel_r.components):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_f), np.asarray(p_r),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(g_f.components, g_r.components):
        scale = float(jnp.max(jnp.abs(b))) or 1.0
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4 * scale)


def test_fused_bwd_kernels_engage_and_match_all_cotangents(monkeypatch):
    """The r5 fused VJP kernels (one launch per bridge/tail backward) must
    (a) actually engage at the mono class and (b) reproduce autodiff
    cotangents into EVERY input — beta, p, vel, bma, all stencil
    coefficient planes, diag_A — not just the subset the older test
    covers."""
    _force(monkeypatch)
    # default is never (measured -20% at the turb512 grad30 headline,
    # runs/ab_corr_bwd.log) — opt in to exercise the kernels
    monkeypatch.setenv("DIFFPISO_FUSED_CORR_BWD", "auto")
    calls = []
    orig_b = pc._bridge1_bwd_call
    orig_t = pc._tail2_bwd_call
    monkeypatch.setattr(pc, "_bridge1_bwd_call",
                        lambda *a, **k: calls.append("b") or orig_b(*a, **k))
    monkeypatch.setattr(pc, "_tail2_bwd_call",
                        lambda *a, **k: calls.append("t") or orig_t(*a, **k))
    p_inc, vel_star, bma, st = _inputs(seed=5)
    dx = (0.15, 0.3)
    dxprod = dx[0] * dx[1]

    def loss_fused(beta, p, v, bm, c, lo, hi, dA):
        st2 = AdvectionStencil(center=c, lo=lo, hi=hi, diag_A=dA)
        v2, h, hdiv = pc.corrector1_bridge(p, v, bm, st2, dA, beta, dx)
        v3 = pc.corrector2_tail(hdiv, v2, h, bm, dx)
        return (sum(jnp.sum(x ** 2) for x in v3)
                + sum(jnp.sum(x ** 3) for x in h) + jnp.sum(hdiv ** 2))

    def loss_ref(beta, p, v, bm, c, lo, hi, dA):
        f0, f1 = dxprod / dx[0], dxprod / dx[1]
        v2, h, hdiv = pc._bridge1_jnp(f0, f1, dxprod, beta, p, v, bm,
                                      c, lo, hi, dA)
        v3 = pc._tail2_jnp(f0, f1, dxprod, hdiv, v2, h, bm)
        return (sum(jnp.sum(x ** 2) for x in v3)
                + sum(jnp.sum(x ** 3) for x in h) + jnp.sum(hdiv ** 2))

    args = (jnp.asarray(1.7, jnp.float32), p_inc, vel_star, bma,
            tuple(st.center), tuple(st.lo), tuple(st.hi), tuple(st.diag_A))
    g_f = jax.grad(loss_fused, argnums=tuple(range(8)))(*args)
    assert "b" in calls and "t" in calls, calls
    g_r = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_r)):
        scale = float(jnp.max(jnp.abs(b))) or 1.0
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5 * scale)


def test_fused_bwd_gate(monkeypatch):
    """DIFFPISO_FUSED_CORR_BWD=never keeps the jax.vjp recompute path."""
    _force(monkeypatch)
    monkeypatch.setenv("DIFFPISO_FUSED_CORR_BWD", "never")
    calls = []
    orig_b = pc._bridge1_bwd_call
    monkeypatch.setattr(pc, "_bridge1_bwd_call",
                        lambda *a, **k: calls.append("b") or orig_b(*a, **k))
    p_inc, vel_star, bma, st = _inputs(seed=6)

    def loss(p):
        v2, h, hdiv = pc.corrector1_bridge(
            p, vel_star, bma, st, st.diag_A, 2.0, (0.1, 0.1)
        )
        return jnp.sum(hdiv ** 2)

    jax.grad(loss)(p_inc)
    assert not calls
