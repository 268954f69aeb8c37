"""Interpret-mode equality tests for the fused 3-D periodic FV kernels
(ops/pallas_fv.py) against the XLA roll formulation in ops/fv.py, forward
and VJP (the custom VJPs cross-call the transpose kernel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpiso_tpu.fields.grid import StaggeredField
from diffpiso_tpu.ops import fv, pallas_fv


def _force(monkeypatch):
    monkeypatch.setattr(pallas_fv, "_INTERPRET", True)
    monkeypatch.setattr(pallas_fv, "_roll", lambda a, s, ax: jnp.roll(a, s, ax))
    monkeypatch.setattr(pallas_fv, "eligible3", lambda *a, **k: True)
    monkeypatch.setattr(pallas_fv, "eligible2", lambda *a, **k: True)


def _disable(monkeypatch):
    monkeypatch.setattr(pallas_fv, "eligible3", lambda *a, **k: False)
    monkeypatch.setattr(pallas_fv, "eligible2", lambda *a, **k: False)


_SHAPE = (6, 8, 10)
_DX = (0.5, 0.25, 0.125)


def _rand_field(key):
    ks = jax.random.split(key, 3)
    return StaggeredField(
        tuple(jax.random.normal(k, _SHAPE, jnp.float32) for k in ks),
        periodic=(True, True, True),
    )


def test_div3_matches_xla(monkeypatch):
    field = _rand_field(jax.random.PRNGKey(0))
    _disable(monkeypatch)
    ref = fv.fv_divergence(field, _DX)
    _force(monkeypatch)
    out = fv.fv_divergence(field, _DX)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_grad3_matches_xla(monkeypatch):
    p = jax.random.normal(jax.random.PRNGKey(1), _SHAPE, jnp.float32)
    modes = tuple(("circular", "circular") for _ in range(3))
    _disable(monkeypatch)
    ref = fv.fv_gradient(p, _DX, modes)
    _force(monkeypatch)
    out = fv.fv_gradient(p, _DX, modes)
    for o, r in zip(out.components, ref.components):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-6)


def test_grad3_masked_matches_xla(monkeypatch):
    p = jax.random.normal(jax.random.PRNGKey(2), _SHAPE, jnp.float32)
    modes = tuple(("circular", "circular") for _ in range(3))
    mask = (
        jax.random.uniform(
            jax.random.PRNGKey(3), tuple(s + 2 for s in _SHAPE)
        )
        > 0.3
    ).astype(jnp.float32)
    _disable(monkeypatch)
    ref = fv.fv_gradient(p, _DX, modes, accessible_mask=mask)
    _force(monkeypatch)
    out = fv.fv_gradient(p, _DX, modes, accessible_mask=mask)
    for o, r in zip(out.components, ref.components):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-6)


def test_div3_vjp_matches_xla(monkeypatch):
    field = _rand_field(jax.random.PRNGKey(4))
    ct = jax.random.normal(jax.random.PRNGKey(5), _SHAPE, jnp.float32)

    def loss(f):
        return jnp.sum(fv.fv_divergence(f, _DX) * ct)

    _disable(monkeypatch)
    ref = jax.grad(loss)(field)
    _force(monkeypatch)
    out = jax.grad(loss)(field)
    for o, r in zip(out.components, ref.components):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-6)


def test_grad3_vjp_matches_xla(monkeypatch):
    p = jax.random.normal(jax.random.PRNGKey(6), _SHAPE, jnp.float32)
    modes = tuple(("circular", "circular") for _ in range(3))
    cts = tuple(
        jax.random.normal(jax.random.PRNGKey(7 + i), _SHAPE, jnp.float32)
        for i in range(3)
    )

    def loss(pp):
        g = fv.fv_gradient(pp, _DX, modes)
        return sum(jnp.sum(c * t) for c, t in zip(g.components, cts))

    _disable(monkeypatch)
    ref = jax.grad(loss)(p)
    _force(monkeypatch)
    out = jax.grad(loss)(p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


_SHAPE2 = (12, 16)
_DX2 = (0.5, 0.25)


def test_div2_fwd_and_vjp_match_xla(monkeypatch):
    ks = jax.random.split(jax.random.PRNGKey(10), 3)
    field = StaggeredField(
        tuple(jax.random.normal(k, _SHAPE2, jnp.float32) for k in ks[:2]),
        periodic=(True, True),
    )
    ct = jax.random.normal(ks[2], _SHAPE2, jnp.float32)

    def loss(f):
        return jnp.sum(fv.fv_divergence(f, _DX2) * ct)

    _disable(monkeypatch)
    ref = fv.fv_divergence(field, _DX2)
    ref_g = jax.grad(loss)(field)
    _force(monkeypatch)
    out = fv.fv_divergence(field, _DX2)
    out_g = jax.grad(loss)(field)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    for o, r in zip(out_g.components, ref_g.components):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-6)


def test_grad2_fwd_and_vjp_match_xla(monkeypatch):
    p = jax.random.normal(jax.random.PRNGKey(11), _SHAPE2, jnp.float32)
    modes = tuple(("circular", "circular") for _ in range(2))
    cts = tuple(
        jax.random.normal(jax.random.PRNGKey(12 + i), _SHAPE2, jnp.float32)
        for i in range(2)
    )

    def loss(pp):
        g = fv.fv_gradient(pp, _DX2, modes)
        return sum(jnp.sum(c * t) for c, t in zip(g.components, cts))

    _disable(monkeypatch)
    ref = fv.fv_gradient(p, _DX2, modes)
    ref_g = jax.grad(loss)(p)
    _force(monkeypatch)
    out = fv.fv_gradient(p, _DX2, modes)
    out_g = jax.grad(loss)(p)
    for o, r in zip(out.components, ref.components):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref_g), atol=1e-6)


def test_div2_grad2_tiled_match_xla(monkeypatch):
    # force the row-tiled dispatch: tiny tile + tiny budget
    monkeypatch.setattr(pallas_fv, "_TILE_ROWS", 4)
    monkeypatch.setattr(pallas_fv, "_VMEM_BUDGET_BYTES", 1)
    ks = jax.random.split(jax.random.PRNGKey(20), 4)
    field = StaggeredField(
        tuple(jax.random.normal(k, _SHAPE2, jnp.float32) for k in ks[:2]),
        periodic=(True, True),
    )
    p = jax.random.normal(ks[2], _SHAPE2, jnp.float32)
    ct = jax.random.normal(ks[3], _SHAPE2, jnp.float32)
    modes = tuple(("circular", "circular") for _ in range(2))

    def loss(f):
        return jnp.sum(fv.fv_divergence(f, _DX2) * ct)

    _disable(monkeypatch)
    ref_d = fv.fv_divergence(field, _DX2)
    ref_g = fv.fv_gradient(p, _DX2, modes)
    ref_vjp = jax.grad(loss)(field)
    _force(monkeypatch)
    out_d = fv.fv_divergence(field, _DX2)
    out_g = fv.fv_gradient(p, _DX2, modes)
    out_vjp = jax.grad(loss)(field)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(ref_d), atol=1e-6)
    for o, r in zip(out_g.components, ref_g.components):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-6)
    for o, r in zip(out_vjp.components, ref_vjp.components):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-6)


def test_eligible3_gates():
    # rank, itemsize, and env gates (on CPU the backend gate rejects)
    assert not pallas_fv.eligible3((64, 64), jnp.float32)
    assert not pallas_fv.eligible3((64, 64, 64), jnp.float64)


# -- mixed/bounded rank-2 kernels --------------------------------------------------


def _force_m(monkeypatch):
    monkeypatch.setattr(pallas_fv, "_INTERPRET", True)
    monkeypatch.setattr(pallas_fv, "_roll", lambda a, s, ax: jnp.roll(a, s, ax))
    monkeypatch.setattr(pallas_fv, "eligible2m", lambda *a, **k: True)
    monkeypatch.setattr(pallas_fv, "eligible2", lambda *a, **k: False)


def _disable_m(monkeypatch):
    monkeypatch.setattr(pallas_fv, "eligible2m", lambda *a, **k: False)
    monkeypatch.setattr(pallas_fv, "eligible2", lambda *a, **k: False)


_CASES_2M = [
    # (periodic, ny, nx)
    ((False, False), 6, 9),
    ((False, True), 7, 8),
    ((True, False), 6, 10),
]


@pytest.mark.parametrize("periodic,ny,nx", _CASES_2M)
def test_div2m_matches_xla_and_grad(periodic, ny, nx, monkeypatch):
    shapes = [
        (ny + (not periodic[0]), nx),
        (ny, nx + (not periodic[1])),
    ]
    ks = jax.random.split(jax.random.PRNGKey(3), 2)
    field = StaggeredField(
        tuple(jax.random.normal(k, s, jnp.float32) for k, s in zip(ks, shapes)),
        periodic=periodic,
    )
    dx = (0.5, 0.25)
    _disable_m(monkeypatch)
    ref = fv.fv_divergence(field, dx)
    ct = jax.random.normal(jax.random.PRNGKey(9), ref.shape, jnp.float32)

    def loss_ref(comps):
        f = StaggeredField(comps, periodic=periodic)
        return jnp.sum(fv.fv_divergence(f, dx) * ct)

    g_ref = jax.grad(loss_ref)(tuple(field.components))

    _force_m(monkeypatch)
    out = fv.fv_divergence(field, dx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    g_out = jax.grad(loss_ref)(tuple(field.components))
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


_MODES_2M = [
    (("zero", "zero"), ("zero", "zero")),
    (("replicate", "replicate"), ("replicate", "replicate")),
    (("zero", "replicate"), ("replicate", "zero")),
]


@pytest.mark.parametrize("modes", _MODES_2M)
@pytest.mark.parametrize("use_mask", [False, True])
def test_grad2m_matches_xla_and_grad(modes, use_mask, monkeypatch):
    ny, nx = 7, 9
    p = jax.random.normal(jax.random.PRNGKey(4), (ny, nx), jnp.float32)
    acc = None
    if use_mask:
        m = np.ones((ny + 2, nx + 2), np.float32)
        m[3:5, 4:6] = 0.0  # interior solid block
        acc = jnp.asarray(m)
    dx = (0.5, 0.25)
    _disable_m(monkeypatch)
    ref = fv.fv_gradient(p, dx, modes, acc)
    cts = tuple(
        jax.random.normal(jax.random.PRNGKey(11 + i), c.shape, jnp.float32)
        for i, c in enumerate(ref.components)
    )

    def loss(p_):
        g = fv.fv_gradient(p_, dx, modes, acc)
        return sum(jnp.sum(c * w) for c, w in zip(g.components, cts))

    g_ref = jax.grad(loss)(p)

    _force_m(monkeypatch)
    out = fv.fv_gradient(p, dx, modes, acc)
    for a, b in zip(out.components, ref.components):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    g_out = jax.grad(loss)(p)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref), atol=1e-5)


def test_grad2m_mixed_periodicity_channel(monkeypatch):
    """Channel layout: bounded y (zero pad = solid walls), periodic x,
    with face masks — forward + VJP vs the jnp path."""
    ny, nx = 8, 12
    p = jax.random.normal(jax.random.PRNGKey(5), (ny, nx), jnp.float32)
    m = np.ones((ny + 2, nx + 2), np.float32)
    m[0, :] = 0.0
    m[-1, :] = 0.0
    acc = jnp.asarray(m)
    modes = (("zero", "zero"), ("circular", "circular"))
    dx = (1.0, 0.5)
    _disable_m(monkeypatch)
    ref = fv.fv_gradient(p, dx, modes, acc)
    cts = tuple(
        jax.random.normal(jax.random.PRNGKey(21 + i), c.shape, jnp.float32)
        for i, c in enumerate(ref.components)
    )

    def loss(p_):
        g = fv.fv_gradient(p_, dx, modes, acc)
        return sum(jnp.sum(c * w) for c, w in zip(g.components, cts))

    g_ref = jax.grad(loss)(p)
    _force_m(monkeypatch)
    out = fv.fv_gradient(p, dx, modes, acc)
    for a, b in zip(out.components, ref.components):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    g_out = jax.grad(loss)(p)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref), atol=1e-5)


@pytest.mark.parametrize("bz", [1, 2, 3, 6])
def test_div3_grad3_zblock_match_xla(bz, monkeypatch):
    """The bz-plane z-block grid (r4: MB-class DMA blocks at 256^3) must be
    bit-identical to XLA for every divisor block size, fwd and VJP."""
    field = _rand_field(jax.random.PRNGKey(7))
    p = jax.random.normal(jax.random.PRNGKey(8), _SHAPE, jnp.float32)
    _disable(monkeypatch)
    ref_div = fv.fv_divergence(field, _DX)
    modes = tuple(("circular", "circular") for _ in range(3))
    ref_grad = fv.fv_gradient(p, _DX, modes)
    ct = jax.random.normal(jax.random.PRNGKey(9), _SHAPE, jnp.float32)
    _, vjp_div_ref = jax.vjp(lambda f: fv.fv_divergence(f, _DX), field)
    (ref_div_ct,) = vjp_div_ref(ct)

    _force(monkeypatch)
    monkeypatch.setattr(pallas_fv, "_fv_bz", lambda nz, pb: bz)
    got_div = fv.fv_divergence(field, _DX)
    got_grad = fv.fv_gradient(p, _DX, modes)
    _, vjp_div = jax.vjp(lambda f: fv.fv_divergence(f, _DX), field)
    (got_div_ct,) = vjp_div(ct)
    np.testing.assert_allclose(np.asarray(got_div), np.asarray(ref_div),
                               atol=1e-5)
    for a, b in zip(got_grad.components, ref_grad.components):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(got_div_ct.components, ref_div_ct.components):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
