"""Fused advection-assembly kernel (ops/pallas_advassembly.py) must equal
the jnp assembly (ops/stencil.py, itself oracle-tested against the scalar
CUDA-semantics loop in tests/test_stencil.py) on uniform-mask periodic
configurations — interpret mode, jnp.roll monkeypatch, the standard pallas
equality pattern (CLAUDE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpiso_tpu import StaggeredField
from diffpiso_tpu.ops import pallas_advassembly, stencil as stencil_mod
from diffpiso_tpu.fields.material import CIRCULAR


def _uniform_setup(ny, nx, seed=0):
    rng = np.random.RandomState(seed)
    vel = StaggeredField(
        (
            jnp.asarray(rng.randn(ny, nx), jnp.float32),
            jnp.asarray(rng.randn(ny, nx), jnp.float32),
        ),
        periodic=(True, True),
    )
    dm = StaggeredField(
        (jnp.zeros((ny, nx), bool), jnp.zeros((ny, nx), bool)),
        periodic=(True, True),
    )
    active = jnp.ones((ny + 2, nx + 2), jnp.float32)
    return vel, dm, active


@pytest.mark.parametrize("shape", [(32, 128), (64, 256)])
def test_fused_assembly_matches_jnp(shape, monkeypatch):
    try:
        from jax.experimental import pallas  # noqa: F401
    except Exception:
        pytest.skip("pallas unavailable")
    monkeypatch.setattr(pallas_advassembly, "_INTERPRET", True)
    import diffpiso_tpu.ops.pallas_stencil as ps

    ny, nx = shape
    vel, dm, active = _uniform_setup(ny, nx)
    dx = (0.7, 1.3)
    nu = 1e-3
    beta = 2.5

    ref = stencil_mod.assemble_advection_stencil.__wrapped__ if hasattr(
        stencil_mod.assemble_advection_stencil, "__wrapped__"
    ) else None
    # jnp reference: call with the pallas path gated off
    with ps.no_pallas():
        want = stencil_mod.assemble_advection_stencil(
            vel, dx, ((CIRCULAR, CIRCULAR), (CIRCULAR, CIRCULAR)), nu, beta,
            dm, active, active, None, (True, True),
        )

    # interpret-mode fused kernel (patch the in-core roll to jnp.roll so it
    # runs on CPU)
    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.setattr(
        pallas_advassembly, "pltpu",
        type("T", (), {"roll": staticmethod(lambda a, s, ax: jnp.roll(a, s, ax)),
                       "SMEM": pltpu.SMEM}),
    )
    centers, los, his, diag_As = pallas_advassembly.fused_advection_assembly(
        vel, dx, nu, beta
    )
    for c in range(2):
        np.testing.assert_allclose(
            np.asarray(centers[c]), np.asarray(want.center[c]), rtol=1e-6,
            atol=1e-6, err_msg=f"center[{c}]",
        )
        np.testing.assert_allclose(
            np.asarray(diag_As[c]), np.asarray(want.diag_A[c]), rtol=1e-6,
            atol=1e-6, err_msg=f"diag_A[{c}]",
        )
        for d in range(2):
            np.testing.assert_allclose(
                np.asarray(los[c][d]), np.asarray(want.lo[c][d]), rtol=1e-6,
                atol=1e-6, err_msg=f"lo[{c}][{d}]",
            )
            np.testing.assert_allclose(
                np.asarray(his[c][d]), np.asarray(want.hi[c][d]), rtol=1e-6,
                atol=1e-6, err_msg=f"hi[{c}][{d}]",
            )


def test_eligibility_gating():
    ny, nx = 64, 256
    vel, dm, active = _uniform_setup(ny, nx)
    elig = pallas_advassembly.advassembly_eligible
    args = (vel, dm, active, None, 1e-3, (True, True))
    if jax.default_backend() != "tpu":
        assert not elig(*args)
        return
    assert elig(*args)
    # any non-uniform mask disables the fast path
    dm_bad = StaggeredField(
        (jnp.zeros((ny, nx), bool).at[0, 0].set(True), dm.components[1]),
        periodic=(True, True),
    )
    assert not elig(vel, dm_bad, active, None, 1e-3, (True, True))
    act_bad = active.at[5, 5].set(0.0)
    assert not elig(vel, dm, act_bad, None, 1e-3, (True, True))
    ns = jnp.zeros((ny + 2, nx + 2), bool).at[1, 1].set(True)
    assert not elig(vel, dm, active, ns, 1e-3, (True, True))
    # bounded domains / per-face viscosity keep the jnp path
    assert not elig(vel, dm, active, None, 1e-3, (False, True))
    visc_field = StaggeredField(
        (jnp.ones((ny, nx)), jnp.ones((ny, nx))), periodic=(True, True)
    )
    assert not elig(vel, dm, active, None, visc_field, (True, True))


def test_zero_gradient_semantics(monkeypatch):
    """The fused assembly's VJP returns zero velocity cotangents — the
    reference's assembly gradient (piso_tf.py:116-128)."""
    try:
        from jax.experimental import pallas  # noqa: F401
    except Exception:
        pytest.skip("pallas unavailable")
    monkeypatch.setattr(pallas_advassembly, "_INTERPRET", True)
    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.setattr(
        pallas_advassembly, "pltpu",
        type("T", (), {"roll": staticmethod(lambda a, s, ax: jnp.roll(a, s, ax)),
                       "SMEM": pltpu.SMEM}),
    )
    ny, nx = 16, 128
    vel, dm, active = _uniform_setup(ny, nx)

    def f(v0):
        velx = StaggeredField((v0, vel.components[1]), periodic=(True, True))
        centers, *_ = pallas_advassembly.fused_advection_assembly(
            velx, (1.0, 1.0), 1e-3, 2.0
        )
        return jnp.sum(centers[0] ** 2)

    g = jax.grad(f)(vel.components[0])
    assert float(jnp.max(jnp.abs(g))) == 0.0


@pytest.mark.parametrize("shape", [(6, 16, 128), (4, 8, 128)])
def test_fused_assembly3_matches_jnp(shape, monkeypatch):
    """Rank-3 z-gridded assembly kernel == the jnp assembly on uniform-mask
    all-periodic configurations (incl. the z-wrap planes)."""
    try:
        from jax.experimental import pallas  # noqa: F401
    except Exception:
        pytest.skip("pallas unavailable")
    monkeypatch.setattr(pallas_advassembly, "_INTERPRET", True)
    monkeypatch.setattr(pallas_advassembly, "_rollp",
                        lambda x, s, ax: jnp.roll(x, s, ax))
    import diffpiso_tpu.ops.pallas_stencil as ps

    nz, ny, nx = shape
    rng = np.random.RandomState(3)
    vel = StaggeredField(
        tuple(jnp.asarray(rng.randn(nz, ny, nx), jnp.float32) for _ in range(3)),
        periodic=(True, True, True),
    )
    dm = StaggeredField(
        tuple(jnp.zeros((nz, ny, nx), bool) for _ in range(3)),
        periodic=(True, True, True),
    )
    active = jnp.ones((nz + 2, ny + 2, nx + 2), jnp.float32)
    dx = (0.7, 1.3, 0.9)
    nu = 2e-3
    beta = 1.7

    with ps.no_pallas():
        want = stencil_mod.assemble_advection_stencil(
            vel, dx, tuple(((CIRCULAR, CIRCULAR),) * 3), nu, beta,
            dm, active, active, None, (True, True, True),
        )

    centers, los, his, diag_As = pallas_advassembly.fused_advection_assembly_3d(
        vel, dx, nu, beta
    )
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(centers[c]), np.asarray(want.center[c]), rtol=1e-5,
            atol=1e-5, err_msg=f"center[{c}]",
        )
        np.testing.assert_allclose(
            np.asarray(diag_As[c]), np.asarray(want.diag_A[c]), rtol=1e-5,
            atol=1e-5, err_msg=f"diag_A[{c}]",
        )
        for d in range(3):
            np.testing.assert_allclose(
                np.asarray(los[c][d]), np.asarray(want.lo[c][d]), rtol=1e-5,
                atol=1e-5, err_msg=f"lo[{c}][{d}]",
            )
            np.testing.assert_allclose(
                np.asarray(his[c][d]), np.asarray(want.hi[c][d]), rtol=1e-5,
                atol=1e-5, err_msg=f"hi[{c}][{d}]",
            )


def test_fused_assembly3_zero_gradient(monkeypatch):
    monkeypatch.setattr(pallas_advassembly, "_INTERPRET", True)
    monkeypatch.setattr(pallas_advassembly, "_rollp",
                        lambda x, s, ax: jnp.roll(x, s, ax))
    nz, ny, nx = 4, 8, 128
    rng = np.random.RandomState(5)
    comps = tuple(
        jnp.asarray(rng.randn(nz, ny, nx), jnp.float32) for _ in range(3)
    )

    def f(w0):
        vel = StaggeredField((w0,) + comps[1:], periodic=(True, True, True))
        c, _, _, _ = pallas_advassembly.fused_advection_assembly_3d(
            vel, (1.0, 1.0, 1.0), 1e-3, 2.0
        )
        return sum(jnp.sum(ci) for ci in c)

    g = jax.grad(f)(comps[0])
    assert float(jnp.abs(g).max()) == 0.0  # reference zero-gradient semantics


def _interp_masked(monkeypatch):
    monkeypatch.setattr(pallas_advassembly, "_INTERPRET", True)
    monkeypatch.setenv("DIFFPISO_FUSED_ADVM", "auto")


def _assembled_pair(monkeypatch, vel, dx, pad_modes, nu, beta, dm, active,
                    accessible, no_slip, periodic):
    import diffpiso_tpu.ops.pallas_stencil as ps

    with ps.no_pallas():
        want = stencil_mod.assemble_advection_stencil(
            vel, dx, pad_modes, nu, beta, dm, active, accessible, no_slip,
            periodic,
        )
    _interp_masked(monkeypatch)
    monkeypatch.setattr(
        pallas_advassembly, "advassembly_masked_eligible",
        lambda *a, **k: True,
    )
    got = stencil_mod.assemble_advection_stencil(
        vel, dx, pad_modes, nu, beta, dm, active, accessible, no_slip,
        periodic,
    )
    return want, got


def _assert_stencils_equal(want, got, rank=2):
    for c in range(rank):
        np.testing.assert_allclose(
            np.asarray(got.center[c]), np.asarray(want.center[c]),
            rtol=1e-6, atol=1e-6, err_msg=f"center[{c}]")
        np.testing.assert_allclose(
            np.asarray(got.diag_A[c]), np.asarray(want.diag_A[c]),
            rtol=1e-6, atol=1e-6, err_msg=f"diag_A[{c}]")
        for d in range(rank):
            np.testing.assert_allclose(
                np.asarray(got.lo[c][d]), np.asarray(want.lo[c][d]),
                rtol=1e-6, atol=1e-6, err_msg=f"lo[{c}][{d}]")
            np.testing.assert_allclose(
                np.asarray(got.hi[c][d]), np.asarray(want.hi[c][d]),
                rtol=1e-6, atol=1e-6, err_msg=f"hi[{c}][{d}]")


def test_masked_assembly_matches_jnp_cavity(monkeypatch):
    """The general-mask kernel == the jnp assembly on the REAL lid-driven
    cavity configuration (Dirichlet lid rows + no-slip walls + bounded
    faces) — the production bounded workload."""
    from diffpiso_tpu.core import lid_driven_cavity_masks
    from diffpiso_tpu.fields.domain import Domain
    from diffpiso_tpu.fields.box import Box
    from diffpiso_tpu.fields.material import OPEN

    n = 32
    dm, dv, active, accessible, no_slip = lid_driven_cavity_masks(n)
    domain = Domain((n + 1, n), Box.from_size((1.0 + 1.0 / n, 1.0)),
                    boundaries=OPEN)
    rng = np.random.RandomState(4)
    vel = StaggeredField(
        (jnp.asarray(rng.randn(n + 2, n), jnp.float32),
         jnp.asarray(rng.randn(n + 1, n + 1), jnp.float32)),
        periodic=(False, False),
    )
    want, got = _assembled_pair(
        monkeypatch, vel, domain.dx, domain.velocity_pad_modes(), 1e-3, 2.0,
        dm, active, accessible, no_slip, (False, False),
    )
    _assert_stencils_equal(want, got)


def test_masked_assembly_matches_jnp_channel(monkeypatch):
    """Mixed periodicity (channel: no-slip walls + periodic x)."""
    from diffpiso_tpu.core.masks import channel_masks
    from diffpiso_tpu.fields.domain import Domain
    from diffpiso_tpu.fields.box import Box
    from diffpiso_tpu.fields.material import CLOSED, PERIODIC

    ny, nx = 24, 48
    dm, dv, active, accessible, no_slip = channel_masks(ny, nx)
    domain = Domain((ny, nx), Box.from_size((float(ny), float(nx))),
                    boundaries=(CLOSED, PERIODIC))
    rng = np.random.RandomState(5)
    vel = StaggeredField(
        (jnp.asarray(rng.randn(ny + 1, nx), jnp.float32),
         jnp.asarray(rng.randn(ny, nx), jnp.float32)),
        periodic=(False, True),
    )
    want, got = _assembled_pair(
        monkeypatch, vel, domain.dx, domain.velocity_pad_modes(), 2e-3, 1.3,
        dm, active, accessible, no_slip, (False, True),
    )
    _assert_stencils_equal(want, got)


def test_masked_assembly_zero_gradient(monkeypatch):
    _interp_masked(monkeypatch)
    from diffpiso_tpu.core.masks import channel_masks
    from diffpiso_tpu.fields.domain import Domain
    from diffpiso_tpu.fields.box import Box
    from diffpiso_tpu.fields.material import CLOSED, PERIODIC

    ny, nx = 16, 32
    dm, dv, active, accessible, no_slip = channel_masks(ny, nx)
    domain = Domain((ny, nx), Box.from_size((float(ny), float(nx))),
                    boundaries=(CLOSED, PERIODIC))
    monkeypatch.setattr(
        pallas_advassembly, "advassembly_masked_eligible",
        lambda *a, **k: True,
    )
    rng = np.random.RandomState(6)
    v1 = jnp.asarray(rng.randn(ny, nx), jnp.float32)

    def f(v0):
        vel = StaggeredField((v0, v1), periodic=(False, True))
        st = stencil_mod.assemble_advection_stencil(
            vel, domain.dx, domain.velocity_pad_modes(), 2e-3, 1.3,
            dm, active, accessible, no_slip, (False, True),
        )
        return sum(jnp.sum(c) for c in st.center)

    g = jax.grad(f)(jnp.asarray(rng.randn(ny + 1, nx), jnp.float32))
    assert float(jnp.abs(g).max()) == 0.0
