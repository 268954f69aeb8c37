"""Pallas stencil kernel vs the XLA roll formulation (interpret mode on CPU;
the compiled path is exercised on real TPU runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpiso_tpu.ops import pallas_stencil


@pytest.mark.parametrize("transpose", [False, True])
def test_fused_matvec_matches_rolls(transpose, monkeypatch):
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
    except Exception:
        pytest.skip("pallas unavailable")

    rng = np.random.RandomState(0)
    n = 32
    c, ly, hy, lx, hx, x = (
        jnp.asarray(rng.randn(n, n), jnp.float32) for _ in range(6)
    )

    def reference(c, lo, hi, x):
        if not transpose:
            return (
                c * x
                + lo[0] * jnp.roll(x, 1, 0)
                + hi[0] * jnp.roll(x, -1, 0)
                + lo[1] * jnp.roll(x, 1, 1)
                + hi[1] * jnp.roll(x, -1, 1)
            )
        return (
            c * x
            + jnp.roll(lo[0] * x, -1, 0)
            + jnp.roll(hi[0] * x, 1, 0)
            + jnp.roll(lo[1] * x, -1, 1)
            + jnp.roll(hi[1] * x, 1, 1)
        )

    kernel = (
        pallas_stencil._stencil_kernel_T if transpose else pallas_stencil._stencil_kernel
    )
    # interpret mode works on CPU; swap pltpu.roll for jnp.roll there
    monkeypatch.setattr(pallas_stencil, "_roll", lambda a, s, ax: jnp.roll(a, s, ax))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=True,
    )(c, ly, hy, lx, hx, x)
    expected = reference(c, (ly, lx), (hy, hx), x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), rtol=1e-5, atol=1e-6
    )


def test_fused_matvec_custom_vjp_math(monkeypatch):
    """Validate the hand-written VJP of the fused matvec against autodiff of
    the roll formulation (the pallas kernel itself swapped for rolls)."""

    def roll_impl(c, ly, hy, lx, hx, x, transpose):
        if not transpose:
            return (
                c * x
                + ly * jnp.roll(x, 1, 0)
                + hy * jnp.roll(x, -1, 0)
                + lx * jnp.roll(x, 1, 1)
                + hx * jnp.roll(x, -1, 1)
            )
        return (
            c * x
            + jnp.roll(ly * x, -1, 0)
            + jnp.roll(hy * x, 1, 0)
            + jnp.roll(lx * x, -1, 1)
            + jnp.roll(hx * x, 1, 1)
        )

    monkeypatch.setattr(pallas_stencil, "_pallas_matvec", roll_impl)
    rng = np.random.RandomState(1)
    args = tuple(jnp.asarray(rng.randn(6, 8), jnp.float32) for _ in range(6))
    g = jnp.asarray(rng.randn(6, 8), jnp.float32)

    for transpose in (False, True):
        def f_custom(*a):
            return jnp.sum(g * pallas_stencil._fused_matvec(*a, transpose=transpose))

        def f_plain(*a):
            return jnp.sum(g * roll_impl(*a, transpose))

        g_custom = jax.grad(f_custom, argnums=tuple(range(6)))(*args)
        g_plain = jax.grad(f_plain, argnums=tuple(range(6)))(*args)
        for a, b in zip(g_custom, g_plain):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_eligibility_gating():
    assert not pallas_stencil.pallas_eligible((512, 512), jnp.float64)
    # on CPU the backend gate keeps it off regardless of size
    if jax.default_backend() != "tpu":
        assert not pallas_stencil.pallas_eligible((256, 256), jnp.float32)
    # large tileable planes go through the row-tiled path (VMEM holds tiles,
    # not the plane); odd row counts can't tile and must fit one VMEM block
    assert pallas_stencil._pick_tile(4096) == 128
    assert pallas_stencil._pick_tile(513) is None
    # advisor r2 (medium): wide planes must shrink the tile until the ~8
    # double-buffered (tile, nx) blocks fit VMEM, or go ineligible — a
    # 128-row tile at nx=4096 f32 is ~29 MiB of pipeline working set and
    # would fail Mosaic compilation instead of falling back
    assert pallas_stencil._pick_tile(4096, 4096, 4, planes=8) == 32
    assert pallas_stencil._pick_tile(4096, 65536, 4, planes=8) is None
    if jax.default_backend() == "tpu":
        assert pallas_stencil.pallas_eligible((4096, 4096), jnp.float32)
        assert not pallas_stencil.pallas_eligible((4096, 65536), jnp.float32)


def test_no_pallas_context_gates_all_dispatch(monkeypatch):
    """no_pallas() must turn off every pallas dispatch site at trace time —
    sharded jits rely on it (GSPMD can't partition pallas_call)."""
    from diffpiso_tpu.ops import pallas_assembly
    from diffpiso_tpu.solvers import pallas_krylov

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert pallas_stencil.pallas_eligible((256, 256), jnp.float32)
    assert pallas_krylov.eligible((256, 256), jnp.float32)
    assert pallas_assembly.assembly_eligible((256, 256), 2, jnp.float32)
    with pallas_stencil.no_pallas():
        assert not pallas_stencil.pallas_eligible((256, 256), jnp.float32)
        assert not pallas_krylov.eligible((256, 256), jnp.float32)
        assert not pallas_assembly.assembly_eligible((256, 256), 2, jnp.float32)
    assert pallas_stencil.pallas_eligible((256, 256), jnp.float32)


@pytest.mark.parametrize("transpose", [False, True])
@pytest.mark.parametrize("shape", [(64, 48), (128, 32)])
def test_tiled_matvec_matches_rolls(transpose, shape, monkeypatch):
    """The row-tiled halo kernel (grid over row blocks, 8-row wrap slivers
    via modular index maps) must reproduce the XLA roll formulation exactly,
    including the periodic wrap across tile boundaries."""
    try:
        from jax.experimental import pallas as pl  # noqa: F401
    except Exception:
        pytest.skip("pallas unavailable")

    monkeypatch.setattr(pallas_stencil, "_INTERPRET", True)
    monkeypatch.setattr(pallas_stencil, "_roll", lambda a, s, ax: jnp.roll(a, s, ax))
    rng = np.random.RandomState(3)
    ny, nx = shape
    c, ly, hy, lx, hx, x = (
        jnp.asarray(rng.randn(ny, nx), jnp.float32) for _ in range(6)
    )
    tile = pallas_stencil._pick_tile(ny)
    assert tile is not None and tile < ny
    out = pallas_stencil._pallas_matvec_tiled(c, ly, hy, lx, hx, x, transpose, tile)
    if not transpose:
        expected = (
            c * x
            + ly * jnp.roll(x, 1, 0)
            + hy * jnp.roll(x, -1, 0)
            + lx * jnp.roll(x, 1, 1)
            + hx * jnp.roll(x, -1, 1)
        )
    else:
        expected = (
            c * x
            + jnp.roll(ly * x, -1, 0)
            + jnp.roll(hy * x, 1, 0)
            + jnp.roll(lx * x, -1, 1)
            + jnp.roll(hx * x, 1, 1)
        )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("transpose", [False, True])
@pytest.mark.parametrize("negate", [False, True])
@pytest.mark.parametrize("shape", [(24, 40), (64, 48)])
def test_fused_residual_matches_rolls(transpose, negate, shape, monkeypatch):
    """fused_stencil_residual (mono and tiled variants) must equal
    b -/+ S x with the jnp roll formulation, plus the exact max|r|."""
    try:
        from jax.experimental import pallas as pl  # noqa: F401
    except Exception:
        pytest.skip("pallas unavailable")

    monkeypatch.setattr(pallas_stencil, "_INTERPRET", True)
    monkeypatch.setattr(pallas_stencil, "_roll", lambda a, s, ax: jnp.roll(a, s, ax))
    rng = np.random.RandomState(5)
    ny, nx = shape
    c, ly, hy, lx, hx, b, x = (
        jnp.asarray(rng.randn(ny, nx), jnp.float32) for _ in range(7)
    )
    # production dispatch only tiles above 256 KiB, so exercise the tiled
    # variant directly for the larger case and the mono path for the smaller
    r, n = pallas_stencil.fused_stencil_residual(
        c, (ly, lx), (hy, hx), b, x, negate=negate, transpose=transpose
    ) if shape != (64, 48) else _tiled_residual_direct(
        c, ly, hy, lx, hx, b, x, negate, transpose
    )
    if not transpose:
        m = (
            c * x
            + ly * jnp.roll(x, 1, 0)
            + hy * jnp.roll(x, -1, 0)
            + lx * jnp.roll(x, 1, 1)
            + hx * jnp.roll(x, -1, 1)
        )
    else:
        m = (
            c * x
            + jnp.roll(ly * x, -1, 0)
            + jnp.roll(hy * x, 1, 0)
            + jnp.roll(lx * x, -1, 1)
            + jnp.roll(hx * x, 1, 1)
        )
    want = b + m if negate else b - m
    np.testing.assert_allclose(np.asarray(r), np.asarray(want), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        float(n), float(jnp.max(jnp.abs(want))), rtol=1e-5
    )


def _tiled_residual_direct(c, ly, hy, lx, hx, b, x, negate, transpose):
    """Invoke the tiled residual kernel directly (the production dispatch
    picks it only above the 256 KiB threshold)."""
    import jax as _jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ny, nx = x.shape
    tile = 32
    n_tiles = ny // tile
    nb8 = ny // 8
    tpb = tile // 8
    tile_spec = pl.BlockSpec((tile, nx), lambda i: (i, 0))
    up_spec = pl.BlockSpec((8, nx), lambda i: ((i * tpb - 1) % nb8, 0))
    dn_spec = pl.BlockSpec((8, nx), lambda i: (((i + 1) * tpb) % nb8, 0))
    r, n = pl.pallas_call(
        pallas_stencil._mk_residual_kernel_tiled(transpose, negate),
        grid=(n_tiles,),
        in_specs=[tile_spec] * 7 + [up_spec, dn_spec, up_spec, dn_spec],
        out_specs=[
            tile_spec,
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            _jax.ShapeDtypeStruct(x.shape, x.dtype),
            _jax.ShapeDtypeStruct((1, 1), x.dtype),
        ],
        interpret=True,
    )(c, ly, hy, lx, hx, b, x, x, x, hy, ly)
    return r, n[0, 0]


@pytest.mark.parametrize("transpose", [False, True])
def test_3d_matvec_matches_rolls(transpose, monkeypatch):
    """The z-plane-gridded 7-point kernel must reproduce the jnp roll
    formulation exactly, including the z wrap across the plane grid."""
    try:
        from jax.experimental import pallas as pl  # noqa: F401
    except Exception:
        pytest.skip("pallas unavailable")
    monkeypatch.setattr(pallas_stencil, "_INTERPRET", True)
    monkeypatch.setattr(pallas_stencil, "_roll", lambda a, s, ax: jnp.roll(a, s, ax))
    rng = np.random.RandomState(5)
    shape = (6, 16, 128)
    c, lz, hz, ly, hy, lx, hx, x = (
        jnp.asarray(rng.randn(*shape), jnp.float32) for _ in range(8)
    )
    out = pallas_stencil._pallas_matvec_3d(c, lz, hz, ly, hy, lx, hx, x, transpose)
    if not transpose:
        want = (
            c * x
            + lz * jnp.roll(x, 1, 0) + hz * jnp.roll(x, -1, 0)
            + ly * jnp.roll(x, 1, 1) + hy * jnp.roll(x, -1, 1)
            + lx * jnp.roll(x, 1, 2) + hx * jnp.roll(x, -1, 2)
        )
    else:
        want = (
            c * x
            + jnp.roll(lz * x, -1, 0) + jnp.roll(hz * x, 1, 0)
            + jnp.roll(ly * x, -1, 1) + jnp.roll(hy * x, 1, 1)
            + jnp.roll(lx * x, -1, 2) + jnp.roll(hx * x, 1, 2)
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6,
                               atol=1e-6)


def test_3d_matvec_custom_vjp_matches_autodiff(monkeypatch):
    try:
        from jax.experimental import pallas as pl  # noqa: F401
    except Exception:
        pytest.skip("pallas unavailable")
    monkeypatch.setattr(pallas_stencil, "_INTERPRET", True)
    monkeypatch.setattr(pallas_stencil, "_roll", lambda a, s, ax: jnp.roll(a, s, ax))
    rng = np.random.RandomState(6)
    shape = (4, 8, 128)
    args = tuple(jnp.asarray(rng.randn(*shape), jnp.float32) for _ in range(8))
    g = jnp.asarray(rng.randn(*shape), jnp.float32)

    def f_fused(*a):
        return jnp.sum(g * pallas_stencil._fused_matvec3d(*a))

    def f_plain(c, lz, hz, ly, hy, lx, hx, x):
        z = (c * x
             + lz * jnp.roll(x, 1, 0) + hz * jnp.roll(x, -1, 0)
             + ly * jnp.roll(x, 1, 1) + hy * jnp.roll(x, -1, 1)
             + lx * jnp.roll(x, 1, 2) + hx * jnp.roll(x, -1, 2))
        return jnp.sum(g * z)

    g_fused = jax.grad(f_fused, argnums=tuple(range(8)))(*args)
    g_plain = jax.grad(f_plain, argnums=tuple(range(8)))(*args)
    for a, b in zip(g_fused, g_plain):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_3d_eligibility():
    assert not pallas_stencil.pallas_eligible((128, 128, 128), jnp.float64)
    if jax.default_backend() == "tpu":
        assert pallas_stencil.pallas_eligible((128, 128, 128), jnp.float32)
        assert pallas_stencil.pallas_eligible((256, 256, 256), jnp.float32)
        # plane too large for the per-program VMEM working set
        assert not pallas_stencil.pallas_eligible((8, 2048, 2048), jnp.float32)
        # unaligned in-plane dims stay on XLA
        assert not pallas_stencil.pallas_eligible((64, 60, 128), jnp.float32)
