"""Tests for the spectral/multiscale math layer (parity with
PhiFlow/phi/math/nd.py extras, tested in PhiFlow/tests/test_math.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from diffpiso_tpu.ops.math_ext import (
    diffuse,
    downsample2x,
    fftfreq_grid,
    fourier_laplace,
    fourier_poisson,
    frequency_loss,
    get_dtype,
    interpolate_linear,
    l1_loss,
    l2_loss,
    laplace_centered,
    set_precision,
    upsample2x,
)


def test_fourier_laplace_eigenfunction():
    # sin(2 pi k x) is an eigenfunction with eigenvalue -(2 pi k / n)^2 * n^2...
    # in index units (cell size 1): lap sin(2 pi k i / n) = -(2 pi k / n)^2 sin
    n, k = 64, 3
    x = jnp.arange(n) / n
    u = jnp.sin(2 * jnp.pi * k * x)
    lap = fourier_laplace(u)
    want = -((2 * np.pi * k / n) ** 2) * np.sin(2 * np.pi * k * np.asarray(x))
    np.testing.assert_allclose(np.asarray(lap), want, atol=1e-6)


def test_fourier_poisson_inverts_laplace():
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.rand(16, 24).astype(np.float32))
    u = u - jnp.mean(u)
    v = fourier_poisson(fourier_laplace(u))
    np.testing.assert_allclose(np.asarray(v), np.asarray(u), atol=1e-4)


def test_laplace_centered_interior_matches_numpy():
    rng = np.random.RandomState(1)
    u = rng.rand(10, 12)
    lap = np.asarray(laplace_centered(jnp.asarray(u), dx=(0.5, 0.25)))
    want = (u[:-2, 1:-1] + u[2:, 1:-1] - 2 * u[1:-1, 1:-1]) / 0.25 + (
        u[1:-1, :-2] + u[1:-1, 2:] - 2 * u[1:-1, 1:-1]
    ) / 0.0625
    np.testing.assert_allclose(lap[1:-1, 1:-1], want, rtol=1e-5)


def test_diffuse_spectral_decay_rate():
    n, k = 64, 2
    x = jnp.arange(n) / n
    u = jnp.sin(2 * jnp.pi * k * x)
    amount = 0.7
    out = diffuse(u, amount, dx=1.0 / n, periodic=True)
    decay = np.exp(-((2 * np.pi * k) ** 2) * amount)
    np.testing.assert_allclose(np.asarray(out), decay * np.asarray(u), atol=1e-5)


def test_diffuse_explicit_matches_spectral_small_amount():
    # spectral uses exact Laplacian eigenvalues, explicit the discrete ones;
    # they agree only for smooth (well-resolved) data, so test on a single
    # low-frequency mode
    n = 32
    x = jnp.arange(n) / n
    u = jnp.sin(2 * jnp.pi * x)[:, None] * jnp.cos(2 * jnp.pi * x)[None, :]
    a = 1e-4 / n**2  # in physical units dx=1/n
    spec = diffuse(u, a, dx=1.0 / n, periodic=True)
    expl = diffuse(u, a, dx=1.0 / n, periodic=False, substeps=4)
    # interior only (explicit uses replicate padding at the boundary)
    np.testing.assert_allclose(
        np.asarray(spec)[2:-2, 2:-2], np.asarray(expl)[2:-2, 2:-2], atol=2e-5
    )


def test_down_up_sample_shapes_and_means():
    rng = np.random.RandomState(3)
    u = jnp.asarray(rng.rand(8, 16).astype(np.float32))
    d = downsample2x(u)
    assert d.shape == (4, 8)
    np.testing.assert_allclose(float(jnp.mean(d)), float(jnp.mean(u)), rtol=1e-6)
    up = upsample2x(d)
    assert up.shape == (8, 16)
    np.testing.assert_allclose(float(jnp.mean(up)), float(jnp.mean(d)), rtol=1e-5)
    # constant field is preserved exactly by both
    c = jnp.full((6, 4), 3.25)
    np.testing.assert_allclose(np.asarray(upsample2x(downsample2x(c))), 3.25)


def test_interpolate_linear_window():
    u = jnp.arange(12.0).reshape(3, 4)
    out = interpolate_linear(u, (0.5, 1.0), (2, 2))
    want = np.asarray([[3.0, 4.0], [7.0, 8.0]])
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)


def test_losses_finite_and_grad():
    u = jnp.asarray(np.random.RandomState(4).rand(4, 8).astype(np.float32))
    for fn in (l1_loss, l2_loss, frequency_loss):
        val = fn(u)
        assert np.isfinite(float(val))
        g = jax.grad(lambda x: fn(x))(u)
        assert np.isfinite(np.asarray(g)).all()


def test_set_precision():
    assert get_dtype() == jnp.float32
    with set_precision(16):
        assert get_dtype() == jnp.bfloat16
        with set_precision(64):
            assert get_dtype() == jnp.float64
        assert get_dtype() == jnp.bfloat16
    assert get_dtype() == jnp.float32
