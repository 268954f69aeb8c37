"""Tests for semi-Lagrangian advection, spectral projection, and the Chorin
incompressible-flow step (PhiFlow-capability parity layer)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffpiso_tpu import Box, Domain, PERIODIC, StaggeredField
from diffpiso_tpu.core.chorin import FlowState, divergence_free, incompressible_flow_step
from diffpiso_tpu.ops import fv_divergence
from diffpiso_tpu.ops.advect import advect_centered, advect_semi_lagrangian, sample_bilinear
from diffpiso_tpu.solvers.fourier import FourierPressureSolver, fourier_poisson


def periodic_domain(n=32, size=None):
    return Domain((n, n), Box.from_size(size or (float(n), float(n))), boundaries=PERIODIC)


def test_sample_bilinear_identity_and_shift():
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(8, 10), jnp.float32)
    jj, ii = jnp.meshgrid(jnp.arange(8.0), jnp.arange(10.0), indexing="ij")
    out = sample_bilinear(data, jj, ii)
    np.testing.assert_allclose(np.asarray(out), np.asarray(data), rtol=1e-6)
    # half-cell shift = average of neighbors
    out2 = sample_bilinear(data, jj, ii + 0.5, periodic=(False, True))
    expected = 0.5 * (np.asarray(data) + np.roll(np.asarray(data), -1, 1))
    np.testing.assert_allclose(np.asarray(out2), expected, rtol=1e-5)


def test_advect_centered_uniform_translation():
    dom = periodic_domain(32)
    rng = np.random.RandomState(1)
    data = jnp.asarray(rng.randn(32, 32), jnp.float32)
    vel = StaggeredField(
        (jnp.zeros((32, 32)), jnp.ones((32, 32))), periodic=(True, True)
    )  # u = 1
    # dt = 1 cell: the field translates one cell in +x
    out = advect_centered(data, vel, 1.0, dom.dx)
    np.testing.assert_allclose(
        np.asarray(out), np.roll(np.asarray(data), 1, axis=1), rtol=1e-4, atol=1e-5
    )


def test_advect_staggered_uniform_flow_is_invariant():
    dom = periodic_domain(16)
    vel = StaggeredField(
        (0.3 * jnp.ones((16, 16)), 0.7 * jnp.ones((16, 16))), periodic=(True, True)
    )
    out = advect_semi_lagrangian(vel, vel, 0.5, dom.dx)
    np.testing.assert_allclose(np.asarray(out.components[0]), 0.3, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.components[1]), 0.7, rtol=1e-5)


def test_fourier_poisson_inverts_laplacian():
    dom = periodic_domain(32, (2 * np.pi, 2 * np.pi))
    xs = (np.arange(32) + 0.5) * dom.dx[1]
    p_true = np.sin(3 * xs)[None, :] * np.ones((32, 1))
    lap = -9 * p_true  # continuous laplacian of sin(3x)
    p = fourier_poisson(jnp.asarray(lap, jnp.float32), dom.dx)
    corr = np.corrcoef(np.asarray(p).ravel(), p_true.ravel())[0, 1]
    assert corr > 0.999


def test_divergence_free_projection_periodic():
    dom = periodic_domain(64, (2 * np.pi, 2 * np.pi))
    rng = np.random.RandomState(2)
    vel = StaggeredField(
        (
            jnp.asarray(rng.randn(64, 64), jnp.float32),
            jnp.asarray(rng.randn(64, 64), jnp.float32),
        ),
        periodic=(True, True),
    )
    projected, q = divergence_free(vel, dom)
    div = np.asarray(fv_divergence(projected, dom.dx))
    assert np.abs(div).max() < 1e-4  # machine-precision class for f32


def test_incompressible_flow_step_runs_and_projects():
    dom = periodic_domain(32, (2 * np.pi, 2 * np.pi))
    rng = np.random.RandomState(3)
    vel = StaggeredField(
        (
            jnp.asarray(0.5 * rng.randn(32, 32), jnp.float32),
            jnp.asarray(0.5 * rng.randn(32, 32), jnp.float32),
        ),
        periodic=(True, True),
    )
    density = jnp.asarray(rng.rand(32, 32), jnp.float32)
    state = FlowState(velocity=vel, density=density)
    state = jax.jit(
        lambda s: incompressible_flow_step(s, dom, 0.1, buoyancy_factor=0.1)
    )(state)
    div = np.asarray(fv_divergence(state.velocity, dom.dx))
    assert np.abs(div).max() < 1e-4
    assert bool(jnp.all(jnp.isfinite(state.density)))


def test_divergence_free_projection_bounded():
    dom = Domain((16, 16))
    rng = np.random.RandomState(4)
    vel = StaggeredField(
        (
            jnp.asarray(rng.randn(17, 16), jnp.float32),
            jnp.asarray(rng.randn(16, 17), jnp.float32),
        )
    )
    projected, q = divergence_free(vel, dom, tol=1e-6)
    div = np.asarray(fv_divergence(projected, dom.dx))
    # interior divergence at solver tolerance
    assert np.abs(div[1:-1, 1:-1]).max() < 1e-3


def test_divergence_free_projection_bounded_3d():
    # N-d generalization of divergence_free (bounded CG branch)
    dom = Domain((8, 8, 8))
    rng = np.random.RandomState(5)
    vel = StaggeredField(
        (
            jnp.asarray(rng.randn(9, 8, 8), jnp.float32),
            jnp.asarray(rng.randn(8, 9, 8), jnp.float32),
            jnp.asarray(rng.randn(8, 8, 9), jnp.float32),
        )
    )
    projected, q = divergence_free(vel, dom, tol=1e-6)
    div = np.asarray(fv_divergence(projected, dom.dx))
    assert np.abs(div[1:-1, 1:-1, 1:-1]).max() < 1e-3


def test_incompressible_flow_step_3d_periodic():
    # N-d advection + spectral projection through the full Chorin step
    from diffpiso_tpu.fields import PERIODIC

    dom = Domain((12, 12, 12), boundaries=PERIODIC)
    rng = np.random.RandomState(6)
    vel = StaggeredField(
        tuple(
            jnp.asarray(0.3 * rng.randn(12, 12, 12), jnp.float32)
            for _ in range(3)
        ),
        periodic=(True, True, True),
    )
    density = jnp.asarray(rng.rand(12, 12, 12), jnp.float32)
    state = FlowState(velocity=vel, density=density)
    state = jax.jit(
        lambda s: incompressible_flow_step(s, dom, 0.1, buoyancy_factor=0.1)
    )(state)
    div = np.asarray(fv_divergence(state.velocity, dom.dx))
    assert np.abs(div).max() < 1e-4
    assert bool(jnp.all(jnp.isfinite(state.density)))


def test_advect_centered_3d_uniform_translation():
    # a blob advected by uniform velocity moves by v*dt (periodic wrap)
    n = 16
    rng = np.random.RandomState(7)
    blob = np.zeros((n, n, n), np.float32)
    blob[4:7, 5:8, 6:9] = rng.rand(3, 3, 3)
    vel = StaggeredField(
        (
            jnp.full((n, n, n), 2.0, jnp.float32),
            jnp.full((n, n, n), -1.0, jnp.float32),
            jnp.full((n, n, n), 3.0, jnp.float32),
        ),
        periodic=(True, True, True),
    )
    out = advect_centered(jnp.asarray(blob), vel, 1.0, (1.0, 1.0, 1.0))
    expected = np.roll(blob, (2, -1, 3), axis=(0, 1, 2))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)
