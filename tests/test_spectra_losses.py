import jax
import jax.numpy as jnp
import numpy as np

from diffpiso_tpu import StaggeredField
from diffpiso_tpu.eval import ek_spectrum_2d, ek_spectrum_2d_np
from diffpiso_tpu.learning import (
    l2_field_loss,
    multistep_averaging_loss,
    spectral_energy_loss,
    strain_rate_loss,
)


def single_mode_centered(n=32, k=5):
    xs = np.arange(n) / n
    u = np.sin(2 * np.pi * k * xs)[None, :] * np.ones((n, 1))
    v = np.zeros((n, n))
    return jnp.asarray(np.stack([v, u], -1), jnp.float32)


def test_spectrum_peak_at_mode():
    vel = single_mode_centered(32, 5)
    e = np.asarray(ek_spectrum_2d(vel))
    assert e.shape == (16,)
    assert np.argmax(e) == 5
    # energy in the peak: |fft|^2 of sin has two peaks of (n^2/4)/... after
    # the normalization the shell holds 2 * (1/4) * 0.5 = 0.25
    np.testing.assert_allclose(e[5], 0.25, rtol=1e-4)


def test_spectrum_matches_numpy_reference():
    rng = np.random.RandomState(0)
    vel = jnp.asarray(rng.randn(24, 24, 2), jnp.float32)
    e_jax = np.asarray(ek_spectrum_2d(vel))
    k, e_np = ek_spectrum_2d_np(np.asarray(vel))
    np.testing.assert_allclose(e_jax, e_np, rtol=1e-4, atol=1e-9)


def rollout_pair(T=4, ny=8, nx=10, seed=0):
    rng = np.random.RandomState(seed)
    a = StaggeredField(
        (
            jnp.asarray(rng.randn(T, ny + 1, nx), jnp.float32),
            jnp.asarray(rng.randn(T, ny, nx + 1), jnp.float32),
        )
    )
    b = StaggeredField(
        (
            jnp.asarray(rng.randn(T, ny + 1, nx), jnp.float32),
            jnp.asarray(rng.randn(T, ny, nx + 1), jnp.float32),
        )
    )
    return a, b


def test_l2_loss_manual():
    a, b = rollout_pair()
    loss = np.asarray(l2_field_loss(a, b, loss_factor=2.0))
    assert loss.shape == (4,)
    # manual: 0.5 * sum of squared diffs over both components * 2.0
    for t in range(4):
        expected = 0.0
        for ca, cb in zip(a.components, b.components):
            expected += 0.5 * np.sum((np.asarray(ca[t]) - np.asarray(cb[t])) ** 2)
        np.testing.assert_allclose(loss[t], 2.0 * expected, rtol=1e-5)


def test_l2_loss_cropping():
    a, b = rollout_pair()
    full = l2_field_loss(a, b)
    cropped = l2_field_loss(a, b, buffer_width=((1, 1), (2, 2)))
    assert float(jnp.sum(cropped)) < float(jnp.sum(full))


def test_strain_loss_zero_for_identical():
    a, _ = rollout_pair()
    loss = np.asarray(strain_rate_loss(a, a, (0.5, 0.5)))
    np.testing.assert_allclose(loss, 0.0, atol=1e-5)
    _, b = rollout_pair(seed=1)
    assert np.all(np.asarray(strain_rate_loss(a, b, (0.5, 0.5))) > 0)


def test_spectral_loss_differentiable():
    ny = nx = 16
    T = 2
    rng = np.random.RandomState(2)
    a = StaggeredField(
        (
            jnp.asarray(rng.randn(T, ny + 1, nx), jnp.float32),
            jnp.asarray(rng.randn(T, ny, nx + 1), jnp.float32),
        )
    )
    b = StaggeredField(
        (
            jnp.asarray(rng.randn(T, ny + 1, nx), jnp.float32),
            jnp.asarray(rng.randn(T, ny, nx + 1), jnp.float32),
        )
    )

    def f(a):
        return jnp.sum(spectral_energy_loss(a, b))

    val = f(a)
    assert np.isfinite(float(val))
    g = jax.grad(f)(a)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree_util.tree_leaves(g))


def test_multistep_averaging_windows():
    T, ny, nx = 6, 5, 6
    rng = np.random.RandomState(3)
    a_v = rng.randn(T, ny + 1, nx).astype(np.float32)
    a_u = rng.randn(T, ny, nx + 1).astype(np.float32)
    b_v = rng.randn(T, ny + 1, nx).astype(np.float32)
    b_u = rng.randn(T, ny, nx + 1).astype(np.float32)
    a = StaggeredField((jnp.asarray(a_v), jnp.asarray(a_u)))
    b = StaggeredField((jnp.asarray(b_v), jnp.asarray(b_u)))
    win = 3
    loss = np.asarray(
        multistep_averaging_loss(a, b, loss_influence_range=win)
    )
    # manual sliding means (reference losses.py:129-143)
    def means(x):
        return np.stack([x[i : i + win].mean(0) for i in range(T - win + 1)])

    mu_u, mu_v = means(a_u), means(a_v)
    mu_u_gt, mu_v_gt = means(b_u), means(b_v)
    for i in range(T):
        j = min(max(i - win // 2, 0), T - win)
        expected = np.abs(mu_u[j] - mu_u_gt[j]).sum() + np.abs(mu_v[j] - mu_v_gt[j]).sum()
        np.testing.assert_allclose(loss[i], expected, rtol=1e-4)
