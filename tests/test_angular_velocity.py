"""AngularVelocity point-vortex field oracles.

Reference: PhiFlow/phi/physics/field/angular_velocity.py:14-43 (2-D curl
sampling, not-x-first branch), demos/vortex_fit.py:13-15 (gaussian
falloff). The key physical invariant — any radial falloff keeps the field
exactly divergence-free — is checked with autodiff (trace of the exact
Jacobian), not finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpiso_tpu.fields import AngularVelocity, gaussian_falloff
from diffpiso_tpu.ops.fv import fv_divergence


def test_single_vortex_hand_values():
    # unit-strength vortex at the origin, no falloff: v(y,x) = (x, -y)
    f = AngularVelocity(location=jnp.zeros((1, 2)), strength=2.0)
    v = f.sample_at(jnp.asarray([[1.0, 3.0], [0.5, -2.0]]))
    np.testing.assert_allclose(np.asarray(v), [[6.0, -2.0], [-4.0, -1.0]], atol=1e-6)


def test_superposition_matches_sum_of_singles():
    rng = np.random.default_rng(0)
    loc = jnp.asarray(rng.normal(size=(5, 2)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(5,)), jnp.float32)
    sig = jnp.asarray(rng.uniform(1.0, 2.0, size=(5,)), jnp.float32)
    pts = jnp.asarray(rng.normal(size=(7, 2)) * 3, jnp.float32)
    full = AngularVelocity(loc, s, falloff=gaussian_falloff(sig)).sample_at(pts)
    parts = sum(
        AngularVelocity(loc[i : i + 1], s[i : i + 1],
                        falloff=gaussian_falloff(sig[i : i + 1])).sample_at(pts)
        for i in range(5)
    )
    np.testing.assert_allclose(np.asarray(full), np.asarray(parts), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("use_falloff", [False, True])
def test_divergence_free_autodiff_2d(use_falloff):
    rng = np.random.default_rng(1)
    loc = jnp.asarray(rng.normal(size=(4, 2)) * 2, jnp.float64)
    s = jnp.asarray(rng.normal(size=(4,)), jnp.float64)
    falloff = gaussian_falloff(1.5) if use_falloff else None
    f = AngularVelocity(loc, s, falloff=falloff)
    pts = jnp.asarray(rng.normal(size=(20, 2)) * 3, jnp.float64)
    jac = jax.vmap(jax.jacfwd(f.sample_at))(pts)  # (20, 2, 2)
    div = jnp.trace(jac, axis1=-2, axis2=-1)
    assert float(jnp.max(jnp.abs(div))) < 1e-10


def test_divergence_free_autodiff_3d_vector_strength():
    rng = np.random.default_rng(2)
    loc = jnp.asarray(rng.normal(size=(3, 3)) * 2, jnp.float64)
    om = jnp.asarray(rng.normal(size=(3, 3)), jnp.float64)  # (z,y,x) spins
    f = AngularVelocity(loc, om, falloff=gaussian_falloff(2.0))
    pts = jnp.asarray(rng.normal(size=(10, 3)) * 3, jnp.float64)
    jac = jax.vmap(jax.jacfwd(f.sample_at))(pts)
    div = jnp.trace(jac, axis1=-2, axis2=-1)
    assert float(jnp.max(jnp.abs(div))) < 1e-10
    # scalar strength = spin about z: vz == 0, matches the explicit vector
    fz = AngularVelocity(loc, 0.7)
    fv = AngularVelocity(loc, jnp.stack([jnp.full((3,), 0.7), jnp.zeros(3), jnp.zeros(3)], -1))
    np.testing.assert_allclose(
        np.asarray(fz.sample_at(pts)), np.asarray(fv.sample_at(pts)), atol=1e-12
    )
    assert float(jnp.max(jnp.abs(fz.sample_at(pts)[..., 0]))) < 1e-12


def test_staggered_sampling_discrete_divergence():
    # the MAC-sampled field has small *discrete* divergence away from the
    # cores (exact field is div-free; discretization error is O(dx^2))
    f = AngularVelocity(
        jnp.asarray([[20.0, 12.0], [10.0, 22.0]]),
        jnp.asarray([1.0, -0.8]),
        falloff=gaussian_falloff(4.0),
    )
    vel = f.at_staggered((32, 32), periodic=(False, False))
    assert vel.components[0].shape == (33, 32)
    assert vel.components[1].shape == (32, 33)

    def far_div(res):
        # discrete divergence away from the 1/|r| cores (where the exact
        # field is smooth, the MAC divergence converges at O(dx^2))
        from diffpiso_tpu.fields import Box

        dx = 32.0 / res
        v = f.at_staggered((res, res), box=Box.from_size((32.0, 32.0)))
        d = fv_divergence(v, (dx, dx))
        jj, ii = np.meshgrid(
            (np.arange(res) + 0.5) * dx, (np.arange(res) + 0.5) * dx, indexing="ij"
        )
        far = np.ones((res, res), bool)
        for cy, cx in [(20.0, 12.0), (10.0, 22.0)]:
            far &= (jj - cy) ** 2 + (ii - cx) ** 2 > 6.0**2
        return float(np.max(np.abs(np.asarray(d))[far]))

    d32, d64 = far_div(32), far_div(64)
    assert d32 < 2e-3
    assert d64 < 0.5 * d32  # O(dx^2) convergence of the discrete divergence
    # periodic storage shape
    velp = f.at_staggered((32, 32), periodic=(True, True))
    assert velp.components[0].shape == (32, 32)
    assert velp.components[1].shape == (32, 32)
    # face samples agree with direct point evaluation (v-face at (y=j*dx, x=(i+.5)dx))
    pt = jnp.asarray([[3.0, 5.5]])
    np.testing.assert_allclose(
        float(vel.components[0][3, 5]), float(f.sample_at(pt)[0, 0]), rtol=1e-5
    )


def test_gradients_flow_to_parameters():
    # the vortex_fit workflow: loss differentiable in location/strength/sigma
    rng = np.random.default_rng(3)
    target = jnp.asarray(rng.normal(size=(16, 16, 2)), jnp.float32)

    def loss(loc, s, sig):
        v = AngularVelocity(loc, s, falloff=gaussian_falloff(sig)).at_grid((16, 16))
        return jnp.mean((v - target) ** 2)

    loc0 = jnp.asarray(rng.uniform(2, 14, size=(6, 2)), jnp.float32)
    s0 = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
    sig0 = jnp.full((6,), 3.0, jnp.float32)
    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(loc0, s0, sig0)
    for g in grads:
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.max(jnp.abs(g))) > 0.0
