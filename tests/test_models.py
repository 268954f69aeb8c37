import jax
import jax.numpy as jnp
import numpy as np

from diffpiso_tpu import StaggeredField
from diffpiso_tpu.models import (
    fullyconv_apply,
    init_fullyconv,
    smagorinsky_eddy_viscosity,
    strain_tensor_centered,
)
from diffpiso_tpu.models.networks import receptive_field_half_width


def test_network_shapes_and_param_count():
    params = init_fullyconv(jax.random.PRNGKey(0))
    assert len(params) == 7
    assert params[0].shape == (7, 7, 4, 16)
    assert params[-1].shape == (1, 1, 64, 2)
    x = jnp.ones((32, 40, 4), jnp.float32)
    y = fullyconv_apply(params, x, padding="SAME")
    assert y.shape == (32, 40, 2)


def test_network_valid_restore_shape():
    params = init_fullyconv(jax.random.PRNGKey(1))
    half = receptive_field_half_width()
    assert half == 3 + 2 + 2 + 1 + 1  # kernels 7/5/5/3/3/1/1
    x = jnp.ones((40, 40, 4), jnp.float32)
    y = fullyconv_apply(params, x, padding="VALID", restore_shape=True)
    assert y.shape == (40, 40, 2)
    # the restored border is zero
    assert float(jnp.abs(y[:half]).max()) == 0.0


def test_network_buffer_width_crop_and_pad():
    params = init_fullyconv(jax.random.PRNGKey(2))
    x = jnp.ones((32, 48, 4), jnp.float32)
    bw = ((2, 3), (4, 5))
    y = fullyconv_apply(params, x, padding="SAME", buffer_width=bw)
    assert y.shape == (32, 48, 2)
    assert float(jnp.abs(y[:2]).max()) == 0.0
    assert float(jnp.abs(y[:, :4]).max()) == 0.0
    assert float(jnp.abs(y[2:-3, 4:-5]).max()) > 0.0


def test_network_differentiable_batched():
    params = init_fullyconv(jax.random.PRNGKey(3))
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 4), jnp.float32)
    g = jax.grad(lambda p: jnp.sum(fullyconv_apply(p, x) ** 2))(params)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in g)


def test_smagorinsky_uniform_shear():
    # u = y, v = 0: S_xy = 0.5, S_xx = S_yy = 0 -> |S| = sqrt(2*2*0.25) = 1
    ny, nx = 16, 16
    dx = (1.0, 1.0)
    ys = (np.arange(ny) + 0.5)[:, None] * np.ones((1, nx + 1))
    u = jnp.asarray(ys, jnp.float32)
    v = jnp.zeros((ny + 1, nx), jnp.float32)
    vel = StaggeredField((v, u))
    s_yy, s_xy, _, s_xx = strain_tensor_centered(vel, dx)
    np.testing.assert_allclose(np.asarray(s_yy), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_xx), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_xy)[2:-2, 2:-2], 0.5, rtol=1e-5)
    nu_t = smagorinsky_eddy_viscosity(vel, 0.1, dx)
    np.testing.assert_allclose(np.asarray(nu_t)[2:-2, 2:-2], 0.1, rtol=1e-5)
