import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpiso_tpu import Box, Domain, OPEN, CLOSED, PERIODIC, StaggeredField


def test_staggered_shapes():
    f = StaggeredField.zeros((4, 6))
    assert f.components[0].shape == (5, 6)  # v
    assert f.components[1].shape == (4, 7)  # u
    assert f.resolution == (4, 6)


def test_staggered_tensor_roundtrip():
    rng = np.random.RandomState(0)
    v = rng.randn(5, 6).astype(np.float32)
    u = rng.randn(4, 7).astype(np.float32)
    f = StaggeredField((jnp.asarray(v), jnp.asarray(u)))
    t = f.staggered_tensor()
    assert t.shape == (5, 7, 2)
    f2 = StaggeredField.from_staggered_tensor(t)
    np.testing.assert_array_equal(np.asarray(f2.components[0]), v)
    np.testing.assert_array_equal(np.asarray(f2.components[1]), u)
    # padding entries are zero
    assert np.all(np.asarray(t)[:, -1, 0] == 0)
    assert np.all(np.asarray(t)[-1, :, 1] == 0)


def test_at_centers():
    u = jnp.asarray(np.arange(4 * 7, dtype=np.float32).reshape(4, 7))
    v = jnp.zeros((5, 6), jnp.float32)
    f = StaggeredField((v, u))
    c = f.at_centers()
    assert c.shape == (4, 6, 2)
    np.testing.assert_allclose(
        np.asarray(c[..., 1]), 0.5 * (np.asarray(u)[:, 1:] + np.asarray(u)[:, :-1])
    )


def test_flatten_roundtrip_x_first():
    rng = np.random.RandomState(1)
    f = StaggeredField(
        (jnp.asarray(rng.randn(5, 6), jnp.float32), jnp.asarray(rng.randn(4, 7), jnp.float32))
    )
    flat = f.flatten(x_first=True)
    assert flat.shape == (5 * 6 + 4 * 7,)
    # u block first (coord_flip=True ordering of the reference)
    np.testing.assert_array_equal(
        np.asarray(flat[: 4 * 7]).reshape(4, 7), np.asarray(f.components[1])
    )
    f2 = StaggeredField.unflatten(flat, (4, 6), x_first=True)
    for a, b in zip(f.components, f2.components):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_field_is_pytree():
    f = StaggeredField.zeros((4, 6))
    doubled = jax.tree_util.tree_map(lambda x: 2 * x, f)
    assert isinstance(doubled, StaggeredField)
    g = jax.jit(lambda x: x + x)(f)
    assert isinstance(g, StaggeredField)


def test_domain_basics():
    d = Domain((4, 8), Box.from_size((1.0, 2.0)), boundaries=OPEN)
    assert d.dx == (0.25, 0.25)
    assert d.periodic == (False, False)
    assert d.staggered_component_shape(1) == (4, 9)
    vel = d.staggered_grid(1.0)
    assert float(vel.components[0][0, 0]) == 1.0


def test_domain_mixed_boundaries():
    d = Domain((4, 8), boundaries=((OPEN, OPEN), (OPEN, CLOSED)))
    modes = d.pressure_pad_modes()
    assert modes[0] == ("replicate", "replicate")
    assert modes[1] == ("replicate", "zero")
    with pytest.raises(AssertionError):
        Domain((4, 4), boundaries=((PERIODIC, OPEN), (OPEN, OPEN)))


def test_analytic_constant_sampled_fields():
    import jax.numpy as jnp
    import numpy as np

    from diffpiso_tpu.fields.analytic import AnalyticField, ConstantField, SampledField
    from diffpiso_tpu.fields.box import Box

    # analytic: f(y, x) = y + 2x on a 4x4 grid over [0,1)^2
    f = AnalyticField(lambda pts: pts[..., 0] + 2 * pts[..., 1])
    grid = f.at_grid((4, 4), Box.from_size((1.0, 1.0)))
    np.testing.assert_allclose(float(grid[0, 0]), 0.125 + 0.25, atol=1e-6)
    np.testing.assert_allclose(float(grid[3, 1]), 0.875 + 0.75, atol=1e-6)

    c = ConstantField(2.5)
    np.testing.assert_allclose(np.asarray(c.at_grid((3, 5))), 2.5)

    # sampled: one unit sample at a cell center rasterizes to exactly that cell
    s = SampledField(points=jnp.asarray([[0.375, 0.625]]), values=jnp.asarray([1.0]))
    r = np.asarray(s.rasterize((4, 4), Box.from_size((1.0, 1.0))))
    assert r[1, 2] == 1.0 and r.sum() == 1.0
    # off-center sample conserves mass across neighbors
    s2 = SampledField(points=jnp.asarray([[0.5, 0.5]]), values=jnp.asarray([2.0]))
    r2 = np.asarray(s2.rasterize((4, 4), Box.from_size((1.0, 1.0))))
    np.testing.assert_allclose(r2.sum(), 2.0, rtol=1e-6)
    # interpolation back at the sample point recovers the value
    v = float(s.sample_at(jnp.asarray([0.375, 0.625])))
    np.testing.assert_allclose(v, 1.0, atol=1e-2)
