import jax
import jax.numpy as jnp
import numpy as np

from diffpiso_tpu import StaggeredField
from diffpiso_tpu.fields.material import REPLICATE, SYMMETRIC, ZERO
from diffpiso_tpu.ops import fv_divergence, fv_gradient, pad_staggered, vorticity
from diffpiso_tpu.ops.fv import centered_to_faces


def rand_field(ny, nx, seed=0, dtype=np.float32):
    rng = np.random.RandomState(seed)
    return StaggeredField(
        (
            jnp.asarray(rng.randn(ny + 1, nx), dtype),
            jnp.asarray(rng.randn(ny, nx + 1), dtype),
        )
    )


def test_divergence_manual():
    f = rand_field(3, 4)
    dx = (0.5, 0.5)
    div = np.asarray(fv_divergence(f, dx))
    v = np.asarray(f.components[0])
    u = np.asarray(f.components[1])
    expected = (v[1:, :] - v[:-1, :]) * 0.5 + (u[:, 1:] - u[:, :-1]) * 0.5
    np.testing.assert_allclose(div, expected, rtol=1e-6)


def test_divergence_adjoint_is_face_scatter():
    # The reference hand-codes the divergence adjoint
    # (piso_helpers.py:291-305); autodiff of our forward must agree:
    # d/d(comp_d) of sum(g * div) = -/+ g scattered onto faces.
    f = rand_field(3, 4, seed=2)
    dx = (0.25, 0.5)
    g = jnp.asarray(np.random.RandomState(3).randn(3, 4), jnp.float32)
    grads = jax.grad(lambda vf: jnp.sum(g * fv_divergence(vf, dx)))(f)
    gv = np.asarray(grads.components[0])
    gu = np.asarray(grads.components[1])
    gnp = np.asarray(g)
    dxprod = 0.125
    # v faces: -g below, +g above, scale prod(dx)/dy
    expected_v = np.zeros((4, 4))
    expected_v[:-1, :] += -gnp * dxprod / 0.25
    expected_v[1:, :] += gnp * dxprod / 0.25
    np.testing.assert_allclose(gv, expected_v, rtol=1e-5)
    expected_u = np.zeros((3, 5))
    expected_u[:, :-1] += -gnp * dxprod / 0.5
    expected_u[:, 1:] += gnp * dxprod / 0.5
    np.testing.assert_allclose(gu, expected_u, rtol=1e-5)


def test_gradient_zero_pad_values():
    p = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    dx = (1.0, 1.0)
    g = fv_gradient(p, dx, ZERO)
    gu = np.asarray(g.components[1])
    pn = np.asarray(p)
    # interior faces: p[i] - p[i-1]
    np.testing.assert_allclose(gu[:, 1:-1], pn[:, 1:] - pn[:, :-1])
    # boundary faces with zero pad: first = p[0] - 0, last = 0 - p[-1]
    np.testing.assert_allclose(gu[:, 0], pn[:, 0])
    np.testing.assert_allclose(gu[:, -1], -pn[:, -1])


def test_gradient_replicate_pad_boundary_zero():
    p = jnp.asarray(np.random.RandomState(0).randn(3, 4).astype(np.float32))
    g = fv_gradient(p, (1.0, 1.0), REPLICATE)
    gu = np.asarray(g.components[1])
    np.testing.assert_allclose(gu[:, 0], 0.0, atol=1e-7)
    np.testing.assert_allclose(gu[:, -1], 0.0, atol=1e-7)


def test_gradient_accessible_mask_zeroing():
    p = jnp.ones((3, 4), jnp.float32)
    acc = np.ones((5, 6), np.float32)
    acc[:, 0] = 0  # cells left of the domain inaccessible
    g = fv_gradient(p, (1.0, 1.0), ZERO, accessible_mask=jnp.asarray(acc))
    gu = np.asarray(g.components[1])
    np.testing.assert_allclose(gu[:, 0], 0.0)  # faces touching inaccessible cells


def test_pad_staggered_symmetric_shapes():
    f = rand_field(3, 4)
    padded = pad_staggered(f, SYMMETRIC, 1)
    assert padded[0].shape == (6, 6)
    assert padded[1].shape == (5, 7)
    # symmetric pad mirrors the edge value
    u = np.asarray(f.components[1])
    np.testing.assert_allclose(np.asarray(padded[1])[1:-1, 0], u[:, 0])


def test_pad_staggered_periodic_drops_duplicate():
    # periodic axis x: u has nx+1 faces with u[:, -1] a duplicate of u[:, 0]
    rng = np.random.RandomState(0)
    u = rng.randn(3, 5).astype(np.float32)
    u[:, -1] = u[:, 0]
    v = rng.randn(4, 4).astype(np.float32)
    f = StaggeredField((jnp.asarray(v), jnp.asarray(u)))
    modes = ((SYMMETRIC, SYMMETRIC), ("circular", "circular"))
    padded = pad_staggered(f, modes, 1)
    pu = np.asarray(padded[1])
    assert pu.shape == (5, 7)
    # wrap over unique faces: left pad = u[:, -2] (last unique face)
    np.testing.assert_allclose(pu[1:-1, 0], u[:, -2])
    np.testing.assert_allclose(pu[1:-1, -1], u[:, 1])


def test_centered_to_faces():
    p = jnp.asarray(np.arange(6, dtype=np.float32).reshape(2, 3))
    faces = centered_to_faces(p, 1)
    assert faces.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(faces)[:, 1:-1], 0.5 * (np.asarray(p)[:, 1:] + np.asarray(p)[:, :-1]))
    np.testing.assert_allclose(np.asarray(faces)[:, 0], np.asarray(p)[:, 0])


def test_vorticity_solid_rotation():
    # u = -y, v = x  =>  omega = dv/dx - du/dy = 2
    ny, nx = 16, 16
    dx = (1.0, 1.0)
    ys = (np.arange(ny) + 0.5)[:, None] * np.ones((1, nx + 1))
    xs = np.ones((ny + 1, 1)) * (np.arange(nx) + 0.5)[None, :]
    u = jnp.asarray(-ys, jnp.float32)
    v = jnp.asarray(xs, jnp.float32)
    w = np.asarray(vorticity(StaggeredField((v, u)), dx))
    np.testing.assert_allclose(w[2:-2, 2:-2], 2.0, rtol=1e-5)
