"""Tests for geometries/masks, the Noise initializer, and the U-Net
(parity with PhiFlow/tests/test_geometry.py, test_initializers.py, and the
standard_networks u_net capability)."""

import numpy as np
import jax
import jax.numpy as jnp

from diffpiso_tpu.fields import (
    Box,
    BoxGeometry,
    RotatedBox,
    Sphere,
    cell_center_points,
    geometry_mask,
    noise,
    noise_staggered,
    rotated,
    union,
)
from diffpiso_tpu.models import init_unet, unet_apply, init_residual_block, residual_block


def test_sphere_inside_and_distance():
    s = Sphere(center=(2.0, 3.0), radius=1.5)
    pts = jnp.asarray([[2.0, 3.0], [2.0, 4.4], [2.0, 5.0], [0.0, 0.0]])
    inside = np.asarray(s.lies_inside(pts))
    assert inside.tolist() == [True, True, False, False]
    sd = np.asarray(s.approximate_signed_distance(pts))
    np.testing.assert_allclose(sd[0], -1.5, atol=1e-6)
    np.testing.assert_allclose(sd[2], 0.5, atol=1e-6)
    s2 = s.shifted((1.0, -1.0))
    assert s2.center == (3.0, 2.0)


def test_union_and_mask():
    g = union(Sphere((4.0, 4.0), 2.0), BoxGeometry(Box((10.0, 10.0), (14.0, 12.0))))
    mask = geometry_mask(g, (16, 16))
    m = np.asarray(mask)
    assert m[4, 4] == 1.0  # inside sphere
    assert m[12, 11] == 1.0  # inside box
    assert m[0, 15] == 0.0
    # antialiased mask is in [0,1] and matches hard mask away from interfaces
    aa = np.asarray(geometry_mask(g, (16, 16), antialias=True))
    assert (aa >= 0).all() and (aa <= 1).all()
    assert aa[4, 4] > 0.99 and aa[0, 15] < 0.01


def test_rotated_box_against_rotated_points():
    # oracle: a point is inside RotatedBox(angle) iff its inverse-rotated
    # image is inside the axis-aligned box
    rng = np.random.RandomState(0)
    center, half, angle = np.array([5.0, 7.0]), np.array([2.0, 4.0]), 0.7
    rb = RotatedBox(tuple(center), tuple(half), angle)
    pts = rng.uniform(0.0, 14.0, size=(200, 2)).astype(np.float32)
    c, s = np.cos(angle), np.sin(angle)
    d = pts - center
    local = np.stack([c * d[:, 0] + s * d[:, 1], -s * d[:, 0] + c * d[:, 1]], -1)
    expect = (np.abs(local) <= half + 1e-6).all(-1)
    got = np.asarray(rb.lies_inside(jnp.asarray(pts)))
    # exclude points within float tolerance of the boundary
    clear = (np.abs(np.abs(local) - half) > 1e-3).any(-1)
    assert (got[clear] == expect[clear]).all()
    # signed distance: negative strictly inside, positive strictly outside
    sd = np.asarray(rb.approximate_signed_distance(jnp.asarray(pts)))
    assert (sd[clear & expect] < 0).all() and (sd[clear & ~expect] > 0).all()
    # angle=0 degenerates to the axis-aligned box
    rb0 = RotatedBox(tuple(center), tuple(half), 0.0)
    bg = BoxGeometry(Box(tuple(center - half), tuple(center + half)))
    np.testing.assert_array_equal(
        np.asarray(rb0.lies_inside(jnp.asarray(pts))),
        np.asarray(bg.lies_inside(jnp.asarray(pts))),
    )
    # rotation by pi/2 swaps the half-extents: the mask of the rotated bar
    # equals the transposed mask of the unrotated bar for a square domain
    sq = RotatedBox((8.0, 8.0), (2.0, 5.0), 0.0)
    m0 = np.asarray(geometry_mask(sq, (16, 16)))
    m90 = np.asarray(geometry_mask(sq.rotated(np.pi / 2), (16, 16)))
    np.testing.assert_array_equal(m90, m0.T)
    # rotated() promotes a BoxGeometry and accumulates on RotatedBox
    assert isinstance(rotated(bg, 0.3), RotatedBox)
    assert np.isclose(rotated(rb, 0.3).angle, angle + 0.3)
    assert rotated(Sphere((1.0, 1.0), 2.0), 0.3) == Sphere((1.0, 1.0), 2.0)


def test_cell_center_points_layout():
    pts = cell_center_points((2, 3), Box.from_size((1.0, 3.0)))
    assert pts.shape == (2, 3, 2)
    np.testing.assert_allclose(np.asarray(pts[0, 0]), [0.25, 0.5])
    np.testing.assert_allclose(np.asarray(pts[1, 2]), [0.75, 2.5])


def test_noise_statistics_and_smoothness():
    key = jax.random.PRNGKey(0)
    f = noise(key, (64, 64), scale=8.0, smoothness=1.0)
    assert f.shape == (64, 64)
    np.testing.assert_allclose(float(jnp.mean(f)), 0.0, atol=1e-5)
    np.testing.assert_allclose(float(jnp.std(f)), 1.0, rtol=1e-3)
    # reproducible under the same key
    f2 = noise(key, (64, 64), scale=8.0, smoothness=1.0)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f2))
    # smoother field has less high-frequency content
    rough = noise(key, (64, 64), scale=8.0, smoothness=0.5)
    def hf_energy(a):
        fa = np.abs(np.fft.fft2(np.asarray(a)))
        return fa[16:48, 16:48].sum() / fa.sum()
    assert hf_energy(f) < hf_energy(rough)


def test_noise_channels_and_staggered():
    key = jax.random.PRNGKey(1)
    f = noise(key, (32, 32), channels=3)
    assert f.shape == (32, 32, 3)
    vel = noise_staggered(key, (32, 32))
    assert len(vel.components) == 2
    assert vel.components[0].shape == (32, 32)


def test_residual_block_shape_and_grad():
    key = jax.random.PRNGKey(2)
    p = init_residual_block(key, 8)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 8), jnp.float32)
    y = residual_block(p, x)
    assert y.shape == x.shape

    g = jax.grad(lambda pp: jnp.sum(residual_block(pp, x) ** 2))(p)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_unet_shapes_jit_grad():
    key = jax.random.PRNGKey(4)
    params = init_unet(key, in_channels=3, out_channels=2, levels=2, filters=8,
                       blocks_per_level=1)
    x = jax.random.normal(jax.random.PRNGKey(5), (32, 32, 3), jnp.float32)
    y = jax.jit(lambda p, xx: unet_apply(p, xx))(params, x)
    assert y.shape == (32, 32, 2)
    assert np.isfinite(np.asarray(y)).all()

    # batched input
    xb = jax.random.normal(jax.random.PRNGKey(6), (2, 16, 16, 3), jnp.float32)
    yb = unet_apply(params, xb)
    assert yb.shape == (2, 16, 16, 2)

    def loss(p):
        return jnp.sum(unet_apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
