"""Oracle tests for the N-d resample op against scipy.ndimage.map_coordinates
(the same style of oracle the reference uses for its CUDA resample op,
PhiFlow/gpu_tests/test_tf_cuda_resample.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.ndimage import map_coordinates

from diffpiso_tpu.ops.resample import REFLECT, grid_sample, resample_field
from diffpiso_tpu.fields.material import CIRCULAR, REPLICATE, SYMMETRIC, ZERO

# ours -> scipy.ndimage mode (order=1 multilinear)
SCIPY_MODE = {
    ZERO: "grid-constant",
    REPLICATE: "nearest",
    CIRCULAR: "grid-wrap",
    SYMMETRIC: "reflect",
    REFLECT: "mirror",
}


@pytest.mark.parametrize("mode", list(SCIPY_MODE))
@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_grid_sample_matches_scipy(mode, ndim):
    rng = np.random.RandomState(ndim * 31 + len(mode))
    shape = (7, 5, 6)[:ndim]
    data = rng.rand(*shape).astype(np.float64)
    npts = 200
    # points well outside the grid on both sides exercise the folding
    pts = np.stack(
        [rng.uniform(-2 * n, 3 * n, npts) for n in shape], axis=-1
    )
    got = np.asarray(grid_sample(jnp.asarray(data), jnp.asarray(pts), mode))
    want = map_coordinates(data, pts.T, order=1, mode=SCIPY_MODE[mode], cval=0.0)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_grid_sample_per_axis_modes_and_channels():
    rng = np.random.RandomState(0)
    data = rng.rand(6, 8, 3)
    pts = np.stack(
        [rng.uniform(-6, 12, 64), rng.uniform(-8, 16, 64)], axis=-1
    )
    got = np.asarray(grid_sample(jnp.asarray(data), jnp.asarray(pts), (CIRCULAR, ZERO)))
    # mixed-mode oracle: realize the circular axis by tiling, then sample the
    # remaining zero-padded axis with scipy's grid-constant mode
    tiled = np.concatenate([data] * 5, axis=0)  # covers [-12, 18) after shift
    pts_shift = pts.copy()
    pts_shift[:, 0] = pts_shift[:, 0] + 12.0
    for c in range(3):
        want = map_coordinates(
            tiled[..., c], pts_shift.T, order=1, mode="grid-constant", cval=0.0
        )
        np.testing.assert_allclose(got[:, c], want, atol=1e-12)


def test_grid_sample_identity_at_integer_points():
    data = jnp.arange(20.0).reshape(4, 5)
    jj, ii = jnp.meshgrid(jnp.arange(4.0), jnp.arange(5.0), indexing="ij")
    pts = jnp.stack([jj, ii], -1)
    out = grid_sample(data, pts, REPLICATE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(data), atol=1e-12)


def test_grid_sample_grad_is_scatter():
    # gradient w.r.t. data must be finite and conserve the cotangent mass for
    # interior points (the property resample_gradient.cu.cc implements)
    data = jnp.ones((8, 8))
    pts = jnp.asarray([[3.3, 4.6], [1.1, 2.9], [5.5, 5.5]])

    def f(d):
        return jnp.sum(grid_sample(d, pts, REPLICATE))

    g = jax.grad(f)(data)
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(float(jnp.sum(g)), 3.0, rtol=1e-6)


def test_grid_sample_jit_vmap():
    rng = np.random.RandomState(1)
    data = jnp.asarray(rng.rand(4, 6, 5))  # batch of 4
    pts = jnp.asarray(rng.uniform(0, 4, size=(4, 10, 2)))
    out = jax.jit(jax.vmap(lambda d, p: grid_sample(d, p, SYMMETRIC)))(data, pts)
    assert out.shape == (4, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_resample_field_physical_coords():
    # centered grid on box [0,1)^2 with 4x4 cells: value = x coordinate
    dx = 0.25
    xs = (np.arange(4) + 0.5) * dx
    data = jnp.asarray(np.tile(xs, (4, 1)))
    pts = jnp.asarray([[0.5, 0.375], [0.5, 0.625]])
    out = resample_field(data, (0.0, 0.0), (dx, dx), pts, REPLICATE)
    np.testing.assert_allclose(np.asarray(out), [0.375, 0.625], atol=1e-6)
