"""SampledField rasterization + point advection + Drift physics oracles
(reference: PhiFlow/phi/physics/field/sampled.py, fluid.py:140-159 Drift,
demos/marker.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffpiso_tpu.fields import (
    Box,
    CLOSED,
    Domain,
    PERIODIC,
    SampledField,
    StaggeredField,
    advect_points,
    regular_points,
    velocity_at_points,
)
from diffpiso_tpu.physics import Drift


def _numpy_scatter(points, values, box, res, mode):
    """Scalar-loop oracle for to_centered."""
    lower = np.asarray(box.lower)
    size = np.asarray(box.size)
    total = np.zeros(res)
    count = np.zeros(res)
    for p, v in zip(np.asarray(points), np.asarray(values)):
        local = (p - lower) / size
        idx = tuple(
            int(np.clip(np.floor(local[ax] * res[ax]), 0, res[ax] - 1))
            for ax in range(len(res))
        )
        total[idx] += v
        count[idx] += 1
    if mode == "add":
        return total
    if mode == "any":
        return (count > 0).astype(np.float64)
    return total / np.maximum(count, 1.0)


@pytest.mark.parametrize("mode", ["mean", "add", "any"])
def test_to_centered_matches_numpy_oracle(mode):
    rng = np.random.RandomState(0)
    box = Box.from_size((2.0, 3.0))
    domain = Domain((8, 12), box, boundaries=CLOSED)
    pts = rng.rand(64, 2) * np.array([2.0, 3.0])
    pts[:5] = [[-0.5, 1.0], [2.5, 1.0], [1.0, -1.0], [1.0, 3.5], [2.0, 3.0]]
    vals = rng.randn(64)
    f = SampledField(jnp.asarray(pts, jnp.float32),
                     jnp.asarray(vals, jnp.float32), mode=mode)
    got = np.asarray(f.to_centered(domain).data)
    want = _numpy_scatter(pts, vals, box, (8, 12), mode)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_to_centered_vector_values_and_grad():
    """Channel axis survives rasterization; scatter-add is differentiable
    in the values (gradient = one per contributing point)."""
    box = Box.from_size((1.0, 1.0))
    domain = Domain((4, 4), box)
    pts = jnp.asarray([[0.1, 0.1], [0.1, 0.15], [0.9, 0.9]], jnp.float32)
    vals = jnp.asarray([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], jnp.float32)
    f = SampledField(pts, vals, mode="add")
    out = f.to_centered(domain).data
    assert out.shape == (4, 4, 2)
    np.testing.assert_allclose(np.asarray(out[0, 0]), [4.0, 6.0])
    np.testing.assert_allclose(np.asarray(out[3, 3]), [5.0, 6.0])

    g = jax.grad(
        lambda v: jnp.sum(
            SampledField(pts, v, mode="add").to_centered(domain).data
        )
    )(vals)
    np.testing.assert_allclose(np.asarray(g), np.ones((3, 2)), atol=1e-6)


def test_to_staggered_bins_faces():
    """A single point scatters its u value onto the nearest x-face and its
    v value onto the nearest y-face."""
    box = Box.from_size((4.0, 4.0))
    domain = Domain((4, 4), box, boundaries=CLOSED)
    # point in cell (1, 2), nearest y-face 2 and nearest x-face 3
    f = SampledField(
        jnp.asarray([[1.8, 2.6]], jnp.float32),
        jnp.asarray([[3.0, 7.0]], jnp.float32),
        mode="add",
    )
    st = f.to_staggered(domain)
    v, u = (np.asarray(c) for c in st.components)
    assert v.shape == (5, 4) and u.shape == (4, 5)
    assert v[2, 2] == 3.0 and v.sum() == 3.0  # round(1.8) = 2
    assert u[1, 3] == 7.0 and u.sum() == 7.0  # round(2.6) = 3


def test_periodic_rasterization_wraps():
    """On periodic domains escaped points bin into the WRAPPED cell (the
    same convention velocity_at_points interpolates with), and staggered
    components keep the unique-face layout (shape n, face n folds to 0)."""
    box = Box.from_size((4.0, 4.0))
    domain = Domain((4, 4), box, boundaries=PERIODIC)
    pts = jnp.asarray(
        [[-0.5, 1.5], [4.5, 1.5], [1.5, 9.5]], jnp.float32
    )  # wrap to cells (3,1), (0,1), (1,1)
    f = SampledField(pts, jnp.ones((3,), jnp.float32), mode="add")
    got = np.asarray(f.to_centered(domain).data)
    want = np.zeros((4, 4))
    want[3, 1] = want[0, 1] = want[1, 1] = 1.0
    np.testing.assert_allclose(got, want)

    # staggered: unique faces only, face n == face 0
    fv = SampledField(
        jnp.asarray([[3.9, 1.5]], jnp.float32),  # y-face round(3.9)=4 -> 0
        jnp.asarray([[2.0, 5.0]], jnp.float32),
        mode="add",
    )
    st = fv.to_staggered(domain)
    v, u = (np.asarray(c) for c in st.components)
    assert v.shape == (4, 4) and u.shape == (4, 4)
    assert v[0, 1] == 2.0 and v.sum() == 2.0
    # shapes are binop-compatible with a real periodic velocity field
    vel = domain.staggered_grid(0.0)
    _ = st + vel


def test_drift_conserve_gradient_finite_on_mean_zero_field():
    """The conserve renormalization must not poison gradients when the
    advected total is (near) zero — double-where regression."""
    n = 8
    box = Box.from_size((1.0, 1.0))
    domain = Domain((n, n), box, boundaries=PERIODIC)
    vel = StaggeredField(
        (jnp.full((n, n), 0.2, jnp.float32),
         jnp.full((n, n), 0.1, jnp.float32)),
        periodic=(True, True),
    )
    drift = Drift(domain)
    rng = np.random.RandomState(3)
    marker = jnp.asarray(rng.randn(n, n), jnp.float32)
    marker = marker - jnp.mean(marker)  # exactly mean-zero

    def loss(m):
        return jnp.sum(drift.step(m, dt=0.1, velocity=vel) ** 2)

    g = jax.grad(loss)(marker)
    assert np.isfinite(np.asarray(g)).all()
    # zero field: gradient of sum(advected^2) is exactly zero, not NaN
    g0 = jax.grad(loss)(jnp.zeros((n, n), jnp.float32))
    np.testing.assert_allclose(np.asarray(g0), 0.0)


def test_occupancy():
    box = Box.from_size((1.0, 1.0))
    domain = Domain((2, 2), box)
    f = SampledField(
        jnp.asarray([[0.1, 0.1], [0.2, 0.2], [0.9, 0.9]], jnp.float32),
        jnp.ones((3,), jnp.float32),
    )
    occ = np.asarray(f.occupancy(domain).data)
    np.testing.assert_allclose(occ, [[1.0, 0.0], [0.0, 1.0]])


def test_velocity_at_points_linear_field_exact():
    """Multilinear interpolation reproduces a linear velocity field exactly
    at interior points: u = x, v = -y on a staggered grid."""
    n = 8
    box = Box.from_size((1.0, 1.0))
    domain = Domain((n, n), box, boundaries=CLOSED)
    dx = 1.0 / n
    yf = (jnp.arange(n + 1, dtype=jnp.float32) * dx)[:, None]
    xc = ((jnp.arange(n, dtype=jnp.float32) + 0.5) * dx)[None, :]
    v = jnp.broadcast_to(-yf, (n + 1, n)) + 0.0 * xc
    yc = ((jnp.arange(n, dtype=jnp.float32) + 0.5) * dx)[:, None]
    xf = (jnp.arange(n + 1, dtype=jnp.float32) * dx)[None, :]
    u = jnp.broadcast_to(xf, (n, n + 1)) + 0.0 * yc
    vel = StaggeredField((v, u), periodic=(False, False))
    rng = np.random.RandomState(1)
    pts = jnp.asarray(0.125 + 0.75 * rng.rand(40, 2), jnp.float32)
    got = np.asarray(velocity_at_points(vel, pts, box))
    want = np.stack([-np.asarray(pts)[:, 0], np.asarray(pts)[:, 1]], -1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_advect_points_uniform_flow():
    """Uniform velocity moves every point by exactly dt * (v, u), under
    jit."""
    n = 6
    box = Box.from_size((1.0, 1.0))
    domain = Domain((n, n), box, boundaries=PERIODIC)
    vel = StaggeredField(
        (jnp.full((n, n), 0.25, jnp.float32),
         jnp.full((n, n), -0.5, jnp.float32)),
        periodic=(True, True),
    )
    pts = regular_points(box, 4)
    f = SampledField(pts, jnp.ones((16,), jnp.float32))
    out = jax.jit(lambda fld: advect_points(fld, vel, box, 0.1))(f)
    np.testing.assert_allclose(
        np.asarray(out.points - pts),
        np.tile([0.025, -0.05], (16, 1)),
        rtol=1e-5, atol=1e-6,
    )
    # values untouched
    np.testing.assert_allclose(np.asarray(out.values), 1.0)


def test_regular_points_lattice():
    box = Box.from_size((2.0, 4.0), lower=(1.0, -1.0))
    pts = np.asarray(regular_points(box, 2))
    assert pts.shape == (4, 2)
    np.testing.assert_allclose(
        pts, [[1.5, 0.0], [1.5, 2.0], [2.5, 0.0], [2.5, 2.0]]
    )


def test_drift_world_markers():
    """marker.py's setup in miniature: a World with a flow state, a dense
    marker (conserved) and a particle marker, stepped jointly under jit."""
    from diffpiso_tpu.core.chorin import FlowState
    from diffpiso_tpu.physics import World

    n = 16
    box = Box.from_size((float(n), float(n)))
    domain = Domain((n, n), box, boundaries=CLOSED)
    rng = np.random.RandomState(2)
    vel = StaggeredField(
        (jnp.asarray(rng.randn(n + 1, n) * 0.1, jnp.float32),
         jnp.asarray(rng.randn(n, n + 1) * 0.1, jnp.float32)),
        periodic=(False, False),
    )
    dense = jnp.asarray((rng.rand(n, n) > 0.5).astype(np.float32))
    particles = SampledField(
        regular_points(box, 4), jnp.ones((16,), jnp.float32)
    )

    from diffpiso_tpu.physics import IncompressibleFlow

    world = World()
    world.add("velocity", FlowState(velocity=vel),
              physics=IncompressibleFlow(domain, rank_deficient=True),
              tags=("velocityfield",))
    world.add("dense_marker", dense, physics=Drift(domain))
    world.add("particles", particles, physics=Drift(domain))
    step = world.jitted_step(dt=0.5)
    values = world.collection.values_pytree()
    for _ in range(3):
        values = step(values)
    out_dense = np.asarray(values["dense_marker"])
    out_pts = values["particles"]
    assert np.isfinite(out_dense).all()
    assert np.isfinite(np.asarray(out_pts.points)).all()
    # conserve=True keeps the dense marker's total mass
    np.testing.assert_allclose(out_dense.sum(), float(dense.sum()), rtol=1e-4)
    # particles moved
    assert float(jnp.max(jnp.abs(out_pts.points - particles.points))) > 0


# -- occupancy-mask extrapolation (util.py:68-200) + point distribution -------------


def test_create_surface_mask_inner_contour():
    """Surface = liquid cells with at least one empty neighbor (incl.
    diagonals; out-of-domain counts empty) — create_surface_mask,
    phi/physics/field/util.py:174-200."""
    from diffpiso_tpu.fields.extrapolate import create_surface_mask

    mask = np.zeros((6, 6), np.float32)
    mask[1:5, 1:5] = 1.0
    got = np.asarray(create_surface_mask(jnp.asarray(mask)))
    want = mask.copy()
    want[2:4, 2:4] = 0.0  # interior 2x2 has all-liquid neighborhoods
    np.testing.assert_array_equal(got, want)
    # a fully-liquid domain: only the boundary ring is surface (zero-padded
    # out-of-domain neighbors count empty — the reference's constant pad,
    # util.py:181)
    full = np.asarray(create_surface_mask(jnp.ones((4, 4), jnp.float32)))
    ring = np.ones((4, 4))
    ring[1:3, 1:3] = 0.0
    np.testing.assert_array_equal(full, ring)


def test_extrapolate_centered_stripe():
    """Values propagate outward from the liquid surface: a stripe with
    f = x inside carries the surface column's value into the empty cells,
    one cell per sweep; the signed distance is negative inside, ~0 on the
    contour, positive outside, clamped past the horizon."""
    from diffpiso_tpu.fields.extrapolate import extrapolate

    ny, nx, k, vd = 8, 8, 4, 3
    mask = np.zeros((ny, nx), np.float32)
    mask[:, :k] = 1.0
    f = np.tile(np.arange(nx, dtype=np.float32), (ny, 1))
    ext, sdist = extrapolate(jnp.asarray(f), jnp.asarray(mask), vd)
    ext, sdist = np.asarray(ext), np.asarray(sdist)
    # liquid values unchanged
    np.testing.assert_array_equal(ext[:, :k], f[:, :k])
    # empty cells within the horizon take the surface column's value (the
    # nearest liquid cell along -x); interior rows avoid the domain-edge
    # surface rows
    np.testing.assert_array_equal(ext[1:-1, k], np.full(ny - 2, k - 1.0))
    np.testing.assert_array_equal(ext[1:-1, k + 1], np.full(ny - 2, k - 1.0))
    # signed distance: 0 at the inner contour, graded positive outside
    assert np.all(sdist[:, :k] <= 0.0)
    np.testing.assert_allclose(sdist[1:-1, k - 1], 0.0)
    np.testing.assert_allclose(sdist[1:-1, k], 1.0)
    np.testing.assert_allclose(sdist[1:-1, k + 1], 2.0)
    # past the horizon: clamped to +voxel_distance (util.py:161-163)
    np.testing.assert_allclose(sdist[:, k + vd:], vd)


def test_to_staggered_extrapolation_seeds_boundary_faces():
    """The reference's _stagger_sample post-pass (sampled.py:98-105): with
    extrapolation_distance=2, faces just outside the occupied region carry
    values propagated from inside the liquid instead of zeros."""
    box = Box.from_size((8.0, 8.0))
    domain = Domain((8, 8), box, boundaries=CLOSED)
    # fill cells [2..5]^2 with one particle each (off-center to avoid
    # round-half ties), uniform velocity (0.5, 1.0)
    ys, xs = np.meshgrid(np.arange(2, 6) + 0.4, np.arange(2, 6) + 0.4,
                         indexing="ij")
    pts = jnp.asarray(np.stack([ys.ravel(), xs.ravel()], -1), jnp.float32)
    vals = jnp.asarray(np.tile([0.5, 1.0], (pts.shape[0], 1)), jnp.float32)
    f = SampledField(pts, vals, mode="mean")

    plain = f.to_staggered(domain)
    seeded = f.to_staggered(domain, extrapolation_distance=2)
    v0, u0 = (np.asarray(c) for c in plain.components)
    v1, u1 = (np.asarray(c) for c in seeded.components)
    # the eroded active mask is cells [3..4]^2; faces 1-2 cells outside it
    # were zero without the pass and carry the liquid value with it
    assert u0[3, 7] == 0.0 and v0[7, 3] == 0.0
    np.testing.assert_allclose(u1[3, 7], 1.0)
    np.testing.assert_allclose(v1[7, 3], 0.5)
    # rasterized faces deep inside the liquid are untouched by the pass
    np.testing.assert_allclose(u1[3, 4], u0[3, 4])
    np.testing.assert_allclose(v1[4, 3], v0[4, 3])


def test_distribute_points_modes():
    """_distribute_points parity (sampled.py:185-212): one point per active
    cell at the center (or uniformly jittered inside it), particles_per_cell
    replication, and optional world-coordinate mapping via a Box."""
    from diffpiso_tpu.fields.sampled import distribute_points

    dens = np.zeros((4, 4), np.float32)
    dens[1, 2] = 1.0
    dens[3, 0] = 1.0
    pts = np.asarray(distribute_points(dens, distribution="center"))
    want = {(1.5, 2.5), (3.5, 0.5)}
    assert {tuple(p) for p in pts} == want

    pts3 = np.asarray(
        distribute_points(dens, particles_per_cell=3, distribution="uniform",
                          key=jax.random.PRNGKey(1))
    )
    assert pts3.shape == (6, 2)
    # each jittered point stays strictly inside its source cell
    cells = {tuple(np.floor(p).astype(int)) for p in pts3}
    assert cells == {(1, 2), (3, 0)}

    box = Box.from_size((8.0, 8.0))  # 2x cell size
    ptsw = np.asarray(distribute_points(dens, distribution="center", box=box))
    assert {tuple(p) for p in ptsw} == {(3.0, 5.0), (7.0, 1.0)}
