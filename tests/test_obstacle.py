"""Obstacle layer (reference phi/physics/obstacle.py + the obstacle handling
in fluid.divergence_free, fluid.py:216-250): mask carve-out, rigid-body
velocity imprinting (translation + rotation), GeometryMovement finite
-difference velocities, and projection around an obstacle."""

import jax.numpy as jnp
import numpy as np

from diffpiso_tpu.core.chorin import FlowState, divergence_free, incompressible_flow_step
from diffpiso_tpu.fields import Box, Domain, PERIODIC
from diffpiso_tpu.fields.geometry import Sphere
from diffpiso_tpu.fields.grid import StaggeredField
from diffpiso_tpu.ops.fv import fv_divergence
from diffpiso_tpu.physics import (
    GeometryMovement,
    Obstacle,
    apply_obstacle_velocities,
    obstacle_accessible_mask,
)


def test_accessible_mask_carves_obstacle():
    obs = Obstacle(Sphere(center=(8.0, 8.0), radius=3.0))
    mask = obstacle_accessible_mask([obs], (16, 16), Box.from_size((16.0, 16.0)))
    m = np.asarray(mask)
    assert m.shape == (18, 18)
    assert m[1 + 8, 1 + 8] == 0.0  # center cell solid
    assert m[1 + 1, 1 + 1] == 1.0  # far corner fluid
    # carved area ~ pi r^2
    carved = (1.0 - m[1:-1, 1:-1]).sum()
    assert abs(carved - np.pi * 9) < 8


def test_rigid_body_velocity_imprint():
    # pure rotation: v = +w(x-cx), u = -w(y-cy) inside the disc
    obs = Obstacle(Sphere(center=(8.0, 8.0), radius=4.0), angular_velocity=0.5)
    n = 16
    vel = StaggeredField((jnp.zeros((n + 1, n)), jnp.zeros((n, n + 1))))
    out = apply_obstacle_velocities(vel, [obs], Box.from_size((16.0, 16.0)))
    v, u = np.asarray(out.components[0]), np.asarray(out.components[1])
    # v at face (y=8, x=10.5): deep inside, expect +0.5*(10.5-8)=1.25
    np.testing.assert_allclose(v[8, 10], 0.5 * 2.5, atol=1e-5)
    # u at face (y=10.5, x=8): expect -0.5*(10.5-8)=-1.25
    np.testing.assert_allclose(u[10, 8], -0.5 * 2.5, atol=1e-5)
    # far outside: untouched
    np.testing.assert_allclose(v[1, 1], 0.0, atol=1e-6)

    # pure translation
    obs2 = Obstacle(Sphere(center=(8.0, 8.0), radius=4.0), velocity=(0.3, -0.2))
    out2 = apply_obstacle_velocities(vel, [obs2], Box.from_size((16.0, 16.0)))
    np.testing.assert_allclose(np.asarray(out2.components[0])[8, 8], 0.3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out2.components[1])[8, 8], -0.2, atol=1e-5)


def test_geometry_movement_velocity():
    mover = GeometryMovement(lambda t: Sphere(center=(5.0 + 2.0 * t, 3.0), radius=1.0))
    obs = mover.step(Obstacle(Sphere(center=(5.0, 3.0), radius=1.0)), t=0.0, dt=0.1)
    assert abs(obs.geometry.center[0] - 5.2) < 1e-6
    np.testing.assert_allclose(obs.velocity[0], 2.0, rtol=1e-4)
    np.testing.assert_allclose(obs.velocity[1], 0.0, atol=1e-6)


def test_projection_respects_obstacle():
    """Uniform flow past a disc: after projection the interior divergence
    (outside the solid) is small and the flow deflects around the disc."""
    n = 32
    domain = Domain((n, n), Box.from_size((float(n), float(n))), boundaries=PERIODIC)
    vel = StaggeredField(
        (jnp.zeros((n, n)), jnp.ones((n, n))), periodic=(True, True)
    )
    obs = Obstacle(Sphere(center=(16.0, 16.0), radius=5.0))
    out, q = divergence_free(vel, domain, tol=1e-7, obstacles=[obs])
    div = np.asarray(fv_divergence(out, domain.dx))
    mask = np.asarray(
        obstacle_accessible_mask([obs], (n, n), domain.box)
    )[1:-1, 1:-1]
    # fluid cells NOT adjacent to the solid: divergence at solver tolerance
    from scipy.ndimage import binary_erosion

    fluid_core = binary_erosion(mask > 0.5, iterations=2)
    assert np.abs(div[fluid_core]).max() < 1e-4
    # flow speeds up beside the disc (continuity): u above the disc > inflow
    u = np.asarray(out.components[1])
    assert u[26, 16] > 1.05


def test_flow_step_with_obstacle_stable():
    n = 24
    domain = Domain((n, n), Box.from_size((float(n), float(n))), boundaries=PERIODIC)
    vel = StaggeredField(
        (jnp.zeros((n, n)), jnp.ones((n, n))), periodic=(True, True)
    )
    state = FlowState(velocity=vel)
    obs = Obstacle(Sphere(center=(12.0, 12.0), radius=4.0))
    for _ in range(3):
        state = incompressible_flow_step(
            state, domain, dt=0.5, obstacles=[obs], tol=1e-6
        )
    for c in state.velocity.components:
        assert bool(jnp.all(jnp.isfinite(c)))


def test_obstacle_at_periodic_wrap_edge():
    """Review regression: an obstacle touching the periodic wrap boundary
    must re-wrap the mask pad ring, else the Laplacian keeps wrap links into
    solid cells and CG diverges (max|div| ~ 1e22 before the fix)."""
    n = 32
    domain = Domain((n, n), Box.from_size((float(n), float(n))), boundaries=PERIODIC)
    vel = StaggeredField(
        (jnp.zeros((n, n)), jnp.ones((n, n))), periodic=(True, True)
    )
    obs = Obstacle(Sphere(center=(16.0, 0.0), radius=5.0))  # straddles x wrap
    out, q = divergence_free(vel, domain, tol=1e-7, obstacles=[obs])
    div = np.asarray(fv_divergence(out, domain.dx))
    mask = np.asarray(
        obstacle_accessible_mask([obs], (n, n), domain.box, periodic=(True, True))
    )[1:-1, 1:-1]
    from scipy.ndimage import binary_erosion

    fluid_core = binary_erosion(mask > 0.5, iterations=2)
    assert np.isfinite(div).all()
    assert np.abs(div[fluid_core]).max() < 1e-4


def test_moving_obstacle_forces_flow():
    """Advisor regression (r2 high): the rigid-body imprint must survive the
    hard-BC face filter — imprint AFTER filtering (fluid.py:239-244), else a
    translating obstacle produces almost no divergence forcing. A disc
    translating in +x through quiescent fluid must push fluid out ahead of
    it (u > 0 just downstream) and pull fluid in behind (u > 0 just
    upstream too — the wake follows), with O(U_obs) magnitudes."""
    n = 48
    domain = Domain((n, n), Box.from_size((float(n), float(n))), boundaries=PERIODIC)
    vel = StaggeredField(
        (jnp.zeros((n, n)), jnp.zeros((n, n))), periodic=(True, True)
    )
    u_obs = 1.0
    obs = Obstacle(Sphere(center=(24.0, 20.0), radius=5.0), velocity=(0.0, u_obs))
    out, q = divergence_free(vel, domain, tol=1e-8, obstacles=[obs])
    u = np.asarray(out.components[1])
    # ahead of the disc (x ~ 27..29, y = 24): fluid pushed forward
    assert u[24, 27] > 0.2 * u_obs, u[24, 25:32]
    # behind the disc (x ~ 12..14): fluid drawn forward into the vacated space
    assert u[24, 13] > 0.2 * u_obs, u[24, 10:16]
    # far field barely disturbed (potential flow decays like 1/r^2)
    assert abs(u[2, 44]) < 0.1 * u_obs
    # the projection is still divergence-free away from the disc
    div = np.asarray(fv_divergence(out, domain.dx))
    mask = np.asarray(
        obstacle_accessible_mask([obs], (n, n), domain.box, periodic=(True, True))
    )[1:-1, 1:-1]
    from scipy.ndimage import binary_erosion

    fluid_core = binary_erosion(mask > 0.5, iterations=2)
    assert np.abs(div[fluid_core]).max() < 1e-4


def test_divergence_free_rank_deficient_flag_traced_masks():
    """Advisor regression (r2 low): traced masks used to silently force the
    singular treatment; now divergence_free takes an explicit flag."""
    import jax
    import pytest

    n = 16
    domain = Domain((n, n), Box.from_size((float(n), float(n))), boundaries=PERIODIC)
    rng = np.random.RandomState(3)
    vel = StaggeredField(
        (
            jnp.asarray(rng.randn(n, n), jnp.float32),
            jnp.asarray(rng.randn(n, n), jnp.float32),
        ),
        periodic=(True, True),
    )
    mask = jnp.ones((n + 2, n + 2), jnp.float32)

    def project(v, m, rd=None):
        out, _ = divergence_free(v, domain, m, tol=1e-7, rank_deficient=rd)
        return out

    # traced mask without the flag: loud trace-time error, not silent corruption
    with pytest.raises(ValueError, match="rank_deficient"):
        jax.jit(project)(vel, mask)
    # with the flag: runs and projects
    out = jax.jit(lambda v, m: project(v, m, rd=True))(vel, mask)
    div = np.asarray(fv_divergence(out, domain.dx))
    assert np.abs(div).max() < 1e-4


def test_divergence_free_mixed_periodicity():
    """Review regression: channel layout (bounded y, periodic x) must build
    per-axis face layouts — previously crashed with a shape mismatch."""
    from diffpiso_tpu.fields import OPEN

    n = 16
    domain = Domain(
        (n, n), Box.from_size((float(n), float(n))), boundaries=(OPEN, PERIODIC)
    )
    assert domain.periodic == (False, True)
    rng = np.random.RandomState(0)
    vel = StaggeredField(
        (
            jnp.asarray(rng.randn(n + 1, n), jnp.float32),
            jnp.asarray(rng.randn(n, n), jnp.float32),
        ),
        periodic=(False, True),
    )
    out, q = divergence_free(vel, domain, tol=1e-7)
    div = np.asarray(fv_divergence(out, domain.dx))
    # interior divergence at solver tolerance
    assert np.abs(div[1:-1, :]).max() < 1e-4


def test_potential_flow_around_disc_matches_analytic():
    """Quantitative oracle for the obstacle hard-BC + projection machinery:
    the impulsive projection of uniform flow past a cylinder IS discrete
    potential flow, so away from the surface it must match the analytic
    dipole field u = U(1 + R^2(y^2-x^2)/r^4), v = -2UR^2xy/r^4 (doublet
    superposition; periodic images at distance n contribute O((R/n)^2) ~ 0.4%).
    Measured on this grid (96^2, R=6, f32): rmse ~1.6%/0.9%, max ~4.5% in the
    1.5R..3.3R annulus — asserted with 2x margin."""
    n, R = 96, 6.0
    c = n / 2.0
    domain = Domain((n, n), Box.from_size((float(n), float(n))), boundaries=PERIODIC)
    vel = StaggeredField(
        (jnp.zeros((n, n), jnp.float32), jnp.ones((n, n), jnp.float32)),
        periodic=(True, True),
    )
    obs = Obstacle(Sphere(center=(c, c), radius=R))
    out, _ = divergence_free(vel, domain, tol=1e-7, obstacles=[obs])
    v = np.asarray(out.components[0])
    u = np.asarray(out.components[1])

    iy, ix = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")

    def analytic(yy, xx):
        x, y = xx - c, yy - c
        r2 = x * x + y * y
        return -2 * R * R * x * y / r2**2, 1 + R * R * (y * y - x * x) / r2**2

    # staggered face positions: component d sits at i_d * dx along its own
    # axis (between cells i_d-1 and i_d) and cell centers elsewhere
    _, ua = analytic(iy + 0.5, ix * 1.0)
    va, _ = analytic(iy * 1.0, ix + 0.5)
    r_u = np.hypot(ix * 1.0 - c, iy + 0.5 - c)
    r_v = np.hypot(ix + 0.5 - c, iy * 1.0 - c)
    mu = (r_u > 1.5 * R) & (r_u < 3.3 * R)
    mv = (r_v > 1.5 * R) & (r_v < 3.3 * R)
    assert np.sqrt(np.mean((u[mu] - ua[mu]) ** 2)) < 0.035
    assert np.sqrt(np.mean((v[mv] - va[mv]) ** 2)) < 0.02
    assert np.abs(u[mu] - ua[mu]).max() < 0.10
    assert np.abs(v[mv] - va[mv]).max() < 0.09


def test_potential_flow_around_sphere_3d_matches_analytic():
    """3-D twin of the disc oracle AND the regression pin for the singular
    masked-CG fix: at 64^3 the old rank-one-shifted deflated CG amplified the
    f32 residual-mean leak through the shift's s*n ~ 1.5e5 eigenvalue until
    the solve emitted NaN (silently — divergence_free drops the warn flag).
    The unshifted consistent-rhs singular CG converges in ~233 iterations and
    must reproduce the analytic 3-D doublet u = U(1 + R^3(r^2-3x^2)/(2r^5)),
    v = -3UR^3xy/(2r^5). Measured: u rmse 0.7%, max 4.9% in 1.5R..2.8R."""
    n, R = 64, 6.0
    c = n / 2.0
    domain = Domain(
        (n, n, n), Box.from_size((float(n),) * 3), boundaries=PERIODIC
    )
    vel = StaggeredField(
        tuple(jnp.zeros((n, n, n), jnp.float32) for _ in range(2))
        + (jnp.ones((n, n, n), jnp.float32),),
        periodic=(True, True, True),
    )
    obs = Obstacle(Sphere(center=(c, c, c), radius=R))
    out, _ = divergence_free(vel, domain, tol=1e-6, obstacles=[obs])
    u = np.asarray(out.components[2])
    v = np.asarray(out.components[1])
    assert np.isfinite(u).all() and np.isfinite(v).all()

    iz, iy, ix = np.meshgrid(*[np.arange(n)] * 3, indexing="ij")
    # u-faces: x at ix, y/z at cell centers; v-faces: y at iy, x/z at centers
    xu, yu, zu = ix * 1.0 - c, iy + 0.5 - c, iz + 0.5 - c
    ru = np.sqrt(xu**2 + yu**2 + zu**2)
    ua = 1 + R**3 * (ru**2 - 3 * xu**2) / (2 * ru**5)
    xv, yv, zv = ix + 0.5 - c, iy * 1.0 - c, iz + 0.5 - c
    rv = np.sqrt(xv**2 + yv**2 + zv**2)
    va = -3 * R**3 * xv * yv / (2 * rv**5)
    mu = (ru > 1.5 * R) & (ru < 2.8 * R)
    mv = (rv > 1.5 * R) & (rv < 2.8 * R)
    assert np.sqrt(np.mean((u[mu] - ua[mu]) ** 2)) < 0.015
    assert np.abs(u[mu] - ua[mu]).max() < 0.10
    assert np.sqrt(np.mean((v[mv] - va[mv]) ** 2)) < 0.015
    assert np.abs(v[mv] - va[mv]).max() < 0.10


def test_divergence_free_return_info():
    n = 32
    domain = Domain((n, n), Box.from_size((float(n), float(n))), boundaries=PERIODIC)
    vel = StaggeredField(
        (jnp.zeros((n, n)), jnp.ones((n, n))), periodic=(True, True)
    )
    obs = Obstacle(Sphere(center=(16.0, 16.0), radius=5.0))
    out, q, info = divergence_free(
        vel, domain, tol=1e-6, obstacles=[obs], return_info=True
    )
    assert not bool(info.warn) and bool(info.converged)
    # unobstructed periodic path is direct: info is None
    _, _, info2 = divergence_free(vel, domain, tol=1e-6, return_info=True)
    assert info2 is None
