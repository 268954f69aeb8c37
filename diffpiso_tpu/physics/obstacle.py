"""Obstacles for the projection solvers.

Parity with the reference's phi/physics/obstacle.py (Obstacle State with
geometry/material/velocity/angular_velocity + GeometryMovement physics) and
the obstacle handling inside fluid.divergence_free (fluid.py:216-250):
obstacle cells leave the active mask, the velocity field is blended toward
the obstacle's rigid-body velocity (translation + angular swirl around the
geometry center) with an antialiased mask before projection, and hard
boundary conditions zero the normal faces of solid cells.

TPU-native: obstacles are frozen pytree dataclasses; masks are sampled with
the geometry layer (fields/geometry.py) at trace time, so moving obstacles
retrace only when the STRUCTURE changes (the geometry parameters are
floats baked per step, exactly how the reference rebuilds GeometryMask
fields each step)."""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

from diffpiso_tpu.fields.box import Box
from diffpiso_tpu.fields.geometry import Geometry, geometry_mask, union
from diffpiso_tpu.fields.grid import StaggeredField


@dataclasses.dataclass(frozen=True)
class Obstacle:
    """A rigid obstacle (obstacle.py:11-36). velocity is the translation
    velocity in (y, x) order; angular_velocity the scalar 2-D rotation rate
    about the geometry center."""

    geometry: Geometry
    velocity: Tuple[float, ...] = (0.0, 0.0)
    angular_velocity: float = 0.0

    @property
    def is_stationary(self) -> bool:
        return (
            all(float(v) == 0.0 for v in self.velocity)
            and float(self.angular_velocity) == 0.0
        )


class GeometryMovement:
    """Physics moving an obstacle along a prescribed trajectory
    (obstacle.py:39-55 GeometryMovement): geometry_at(t) gives the geometry;
    the rigid-body velocity is the finite difference of the center path."""

    def __init__(self, geometry_at: Callable[[float], Geometry]):
        self.geometry_at = geometry_at

    def step(self, obstacle: Obstacle, t: float, dt: float = 1.0) -> Obstacle:
        next_geometry = self.geometry_at(t + dt)
        h = 1e-2 * dt if dt > 0 else 1e-2
        perturbed = self.geometry_at(t + dt + h)
        velocity = tuple(
            (p - c) / h for p, c in zip(perturbed.center, next_geometry.center)
        )
        return Obstacle(
            geometry=next_geometry,
            velocity=velocity,
            angular_velocity=obstacle.angular_velocity,
        )


def obstacle_accessible_mask(
    obstacles: Sequence[Obstacle],
    resolution: Sequence[int],
    box: Box | None = None,
    base_mask: jax.Array | None = None,
    periodic: Sequence[bool] | None = None,
) -> jax.Array:
    """(res+2)-padded accessible/active mask with obstacle cells carved out
    (fluid.py:230-236: active = 1 - obstacle mask). `base_mask` defaults to
    all-accessible with a closed ring. On periodic axes the pad ring is
    re-wrapped AFTER carving — the Laplacian assembly reads neighbor masks
    through the padding, so a stale all-ones ring would keep wrap links into
    solid cells that the face-accessibility filter closes, making the
    pressure system inconsistent (CG diverges)."""
    res = tuple(int(r) for r in resolution)
    if base_mask is None:
        base_mask = jnp.ones(tuple(r + 2 for r in res), jnp.float32)
    if not obstacles:
        return base_mask
    solid = geometry_mask(
        union(tuple(o.geometry for o in obstacles)), res, box, antialias=False
    )
    interior = tuple(slice(1, -1) for _ in res)
    out = base_mask.at[interior].set(base_mask[interior] * (1.0 - solid))
    if periodic is not None:
        for ax, per in enumerate(periodic):
            if not per:
                continue
            n = res[ax]
            lo = [slice(None)] * out.ndim
            hi = [slice(None)] * out.ndim
            src_hi = [slice(None)] * out.ndim
            src_lo = [slice(None)] * out.ndim
            lo[ax], src_hi[ax] = 0, n  # ring row 0 <- last interior row
            hi[ax], src_lo[ax] = n + 1, 1  # ring row n+1 <- first interior row
            out = out.at[tuple(lo)].set(out[tuple(src_hi)])
            out = out.at[tuple(hi)].set(out[tuple(src_lo)])
    return out


def apply_obstacle_velocities(
    velocity: StaggeredField,
    obstacles: Sequence[Obstacle],
    box: Box | None = None,
) -> StaggeredField:
    """Blend the field toward each moving obstacle's rigid-body velocity
    with an antialiased mask (fluid.py:240-244): v <- (1-m) v + m (u_obs +
    omega x r). Stationary obstacles are handled by the mask carve-out and
    hard BCs instead (their target velocity is zero there anyway)."""
    res = velocity.resolution
    box = box or Box.from_size(tuple(float(r) for r in res))
    dx = box.dx(res)
    out = list(velocity.components)
    for obs in obstacles:
        if obs.is_stationary:
            continue
        for d, comp in enumerate(out):
            # face-center coordinates of component d
            shape = comp.shape
            coords = []
            for ax in range(len(res)):
                n = shape[ax]
                offset = 0.0 if ax == d else 0.5
                coords.append(
                    box.lower[ax] + (jnp.arange(n) + offset) * dx[ax]
                )
            mesh = jnp.meshgrid(*coords, indexing="ij")
            pts = jnp.stack(mesh, axis=-1)
            # smooth one-cell ramp via signed distance (the antialiased mask
            # of fluid.py:242)
            sd = obs.geometry.approximate_signed_distance(pts)
            m = jnp.clip(0.5 - sd / min(dx), 0.0, 1.0).astype(comp.dtype)
            target = jnp.asarray(obs.velocity[d], comp.dtype)
            if obs.angular_velocity:
                # rigid rotation omega z-hat x r, CCW in (x, y):
                # v (y-comp) = +omega (x - cx); u (x-comp) = -omega (y - cy)
                cy, cx = obs.geometry.center[0], obs.geometry.center[1]
                if d == 0:
                    target = target + obs.angular_velocity * (mesh[1] - cx)
                else:
                    target = target - obs.angular_velocity * (mesh[0] - cy)
            out[d] = (1.0 - m) * out[d] + m * target
    return StaggeredField(tuple(out), periodic=velocity.periodic)
