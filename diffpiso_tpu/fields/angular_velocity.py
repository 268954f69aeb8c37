"""Point-vortex swirl fields (AngularVelocity).

Parity with the reference's AngularVelocity analytic field
(PhiFlow/phi/physics/field/angular_velocity.py:1-60, used by
PhiFlow/demos/vortex_fit.py): a set of point sources, each with a
location, a strength, and an optional radial falloff, producing the
superposed swirl velocity around every source. Any *radial* falloff keeps
the field exactly divergence-free: for v = f(|r|) r_perp,
div v = (f'/|r|) (r . r_perp) = 0 — which is why the reference demo can
fit turbulent velocity snapshots with these (tests verify this via
autodiff divergence at random points).

TPU-native form: a frozen pytree dataclass over plain arrays; sampling is
a pure broadcast-and-reduce jnp function (points x sources), so it is
jit/vmap-friendly and differentiable in location, strength, and any
falloff parameters — vortex parameters can be optimized straight through
it (examples/vortex_fit.py). The 3-D case, which the reference leaves
NotImplementedError (angular_velocity.py:38), is supported here with
vector strengths: v = f(|r|) (omega x r) is divergence-free by the same
argument.

Axis order (y, x[, z-first for 3-D: (z, y, x)]) everywhere, matching the
repo convention.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from diffpiso_tpu.fields.box import Box
from diffpiso_tpu.fields.geometry import cell_center_points
from diffpiso_tpu.fields.grid import StaggeredField


def gaussian_falloff(sigma: Any) -> Callable[[jax.Array], jax.Array]:
    """The reference demo's falloff (demos/vortex_fit.py:13-15):
    exp(-|r|^2/sigma^2)/|r|. sigma may be a scalar or per-vortex (n,) or
    (n, 1) array (differentiable)."""

    def falloff(distances: jax.Array) -> jax.Array:
        sq = jnp.sum(distances**2, -1, keepdims=True)
        sig = jnp.asarray(sigma)
        if sig.ndim == 1:
            sig = sig[:, None]
        return jnp.exp(-sq / sig**2) / jnp.sqrt(sq + 1e-12)

    return falloff


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AngularVelocity:
    """location — (n, d) source positions in (y, x) / (z, y, x) physical
    coordinates; strength — scalar or (n,) circulation strengths in 2-D,
    (n, 3) angular-velocity vectors (z, y, x components) in 3-D; falloff —
    optional callable mapping signed distances (..., n, d) to a
    (..., n, 1) radial weight (static metadata: functions aren't leaves)."""

    location: jax.Array
    strength: Any = 1.0
    falloff: Optional[Callable[[jax.Array], jax.Array]] = dataclasses.field(
        default=None, metadata=dict(static=True)
    )

    @property
    def rank(self) -> int:
        return int(self.location.shape[-1])

    def sample_at(self, points: jax.Array) -> jax.Array:
        """(*s, d) physical points -> (*s, d) summed swirl velocity
        (angular_velocity.py:14-43 sample_at)."""
        loc = jnp.asarray(self.location)
        if loc.ndim == 1:
            loc = loc[None, :]
        d = loc.shape[-1]
        dist = points[..., None, :] - loc  # (*s, n, d)
        strength = jnp.asarray(self.strength)
        if d == 2:
            if strength.ndim == 0:
                strength = strength[None]
            w = strength  # (n,)
            if self.falloff is not None:
                w = w * self.falloff(dist)[..., 0]  # (*s, n)
            dy, dx = dist[..., 0], dist[..., 1]
            # (y, x) components of the counterclockwise curl: (dx, -dy),
            # the reference's not-x-first branch (angular_velocity.py:36)
            vel = jnp.stack([w * dx, -w * dy], -1)  # (*s, n, 2)
        elif d == 3:
            if strength.ndim <= 1:
                # scalar spin about the z axis
                om = jnp.zeros(loc.shape, dtype=dist.dtype)
                om = om.at[..., 0].set(jnp.broadcast_to(strength, loc.shape[:-1]))
            else:
                om = strength  # (n, 3) in (z, y, x)
            oz, oy, ox = om[..., 0], om[..., 1], om[..., 2]
            rz, ry, rx = dist[..., 0], dist[..., 1], dist[..., 2]
            # omega x r, components expressed in (z, y, x) order
            vz = ox * ry - oy * rx
            vy = oz * rx - ox * rz
            vx = oy * rz - oz * ry
            vel = jnp.stack([vz, vy, vx], -1)
            if self.falloff is not None:
                vel = vel * self.falloff(dist)
        else:
            raise ValueError(f"rank-{d} AngularVelocity not supported")
        return jnp.sum(vel, -2)

    def at_grid(self, resolution: Sequence[int], box: Optional[Box] = None) -> jax.Array:
        """(*(resolution), d) velocity at cell centers."""
        return self.sample_at(cell_center_points(resolution, box))

    def at_staggered(
        self,
        resolution: Sequence[int],
        box: Optional[Box] = None,
        periodic: Optional[Tuple[bool, ...]] = None,
    ) -> StaggeredField:
        """Sample each component at its own MAC face centers (the
        AngularVelocity.at(staggered_grid) path the reference demo uses,
        vortex_fit.py:27)."""
        res = tuple(int(n) for n in resolution)
        d = len(res)
        periodic = periodic or (False,) * d
        box = box or Box.from_size(tuple(float(n) for n in res))
        dx = box.dx(res)
        comps = []
        for comp in range(d):
            axes = []
            for ax in range(d):
                if ax == comp:
                    nfaces = res[ax] if periodic[ax] else res[ax] + 1
                    axes.append(
                        box.lower[ax]
                        + jnp.arange(nfaces, dtype=jnp.float32) * dx[ax]
                    )
                else:
                    axes.append(
                        box.lower[ax]
                        + (jnp.arange(res[ax], dtype=jnp.float32) + 0.5) * dx[ax]
                    )
            pts = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), -1)
            comps.append(self.sample_at(pts)[..., comp])
        return StaggeredField(tuple(comps), periodic=periodic)
