"""Geometries (Sphere, Union, box geometry) and geometry masks.

Capability parity with the reference's geometry layer (PhiFlow/phi/geom/
_sphere.py, _union.py, _geom.py) and GeometryMask / union_mask
(PhiFlow/phi/physics/field/mask.py). Geometries are static dataclasses;
mask sampling is pure jnp so masks can be built inside jit.
"""

from __future__ import annotations

import dataclasses
import math as _math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from diffpiso_tpu.fields.box import Box


class Geometry:
    """Protocol: lies_inside(points)->bool mask, approximate_signed_distance
    (negative inside), center, bounding_radius, shifted(delta)."""

    def lies_inside(self, points: jax.Array) -> jax.Array:
        raise NotImplementedError

    def approximate_signed_distance(self, points: jax.Array) -> jax.Array:
        raise NotImplementedError

    def shifted(self, delta) -> "Geometry":
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Sphere(Geometry):
    """N-d sphere; center in (y, x, ...) physical coordinates
    (phi/geom/_sphere.py)."""

    center: Tuple[float, ...]
    radius: float

    def __post_init__(self):
        object.__setattr__(self, "center", tuple(float(c) for c in self.center))
        object.__setattr__(self, "radius", float(self.radius))

    def lies_inside(self, points):
        c = jnp.asarray(self.center, points.dtype)
        return jnp.sum((points - c) ** 2, -1) <= self.radius**2

    def approximate_signed_distance(self, points):
        c = jnp.asarray(self.center, points.dtype)
        return jnp.sqrt(jnp.sum((points - c) ** 2, -1)) - self.radius

    @property
    def bounding_radius(self) -> float:
        return self.radius

    def shifted(self, delta) -> "Sphere":
        return Sphere(
            tuple(c + float(d) for c, d in zip(self.center, delta)), self.radius
        )


@dataclasses.dataclass(frozen=True)
class BoxGeometry(Geometry):
    """A Box as a solid geometry (phi/geom/_box.py AABox.value_at)."""

    box: Box

    def lies_inside(self, points):
        lo = jnp.asarray(self.box.lower, points.dtype)
        hi = jnp.asarray(self.box.upper, points.dtype)
        return jnp.all((points >= lo) & (points <= hi), -1)

    def approximate_signed_distance(self, points):
        lo = jnp.asarray(self.box.lower, points.dtype)
        hi = jnp.asarray(self.box.upper, points.dtype)
        center = 0.5 * (lo + hi)
        half = 0.5 * (hi - lo)
        d = jnp.abs(points - center) - half
        return jnp.max(d, -1)  # exact on faces, outer-box approximation at corners

    @property
    def bounding_radius(self) -> float:
        return 0.5 * _math.sqrt(sum(s**2 for s in self.box.size))

    def shifted(self, delta) -> "BoxGeometry":
        lower = tuple(l + float(d) for l, d in zip(self.box.lower, delta))
        upper = tuple(u + float(d) for u, d in zip(self.box.upper, delta))
        return BoxGeometry(Box(lower, upper))


@dataclasses.dataclass(frozen=True)
class RotatedBox(Geometry):
    """A 2-D box rotated by `angle` radians (counter-clockwise in the
    (y, x) plane) about its center — the geometry behind the reference's
    rotating obstacles (PhiFlow/demos/rotating_bar.py:5-8 rotates the bar
    geometry each step via `geometry.rotated(angular_velocity * dt)`;
    phi/geom/_geom.py Geometry.rotated). Points are tested by rotating
    them INTO the box frame, so masks stay pure jnp and jit-safe."""

    center: Tuple[float, float]
    half_size: Tuple[float, float]
    angle: float

    def __post_init__(self):
        object.__setattr__(self, "center", tuple(float(c) for c in self.center))
        object.__setattr__(
            self, "half_size", tuple(float(h) for h in self.half_size)
        )
        object.__setattr__(self, "angle", float(self.angle))

    def _local(self, points):
        c = jnp.asarray(self.center, points.dtype)
        d = points - c
        cos, sin = _math.cos(self.angle), _math.sin(self.angle)
        # inverse rotation of the (y, x) components: R(-angle) @ d
        y = cos * d[..., 0] + sin * d[..., 1]
        x = -sin * d[..., 0] + cos * d[..., 1]
        return jnp.stack([y, x], -1)

    def lies_inside(self, points):
        local = jnp.abs(self._local(points))
        half = jnp.asarray(self.half_size, points.dtype)
        return jnp.all(local <= half, -1)

    def approximate_signed_distance(self, points):
        half = jnp.asarray(self.half_size, points.dtype)
        d = jnp.abs(self._local(points)) - half
        return jnp.max(d, -1)

    @property
    def bounding_radius(self) -> float:
        return _math.sqrt(sum(h**2 for h in self.half_size))

    def shifted(self, delta) -> "RotatedBox":
        return RotatedBox(
            tuple(c + float(d) for c, d in zip(self.center, delta)),
            self.half_size,
            self.angle,
        )

    def rotated(self, dangle: float) -> "RotatedBox":
        return RotatedBox(self.center, self.half_size, self.angle + float(dangle))


def rotated(geometry: Geometry, angle: float) -> Geometry:
    """Rotate a geometry about its center (phi/geom Geometry.rotated).
    Boxes become RotatedBox; spheres are rotation-invariant; RotatedBox
    accumulates the angle."""
    if isinstance(geometry, (RotatedBox, Sphere)):
        return geometry.rotated(angle) if isinstance(geometry, RotatedBox) else geometry
    if isinstance(geometry, BoxGeometry):
        lo, hi = geometry.box.lower, geometry.box.upper
        center = tuple(0.5 * (l + u) for l, u in zip(lo, hi))
        half = tuple(0.5 * (u - l) for l, u in zip(lo, hi))
        return RotatedBox(center, half, angle)
    if isinstance(geometry, Union):
        raise NotImplementedError(
            "rotated(Union): rotate members individually (member centers move)"
        )
    raise NotImplementedError(type(geometry).__name__)


@dataclasses.dataclass(frozen=True)
class Union(Geometry):
    """Union of geometries (phi/geom/_union.py)."""

    geometries: Tuple[Geometry, ...]

    def __post_init__(self):
        object.__setattr__(self, "geometries", tuple(self.geometries))

    def lies_inside(self, points):
        if not self.geometries:
            return jnp.zeros(points.shape[:-1], bool)
        inside = self.geometries[0].lies_inside(points)
        for g in self.geometries[1:]:
            inside = inside | g.lies_inside(points)
        return inside

    def approximate_signed_distance(self, points):
        dists = [g.approximate_signed_distance(points) for g in self.geometries]
        return jnp.min(jnp.stack(dists), 0)

    def shifted(self, delta) -> "Union":
        return Union(tuple(g.shifted(delta) for g in self.geometries))


def union(*geometries) -> Geometry:
    geoms = geometries[0] if len(geometries) == 1 and isinstance(
        geometries[0], (list, tuple)
    ) else geometries
    return Union(tuple(geoms))


def cell_center_points(resolution: Sequence[int], box: Box | None = None) -> jax.Array:
    """(*(resolution), d) physical coordinates of cell centers."""
    box = box or Box.from_size(tuple(float(r) for r in resolution))
    dx = box.dx(resolution)
    axes = [
        box.lower[i] + (jnp.arange(n, dtype=jnp.float32) + 0.5) * dx[i]
        for i, n in enumerate(resolution)
    ]
    grids = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack(grids, -1)


def geometry_mask(
    geometry: Geometry,
    resolution: Sequence[int],
    box: Box | None = None,
    antialias: bool = False,
) -> jax.Array:
    """Sample a geometry as a 0/1 (or smoothed) cell-centered mask
    (mask.py GeometryMask.sample_at). With antialias, the mask ramps linearly
    over one cell width using the signed distance — the cheap TPU-friendly
    stand-in for the reference's exact cell-coverage integral."""
    box = box or Box.from_size(tuple(float(r) for r in resolution))
    pts = cell_center_points(resolution, box)
    if not antialias:
        return geometry.lies_inside(pts).astype(jnp.float32)
    dxm = min(box.dx(resolution))
    sd = geometry.approximate_signed_distance(pts)
    return jnp.clip(0.5 - sd / dxm, 0.0, 1.0)


def union_mask(geometries, resolution, box=None) -> jax.Array:
    return geometry_mask(union(tuple(geometries)), resolution, box)
