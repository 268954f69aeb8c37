"""Analytic, constant, and point-sampled fields.

Capability parity with the reference's non-grid field types
(PhiFlow/phi/physics/field/analytic.py AnalyticField, constant.py
ConstantField, sampled.py SampledField): fields defined by a function,
a constant, or scattered points, all resolvable onto grids. TPU-native
form: `sample_at(points)` is any jnp-traceable function; `.at_grid()`
materializes onto cell centers, after which everything is plain arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from diffpiso_tpu.fields.box import Box
from diffpiso_tpu.fields.geometry import cell_center_points


class AnalyticField:
    """A field defined by a coordinate function (analytic.py AnalyticField).
    Subclass or wrap a function; sample_at receives (*shape, d) physical
    coordinates."""

    def __init__(self, fn: Callable[[jax.Array], jax.Array] | None = None):
        self._fn = fn

    def sample_at(self, points: jax.Array) -> jax.Array:
        if self._fn is None:
            raise NotImplementedError
        return self._fn(points)

    def at_grid(self, resolution: Sequence[int], box: Box | None = None) -> jax.Array:
        pts = cell_center_points(resolution, box)
        return self.sample_at(pts)


@dataclasses.dataclass(frozen=True)
class ConstantField(AnalyticField):
    """Spatially constant field (constant.py ConstantField)."""

    value: float = 0.0

    def sample_at(self, points):
        return jnp.full(points.shape[:-1], self.value, jnp.float32)

    def at_grid(self, resolution, box=None):
        return jnp.full(tuple(resolution), self.value, jnp.float32)


@dataclasses.dataclass(frozen=True)
class SampledField:
    """Scattered point samples (sampled.py SampledField): values at
    arbitrary locations, rasterizable onto a grid. `rasterize` scatters each
    sample bilinearly into its 2^d neighbor cells (mass-conserving; the
    adjoint of grid_sample's gather), which is the SampledField.at(grid)
    behavior."""

    points: jax.Array  # (n, d) physical coordinates
    values: jax.Array  # (n,) or (n, c)

    def rasterize(self, resolution: Sequence[int], box: Box | None = None) -> jax.Array:
        box = box or Box.from_size(tuple(float(r) for r in resolution))
        d = self.points.shape[-1]
        res = tuple(int(n) for n in resolution)
        dx = jnp.asarray(box.dx(res), self.points.dtype)
        lower = jnp.asarray(box.lower, self.points.dtype)
        idx = (self.points - lower) / dx - 0.5  # cell-center index space
        vals = self.values if self.values.ndim > 1 else self.values[:, None]
        c = vals.shape[-1]
        out = jnp.zeros(res + (c,), vals.dtype)
        lo = jnp.floor(idx).astype(jnp.int32)
        w = (idx - lo).astype(vals.dtype)
        for corner in range(2**d):
            ii = []
            weight = jnp.ones(idx.shape[0], vals.dtype)
            for ax in range(d):
                hi_bit = (corner >> (d - 1 - ax)) & 1
                i_ax = jnp.clip(lo[:, ax] + hi_bit, 0, res[ax] - 1)
                ii.append(i_ax)
                w_ax = w[:, ax] if hi_bit else 1.0 - w[:, ax]
                weight = weight * w_ax
            out = out.at[tuple(ii)].add(vals * weight[:, None])
        return out[..., 0] if self.values.ndim == 1 else out

    def sample_at(self, query: jax.Array, radius: float = 1.0) -> jax.Array:
        """Inverse-distance-weighted interpolation at query points (the
        scattered-evaluation path)."""
        d2 = jnp.sum(
            (query[..., None, :] - self.points) ** 2, -1
        )  # (*q, n)
        w = 1.0 / (d2 + (0.1 * radius) ** 2)
        w = w / jnp.sum(w, -1, keepdims=True)
        vals = self.values if self.values.ndim > 1 else self.values[:, None]
        out = jnp.einsum("...n,nc->...c", w, vals)
        return out[..., 0] if self.values.ndim == 1 else out
