"""Particle / point-sample fields and their grid rasterization.

Covers the reference's SampledField (PhiFlow/phi/physics/field/sampled.py:
15-151): a collection of sample points carrying values, rasterizable onto
centered grids (`_grid_sample`, sampled.py:37-55: nearest-cell scatter with
'mean' / 'add' / 'any' duplicate handling) and staggered grids
(`_stagger_sample`, sampled.py:57-110: per-component face binning, with the
optional occupancy-mask extrapolation post-pass via
fields/extrapolate.extrapolate — sampled.py:98-105), passively advected by
a velocity field (advect.advect → points move with the interpolated
velocity, PhiFlow/phi/physics/field/advect.py), and seedable from a binary
density mask (`distribute_points` <- `_distribute_points`,
sampled.py:185-212).

TPU-first redesign:
  * static point count N — points/values are fixed-shape arrays, so every
    operation jits, scans, vmaps and differentiates (the reference's
    scatter ops run per-session on dynamic tensors);
  * rasterization is jnp scatter-adds (`.at[idx].add`) on linearized cell
    indices — XLA lowers these to sorted segment-sums on TPU;
  * point advection reuses ops.resample.grid_sample (the multilinear
    gather kernel behind grid resampling) to interpolate each staggered
    velocity component at the particle positions.

Deviation from the reference, documented: `_grid_sample` bins a point with
`round(local * resolution)` (sampled.py:44), which maps a point at the
CENTER of cell i to the i/i+1 boundary — we bin with `floor(local *
resolution)` so every point strictly inside cell i lands in cell i. The
reference's `sample_at` raises NotImplementedError (sampled.py:21-22);
interpolating point values at arbitrary locations is likewise out of scope
here (rasterize first).

Axis order (y, x[, z…]) everywhere, matching fields/grid.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffpiso_tpu.fields.box import Box
from diffpiso_tpu.fields.grid import CenteredField, StaggeredField
from diffpiso_tpu.fields.material import CIRCULAR, REPLICATE


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SampledField:
    """Points (N, rank) in world coordinates + values (N,) or (N, ch).

    mode ('mean' | 'add' | 'any') controls how multiple points landing in
    the same cell combine when rasterized (sampled.py:17 `mode='mean'`).
    """

    points: jax.Array
    values: jax.Array
    mode: str = dataclasses.field(default="mean", metadata={"static": True})

    def __post_init__(self):
        if self.mode not in ("mean", "add", "any"):
            raise ValueError(f"unknown duplicate mode {self.mode!r}")

    @property
    def rank(self) -> int:
        return self.points.shape[-1]

    @property
    def point_count(self) -> int:
        return self.points.shape[0]

    def with_values(self, values) -> "SampledField":
        values = jnp.broadcast_to(
            jnp.asarray(values, self.points.dtype), (self.point_count,)
        ) if jnp.ndim(values) == 0 else jnp.asarray(values)
        return dataclasses.replace(self, values=values)

    # -- rasterization -----------------------------------------------------

    def to_centered(self, domain) -> CenteredField:
        """Scatter points into the cells of `domain`: nearest cell, wrapped
        on periodic axes (points that drifted out of the box bin into the
        wrapped cell, matching velocity_at_points' CIRCULAR interpolation)
        and clamped on bounded axes (sampled.py:45's edge snap)."""
        res = domain.resolution
        idx = _cell_indices(self.points, domain.box, res, domain.periodic)
        lin = _linearize(idx, res)
        n_cells = 1
        for n in res:
            n_cells *= n
        vals = self.values
        ch = () if vals.ndim == 1 else (vals.shape[-1],)
        flat = _scatter(lin, vals, n_cells, self.mode)
        return CenteredField(flat.reshape(tuple(res) + ch))

    def to_staggered(self, domain, extrapolation_distance: int = 0) -> StaggeredField:
        """Scatter vector values (N, rank) onto the face grids of `domain`
        (sampled.py:57-110 `_stagger_sample`).

        extrapolation_distance > 0 runs the reference's occupancy-mask
        post-pass (sampled.py:98-105: `extrapolate(grid_values,
        active_mask, voxel_distance=2)`): the occupancy mask is eroded so
        only cells whose axis neighbors are all occupied count as valid
        (sampled.py:98-99), then faces outside get values propagated from
        the liquid — what FLIP-style solvers need at liquid boundaries,
        where half-covered faces would otherwise read 0."""
        if self.values.ndim != 2 or self.values.shape[-1] != self.rank:
            raise ValueError(
                "staggered rasterization needs (N, rank) vector values, got "
                f"{self.values.shape}"
            )
        res = domain.resolution
        periodic = domain.periodic
        local = _local(self.points, domain.box)
        comps = []
        for d in range(self.rank):
            idx = []
            shape = []
            for ax in range(self.rank):
                n = res[ax]
                c = local[:, ax] * n
                if ax == d:  # faces at integer index coords
                    i = jnp.round(c).astype(jnp.int32)
                    if periodic[ax]:
                        # periodic axes store only the n unique faces
                        # (fields/grid.py StaggeredField layout): face n IS
                        # face 0, so wrap instead of allocating a duplicate
                        i = jnp.mod(i, n)
                        shape.append(n)
                    else:
                        i = jnp.clip(i, 0, n)
                        shape.append(n + 1)
                else:
                    i = jnp.floor(c).astype(jnp.int32)
                    i = jnp.mod(i, n) if periodic[ax] else jnp.clip(i, 0, n - 1)
                    shape.append(n)
                idx.append(i)
            size = 1
            for n in shape:
                size *= n
            flat = _scatter(_linearize(idx, shape), self.values[:, d], size,
                            self.mode)
            comps.append(flat.reshape(tuple(shape)))
        grid = StaggeredField(tuple(comps), periodic=periodic)
        if extrapolation_distance > 0:
            from diffpiso_tpu.fields.extrapolate import extrapolate

            occ = self.occupancy(domain).data
            # erode: valid iff the cell AND its +-1 axis neighbors are all
            # occupied (out-of-domain counts empty) — sampled.py:98-99
            active = occ
            for d in range(self.rank):
                pads = [(0, 0)] * self.rank
                pads[d] = (1, 1)
                padded = jnp.pad(occ, pads)
                lo = jax.lax.slice_in_dim(padded, 0, occ.shape[d], axis=d)
                hi = jax.lax.slice_in_dim(padded, 2, occ.shape[d] + 2, axis=d)
                active = jnp.minimum(active, jnp.minimum(lo, hi))
            grid, _ = extrapolate(
                grid, active, voxel_distance=extrapolation_distance,
                dx=domain.dx,
            )
        return grid

    def occupancy(self, domain) -> CenteredField:
        """1.0 in every cell containing at least one point ('any' mode,
        sampled.py:71's active_mask)."""
        return dataclasses.replace(
            self, values=jnp.ones((self.point_count,), self.points.dtype),
            mode="any",
        ).to_centered(domain)


def _local(points, box: Box):
    lower = jnp.asarray(box.lower, points.dtype)
    size = jnp.asarray(box.size, points.dtype)
    return (points - lower) / size


def _cell_indices(points, box: Box, res, periodic=None):
    if periodic is None:
        periodic = (False,) * len(res)
    local = _local(points, box)
    idx = []
    for ax, n in enumerate(res):
        i = jnp.floor(local[:, ax] * n).astype(jnp.int32)
        idx.append(jnp.mod(i, n) if periodic[ax] else jnp.clip(i, 0, n - 1))
    return idx


def _linearize(idx, res):
    lin = jnp.zeros_like(idx[0])
    stride = 1
    for i, n in zip(reversed(idx), reversed(tuple(res))):
        lin = lin + i * stride
        stride *= n
    return lin


def _scatter(lin, vals, n_cells, mode):
    ch = () if vals.ndim == 1 else (vals.shape[-1],)
    if mode == "any":
        out = jnp.zeros((n_cells,) + ch, vals.dtype)
        return out.at[lin].max(jnp.ones_like(vals))
    total = jnp.zeros((n_cells,) + ch, vals.dtype).at[lin].add(vals)
    if mode == "add":
        return total
    count = jnp.zeros((n_cells,), vals.dtype).at[lin].add(1.0)
    if ch:
        count = count[:, None]
    return total / jnp.maximum(count, 1.0)


def velocity_at_points(
    velocity: StaggeredField, points: jax.Array, box: Box
) -> jax.Array:
    """Multilinear interpolation of a staggered velocity at world-space
    points → (N, rank). Component d lives on faces: integer index coords
    along axis d (face i at i·dx), cell centers (index − ½) elsewhere."""
    from diffpiso_tpu.ops.resample import grid_sample

    rank = points.shape[-1]
    res = velocity.resolution
    local = _local(points, box)
    cols = []
    for d, comp in enumerate(velocity.components):
        coords = []
        for ax in range(rank):
            c = local[:, ax] * res[ax]
            coords.append(c if ax == d else c - 0.5)
        modes = tuple(
            CIRCULAR if velocity.periodic[ax] else REPLICATE
            for ax in range(rank)
        )
        cols.append(grid_sample(comp, jnp.stack(coords, -1), modes))
    return jnp.stack(cols, -1)


def advect_points(
    field: SampledField,
    velocity: StaggeredField,
    box: Box,
    dt,
    clamp: bool = False,
) -> SampledField:
    """Move the sample points with the interpolated velocity (forward
    Euler — the reference's advect.advect on SampledFields). clamp=True
    keeps points inside the box (rasterization clamps regardless)."""
    vel = velocity_at_points(velocity, field.points, box)
    pts = field.points + jnp.asarray(dt, field.points.dtype) * vel
    if clamp:
        lower = jnp.asarray(box.lower, pts.dtype)
        upper = jnp.asarray(box.upper, pts.dtype)
        pts = jnp.clip(pts, lower, upper)
    return dataclasses.replace(field, points=pts)


def distribute_points(
    density,
    particles_per_cell: int = 1,
    distribution: str = "uniform",
    key=None,
    box: Optional[Box] = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Seed `particles_per_cell` points in every active cell of a binary
    density mask (the reference's `_distribute_points`,
    phi/physics/field/sampled.py:185-212). 'center' places points at cell
    centers, 'uniform' jitters them uniformly inside the cell
    (deterministically, via counter-based `key`; default PRNGKey(0) — the
    reference uses an unseeded math.random_uniform).

    Host-side seeding utility (the point count is data-dependent, so this
    cannot run under jit — the reference has the same restriction, raising
    on ragged batches at sampled.py:208-211; batch by calling per sample).
    Returns (n_active * particles_per_cell, rank) points in INDEX
    coordinates like the reference (cell i spans [i, i+1)), or in world
    coordinates when `box` is given (the SampledField convention here)."""
    if distribution not in ("center", "uniform"):
        raise ValueError(f"unknown distribution {distribution!r}")
    dens = np.asarray(density)
    idx = np.argwhere(dens > 0).astype(np.float64)  # (M, rank)
    reps = np.tile(idx, (particles_per_cell, 1))
    if distribution == "center":
        pts = reps + 0.5
    else:
        if key is None:
            key = jax.random.PRNGKey(0)
        pts = reps + np.asarray(
            jax.random.uniform(key, reps.shape, jnp.float32), np.float64
        )
    pts = jnp.asarray(pts, dtype)
    if box is not None:
        res = jnp.asarray(dens.shape, dtype)
        pts = (
            jnp.asarray(box.lower, dtype)
            + pts / res * jnp.asarray(box.size, dtype)
        )
    return pts


def regular_points(box: Box, count: int, dtype=jnp.float32) -> jax.Array:
    """count^rank points on a regular lattice of cell centers inside `box`
    (the marker demo's regular_locations, PhiFlow/demos/marker.py:19-20)."""
    rank = len(box.lower)
    axes = [
        jnp.asarray(box.lower[d], dtype)
        + (jnp.arange(count, dtype=dtype) + 0.5) / count
        * jnp.asarray(box.size[d], dtype)
        for d in range(rank)
    ]
    grids = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack([g.reshape(-1) for g in grids], -1)
