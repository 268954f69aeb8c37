"""Occupancy-mask field extrapolation and surface masks (FLIP-style seeding).

Covers the reference's `extrapolate` and `create_surface_mask`
(PhiFlow/phi/physics/field/util.py:68-200): build a signed distance field
from a binary liquid mask (negative inside, zero on the inner contour) and
propagate field values from the liquid surface into the empty cells, up to
`voxel_distance` cells out. SampledField.to_staggered uses this to give
faces at the liquid boundary values from inside the liquid (the reference's
`_stagger_sample` post-pass, phi/physics/field/sampled.py:104) — otherwise
FLIP-style solvers see zero velocities on half-covered faces.

TPU-first redesign notes:
  * no batch dimension (vmap supplies batching) and no struct plumbing —
    inputs are a plain centered array or a StaggeredField pytree plus a
    binary (res…) mask;
  * the direction sweeps are static python loops over the 3^rank - 1
    neighbor offsets with `voxel_distance` outer repetitions — everything
    is shape-static jnp select/pad, so the whole pass jits, vmaps and
    scans (the reference builds one TF graph per call);
  * distances accumulate in the mask's dtype; ties and update gating
    reproduce the reference exactly (|candidate| < |current|, surface
    cells pinned at distance 0, field updates only in empty cells).

Axis order (y, x[, z…]) matching fields/grid.py.
"""

from __future__ import annotations

import itertools

import jax.numpy as jnp
import numpy as np

from diffpiso_tpu.fields.grid import StaggeredField


def _directions(rank: int):
    return [
        np.asarray(d)
        for d in itertools.product(*([(-1, 0, 1)] * rank))
        if any(v != 0 for v in d)
    ]


def _shift(a, d, rank: int, mode: str = "symmetric"):
    """out[x] = a[x - d] with edge padding (`symmetric` clamps like the
    reference's main sweeps, `constant` zero-fills like its mask pass).
    Trailing (channel) dims beyond `rank` pass through."""
    pads, idx = [], []
    for i in range(rank):
        if d[i] == 1:
            pads.append((1, 0))
            idx.append(slice(0, -1))
        elif d[i] == -1:
            pads.append((0, 1))
            idx.append(slice(1, None))
        else:
            pads.append((0, 0))
            idx.append(slice(None))
    pads += [(0, 0)] * (a.ndim - rank)
    idx += [slice(None)] * (a.ndim - rank)
    return jnp.pad(a, pads, mode=mode)[tuple(idx)]


def create_surface_mask(liquid_mask):
    """Inner contour of a binary mask: 1 where the cell is liquid AND at
    least one of its 3^rank - 1 neighbors (incl. diagonals; out-of-domain
    counts as empty) is not (phi/physics/field/util.py:174-200)."""
    mask = jnp.asarray(liquid_mask)
    rank = mask.ndim
    bcs = jnp.zeros_like(mask)
    for d in _directions(rank):
        shifted = _shift(mask, d, rank, mode="constant")
        bcs = jnp.maximum(bcs, jnp.maximum(shifted, mask) - shifted)
    return bcs


def extrapolate(input_field, valid_mask, voxel_distance: int = 10, dx=None):
    """Extrapolate `input_field` from the cells marked valid into the empty
    cells, following the reference's signed-distance sweep
    (phi/physics/field/util.py:68-172).

    input_field — a centered array (*res[, ch]) or a StaggeredField (the
        staggered variant runs the extra positive-axis pre-pass: the +d face
        of an occupied cell already carries a valid value for component d,
        so those faces seed the sweep instead of being overwritten).
    valid_mask — binary (*res) occupancy (liquid) mask.
    voxel_distance — static sweep count = how many cells out values and the
        signed distance are propagated (reference default 10; the
        SampledField rasterization pass uses 2).
    dx — per-axis cell sizes for the metric (default 1s).

    Returns (extrapolated_field, signed_distance): distance is negative in
    the liquid, ~0 on the inner contour, positive outside, clamped to
    ±voxel_distance past the propagation horizon; shape (*res) (the
    staggered variant computes it on the (res+1) node lattice and crops,
    matching util.py:165-168)."""
    staggered = isinstance(input_field, StaggeredField)
    mask = jnp.asarray(valid_mask)
    if staggered:
        rank = input_field.rank
        ext = input_field.staggered_tensor()
        mask = jnp.pad(mask, [(0, 1)] * rank)  # util.py:80-81
    else:
        ext = jnp.asarray(input_field)
        rank = mask.ndim
    dtype = ext.dtype
    mask = mask.astype(dtype)
    if dx is None:
        dx = (1.0,) * rank
    dx = np.asarray(dx, np.float64)

    signs = -(2.0 * mask - 1.0)
    s_dist = 2.0 * (voxel_distance + 1) * signs
    surface = create_surface_mask(mask)
    s_dist = jnp.where(surface >= 1, jnp.zeros_like(s_dist), s_dist)

    has_ch = ext.ndim > rank

    def candidates(d, dist_ref):
        step = float(np.sqrt(np.dot(dx * d, dx * d)))
        d_field = _shift(ext, d, rank)
        d_dist = _shift(dist_ref, d, rank) + step * signs
        return d_field, d_dist

    if staggered:
        # positive-axis pre-pass (util.py:99-130): propagate one cell in
        # each +axis direction, leaving component i untouched when d[i]=1
        for i in range(rank):
            d = np.zeros(rank, np.int64)
            d[i] = 1
            d_field, d_dist = candidates(d, s_dist)
            updates = (jnp.abs(d_dist) < jnp.abs(s_dist)) & (surface <= 0)
            upd_vel = updates & (signs > 0)
            ch_mask = jnp.stack(
                [
                    jnp.zeros_like(upd_vel) if c == i else upd_vel
                    for c in range(rank)
                ],
                axis=-1,
            )
            ext = jnp.where(ch_mask, d_field, ext)
            s_dist = jnp.where(updates, d_dist, s_dist)

    for _ in range(voxel_distance):
        buffered = s_dist
        for d in _directions(rank):
            d_field, d_dist = candidates(d, s_dist)
            updates = (jnp.abs(d_dist) < jnp.abs(buffered)) & (surface <= 0)
            upd_vel = updates & (signs > 0)
            if has_ch:
                upd_vel = upd_vel[..., None]
            ext = jnp.where(upd_vel, d_field, ext)
            buffered = jnp.where(updates, d_dist, buffered)
        s_dist = buffered

    # cut off values past the propagation horizon (util.py:161-163)
    limit = -voxel_distance * (2.0 * mask - 1.0)
    s_dist = jnp.where(jnp.abs(s_dist) < voxel_distance, s_dist, limit)

    if staggered:
        out = StaggeredField.from_staggered_tensor(
            ext, periodic=input_field.periodic
        )
        s_dist = s_dist[(slice(0, -1),) * rank]
        return out, s_dist
    return ext, s_dist
