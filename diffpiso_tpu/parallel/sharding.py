"""Device-mesh scaling: spatial domain decomposition + data parallelism.

The reference is single-GPU (SURVEY.md par.2.5); this module is the designed
-in TPU scaling story. The solver is built entirely from 5-point stencil
shift-multiply-accumulates (jnp.roll) and global reductions (solver dot
products) — exactly the two patterns XLA's SPMD partitioner handles
natively:

  * rolls over sharded axes become halo collective-permutes over ICI,
  * jnp.sum reductions become on-chip partial sums + psum.

So the multi-chip path is: build a Mesh, place the state with
NamedShardings, jit the same piso_step — GSPMD inserts the halo exchanges
and all-reduces. No NCCL-style porting, no separate distributed solver.

Axes convention:
  'data'  — batch of independent simulations (DP)
  'y','x' — spatial decomposition of the grid (the CP/SP analog for grid
            solvers; halo traffic rides ICI)

Staggered components carry +1 faces on non-periodic axes, which may not
divide the mesh axis; spatial_spec falls back to replication on such axes
(periodic configs shard perfectly — unique faces have exact resolution
shapes). An explicitly halo-exchanged shard_map kernel path can replace
GSPMD where its collectives prove suboptimal; measure first.

IMPORTANT: trace spatially-sharded jits inside `no_pallas()` (re-exported
here from ops/pallas_stencil.py). The single-chip fast path dispatches to
Pallas kernels, which the GSPMD partitioner treats as opaque custom-calls;
the roll/reduction formulation is the one that partitions.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diffpiso_tpu.fields.grid import StaggeredField


def make_mesh(
    shape: Sequence[int],
    axis_names: Sequence[str] = ("y", "x"),
    devices=None,
) -> Mesh:
    """Mesh over the first prod(shape) devices. E.g. make_mesh((4, 2)) for a
    4x2 spatial grid, or make_mesh((8,), ('data',)) for pure DP."""
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(shape))
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.array(devices[:n]).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def spatial_spec(
    shape: Tuple[int, ...],
    mesh: Mesh,
    spatial_axes: Sequence[Optional[str]] = ("y", "x"),
    leading_axes: Sequence[Optional[str]] = (),
) -> P:
    """PartitionSpec for an array whose trailing dims are the spatial grid.
    A spatial dim is sharded over its mesh axis only when evenly divisible
    (staggered +1 faces otherwise replicate along that axis)."""
    n_lead = len(shape) - len(spatial_axes)
    entries = list(leading_axes) + [None] * (n_lead - len(leading_axes))
    for dim, name in zip(shape[n_lead:], spatial_axes):
        if name is not None and name in mesh.shape and dim % mesh.shape[name] == 0:
            entries.append(name)
        else:
            entries.append(None)
    return P(*entries)


def shard_field(field: StaggeredField, mesh: Mesh, leading_axes=()) -> StaggeredField:
    comps = tuple(
        jax.device_put(
            c, NamedSharding(mesh, spatial_spec(c.shape, mesh, leading_axes=leading_axes))
        )
        for c in field.components
    )
    return StaggeredField(comps, periodic=field.periodic)


def shard_piso_args(vel: StaggeredField, p: jax.Array, mesh: Mesh, leading_axes=()):
    """Place a (velocity, pressure) state onto the mesh."""
    vel = shard_field(vel, mesh, leading_axes)
    p = jax.device_put(
        p, NamedSharding(mesh, spatial_spec(p.shape, mesh, leading_axes=leading_axes))
    )
    return vel, p


def with_spatial_sharding(tree, mesh: Mesh, leading_axes=()):
    """Apply lax.with_sharding_constraint with spatial specs to every array
    leaf of a pytree (use inside jitted functions to pin layouts)."""

    def constrain(a):
        return jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, spatial_spec(a.shape, mesh, leading_axes=leading_axes))
        )

    return jax.tree_util.tree_map(constrain, tree)
