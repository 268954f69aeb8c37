"""Explicit halo-exchange stencil application under shard_map.

The manual-collective alternative to the GSPMD path in parallel/sharding.py
(SURVEY.md par.5: "spatial domain decomposition via shard_map over the TPU
mesh, halo exchange with ppermute over ICI"). Where GSPMD chooses its own
collectives for jnp.roll on sharded axes, this path states them explicitly:
one lax.ppermute per direction moves a single edge plane to the neighbor
shard (ICI nearest-neighbor traffic), the five-point MAC runs on the local
block, and solver dot products reduce with jax.lax.psum. Equality with the
single-device operator is asserted in tests/test_parallel.py on a virtual
8-device mesh — the reference has no distributed story at all (SURVEY.md
par.2.5), so this layer is validated against our own global operator.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from diffpiso_tpu.ops.laplace import LaplaceStencil


def _neighbor_perm(n: int, forward: bool):
    """Cyclic permutation of mesh positions along one axis."""
    if forward:
        return [(i, (i + 1) % n) for i in range(n)]
    return [((i + 1) % n, i) for i in range(n)]


def roll_sharded(x: jax.Array, shift: int, axis: int, axis_name: str | None):
    """jnp.roll(x, shift, axis) semantics for a block-sharded axis: move the
    wrapping edge plane between neighbor shards with ppermute. shift must be
    +-1 (5-point stencils). axis_name None means the axis is local."""
    if axis_name is None:
        return jnp.roll(x, shift, axis)
    n = jax.lax.psum(1, axis_name)  # mesh extent along the axis
    if n == 1:
        return jnp.roll(x, shift, axis)
    if shift == 1:
        # global roll down: each shard receives its up-neighbor's last plane
        edge = jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)
        recv = jax.lax.ppermute(edge, axis_name, _neighbor_perm(n, True))
        body = jax.lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)
        return jnp.concatenate([recv, body], axis)
    if shift == -1:
        edge = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
        recv = jax.lax.ppermute(edge, axis_name, _neighbor_perm(n, False))
        body = jax.lax.slice_in_dim(x, 1, x.shape[axis], axis=axis)
        return jnp.concatenate([body, recv], axis)
    raise ValueError("halo roll supports shift +-1 only")


def _local_apply(center, lo, hi, shift, p, axis_names, mesh_axes):
    z = center * p
    for d in range(p.ndim):
        z = z + lo[d] * roll_sharded(p, 1, d, axis_names[d])
        z = z + hi[d] * roll_sharded(p, -1, d, axis_names[d])
    # rank-one shift needs the GLOBAL sum of p
    total = jnp.sum(p)
    for name in mesh_axes:
        total = jax.lax.psum(total, name)
    return z + shift * total


def make_sharded_laplacian_apply(
    st: LaplaceStencil, mesh: Mesh, axis_names: Sequence[str | None] = ("y", "x")
):
    """Build apply(p) = L p with explicit halo exchange over `mesh`.

    The stencil planes are sharded the same way as p. Returns a jittable
    function of the (globally-shaped) pressure array."""
    mesh_axes = tuple(n for n in axis_names if n is not None)
    spec = P(*axis_names)

    def inner(center, lo, hi, p):
        return _local_apply(
            center, lo, hi, jnp.asarray(st.shift, p.dtype), p, axis_names, mesh_axes
        )

    shard_fn = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(spec, (spec,) * len(st.lo), (spec,) * len(st.hi), spec),
        out_specs=spec,
    )

    def apply_fn(p):
        return shard_fn(st.center, tuple(st.lo), tuple(st.hi), p)

    return apply_fn


def sharded_dot(axis_names: Sequence[str]):
    """Inside shard_map: global dot product via local sum + psum (the
    distributed-Krylov reduction, SURVEY.md par.5 'communication backend')."""

    def dot(a, b):
        s = jnp.sum(a * b)
        for name in axis_names:
            s = jax.lax.psum(s, name)
        return s

    return dot
