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


# -- full distributed CG inside one shard_map region --------------------------------


def make_sharded_cg(
    mesh: Mesh,
    axis_names: Sequence[str | None] = ("y", "x"),
    tol: float = 1e-6,
    max_iter: int = 2000,
    residual_reset: int = 50,
    deflate_mean: bool = False,
):
    """Distributed pressure CG with EXPLICIT collectives (the scaled-out
    replacement for the reference's single-GPU CG loop,
    pressure_solve_op.cu.cc:257-357): the entire Krylov iteration lives in
    ONE shard_map region, so per iteration the only cross-chip traffic is

      * one edge plane per sharded axis per direction (lax.ppermute — ICI
        nearest-neighbor) inside the 5-point MAC, and
      * the scalar reductions (alpha/beta dots, max|r|, mean deflation,
        rank-one shift) via lax.psum / pmax.

    This is the manual-collective twin of the GSPMD path that
    solve_pressure_system takes when the state is sharded; equality with
    the global solver is asserted in tests/test_parallel.py. Per-shard
    compute uses the jnp roll formulation (inside shard_map a future
    per-shard Pallas kernel is legal — unlike under GSPMD — because the
    collectives are already explicit).

    Returns solve(stencil, b, x0=None) -> (x, iterations, warn) operating
    on globally-shaped, mesh-sharded arrays.
    """
    mesh_axes = tuple(n for n in axis_names if n is not None)
    spec = P(*axis_names)
    dot = sharded_dot(mesh_axes)

    def _gsum(v):
        for name in mesh_axes:
            v = jax.lax.psum(v, name)
        return v

    def _gmax(v):
        for name in mesh_axes:
            v = jax.lax.pmax(v, name)
        return v

    def inner(center, lo, hi, shift, n_total, b, x0):
        dtype = b.dtype
        tol_ = jnp.asarray(tol, dtype)
        eps = jnp.asarray(1e-30, dtype)

        def apply_A(p):
            return _local_apply(center, lo, hi, shift, p, axis_names, mesh_axes)

        def project(r):
            if not deflate_mean:
                return r
            return r - _gsum(jnp.sum(r)) / n_total

        def matvec_resid(x):
            return project(b - apply_A(x))

        # x0 arrives as an array (zeros for a cold start: A 0 = 0, so the
        # extra matvec is exact and the cold/warm paths unify)
        r0 = matvec_resid(x0)
        x_init = x0
        rnorm0 = _gmax(jnp.max(jnp.abs(r0)))

        def cond(state):
            x, r, p, k, done = state
            return (~done) & (k < max_iter)

        def body(state):
            x, r, p, k, done = state
            if residual_reset > 0:
                def reset(args):
                    x, r, p = args
                    rr = matvec_resid(x)
                    return x, rr, rr

                x, r, p = jax.lax.cond(
                    (k + 1) % residual_reset == 0, reset, lambda a: a, (x, r, p)
                )
            z = apply_A(p)
            pz = dot(p, z)
            pr = dot(p, r)
            alpha = jnp.where(jnp.abs(pz) > eps, pr / pz, 0.0)
            x = x + alpha * p
            r = project(r - alpha * z)
            rnorm = _gmax(jnp.max(jnp.abs(r)))
            beta = jnp.where(jnp.abs(pz) > eps, -dot(r, z) / pz, 0.0)
            p = r + beta * p
            done = (rnorm < tol_) | ~jnp.isfinite(rnorm)
            return (x, r, p, k + 1, done)

        x, r, p, k, _ = jax.lax.while_loop(
            cond, body, (x_init, r0, r0, jnp.zeros((), jnp.int32), rnorm0 < tol_)
        )
        rtrue = matvec_resid(x)
        rnorm = _gmax(jnp.max(jnp.abs(rtrue)))
        warn = (~jnp.isfinite(rnorm)) | (rnorm > 100.0 * tol_)
        return x, k, warn

    def solve(st: LaplaceStencil, b, x0=None):
        n_total = 1.0
        for d in b.shape:
            n_total *= d
        shard_fn = jax.shard_map(
            lambda c, lo, hi, bb, xx: inner(
                c, lo, hi, jnp.asarray(st.shift, b.dtype),
                jnp.asarray(n_total, b.dtype), bb, xx,
            ),
            mesh=mesh,
            in_specs=(spec, (spec,) * len(st.lo), (spec,) * len(st.hi), spec, spec),
            out_specs=(spec, P(), P()),
        )
        x0_arr = jnp.zeros_like(b) if x0 is None else x0
        return shard_fn(st.center, tuple(st.lo), tuple(st.hi), b, x0_arr)

    return solve
