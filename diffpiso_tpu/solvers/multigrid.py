"""Geometric (aggregation) multigrid preconditioner for the pressure solve.

A designed-in improvement over the reference, whose pressure CG runs
unpreconditioned (pressure_solve_op.cu.cc:257-357) and therefore needs
O(N) iterations at N^2 resolution. One V-cycle of aggregation multigrid
per CG iteration makes the iteration count resolution-independent (~10-15),
and every ingredient — block-sum restriction, piecewise-constant
prolongation, damped Jacobi smoothing, 5-point stencil matvecs — is a dense
reshape/elementwise op that XLA fuses cleanly on the VPU.

Coarsening is Galerkin (RAP) for piecewise-constant transfer operators,
computed directly on the stencil coefficients:

  lo_x_coarse[J,I]  = sum of the two fine lo_x faces crossing the coarse
                      face (and likewise hi/lo_y/hi_y)
  center_coarse     = sum of the 2x2 block's centers plus the couplings
                      internal to the block

which preserves symmetry and keeps dead (zero) rows dead, so masked
geometries coarsen consistently.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from diffpiso_tpu.ops.laplace import LaplaceStencil, apply_laplacian


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MGHierarchy:
    levels: Tuple[LaplaceStencil, ...]
    pre_smooth: int = dataclasses.field(default=2, metadata=dict(static=True))
    post_smooth: int = dataclasses.field(default=2, metadata=dict(static=True))
    coarse_iters: int = dataclasses.field(default=24, metadata=dict(static=True))
    damping: float = dataclasses.field(default=0.7, metadata=dict(static=True))


def _block_sum(a: jax.Array) -> jax.Array:
    ny, nx = a.shape
    return a.reshape(ny // 2, 2, nx // 2, 2).sum((1, 3))


def _coarsen(st: LaplaceStencil) -> LaplaceStencil:
    lo_y, lo_x = st.lo
    hi_y, hi_x = st.hi
    c = st.center
    # faces crossing coarse boundaries
    lo_x_c = lo_x[0::2, 0::2] + lo_x[1::2, 0::2]
    hi_x_c = hi_x[0::2, 1::2] + hi_x[1::2, 1::2]
    lo_y_c = lo_y[0::2, 0::2] + lo_y[0::2, 1::2]
    hi_y_c = hi_y[1::2, 0::2] + hi_y[1::2, 1::2]
    # centers: block sum of centers + intra-block couplings
    center_c = _block_sum(c)
    center_c = center_c + lo_x[0::2, 1::2] + lo_x[1::2, 1::2]
    center_c = center_c + hi_x[0::2, 0::2] + hi_x[1::2, 0::2]
    center_c = center_c + lo_y[1::2, 0::2] + lo_y[1::2, 1::2]
    center_c = center_c + hi_y[0::2, 0::2] + hi_y[0::2, 1::2]
    return LaplaceStencil(
        center=center_c,
        lo=(lo_y_c, lo_x_c),
        hi=(hi_y_c, hi_x_c),
        shift=jnp.zeros((), st.center.dtype),  # null space handled by deflation
        periodic=st.periodic,
    )


def build_mg_hierarchy(
    lap: LaplaceStencil, min_size: int = 8, max_levels: int = 8, **kwargs
) -> MGHierarchy:
    levels = [dataclasses.replace(lap, shift=jnp.zeros((), lap.center.dtype))]
    while (
        len(levels) < max_levels
        and levels[-1].center.shape[0] % 2 == 0
        and levels[-1].center.shape[1] % 2 == 0
        and min(levels[-1].center.shape) > min_size
    ):
        levels.append(_coarsen(levels[-1]))
    return MGHierarchy(levels=tuple(levels), **kwargs)


def _inv_diag(st: LaplaceStencil):
    c = st.center
    return jnp.where(jnp.abs(c) > 1e-30, 1.0 / c, 0.0)


def _jacobi(st: LaplaceStencil, x, b, inv_d, omega, iters):
    def body(x, _):
        r = b - apply_laplacian(st, x)
        return x + omega * inv_d * r, None

    x, _ = jax.lax.scan(body, x, None, length=iters)
    return x


def _prolong(e_c: jax.Array) -> jax.Array:
    return jnp.repeat(jnp.repeat(e_c, 2, axis=0), 2, axis=1)


def v_cycle(hier: MGHierarchy, b: jax.Array) -> jax.Array:
    """One V(pre,post) cycle applied to residual b; returns approx A^-1 b."""
    levels = hier.levels
    inv_ds = [_inv_diag(st) for st in levels]

    def solve_level(k: int, b_k: jax.Array) -> jax.Array:
        st = levels[k]
        if k == len(levels) - 1:
            x = jnp.zeros_like(b_k)
            return _jacobi(st, x, b_k, inv_ds[k], hier.damping, hier.coarse_iters)
        x = jnp.zeros_like(b_k)
        x = _jacobi(st, x, b_k, inv_ds[k], hier.damping, hier.pre_smooth)
        r = b_k - apply_laplacian(st, x)
        r_c = _block_sum(r)
        e_c = solve_level(k + 1, r_c)
        x = x + _prolong(e_c)
        x = _jacobi(st, x, b_k, inv_ds[k], hier.damping, hier.post_smooth)
        return x

    return solve_level(0, b)
