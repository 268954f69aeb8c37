"""Fused Pallas TPU kernel for the pressure-Laplacian assembly.

The jnp assembly in ops/laplace.py (the calcPISOLaplaceMatrix redesign,
CUDAsrc/laplace_op.cu.cc:80-179) lowers to ~4-5 XLA kernels at 512^2; on
this platform each launch costs ~30 us, so assembly is ~15% of a PISO step.
This kernel emits all five coefficient planes AND the rank-one-shift
reduction Sum|diag| in ONE row-tiled launch:

  inputs  : the two staggered influence components (+ 8-row halo slivers
            for the +1-row faces), and 8 precomputed 0/1 mask planes
            (diag-count and link masks per axis/side). The mask planes are
            compile-time constants whenever the simulation masks are closed
            over by jit, so XLA folds their construction away.
  outputs : center, lo_y, hi_y, lo_x, hi_x (tiled) and a (1,1) partial-sum
            accumulated across the sequential TPU grid.

Boundary semantics are inherited verbatim from the mask planes, which are
built by the SAME jnp logic that the scalar-loop oracle in
tests/test_laplace.py validates; tests/test_pallas_assembly.py asserts the
kernel equals the jnp assembly on random masks, both periodic and bounded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    _PALLAS_AVAILABLE = False

from diffpiso_tpu.ops.pallas_stencil import _pick_tile

_INTERPRET = False


def assembly_eligible(resolution, rank, dtype) -> bool:
    import os

    if not _PALLAS_AVAILABLE or rank != 2:
        return False
    from diffpiso_tpu.ops import pallas_stencil as _ps

    if _ps._DISABLED_DEPTH > 0:  # no_pallas() — sharded traces
        return False
    if os.environ.get("DIFFPISO_DISABLE_PALLAS"):
        return False
    if jax.default_backend() != "tpu" and not _INTERPRET:
        return False
    if jnp.dtype(dtype).itemsize > 4:
        return False
    ny, nx = resolution
    # ~16 resident planes (11 in + 5 out) double-buffered across the grid
    itemsize = jnp.dtype(dtype).itemsize
    return _pick_tile(ny, nx, itemsize, planes=16) is not None and nx % 128 == 0


def _mk_kernel(periodic, tile, res):
    ny, nx = res
    py, px = periodic

    def kernel(
        cy_ref, cx_ref, dny_ref,
        mdl_y_ref, mdh_y_ref, mdl_x_ref, mdh_x_ref,
        mll_y_ref, mlh_y_ref, mll_x_ref, mlh_x_ref,
        center_ref, lo_y_ref, hi_y_ref, lo_x_ref, hi_x_ref, sum_ref,
    ):
        # axis 0 faces: lo face of row j is face j; hi face is face j+1
        ilo_y = cy_ref[:, :nx] if not py else cy_ref[:]
        top = dny_ref[0:1, :nx] if not py else dny_ref[0:1, :]
        ihi_y = jnp.concatenate([(cy_ref[:, :nx] if not py else cy_ref[:])[1:], top], 0)
        # axis 1 faces
        if px:
            ilo_x = cx_ref[:]
            ihi_x = pltpu.roll(cx_ref[:], nx - 1, 1)  # roll(x, -1, 1)
        else:
            ilo_x = cx_ref[:, 0:nx]
            ihi_x = cx_ref[:, 1 : nx + 1]

        diag = -(
            mdl_y_ref[:] * ilo_y
            + mdh_y_ref[:] * ihi_y
            + mdl_x_ref[:] * ilo_x
            + mdh_x_ref[:] * ihi_x
        )
        center_ref[:] = diag
        lo_y_ref[:] = mll_y_ref[:] * ilo_y
        hi_y_ref[:] = mlh_y_ref[:] * ihi_y
        lo_x_ref[:] = mll_x_ref[:] * ilo_x
        hi_x_ref[:] = mlh_x_ref[:] * ihi_x

        part = jnp.sum(jnp.abs(diag))
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            sum_ref[0, 0] = part

        @pl.when(i != 0)
        def _():
            sum_ref[0, 0] = sum_ref[0, 0] + part

    return kernel


def fused_laplace_assembly(comp_y, comp_x, mask_planes, periodic, res, dtype):
    """One-launch assembly. comp_y/comp_x are the influence components
    ((ny[+1], nx) / (ny, nx[+1])); mask_planes is the 8-tuple
    (mdl_y, mdh_y, mdl_x, mdh_x, mll_y, mlh_y, mll_x, mlh_x) of (ny, nx)
    0/1 planes. Returns (center, lo_y, hi_y, lo_x, hi_x, sum_abs_diag)."""
    ny, nx = res
    py, px = periodic
    tile = _pick_tile(ny, nx, jnp.dtype(dtype).itemsize, planes=16)
    n_tiles = ny // tile
    tpb = tile // 8
    nb8y = comp_y.shape[0] // 8  # sliver indexing over comp_y's own rows

    wy = comp_y.shape[1]
    wx = comp_x.shape[1]
    cy_spec = pl.BlockSpec((tile, wy), lambda i: (i, 0))
    cx_spec = pl.BlockSpec((tile, wx), lambda i: (i, 0))
    if py:
        # wrap: rows (i+1)*tile mod ny
        dny_spec = pl.BlockSpec((8, wy), lambda i: (((i + 1) * tpb) % nb8y, 0))
    else:
        # comp_y has ny+1 rows; row (i+1)*tile always exists
        dny_spec = pl.BlockSpec((8, wy), lambda i: ((i + 1) * tpb, 0))
    m_spec = pl.BlockSpec((tile, nx), lambda i: (i, 0))
    out_spec = pl.BlockSpec((tile, nx), lambda i: (i, 0))
    sum_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    outs = pl.pallas_call(
        _mk_kernel(periodic, tile, res),
        grid=(n_tiles,),
        in_specs=[cy_spec, cx_spec, dny_spec] + [m_spec] * 8,
        out_specs=[out_spec] * 5 + [sum_spec],
        out_shape=[jax.ShapeDtypeStruct(res, dtype)] * 5
        + [jax.ShapeDtypeStruct((1, 1), dtype)],
        interpret=_INTERPRET,
    )(comp_y, comp_x, comp_y, *mask_planes)
    center, lo_y, hi_y, lo_x, hi_x, s = outs
    return center, lo_y, hi_y, lo_x, hi_x, s[0, 0]
