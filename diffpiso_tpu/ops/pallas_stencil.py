"""Pallas TPU kernel for the 5-point stencil matvec.

This is the hot op: every BiCGSTAB/CG iteration applies the stencil once
(the cuSPARSE csrmv / banded calcZ_v4 of the reference,
pressure_solve_op.cu.cc:58-92). The jnp fallback builds four rolled copies
of x; this kernel keeps x and the five coefficient planes in VMEM and does
one fused multiply-accumulate pass, with the circular shifts done in-core
(pltpu.roll), so HBM traffic is exactly 6 reads + 1 write of the plane.

Two dispatch modes: small planes run as a single monolithic block (all 7
planes resident in VMEM); larger row-tileable planes use the row-tiled halo
variant below (128-row tiles with 8-row modular wrap slivers), whose grid
pipeline double-buffers the HBM<->VMEM DMA and wins at 512^2 and above.
Planes too wide for even an 8-row double-buffered tile (~7*2*8*nx*4 B over
the VMEM budget) fall back to the XLA roll path rather than failing Mosaic
compilation.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

try:  # pallas is TPU-only at lowering time; import lazily/defensively
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    _PALLAS_AVAILABLE = False

# ~12 MiB of VMEM for the 7 planes leaves headroom in 16 MiB/core
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024

# tests flip this to exercise the exact production kernels on CPU
_INTERPRET = False

# no_pallas() nesting depth: pallas_call is an opaque custom-call to the
# GSPMD partitioner, so spatially-sharded jits must trace with the pallas
# dispatch off (rolls/reductions partition natively; the kernels don't).
_DISABLED_DEPTH = 0


def no_pallas():
    """Context manager: disable all pallas dispatch for code traced inside.

    Use around `jit` tracing of spatially-sharded steps
    (parallel/sharding.py): GSPMD partitions the jnp roll/reduction
    formulation across the mesh, but cannot partition pallas_call — without
    this gate a sharded trace would replicate (or reject) the kernels."""
    import contextlib

    @contextlib.contextmanager
    def _ctx():
        global _DISABLED_DEPTH
        _DISABLED_DEPTH += 1
        try:
            yield
        finally:
            _DISABLED_DEPTH -= 1

    return _ctx()


# batched_safe_pallas() nesting depth: jax.vmap batches pallas_call by
# prepending a grid dim, which Mosaic rejects for kernels with SMEM scalar
# outputs. The whole-solve kernels (fused_jacobi1/2_solve,
# fused_pcg2_solve) carry explicit grid-over-batch custom_vmap rules and
# stay ON; gates of kernels WITHOUT rules consult this depth and bow out.
_BATCHED_SAFE_DEPTH = 0


def batched_safe_pallas():
    """Context manager for vmapped traces (make_batched_train_step):
    keep only the pallas kernels with explicit custom_vmap batching rules
    (plus plane-output kernels that batch natively); disable the SMEM
    -scalar-output iteration kernels vmap cannot batch.

    TRACE-TIME, not definition-time: the depth flag is consulted while the
    gates run, i.e. while jax traces the wrapped computation. Wrapping a
    `jax.jit` *definition* is a silent no-op (tracing is deferred to the
    first call, by which time the context has exited) — enter the context
    INSIDE the jitted function body, around the vmap/grad region, the way
    learning/training.py does. Misuse surfaces as a Mosaic lowering error
    on a vmapped SMEM block (e.g. `_bicg_p_kernel ... block shape
    (Squeezed(), Blocked(3))`), see runs/ab_batched_512.py."""
    import contextlib

    @contextlib.contextmanager
    def _ctx():
        global _BATCHED_SAFE_DEPTH
        _BATCHED_SAFE_DEPTH += 1
        try:
            yield
        finally:
            _BATCHED_SAFE_DEPTH -= 1

    return _ctx()


# fold-only escape depth (r5): small-plane BATCHED traces run all-XLA
# (no_pallas — the measured-winning baseline, runs/ab_batched_pallas.log)
# EXCEPT the batch-FOLDED whole-solve momentum kernel, whose vmap rule
# holds all B samples in one VMEM-resident program and so does not pay the
# grid serialization that made the other kernels lose there. Only
# jac2_eligible (solvers/pallas_krylov.py) consults this depth.
_FOLD_OK_DEPTH = 0


def fold_only_pallas():
    """Trace-time context: no_pallas() semantics for every kernel EXCEPT
    the batch-folded whole-solve momentum dispatch (jac2). Enter INSIDE
    the jit body around the vmapped region, nested with no_pallas() —
    see make_batched_train_step."""
    import contextlib

    @contextlib.contextmanager
    def _ctx():
        global _FOLD_OK_DEPTH
        _FOLD_OK_DEPTH += 1
        try:
            yield
        finally:
            _FOLD_OK_DEPTH -= 1

    return _ctx()


def _roll(x, shift, axis):
    # pltpu.roll requires a non-negative shift; jnp.roll semantics otherwise
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _stencil_kernel(c_ref, ly_ref, hy_ref, lx_ref, hx_ref, x_ref, z_ref):
    x = x_ref[:]
    z = c_ref[:] * x
    z = z + ly_ref[:] * _roll(x, 1, 0)
    z = z + hy_ref[:] * _roll(x, -1, 0)
    z = z + lx_ref[:] * _roll(x, 1, 1)
    z = z + hx_ref[:] * _roll(x, -1, 1)
    z_ref[:] = z


def _stencil_kernel_T(c_ref, ly_ref, hy_ref, lx_ref, hx_ref, x_ref, z_ref):
    x = x_ref[:]
    z = c_ref[:] * x
    z = z + _roll(ly_ref[:] * x, -1, 0)
    z = z + _roll(hy_ref[:] * x, 1, 0)
    z = z + _roll(lx_ref[:] * x, -1, 1)
    z = z + _roll(hx_ref[:] * x, 1, 1)
    z_ref[:] = z


def pallas_eligible(shape, dtype) -> bool:
    if not _PALLAS_AVAILABLE:
        return False
    if _DISABLED_DEPTH > 0:
        return False
    if os.environ.get("DIFFPISO_DISABLE_PALLAS"):
        return False
    if jax.default_backend() != "tpu":
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if itemsize > 4:  # float64 path stays on XLA
        return False
    if len(shape) == 3:
        # z-plane-gridded 7-point kernel: ~12 double-buffered (ny, nx)
        # planes resident per program; nz >= 2 for the halo maps
        nz, ny, nx = shape
        return (
            nz >= 2
            and ny % 8 == 0
            and nx % 128 == 0
            and 12 * 2 * ny * nx * itemsize <= _VMEM_BUDGET_BYTES
        )
    if len(shape) != 2:
        return False
    if _pick_tile(shape[0], shape[1], itemsize, planes=8) is not None:
        return True  # row-tiled path: VMEM holds ~8 double-buffered tiles
    return 7 * shape[0] * shape[1] * itemsize <= _VMEM_BUDGET_BYTES


def _pallas_matvec_monolithic(center, lo_y, hi_y, lo_x, hi_x, x, transpose: bool):
    kernel = _stencil_kernel_T if transpose else _stencil_kernel
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_INTERPRET,
    )(center, lo_y, hi_y, lo_x, hi_x, x)


# -- row-tiled halo variant ------------------------------------------------------
# Grid over row tiles so the pallas pipeline double-buffers HBM<->VMEM DMA
# instead of staging the whole plane (the monolithic kernel loses to XLA at
# 512^2 because nothing overlaps). The y-shift wrap rows come from two 8-row
# halo slivers fetched via modular index maps, so the periodic roll semantics
# are preserved exactly across tile boundaries.


def _tiled_kernel(c_ref, ly_ref, hy_ref, lx_ref, hx_ref, x_ref, up_ref, dn_ref, z_ref):
    x = x_ref[:]
    xm = jnp.concatenate([up_ref[7:8, :], x[:-1]], 0)  # roll(x, +1, 0)
    xp = jnp.concatenate([x[1:], dn_ref[0:1, :]], 0)   # roll(x, -1, 0)
    z = c_ref[:] * x
    z = z + ly_ref[:] * xm + hy_ref[:] * xp
    z = z + lx_ref[:] * _roll(x, 1, 1) + hx_ref[:] * _roll(x, -1, 1)
    z_ref[:] = z


def _tiled_kernel_T(
    c_ref, ly_ref, hy_ref, lx_ref, hx_ref, x_ref,
    up_ref, dn_ref, hyup_ref, lydn_ref, z_ref,
):
    # z = c x + roll(ly x, -1, 0) + roll(hy x, +1, 0)
    #         + roll(lx x, -1, 1) + roll(hx x, +1, 1)
    x = x_ref[:]
    a = ly_ref[:] * x
    am = jnp.concatenate([a[1:], lydn_ref[0:1, :] * dn_ref[0:1, :]], 0)
    b = hy_ref[:] * x
    bp = jnp.concatenate([hyup_ref[7:8, :] * up_ref[7:8, :], b[:-1]], 0)
    z = c_ref[:] * x + am + bp
    z = z + _roll(lx_ref[:] * x, -1, 1) + _roll(hx_ref[:] * x, 1, 1)
    z_ref[:] = z


def _pick_tile(ny: int, nx: int | None = None, itemsize: int = 4, planes: int = 7):
    # 128 rows measured fastest at 512^2..1024^2 (microbench in the r2 tiled
    #-kernel commit); larger tiles pipeline less, smaller ones launch more.
    # When nx is given, the tile must also fit the grid pipeline's VMEM
    # working set — ~`planes` double-buffered (tile, nx) blocks — or wide
    # planes (nx >= ~4096 at tile 128, f32) fail Mosaic compilation instead
    # of falling back; shrink the tile until it fits.
    for t in (128, 256, 64, 32, 16, 8):
        if ny % t != 0 or ny // t < 2:
            continue
        if nx is not None and planes * 2 * t * nx * itemsize > _VMEM_BUDGET_BYTES:
            continue
        return t
    return None


def _pallas_matvec_tiled(center, lo_y, hi_y, lo_x, hi_x, x, transpose: bool, tile: int):
    ny, nx = x.shape
    n_tiles = ny // tile
    nb8 = ny // 8
    tpb = tile // 8  # 8-row blocks per tile
    tile_spec = pl.BlockSpec((tile, nx), lambda i: (i, 0))
    up_spec = pl.BlockSpec((8, nx), lambda i: ((i * tpb - 1) % nb8, 0))
    dn_spec = pl.BlockSpec((8, nx), lambda i: (((i + 1) * tpb) % nb8, 0))
    if not transpose:
        return pl.pallas_call(
            _tiled_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(n_tiles,),
            in_specs=[tile_spec] * 6 + [up_spec, dn_spec],
            out_specs=tile_spec,
            interpret=_INTERPRET,
        )(center, lo_y, hi_y, lo_x, hi_x, x, x, x)
    return pl.pallas_call(
        _tiled_kernel_T,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(n_tiles,),
        in_specs=[tile_spec] * 6 + [up_spec, dn_spec, up_spec, dn_spec],
        out_specs=tile_spec,
        interpret=_INTERPRET,
    )(center, lo_y, hi_y, lo_x, hi_x, x, x, x, hi_y, lo_y)


def _pallas_matvec(center, lo_y, hi_y, lo_x, hi_x, x, transpose: bool):
    ny, nx = x.shape
    itemsize = jnp.dtype(x.dtype).itemsize
    tile = _pick_tile(ny, nx, itemsize, planes=8)
    # tiled wherever a tiling exists and the plane is big enough for the
    # pipeline to matter; tiny planes stay monolithic (one launch, no
    # pipeline bubbles to hide)
    if tile is not None and ny * nx * itemsize >= 256 * 1024:
        return _pallas_matvec_tiled(
            center, lo_y, hi_y, lo_x, hi_x, x, transpose, tile
        )
    return _pallas_matvec_monolithic(center, lo_y, hi_y, lo_x, hi_x, x, transpose)


# pltpu.roll has no AD rule, so the fused matvec carries a custom VJP: the
# cotangent of x is the opposite-direction kernel with the same coefficients
# (S and S^T are each other's adjoints), and the coefficient cotangents are
# elementwise products with shifted copies.
@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _fused_matvec(center, lo_y, hi_y, lo_x, hi_x, x, transpose: bool = False):
    return _pallas_matvec(center, lo_y, hi_y, lo_x, hi_x, x, transpose)


def _fused_matvec_fwd(center, lo_y, hi_y, lo_x, hi_x, x, transpose):
    z = _pallas_matvec(center, lo_y, hi_y, lo_x, hi_x, x, transpose)
    return z, (center, lo_y, hi_y, lo_x, hi_x, x)


def _fused_matvec_bwd(transpose, res, dz):
    center, lo_y, hi_y, lo_x, hi_x, x = res
    dx = _pallas_matvec(center, lo_y, hi_y, lo_x, hi_x, dz, not transpose)
    if not transpose:
        # z = c x + sum_d lo_d roll(x,1,d) + hi_d roll(x,-1,d)
        dlo_y = dz * jnp.roll(x, 1, 0)
        dhi_y = dz * jnp.roll(x, -1, 0)
        dlo_x = dz * jnp.roll(x, 1, 1)
        dhi_x = dz * jnp.roll(x, -1, 1)
    else:
        # z = c x + sum_d roll(lo_d x, -1, d) + roll(hi_d x, 1, d)
        dlo_y = x * jnp.roll(dz, 1, 0)
        dhi_y = x * jnp.roll(dz, -1, 0)
        dlo_x = x * jnp.roll(dz, 1, 1)
        dhi_x = x * jnp.roll(dz, -1, 1)
    return (dz * x, dlo_y, dhi_y, dlo_x, dhi_x, dx)


_fused_matvec.defvjp(_fused_matvec_fwd, _fused_matvec_bwd)


def fused_stencil_matvec(center, lo, hi, x, transpose: bool = False):
    """z = S x (or S^T x) for a 5-point (2-D) or 7-point (3-D) stencil with
    roll wrap semantics. Drop-in replacement for the jnp roll formulation;
    callers should gate on pallas_eligible()."""
    if x.ndim == 3:
        return _fused_matvec3d(
            center, lo[0], hi[0], lo[1], hi[1], lo[2], hi[2], x,
            transpose=transpose,
        )
    return _fused_matvec(center, lo[0], hi[0], lo[1], hi[1], x, transpose=transpose)


# -- 3-D: z-plane-gridded 7-point kernel --------------------------------------------
# The 3-D arrays are stacks of (ny, nx) planes; the pallas grid runs over z
# with each program holding its plane (plus the z+-1 x-planes via modular
# index maps — the 2-D row-sliver trick lifted a dimension). In-plane
# shifts run in-core (pltpu.roll over sublanes/lanes); the z coupling is
# two extra plane reads. HBM per apply: ~10 plane reads + 1 write vs the
# XLA roll path's ~20 (every 3-D roll materializes a copy). The r2-era 2-D
# kernels never covered rank 3 — the 128^3 bench row ran pure XLA.


def _stencil3d_kernel(c, lz, hz, ly, hy, lx, hx, x, xup, xdn, z_ref):
    xc = x[0]
    out = c[0] * xc + lz[0] * xup[0] + hz[0] * xdn[0]
    out = out + ly[0] * _roll(xc, 1, 0) + hy[0] * _roll(xc, -1, 0)
    out = out + lx[0] * _roll(xc, 1, 1) + hx[0] * _roll(xc, -1, 1)
    z_ref[0] = out


def _stencil3d_kernel_T(c, lz_dn, hz_up, ly, hy, lx, hx, x, xup, xdn, z_ref):
    # (S^T x)[i] = c x + roll(lz x, -1, z) + roll(hz x, +1, z) + (in-plane)
    # roll(lz x, -1, z) at plane i = lz[i+1] x[i+1]; roll(hz x, +1, z) =
    # hz[i-1] x[i-1] — hence the lz(z+1)/hz(z-1) sliver inputs
    xc = x[0]
    out = c[0] * xc + lz_dn[0] * xdn[0] + hz_up[0] * xup[0]
    out = out + _roll(ly[0] * xc, -1, 0) + _roll(hy[0] * xc, 1, 0)
    out = out + _roll(lx[0] * xc, -1, 1) + _roll(hx[0] * xc, 1, 1)
    z_ref[0] = out


def _pallas_matvec_3d(center, lo_z, hi_z, lo_y, hi_y, lo_x, hi_x, x,
                      transpose: bool):
    nz = x.shape[0]
    plane = pl.BlockSpec((1,) + x.shape[1:], lambda i: (i, 0, 0))
    up = pl.BlockSpec((1,) + x.shape[1:], lambda i: ((i - 1) % nz, 0, 0))
    dn = pl.BlockSpec((1,) + x.shape[1:], lambda i: ((i + 1) % nz, 0, 0))
    if not transpose:
        return pl.pallas_call(
            _stencil3d_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(nz,),
            in_specs=[plane] * 7 + [plane, up, dn],
            out_specs=plane,
            interpret=_INTERPRET,
        )(center, lo_z, hi_z, lo_y, hi_y, lo_x, hi_x, x, x, x)
    return pl.pallas_call(
        _stencil3d_kernel_T,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(nz,),
        in_specs=[plane, dn, up] + [plane] * 4 + [plane, up, dn],
        out_specs=plane,
        interpret=_INTERPRET,
    )(center, lo_z, hi_z, lo_y, hi_y, lo_x, hi_x, x, x, x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _fused_matvec3d(center, lz, hz, ly, hy, lx, hx, x, transpose: bool = False):
    return _pallas_matvec_3d(center, lz, hz, ly, hy, lx, hx, x, transpose)


def _fused_matvec3d_fwd(center, lz, hz, ly, hy, lx, hx, x, transpose):
    z = _pallas_matvec_3d(center, lz, hz, ly, hy, lx, hx, x, transpose)
    return z, (center, lz, hz, ly, hy, lx, hx, x)


def _fused_matvec3d_bwd(transpose, res, dz):
    center, lz, hz, ly, hy, lx, hx, x = res
    dx = _pallas_matvec_3d(center, lz, hz, ly, hy, lx, hx, dz, not transpose)
    coeffs = []
    for d, _ in enumerate((lz, ly, lx)):
        if not transpose:
            coeffs.append(dz * jnp.roll(x, 1, d))   # d lo_d
            coeffs.append(dz * jnp.roll(x, -1, d))  # d hi_d
        else:
            coeffs.append(x * jnp.roll(dz, 1, d))
            coeffs.append(x * jnp.roll(dz, -1, d))
    dlz, dhz, dly, dhy, dlx, dhx = coeffs
    return (dz * x, dlz, dhz, dly, dhy, dlx, dhx, dx)


_fused_matvec3d.defvjp(_fused_matvec3d_fwd, _fused_matvec3d_bwd)


# -- fused residual: r = b -/+ S x, max|r| -----------------------------------------
# The warm-start entry and exit of every Krylov solve (r0 check, true-residual
# verification) — one launch instead of the matvec + subtract + reduce chain.
# Used inside the custom_vjp'd solves only, so no AD rule is needed.


def _mk_residual_kernel(transpose, negate):
    def kernel(c, ly, hy, lx, hx, b_ref, x_ref, r_ref, n_ref):
        x = x_ref[:]
        if not transpose:
            m = c[:] * x
            m = m + ly[:] * _roll(x, 1, 0) + hy[:] * _roll(x, -1, 0)
            m = m + lx[:] * _roll(x, 1, 1) + hx[:] * _roll(x, -1, 1)
        else:
            m = c[:] * x
            m = m + _roll(ly[:] * x, -1, 0) + _roll(hy[:] * x, 1, 0)
            m = m + _roll(lx[:] * x, -1, 1) + _roll(hx[:] * x, 1, 1)
        r = (b_ref[:] + m) if negate else (b_ref[:] - m)
        r_ref[:] = r
        n_ref[0] = jnp.max(jnp.abs(r))

    return kernel


def _mk_residual_kernel_tiled(transpose, negate):
    def kernel(c, ly, hy, lx, hx, b_ref, x_ref, up_ref, dn_ref,
               hyup_ref, lydn_ref, r_ref, n_ref):
        x = x_ref[:]
        if not transpose:
            xm = jnp.concatenate([up_ref[7:8, :], x[:-1]], 0)
            xp = jnp.concatenate([x[1:], dn_ref[0:1, :]], 0)
            m = c[:] * x + ly[:] * xm + hy[:] * xp
            m = m + lx[:] * _roll(x, 1, 1) + hx[:] * _roll(x, -1, 1)
        else:
            a = ly[:] * x
            am = jnp.concatenate([a[1:], lydn_ref[0:1, :] * dn_ref[0:1, :]], 0)
            bb = hy[:] * x
            bp = jnp.concatenate([hyup_ref[7:8, :] * up_ref[7:8, :], bb[:-1]], 0)
            m = c[:] * x + am + bp
            m = m + _roll(lx[:] * x, -1, 1) + _roll(hx[:] * x, 1, 1)
        r = (b_ref[:] + m) if negate else (b_ref[:] - m)
        r_ref[:] = r
        part = jnp.max(jnp.abs(r))
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            n_ref[0, 0] = part

        @pl.when(i != 0)
        def _():
            n_ref[0, 0] = jnp.maximum(n_ref[0, 0], part)

    return kernel


def fused_stencil_residual(center, lo, hi, b, x, negate: bool = False,
                           transpose: bool = False):
    """r = b - S x (negate: r = b + S x, the '-M' advection operator) and
    max|r| in one launch. Callers gate on pallas_eligible()."""
    ny, nx = x.shape
    itemsize = jnp.dtype(x.dtype).itemsize
    tile = _pick_tile(ny, nx, itemsize, planes=8)
    if tile is not None and ny * nx * itemsize >= 256 * 1024:
        n_tiles = ny // tile
        nb8 = ny // 8
        tpb = tile // 8
        tile_spec = pl.BlockSpec((tile, nx), lambda i: (i, 0))
        up_spec = pl.BlockSpec((8, nx), lambda i: ((i * tpb - 1) % nb8, 0))
        dn_spec = pl.BlockSpec((8, nx), lambda i: (((i + 1) * tpb) % nb8, 0))
        r, n = pl.pallas_call(
            _mk_residual_kernel_tiled(transpose, negate),
            grid=(n_tiles,),
            in_specs=[tile_spec] * 7 + [up_spec, dn_spec, up_spec, dn_spec],
            out_specs=[
                tile_spec,
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(x.shape, x.dtype),
                jax.ShapeDtypeStruct((1, 1), x.dtype),
            ],
            interpret=_INTERPRET,
        )(center, lo[0], hi[0], lo[1], hi[1], b, x, x, x, hi[0], lo[0])
        return r, n[0, 0]
    r, n = pl.pallas_call(
        _mk_residual_kernel(transpose, negate),
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((1,), x.dtype),
        ],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        interpret=_INTERPRET,
    )(center, lo[0], hi[0], lo[1], hi[1], b, x)
    return r, n[0]
