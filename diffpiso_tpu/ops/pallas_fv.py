"""Fused Pallas TPU kernels for the periodic 3-D FV divergence/gradient pair.

Motivation (measured, runs/roofline3d.py @ 128^3): the XLA formulation of
fv_divergence — three jnp.roll + subtract chains — costs ~0.40 ms/call in a
scan, 9.7x its HBM floor (each roll materializes a full-field copy, and the
z-axis wrap produces (1,128)-tiled edge slivers). One z-plane-gridded launch
reads each operand plane exactly once: 4 plane-reads + 1 write for the
divergence, 2 + 3 for the gradient.

The two operators are mutual negated transposes (matching the reference's
hand adjoints, diffpiso/piso_helpers.py:236-310):

    div^T(ct)  = -grad(ct)        grad^T(ct) = -div(ct)

so each op's custom VJP reuses the other's kernel — forward AND backward
scans stay fused. Only the all-periodic rank-3 case dispatches here (the
bench turbulence workloads); bounded/2-D shapes keep the XLA path in
ops/fv.py.

Scale factors f_d = prod(dx)/dx_d are trace-time floats baked into the
kernels (dx is static in every caller).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    _PALLAS_AVAILABLE = False

_VMEM_BUDGET_BYTES = 13 * 1024 * 1024

# tests flip this to run the exact production kernels on CPU
_INTERPRET = False


def eligible3(shape, dtype) -> bool:
    """Rank-3 all-periodic eligibility; platform gates mirror
    pallas_krylov.eligible_3d (incl. the no_pallas() sharded-trace gate)."""
    if os.environ.get("DIFFPISO_FUSED_FV", "auto") == "never":
        return False
    if not _PALLAS_AVAILABLE:
        return False
    from diffpiso_tpu.ops import pallas_stencil as _ps

    if _ps._DISABLED_DEPTH > 0 or os.environ.get("DIFFPISO_DISABLE_PALLAS"):
        return False
    if jax.default_backend() not in ("tpu",) and not _INTERPRET:
        return False
    if len(shape) != 3:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if itemsize > 4:
        return False
    # <= 10 resident (ny, nx) plane blocks incl. pipeline double-buffering
    return 10 * shape[1] * shape[2] * itemsize <= _VMEM_BUDGET_BYTES


def _roll(x, shift, axis):
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _div3_kernel(f0, f1, f2, w, wup, v, u, out):
    # axis order (z, y, x); component d staggered along axis d, unique faces.
    # div[k] = (w[k+1]-w[k]) f0 + (v[y+1]-v) f1 + (u[x+1]-u) f2
    wc = w[0]
    vc = v[0]
    uc = u[0]
    d = (wup[0] - wc) * f0
    d = d + (_roll(vc, -1, 0) - vc) * f1
    d = d + (_roll(uc, -1, 1) - uc) * f2
    out[0] = d


def _div3_impl(fs, comps):
    w, v, u = comps
    nz = w.shape[0]
    plane = pl.BlockSpec((1,) + w.shape[1:], lambda i: (i, 0, 0))
    up = pl.BlockSpec((1,) + w.shape[1:], lambda i: ((i + 1) % nz, 0, 0))
    return pl.pallas_call(
        functools.partial(_div3_kernel, *fs),
        out_shape=jax.ShapeDtypeStruct(w.shape, w.dtype),
        grid=(nz,),
        in_specs=[plane, up, plane, plane],
        out_specs=plane,
        interpret=_INTERPRET,
    )(w, w, v, u)


def _grad3_kernel(f0, f1, f2, p, pdn, out0, out1, out2):
    # grad_d[j] = (p[j] - p[j - e_d]) f_d, periodic unique faces
    pc = p[0]
    out0[0] = (pc - pdn[0]) * f0
    out1[0] = (pc - _roll(pc, 1, 0)) * f1
    out2[0] = (pc - _roll(pc, 1, 1)) * f2


def _grad3_impl(fs, p):
    nz = p.shape[0]
    plane = pl.BlockSpec((1,) + p.shape[1:], lambda i: (i, 0, 0))
    dn = pl.BlockSpec((1,) + p.shape[1:], lambda i: ((i - 1) % nz, 0, 0))
    shape = jax.ShapeDtypeStruct(p.shape, p.dtype)
    return pl.pallas_call(
        functools.partial(_grad3_kernel, *fs),
        out_shape=(shape, shape, shape),
        grid=(nz,),
        in_specs=[plane, dn],
        out_specs=(plane, plane, plane),
        interpret=_INTERPRET,
    )(p, p)


def eligible2(shape, dtype) -> bool:
    """Rank-2 all-periodic eligibility: monolithic whole-plane launch
    (u + v + out (+ double-buffering head-room) resident in VMEM), or the
    128-row-tiled launch for bigger planes (1024^2, 512x2048 DNS) when the
    row count tiles evenly."""
    if os.environ.get("DIFFPISO_FUSED_FV", "auto") == "never":
        return False
    if not _PALLAS_AVAILABLE:
        return False
    from diffpiso_tpu.ops import pallas_stencil as _ps

    if _ps._DISABLED_DEPTH > 0 or os.environ.get("DIFFPISO_DISABLE_PALLAS"):
        return False
    if jax.default_backend() not in ("tpu",) and not _INTERPRET:
        return False
    if len(shape) != 2:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if itemsize > 4:
        return False
    if 6 * shape[0] * shape[1] * itemsize <= _VMEM_BUDGET_BYTES:
        return True
    return (
        shape[0] % _TILE_ROWS == 0
        and 8 * _TILE_ROWS * shape[1] * itemsize <= _VMEM_BUDGET_BYTES
    )


def _div2_kernel(f0, f1, v, u, out):
    vc = v[:]
    uc = u[:]
    d = (_roll(vc, -1, 0) - vc) * f0
    out[:] = d + (_roll(uc, -1, 1) - uc) * f1


_TILE_ROWS = 128  # row-tiled fallback for planes too big to hold whole


def _div2_tiled_kernel(f0, f1, v, vup, u, out):
    # y-shift crosses the tile boundary: last row comes from the next
    # tile's first row (wrapped — grid covers all tiles, so tile G-1 reads
    # tile 0, which IS the periodic wrap)
    vc = v[:]
    vshift = jnp.concatenate([vc[1:], vup[:1]], axis=0)
    uc = u[:]
    out[:] = (vshift - vc) * f0 + (_roll(uc, -1, 1) - uc) * f1


def _div2_impl(fs, comps):
    v, u = comps
    itemsize = jnp.dtype(v.dtype).itemsize
    if 6 * v.shape[0] * v.shape[1] * itemsize <= _VMEM_BUDGET_BYTES:
        return pl.pallas_call(
            functools.partial(_div2_kernel, *fs),
            out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
            interpret=_INTERPRET,
        )(v, u)
    g = v.shape[0] // _TILE_ROWS
    tile = pl.BlockSpec((_TILE_ROWS, v.shape[1]), lambda i: (i, 0))
    up = pl.BlockSpec((_TILE_ROWS, v.shape[1]), lambda i: ((i + 1) % g, 0))
    return pl.pallas_call(
        functools.partial(_div2_tiled_kernel, *fs),
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        grid=(g,),
        in_specs=[tile, up, tile],
        out_specs=tile,
        interpret=_INTERPRET,
    )(v, v, u)


def _grad2_kernel(f0, f1, p, out0, out1):
    pc = p[:]
    out0[:] = (pc - _roll(pc, 1, 0)) * f0
    out1[:] = (pc - _roll(pc, 1, 1)) * f1


def _grad2_tiled_kernel(f0, f1, p, pdn, out0, out1):
    pc = p[:]
    pshift = jnp.concatenate([pdn[-1:], pc[:-1]], axis=0)
    out0[:] = (pc - pshift) * f0
    out1[:] = (pc - _roll(pc, 1, 1)) * f1


def _grad2_impl(fs, p):
    shape = jax.ShapeDtypeStruct(p.shape, p.dtype)
    itemsize = jnp.dtype(p.dtype).itemsize
    if 6 * p.shape[0] * p.shape[1] * itemsize <= _VMEM_BUDGET_BYTES:
        return pl.pallas_call(
            functools.partial(_grad2_kernel, *fs),
            out_shape=(shape, shape),
            interpret=_INTERPRET,
        )(p)
    g = p.shape[0] // _TILE_ROWS
    tile = pl.BlockSpec((_TILE_ROWS, p.shape[1]), lambda i: (i, 0))
    dn = pl.BlockSpec((_TILE_ROWS, p.shape[1]), lambda i: ((i - 1) % g, 0))
    return pl.pallas_call(
        functools.partial(_grad2_tiled_kernel, *fs),
        out_shape=(shape, shape),
        grid=(g,),
        in_specs=[tile, dn],
        out_specs=(tile, tile),
        interpret=_INTERPRET,
    )(p, p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def div2(fs, comps):
    """Volume-integrated periodic divergence of a rank-2 staggered tuple."""
    return _div2_impl(fs, comps)


def _div2_fwd(fs, comps):
    return _div2_impl(fs, comps), None


def _div2_bwd(fs, _, ct):
    return (tuple(-g for g in _grad2_impl(fs, ct)),)


div2.defvjp(_div2_fwd, _div2_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def grad2(fs, p):
    """Periodic staggered gradient components of a rank-2 centered field;
    transpose pair of div2."""
    return _grad2_impl(fs, p)


def _grad2_fwd(fs, p):
    return _grad2_impl(fs, p), None


def _grad2_bwd(fs, _, ct):
    return (-_div2_impl(fs, tuple(ct)),)


grad2.defvjp(_grad2_fwd, _grad2_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def div3(fs, comps):
    """Volume-integrated periodic divergence of a rank-3 staggered tuple;
    fs = (prod(dx)/dx_d per axis). One z-gridded launch."""
    return _div3_impl(fs, comps)


def _div3_fwd(fs, comps):
    return _div3_impl(fs, comps), None


def _div3_bwd(fs, _, ct):
    return (tuple(-g for g in _grad3_impl(fs, ct)),)


div3.defvjp(_div3_fwd, _div3_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def grad3(fs, p):
    """Periodic staggered gradient components of a rank-3 centered field;
    transpose pair of div3. One z-gridded launch emitting all 3 components."""
    return _grad3_impl(fs, p)


def _grad3_fwd(fs, p):
    return _grad3_impl(fs, p), None


def _grad3_bwd(fs, _, ct):
    return (-_div3_impl(fs, tuple(ct)),)


grad3.defvjp(_grad3_fwd, _grad3_bwd)
