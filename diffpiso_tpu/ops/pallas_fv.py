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


def _fv_bz(nz, plane_bytes):
    """z-block size for the rank-3 FV launches: the grid runs over nz/bz
    blocks of bz planes so the pipelined DMAs move MB-class blocks instead
    of single planes (measured at 256^3 the 1-plane grid ran 3.8x its HBM
    floor, runs/roofline3d_256.log — 0.26 MB blocks undersaturate HBM).
    Largest divisor of nz with the double-buffered 2*(4*bz+1)-block
    residency within 24 MiB, capped at 16 (the zblock tight-ceiling lesson:
    keep the reservation small, solvers/pallas_krylov.py:1249).
    DIFFPISO_FV_ZBLOCK=never pins bz=1 (the r3 per-plane grid)."""
    if os.environ.get("DIFFPISO_FV_ZBLOCK", "auto") == "never":
        return 1
    best = 1
    for bz in range(2, min(nz, 16) + 1):
        if nz % bz == 0 and 2 * (4 * bz + 1) * plane_bytes <= 24 * 1024 * 1024:
            best = bz
    return best


def _fv_compiler_params(bz, plane_bytes):
    if bz == 1:
        return None
    need = 3 * (4 * bz + 1) * plane_bytes
    return pltpu.CompilerParams(
        vmem_limit_bytes=int(min(64 * 1024 * 1024,
                                 max(16 * 1024 * 1024, need)))
    )


def _div3_kernel(f0, f1, f2, w, wup, v, u, out):
    # axis order (z, y, x); component d staggered along axis d, unique faces.
    # div[k] = (w[k+1]-w[k]) f0 + (v[y+1]-v) f1 + (u[x+1]-u) f2
    # blocks are (bz, ny, nx): z-neighbor via concatenate with the wup
    # sliver (first plane of the next block), in-plane rolls on axes 1/2
    wc = w[:]
    vc = v[:]
    uc = u[:]
    if wc.shape[0] == 1:  # static: avoid a zero-sized concat operand
        zup = wup[:]
    else:
        zup = jnp.concatenate([wc[1:], wup[:]], 0)
    d = (zup - wc) * f0
    d = d + (_roll(vc, -1, 1) - vc) * f1
    d = d + (_roll(uc, -1, 2) - uc) * f2
    out[:] = d


def _div3_impl(fs, comps):
    w, v, u = comps
    nz = w.shape[0]
    plane_sh = w.shape[1:]
    bz = _fv_bz(nz, int(plane_sh[0]) * int(plane_sh[1])
                * jnp.dtype(w.dtype).itemsize)
    blk = pl.BlockSpec((bz,) + plane_sh, lambda i: (i, 0, 0))
    up = pl.BlockSpec((1,) + plane_sh, lambda i: (((i + 1) * bz) % nz, 0, 0))
    params = _fv_compiler_params(
        bz, int(plane_sh[0]) * int(plane_sh[1]) * jnp.dtype(w.dtype).itemsize)
    return pl.pallas_call(
        functools.partial(_div3_kernel, *fs),
        out_shape=jax.ShapeDtypeStruct(w.shape, w.dtype),
        grid=(nz // bz,),
        in_specs=[blk, up, blk, blk],
        out_specs=blk,
        interpret=_INTERPRET,
        **({"compiler_params": params} if params else {}),
    )(w, w, v, u)


def _grad3_kernel(f0, f1, f2, p, pdn, out0, out1, out2):
    # grad_d[j] = (p[j] - p[j - e_d]) f_d, periodic unique faces; pdn is the
    # last plane of the previous block
    pc = p[:]
    if pc.shape[0] == 1:  # static: avoid a zero-sized concat operand
        zdn = pdn[:]
    else:
        zdn = jnp.concatenate([pdn[:], pc[:-1]], 0)
    out0[:] = (pc - zdn) * f0
    out1[:] = (pc - _roll(pc, 1, 1)) * f1
    out2[:] = (pc - _roll(pc, 1, 2)) * f2


def _grad3_impl(fs, p):
    nz = p.shape[0]
    plane_sh = p.shape[1:]
    bz = _fv_bz(nz, int(plane_sh[0]) * int(plane_sh[1])
                * jnp.dtype(p.dtype).itemsize)
    blk = pl.BlockSpec((bz,) + plane_sh, lambda i: (i, 0, 0))
    dn = pl.BlockSpec((1,) + plane_sh, lambda i: ((i * bz - 1) % nz, 0, 0))
    shape = jax.ShapeDtypeStruct(p.shape, p.dtype)
    params = _fv_compiler_params(
        bz, int(plane_sh[0]) * int(plane_sh[1]) * jnp.dtype(p.dtype).itemsize)
    return pl.pallas_call(
        functools.partial(_grad3_kernel, *fs),
        out_shape=(shape, shape, shape),
        grid=(nz // bz,),
        in_specs=[blk, dn],
        out_specs=(blk, blk, blk),
        interpret=_INTERPRET,
        **({"compiler_params": params} if params else {}),
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


# -- rank-2 MIXED/BOUNDED kernels (cavity, channels, mixing layers) ---------------
#
# Bounded axes carry n+1 duplicated faces; the divergence is an in-core
# hi-lo slice and the gradient builds its ghost rows from the pad mode
# (ZERO or REPLICATE — SYMMETRIC at width 1 IS replicate; the pressure pad
# is always one of these, fields/material.py pressure_pad). The adjoint
# pair generalizes the periodic transpose identity:
#   div_m^T(ct)  = -grad_{ZERO pads, no mask}(ct)
#   grad_m^T(ct) =  -div-like gather of (face_mask * ct) with +f*mct[0] /
#                   -f*mct[n] edge corrections on REPLICATE ends
# both verified against autodiff of the jnp path in the interpret tests.


def eligible2m(comp_shapes, out_shape, dtype) -> bool:
    """Monolithic mixed/bounded eligibility: every operand resident.

    Default ON: TPU-validated at the 513x512 cavity shape (runs/
    lowering.log BOUNDED FV OK) and A/B'd on the 512^2 developed cavity
    (runs/ab_advm.log, 2 reps): fwd 3196.4 vs 3058.0 baseline (+4.5%),
    grad30 827.0 vs 820.5 (neutral)."""
    if os.environ.get("DIFFPISO_FUSED_FVM", "auto") == "never":
        return False
    if not _PALLAS_AVAILABLE:
        return False
    from diffpiso_tpu.ops import pallas_stencil as _ps

    if _ps._DISABLED_DEPTH > 0 or os.environ.get("DIFFPISO_DISABLE_PALLAS"):
        return False
    if jax.default_backend() not in ("tpu",) and not _INTERPRET:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if itemsize > 4:
        return False
    total = sum(s[0] * s[1] for s in comp_shapes) + out_shape[0] * out_shape[1]
    # comps + out + (mask planes for the gradient) + double buffering
    return (total + sum(s[0] * s[1] for s in comp_shapes)) * 2 * itemsize \
        <= _VMEM_BUDGET_BYTES


def _div2m_kernel(periodic, f0, f1, v, u, out):
    vc = v[:]
    uc = u[:]
    if periodic[0]:
        t0 = (_roll(vc, -1, 0) - vc) * f0
    else:
        t0 = (vc[1:, :] - vc[:-1, :]) * f0
    if periodic[1]:
        t1 = (_roll(uc, -1, 1) - uc) * f1
    else:
        t1 = (uc[:, 1:] - uc[:, :-1]) * f1
    out[:] = t0 + t1


def _div2m_impl(fs, periodic, out_shape, comps):
    v, u = comps
    return pl.pallas_call(
        functools.partial(_div2m_kernel, periodic, *fs),
        out_shape=jax.ShapeDtypeStruct(out_shape, v.dtype),
        interpret=_INTERPRET,
    )(v, u)


def _grad2m_kernel(periodic, rep, masked, f0, f1, p, *rest):
    # rep[d] = (lo_replicate, hi_replicate) for bounded axes; masked ->
    # rest = (mask_v, mask_u, outs...) face masks multiplied in
    if masked:
        mv, mu = rest[0], rest[1]
        outv, outu = rest[2], rest[3]
    else:
        outv, outu = rest[0], rest[1]
    pc = p[:]
    zrow = jnp.zeros_like(pc[0:1, :])
    zcol = jnp.zeros_like(pc[:, 0:1])
    if periodic[0]:
        g0 = (pc - _roll(pc, 1, 0)) * f0
    else:
        glo = (pc[0:1, :] - (pc[0:1, :] if rep[0][0] else zrow)) * f0
        ghi = ((pc[-1:, :] if rep[0][1] else zrow) - pc[-1:, :]) * f0
        g0 = jnp.concatenate([glo, (pc[1:, :] - pc[:-1, :]) * f0, ghi], 0)
    if periodic[1]:
        g1 = (pc - _roll(pc, 1, 1)) * f1
    else:
        glo = (pc[:, 0:1] - (pc[:, 0:1] if rep[1][0] else zcol)) * f1
        ghi = ((pc[:, -1:] if rep[1][1] else zcol) - pc[:, -1:]) * f1
        g1 = jnp.concatenate([glo, (pc[:, 1:] - pc[:, :-1]) * f1, ghi], 1)
    if masked:
        g0 = g0 * mv[:]
        g1 = g1 * mu[:]
    outv[:] = g0
    outu[:] = g1


def _grad2m_impl(fs, periodic, rep, comp_shapes, p, masks):
    masked = masks is not None
    shapes = tuple(
        jax.ShapeDtypeStruct(s, p.dtype) for s in comp_shapes
    )
    args = (p,) + (tuple(masks) if masked else ())
    return pl.pallas_call(
        functools.partial(_grad2m_kernel, periodic, rep, masked, *fs),
        out_shape=shapes,
        interpret=_INTERPRET,
    )(*args)


def _gradT2m_kernel(periodic, rep, masked, f0, f1, ctv, ctu, *rest):
    # p-cotangent of _grad2m_kernel: base gather f*(mct[i] - mct[i+1]) per
    # axis (the ZERO-pad adjoint), with REPLICATE edge corrections
    if masked:
        mv, mu = rest[0], rest[1]
        out = rest[2]
        m0 = ctv[:] * mv[:]
        m1 = ctu[:] * mu[:]
    else:
        out = rest[0]
        m0 = ctv[:]
        m1 = ctu[:]
    if periodic[0]:
        t0 = (m0 - _roll(m0, -1, 0)) * f0
    else:
        t0 = (m0[:-1, :] - m0[1:, :]) * f0
        if rep[0][0]:
            t0 = jnp.concatenate([t0[0:1, :] - f0 * m0[0:1, :], t0[1:, :]], 0)
        if rep[0][1]:
            t0 = jnp.concatenate([t0[:-1, :], t0[-1:, :] + f0 * m0[-1:, :]], 0)
    if periodic[1]:
        t1 = (m1 - _roll(m1, -1, 1)) * f1
    else:
        t1 = (m1[:, :-1] - m1[:, 1:]) * f1
        if rep[1][0]:
            t1 = jnp.concatenate([t1[:, 0:1] - f1 * m1[:, 0:1], t1[:, 1:]], 1)
        if rep[1][1]:
            t1 = jnp.concatenate([t1[:, :-1], t1[:, -1:] + f1 * m1[:, -1:]], 1)
    out[:] = t0 + t1


def _gradT2m_impl(fs, periodic, rep, out_shape, cts, masks):
    masked = masks is not None
    args = tuple(cts) + (tuple(masks) if masked else ())
    return pl.pallas_call(
        functools.partial(_gradT2m_kernel, periodic, rep, masked, *fs),
        out_shape=jax.ShapeDtypeStruct(out_shape, cts[0].dtype),
        interpret=_INTERPRET,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def div2m(fs, periodic, out_shape, comps):
    """Volume-integrated mixed/bounded rank-2 divergence (duplicated +1
    faces on bounded axes)."""
    return _div2m_impl(fs, periodic, out_shape, comps)


def _div2m_fwd(fs, periodic, out_shape, comps):
    return _div2m_impl(fs, periodic, out_shape, comps), None


def _div2m_bwd(fs, periodic, out_shape, _, ct):
    # d(div)/d(comp_d): ZERO-ghost gradient, negated per the transpose pair
    comp_shapes = tuple(
        tuple(out_shape[i] + (0 if periodic[d] else 1) * (i == d)
              for i in range(2))
        for d in range(2)
    )
    rep = ((False, False), (False, False))
    g = _grad2m_impl(fs, periodic, rep, comp_shapes, ct, None)
    return (tuple(-gc for gc in g),)


div2m.defvjp(_div2m_fwd, _div2m_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def grad2m(fs, periodic, rep, comp_shapes, p, masks):
    """Mixed/bounded rank-2 staggered gradient with pad-mode ghost rows and
    optional face masks (masks=None or a 2-tuple of face-mask planes)."""
    return _grad2m_impl(fs, periodic, rep, comp_shapes, p, masks)


def _grad2m_fwd(fs, periodic, rep, comp_shapes, p, masks):
    return _grad2m_impl(fs, periodic, rep, comp_shapes, p, masks), masks


def _grad2m_bwd(fs, periodic, rep, comp_shapes, masks, cts):
    out_shape = tuple(
        comp_shapes[0][i] - (0 if periodic[0] else 1) * (i == 0)
        for i in range(2)
    )
    p_ct = _gradT2m_impl(fs, periodic, rep, out_shape, cts, masks)
    if masks is None:
        return (p_ct, None)
    return (p_ct, tuple(jnp.zeros_like(m) for m in masks))


grad2m.defvjp(_grad2m_fwd, _grad2m_bwd)


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
