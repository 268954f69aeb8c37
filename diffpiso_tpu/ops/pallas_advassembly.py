"""Fused Pallas TPU kernel for the advection-diffusion stencil assembly.

The r3 roofline (roofline.py, BENCH_DETAIL.json) measured the jnp assembly
(ops/stencil.py assemble_advection_stencil — the CentralDifferenceMatrixCsr
redesign, CUDAsrc/central_difference_csr_op.cu.cc:148-453) at 0.57 ms of
the 1.28 ms 512^2 step — 45%, the single largest phase. The cause is not
FLOPs: every `_win` slice of the 1-padded velocity planes is an unaligned
(8,128)-tile relayout that XLA emits as its own kernel + HBM round trip.

This kernel computes, for the UNIFORM-mask periodic case (the decaying-
turbulence headline: all cells active, no Dirichlet faces, no no-slip
walls, scalar viscosity), all 12 stencil planes (center, lo_y, hi_y, lo_x,
hi_x, diag_A for both components) in ONE row-tiled launch reading the two
velocity planes once:

  flux_lo[c][d] = 0.5*(w_d + w_d shifted +1 along c) * area_d
  flux_hi[c][d] = flux_lo[c][d] shifted -1 along d
  lo_d = 0.5*flux_lo + visc_d        hi_d = -0.5*flux_hi + visc_d
  diag = sum_d 0.5*(flux_lo - flux_hi) - 2*visc_d
  center = diag - beta               diag_A = diag
  (uniform-mask specialization of cu.cc:256-294: tbb == 1 everywhere)

y-shifts come from 8-row modular halo slivers (the pallas_stencil tiled
pattern); x-shifts run in-core via pltpu.roll. Equality with the jnp
assembly is asserted in tests/test_pallas_advassembly.py (interpret mode).

Gradient semantics: the reference defines the assembly's gradient as ZERO
(piso_tf.py:116-128 wraps the CUDA op in a custom gradient returning None;
Picard linearization of the adjoint). piso_step accordingly calls assembly
on stop_gradient'ed velocity, so no cotangent ever reaches this kernel on
the solver path; the custom_vjp here returns zero velocity cotangents,
matching the reference, because pltpu.roll has no AD rule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    _PALLAS_AVAILABLE = False

from diffpiso_tpu.ops.pallas_stencil import _VMEM_BUDGET_BYTES, _pick_tile

_INTERPRET = False


def _rollx(x, shift):
    # pltpu.roll needs a non-negative shift; jnp.roll semantics otherwise
    return pltpu.roll(x, shift % x.shape[1], 1)


def _uniform_masks(dirichlet_mask, active_mask, no_slip_mask):
    """True iff the masks are concrete and trivially uniform (no Dirichlet
    faces, all cells active, no no-slip walls). NB the checks run on NUMPY
    views of the concrete arrays: jnp reductions inside a jit trace return
    tracers even for closed-over constants, and bool(tracer) would throw
    (this silently disabled the fast path in the first r3 A/B)."""
    try:
        for c in dirichlet_mask.components:
            if c is None or isinstance(c, jax.core.Tracer):
                return False
            if np.any(np.asarray(c)):
                return False
        if isinstance(active_mask, jax.core.Tracer):
            return False
        if not np.all(np.asarray(active_mask) == 1):
            return False
        if no_slip_mask is not None:
            if isinstance(no_slip_mask, jax.core.Tracer):
                return False
            if np.any(np.asarray(no_slip_mask)):
                return False
    except Exception:
        return False
    return True


def advassembly_eligible(velocity, dirichlet_mask, active_mask, no_slip_mask,
                         viscosity, periodic) -> bool:
    import os

    if not _PALLAS_AVAILABLE:
        return False
    from diffpiso_tpu.ops import pallas_stencil as _ps

    if _ps._DISABLED_DEPTH > 0:  # no_pallas() — sharded traces
        return False
    if os.environ.get("DIFFPISO_DISABLE_PALLAS"):
        return False
    if jax.default_backend() != "tpu" and not _INTERPRET:
        return False
    if velocity.rank != 2 or periodic != (True, True):
        return False
    shapes = {c.shape for c in velocity.components}
    if len(shapes) != 1:
        return False
    (ny, nx), = shapes
    if jnp.dtype(velocity.dtype).itemsize > 4:
        return False
    if isinstance(viscosity, (jax.Array, np.ndarray)) and getattr(
        viscosity, "ndim", 0
    ) > 0:
        return False  # per-face viscosity fields (LES) keep the jnp path
    if not isinstance(viscosity, (int, float)) and isinstance(
        viscosity, jax.core.Tracer
    ):
        pass  # traced scalar viscosity is fine (goes to SMEM)
    # ~20 resident planes double-buffered across the grid pipeline
    if _pick_tile(ny, nx, 4, planes=20) is None or nx % 128 != 0:
        return False
    return _uniform_masks(dirichlet_mask, active_mask, no_slip_mask)


def _mk_kernel(tile, rank_shapes):
    def kernel(w0_ref, w1_ref, w0u_ref, w0d_ref, w1u_ref, w1d_ref, s_ref,
               c0_ref, lo0y_ref, hi0y_ref, lo0x_ref, hi0x_ref, a0_ref,
               c1_ref, lo1y_ref, hi1y_ref, lo1x_ref, hi1x_ref, a1_ref):
        beta = s_ref[0]
        area = (s_ref[1], s_ref[2])
        visc = (s_ref[3], s_ref[4])

        w = (w0_ref[:], w1_ref[:])
        up = (w0u_ref[7:8, :], w1u_ref[7:8, :])   # row index -1 of the tile
        dn = (w0d_ref[0:1, :], w1d_ref[0:1, :])   # row index `tile`

        # every intermediate stays tile-row-aligned (concat of tile-1 rows
        # + 1 sliver row), the _tiled_kernel pattern — a (tile+2)-row
        # extended plane would be sublane-misaligned and slow on Mosaic
        def roll_ym(x, x_up):  # element i <- x[i-1]
            return jnp.concatenate([x_up, x[:-1]], 0)

        outs = (
            (c0_ref, lo0y_ref, hi0y_ref, lo0x_ref, hi0x_ref, a0_ref),
            (c1_ref, lo1y_ref, hi1y_ref, lo1x_ref, hi1x_ref, a1_ref),
        )
        for c in range(2):
            diag = None
            los, his = [], []
            for d in range(2):
                wd = w[d]
                if c == 0:
                    sh = roll_ym(wd, up[d])
                    sh_last = w[d][-1:]          # S_c^+(w_d) at row `tile`
                else:
                    sh = _rollx(wd, 1)
                    sh_last = _rollx(dn[d], 1)
                flux_lo = 0.5 * (wd + sh) * area[d]
                if d == 0:
                    # flux_hi[i] = flux_lo[i+1]; row `tile` built from slivers
                    last = 0.5 * (dn[d] + sh_last) * area[d]
                    flux_hi = jnp.concatenate([flux_lo[1:], last], 0)
                else:
                    flux_hi = _rollx(flux_lo, -1)
                los.append(0.5 * flux_lo + visc[d])
                his.append(-0.5 * flux_hi + visc[d])
                contrib = 0.5 * (flux_lo - flux_hi) - 2.0 * visc[d]
                diag = contrib if diag is None else diag + contrib
            cr, loy, hiy, lox, hix, ar = outs[c]
            cr[:] = diag - beta
            loy[:] = los[0]
            hiy[:] = his[0]
            lox[:] = los[1]
            hix[:] = his[1]
            ar[:] = diag

    return kernel


def _fused_assembly_impl(w0, w1, scalars):
    ny, nx = w0.shape
    tile = _pick_tile(ny, nx, 4, planes=20)
    n_tiles = ny // tile
    nb8 = ny // 8
    tpb = tile // 8
    tile_spec = pl.BlockSpec((tile, nx), lambda i: (i, 0))
    up_spec = pl.BlockSpec((8, nx), lambda i: ((i * tpb - 1) % nb8, 0))
    dn_spec = pl.BlockSpec((8, nx), lambda i: (((i + 1) * tpb) % nb8, 0))
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = [jax.ShapeDtypeStruct((ny, nx), w0.dtype)] * 12
    return pl.pallas_call(
        _mk_kernel(tile, (ny, nx)),
        grid=(n_tiles,),
        in_specs=[tile_spec, tile_spec, up_spec, dn_spec, up_spec, dn_spec,
                  smem_spec],
        out_specs=[tile_spec] * 12,
        out_shape=out_shape,
        interpret=_INTERPRET,
    )(w0, w1, w0, w0, w1, w1, scalars)


@jax.custom_vjp
def _fused_assembly(w0, w1, scalars):
    return _fused_assembly_impl(w0, w1, scalars)


def _fused_assembly_fwd(w0, w1, scalars):
    return _fused_assembly_impl(w0, w1, scalars), (w0, w1, scalars)


def _fused_assembly_bwd(res, cts):
    # reference semantics: assembly contributes ZERO gradient
    # (piso_tf.py:116-128); piso_step stop_gradients the velocity anyway
    w0, w1, scalars = res
    return jnp.zeros_like(w0), jnp.zeros_like(w1), jnp.zeros_like(scalars)


_fused_assembly.defvjp(_fused_assembly_fwd, _fused_assembly_bwd)


# -- rank-2 MASKED assembly (bounded domains: cavity, channels, mixing layers) ----
#
# The uniform-mask kernel above covers the periodic turbulence class; the
# bounded workloads run the general jnp assembly whose `_win` slices of the
# 1-padded planes each cost an unaligned-relayout kernel + HBM round trip
# (measured 45% of the 512^2 step pre-fusion). Here the padded planes live
# in VMEM and every window is an in-core static slice: ONE launch per
# velocity component reproduces the full mask logic (flux, viscosity,
# no-slip 2nu, domain-boundary link drops, Dirichlet identity rows) —
# masks are read as DATA, so traced masks work too.


def _masked_eligible_shapes(velocity, active_mask):
    # per-component launch residency: both padded velocity planes + the two
    # padded masks + the component's dirichlet plane + 6 output planes
    itemsize = 4
    res_pad = active_mask.shape
    pad_bytes = sum(
        (vc.shape[0] + 2) * (vc.shape[1] + 2) for vc in velocity.components
    )
    worst = 0
    for comp in velocity.components:
        S = comp.shape
        total = (
            pad_bytes + 2 * res_pad[0] * res_pad[1] + 7 * S[0] * S[1]
        ) * itemsize
        worst = max(worst, total)
    return worst * 2 <= _VMEM_BUDGET_BYTES


def advassembly_masked_eligible(velocity, active_mask, viscosity,
                                periodic) -> bool:
    import os

    # default OFF by measurement (runs/ab_advm.log, 2 reps): the monolithic
    # masked kernel cannot compile at the production 512^2 cavity (operand
    # residency past the Mosaic stack — see runs/check_spectral_lowering.py)
    # and at its largest eligible scale (256^2 cavity) it trades +3.4% fwd
    # (8720 vs 8439) for -4.4% grad30 (2150 vs 2244): a net loss for the
    # training workloads bounded domains exist for. Re-flip if a row-tiled
    # variant lands that reaches 512^2 with a forward win that survives
    # the adjoint.
    if os.environ.get("DIFFPISO_FUSED_ADVM", "never") == "never":
        return False
    if not _PALLAS_AVAILABLE:
        return False
    from diffpiso_tpu.ops import pallas_stencil as _ps

    if _ps._DISABLED_DEPTH > 0:
        return False
    if os.environ.get("DIFFPISO_DISABLE_PALLAS"):
        return False
    if jax.default_backend() != "tpu" and not _INTERPRET:
        return False
    if velocity.rank != 2:
        return False
    if jnp.dtype(velocity.dtype).itemsize > 4:
        return False
    if isinstance(viscosity, (jax.Array, np.ndarray)) and getattr(
        viscosity, "ndim", 0
    ) > 0:
        return False  # per-face viscosity fields (LES) keep the jnp path
    return _masked_eligible_shapes(velocity, active_mask)


def _mk_masked_kernel(c, S, periodic, dtype):
    e = ((1, 0), (0, 1))
    neg_ec = tuple(-v for v in e[c])

    def win(arr, off):
        return jax.lax.slice(
            arr, (1 + off[0], 1 + off[1]),
            (1 + off[0] + S[0], 1 + off[1] + S[1]),
        )

    def kernel(wp0, wp1, act, ns, dm, s_ref,
               c_out, loy, hiy, lox, hix, ar):
        beta = s_ref[0]
        area = (s_ref[1], s_ref[2])
        visc = (s_ref[3], s_ref[4])
        w = (wp0[:], wp1[:])
        actv = act[:]
        nsv = ns[:]
        one = jnp.ones((), dtype)

        diag = None
        los, his = [], []
        for d in range(2):
            wd = w[d]
            ed_minus_ec = tuple(a - b for a, b in zip(e[d], e[c]))
            flux_lo = 0.5 * (win(wd, (0, 0)) + win(wd, neg_ec)) * area[d]
            flux_hi = 0.5 * (win(wd, e[d]) + win(wd, ed_minus_ec)) * area[d]

            if periodic[d]:
                interior_lo = interior_hi = jnp.ones(S, bool)
            else:
                idx = jax.lax.broadcasted_iota(jnp.int32, S, d)
                interior_lo = idx > 0
                interior_hi = idx < S[d] - 1

            off_lo = tuple(-v for v in e[d])
            off_hi = e[d] if d != c else (0, 0)
            act_lo = win(actv, off_lo)
            act_hi = win(actv, off_hi)
            ns_lo = win(nsv, off_lo) > 0.5
            ns_hi = win(nsv, off_hi) > 0.5

            tbb_lo = (act_lo == 1.0) | (interior_lo & ns_lo)
            tbb_hi = (act_hi == 1.0) | (interior_hi & ns_hi)
            tbb_lo_f = tbb_lo.astype(dtype)
            tbb_hi_f = tbb_hi.astype(dtype)

            coeff_lo = jnp.where(
                tbb_lo & interior_lo, 0.5 * flux_lo + visc[d], 0.0
            )
            coeff_hi = jnp.where(
                tbb_hi & interior_hi, -0.5 * flux_hi + visc[d], 0.0
            )

            wall = one if d != c else jnp.zeros((), dtype)
            contrib = flux_lo * (2.0 - tbb_lo_f) * 0.5 - visc[d] * (
                tbb_lo_f
                + wall * (1.0 - tbb_lo_f) * ns_lo.astype(dtype) * 2.0
            )
            contrib = contrib - flux_hi * (2.0 - tbb_hi_f) * 0.5 - visc[d] * (
                tbb_hi_f
                + wall * (1.0 - tbb_hi_f) * ns_hi.astype(dtype) * 2.0
            )
            diag = contrib if diag is None else diag + contrib
            los.append(coeff_lo)
            his.append(coeff_hi)

        dmb = dm[:] > 0.5
        c_out[:] = jnp.where(dmb, one, diag - beta)
        loy[:] = jnp.where(dmb, 0.0, los[0])
        hiy[:] = jnp.where(dmb, 0.0, his[0])
        lox[:] = jnp.where(dmb, 0.0, los[1])
        hix[:] = jnp.where(dmb, 0.0, his[1])
        ar[:] = jnp.where(dmb, 0.0, diag)

    return kernel


def _masked_assembly_impl(c, vel_pad, S, periodic, act, ns, dm, scalars):
    dtype = vel_pad[0].dtype
    out_shape = [jax.ShapeDtypeStruct(S, dtype)] * 6
    return pl.pallas_call(
        _mk_masked_kernel(c, S, periodic, dtype),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        interpret=_INTERPRET,
    )(vel_pad[0], vel_pad[1], act, ns, dm, scalars)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 2, 3))
def _masked_assembly(c, vel_pad, S, periodic, act, ns, dm, scalars):
    return _masked_assembly_impl(c, vel_pad, S, periodic, act, ns, dm, scalars)


def _masked_assembly_fwd(c, vel_pad, S, periodic, act, ns, dm, scalars):
    return (
        _masked_assembly_impl(c, vel_pad, S, periodic, act, ns, dm, scalars),
        (vel_pad, act, ns, dm, scalars),
    )


def _masked_assembly_bwd(c, S, periodic, res, cts):
    # reference semantics: assembly contributes ZERO gradient
    vel_pad, act, ns, dm, scalars = res
    return (
        tuple(jnp.zeros_like(v) for v in vel_pad),
        jnp.zeros_like(act), jnp.zeros_like(ns), jnp.zeros_like(dm),
        jnp.zeros_like(scalars),
    )


_masked_assembly.defvjp(_masked_assembly_fwd, _masked_assembly_bwd)


def fused_advection_assembly_masked(vel_pad, velocity, dx, viscosity, beta,
                                    dirichlet_mask, active_mask,
                                    no_slip_mask, periodic):
    """General-mask rank-2 assembly: one launch per component, all six
    stencil planes emitted with the padded operands resident in VMEM. Gate
    on advassembly_masked_eligible(). vel_pad: pad_staggered(velocity, ..., 1)."""
    import math as _math

    dxt = tuple(float(v) for v in dx)
    dxprod = _math.prod(dxt)
    dtype = velocity.dtype
    area = tuple(dxprod / dxt[d] for d in range(2))
    scalars = jnp.stack(
        [jnp.asarray(beta, dtype)]
        + [jnp.asarray(a, dtype) for a in area]
        + [jnp.asarray(viscosity, dtype) * (area[d] / dxt[d])
           for d in range(2)]
    )
    act = active_mask.astype(dtype)
    if no_slip_mask is None:
        ns = jnp.zeros_like(act)
    else:
        ns = no_slip_mask.astype(dtype)
    pads = tuple(p.astype(dtype) for p in vel_pad)
    centers, los, his, diag_As = [], [], [], []
    for c in range(2):
        S = velocity.components[c].shape
        dm = dirichlet_mask.components[c].astype(dtype)
        cr, loy, hiy, lox, hix, ar = _masked_assembly(
            c, pads, tuple(S), tuple(bool(p) for p in periodic),
            act, ns, dm, scalars,
        )
        centers.append(cr)
        los.append((loy, lox))
        his.append((hiy, hix))
        diag_As.append(ar)
    return tuple(centers), tuple(los), tuple(his), tuple(diag_As)


# -- rank-3 z-plane-gridded assembly ----------------------------------------------


def _rollp(x, shift, axis):
    # in-plane roll on a (ny, nx) plane; patched to jnp.roll in interpret tests
    return pltpu.roll(x, shift % x.shape[axis], axis)


def advassembly3_eligible(velocity, dirichlet_mask, active_mask, no_slip_mask,
                          viscosity, periodic) -> bool:
    import os

    # default ON: TPU-validated 2026-08-18 (runs/lowering.log ADV3 OK) and
    # A/B'd at 128^3 turb (runs/ab_3d.log, 2 reps): fwd 261.5/261.8 vs
    # 244.3 baseline (+7%), grad10 108.0 vs 110.9 (-2.6%, the kernel's
    # zero-gradient VJP leaves the backward on XLA) — net win for the
    # forward-dominated workloads this rank-3 assembly serves
    if os.environ.get("DIFFPISO_FUSED_ADV3", "auto") == "never":
        return False
    if not _PALLAS_AVAILABLE:
        return False
    from diffpiso_tpu.ops import pallas_stencil as _ps

    if _ps._DISABLED_DEPTH > 0:
        return False
    if os.environ.get("DIFFPISO_DISABLE_PALLAS"):
        return False
    if jax.default_backend() != "tpu" and not _INTERPRET:
        return False
    if velocity.rank != 3 or periodic != (True, True, True):
        return False
    shapes = {c.shape for c in velocity.components}
    if len(shapes) != 1:
        return False
    (nz, ny, nx), = shapes
    if jnp.dtype(velocity.dtype).itemsize > 4:
        return False
    if isinstance(viscosity, (jax.Array, np.ndarray)) and getattr(
        viscosity, "ndim", 0
    ) > 0:
        return False  # per-face viscosity fields (LES) keep the jnp path
    # 9 input + 24 output plane blocks, double-buffered across the z grid
    if nz < 2 or ny % 8 != 0 or nx % 128 != 0:
        return False
    if 33 * 2 * ny * nx * 4 > _VMEM_BUDGET_BYTES:
        return False
    return _uniform_masks(dirichlet_mask, active_mask, no_slip_mask)


def _kernel3(w0k, w1k, w2k, w0u, w1u, w2u, w0d, w1d, w2d, s_ref, *outs):
    # Uniform-mask periodic 3-D assembly, one z-plane per program. For
    # component c, axis d (z,y,x order):
    #   flux_lo = 0.5*(w_d + S_c^+ w_d) * area_d   (S_c^+ = shift +1 along c)
    #   flux_hi = S_d^- flux_lo
    # z-direction shifts read the k-1 / k+1 neighbor planes (wrapped
    # BlockSpec maps — the wrap IS the periodic boundary): S_z^+ w at plane
    # k is w[k-1]; flux_hi for d=z at plane k is flux_lo evaluated at k+1.
    beta = s_ref[0]
    area = (s_ref[1], s_ref[2], s_ref[3])
    visc = (s_ref[4], s_ref[5], s_ref[6])
    wk = (w0k[0], w1k[0], w2k[0])
    wu = (w0u[0], w1u[0], w2u[0])
    wd = (w0d[0], w1d[0], w2d[0])

    for c in range(3):
        diag = None
        los, his = [], []
        for d in range(3):
            if c == 0:
                sh_k, sh_p1 = wu[d], wk[d]
            else:
                sh_k = _rollp(wk[d], 1, c - 1)
                sh_p1 = _rollp(wd[d], 1, c - 1)
            flux_lo = 0.5 * (wk[d] + sh_k) * area[d]
            if d == 0:
                flux_hi = 0.5 * (wd[d] + sh_p1) * area[d]
            else:
                flux_hi = _rollp(flux_lo, -1, d - 1)
            los.append(0.5 * flux_lo + visc[d])
            his.append(-0.5 * flux_hi + visc[d])
            contrib = 0.5 * (flux_lo - flux_hi) - 2.0 * visc[d]
            diag = contrib if diag is None else diag + contrib
        cr, loz, hiz, loy, hiy, lox, hix, ar = outs[c * 8:(c + 1) * 8]
        cr[0] = diag - beta
        loz[0] = los[0]
        hiz[0] = his[0]
        loy[0] = los[1]
        hiy[0] = his[1]
        lox[0] = los[2]
        hix[0] = his[2]
        ar[0] = diag


def _fused_assembly3_impl(w0, w1, w2, scalars):
    nz, ny, nx = w0.shape
    plane = pl.BlockSpec((1, ny, nx), lambda i: (i, 0, 0))
    up = pl.BlockSpec((1, ny, nx), lambda i: ((i - 1) % nz, 0, 0))
    dn = pl.BlockSpec((1, ny, nx), lambda i: ((i + 1) % nz, 0, 0))
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = [jax.ShapeDtypeStruct((nz, ny, nx), w0.dtype)] * 24
    return pl.pallas_call(
        _kernel3,
        grid=(nz,),
        in_specs=[plane] * 3 + [up] * 3 + [dn] * 3 + [smem_spec],
        out_specs=[plane] * 24,
        out_shape=out_shape,
        interpret=_INTERPRET,
    )(w0, w1, w2, w0, w1, w2, w0, w1, w2, scalars)


@jax.custom_vjp
def _fused_assembly3(w0, w1, w2, scalars):
    return _fused_assembly3_impl(w0, w1, w2, scalars)


def _fused_assembly3_fwd(w0, w1, w2, scalars):
    return _fused_assembly3_impl(w0, w1, w2, scalars), (w0, w1, w2, scalars)


def _fused_assembly3_bwd(res, cts):
    # reference semantics: assembly contributes ZERO gradient
    # (piso_tf.py:116-128); piso_step stop_gradients the velocity anyway
    w0, w1, w2, scalars = res
    return (jnp.zeros_like(w0), jnp.zeros_like(w1), jnp.zeros_like(w2),
            jnp.zeros_like(scalars))


_fused_assembly3.defvjp(_fused_assembly3_fwd, _fused_assembly3_bwd)


def fused_advection_assembly_3d(velocity, dx, viscosity, beta):
    """One z-gridded launch computing all 24 stencil planes of the rank-3
    uniform-mask periodic assembly (3 components x center/lo_z/hi_z/lo_y/
    hi_y/lo_x/hi_x/diag_A), reading the three velocity fields once. Gate on
    advassembly3_eligible()."""
    import math as _math

    dxt = tuple(float(v) for v in dx)
    dxprod = _math.prod(dxt)
    dtype = velocity.dtype
    area = tuple(dxprod / dxt[d] for d in range(3))
    scalars = jnp.stack(
        [jnp.asarray(beta, dtype)]
        + [jnp.asarray(a, dtype) for a in area]
        + [jnp.asarray(viscosity, dtype) * (area[d] / dxt[d]) for d in range(3)]
    )
    planes = _fused_assembly3(
        velocity.components[0], velocity.components[1],
        velocity.components[2], scalars,
    )
    centers, los, his, diag_As = [], [], [], []
    for c in range(3):
        cr, loz, hiz, loy, hiy, lox, hix, ar = planes[c * 8:(c + 1) * 8]
        centers.append(cr)
        los.append((loz, loy, lox))
        his.append((hiz, hiy, hix))
        diag_As.append(ar)
    return tuple(centers), tuple(los), tuple(his), tuple(diag_As)


def fused_advection_assembly(velocity, dx, viscosity, beta):
    """One-launch uniform-mask periodic assembly. Returns the
    AdvectionStencil pieces as (centers, los, his, diag_As) tuples matching
    assemble_advection_stencil's output layout. Gate on
    advassembly_eligible()."""
    import math as _math

    dxt = tuple(float(v) for v in dx)
    dxprod = _math.prod(dxt)
    dtype = velocity.dtype
    area = tuple(dxprod / dxt[d] for d in range(2))
    scalars = jnp.stack(
        [
            jnp.asarray(beta, dtype),
            jnp.asarray(area[0], dtype),
            jnp.asarray(area[1], dtype),
            jnp.asarray(viscosity, dtype) * (area[0] / dxt[0]),
            jnp.asarray(viscosity, dtype) * (area[1] / dxt[1]),
        ]
    )
    (c0, lo0y, hi0y, lo0x, hi0x, a0,
     c1, lo1y, hi1y, lo1x, hi1x, a1) = _fused_assembly(
        velocity.components[0], velocity.components[1], scalars
    )
    centers = (c0, c1)
    los = ((lo0y, lo0x), (lo1y, lo1x))
    his = ((hi0y, hi0x), (hi1y, hi1x))
    diag_As = (a0, a1)
    return centers, los, his, diag_As
