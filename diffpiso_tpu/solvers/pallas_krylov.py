"""Fused Pallas TPU kernels for Krylov iterations on the pressure system.

Motivation (measured, see CLAUDE.md): this TPU's per-HLO-kernel launch
overhead is ~30 us while one 512^2 f32 plane costs ~2 us of bandwidth — the
CG/PCG loops are LAUNCH-bound. One CG iteration assembled from jnp ops is
~10-14 kernels; these kernels collapse it to 1 (plain CG) or 2 (PCG, around
the unfusable spectral-preconditioner FFTs).

Everything here runs inside the custom_vjp'd solves (solvers/base.py), which
differentiate by solving the transposed system — the kernels themselves are
never autodiffed, so no VJP rules are needed.

Kernel set (all keep every operand resident in VMEM, scalars in SMEM):
  fused_residual(stencil, b, x)     -> r = proj(b - A x), max|r|      [1 kernel]
  fused_cg_iteration(stencil, ...)  -> full CG step incl. beta, p'    [1 kernel]
  fused_pcg_apply(stencil, ...)     -> q=A p, alpha, x', r', max|r'|  [1 kernel]
  fused_pcg_update(...)             -> rz', beta, p'                  [1 kernel]

The 5-point matvec uses the same roll formulation as ops/pallas_stencil.py;
the rank-one all-Neumann shift (s * sum(p), laplace rank deficiency) and the
mean-deflation projection are folded in as in-kernel reductions.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    _PALLAS_AVAILABLE = False

_VMEM_BUDGET_BYTES = 13 * 1024 * 1024


def _mxu_compiler_params():
    """Raised scoped-vmem ceiling for the single-program MXU spectral
    kernels: HIGHEST-precision dots keep hi/lo bf16 operand splits on the
    Mosaic stack, and the default 16 MiB limit is 420K short at the cavity
    pressure shape (513x512) even with the symbol precomputed outside.
    These kernels have no grid (one program owns the core), so raising the
    ceiling trades nothing away; v5e VMEM is 128 MiB."""
    return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

# tests flip this to run the exact production kernels on CPU
_INTERPRET = False


def _krylov_plumbing_ok(shape, dtype, rank=2) -> bool:
    """Shared non-size conditions for the fused iteration kernels."""
    if not _PALLAS_AVAILABLE:
        return False
    from diffpiso_tpu.ops import pallas_stencil as _ps

    if _ps._DISABLED_DEPTH > 0:  # no_pallas() — sharded traces
        return False
    if _ps._BATCHED_SAFE_DEPTH > 0:  # vmapped traces: no batching rule here
        return False
    if os.environ.get("DIFFPISO_DISABLE_PALLAS"):
        return False
    if jax.default_backend() not in ("tpu",):
        return False
    if len(shape) != rank:
        return False
    return jnp.dtype(dtype).itemsize <= 4


# the large-plane tier ceiling: 8 MiB f32 planes (1024^2 / 512x2048 /
# 1024x2048) — ~12 resident planes is 96 MiB, inside the 128 MiB VMEM with
# the explicit per-kernel ceilings from _auto_compiler_params
_LARGE_PLANE_BYTES = 8 * 1024 * 1024


def _large_mode() -> str:
    return os.environ.get("DIFFPISO_FUSED_KRYLOV_LARGE", "auto")


def eligible(shape, dtype, large_kinds=None) -> bool:
    """Measured trade-off (tunneled v5e): the fused iteration wins wherever
    the 12 resident planes fit VMEM. Small grids (257x256): 7.1 vs 11.4
    us/iter. 512^2 (remeasured r2, back-to-back bench A/B after the
    kernel-count and warm-start work changed the baseline): fwd 988.6 vs
    944.0 steps/s, grad30 453.5 vs 432.3 — the r1 crossover where the
    monolithic kernel lost at 512^2 no longer exists. Default: on up to the
    VMEM budget; DIFFPISO_FUSED_KRYLOV=always forces it past nothing extra,
    =never disables.

    LARGE tier (r4): planes past the default budget up to 8 MiB (1024^2,
    512x2048 — the shapes where the whole-solve pcg2 kernel hits its hard
    Mosaic wall, so the pressure loop was pure XLA) run the same phase
    kernels with explicitly sized compiler ceilings
    (_auto_compiler_params). Gate DIFFPISO_FUSED_KRYLOV_LARGE, default
    auto by A/B (runs/ab_phase_large.log)."""
    mode = os.environ.get("DIFFPISO_FUSED_KRYLOV", "auto")
    if mode == "never":
        return False
    if not _krylov_plumbing_ok(shape, dtype):
        return False
    itemsize = jnp.dtype(dtype).itemsize
    plane = shape[0] * shape[1] * itemsize
    # worst case resident planes: 5 coeffs + p + r + x + z + out x3
    if 12 * plane <= _VMEM_BUDGET_BYTES:
        return True
    if _large_mode() == "never" or plane > _LARGE_PLANE_BYTES:
        return False
    # LARGE tier by preconditioner family (runs/ab_phase_large.log, 2
    # interleaved reps): all-'fourier' (periodic turb1024) WINS fwd
    # 882-884 vs 602-798 / grad30 282 vs 226-269; ('dct2','dct2') (the
    # bounded 512x2048 mixing-layer DNS) LOSES fwd 551 vs 614-618 /
    # grad30 83 vs 113 — so auto restricts to the measured winner when
    # the caller can name the basis family. large_kinds=None (callers
    # without a preconditioner, e.g. cg / momentum fallbacks) keeps the
    # shape-only gate. Mode 'all' lifts the family restriction (the r5
    # re-measurement with hoisted bf16 splits — see
    # mm_update_large_eligible).
    if _large_mode() not in ("all", "all-highest") and (
        large_kinds is not None
        and any(k != "fourier" for k in large_kinds)
    ):
        return False
    return True


def _auto_compiler_params(*operands, extra_planes=4):
    """Explicit scoped-vmem ceiling sized from the ACTUAL operands: their
    bytes + `extra_planes` largest-plane temporaries + 2 MiB margin. The
    default 16 MiB Mosaic scope only fits the small-plane tier; returns
    None there so the small-tier compiles (and their measured A/Bs) stay
    byte-identical."""
    total = 0
    big = 0
    for a in operands:
        nb = int(np.prod(a.shape)) * jnp.dtype(a.dtype).itemsize
        total += nb
        big = max(big, nb)
    limit = total + extra_planes * big + 2 * 1024 * 1024
    if limit <= 14 * 1024 * 1024:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(127 * 1024 * 1024, limit)
    )


def _roll(x, shift, axis):
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _matvec(c, ly, hy, lx, hx, shift, p):
    q = c * p
    q = q + ly * _roll(p, 1, 0)
    q = q + hy * _roll(p, -1, 0)
    q = q + lx * _roll(p, 1, 1)
    q = q + hx * _roll(p, -1, 1)
    return q + shift * jnp.sum(p)


_SPEC_V = None  # filled lazily (pl may be absent)


def _vmem_specs(n):
    return [pl.BlockSpec(memory_space=pltpu.VMEM)] * n


def _smem_specs(n):
    return [pl.BlockSpec(memory_space=pltpu.SMEM)] * n


def eligible3(shape, dtype) -> bool:
    """Monolithic rank-3 per-iteration PCG phase kernels (128^3-class: an
    8 MiB volume — ~12 resident volumes fit under the explicit ceilings).
    Used by cg/pcg only; bicgstab's 3-D momentum tiers are separate
    (jac13d/zblock/plane). Gate DIFFPISO_FUSED_PHASE3, default NEVER by
    measurement (runs/ab_phase3.log, 2 reps at 128^3 turb): fwd 251 vs 258
    (-3%), grad10 108 vs 121 (-11%) — the same structural loss as PCG3 and
    the fused 3-D spectral apply: warm-started pressure solves run ~1
    iteration, where 2 whole-volume launches replace XLA ops the compiler
    already fuses across the iteration body, and the cold adjoint solves
    amplify it. Re-flip condition: a workload whose pressure solves run
    >> 2 iterations (weak preconditioning), where amortizing the launch
    pair over many iterations could invert the balance."""
    if os.environ.get("DIFFPISO_FUSED_PHASE3", "never") == "never":
        return False
    if not _krylov_plumbing_ok(shape, dtype, rank=3):
        return False
    vol = int(np.prod(shape)) * jnp.dtype(dtype).itemsize
    return 12 * vol <= 110 * 1024 * 1024


# -- r = proj(b - A x), rnorm ------------------------------------------------------


def _residual_kernel(deflate, c, ly, hy, lx, hx, sh, b, x, out_r, out_n):
    q = _matvec(c[:], ly[:], hy[:], lx[:], hx[:], sh[0], x[:])
    r = b[:] - q
    if deflate:
        r = r - jnp.sum(r) / r.size
    out_r[:] = r
    out_n[0] = jnp.max(jnp.abs(r))


def _matvec3(c, lz, hz, ly, hy, lx, hx, shift, p):
    # refs read inside (the jac13d register-spill discipline)
    q = c[:] * p
    q = q + lz[:] * _roll(p, 1, 0)
    q = q + hz[:] * _roll(p, -1, 0)
    q = q + ly[:] * _roll(p, 1, 1)
    q = q + hy[:] * _roll(p, -1, 1)
    q = q + lx[:] * _roll(p, 1, 2)
    q = q + hx[:] * _roll(p, -1, 2)
    return q + shift * jnp.sum(p)


def _residual3_kernel(deflate, c, lz, hz, ly, hy, lx, hx, sh, b, x,
                      out_r, out_n):
    q = _matvec3(c, lz, hz, ly, hy, lx, hx, sh[0], x[:])
    r = b[:] - q
    if deflate:
        r = r - jnp.sum(r) / r.size
    out_r[:] = r
    out_n[0] = jnp.max(jnp.abs(r))


def _stencil_ops3(stencil):
    return (stencil.center, stencil.lo[0], stencil.hi[0], stencil.lo[1],
            stencil.hi[1], stencil.lo[2], stencil.hi[2])


def fused_residual(stencil, b, x, deflate: bool):
    """r = proj(b - A x) and max|r| in one launch (rank 2 or 3)."""
    out_shapes = (
        jax.ShapeDtypeStruct(b.shape, b.dtype),
        jax.ShapeDtypeStruct((1,), b.dtype),
    )
    if b.ndim == 3:
        ops = _stencil_ops3(stencil)
        r, n = pl.pallas_call(
            functools.partial(_residual3_kernel, deflate),
            out_shape=out_shapes,
            in_specs=_vmem_specs(7) + _smem_specs(1) + _vmem_specs(2),
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            interpret=_INTERPRET,
            compiler_params=_auto_compiler_params(*ops, b, x,
                                                  extra_planes=4),
        )(*ops, jnp.reshape(jnp.asarray(stencil.shift, b.dtype), (1,)),
          b, x)
        return r, n[0]
    r, n = pl.pallas_call(
        functools.partial(_residual_kernel, deflate),
        out_shape=out_shapes,
        in_specs=_vmem_specs(5) + _smem_specs(1) + _vmem_specs(2),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=_INTERPRET,
        compiler_params=_auto_compiler_params(
            stencil.center, stencil.lo[0], stencil.hi[0], stencil.lo[1],
            stencil.hi[1], b, x, extra_planes=4,
        ),
    )(
        stencil.center, stencil.lo[0], stencil.hi[0], stencil.lo[1],
        stencil.hi[1], jnp.reshape(jnp.asarray(stencil.shift, b.dtype), (1,)),
        b, x,
    )
    return r, n[0]


# -- one full plain-CG iteration ---------------------------------------------------
#   z = A p; alpha = (p.r)/(p.z); x += alpha p; r -= alpha z (proj);
#   beta = -(r.z)/(p.z); p = r + beta p; rnorm = max|r|
#   (the reference CG recurrence, pressure_solve_op.cu.cc:257-357)


def _cg_iter_kernel(deflate, c, ly, hy, lx, hx, sh, x, r, p,
                    out_x, out_r, out_p, out_n):
    pv = p[:]
    rv = r[:]
    q = _matvec(c[:], ly[:], hy[:], lx[:], hx[:], sh[0], pv)
    pq = jnp.sum(pv * q)
    pr = jnp.sum(pv * rv)
    eps = jnp.asarray(1e-30, pq.dtype)
    alpha = jnp.where(jnp.abs(pq) > eps, pr / pq, 0.0)
    xn = x[:] + alpha * pv
    rn = rv - alpha * q
    if deflate:
        rn = rn - jnp.sum(rn) / rn.size
    beta = jnp.where(jnp.abs(pq) > eps, -jnp.sum(rn * q) / pq, 0.0)
    out_x[:] = xn
    out_r[:] = rn
    out_p[:] = rn + beta * pv
    out_n[0] = jnp.max(jnp.abs(rn))


def _cg_iter3_kernel(deflate, c, lz, hz, ly, hy, lx, hx, sh, x, r, p,
                     out_x, out_r, out_p, out_n):
    pv = p[:]
    rv = r[:]
    q = _matvec3(c, lz, hz, ly, hy, lx, hx, sh[0], pv)
    pq = jnp.sum(pv * q)
    pr = jnp.sum(pv * rv)
    eps = jnp.asarray(1e-30, pq.dtype)
    alpha = jnp.where(jnp.abs(pq) > eps, pr / pq, 0.0)
    xn = x[:] + alpha * pv
    rn = rv - alpha * q
    if deflate:
        rn = rn - jnp.sum(rn) / rn.size
    beta = jnp.where(jnp.abs(pq) > eps, -jnp.sum(rn * q) / pq, 0.0)
    out_x[:] = xn
    out_r[:] = rn
    out_p[:] = rn + beta * pv
    out_n[0] = jnp.max(jnp.abs(rn))


def fused_cg_iteration(stencil, x, r, p, deflate: bool):
    """One complete CG iteration in one launch (rank 2 or 3). Returns
    (x', r', p', rnorm)."""
    s = jax.ShapeDtypeStruct(x.shape, x.dtype)
    out_shapes = (s, s, s, jax.ShapeDtypeStruct((1,), x.dtype))
    if x.ndim == 3:
        ops = _stencil_ops3(stencil)
        xo, ro, po, n = pl.pallas_call(
            functools.partial(_cg_iter3_kernel, deflate),
            out_shape=out_shapes,
            in_specs=_vmem_specs(7) + _smem_specs(1) + _vmem_specs(3),
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            interpret=_INTERPRET,
            compiler_params=_auto_compiler_params(*ops, x, r, p,
                                                  extra_planes=6),
        )(
            *ops, jnp.reshape(jnp.asarray(stencil.shift, x.dtype), (1,)),
            x, r, p,
        )
        return xo, ro, po, n[0]
    xo, ro, po, n = pl.pallas_call(
        functools.partial(_cg_iter_kernel, deflate),
        out_shape=out_shapes,
        in_specs=_vmem_specs(5) + _smem_specs(1) + _vmem_specs(3),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=_INTERPRET,
        compiler_params=_auto_compiler_params(
            stencil.center, stencil.lo[0], stencil.hi[0], stencil.lo[1],
            stencil.hi[1], x, r, p, extra_planes=6,
        ),
    )(
        stencil.center, stencil.lo[0], stencil.hi[0], stencil.lo[1],
        stencil.hi[1], jnp.reshape(jnp.asarray(stencil.shift, x.dtype), (1,)),
        x, r, p,
    )
    return xo, ro, po, n[0]


# -- fused BiCGSTAB phases (the momentum solve) -------------------------------------
# The advection solve is ~30% of the r3 device step (trace: ~118 us of 410
# at 512^2): 2 Jacobi-BiCGSTAB iterations x 2 components x ~10 kernels.
# These three phase kernels collapse one iteration to 3 launches per
# component; the cross-component scalar reductions (rho, rhat.v, t.t, t.s)
# close between phases as cheap scalar glue. No shift term (the advection
# stencil has no rank-one deflation) and the operator sign (-M) and
# transpose (adjoint solves) fold into the kernel. No AD rules needed —
# the solve sits inside solve_advection_system's custom_vjp.


def _adv_matvec(c, ly, hy, lx, hx, p, transpose, sgn):
    # rolls address the trailing (y, x) axes so the same core serves the
    # rank-2 kernels and the rank-3 batch-FOLDED variants (leading batch
    # dim is never rolled — no cross-sample contamination)
    a0, a1 = p.ndim - 2, p.ndim - 1
    if not transpose:
        q = c * p
        q = q + ly * _roll(p, 1, a0)
        q = q + hy * _roll(p, -1, a0)
        q = q + lx * _roll(p, 1, a1)
        q = q + hx * _roll(p, -1, a1)
    else:
        q = c * p
        q = q + _roll(ly * p, -1, a0)
        q = q + _roll(hy * p, 1, a0)
        q = q + _roll(lx * p, -1, a1)
        q = q + _roll(hx * p, 1, a1)
    return sgn * q


def _bicg_p_kernel(transpose, c, ly, hy, lx, hx, invd, r, p, v, rhat, s_ref,
                   out_p, out_v, out_d):
    # p' = r + beta (p - omega v); v' = sgn S (invd p'); out_d = rhat.v'
    beta = s_ref[0]
    omega = s_ref[1]
    sgn = s_ref[2]
    pn = r[:] + beta * (p[:] - omega * v[:])
    vn = _adv_matvec(c[:], ly[:], hy[:], lx[:], hx[:], invd[:] * pn,
                     transpose, sgn)
    out_p[:] = pn
    out_v[:] = vn
    out_d[0] = jnp.sum(rhat[:] * vn)


def _bicg_s_kernel(transpose, c, ly, hy, lx, hx, invd, r, v, s_ref,
                   out_s, out_t, out_tt, out_ts):
    # s = r - alpha v; t = sgn S (invd s); partials t.t, t.s
    alpha = s_ref[0]
    sgn = s_ref[1]
    sv = r[:] - alpha * v[:]
    tv = _adv_matvec(c[:], ly[:], hy[:], lx[:], hx[:], invd[:] * sv,
                     transpose, sgn)
    out_s[:] = sv
    out_t[:] = tv
    out_tt[0] = jnp.sum(tv * tv)
    out_ts[0] = jnp.sum(tv * sv)


def _bicg_x_kernel(invd, p, s, t, x, rhat, s_ref,
                   out_x, out_r, out_n, out_rho):
    # x' = x + alpha invd p + omega invd s; r' = s - omega t;
    # partials: max|r'| and rhat.r' (the NEXT iteration's rho)
    alpha = s_ref[0]
    omega = s_ref[1]
    iv = invd[:]
    xn = x[:] + alpha * iv * p[:] + omega * iv * s[:]
    rn = s[:] - omega * t[:]
    out_x[:] = xn
    out_r[:] = rn
    out_n[0] = jnp.max(jnp.abs(rn))
    out_rho[0] = jnp.sum(rhat[:] * rn)


def _scal(x, *vals):
    return jnp.stack([jnp.asarray(v, x.dtype) for v in vals])


def fused_bicg_phase_p(st_c, invd, r, p, v, rhat, beta, omega, sgn,
                       transpose):
    """(p', v', partial rhat.v') for one component. st_c = (c, lo, hi)."""
    c, lo, hi = st_c
    s = jax.ShapeDtypeStruct(r.shape, r.dtype)
    pn, vn, d = pl.pallas_call(
        functools.partial(_bicg_p_kernel, transpose),
        out_shape=(s, s, jax.ShapeDtypeStruct((1,), r.dtype)),
        in_specs=_vmem_specs(10) + _smem_specs(1),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=_INTERPRET,
        compiler_params=_auto_compiler_params(
            c, lo[0], hi[0], lo[1], hi[1], invd, r, p, v, rhat,
            extra_planes=5,
        ),
    )(c, lo[0], hi[0], lo[1], hi[1], invd, r, p, v, rhat,
      _scal(r, beta, omega, sgn))
    return pn, vn, d[0]


def fused_bicg_phase_s(st_c, invd, r, v, alpha, sgn, transpose):
    """(s, t, partial t.t, partial t.s) for one component."""
    c, lo, hi = st_c
    s = jax.ShapeDtypeStruct(r.shape, r.dtype)
    one = jax.ShapeDtypeStruct((1,), r.dtype)
    sv, tv, tt, ts = pl.pallas_call(
        functools.partial(_bicg_s_kernel, transpose),
        out_shape=(s, s, one, one),
        in_specs=_vmem_specs(8) + _smem_specs(1),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=_INTERPRET,
        compiler_params=_auto_compiler_params(
            c, lo[0], hi[0], lo[1], hi[1], invd, r, v, extra_planes=5,
        ),
    )(c, lo[0], hi[0], lo[1], hi[1], invd, r, v, _scal(r, alpha, sgn))
    return sv, tv, tt[0], ts[0]


def fused_bicg_phase_x(invd, p, s, t, x, rhat, alpha, omega):
    """(x', r', partial max|r'|, partial rhat.r') for one component."""
    sh = jax.ShapeDtypeStruct(x.shape, x.dtype)
    one = jax.ShapeDtypeStruct((1,), x.dtype)
    xn, rn, n, rho = pl.pallas_call(
        _bicg_x_kernel,
        out_shape=(sh, sh, one, one),
        in_specs=_vmem_specs(6) + _smem_specs(1),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=_INTERPRET,
        compiler_params=_auto_compiler_params(
            invd, p, s, t, x, rhat, extra_planes=4,
        ),
    )(invd, p, s, t, x, rhat, _scal(x, alpha, omega))
    return xn, rn, n[0], rho[0]


# -- fused Jacobi-Richardson sweeps (the momentum accelerator) ----------------------
# The advection system is diagonally dominant BY CONSTRUCTION: the diagonal
# carries beta = prod(dx)/dt (central_difference_csr_op.cu.cc:294,
# piso_tf.py:26) so sum|off-diagonal|/|diagonal| ~ CFL + 4 nu dt/dx^2 <~
# 0.1 at production settings, and plain damped-free Jacobi
#   x <- x + D^-1 (b - A x)
# contracts the residual ~10x PER SWEEP. k sweeps + the exit residual run
# as ONE launch per component with every plane VMEM-resident (in-core
# rolls), vs ~3 launches per BiCGSTAB iteration — and the components
# decouple (the system is block-diagonal per velocity component, one CSR
# matrix each in the reference). bicgstab() runs this first and enters the
# Krylov loop only if the accelerator missed tol (dt too large for
# dominance), so failure semantics are untouched.


def _jacobi_sweeps_kernel(transpose, k, c, ly, hy, lx, hx, b, x,
                          s_ref, out_x, out_n):
    sgn = s_ref[0]
    cc, lyv, hyv, lxv, hxv = c[:], ly[:], hy[:], lx[:], hx[:]
    # Jacobi inverse diagonal derived in-kernel: diag(A) = sgn * c
    # (solvers/base.py _adv_operator_diag) — saves one HBM input plane
    d = sgn * cc
    iv = jnp.where(jnp.abs(d) > 1e-30, 1.0 / d, 1.0)
    bv = b[:]
    xv = x[:]
    for _ in range(k):
        xv = xv + iv * (bv - _adv_matvec(cc, lyv, hyv, lxv, hxv, xv,
                                         transpose, sgn))
    r = bv - _adv_matvec(cc, lyv, hyv, lxv, hxv, xv, transpose, sgn)
    out_x[:] = xv
    out_n[0] = jnp.max(jnp.abs(r))


def fused_jacobi_sweeps(st_c, b, x, k, sgn, transpose):
    """(x_k, max|b - A x_k|) after k VMEM-resident Jacobi sweeps for one
    component. st_c = (c, lo, hi) stencil planes; A = sgn * S; the Jacobi
    inverse diagonal 1/(sgn*c) is computed in-kernel."""
    c, lo, hi = st_c
    xn, n = pl.pallas_call(
        functools.partial(_jacobi_sweeps_kernel, transpose, k),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((1,), x.dtype),
        ),
        in_specs=_vmem_specs(7) + _smem_specs(1),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=_INTERPRET,
        compiler_params=_auto_compiler_params(
            c, lo[0], hi[0], lo[1], hi[1], b, x, extra_planes=5,
        ),
    )(c, lo[0], hi[0], lo[1], hi[1], b, x, _scal(x, sgn))
    return xn, n[0]


# -- whole-solve 2-D momentum Jacobi (ONE launch for BOTH components) ---------------
# The pcg2 pattern applied to the momentum solve: today's accelerator costs
# a k=1 probe launch per component plus a while-loop of k-sweep launches
# (2 launches/trip) with scalar reductions rendezvousing in XLA between
# them. This kernel runs the ENTIRE Jacobi-Richardson solve for both
# velocity components as one launch: maintained residuals give one in-core
# matvec per sweep (x += D^-1 r; r -= A D^-1 r), the convergence test runs
# per sweep instead of per k sweeps, and the final TRUE residual is
# recomputed for warn parity (the maintained r only drifts at the 1e-7
# level over the <=33-sweep budget, but warn must gate on b - A x).
# Warm-converged solves (cavity class) exit after the init residual — the
# same 2-matvec cost as the old probe launch but without its launch pair.


def _jacobi2_core(transpose, max_sweeps,
                  cv0, lyv0, hyv0, lxv0, hxv0, bv0, xv0,
                  cv1, lyv1, hyv1, lxv1, hxv1, bv1, xv1, sgn, tol):
    d0 = sgn * cv0
    d1 = sgn * cv1
    iv0 = jnp.where(jnp.abs(d0) > 1e-30, 1.0 / d0, 1.0)
    iv1 = jnp.where(jnp.abs(d1) > 1e-30, 1.0 / d1, 1.0)

    def mv0(p):
        return _adv_matvec(cv0, lyv0, hyv0, lxv0, hxv0, p, transpose, sgn)

    def mv1(p):
        return _adv_matvec(cv1, lyv1, hyv1, lxv1, hxv1, p, transpose, sgn)

    r0 = bv0 - mv0(xv0)
    r1 = bv1 - mv1(xv1)
    n0 = jnp.maximum(jnp.max(jnp.abs(r0)), jnp.max(jnp.abs(r1)))

    def cond(state):
        n, j = state[4], state[5]
        return (n > tol) & (j < max_sweeps)

    def body(state):
        xv0, xv1, r0, r1, _, j = state
        d0 = iv0 * r0
        d1 = iv1 * r1
        xv0 = xv0 + d0
        xv1 = xv1 + d1
        r0 = r0 - mv0(d0)
        r1 = r1 - mv1(d1)
        n = jnp.maximum(jnp.max(jnp.abs(r0)), jnp.max(jnp.abs(r1)))
        return xv0, xv1, r0, r1, n, j + 1

    xv0, xv1, r0, r1, n, j = jax.lax.while_loop(
        cond, body, (xv0, xv1, r0, r1, n0, jnp.zeros((), jnp.int32)))
    # true exit residual (the per-launch accelerator reports b - A x too)
    nt0 = jnp.max(jnp.abs(bv0 - mv0(xv0)))
    nt1 = jnp.max(jnp.abs(bv1 - mv1(xv1)))
    return xv0, xv1, jnp.maximum(nt0, nt1)


def _jacobi2_solve_kernel(transpose, max_sweeps,
                          c0, ly0, hy0, lx0, hx0, b0, x0,
                          c1, ly1, hy1, lx1, hx1, b1, x1,
                          sc, out_x0, out_x1, out_n):
    xv0, xv1, n = _jacobi2_core(
        transpose, max_sweeps,
        c0[:], ly0[:], hy0[:], lx0[:], hx0[:], b0[:], x0[:],
        c1[:], ly1[:], hy1[:], lx1[:], hx1[:], b1[:], x1[:],
        sc[0], sc[1])
    out_x0[:] = xv0
    out_x1[:] = xv1
    out_n[0] = n


def _jacobi2_solve_kernel_b(transpose, max_sweeps, sc_batched,
                            c0, ly0, hy0, lx0, hx0, b0, x0,
                            c1, ly1, hy1, lx1, hx1, b1, x1,
                            sc, out_x0, out_x1, out_n):
    i = pl.program_id(0)
    sgn, tol = (sc[i, 0], sc[i, 1]) if sc_batched else (sc[0], sc[1])
    xv0, xv1, n = _jacobi2_core(
        transpose, max_sweeps,
        c0[0], ly0[0], hy0[0], lx0[0], hx0[0], b0[0], x0[0],
        c1[0], ly1[0], hy1[0], lx1[0], hx1[0], b1[0], x1[0],
        sgn, tol)
    out_x0[0] = xv0
    out_x1[0] = xv1
    out_n[i, 0] = n


# -- batch-FOLDED whole-solve momentum Jacobi (r5) ----------------------------------
# The grid-over-batch rule above runs B sequential single-sample programs
# per launch — measured -7% at small planes (runs/ab_batched_pallas.log:
# 64x256 batch-8) because each program is launch-intercept-bound while XLA
# fuses across the batch. But the XLA path it loses to is ITSELF
# intercept-bound: the batched while-loop spends ~2 us/kernel on hundreds
# of tiny fused kernels (runs/profile_train_batch.log: 27k kernel
# executions per batch-8 training iteration). The fix for BOTH is ONE
# program holding ALL B samples' planes in VMEM (B x 64x256 f32 = 0.5
# MiB/field — trivial residency), sweeping the whole batch per iteration
# with per-sample masked updates: sample i's update is gated by its OWN
# maintained residual, so its trajectory is bit-identical to an
# independent solve (the mask commutes through the per-sample-linear
# matvec), and the loop exits when every sample has converged. Per-sample
# norms stay 2-D throughout ((B,1) via two single-axis reductions — no
# rank-1 vectors, which Mosaic reductions reject).


def _pmax2(r):
    """Per-sample max |r| over the trailing two axes: (B, n0, n1) ->
    (B, 1), via single-axis reductions (keeps everything rank >= 2)."""
    return jnp.max(jnp.max(jnp.abs(r), axis=2), axis=1, keepdims=True)


def _jacobi2_core_bf(transpose, max_sweeps,
                     cv0, lyv0, hyv0, lxv0, hxv0, bv0, xv0,
                     cv1, lyv1, hyv1, lxv1, hxv1, bv1, xv1, sgn, tol):
    """sgn/tol are either scalars (shared sc) or per-sample (B,1,1)/(B,1)
    arrays (batched sc — the adjoint regime, where the adjoint tolerance
    derives from the batched cotangent); all arithmetic broadcasts."""
    d0 = sgn * cv0
    d1 = sgn * cv1
    iv0 = jnp.where(jnp.abs(d0) > 1e-30, 1.0 / d0, 1.0)
    iv1 = jnp.where(jnp.abs(d1) > 1e-30, 1.0 / d1, 1.0)

    def mv0(p):
        return _adv_matvec(cv0, lyv0, hyv0, lxv0, hxv0, p, transpose, sgn)

    def mv1(p):
        return _adv_matvec(cv1, lyv1, hyv1, lxv1, hxv1, p, transpose, sgn)

    r0 = bv0 - mv0(xv0)
    r1 = bv1 - mv1(xv1)
    nv = jnp.maximum(_pmax2(r0), _pmax2(r1))  # (B, 1)

    def cond(state):
        nv, j = state[4], state[5]
        return jnp.any(nv > tol) & (j < max_sweeps)

    def body(state):
        xv0, xv1, r0, r1, nv, j = state
        act = (nv > tol).astype(xv0.dtype)[:, :, None]  # (B, 1, 1)
        d0 = act * (iv0 * r0)
        d1 = act * (iv1 * r1)
        xv0 = xv0 + d0
        xv1 = xv1 + d1
        r0 = r0 - mv0(d0)
        r1 = r1 - mv1(d1)
        nv = jnp.maximum(_pmax2(r0), _pmax2(r1))
        return xv0, xv1, r0, r1, nv, j + 1

    xv0, xv1, r0, r1, nv, j = jax.lax.while_loop(
        cond, body, (xv0, xv1, r0, r1, nv, jnp.zeros((), jnp.int32)))
    # per-sample true exit residual (warn parity with the solo kernel)
    nt = jnp.maximum(_pmax2(bv0 - mv0(xv0)), _pmax2(bv1 - mv1(xv1)))
    return xv0, xv1, nt


def _jacobi2_solve_kernel_bf(transpose, max_sweeps,
                             c0, ly0, hy0, lx0, hx0, b0, x0,
                             c1, ly1, hy1, lx1, hx1, b1, x1,
                             sc, out_x0, out_x1, out_n):
    xv0, xv1, nt = _jacobi2_core_bf(
        transpose, max_sweeps,
        c0[:], ly0[:], hy0[:], lx0[:], hx0[:], b0[:], x0[:],
        c1[:], ly1[:], hy1[:], lx1[:], hx1[:], b1[:], x1[:],
        sc[0], sc[1])
    out_x0[:] = xv0
    out_x1[:] = xv1
    out_n[:] = nt


def _jacobi2_solve_kernel_bfs(transpose, max_sweeps,
                              c0, ly0, hy0, lx0, hx0, b0, x0,
                              c1, ly1, hy1, lx1, hx1, b1, x1,
                              sc, out_x0, out_x1, out_n):
    """Batched-sc folded variant: sc is a (B, 2) VMEM array (col 0 sgn,
    col 1 tol — per-sample, the adjoint-solve regime). sgn broadcasts as
    (B,1,1) into the matvec/diagonal, tol as (B,1) into the per-sample
    convergence mask."""
    scv = sc[:]
    sgn = scv[:, 0:1][:, :, None]  # (B, 1, 1)
    tol = scv[:, 1:2]              # (B, 1)
    xv0, xv1, nt = _jacobi2_core_bf(
        transpose, max_sweeps,
        c0[:], ly0[:], hy0[:], lx0[:], hx0[:], b0[:], x0[:],
        c1[:], ly1[:], hy1[:], lx1[:], hx1[:], b1[:], x1[:],
        sgn, tol)
    out_x0[:] = xv0
    out_x1[:] = xv1
    out_n[:] = nt


def jac2_fold_eligible(axis_size, sh0, sh1, dtype) -> bool:
    """Gate for the batch-folded jac2 variant (DIFFPISO_FUSED_JAC2_FOLD:
    never | auto, default auto): SMALL per-sample planes only (< 1 MiB,
    i.e. below the 512^2 class where the grid-over-batch rule is the
    measured winner, runs/ab_batched_512_r4.log) with ~26 resident
    B-planes per component pair under the 96 MiB ceiling (batch-8 64x256
    is 13 MiB). Measured at batch-8 64x256 (runs/ab_batched_fold.log):
    neutral-to-+0.5% vs the all-XLA trace — kept because it is strictly
    better than the grid rule there (-7%, runs/ab_batched_pallas.log)
    for any vmapped small-plane workload that traces with kernels on,
    and bit-exact per sample (runs/check_jac2_fold_lowering.log)."""
    if os.environ.get("DIFFPISO_FUSED_JAC2_FOLD", "auto") == "never":
        return False
    itemsize = jnp.dtype(dtype).itemsize
    maxplane = itemsize * max(int(np.prod(sh0)), int(np.prod(sh1)))
    if maxplane >= 1 << 20:
        return False
    return 26 * axis_size * maxplane <= 96 * 1024 * 1024


def fused_jacobi2_solve(st_cs, b_c, x_c, sgn, transpose, tol, max_sweeps):
    """Whole-solve Jacobi-Richardson for a 2-component 2-D momentum system
    in ONE launch. st_cs = [(c, lo, hi)] * 2, b_c/x_c = component tuples.
    Returns (x0', x1', true max-residual over both components). The caller
    keeps its BiCGSTAB fallback cond on the returned norm — failure/warn
    semantics identical to the per-launch accelerator it replaces.
    Batches under jax.vmap via a grid-over-batch custom_vmap rule (see
    fused_jacobi1_solve)."""
    (c0, lo0, hi0), (c1, lo1, hi1) = st_cs
    b0, b1 = b_c
    x0, x1 = x_c
    sc = jnp.stack([jnp.asarray(sgn, b0.dtype), jnp.asarray(tol, b0.dtype)])

    @jax.custom_batching.custom_vmap
    def _solve(c0, ly0, hy0, lx0, hx0, b0, x0,
               c1, ly1, hy1, lx1, hx1, b1, x1, sc):
        s0 = jax.ShapeDtypeStruct(b0.shape, b0.dtype)
        s1 = jax.ShapeDtypeStruct(b1.shape, b1.dtype)
        return pl.pallas_call(
            functools.partial(_jacobi2_solve_kernel, transpose,
                              int(max_sweeps)),
            out_shape=(s0, s1, jax.ShapeDtypeStruct((1,), b0.dtype)),
            in_specs=_vmem_specs(7) + _vmem_specs(7) + _smem_specs(1),
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            interpret=_INTERPRET,
            compiler_params=pltpu.CompilerParams(
                # 14 input planes + 4 while carries + ~4 temps; the default
                # 16 MiB scoped stack is short at 512^2 (22+ f32 planes)
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
        )(c0, ly0, hy0, lx0, hx0, b0, x0,
          c1, ly1, hy1, lx1, hx1, b1, x1, sc)

    @_solve.def_vmap
    def _rule(axis_size, in_batched, *args):
        sc_ = args[14]
        planes = _broadcast_batch(axis_size, args[:14], in_batched[:14])
        sh0 = planes[5].shape[1:]
        sh1 = planes[12].shape[1:]
        if jac2_fold_eligible(axis_size, sh0, sh1, planes[5].dtype):
            # batch-FOLDED single program: all B samples VMEM-resident,
            # per-sample masked sweeps (exact per-sample trajectories).
            # Shared sc rides SMEM scalars; batched sc (adjoint solves —
            # per-sample tolerances derived from the cotangent) rides a
            # (B, 2) VMEM array broadcast per sample in-kernel.
            sc_batched = bool(in_batched[14])
            kern = _jacobi2_solve_kernel_bfs if sc_batched \
                else _jacobi2_solve_kernel_bf
            sc_spec = [pl.BlockSpec(memory_space=pltpu.VMEM)] \
                if sc_batched else _smem_specs(1)
            xo0, xo1, n = pl.pallas_call(
                functools.partial(kern, transpose, int(max_sweeps)),
                out_shape=(
                    jax.ShapeDtypeStruct(planes[5].shape, b0.dtype),
                    jax.ShapeDtypeStruct(planes[12].shape, b1.dtype),
                    jax.ShapeDtypeStruct((axis_size, 1), b0.dtype),
                ),
                in_specs=_vmem_specs(14) + sc_spec,
                out_specs=(
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ),
                interpret=_INTERPRET,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=96 * 1024 * 1024,
                ),
            )(*planes, sc_)
            return (xo0, xo1, n), (True, True, True)
        pspec = lambda sh: pl.BlockSpec(
            (1,) + tuple(sh), lambda i: (i,) + (0,) * len(sh),
            memory_space=pltpu.VMEM)
        xo0, xo1, n = pl.pallas_call(
            functools.partial(_jacobi2_solve_kernel_b, transpose,
                              int(max_sweeps), bool(in_batched[14])),
            grid=(axis_size,),
            out_shape=(
                jax.ShapeDtypeStruct(planes[5].shape, b0.dtype),
                jax.ShapeDtypeStruct(planes[12].shape, b1.dtype),
                jax.ShapeDtypeStruct((axis_size, 1), b0.dtype),
            ),
            in_specs=_batched_plane_specs(7, sh0)
            + _batched_plane_specs(7, sh1)
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=(pspec(sh0), pspec(sh1), _batched_scalar_out_spec()),
            interpret=_INTERPRET,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
        )(*planes, sc_)
        return (xo0, xo1, n), (True, True, True)

    xo0, xo1, n = _solve(c0, lo0[0], hi0[0], lo0[1], hi0[1], b0, x0,
                         c1, lo1[0], hi1[0], lo1[1], hi1[1], b1, x1, sc)
    return xo0, xo1, n[..., 0]


def _jacobi1_core(transpose, max_sweeps, cv, lyv, hyv, lxv, hxv, bv, xv,
                  sgn, tol):
    """Whole-solve Jacobi-Richardson on plain arrays: shared by the
    unbatched single-program kernel and the grid-over-batch variant
    (custom_vmap). Returns (x, true max-residual)."""
    d = sgn * cv
    iv = jnp.where(jnp.abs(d) > 1e-30, 1.0 / d, 1.0)

    def mv(p):
        return _adv_matvec(cv, lyv, hyv, lxv, hxv, p, transpose, sgn)

    r = bv - mv(xv)

    def cond(state):
        n, j = state[2], state[3]
        return (n > tol) & (j < max_sweeps)

    def body(state):
        xv, r, _, j = state
        dlt = iv * r
        xv = xv + dlt
        r = r - mv(dlt)
        return xv, r, jnp.max(jnp.abs(r)), j + 1

    xv, r, n, j = jax.lax.while_loop(
        cond, body, (xv, r, jnp.max(jnp.abs(r)), jnp.zeros((), jnp.int32)))
    return xv, jnp.max(jnp.abs(bv - mv(xv)))


def _jacobi1_solve_kernel(transpose, max_sweeps,
                          c, ly, hy, lx, hx, b, x, sc, out_x, out_n):
    xv, n = _jacobi1_core(transpose, max_sweeps, c[:], ly[:], hy[:], lx[:],
                          hx[:], b[:], x[:], sc[0], sc[1])
    out_x[:] = xv
    out_n[0] = n


def _jacobi1_solve_kernel_b(transpose, max_sweeps, sc_batched,
                            c, ly, hy, lx, hx, b, x, sc, out_x, out_n):
    # grid-over-batch program: every ref is a (1, n0, n1) block of its
    # sample; the scalar lands in a (1, 1) SMEM accumulator block (the
    # pattern Mosaic accepts where vmap's squeezed rank-1 block fails)
    i = pl.program_id(0)
    sgn, tol = (sc[i, 0], sc[i, 1]) if sc_batched else (sc[0], sc[1])
    xv, n = _jacobi1_core(transpose, max_sweeps, c[0], ly[0], hy[0], lx[0],
                          hx[0], b[0], x[0], sgn, tol)
    out_x[0] = xv
    out_n[i, 0] = n


def _batched_plane_specs(n_planes, shape):
    """Grid-over-batch VMEM specs: each program sees a (1, *shape) block
    of its sample."""
    blk = (1,) + tuple(shape)
    idx = lambda i: (i,) + (0,) * len(shape)
    return [pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)] * n_planes


def _batched_scalar_out_spec():
    # full (B, 1) SMEM array visible to every program; program i writes row
    # i via pl.program_id. Mosaic's block-mapping check rejects BOTH
    # vmap's squeezed rank-1 block AND a (1,1) block over (B,1) (block
    # dims must equal array dims or be 8/128-divisible), but a full-array
    # SMEM spec passes — the same shape contract as SMEM scalar inputs.
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _broadcast_batch(axis_size, args, batched):
    return tuple(
        a if bb else jnp.broadcast_to(a, (axis_size,) + a.shape)
        for a, bb in zip(args, batched)
    )


def _jac1_vmem_limit(nbytes):
    # 7 inputs + x/r carries + stencil-roll temps; measured needs
    # (runs/ab_jac1.log): 16.15 planes at 1024^2 adjoint, 18.2 planes at
    # the 513x2048 dns component; r4's LARGE pressure-phase kernels grew
    # the enclosing cond's staging by ~1 MiB (the dns component OOM'd 920K
    # over the old 20-plane ceiling, runs/ab_phase_large.log), so the
    # CEILING is 22 planes while ELIGIBILITY keeps the 20-plane window —
    # no MXU buffers here, so the reservation does not track the ceiling
    return min(126 * 1024 * 1024, max(48 * 1024 * 1024, 22 * nbytes))


def fused_jacobi1_solve(st_c, b, x, sgn, transpose, tol, max_sweeps):
    """Single-COMPONENT whole-solve Jacobi-Richardson (the large-shape
    sibling of fused_jacobi2_solve: the advection system is block-diagonal
    per velocity component, so per-component launches are exact — only the
    exit test decouples, which is convergence-neutral or better). Halves
    the VMEM residency: covers 1024^2/dns-class planes where the joint
    kernel exceeds its budget. Returns (x', true max-residual).

    Batches under jax.vmap via a custom_vmap rule: the batched launch grids
    over the batch dim (one program per sample, each running its own
    while-loop) — what makes the fused solve usable inside
    make_batched_train_step's vmapped rollouts."""
    c, lo, hi = st_c
    sc = jnp.stack([jnp.asarray(sgn, b.dtype), jnp.asarray(tol, b.dtype)])
    nbytes = b.size * jnp.dtype(b.dtype).itemsize

    @jax.custom_batching.custom_vmap
    def _solve(c, ly, hy, lx, hx, b, x, sc):
        return pl.pallas_call(
            functools.partial(_jacobi1_solve_kernel, transpose,
                              int(max_sweeps)),
            out_shape=(
                jax.ShapeDtypeStruct(b.shape, b.dtype),
                jax.ShapeDtypeStruct((1,), b.dtype),
            ),
            in_specs=_vmem_specs(7) + _smem_specs(1),
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            interpret=_INTERPRET,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_jac1_vmem_limit(nbytes),
            ),
        )(c, ly, hy, lx, hx, b, x, sc)

    @_solve.def_vmap
    def _rule(axis_size, in_batched, c, ly, hy, lx, hx, b, x, sc):
        planes = _broadcast_batch(axis_size, (c, ly, hy, lx, hx, b, x),
                                  in_batched[:7])
        shape = planes[5].shape[1:]
        xo, n = pl.pallas_call(
            functools.partial(_jacobi1_solve_kernel_b, transpose,
                              int(max_sweeps), bool(in_batched[7])),
            grid=(axis_size,),
            out_shape=(
                jax.ShapeDtypeStruct(planes[5].shape, b.dtype),
                jax.ShapeDtypeStruct((axis_size, 1), b.dtype),
            ),
            in_specs=_batched_plane_specs(7, shape)
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=(
                pl.BlockSpec((1,) + tuple(shape),
                             lambda i: (i,) + (0,) * len(shape),
                             memory_space=pltpu.VMEM),
                _batched_scalar_out_spec(),
            ),
            interpret=_INTERPRET,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_jac1_vmem_limit(nbytes),
            ),
        )(*planes, sc)
        return (xo, n), (True, True)

    xo, n = _solve(c, lo[0], hi[0], lo[1], hi[1], b, x, sc)
    return xo, n[..., 0]


def jac1_eligible(shape, dtype) -> bool:
    """Per-component whole-solve gate (DIFFPISO_FUSED_JAC1, default auto):
    the fallback tier when the joint two-component kernel exceeds its
    budget. The measured scoped-stack need is ~16-18.2 planes of one
    component (adjoint context, runs/ab_jac1.log); eligibility mirrors the
    20-plane compiler ceiling so a gated shape can never OOM
    (1024^2 f32: 80 MiB OK; dns 513x2048: 80 MiB OK; 2048^2: out)."""
    mode = os.environ.get("DIFFPISO_FUSED_JAC1", "auto")
    if mode == "never":
        return False
    if not _PALLAS_AVAILABLE:
        return False
    from diffpiso_tpu.ops import pallas_stencil as _ps

    if _ps._DISABLED_DEPTH > 0:
        return False
    if os.environ.get("DIFFPISO_DISABLE_PALLAS"):
        return False
    if jax.default_backend() not in ("tpu",) and not _INTERPRET:
        return False
    if len(shape) != 2:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if itemsize > 4:
        return False
    return 20 * shape[0] * shape[1] * itemsize <= 120 * 1024 * 1024


def jac2_eligible(shapes, dtype) -> bool:
    """Gate for the whole-solve momentum kernel (DIFFPISO_FUSED_JAC2:
    never | auto). Requires exactly 2 rank-2 components whose ~26 resident
    planes fit the compiler ceiling; rides the DIFFPISO_ADV_JACOBI mode for
    the fwd/adjoint split (this kernel replaces the accelerator's launch
    loop, not the BiCGSTAB fallback)."""
    mode = os.environ.get("DIFFPISO_FUSED_JAC2", "auto")
    if mode == "never":
        return False
    if not _PALLAS_AVAILABLE:
        return False
    from diffpiso_tpu.ops import pallas_stencil as _ps

    if _ps._DISABLED_DEPTH > 0 and _ps._FOLD_OK_DEPTH == 0:
        # fold_only_pallas() (small-plane batched traces) lets ONLY this
        # dispatch through no_pallas: its vmap rule batch-FOLDS into one
        # VMEM-resident program instead of a serialized grid
        return False
    if os.environ.get("DIFFPISO_DISABLE_PALLAS"):
        return False
    if jax.default_backend() not in ("tpu",) and not _INTERPRET:
        return False
    if len(shapes) != 2:
        return False
    if any(len(s) != 2 for s in shapes):
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if itemsize > 4:
        return False
    planes = sum(s[0] * s[1] for s in shapes)
    # 7 input planes + x/r/d carries + temps per component ~ 13x each
    return 13 * planes * itemsize <= 72 * 1024 * 1024


# -- 3-D whole-solve momentum Jacobi (ONE single-program launch per component) ------
# At 128^3 a full f32 volume is 8 MiB, so the ENTIRE 7-point
# Jacobi-Richardson solve fits VMEM as one program (~14 volumes): this
# replaces the z-plane-gridded sweep launches (which re-read the 12
# coefficient volumes from HBM every launch AND lag the z-coupling at the
# launch boundary — block-Jacobi by plane) with true Jacobi sweeps, a
# per-sweep convergence test, and exactly ONE HBM read of each operand.


def _jacobi1_3d_kernel(transpose, max_sweeps,
                       c, lz, hz, ly, hy, lx, hx, b, x, sc,
                       out_x, out_n, r_ref):
    sgn, tol = sc[0], sc[1]

    # Coefficients are read from their VMEM input windows INSIDE each
    # matvec (never hoisted into values): the first cut of this kernel
    # kept all 8 volumes live across the while_loop and the register
    # allocator spilled 128 MiB of stack at 128^3 (runs/ab_jac13d.log)
    # — peak live values must stay ~4 volumes (p, q, one roll temp, one
    # coefficient load).
    def mv(p):
        if not transpose:
            q = c[:] * p
            q = q + lz[:] * _roll(p, 1, 0)
            q = q + hz[:] * _roll(p, -1, 0)
            q = q + ly[:] * _roll(p, 1, 1)
            q = q + hy[:] * _roll(p, -1, 1)
            q = q + lx[:] * _roll(p, 1, 2)
            q = q + hx[:] * _roll(p, -1, 2)
        else:
            q = c[:] * p
            q = q + _roll(lz[:] * p, -1, 0)
            q = q + _roll(hz[:] * p, 1, 0)
            q = q + _roll(ly[:] * p, -1, 1)
            q = q + _roll(hy[:] * p, 1, 1)
            q = q + _roll(lx[:] * p, -1, 2)
            q = q + _roll(hx[:] * p, 1, 2)
        return sgn * q

    def inv_diag_apply(r):
        d = sgn * c[:]
        return jnp.where(jnp.abs(d) > 1e-30, r / d, r)

    # x accumulates in the OUTPUT window; r lives in a VMEM scratch — the
    # while_loop carries only scalars.
    out_x[:] = x[:]
    r_ref[:] = b[:] - mv(out_x[:])

    def cond(state):
        n, j = state
        return (n > tol) & (j < max_sweeps)

    def body(state):
        _, j = state
        dlt = inv_diag_apply(r_ref[:])
        out_x[:] = out_x[:] + dlt
        rn = r_ref[:] - mv(dlt)
        r_ref[:] = rn
        return jnp.max(jnp.abs(rn)), j + 1

    n, j = jax.lax.while_loop(
        cond, body,
        (jnp.max(jnp.abs(r_ref[:])), jnp.zeros((), jnp.int32)))
    out_n[0] = jnp.max(jnp.abs(b[:] - mv(out_x[:])))


def fused_jacobi1_solve_3d(st_c, b, x, sgn, transpose, tol, max_sweeps):
    """Whole-solve 3-D Jacobi-Richardson for one velocity component in ONE
    single-program launch (everything VMEM-resident; per-sweep exit; true
    exit residual). st_c = (c, (lz, ly, lx), (hz, hy, hx))."""
    c, lo, hi = st_c
    sc = jnp.stack([jnp.asarray(sgn, b.dtype), jnp.asarray(tol, b.dtype)])
    xo, n = pl.pallas_call(
        functools.partial(_jacobi1_3d_kernel, transpose, int(max_sweeps)),
        out_shape=(
            jax.ShapeDtypeStruct(b.shape, b.dtype),
            jax.ShapeDtypeStruct((1,), b.dtype),
        ),
        in_specs=_vmem_specs(9) + _smem_specs(1),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[pltpu.VMEM(b.shape, b.dtype)],
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            # 10 windows (9 in + x out) + r scratch + ~4 live-value volumes
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
    )(c, lo[0], hi[0], lo[1], hi[1], lo[2], hi[2], b, x, sc)
    return xo, n[0]


def jac13d_eligible(shape, dtype) -> bool:
    """Gate for the 3-D whole-solve momentum tier (DIFFPISO_FUSED_JAC13D,
    default auto): 10 single-buffered operand windows + the residual
    scratch + ~4 live-value volumes must fit the 128 MiB VMEM (measured:
    the value-hoisting variant needed 25 volumes at 128^3 and OOM'd,
    runs/ab_jac13d.log; the ref-resident rewrite is validated both sides
    of this boundary in runs/check_jac13d_lowering.py)."""
    mode = os.environ.get("DIFFPISO_FUSED_JAC13D", "auto")
    if mode == "never":
        return False
    if not _PALLAS_AVAILABLE:
        return False
    from diffpiso_tpu.ops import pallas_stencil as _ps

    if _ps._DISABLED_DEPTH > 0 or _ps._BATCHED_SAFE_DEPTH > 0:
        return False
    if os.environ.get("DIFFPISO_DISABLE_PALLAS"):
        return False
    if jax.default_backend() not in ("tpu",) and not _INTERPRET:
        return False
    if len(shape) != 3:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if itemsize > 4:
        return False
    return 15 * shape[0] * shape[1] * shape[2] * itemsize <= 120 * 1024 * 1024


def eligible_3d(shape, dtype) -> bool:
    """3-D Jacobi-sweep eligibility: z-plane-gridded launch holding ~13
    (ny, nx) plane blocks per program (ops/pallas_stencil.py:271-322 is the
    matvec analog). Platform gates mirror eligible()."""
    mode = os.environ.get("DIFFPISO_FUSED_KRYLOV", "auto")
    if mode == "never" or not _PALLAS_AVAILABLE:
        return False
    from diffpiso_tpu.ops import pallas_stencil as _ps

    if _ps._DISABLED_DEPTH > 0 or os.environ.get("DIFFPISO_DISABLE_PALLAS"):
        return False
    if _ps._BATCHED_SAFE_DEPTH > 0:  # vmapped traces: no batching rule here
        return False
    if jax.default_backend() not in ("tpu",) and not _INTERPRET:
        return False
    if len(shape) != 3:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if itemsize > 4:
        return False
    return 13 * shape[1] * shape[2] * itemsize <= _VMEM_BUDGET_BYTES


def _jacobi3d_kernel(transpose, k, c, lz, hz, ly, hy, lx, hx, b, x,
                     xup, xdn, s_ref, out_x, out_n):
    # PLANE-BLOCK Jacobi: the z coupling uses the neighbors' PREVIOUS
    # iterate (xup/xdn read the input buffer), so it is constant within the
    # launch and folds into an effective rhs — then k in-plane sweeps chain
    # VMEM-resident against the plane-local 5-point operator. One launch
    # reads the stencil ONCE for k sweeps (the one-sweep-per-launch version
    # re-read all 12 planes per sweep) AND converges faster per launch:
    # only the z-coupling error is lagged, the in-plane error is smoothed
    # to near-convergence in-core. invd = 1/(sgn*c) derived in-kernel
    # (diag(A) = sgn*c). out_n = per-plane max|b - sgn S x_in| (the
    # PRE-update residual — a conservative exit bound).
    sgn = s_ref[0]
    xc = x[0]
    cc = c[0]
    lyv, hyv, lxv, hxv = ly[0], hy[0], lx[0], hx[0]
    if not transpose:
        qz = lz[0] * xup[0] + hz[0] * xdn[0]
    else:
        # transpose z coupling: lz(z+1) x(z+1) + hz(z-1) x(z-1)
        # (ops/pallas_stencil.py:289-297); lz/hz arrive via dn/up maps
        qz = lz[0] * xdn[0] + hz[0] * xup[0]
    rhs_eff = b[0] - sgn * qz

    def inplane(v):
        if not transpose:
            q = cc * v + lyv * _roll(v, 1, 0) + hyv * _roll(v, -1, 0)
            return q + lxv * _roll(v, 1, 1) + hxv * _roll(v, -1, 1)
        q = cc * v + _roll(lyv * v, -1, 0) + _roll(hyv * v, 1, 0)
        return q + _roll(lxv * v, -1, 1) + _roll(hxv * v, 1, 1)

    d = sgn * cc
    iv = jnp.where(jnp.abs(d) > 1e-30, 1.0 / d, 1.0)
    r = rhs_eff - sgn * inplane(xc)  # = b - sgn S x_in (true residual)
    part = jnp.max(jnp.abs(r))
    xv = xc
    rr = r
    for j in range(k):
        xv = xv + iv * rr
        if j + 1 < k:
            rr = rhs_eff - sgn * inplane(xv)
    out_x[0] = xv
    # (1,1) SMEM max-accumulator over the sequential z grid (Mosaic
    # rejects rank-1 (1,)-blocks over an (nz,) array; the row-tiled 2-D
    # residual kernel's idiom, ops/pallas_stencil.py:396-404)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_n[0, 0] = part

    @pl.when(i != 0)
    def _():
        out_n[0, 0] = jnp.maximum(out_n[0, 0], part)


def fused_jacobi_sweep_3d(st_c, b, x, sgn, transpose, k=4):
    """k PLANE-BLOCK Jacobi sweeps for one 3-D component as a z-gridded
    launch; returns (x', max|b - A x| BEFORE the launch). Plain Jacobi
    sweeps can't chain in-launch (each plane needs its neighbors' previous
    sweep), so the z-coupling is frozen at the input iterate (block-Jacobi
    by plane) and k in-plane sweeps chain VMEM-resident. The Jacobi
    inverse diagonal is derived in-kernel from the center plane."""
    c, lo, hi = st_c
    nz = x.shape[0]
    plane = pl.BlockSpec((1,) + x.shape[1:], lambda i: (i, 0, 0))
    up = pl.BlockSpec((1,) + x.shape[1:], lambda i: ((i - 1) % nz, 0, 0))
    dn = pl.BlockSpec((1,) + x.shape[1:], lambda i: ((i + 1) % nz, 0, 0))
    lz_spec = plane if not transpose else dn
    hz_spec = plane if not transpose else up
    xn, n = pl.pallas_call(
        functools.partial(_jacobi3d_kernel, transpose, k),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((1, 1), x.dtype),
        ),
        grid=(nz,),
        in_specs=[plane, lz_spec, hz_spec] + [plane] * 5 + [plane, up, dn]
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(plane, pl.BlockSpec((1, 1), lambda i: (0, 0),
                                       memory_space=pltpu.SMEM)),
        interpret=_INTERPRET,
    )(c, lo[0], hi[0], lo[1], hi[1], lo[2], hi[2], b, x, x, x,
      _scal(x, sgn))
    return xn, n[0, 0]


# -- z-BLOCK-gridded 3-D momentum Jacobi (k FULL 3-D sweeps per launch) -------------
# The 256^3-class tier between jac13d (whole volume in VMEM, <= 128^3) and
# the per-plane frozen kernel above: the grid runs over nz/bz blocks of bz
# z-planes; within a block the z-coupling is LIVE (real 3-D sweeps), frozen
# only at the two block-boundary planes (additive block-Jacobi with a
# boundary fraction 2/bz instead of 2/1) — so each launch contracts like
# bz-plane-deep Jacobi and the outer launch loop converges in a fraction
# of the trips. Same maintained-residual + per-sweep-exit discipline as
# the sharded momentum kernel (parallel/shard_kernels.py): a launch whose
# ENTRY residual already passes tol sweeps nowhere, so the reported entry
# max is the exact residual of the returned (unchanged) iterate.


def _jacobi_zblock_kernel(transpose, max_sweeps,
                          c, lz, hz, ly, hy, lx, hx, b, x, xup, xdn,
                          hzup, lzdn, sc, out_x, out_n, r_ref):
    sgn, tol = sc[0], sc[1]

    # coefficients read from refs inside each matvec (the jac13d register
    # -spill lesson); peak live values ~4 blocks
    def mv(p, pu, pd):
        if not transpose:
            q = c[:] * p
            q = q + lz[:] * jnp.concatenate([pu, p[:-1]], 0)
            q = q + hz[:] * jnp.concatenate([p[1:], pd], 0)
            q = q + ly[:] * _roll(p, 1, 1)
            q = q + hy[:] * _roll(p, -1, 1)
            q = q + lx[:] * _roll(p, 1, 2)
            q = q + hx[:] * _roll(p, -1, 2)
        else:
            q = c[:] * p
            a = lz[:] * p  # roll(lz x, -1, z): bottom plane needs dn lz*x
            q = q + jnp.concatenate([a[1:], lzdn[:] * pd], 0)
            a = hz[:] * p  # roll(hz x, +1, z): top plane needs up hz*x
            q = q + jnp.concatenate([hzup[:] * pu, a[:-1]], 0)
            q = q + _roll(ly[:] * p, -1, 1)
            q = q + _roll(hy[:] * p, 1, 1)
            q = q + _roll(lx[:] * p, -1, 2)
            q = q + _roll(hx[:] * p, 1, 2)
        return sgn * q

    zero_pl = jnp.zeros_like(xup[:])
    out_x[:] = x[:]
    r_ref[:] = b[:] - mv(x[:], xup[:], xdn[:])
    n0 = jnp.max(jnp.abs(r_ref[:]))

    def inv_diag_apply(r):
        d = sgn * c[:]
        return jnp.where(jnp.abs(d) > 1e-30, r / d, r)

    # per-sweep exit an order PAST tol (the frozen-boundary maintained
    # norm underestimates the true boundary error — the shard_kernels
    # limit-cycle lesson); zero sweeps when the entry measure passes
    tol_in = 0.1 * tol

    def cond(state):
        n, j = state
        return (j < max_sweeps) & (n >= tol_in) & (n0 >= tol)

    def body(state):
        _, j = state
        dlt = inv_diag_apply(r_ref[:])
        out_x[:] = out_x[:] + dlt
        rn = r_ref[:] - mv(dlt, zero_pl, zero_pl)
        r_ref[:] = rn
        return jnp.max(jnp.abs(rn)), j + 1

    jax.lax.while_loop(cond, body, (n0, jnp.zeros((), jnp.int32)))

    # (1,1) SMEM max-accumulator over the sequential z-block grid for the
    # GLOBAL entry residual (Mosaic rejects rank-1 blocks over (G,) arrays)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_n[0, 0] = n0

    @pl.when(i != 0)
    def _():
        out_n[0, 0] = jnp.maximum(out_n[0, 0], n0)


def _zblock_size(shape, dtype, budget_bytes=110 * 1024 * 1024):
    """Largest divisor bz of nz whose ~36-block residency fits the budget,
    >= 4; None if none fits. Why 36: the grid pipeliner DOUBLE-buffers
    every input block (13 block-ins + out + scratch ~ 2x15 block-
    equivalents) AND the reservation partially tracks the ceiling —
    measured 86 MiB need at bz=16 under a 64 MiB ceiling and 99.9 MiB
    under 96 MiB (runs/ab_zblock.log, 256^3). Solution: smaller blocks
    (bz=8 at 256^3) under a matching tight ceiling instead of chasing the
    tracking behavior upward."""
    nz = shape[0]
    plane = shape[1] * shape[2] * jnp.dtype(dtype).itemsize
    best = None
    for bz in range(4, nz + 1):
        if nz % bz == 0 and 36 * bz * plane <= budget_bytes:
            best = bz
    return best


def fused_jacobi_zblock_3d(st_c, b, x, sgn, transpose, tol, k, bz):
    """k full-3-D Jacobi sweeps per z-block as a gridded launch; returns
    (x', global max|b - A x| at ENTRY). st_c = (c, (lz,ly,lx), (hz,hy,hx))."""
    c, lo, hi = st_c
    nz = b.shape[0]
    plane_sh = b.shape[1:]
    blk = pl.BlockSpec((bz,) + plane_sh, lambda i: (i, 0, 0))
    up = pl.BlockSpec((1,) + plane_sh, lambda i: ((i * bz - 1) % nz, 0, 0))
    dn = pl.BlockSpec((1,) + plane_sh, lambda i: (((i + 1) * bz) % nz, 0, 0))
    sc = jnp.stack([jnp.asarray(sgn, b.dtype), jnp.asarray(tol, b.dtype)])
    nbytes = bz * int(np.prod(plane_sh)) * jnp.dtype(b.dtype).itemsize
    xo, n = pl.pallas_call(
        functools.partial(_jacobi_zblock_kernel, transpose, int(k)),
        grid=(nz // bz,),
        out_shape=(
            jax.ShapeDtypeStruct(b.shape, b.dtype),
            jax.ShapeDtypeStruct((1, 1), b.dtype),
        ),
        in_specs=[blk] * 9 + [up, dn, up, dn]
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(blk, pl.BlockSpec((1, 1), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM)),
        scratch_shapes=[pltpu.VMEM((bz,) + plane_sh, b.dtype)],
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            # eligibility mirrors the 36-block budget (_zblock_size); the
            # ceiling stays TIGHT because the scoped reservation partially
            # tracks whatever it is given (runs/ab_zblock.log)
            vmem_limit_bytes=min(120 * 1024 * 1024,
                                 max(48 * 1024 * 1024, 30 * nbytes)),
        ),
    )(c, lo[0], hi[0], lo[1], hi[1], lo[2], hi[2], b, x, x, x,
      hi[0], lo[0], sc)
    return xo, n[0, 0]


def zblock_eligible(shape, dtype):
    """256^3-class z-block tier gate (DIFFPISO_FUSED_JACZB, default auto):
    rank-3 past the jac13d whole-volume budget, with a divisor block size
    whose ~14-block residency fits 96 MiB. Returns the block size (an int)
    when eligible, else None — callers treat truthiness as the gate."""
    if os.environ.get("DIFFPISO_FUSED_JACZB", "auto") == "never":
        return None
    if not _krylov_plumbing_ok(shape, dtype, rank=3):
        return None
    return _zblock_size(shape, dtype)


# -- PCG halves around the (unfusable) spectral preconditioner ----------------------


def _pcg_apply_kernel(deflate, c, ly, hy, lx, hx, sh, rz, x, r, p,
                      out_x, out_r, out_n, out_pq):
    pv = p[:]
    q = _matvec(c[:], ly[:], hy[:], lx[:], hx[:], sh[0], pv)
    pq = jnp.sum(pv * q)
    eps = jnp.asarray(1e-30, pq.dtype)
    alpha = jnp.where(jnp.abs(pq) > eps, rz[0] / pq, 0.0)
    xn = x[:] + alpha * pv
    rn = r[:] - alpha * q
    if deflate:
        rn = rn - jnp.sum(rn) / rn.size
    out_x[:] = xn
    out_r[:] = rn
    out_n[0] = jnp.max(jnp.abs(rn))
    out_pq[0] = pq


def _pcg_apply3_kernel(deflate, c, lz, hz, ly, hy, lx, hx, sh, rz, x, r, p,
                       out_x, out_r, out_n, out_pq):
    pv = p[:]
    q = _matvec3(c, lz, hz, ly, hy, lx, hx, sh[0], pv)
    pq = jnp.sum(pv * q)
    eps = jnp.asarray(1e-30, pq.dtype)
    alpha = jnp.where(jnp.abs(pq) > eps, rz[0] / pq, 0.0)
    xn = x[:] + alpha * pv
    rn = r[:] - alpha * q
    if deflate:
        rn = rn - jnp.sum(rn) / rn.size
    out_x[:] = xn
    out_r[:] = rn
    out_n[0] = jnp.max(jnp.abs(rn))
    out_pq[0] = pq


def fused_pcg_apply(stencil, rz, x, r, p, deflate: bool):
    """q = A p; alpha = rz/(p.q); x', r' = updates; returns
    (x', r', rnorm, pq) in one launch (rank 2 or 3)."""
    s = jax.ShapeDtypeStruct(x.shape, x.dtype)
    one = jax.ShapeDtypeStruct((1,), x.dtype)
    if x.ndim == 3:
        ops = _stencil_ops3(stencil)
        xo, ro, n, pq = pl.pallas_call(
            functools.partial(_pcg_apply3_kernel, deflate),
            out_shape=(s, s, one, one),
            in_specs=_vmem_specs(7) + _smem_specs(2) + _vmem_specs(3),
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            interpret=_INTERPRET,
            compiler_params=_auto_compiler_params(*ops, x, r, p,
                                                  extra_planes=5),
        )(
            *ops, jnp.reshape(jnp.asarray(stencil.shift, x.dtype), (1,)),
            jnp.reshape(rz, (1,)), x, r, p,
        )
        return xo, ro, n[0], pq[0]
    xo, ro, n, pq = pl.pallas_call(
        functools.partial(_pcg_apply_kernel, deflate),
        out_shape=(s, s, one, one),
        in_specs=_vmem_specs(5) + _smem_specs(2) + _vmem_specs(3),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=_INTERPRET,
        compiler_params=_auto_compiler_params(
            stencil.center, stencil.lo[0], stencil.hi[0], stencil.lo[1],
            stencil.hi[1], x, r, p, extra_planes=5,
        ),
    )(
        stencil.center, stencil.lo[0], stencil.hi[0], stencil.lo[1],
        stencil.hi[1], jnp.reshape(jnp.asarray(stencil.shift, x.dtype), (1,)),
        jnp.reshape(rz, (1,)), x, r, p,
    )
    return xo, ro, n[0], pq[0]


def _pcg_update_kernel(rz_old, r, z, p, out_p, out_rz):
    rv = r[:]
    zv = z[:]
    rz_new = jnp.sum(rv * zv)
    eps = jnp.asarray(1e-30, rz_new.dtype)
    beta = jnp.where(jnp.abs(rz_old[0]) > eps, rz_new / rz_old[0], 0.0)
    out_p[:] = zv + beta * p[:]
    out_rz[0] = rz_new


def fused_pcg_update(rz_old, r, z, p):
    """rz' = r.z; beta; p' = z + beta p — one launch. Returns (p', rz')."""
    s = jax.ShapeDtypeStruct(p.shape, p.dtype)
    one = jax.ShapeDtypeStruct((1,), p.dtype)
    po, rz = pl.pallas_call(
        _pcg_update_kernel,
        out_shape=(s, one),
        in_specs=_smem_specs(1) + _vmem_specs(3),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=_INTERPRET,
        compiler_params=_auto_compiler_params(r, z, p, extra_planes=3),
    )(jnp.reshape(rz_old, (1,)), r, z, p)
    return po, rz[0]


# -- rank-3 fully-fused PCG (z-gridded loop kernels) ------------------------------
#
# The 2-D fused PCG keeps whole planes in VMEM; rank-3 fields don't fit, so
# the loop runs as z-plane-gridded launches with the cross-plane scalars
# (pq, rz, sum(p)) accumulated through (1,1) SMEM blocks over the sequential
# z grid and fed to the NEXT launch as SMEM inputs. The rank-one shift
# s*sum(p) is reproduced exactly by carrying sum(p) (emitted by the p-update
# launch) into the matvec launch. Per-iteration launches: q/pq, x/r,
# spectral analysis, z-slab, synthesis(+r.z), p-update(+sum p) = 6, each
# touching every field once — the jnp loop is ~20 whole-field HBM round
# trips. In-loop mean-deflation is intentionally omitted: the mm
# preconditioner zeroes the singular modes, so z (and hence every p) is
# mean-free and alpha/beta/rz are algebraically identical with or without
# the projection; only the exit-test rnorm can see the (roundoff-sized)
# accumulated mean, and only conservatively (never exits early).


def pcg3_eligible(shape, dtype) -> bool:
    """Gate for the fully-fused rank-3 spectral PCG loop. Separate knob
    (DIFFPISO_FUSED_PCG3) so it can be A/B'd independently of the bare
    fused preconditioner apply. Default OFF by measurement: TPU-validated
    correct (runs/lowering.log PCG3 OK, iteration parity 11=11) but the
    full-config A/B at 128^3 turb LOSES — fwd 248.5 (vs 261.7 with just
    ADV3), grad10 95.4 (vs 110.9 baseline, -14%): the warm-started
    production solves run ~1 iteration, so 6 z-gridded launches + the XLA
    verification matvec cost more than the plain fused-PCG path they
    replace (runs/ab_3d.log, 2 reps)."""
    if os.environ.get("DIFFPISO_FUSED_PCG3", "never") == "never":
        return False
    if not _PALLAS_AVAILABLE:
        return False
    from diffpiso_tpu.ops import pallas_stencil as _ps

    if _ps._DISABLED_DEPTH > 0:
        return False
    if _ps._BATCHED_SAFE_DEPTH > 0:  # vmapped traces: no batching rule here
        return False
    if os.environ.get("DIFFPISO_DISABLE_PALLAS"):
        return False
    if jax.default_backend() not in ("tpu",):
        return False
    if len(shape) != 3:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if itemsize > 4:
        return False
    nz, ny, nx = shape
    blk = _spec3_block(ny * nx)
    per_prog = max(
        (ny * ny + nx * nx + 3 * ny * nx),  # spectral plane passes
        (nz * nz + 3 * nz * blk),           # z-slab pass
        12 * ny * nx,                       # 7 stencil + p(x3) + q planes
    )
    return nz >= 2 and per_prog * 2 * itemsize <= _VMEM_BUDGET_BYTES


def _acc_smem(i, ref, val, op):
    @pl.when(i == 0)
    def _():
        ref[0, 0] = val

    @pl.when(i != 0)
    def _():
        ref[0, 0] = op(ref[0, 0], val)


def _pcg3_residual_kernel(c, lz, hz, ly, hy, lx, hx, sc, b, x, xup, xdn,
                          out_r, out_n):
    # r = b - (S x + shift * sum(x)); sc = (shift, sum(x)); out_n = max|r|
    xc = x[0]
    q = c[0] * xc + lz[0] * xup[0] + hz[0] * xdn[0]
    q = q + ly[0] * _roll(xc, 1, 0) + hy[0] * _roll(xc, -1, 0)
    q = q + lx[0] * _roll(xc, 1, 1) + hx[0] * _roll(xc, -1, 1)
    r = b[0] - (q + sc[0] * sc[1])
    out_r[0] = r
    _acc_smem(pl.program_id(0), out_n, jnp.max(jnp.abs(r)), jnp.maximum)


def _pcg3_q_kernel(c, lz, hz, ly, hy, lx, hx, sc, p, pup, pdn, out_q, out_pq):
    # q = S p + shift * sum(p); sc = (shift, sum_p); out_pq = p.q
    pc = p[0]
    q = c[0] * pc + lz[0] * pup[0] + hz[0] * pdn[0]
    q = q + ly[0] * _roll(pc, 1, 0) + hy[0] * _roll(pc, -1, 0)
    q = q + lx[0] * _roll(pc, 1, 1) + hx[0] * _roll(pc, -1, 1)
    q = q + sc[0] * sc[1]
    out_q[0] = q
    _acc_smem(pl.program_id(0), out_pq, jnp.sum(pc * q), jnp.add)


def _pcg3_xr_kernel(sc, x, r, p, q, out_x, out_r, out_n, out_sr):
    # alpha = rz/pq (guarded); x' = x + alpha p; r' = r - alpha q - cbar.
    # cbar is the LAGGED deflation constant (previous iteration's measured
    # mean of r): the mean-zeroing preconditioner makes every search
    # direction mean-free, so a mean component of r is uncorrectable by the
    # updates and would otherwise plateau max|r| at the f32 reduction-leak
    # level (~3e-6 measured) — subtracting last iteration's mean keeps the
    # leak at its per-iteration size. out_sr accumulates sum(r') for the
    # next iteration's cbar.
    rz, pq, cbar = sc[0], sc[1], sc[2]
    eps = jnp.asarray(1e-30, rz.dtype)
    alpha = jnp.where(jnp.abs(pq) > eps, rz / pq, 0.0)
    xn = x[0] + alpha * p[0]
    rn = r[0] - alpha * q[0] - cbar
    out_x[0] = xn
    out_r[0] = rn
    i = pl.program_id(0)
    _acc_smem(i, out_n, jnp.max(jnp.abs(rn)), jnp.maximum)
    _acc_smem(i, out_sr, jnp.sum(rn), jnp.add)


def _pcg3_syn_kernel(precision, vy, vx, h, r, out_z, out_rz):
    # spectral synthesis per plane + rz = sum(r * z) accumulation
    t = _dot(vy[:], h[0], ((0,), (0,)), precision)
    z = _dot(t, vx[:], ((1,), (0,)), precision)
    out_z[0] = z
    _acc_smem(pl.program_id(0), out_rz, jnp.sum(r[0] * z), jnp.add)


def _pcg3_p_kernel(sc, z, p, out_p, out_sp):
    # beta = rz_new/rz_old (guarded); p' = z + beta p; sum(p') accumulation
    rz_new, rz_old = sc[0], sc[1]
    eps = jnp.asarray(1e-30, rz_new.dtype)
    beta = jnp.where(jnp.abs(rz_old) > eps, rz_new / rz_old, 0.0)
    pn = z[0] + beta * p[0]
    out_p[0] = pn
    _acc_smem(pl.program_id(0), out_sp, jnp.sum(pn), jnp.add)


def _plane_specs(shape):
    nz = shape[0]
    plane = pl.BlockSpec((1,) + shape[1:], lambda i: (i, 0, 0))
    up = pl.BlockSpec((1,) + shape[1:], lambda i: ((i - 1) % nz, 0, 0))
    dn = pl.BlockSpec((1,) + shape[1:], lambda i: ((i + 1) % nz, 0, 0))
    return plane, up, dn


def _smem_in():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _smem_out():
    # gridded SMEM accumulator: (1,1) block, all programs map to it
    return pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)


def fused_pcg3_solve(lap, b, x0, solver_mm, weights, tol, max_iter,
                     deflate_mean=True, early_exit=True):
    """Fully-fused rank-3 spectral-PCG on the pressure system. Returns
    (x, true_resid_norm, iterations); the caller derives warn. Semantics
    follow krylov.pcg with residual_reset=0 (preconditioned pressure solves
    converge in 1-3 iterations; resets never fire before 50); in-loop
    deflation is LAGGED by one iteration (see _pcg3_xr_kernel)."""
    from diffpiso_tpu.solvers.fourier import _eigs as _sp_eigs

    shape = b.shape
    dtype = b.dtype
    nz, ny, nx = shape
    tol = jnp.asarray(tol, dtype)
    plane, up, dn = _plane_specs(shape)
    sm_i = _smem_in()
    sm_o = _smem_out()
    f = jax.ShapeDtypeStruct(shape, dtype)
    one = jax.ShapeDtypeStruct((1, 1), dtype)
    # stencil planes ordered (c, lz, hz, ly, hy, lx, hx)
    st_in = (lap.center, lap.lo[0], lap.hi[0], lap.lo[1], lap.hi[1],
             lap.lo[2], lap.hi[2])
    shift = jnp.asarray(lap.shift, dtype)

    mats = solver_mm._mats(dtype)
    vz, vy, vx = mats
    eigs = [
        jnp.asarray(_sp_eigs(n_, k_), dtype)
        for n_, k_ in zip(solver_mm.shape, solver_mm.kinds)
    ]
    w = [jnp.asarray(wd, dtype) for wd in weights]
    ez = eigs[0].reshape(-1, 1)
    eyx = (w[1] * eigs[1][:, None] + w[2] * eigs[2][None, :]).reshape(1, -1)
    prec = _mosaic_precision(solver_mm._precision())
    n_flat = ny * nx
    blk = _spec3_block(n_flat)
    slab = pl.BlockSpec((nz, blk), lambda i: (0, i))

    def residual3(bb, xx, sx):
        sc = jnp.stack([shift, jnp.asarray(sx, dtype)])
        r, nrm = pl.pallas_call(
            _pcg3_residual_kernel,
            grid=(nz,),
            in_specs=[plane] * 7 + [sm_i] + [plane, plane, up, dn],
            out_specs=(plane, sm_o),
            out_shape=(f, one),
            interpret=_INTERPRET,
        )(*st_in, sc, bb, xx, xx, xx)
        return r, nrm[0, 0]

    def q_launch(p, sp):
        sc = jnp.stack([shift, sp])
        q, pq = pl.pallas_call(
            _pcg3_q_kernel,
            grid=(nz,),
            in_specs=[plane] * 7 + [sm_i] + [plane, up, dn],
            out_specs=(plane, sm_o),
            out_shape=(f, one),
            interpret=_INTERPRET,
        )(*st_in, sc, p, p, p)
        return q, pq[0, 0]

    def xr_launch(x, r, p, q, rz, pq, cbar):
        sc = jnp.stack([rz, pq, cbar])
        xn, rn, nrm, sr = pl.pallas_call(
            _pcg3_xr_kernel,
            grid=(nz,),
            in_specs=[sm_i] + [plane] * 4,
            out_specs=(plane, plane, sm_o, sm_o),
            out_shape=(f, f, one, one),
            interpret=_INTERPRET,
        )(sc, x, r, p, q)
        return xn, rn, nrm[0, 0], sr[0, 0]

    basis_y = pl.BlockSpec((ny, ny), lambda i: (0, 0))
    basis_x = pl.BlockSpec((nx, nx), lambda i: (0, 0))

    def precond_rz(r):
        # analysis + z-slab (reused spectral kernels), then synthesis with
        # the r.z reduction folded in
        h = pl.pallas_call(
            functools.partial(_spec3_plane_kernel, True, prec),
            out_shape=f,
            grid=(nz,),
            in_specs=[basis_y, basis_x, plane],
            out_specs=plane,
            interpret=_INTERPRET,
        )(vy, vx, r)
        wz1 = jnp.reshape(w[0], (1,))
        h2 = pl.pallas_call(
            functools.partial(_spec3_z_kernel, prec),
            out_shape=jax.ShapeDtypeStruct((nz, n_flat), dtype),
            grid=(n_flat // blk,),
            in_specs=[
                pl.BlockSpec((nz, nz), lambda i: (0, 0)),
                pl.BlockSpec((nz, 1), lambda i: (0, 0)),
                pl.BlockSpec((1, blk), lambda i: (0, i)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                slab,
            ],
            out_specs=slab,
            interpret=_INTERPRET,
        )(vz, ez, eyx, wz1, h.reshape(nz, n_flat))
        z, rz = pl.pallas_call(
            functools.partial(_pcg3_syn_kernel, prec),
            out_shape=(f, one),
            grid=(nz,),
            in_specs=[basis_y, basis_x, plane, plane],
            out_specs=(plane, sm_o),
            interpret=_INTERPRET,
        )(vy, vx, h2.reshape(shape), r)
        return z, rz[0, 0]

    def p_launch(z, p, rz_new, rz_old):
        sc = jnp.stack([rz_new, rz_old])
        pn, sp = pl.pallas_call(
            _pcg3_p_kernel,
            grid=(nz,),
            in_specs=[sm_i] + [plane] * 2,
            out_specs=(plane, sm_o),
            out_shape=(f, one),
            interpret=_INTERPRET,
        )(sc, z, p)
        return pn, sp[0, 0]

    cold = x0 is None
    if cold:
        x0 = jnp.zeros(shape, dtype)
        r0 = b
        rnorm0 = jnp.max(jnp.abs(b))
    else:
        r0, rnorm0 = residual3(b, x0, jnp.sum(x0))

    ncells = jnp.asarray(float(nz * ny * nx), dtype)
    defl = jnp.asarray(1.0 if deflate_mean else 0.0, dtype)

    def cond(state):
        x, r, p, rz, sp, sr, k, done = state
        return (~done) & (k < max_iter)

    def body(state):
        x, r, p, rz, sp, sr, k, done = state
        q, pq = q_launch(p, sp)
        x, r, rnorm, sr = xr_launch(x, r, p, q, rz, pq, defl * sr / ncells)
        z, rz_new = precond_rz(r)
        p, sp = p_launch(z, p, rz_new, rz)
        done = (rnorm < tol) | ~jnp.isfinite(rnorm)
        return (x, r, p, rz_new, sp, sr, k + 1, done)

    def run_solve(_):
        z0, rz0 = precond_rz(r0)
        sp0 = jnp.sum(z0)
        init = (x0, r0, z0, rz0, sp0, jnp.sum(r0), jnp.zeros((), jnp.int32),
                jnp.zeros((), bool))
        x, r, p, rz, sp, sr, k, _ = jax.lax.while_loop(cond, body, init)
        # final verification residual via XLA (one-time): exact deflation,
        # matching the jnp path's project(b - A x) convention
        from diffpiso_tpu.ops.laplace import apply_laplacian

        r_true = b - apply_laplacian(lap, x)
        if deflate_mean:
            r_true = r_true - jnp.mean(r_true)
        return x, jnp.max(jnp.abs(r_true)), k

    def skip_solve(_):
        return x0, rnorm0, jnp.zeros((), jnp.int32)

    if not early_exit:
        # adjoint callers KNOW the solve is cold and non-trivial: drop the
        # whole-solve cond wrapper (krylov.pcg early_exit semantics)
        return run_solve(None)
    return jax.lax.cond(rnorm0 < tol, skip_solve, run_solve, None)


# -- fused preconditioned-update: z = M^-1 r folded into the PCG p-update ---------


def _pcg_mm_update_kernel(precision, v0, v1, symbol, rz_old, r, p,
                          out_p, out_rz):
    # z = V0^T ((V0 r V1^T) / S) V1 (the spectral inverse; S = safe symbol
    # with +inf at singular modes, computed outside — see _spectral_kernel's
    # VMEM note); rz' = r.z; beta = rz'/rz_old; p' = z + beta p — one
    # launch, z never round-trips HBM.
    # NOTE (r5, runs/ab_mm_dct.log): hoisting the hi/lo splits to
    # pre-split bf16 OPERANDS (constant-folded in XLA) was tried and
    # REVERTED — it degraded the preconditioner (turb1024 fwd pressure
    # iters 1.0 -> 2.0, 830 -> 682 steps/s): the in-kernel split feeding
    # Mosaic's dot keeps more effective precision than external bf16
    # operands. Keep the split in-kernel.
    rv = r[:]
    if precision == jax.lax.Precision.HIGH and not _INTERPRET:
        # the pcg2 treatment: Mosaic only lowers DEFAULT/HIGHEST, so the
        # production HIGH runs as the manual 3-pass bf16 decomposition
        # (hi*hi + hi*lo + lo*hi) — same passes AND same arithmetic as
        # XLA-HIGH, half the passes of the HIGHEST coercion that made the
        # r3 fused-spectral kernels lose
        v0v, v1v = v0[:], v1[:]
        v0_hi = v0v.astype(jnp.bfloat16)
        v0_lo = (v0v - v0_hi.astype(v0v.dtype)).astype(jnp.bfloat16)
        v1_hi = v1v.astype(jnp.bfloat16)
        v1_lo = (v1v - v1_hi.astype(v1v.dtype)).astype(jnp.bfloat16)
        h = _bf16x3_dot(v0_hi, v0_lo, rv, ((1,), (0,)), True)
        h = _bf16x3_dot(v1_hi, v1_lo, h, ((1,), (1,)), False)
        h = h / symbol[:]
        h = _bf16x3_dot(v0_hi, v0_lo, h, ((0,), (0,)), True)
        z = _bf16x3_dot(v1_hi, v1_lo, h, ((1,), (0,)), False)
    else:
        prec = _mosaic_precision(precision)
        h = _dot(v0[:], rv, ((1,), (0,)), prec)
        h = _dot(h, v1[:], ((1,), (1,)), prec)
        h = h / symbol[:]
        h = _dot(v0[:], h, ((0,), (0,)), prec)
        z = _dot(h, v1[:], ((1,), (0,)), prec)
    rz_new = jnp.sum(rv * z)
    eps = jnp.asarray(1e-30, rz_new.dtype)
    beta = jnp.where(jnp.abs(rz_old[0]) > eps, rz_new / rz_old[0], 0.0)
    out_p[:] = z + beta * p[:]
    out_rz[0] = rz_new


def fused_pcg_mm_update(v0, v1, symbol, rz_old, r, p, precision):
    """Spectral-preconditioned PCG update in ONE launch: z = M^-1 r (4 MXU
    contractions, spectrum resident in VMEM), rz' = r.z, beta, p' = z+beta p.
    For the z0 init call with p = zeros and rz_old = 1: p' = z0, rz' = r0.z0.
    Precision.HIGH runs natively via the in-kernel bf16x3 decomposition
    (see _bf16x3_dot); everything else coerces as before."""
    s = jax.ShapeDtypeStruct(p.shape, p.dtype)
    one = jax.ShapeDtypeStruct((1,), p.dtype)
    auto = _auto_compiler_params(v0, v1, symbol, r, p, extra_planes=6)
    po, rz = pl.pallas_call(
        functools.partial(_pcg_mm_update_kernel, precision),
        out_shape=(s, one),
        in_specs=_vmem_specs(3) + _smem_specs(1) + _vmem_specs(2),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=_INTERPRET,
        compiler_params=auto if auto is not None else _mxu_compiler_params(),
    )(v0, v1, symbol, jnp.reshape(jnp.asarray(rz_old, r.dtype), (1,)), r, p)
    return po, rz[0]


def mm_update_large_eligible(shape, dtype, kinds=None) -> bool:
    """Large-plane gate for folding M^-1 into the p-update
    (fused_pcg_mm_update) where the whole-solve pcg2 kernel cannot compile
    (1024^2, 512x2048 — pcg2_eligible's hard Mosaic wall). Small planes
    keep the measured-negative spectral_eligible default (there pcg2
    whole-solve owns the solve anyway); here the alternative is the pure
    XLA loop, and the bf16x3 branch removes the precision-pass penalty that
    made the r3 spectral kernels lose. Same env as the phase tier
    (DIFFPISO_FUSED_KRYLOV_LARGE) and the same measured family
    restriction: all-'fourier' bases win (turb1024 +10-47% fwd); the dct
    family loses at dns 512x2048 on pure basis-contraction throughput —
    final r5 A/B at the current tree (runs/ab_dns_grad.log): fwd 554 vs
    610 (-9%), grad30 85.4 vs 111 (-23%) with iteration counts IDENTICAL
    to the XLA loop ([1.73, 1.1] — the earlier ~3x-inflation reading in
    runs/ab_mm_dct.log was an artifact of the reverted split-hoist
    commit, and the bf16x3 apply is 4x MORE accurate than XLA-HIGH here,
    runs/check_mm_precision.log). The 512^2+2048^2 dense DCT bases cost
    ~2x the fourier bases per plane byte per iteration, and at ~1-2 warm
    iterations the launch savings cannot cover it. Mode 'all' lifts the
    family restriction for re-measurement (runs/ab_dns_grad.py)."""
    mode = _large_mode()
    if mode == "never":
        return False
    if mode not in ("all", "all-highest") and kinds is not None and any(
        k != "fourier" for k in kinds
    ):
        return False
    if not _krylov_plumbing_ok(shape, dtype):
        return False
    itemsize = jnp.dtype(dtype).itemsize
    n0, n1 = shape
    plane = n0 * n1 * itemsize
    if plane > _LARGE_PLANE_BYTES:
        return False
    # bases (+ their in-kernel bf16 hi/lo splits = +1x) + symbol/r/p/out
    # + ~4 contraction temps must fit under the 127 MiB ceiling
    total = 2 * (n0 * n0 + n1 * n1) * itemsize + 8 * plane
    return total + 2 * 1024 * 1024 <= 127 * 1024 * 1024


# -- rank-2 fully-fused whole-solve spectral PCG (ONE launch) ---------------------
#
# The 2-D answer to the reference's fused CUDA CG loop
# (pressure_solve_op.cu.cc:291-356, ~0 launches per iteration): the ENTIRE
# preconditioned solve — initial residual, the while-loop (matvec, exact
# mean deflation, MXU spectral preconditioner, updates, convergence test),
# and the final verification residual — runs as one pallas launch with
# every operand and carry VMEM-resident. The r3 trace (runs/trace2d.py)
# shows the two pressure-solve conditionals cost 0.145 ms of the 0.341 ms
# turb step at ~1.7 combined iterations: this kernel replaces their ~30
# inter-dependent XLA kernels and HBM round trips per solve.
# Semantics follow krylov.pcg with residual_reset=0 (the pcg3 precedent:
# preconditioned pressure solves converge in 1-3 iterations, resets never
# fire); the in-kernel preconditioner contracts at HIGHEST (Mosaic's only
# fp32 mode) which at 512^2 costs ~4 us/iteration extra over XLA-HIGH —
# negligible against the ~50 us of inter-kernel traffic it removes (the
# opposite balance from the bare fused_spectral_apply, which lost because
# it saved NO launches).


def _bf16x3_dot(a_hi, a_lo, h, dims, contract_a):
    """3-pass bf16 contraction of an f32 `h` against a pre-split f32
    operand (a = a_hi + a_lo in bf16): Mosaic only lowers DEFAULT (1 bf16
    pass) and HIGHEST (fp32, ~6 passes) dot precision, so Precision.HIGH —
    the XLA path's production setting — is reproduced manually: hi*hi +
    hi*lo + lo*hi, each a DEFAULT bf16 dot accumulating to f32. This is
    exactly XLA's HIGH decomposition, so the in-kernel preconditioner
    matches the jnp path's precision AND pass count (3 vs HIGHEST's 6).
    `contract_a` says whether `a` is the lhs (True) or rhs."""
    h_hi = h.astype(jnp.bfloat16)
    h_lo = (h - h_hi.astype(h.dtype)).astype(jnp.bfloat16)

    def d(u, v):
        lhs, rhs = (u, v) if contract_a else (v, u)
        return jax.lax.dot_general(
            lhs, rhs, (dims, ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    return d(a_hi, h_hi) + d(a_hi, h_lo) + d(a_lo, h_hi)


def _pcg2_core(deflate, max_iter, precision,
               cv, lyv, hyv, lxv, hxv, shift, tol, v0v, v1v, symv, bv, x0v,
               n_true=None, maskv=None):
    """maskv/n_true — the pad-to-aligned path (fused_pcg2_solve): planes
    zero-padded to sublane/lane multiples carry a ones-mask over true
    cells. The stencil part is exact on zero-padded rows (zero wrap
    couplings by the bounded-assembly invariant), but the rank-one shift
    and the mean deflation are GLOBAL terms that would leak onto padded
    rows — both are masked, and the deflation mean divides by the true
    cell count instead of r.size."""
    eps = jnp.asarray(1e-30, bv.dtype)
    nsize = jnp.asarray(bv.size if n_true is None else n_true, bv.dtype)

    def matvec(p):
        q = cv * p
        q = q + lyv * _roll(p, 1, 0)
        q = q + hyv * _roll(p, -1, 0)
        q = q + lxv * _roll(p, 1, 1)
        q = q + hxv * _roll(p, -1, 1)
        q = q + shift * jnp.sum(p)
        return q if maskv is None else q * maskv

    if precision == jax.lax.Precision.HIGH and not _INTERPRET:
        # split the (static) bases once per solve; every iteration's four
        # contractions then run as 3-pass bf16 (see _bf16x3_dot)
        v0_hi = v0v.astype(jnp.bfloat16)
        v0_lo = (v0v - v0_hi.astype(v0v.dtype)).astype(jnp.bfloat16)
        v1_hi = v1v.astype(jnp.bfloat16)
        v1_lo = (v1v - v1_hi.astype(v1v.dtype)).astype(jnp.bfloat16)

        def minv(r):
            h = _bf16x3_dot(v0_hi, v0_lo, r, ((1,), (0,)), True)
            h = _bf16x3_dot(v1_hi, v1_lo, h, ((1,), (1,)), False)
            h = h / symv
            h = _bf16x3_dot(v0_hi, v0_lo, h, ((0,), (0,)), True)
            return _bf16x3_dot(v1_hi, v1_lo, h, ((1,), (0,)), False)
    else:
        mosaic_prec = _mosaic_precision(precision)

        def minv(r):
            h = _dot(v0v, r, ((1,), (0,)), mosaic_prec)
            h = _dot(h, v1v, ((1,), (1,)), mosaic_prec)
            h = h / symv
            h = _dot(v0v, h, ((0,), (0,)), mosaic_prec)
            return _dot(h, v1v, ((1,), (0,)), mosaic_prec)

    def project(r):
        if not deflate:
            return r
        m = jnp.sum(r) / nsize
        return r - m if maskv is None else r - m * maskv

    x = x0v
    r = project(bv - matvec(x))
    rnorm0 = jnp.max(jnp.abs(r))

    # the preconditioner apply lives INSIDE the body (classic PCG
    # restructure: beta_k = rz_k / rz_{k-1} with rz_0/p_0 seeded by the
    # first body run via p=0, rz=1): warm-converged solves (the cavity
    # class averages 0.01-0.5 iterations) run ZERO MXU contractions, which
    # the first cut of this kernel paid on every call (A/B'd -12% cavity).
    def cond(state):
        rnorm, k = state[4], state[5]
        return (rnorm >= tol) & jnp.isfinite(rnorm) & (k < max_iter)

    def body(state):
        x, r, p, rz, rnorm, k = state
        z = minv(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(jnp.abs(rz) > eps, rz_new / rz, 0.0)
        p = z + beta * p
        q = matvec(p)
        pq = jnp.sum(p * q)
        alpha = jnp.where(jnp.abs(pq) > eps, rz_new / pq, 0.0)
        x = x + alpha * p
        r = project(r - alpha * q)
        return x, r, p, rz_new, jnp.max(jnp.abs(r)), k + 1

    x, r, p, rz, rnorm, k = jax.lax.while_loop(
        cond, body,
        (x, r, jnp.zeros_like(bv), jnp.asarray(1.0, bv.dtype), rnorm0,
         jnp.zeros((), jnp.int32)),
    )
    # final true residual (krylov.pcg's fused_residual verification; for a
    # zero-iteration early exit this recomputes rnorm0 bit-identically)
    rt = project(bv - matvec(x))
    return x, jnp.max(jnp.abs(rt)), k


def _pcg2_solve_kernel(deflate, max_iter, precision, masked, *refs):
    if masked:
        (c, ly, hy, lx, hx, sc, mask, v0, v1, sym, b, x0,
         out_x, out_rn, out_k) = refs
        maskv = mask[:]
    else:
        (c, ly, hy, lx, hx, sc, v0, v1, sym, b, x0,
         out_x, out_rn, out_k) = refs
        maskv = None
    x, rn, k = _pcg2_core(deflate, max_iter, precision,
                          c[:], ly[:], hy[:], lx[:], hx[:], sc[0], sc[1],
                          v0[:], v1[:], sym[:], b[:], x0[:],
                          n_true=sc[2], maskv=maskv)
    out_x[:] = x
    out_rn[0] = rn
    out_k[0] = k


def _pcg2_solve_kernel_b(deflate, max_iter, precision, masked, batched,
                         sc_batched, *refs):
    # grid-over-batch program (see fused_jacobi1_solve): batched plane refs
    # are (1, n0, n1) sample blocks; unbatched operands (typically the
    # eigenbases/symbol/Laplacian — solver constants) are shared full
    # blocks, selected by the static `batched` flag tuple
    def rd(ref, bb):
        return ref[0] if bb else ref[:]

    if masked:
        (c, ly, hy, lx, hx, sc, mask, v0, v1, sym, b, x0,
         out_x, out_rn, out_k) = refs
        maskv = mask[:]  # the mask is a solver constant: never batched
    else:
        (c, ly, hy, lx, hx, sc, v0, v1, sym, b, x0,
         out_x, out_rn, out_k) = refs
        maskv = None
    i = pl.program_id(0)
    if sc_batched:
        shift, tol, n_true = sc[i, 0], sc[i, 1], sc[i, 2]
    else:
        shift, tol, n_true = sc[0], sc[1], sc[2]
    args = [rd(r, bb) for r, bb in zip((c, ly, hy, lx, hx), batched[:5])]
    v0v, v1v, symv, bv, x0v = (
        rd(r, bb) for r, bb in zip((v0, v1, sym, b, x0), batched[5:])
    )
    x, rn, k = _pcg2_core(deflate, max_iter, precision,
                          *args, shift, tol, v0v, v1v, symv, bv, x0v,
                          n_true=n_true, maskv=maskv)
    out_x[0] = x
    out_rn[i, 0] = rn
    out_k[i, 0] = k


def _pcg2_align(shape):
    """Sublane/lane padding amounts for an unaligned plane."""
    return ((-shape[0]) % 8, (-shape[1]) % 128)


def fused_pcg2_solve(lap, b, x0, solver_mm, weights, tol, max_iter,
                     deflate_mean=True):
    """Whole-solve rank-2 spectral PCG in one launch. Returns
    (x, true_resid_norm, iterations); the caller derives warn. x0 None =
    cold start (A@0 is exactly 0, so the uniform r0 path reproduces
    krylov.pcg's cold r0 = project(b) bit-for-bit).

    Unaligned planes (the 513-row cavity) are zero-padded to sublane/lane
    multiples here, once per solve: the r3 gate excluded the cavity
    ADJOINT because Mosaic re-padded the 513-row plane on every in-loop
    matvec/contraction (grad30 -6..-17%); padding once outside the loop
    removes that per-iteration cost. Zero-padded stencil rows decouple
    exactly (bounded axes carry zero wrap couplings); the rank-one shift
    and deflation — global terms — are masked in-kernel (see _pcg2_core),
    the eigenbases pad with zero modes and the symbol with +inf (the
    _safe_symbol convention, so padded modes synthesize to zero)."""
    from diffpiso_tpu.solvers.fourier import _safe_symbol

    dtype = b.dtype
    true_shape = b.shape
    n_true = float(b.size)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    v0, v1 = solver_mm._mats(dtype)
    sym = _safe_symbol(solver_mm, weights, dtype)
    prec = solver_mm._precision()

    a0, a1 = _pcg2_align(true_shape)
    # padding is exact ONLY on bounded axes (zero wrap couplings decouple
    # the ghost rows); a periodic axis wraps row 0 onto what padding would
    # turn into zeros, so unaligned periodic axes stay unpadded (Mosaic
    # pads internally per op — the r3 behavior; production periodic shapes
    # are power-of-two aligned anyway). Caught by
    # test_turb_fullstep_all_fused_matches_jnp at (32,32) periodic.
    if lap.periodic[0]:
        a0 = 0
    if lap.periodic[1]:
        a1 = 0
    masked = bool(a0 or a1)
    planes_in = (lap.center, lap.lo[0], lap.hi[0], lap.lo[1], lap.hi[1])
    mask_args = ()
    if masked:
        pad2 = lambda a: jnp.pad(a, ((0, a0), (0, a1)))
        planes_in = tuple(pad2(a) for a in planes_in)
        b = pad2(b)
        x0 = pad2(x0)
        v0 = jnp.pad(v0, ((0, a0), (0, a0)))
        v1 = jnp.pad(v1, ((0, a1), (0, a1)))
        sym = jnp.pad(sym, ((0, a0), (0, a1)),
                      constant_values=jnp.asarray(jnp.inf, dtype))
        mask = pad2(jnp.ones(true_shape, dtype))
        mask_args = (mask,)
    # pass the RAW precision: the kernel itself lowers HIGH as the manual
    # bf16x3 decomposition (3 DEFAULT passes, exactly XLA-HIGH) and only
    # coerces to HIGHEST for everything else Mosaic can't lower
    sc = jnp.stack([
        jnp.asarray(lap.shift, dtype), jnp.asarray(tol, dtype),
        jnp.asarray(n_true, dtype),
    ])
    # adaptive ceiling: the 512^2 production shape compiles in 96 MiB;
    # larger eligible shapes (env-raised budget) get headroom up to just
    # under the 128 MiB v5e VMEM. Margin measured at 1024^2: the
    # while-body stack needs plane_bytes + 29.3 MiB as a bare solve but
    # + 37.3 MiB inside the full PISO step (compile logs in
    # runs/ab_pcg2_large.log), so 44 MiB.
    vmem_limit = min(
        127 * 1024 * 1024,
        max(96 * 1024 * 1024,
            _pcg2_plane_bytes(b.shape, dtype) + 44 * 1024 * 1024),
    )
    @jax.custom_batching.custom_vmap
    def _solve(c, ly, hy, lx, hx, sc, *rest):
        mask_r = rest[:len(mask_args)]
        v0, v1, sym, b, x0 = rest[len(mask_args):]
        return pl.pallas_call(
            functools.partial(_pcg2_solve_kernel, deflate_mean,
                              int(max_iter), prec, masked),
            out_shape=(
                jax.ShapeDtypeStruct(b.shape, dtype),
                jax.ShapeDtypeStruct((1,), dtype),
                jax.ShapeDtypeStruct((1,), jnp.int32),
            ),
            in_specs=(_vmem_specs(5) + _smem_specs(1)
                      + _vmem_specs(5 + len(mask_args))),
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            interpret=_INTERPRET,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit,
            ),
        )(c, ly, hy, lx, hx, sc, *mask_r, v0, v1, sym, b, x0)

    @_solve.def_vmap
    def _rule(axis_size, in_batched, c, ly, hy, lx, hx, sc, *rest):
        # grid over the batch: batched planes become (1, n0, n1) sample
        # blocks; unbatched solver constants (incl. the pad mask) stay
        # shared full blocks (no broadcast copies of the eigenbases)
        sc_batched = bool(in_batched[5])
        sc_ = sc
        planes = (c, ly, hy, lx, hx) + tuple(rest)
        flags = tuple(in_batched[:5]) + tuple(in_batched[6:])
        # the kernel's flag tuple skips the (never-batched) pad mask: its
        # zip covers (c..hx) then (v0, v1, sym, b, x0)
        assert not any(flags[5:5 + len(mask_args)]), "pad mask batched?"
        kflags = flags[:5] + flags[5 + len(mask_args):]
        b_ = rest[len(mask_args) + 3]
        b_flag = kflags[8]

        def spec(a, bb):
            sh = a.shape[1:] if bb else a.shape
            if bb:
                return pl.BlockSpec((1,) + tuple(sh),
                                    lambda i: (i,) + (0,) * len(sh),
                                    memory_space=pltpu.VMEM)
            return pl.BlockSpec(tuple(sh), lambda i: (0,) * len(sh),
                                memory_space=pltpu.VMEM)

        in_specs = [spec(a, bb) for a, bb in zip(planes[:5], flags[:5])]
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        in_specs += [spec(a, bb) for a, bb in zip(planes[5:], flags[5:])]
        bshape = (axis_size,) + (b_.shape[1:] if b_flag else b_.shape)
        xo, rn, k = pl.pallas_call(
            functools.partial(_pcg2_solve_kernel_b, deflate_mean,
                              int(max_iter), prec, masked, kflags,
                              sc_batched),
            grid=(axis_size,),
            out_shape=(
                jax.ShapeDtypeStruct(bshape, dtype),
                jax.ShapeDtypeStruct((axis_size, 1), dtype),
                jax.ShapeDtypeStruct((axis_size, 1), jnp.int32),
            ),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1,) + tuple(bshape[1:]),
                             lambda i: (i,) + (0,) * (len(bshape) - 1),
                             memory_space=pltpu.VMEM),
                _batched_scalar_out_spec(),
                _batched_scalar_out_spec(),
            ),
            interpret=_INTERPRET,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit,
            ),
        )(*planes[:5], sc_, *planes[5:])
        return (xo, rn, k), (True, True, True)

    xo, rn, k = _solve(*planes_in, sc, *mask_args, v0, v1, sym, b, x0)
    if masked:
        xo = xo[..., :true_shape[0], :true_shape[1]]
    return xo, rn[..., 0], k[..., 0]


def _pcg2_plane_bytes(shape, dtype):
    n0, n1 = shape
    return (n0 * n0 + n1 * n1 + 16 * n0 * n1) * jnp.dtype(dtype).itemsize


def pcg2_eligible(shape, dtype, early_exit=True, periodic=None) -> bool:
    """Gate for the whole-solve rank-2 spectral PCG (DIFFPISO_FUSED_PCG2).
    Modes: never | fwd (forward solves only) | auto | all (historical
    alias of auto since the r4 pad-to-aligned path). Default auto by A/B
    (runs/ab_pcg2.log, 2 reps, restructured kernel): turb 512^2 fwd 3947
    vs 2632 (+50%), grad30 1134 vs 1015 (+12%); cavity 513x512 fwd +17%.
    r3 excluded the cavity ADJOINT (grad30 -6..-17%: Mosaic re-padded the
    unaligned 513-row plane on every in-loop matvec/contraction, and only
    the adjoint's colder solves iterate enough to expose it); r4 pads
    unaligned planes ONCE in the wrapper (masked shift/deflation — see
    fused_pcg2_solve), lifting the alignment condition (A/B
    runs/ab_pcg2_pad.log).
    Residency: 5 stencil planes + b/x0/sym + while carries (x, r, p) +
    ~3 temps ≈ 14 planes, the two bases, and the HIGHEST-dot scratch
    (~18 MB measured at 512^2) under the 96 MiB compiler ceiling."""
    mode = os.environ.get("DIFFPISO_FUSED_PCG2", "auto")
    if mode == "never":
        return False
    per = periodic if periodic is not None else (False,) * len(shape)
    if len(per) == 2:
        pad0 = 0 if per[0] else (-shape[0]) % 8
        pad1 = 0 if per[1] else (-shape[1]) % 128
        padded = (shape[0] + pad0, shape[1] + pad1)
    else:
        padded = shape
    if not early_exit:  # adjoint solve
        if mode == "fwd":
            return False
        # axes the wrapper cannot pad (periodic) keep the r3 alignment
        # exclusion: an unaligned plane pays Mosaic re-padding per in-loop
        # op, and only the colder adjoint solves iterate enough to lose
        if mode == "auto" and not (
            padded[0] % 8 == 0 and padded[1] % 128 == 0
        ):
            return False
    if not _PALLAS_AVAILABLE:
        return False
    from diffpiso_tpu.ops import pallas_stencil as _ps

    if _ps._DISABLED_DEPTH > 0:
        return False
    if os.environ.get("DIFFPISO_DISABLE_PALLAS"):
        return False
    if jax.default_backend() not in ("tpu",) and not _INTERPRET:
        return False
    if len(shape) != 2:
        return False
    if jnp.dtype(dtype).itemsize > 4:
        return False
    # DIFFPISO_PCG2_MIB raises the plane budget past the 512^2 class, but
    # the 1024^2-class shapes (planes >= ~72 MiB) hit a hard Mosaic wall
    # INSIDE the full PISO step: the kernel's scoped-vmem reservation
    # tracks whatever ceiling it is given (measured at limits 96/108/116
    # MiB — each compile OOMs exactly ~1.3 MiB over the limit, the
    # enclosing cond's staging), so no ceiling under the 128 MiB VMEM
    # converges. Negative result recorded runs/ab_pcg2_large.log; the
    # bare solve DOES compile at 108 MiB (runs/check_pcg2_lowering.py).
    budget_mib = int(os.environ.get("DIFFPISO_PCG2_MIB", "24"))
    return _pcg2_plane_bytes(padded, dtype) <= budget_mib * 1024 * 1024


# -- fused spectral preconditioner apply (2-D eigenbasis contractions) ------------


def spectral_eligible(shape, dtype) -> bool:
    """Fused MatmulSpectralSolver apply: rank-2 only, all planes resident —
    V0 (n0,n0) + V1 (n1,n1) + r/z/2 temps (n0,n1). The DNS 512x2048 aspect
    ratio blows the basis budget (n1^2 = 16 MiB) and stays on XLA."""
    # rank-2 gate: TPU lowering validated 2026-08-18 (every basis family +
    # the unaligned 513x512 cavity shape, runs/lowering.log) but default
    # OFF by measurement (runs/ab_spectral.log, 2 reps): turb 512^2 fwd
    # 2638 vs 2087 (-21%), grad30 -18%; cavity fwd -8%, grad30 -18%. Root
    # cause is structural, not a tuning miss: Mosaic contracts only at
    # fp32 (HIGHEST, ~6 bf16 passes) while the XLA path runs the
    # production "high" (3 passes) — the fused kernels' HBM-round-trip
    # savings never recover the 2x matmul-pass penalty. Re-flip condition:
    # a Mosaic release that lowers Precision.HIGH, or a workload that
    # needs precision="highest" anyway (there the pass counts tie).
    mode = os.environ.get("DIFFPISO_FUSED_SPECTRAL", "never")
    if mode == "never":
        return False
    if not _PALLAS_AVAILABLE:
        return False
    from diffpiso_tpu.ops import pallas_stencil as _ps

    if _ps._DISABLED_DEPTH > 0:  # no_pallas() — sharded traces
        return False
    if _ps._BATCHED_SAFE_DEPTH > 0:  # vmapped traces: no batching rule here
        return False
    if os.environ.get("DIFFPISO_DISABLE_PALLAS"):
        return False
    if jax.default_backend() not in ("tpu",):
        return False
    if len(shape) != 2:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if itemsize > 4:
        return False
    n0, n1 = shape
    # residency: V0 + V1 bases, the full-plane safe symbol (an (n0,n1)
    # operand since the _safe_symbol refactor), r, out, and ~2 h temps
    planes = n0 * n0 + n1 * n1 + 5 * n0 * n1
    return planes * itemsize <= _VMEM_BUDGET_BYTES


def spectral_eligible_3d(shape, dtype) -> bool:
    """Fused rank-3 MatmulSpectralSolver apply (3 launches: z-gridded (y,x)
    analysis, column-blocked z-transform + symbol divide, z-gridded (y,x)
    synthesis). Per-program VMEM is tiny (one plane + two bases / one slab),
    so the budget gate is only a sanity bound. Default OFF by measurement:
    TPU-validated correct (runs/lowering.log, rel-err 2.3e-7 at HIGHEST)
    but the 128^3 turb A/B LOSES — fwd 232.6 vs 244.3 baseline (-5%),
    grad10 103.2 vs 110.9: at ~1 warm-started iteration per solve the 3
    launches replace XLA ops the compiler already fuses competitively, and
    the z-gridded launch overhead dominates (runs/ab_3d.log, 2 reps)."""
    mode = os.environ.get("DIFFPISO_FUSED_SPECTRAL", "never")
    if mode == "never":
        return False
    if not _PALLAS_AVAILABLE:
        return False
    from diffpiso_tpu.ops import pallas_stencil as _ps

    if _ps._DISABLED_DEPTH > 0:
        return False
    if _ps._BATCHED_SAFE_DEPTH > 0:  # vmapped traces: no batching rule here
        return False
    if os.environ.get("DIFFPISO_DISABLE_PALLAS"):
        return False
    if jax.default_backend() not in ("tpu",):
        return False
    if len(shape) != 3:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if itemsize > 4:
        return False
    nz, ny, nx = shape
    blk = _spec3_block(ny * nx)
    plane_bytes = (ny * ny + nx * nx + 3 * ny * nx) * itemsize
    slab_bytes = (nz * nz + 3 * nz * blk) * itemsize
    return max(plane_bytes, slab_bytes) * 2 <= _VMEM_BUDGET_BYTES


def _spec3_block(n: int, target: int = 512) -> int:
    """Largest divisor of n that is <= target (column-block width for the
    z-transform slab kernel)."""
    for b in range(min(target, n), 0, -1):
        if n % b == 0:
            return b
    return n


def _mosaic_precision(precision):
    """Mosaic's dot lowering supports only DEFAULT and HIGHEST (fp32
    contract); Precision.HIGH (the MatmulSpectralSolver default — 3 bf16
    passes under XLA) fails to lower. Coerce HIGH -> HIGHEST inside the
    kernels: strictly more accurate than the XLA path it replaces, so the
    equality tolerances vs that path still hold."""
    if precision == jax.lax.Precision.HIGH:
        return jax.lax.Precision.HIGHEST
    return precision


def _dot(a, b, dims, precision):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), precision=precision,
        preferred_element_type=a.dtype,
    )


def _spec3_plane_kernel(analysis, precision, vy, vx, h, out):
    # analysis: Vy @ h @ Vx^T ; synthesis: Vy^T @ h @ Vx — per z-plane
    hv = h[0]
    if analysis:
        t = _dot(vy[:], hv, ((1,), (0,)), precision)
        out[0] = _dot(t, vx[:], ((1,), (1,)), precision)
    else:
        t = _dot(vy[:], hv, ((0,), (0,)), precision)
        out[0] = _dot(t, vx[:], ((1,), (0,)), precision)


def _spec3_z_kernel(precision, vz, ez, eyx, w, h, out):
    # z-transform + symbol divide + z-inverse on a (nz, blk) column slab:
    # S = wz ez + eyx (eyx = wy ey + wx ex flattened outside, traced)
    s = w[0] * ez[:] + eyx[:]
    g = _dot(vz[:], h[:], ((1,), (0,)), precision)
    singular = jnp.abs(s) < 1e-12
    g = jnp.where(singular, 0.0, g / jnp.where(singular, 1.0, s))
    out[:] = _dot(vz[:], g, ((0,), (0,)), precision)


def fused_spectral_apply_3d(vz, vy, vx, ez, eyx, wz, r, precision):
    """Three-launch rank-3 spectral inverse: the XLA path's 6 tensordots +
    6 moveaxis each round-trip the full field through HBM (~12 full-field
    copies at 128^3 = 8 MiB each); this reads/writes the field 3x total.
    ez: (nz, 1); eyx: (1, ny*nx) carrying the pre-weighted y+x eigenvalue
    sum; wz: traced z weight."""
    precision = _mosaic_precision(precision)
    nz, ny, nx = r.shape
    plane = pl.BlockSpec((1, ny, nx), lambda i: (i, 0, 0))
    basis_y = pl.BlockSpec((ny, ny), lambda i: (0, 0))
    basis_x = pl.BlockSpec((nx, nx), lambda i: (0, 0))

    def plane_pass(analysis, h):
        return pl.pallas_call(
            functools.partial(_spec3_plane_kernel, analysis, precision),
            out_shape=jax.ShapeDtypeStruct(r.shape, r.dtype),
            grid=(nz,),
            in_specs=[basis_y, basis_x, plane],
            out_specs=plane,
            interpret=_INTERPRET,
        )(vy, vx, h)

    h = plane_pass(True, r)
    n = ny * nx
    blk = _spec3_block(n)
    h2 = h.reshape(nz, n)
    slab = pl.BlockSpec((nz, blk), lambda i: (0, i))
    w = jnp.reshape(jnp.asarray(wz, r.dtype), (1,))
    h2 = pl.pallas_call(
        functools.partial(_spec3_z_kernel, precision),
        out_shape=jax.ShapeDtypeStruct((nz, n), r.dtype),
        grid=(n // blk,),
        in_specs=[
            pl.BlockSpec((nz, nz), lambda i: (0, 0)),
            pl.BlockSpec((nz, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, blk), lambda i: (0, i)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            slab,
        ],
        out_specs=slab,
        interpret=_INTERPRET,
    )(vz, ez, eyx, w, h2)
    return plane_pass(False, h2.reshape(r.shape))


def _spectral_kernel(precision, v0, v1, symbol, r, out_z):
    # z = V0^T ((V0 r V1^T) / S) V1 with S the safe symbol (singular modes
    # — the all-Neumann / periodic null space — carry +inf, so the plain
    # divide zeroes them), matching MatmulSpectralSolver.solve exactly. All
    # four contractions run on the MXU with h resident in VMEM — the XLA
    # path round-trips each tensordot result through HBM. S is precomputed
    # OUTSIDE the kernel (one XLA elementwise op, see fourier._safe_symbol):
    # the in-kernel where/divide chain cost ~3 extra full-plane VMEM
    # temporaries, which blew the 16 MiB scoped-vmem stack at 512^2
    # (measured 18.58M).
    def dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, (dims, ((), ())), precision=precision,
            preferred_element_type=a.dtype,
        )

    v0v, v1v = v0[:], v1[:]
    h = dot(v0v, r[:], ((1,), (0,)))        # V0 @ r
    h = dot(h, v1v, ((1,), (1,)))           # (.) @ V1^T — contract b dim 1
    h = h / symbol[:]
    h = dot(v0v, h, ((0,), (0,)))           # V0^T @ (.) — contract a dim 0
    out_z[:] = dot(h, v1v, ((1,), (0,)))    # (.) @ V1


def fused_spectral_apply(v0, v1, symbol, r, precision):
    """One-launch symmetric spectral inverse apply (MatmulSpectralSolver):
    analysis + symbol divide + synthesis without HBM round trips between
    the contractions. symbol: (n0, n1) eigenvalue symbol with singular
    modes set to +inf (see fourier._safe_symbol)."""
    precision = _mosaic_precision(precision)
    return pl.pallas_call(
        functools.partial(_spectral_kernel, precision),
        out_shape=jax.ShapeDtypeStruct(r.shape, r.dtype),
        in_specs=_vmem_specs(4),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_INTERPRET,
        compiler_params=_mxu_compiler_params(),
    )(v0, v1, symbol, r)
