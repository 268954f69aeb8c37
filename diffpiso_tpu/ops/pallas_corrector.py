"""One-launch PISO corrector-1 bridge (periodic rank-2): the inter-solve
glue between the two pressure solves as a single Pallas kernel.

Motivation (r3 roofline, BENCH_DETAIL "roofline" + VERDICT r3 item 5): with
the whole-solve kernels owning the three solves, the forward step sits
~3.1x above its HBM floor at 512^2 — ~98 XLA fusions of assembly, FV, and
corrector updates remain BETWEEN the solve launches, each paying a kernel
fixed cost and HBM round trips. The corrector-1 chain

    grad_p1 = fv_gradient(p_inc1)                       (2 planes out)
    delta_d = -grad_p1_d / (bma_d * dxprod)
    vel_s2_d = vel_star_d + delta_d                     (ops/fv.py:164)
    h_d     = S_d(delta_d) - (diag_A_d - beta) delta_d  (explicit_H,
                                                         ops/stencil.py:287)
    h_over  = h_d / bma_d
    h_div   = sum_d (roll(h_over_d,-1,d) - h_over_d) f_d (fv_divergence)

is ~15 elementwise/roll XLA kernels over full planes; here it is ONE
launch with every operand VMEM-resident, emitting exactly the tensors the
rest of the step consumes: vel_s2 (2), h (2 — corrector 2's velocity_s3
needs it), h_div (solve 2's rhs). Periodic FV conventions match
ops/pallas_fv.py (grad_d = (p - roll(p,1,d)) f_d; div = sum (roll(c,-1,d)
- c) f_d); the advection stencil is block-diagonal per component
(ops/stencil.py apply_stencil), so h_d needs only component d's planes.

Gradient: custom_vjp with the backward recomputed through the identical
XLA chain (the MatmulSpectralSolver pattern — solvers/fourier.py
_mm_solve_fused): the chain is cheap linear algebra whose VJP XLA fuses
well, while cotangents must also flow into the velocity-dependent stencil
coefficients, which a hand transpose kernel would have to rebuild.

Reference anchor: piso_tf.py:64-96 (the corrector updates between the two
pressure solves) + piso_helpers.py:209-310 (explicit_H_csr,
finite_volume_divergence/gradient).
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

# tests flip this to run the exact production kernels on CPU
_INTERPRET = False


def _roll(x, shift, axis):
    return pltpu.roll(x, shift % x.shape[axis], axis)


def eligible(shape, dtype) -> bool:
    """Periodic rank-2 corrector-bridge gate (DIFFPISO_FUSED_CORR, default
    auto): ~24 resident planes (p_inc + 2 vel + 2 bma + 10 stencil + 2
    diag_A + 5 outs + temps) under a 32 MiB ceiling — the 512^2 class.
    Measured A/B (runs/ab_corr.log, 2 interleaved reps): turb512 fwd
    6209-6228 vs 5926-5998 (+4-5%), grad30 1413-1519 vs 1412-1435
    (neutral-to-+7%); turb1024 LOSES fwd 825-828 vs 893-894 (-7.6%) and
    grad30 281-285 vs 290-291 — at 4 MiB planes the 24-plane residency
    (96 MiB) thrashes VMEM while XLA's fusions stream, so the ceiling
    mirrors the measured winning boundary. Re-flip condition: a row-tiled
    bridge variant that wins at 1024^2."""
    if os.environ.get("DIFFPISO_FUSED_CORR", "auto") == "never":
        return False
    if not _PALLAS_AVAILABLE:
        return False
    from diffpiso_tpu.ops import pallas_stencil as _ps

    if _ps._DISABLED_DEPTH > 0 or os.environ.get("DIFFPISO_DISABLE_PALLAS"):
        return False
    if _ps._BATCHED_SAFE_DEPTH > 0:  # vmapped traces: no batching rule
        return False
    if jax.default_backend() not in ("tpu",) and not _INTERPRET:
        return False
    if len(shape) != 2:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if itemsize > 4:
        return False
    return 24 * shape[0] * shape[1] * itemsize <= 32 * 1024 * 1024


def _bridge1_jnp(f0, f1, dxprod, beta, p_inc, vel_star, bma, st_c, st_lo,
                 st_hi, diag_A):
    """The reference XLA chain — also the custom_vjp backward's recompute
    path, so it must match the kernel bit-for-bit in structure."""
    grad = (
        (p_inc - jnp.roll(p_inc, 1, 0)) * f0,
        (p_inc - jnp.roll(p_inc, 1, 1)) * f1,
    )
    delta = tuple(-g / (b * dxprod) for g, b in zip(grad, bma))
    vel_s2 = tuple(v + d for v, d in zip(vel_star, delta))
    hs = []
    for d in range(2):
        w = delta[d]
        q = st_c[d] * w
        q = q + st_lo[d][0] * jnp.roll(w, 1, 0)
        q = q + st_hi[d][0] * jnp.roll(w, -1, 0)
        q = q + st_lo[d][1] * jnp.roll(w, 1, 1)
        q = q + st_hi[d][1] * jnp.roll(w, -1, 1)
        hs.append(q - (diag_A[d] - beta) * w)
    h = tuple(hs)
    h_over = tuple(hc / b for hc, b in zip(h, bma))
    h_div = (jnp.roll(h_over[0], -1, 0) - h_over[0]) * f0 + (
        jnp.roll(h_over[1], -1, 1) - h_over[1]
    ) * f1
    return vel_s2, h, h_div


def _bridge1_kernel(f0, f1, dxprod,
                    p, v0, v1, b0, b1,
                    c0, l00, h00, l01, h01,
                    c1, l10, h10, l11, h11,
                    dA0, dA1, sc,
                    out_v0, out_v1, out_h0, out_h1, out_div):
    beta = sc[0]
    pv = p[:]
    # gradient + velocity update + delta (per component)
    g0 = (pv - _roll(pv, 1, 0)) * f0
    g1 = (pv - _roll(pv, 1, 1)) * f1
    d0 = -g0 / (b0[:] * dxprod)
    d1 = -g1 / (b1[:] * dxprod)
    out_v0[:] = v0[:] + d0
    out_v1[:] = v1[:] + d1
    # explicit H per component (block-diagonal stencil)
    q0 = c0[:] * d0
    q0 = q0 + l00[:] * _roll(d0, 1, 0)
    q0 = q0 + h00[:] * _roll(d0, -1, 0)
    q0 = q0 + l01[:] * _roll(d0, 1, 1)
    q0 = q0 + h01[:] * _roll(d0, -1, 1)
    h0 = q0 - (dA0[:] - beta) * d0
    q1 = c1[:] * d1
    q1 = q1 + l10[:] * _roll(d1, 1, 0)
    q1 = q1 + h10[:] * _roll(d1, -1, 0)
    q1 = q1 + l11[:] * _roll(d1, 1, 1)
    q1 = q1 + h11[:] * _roll(d1, -1, 1)
    h1 = q1 - (dA1[:] - beta) * d1
    out_h0[:] = h0
    out_h1[:] = h1
    ho0 = h0 / b0[:]
    ho1 = h1 / b1[:]
    out_div[:] = (_roll(ho0, -1, 0) - ho0) * f0 + (_roll(ho1, -1, 1) - ho1) * f1


def corrector1_bridge(p_inc, vel_star, bma, stencil, diag_A, beta, dx):
    """Fused corrector-1 bridge. vel_star/bma — component tuples; stencil —
    AdvectionStencil (periodic, both comps shaped like p_inc). Returns
    (vel_s2 tuple, h tuple, h_div). Gradients flow through the XLA
    recompute (custom_vjp)."""
    dx = tuple(float(d) for d in dx)
    dxprod = float(np.prod(dx))
    f0, f1 = dxprod / dx[0], dxprod / dx[1]
    st_c = tuple(stencil.center)
    st_lo = tuple(stencil.lo)
    st_hi = tuple(stencil.hi)
    dtype = p_inc.dtype

    jnp_impl = functools.partial(_bridge1_jnp, f0, f1, dxprod)

    @jax.custom_vjp
    def _bridge(beta_, p_inc, vel_star, bma, st_c, st_lo, st_hi, diag_A):
        plane = p_inc.shape
        s = jax.ShapeDtypeStruct(plane, dtype)
        nbytes = p_inc.size * jnp.dtype(dtype).itemsize
        ops = (
            p_inc, vel_star[0], vel_star[1], bma[0], bma[1],
            st_c[0], st_lo[0][0], st_hi[0][0], st_lo[0][1], st_hi[0][1],
            st_c[1], st_lo[1][0], st_hi[1][0], st_lo[1][1], st_hi[1][1],
            diag_A[0], diag_A[1],
        )
        outs = pl.pallas_call(
            functools.partial(_bridge1_kernel, f0, f1, dxprod),
            out_shape=(s, s, s, s, s),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(ops)
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=tuple(
                pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(5)
            ),
            interpret=_INTERPRET,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(120 * 1024 * 1024,
                                     max(48 * 1024 * 1024, 28 * nbytes)),
            ),
        )(*ops, jnp.stack([jnp.asarray(beta_, dtype)]))
        v0, v1, h0, h1, hdiv = outs
        return (v0, v1), (h0, h1), hdiv

    def _fwd(beta_, p_inc, vel_star, bma, st_c, st_lo, st_hi, diag_A):
        out = _bridge(beta_, p_inc, vel_star, bma, st_c, st_lo, st_hi,
                      diag_A)
        return out, (beta_, p_inc, vel_star, bma, st_c, st_lo, st_hi,
                     diag_A)

    def _bwd(res, ct):
        beta_, p_inc, vel_star, bma, st_c, st_lo, st_hi, diag_A = res
        _, vjp = jax.vjp(
            lambda b_, p, v, bm, c, lo, hi, dA: jnp_impl(
                b_, p, v, bm, c, lo, hi, dA
            ),
            beta_, p_inc, vel_star, bma, st_c, st_lo, st_hi, diag_A,
        )
        return vjp(ct)

    _bridge.defvjp(_fwd, _bwd)
    return _bridge(beta, p_inc, vel_star, bma, st_c, st_lo, st_hi, diag_A)


# -- corrector-2 tail: grad(p_inc2) + velocity_s3 update in one launch ---------------


def _tail2_jnp(f0, f1, dxprod, p_inc, vel_s2, h, bma):
    grad = (
        (p_inc - jnp.roll(p_inc, 1, 0)) * f0,
        (p_inc - jnp.roll(p_inc, 1, 1)) * f1,
    )
    return tuple(
        v + (hc - g / dxprod) / b
        for v, hc, g, b in zip(vel_s2, h, grad, bma)
    )


def _tail2_kernel(f0, f1, dxprod, p, v0, v1, h0, h1, b0, b1,
                  out_v0, out_v1):
    pv = p[:]
    g0 = (pv - _roll(pv, 1, 0)) * f0
    g1 = (pv - _roll(pv, 1, 1)) * f1
    out_v0[:] = v0[:] + (h0[:] - g0 / dxprod) / b0[:]
    out_v1[:] = v1[:] + (h1[:] - g1 / dxprod) / b1[:]


def corrector2_tail(p_inc, vel_s2, h, bma, dx):
    """Fused corrector-2 tail: velocity_s3 = vel_s2 + (h - grad(p_inc2)
    /dxprod)/bma in one launch (periodic rank-2; piso.py's closing update,
    piso_tf.py:92-96). Same custom_vjp recompute pattern as
    corrector1_bridge."""
    dx = tuple(float(d) for d in dx)
    dxprod = float(np.prod(dx))
    f0, f1 = dxprod / dx[0], dxprod / dx[1]
    dtype = p_inc.dtype
    jnp_impl = functools.partial(_tail2_jnp, f0, f1, dxprod)

    @jax.custom_vjp
    def _tail(p_inc, vel_s2, h, bma):
        s = jax.ShapeDtypeStruct(p_inc.shape, dtype)
        nbytes = p_inc.size * jnp.dtype(dtype).itemsize
        return pl.pallas_call(
            functools.partial(_tail2_kernel, f0, f1, dxprod),
            out_shape=(s, s),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            interpret=_INTERPRET,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(120 * 1024 * 1024,
                                     max(48 * 1024 * 1024, 14 * nbytes)),
            ),
        )(p_inc, vel_s2[0], vel_s2[1], h[0], h[1], bma[0], bma[1])

    def _fwd(p_inc, vel_s2, h, bma):
        return _tail(p_inc, vel_s2, h, bma), (p_inc, vel_s2, h, bma)

    def _bwd(res, ct):
        _, vjp = jax.vjp(jnp_impl, *res)
        return vjp(ct)

    _tail.defvjp(_fwd, _bwd)
    return _tail(p_inc, vel_s2, h, bma)
