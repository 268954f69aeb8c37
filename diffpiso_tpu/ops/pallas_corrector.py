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


def _variant(shape, dtype):
    """Which bridge variant a plane dispatches to: "mono" (every operand
    VMEM-resident, one program), "tiled" (row-tiled grid with 8-row halo
    slivers — the re-flip variant for planes past the monolithic ceiling),
    or None.

    Monolithic: ~24 resident planes (p_inc + 2 vel + 2 bma + 10 stencil +
    2 diag_A + 5 outs + temps) under a 32 MiB ceiling — the 512^2 class.
    Measured A/B (runs/ab_corr.log, 2 interleaved reps): turb512 fwd
    6209-6228 vs 5926-5998 (+4-5%), grad30 1413-1519 vs 1412-1435
    (neutral-to-+7%); turb1024 LOSES fwd 825-828 vs 893-894 (-7.6%) and
    grad30 281-285 vs 290-291 — at 4 MiB planes the 24-plane residency
    (96 MiB) thrashes VMEM while XLA's fusions stream.

    Tiled: the r4 re-flip variant for planes past the monolithic ceiling —
    measured WINNING at turb1024 (runs/ab_corr_tiled.log, 2 interleaved
    reps): fwd 904-906 vs 895-897 (+1.1%), grad30 296.8-297.7 vs
    291.9-292.0 (+1.7%); where the monolithic variant lost -7.6% fwd, the
    tiled one streams ~22 (tile, nx) blocks per grid step instead of
    parking 96 MiB in VMEM. The chain is computed on an 8-row-extended
    window so the 2-row halo chain (grad -> H -> div) stays exact at the
    kept rows. Requires ny % 8 == 0 and >= 2 row tiles; plane ceiling
    16 MiB (2048^2 class, unmeasured past 1024^2 — periodic-only anyway,
    and turb1024 is the largest periodic bench shape)."""
    mode = os.environ.get("DIFFPISO_FUSED_CORR", "auto")
    if mode == "never":
        return None
    if not _PALLAS_AVAILABLE:
        return None
    from diffpiso_tpu.ops import pallas_stencil as _ps

    if _ps._DISABLED_DEPTH > 0 or os.environ.get("DIFFPISO_DISABLE_PALLAS"):
        return None
    if _ps._BATCHED_SAFE_DEPTH > 0:  # vmapped traces: no batching rule
        return None
    if jax.default_backend() not in ("tpu",) and not _INTERPRET:
        return None
    if len(shape) != 2:
        return None
    itemsize = jnp.dtype(dtype).itemsize
    if itemsize > 4:
        return None
    plane = shape[0] * shape[1] * itemsize
    if 24 * plane <= 32 * 1024 * 1024:
        return "mono"
    if plane > 16 * 1024 * 1024:
        return None
    if _bridge_tile(shape, itemsize) is None:
        return None
    return "tiled"


def _bridge_tile(shape, itemsize):
    """Row-tile size for the tiled bridge (the pallas_stencil._pick_tile
    recipe at ~22 double-buffered blocks per grid step)."""
    ny, nx = shape
    if ny % 8 != 0:
        return None
    for t in (128, 256, 64, 32, 16, 8):
        if ny % t != 0 or ny // t < 2:
            continue
        if 22 * 2 * t * nx * itemsize > 64 * 1024 * 1024:
            continue
        return t
    return None


def eligible(shape, dtype) -> bool:
    """Periodic rank-2 corrector-bridge gate (DIFFPISO_FUSED_CORR, default
    auto). See _variant for the measured monolithic/tiled boundaries."""
    return _variant(shape, dtype) is not None


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


def _bridge1_tiled_kernel(f0, f1, dxprod,
                          p, p_up, p_dn,
                          v0, v1,
                          b0, b0_up, b0_dn, b1, b1_up, b1_dn,
                          c0, c0_dn, l00, l00_dn, h00, h00_dn,
                          l01, l01_dn, h01, h01_dn,
                          c1, c1_dn, l10, l10_dn, h10, h10_dn,
                          l11, l11_dn, h11, h11_dn,
                          dA0, dA0_dn, dA1, dA1_dn, sc,
                          out_v0, out_v1, out_h0, out_h1, out_div):
    """Row-tiled bridge: the monolithic chain evaluated on an 8-row-
    extended window [s-8, e+8) for output tile [s, e). Kept values reach
    at most 2 rows into the extension (grad needs p at s-1; H at the kept
    rows needs delta over [s-1, e]; div needs h_over over [s, e]), so
    every kept value is exact; pltpu.roll wrap errors live only within 2
    rows of the window edges, >= 6 rows away from anything kept. The
    stencil coeffs / diag_A are only consumed at H rows [s, e], never in
    the up extension, so their up-sliver is faked with the tile's own
    first rows (extc) instead of paying 12 more haloed operands."""
    beta = sc[0]
    T = out_v0.shape[0]

    def ext(t, up, dn):
        return jnp.concatenate([up, t, dn], 0)

    pv = ext(p[:], p_up[:], p_dn[:])
    b0e = ext(b0[:], b0_up[:], b0_dn[:])
    b1e = ext(b1[:], b1_up[:], b1_dn[:])

    def extc(t_ref, dn_ref):
        t = t_ref[:]
        return jnp.concatenate([t[:8], t, dn_ref[:]], 0)

    g0 = (pv - _roll(pv, 1, 0)) * f0
    g1 = (pv - _roll(pv, 1, 1)) * f1
    d0 = -g0 / (b0e * dxprod)
    d1 = -g1 / (b1e * dxprod)
    out_v0[:] = v0[:] + d0[8:8 + T]
    out_v1[:] = v1[:] + d1[8:8 + T]
    q0 = extc(c0, c0_dn) * d0
    q0 = q0 + extc(l00, l00_dn) * _roll(d0, 1, 0)
    q0 = q0 + extc(h00, h00_dn) * _roll(d0, -1, 0)
    q0 = q0 + extc(l01, l01_dn) * _roll(d0, 1, 1)
    q0 = q0 + extc(h01, h01_dn) * _roll(d0, -1, 1)
    h0 = q0 - (extc(dA0, dA0_dn) - beta) * d0
    q1 = extc(c1, c1_dn) * d1
    q1 = q1 + extc(l10, l10_dn) * _roll(d1, 1, 0)
    q1 = q1 + extc(h10, h10_dn) * _roll(d1, -1, 0)
    q1 = q1 + extc(l11, l11_dn) * _roll(d1, 1, 1)
    q1 = q1 + extc(h11, h11_dn) * _roll(d1, -1, 1)
    h1 = q1 - (extc(dA1, dA1_dn) - beta) * d1
    out_h0[:] = h0[8:8 + T]
    out_h1[:] = h1[8:8 + T]
    ho0 = h0 / b0e
    ho1 = h1 / b1e
    dv = (_roll(ho0, -1, 0) - ho0) * f0 + (_roll(ho1, -1, 1) - ho1) * f1
    out_div[:] = dv[8:8 + T]


def _bridge1_tiled_call(f0, f1, dxprod, dtype, tile, ops, beta_arr):
    (p, v0, v1, b0, b1,
     c0, l00, h00, l01, h01, c1, l10, h10, l11, h11, dA0, dA1) = ops
    ny, nx = p.shape
    n_tiles = ny // tile
    nb8 = ny // 8
    tpb = tile // 8
    tile_spec = pl.BlockSpec((tile, nx), lambda i: (i, 0))
    up_spec = pl.BlockSpec((8, nx), lambda i: ((i * tpb - 1) % nb8, 0))
    dn_spec = pl.BlockSpec((8, nx), lambda i: (((i + 1) * tpb) % nb8, 0))
    s = jax.ShapeDtypeStruct((ny, nx), dtype)
    args = [p, p, p, v0, v1, b0, b0, b0, b1, b1, b1]
    specs = [tile_spec, up_spec, dn_spec, tile_spec, tile_spec,
             tile_spec, up_spec, dn_spec, tile_spec, up_spec, dn_spec]
    for coeff in (c0, l00, h00, l01, h01, c1, l10, h10, l11, h11, dA0, dA1):
        args += [coeff, coeff]
        specs += [tile_spec, dn_spec]
    args.append(beta_arr)
    specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    return pl.pallas_call(
        functools.partial(_bridge1_tiled_kernel, f0, f1, dxprod),
        out_shape=(s, s, s, s, s),
        grid=(n_tiles,),
        in_specs=specs,
        out_specs=tuple(tile_spec for _ in range(5)),
        interpret=_INTERPRET,
        # explicit ceiling: the default 16 MiB scope OOM'd by 640K when
        # the r5 'outputs' remat replays this call inside the backward
        # while-body (runs/ab_mm_dct.log, turb1024 grad) — the ~35
        # resident tile blocks + temps need headroom there
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(*args)


def _tail2_tiled_kernel(f0, f1, dxprod, p, p_up, v0, v1, h0, h1, b0, b1,
                        out_v0, out_v1):
    T = out_v0.shape[0]
    pv = jnp.concatenate([p_up[:], p[:]], 0)
    g0 = ((pv - _roll(pv, 1, 0)) * f0)[8:8 + T]
    g1 = ((pv - _roll(pv, 1, 1)) * f1)[8:8 + T]
    out_v0[:] = v0[:] + (h0[:] - g0 / dxprod) / b0[:]
    out_v1[:] = v1[:] + (h1[:] - g1 / dxprod) / b1[:]


def _tail2_tiled_call(f0, f1, dxprod, dtype, tile, p_inc, vel_s2, h, bma):
    ny, nx = p_inc.shape
    n_tiles = ny // tile
    nb8 = ny // 8
    tpb = tile // 8
    tile_spec = pl.BlockSpec((tile, nx), lambda i: (i, 0))
    up_spec = pl.BlockSpec((8, nx), lambda i: ((i * tpb - 1) % nb8, 0))
    s = jax.ShapeDtypeStruct((ny, nx), dtype)
    return pl.pallas_call(
        functools.partial(_tail2_tiled_kernel, f0, f1, dxprod),
        out_shape=(s, s),
        grid=(n_tiles,),
        in_specs=[tile_spec, up_spec] + [tile_spec] * 6,
        out_specs=(tile_spec, tile_spec),
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(p_inc, p_inc, vel_s2[0], vel_s2[1], h[0], h[1], bma[0], bma[1])


def _bwd_variant(shape, dtype):
    """Fused-VJP gate (DIFFPISO_FUSED_CORR_BWD, default NEVER — measured
    regression): the hand-transposed bridge backward holds ~45 planes (17
    primal inputs + 5 cotangents + 17 cotangent outputs + recompute
    temps), monolithic up to the 512^2 class. A/B at the turb512 grad30
    headline under the production 'outputs' remat protocol
    (runs/ab_corr_bwd.log, 2 interleaved reps): never 1823/1821 vs auto
    1481/1462 (-20%). Diagnosis: the remat replay already recomputes the
    forward bridge chain in the backward pass, and XLA CSEs the jax.vjp
    linearization into that replay — the "recompute" the fused kernel
    saves is already free — while the 45-plane monolithic launch
    serializes against the replay's fused chains and thrashes VMEM.
    Re-flip condition: a win in runs/ab_corr_bwd.py under whatever grad
    protocol is then the default. Set =auto to opt in (size-gated)."""
    if os.environ.get("DIFFPISO_FUSED_CORR_BWD", "never") == "never":
        return None
    if _variant(shape, dtype) is None:
        return None
    itemsize = jnp.dtype(dtype).itemsize
    plane = shape[0] * shape[1] * itemsize
    if 48 * plane <= 64 * 1024 * 1024:
        return "mono"
    return None


def _bridge1_bwd_kernel(f0, f1, dxprod, *refs):
    """Hand transpose of _bridge1_jnp in ONE launch: recompute the cheap
    chain values (grad/delta/h) from the saved primal inputs, then
    accumulate every input cotangent. Replaces the r4 backward's
    jax.vjp(jnp_impl) — which re-ran the forward chain in XLA (the
    linearization) AND its transpose, ~30 fusions per unrolled step."""
    (p, v0, v1, b0, b1,
     c0, l00, h00, l01, h01,
     c1, l10, h10, l11, h11,
     dA0, dA1, sc,
     cv0, cv1, ch0, ch1, cdiv,
     o_beta, o_p, o_v0, o_v1, o_b0, o_b1,
     o_c0, o_l00, o_h00, o_l01, o_h01,
     o_c1, o_l10, o_h10, o_l11, o_h11,
     o_dA0, o_dA1) = refs
    beta = sc[0]
    pv = p[:]
    b0v, b1v = b0[:], b1[:]
    # recompute the forward chain values the cotangents need
    g0 = (pv - _roll(pv, 1, 0)) * f0
    g1 = (pv - _roll(pv, 1, 1)) * f1
    d0 = -g0 / (b0v * dxprod)
    d1 = -g1 / (b1v * dxprod)
    q0 = c0[:] * d0
    q0 = q0 + l00[:] * _roll(d0, 1, 0)
    q0 = q0 + h00[:] * _roll(d0, -1, 0)
    q0 = q0 + l01[:] * _roll(d0, 1, 1)
    q0 = q0 + h01[:] * _roll(d0, -1, 1)
    h0v = q0 - (dA0[:] - beta) * d0
    q1 = c1[:] * d1
    q1 = q1 + l10[:] * _roll(d1, 1, 0)
    q1 = q1 + h10[:] * _roll(d1, -1, 0)
    q1 = q1 + l11[:] * _roll(d1, 1, 1)
    q1 = q1 + h11[:] * _roll(d1, -1, 1)
    h1v = q1 - (dA1[:] - beta) * d1
    # 1. hdiv -> h_over: transpose of (roll(x,-1,d) - x) * f_d
    cdv = cdiv[:]
    cho0 = (_roll(cdv, 1, 0) - cdv) * f0
    cho1 = (_roll(cdv, 1, 1) - cdv) * f1
    # 2. h_over = h / b
    chh0 = ch0[:] + cho0 / b0v
    chh1 = ch1[:] + cho1 / b1v
    cb0 = -cho0 * h0v / (b0v * b0v)
    cb1 = -cho1 * h1v / (b1v * b1v)
    # 3. h = q - (dA - beta) delta
    cd0 = -(dA0[:] - beta) * chh0
    cd1 = -(dA1[:] - beta) * chh1
    o_dA0[:] = -chh0 * d0
    o_dA1[:] = -chh1 * d1
    o_beta[0] = jnp.sum(chh0 * d0) + jnp.sum(chh1 * d1)
    # 4. q: coefficient cotangents + S^T into delta
    o_c0[:] = chh0 * d0
    o_l00[:] = chh0 * _roll(d0, 1, 0)
    o_h00[:] = chh0 * _roll(d0, -1, 0)
    o_l01[:] = chh0 * _roll(d0, 1, 1)
    o_h01[:] = chh0 * _roll(d0, -1, 1)
    o_c1[:] = chh1 * d1
    o_l10[:] = chh1 * _roll(d1, 1, 0)
    o_h10[:] = chh1 * _roll(d1, -1, 0)
    o_l11[:] = chh1 * _roll(d1, 1, 1)
    o_h11[:] = chh1 * _roll(d1, -1, 1)
    cd0 = cd0 + c0[:] * chh0
    cd0 = cd0 + _roll(l00[:] * chh0, -1, 0)
    cd0 = cd0 + _roll(h00[:] * chh0, 1, 0)
    cd0 = cd0 + _roll(l01[:] * chh0, -1, 1)
    cd0 = cd0 + _roll(h01[:] * chh0, 1, 1)
    cd1 = cd1 + c1[:] * chh1
    cd1 = cd1 + _roll(l10[:] * chh1, -1, 0)
    cd1 = cd1 + _roll(h10[:] * chh1, 1, 0)
    cd1 = cd1 + _roll(l11[:] * chh1, -1, 1)
    cd1 = cd1 + _roll(h11[:] * chh1, 1, 1)
    # 5. vel_s2 = vel_star + delta
    o_v0[:] = cv0[:]
    o_v1[:] = cv1[:]
    cd0 = cd0 + cv0[:]
    cd1 = cd1 + cv1[:]
    # 6. delta = -g / (b * dxprod)
    cg0 = -cd0 / (b0v * dxprod)
    cg1 = -cd1 / (b1v * dxprod)
    o_b0[:] = cb0 - cd0 * d0 / b0v
    o_b1[:] = cb1 - cd1 * d1 / b1v
    # 7. g = (p - roll(p,1,d)) * f_d
    o_p[:] = (cg0 - _roll(cg0, -1, 0)) * f0 + (cg1 - _roll(cg1, -1, 1)) * f1


def _bridge1_bwd_call(f0, f1, dxprod, dtype, primal_ops, beta_arr, cts):
    s = jax.ShapeDtypeStruct(primal_ops[0].shape, dtype)
    one = jax.ShapeDtypeStruct((1,), dtype)
    nbytes = primal_ops[0].size * jnp.dtype(dtype).itemsize
    outs = pl.pallas_call(
        functools.partial(_bridge1_bwd_kernel, f0, f1, dxprod),
        out_shape=(one,) + (s,) * 17,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(primal_ops)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),)
        + tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(17)),
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(120 * 1024 * 1024,
                                 max(64 * 1024 * 1024, 52 * nbytes)),
        ),
    )(*primal_ops, beta_arr, *cts)
    return outs


def _tail2_bwd_kernel(f0, f1, dxprod, p, v0, v1, h0, h1, b0, b1,
                      ct0, ct1,
                      o_p, o_v0, o_v1, o_h0, o_h1, o_b0, o_b1):
    """Hand transpose of _tail2_jnp: vs3_d = v_d + (h_d - g_d/P)/b_d."""
    pv = p[:]
    b0v, b1v = b0[:], b1[:]
    g0 = (pv - _roll(pv, 1, 0)) * f0
    g1 = (pv - _roll(pv, 1, 1)) * f1
    c0v, c1v = ct0[:], ct1[:]
    o_v0[:] = c0v
    o_v1[:] = c1v
    o_h0[:] = c0v / b0v
    o_h1[:] = c1v / b1v
    o_b0[:] = -c0v * (h0[:] - g0 / dxprod) / (b0v * b0v)
    o_b1[:] = -c1v * (h1[:] - g1 / dxprod) / (b1v * b1v)
    cg0 = -c0v / (b0v * dxprod)
    cg1 = -c1v / (b1v * dxprod)
    o_p[:] = (cg0 - _roll(cg0, -1, 0)) * f0 + (cg1 - _roll(cg1, -1, 1)) * f1


def _tail2_bwd_call(f0, f1, dxprod, dtype, p_inc, vel_s2, h, bma, cts):
    s = jax.ShapeDtypeStruct(p_inc.shape, dtype)
    nbytes = p_inc.size * jnp.dtype(dtype).itemsize
    return pl.pallas_call(
        functools.partial(_tail2_bwd_kernel, f0, f1, dxprod),
        out_shape=(s,) * 7,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(7)
        ),
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(120 * 1024 * 1024,
                                 max(48 * 1024 * 1024, 20 * nbytes)),
        ),
    )(p_inc, vel_s2[0], vel_s2[1], h[0], h[1], bma[0], bma[1], *cts)


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

    variant = _variant(p_inc.shape, dtype)

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
        beta_arr = jnp.stack([jnp.asarray(beta_, dtype)])
        if variant == "tiled":
            tile = _bridge_tile(plane, jnp.dtype(dtype).itemsize)
            outs = _bridge1_tiled_call(f0, f1, dxprod, dtype, tile, ops,
                                       beta_arr)
        else:
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
            )(*ops, beta_arr)
        v0, v1, h0, h1, hdiv = outs
        return (v0, v1), (h0, h1), hdiv

    def _fwd(beta_, p_inc, vel_star, bma, st_c, st_lo, st_hi, diag_A):
        out = _bridge(beta_, p_inc, vel_star, bma, st_c, st_lo, st_hi,
                      diag_A)
        return out, (beta_, p_inc, vel_star, bma, st_c, st_lo, st_hi,
                     diag_A)

    def _bwd(res, ct):
        beta_, p_inc, vel_star, bma, st_c, st_lo, st_hi, diag_A = res
        if _bwd_variant(p_inc.shape, dtype) == "mono":
            # r5 fused VJP: ONE launch recomputes the chain and emits every
            # input cotangent (the jax.vjp path re-ran the chain in XLA
            # twice — linearization + transpose)
            (cv, chh, cdiv) = ct
            primal_ops = (
                p_inc, vel_star[0], vel_star[1], bma[0], bma[1],
                st_c[0], st_lo[0][0], st_hi[0][0], st_lo[0][1], st_hi[0][1],
                st_c[1], st_lo[1][0], st_hi[1][0], st_lo[1][1], st_hi[1][1],
                diag_A[0], diag_A[1],
            )
            beta_arr = jnp.stack([jnp.asarray(beta_, dtype)])
            o = _bridge1_bwd_call(
                f0, f1, dxprod, dtype, primal_ops, beta_arr,
                (cv[0], cv[1], chh[0], chh[1], cdiv),
            )
            (ob, op, ov0, ov1, ob0, ob1,
             oc0, ol00, oh00, ol01, oh01,
             oc1, ol10, oh10, ol11, oh11, odA0, odA1) = o
            return (
                jnp.reshape(ob[0], jnp.shape(beta_)), op, (ov0, ov1),
                (ob0, ob1), (oc0, oc1),
                ((ol00, ol01), (ol10, ol11)),
                ((oh00, oh01), (oh10, oh11)),
                (odA0, odA1),
            )
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

    variant = _variant(p_inc.shape, dtype)

    @jax.custom_vjp
    def _tail(p_inc, vel_s2, h, bma):
        s = jax.ShapeDtypeStruct(p_inc.shape, dtype)
        nbytes = p_inc.size * jnp.dtype(dtype).itemsize
        if variant == "tiled":
            tile = _bridge_tile(p_inc.shape, jnp.dtype(dtype).itemsize)
            return _tail2_tiled_call(f0, f1, dxprod, dtype, tile, p_inc,
                                     vel_s2, h, bma)
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
        p_inc_, vel_s2_, h_, bma_ = res
        if _bwd_variant(p_inc_.shape, dtype) == "mono":
            o = _tail2_bwd_call(f0, f1, dxprod, dtype, p_inc_, vel_s2_, h_,
                                bma_, (ct[0], ct[1]))
            op, ov0, ov1, oh0, oh1, ob0, ob1 = o
            return op, (ov0, ov1), (oh0, oh1), (ob0, ob1)
        _, vjp = jax.vjp(jnp_impl, *res)
        return vjp(ct)

    _tail.defvjp(_fwd, _bwd)
    return _tail(p_inc, vel_s2, h, bma)
