"""Per-shard Pallas solver kernels under shard_map — multi-chip keeps the
whole-solve speedups.

Until r3, every spatially-sharded trace ran all-XLA (`no_pallas()`): GSPMD
cannot partition an opaque `pallas_call`, so the whole-solve kernels that
took single-chip 512^2 from 2634 to 6395 fwd steps/s simply did not exist
on a mesh. This module restores them the way SURVEY.md par.5 prescribes:
the solver loops live in ONE `jax.shard_map` region per solve, where
collectives are explicit —

  * halo traffic: one `lax.ppermute` edge sliver per sharded axis per
    direction between kernel launches (ICI nearest-neighbor),
  * scalar rendezvous: `psum`/`pmax` for dot products and convergence
    norms (the distributed replacement for the reference's cuBLAS global
    dots, pressure_solve_op.cu.cc:291-356),

and the per-shard compute runs as Pallas kernels with the local block and
all stencil planes VMEM-resident — the shard-local twin of the single-chip
whole-solve family (solvers/pallas_krylov.py).

Momentum (advection) solve: the system is diagonally dominant by
beta = prod(dx)/dt, so each outer trip runs ONE launch per component that
(a) measures the true residual against fresh halo slivers and (b) chains
up to k Jacobi sweeps with PER-SWEEP exit and the halo FROZEN at the
exchanged value — additive block-Jacobi across shards, which inherits
plain Jacobi's contraction on the dominant interior and lags only the
shard-boundary error by one trip. The outer loop exits on the measured
entry residual: the converged trip ran zero sweeps, so its measurement is
the EXACT max|b - A x| of the returned iterate (warm-started solves cost
ONE measure-only launch per component).

Pressure solve: the r4 per-iteration phase PCG — matvec + update phase
launches, the rank-one all-Neumann shift closed through scalars
(S = psum(sum p), p.q corrected by shift*S^2, r by alpha*shift*S), LAGGED
mean deflation (pallas_krylov._pcg3_xr_kernel's treatment), and the
matmul-eigenbasis preconditioner as distributed contractions +
psum_scatter (parallel/halo.py _local_spectral_precond). Its matvec is
EXACT every iteration (fresh ppermute slivers) — which is why it beat the
r5 whole-solve block-Jacobi tier below on cut axes.

r5 whole-solve tier (VERDICT r4 item 1 — MEASURED NEGATIVE on cut axes,
kept behind DIFFPISO_SHARD_PCG2=always): per round, each shard solves its
halo-frozen diagonal block in ONE pcg2-style launch (whole local PCG,
per-shard eigendecomposed 1-D block preconditioners, bf16x3 HIGH), one
global measure verifies, stagnation falls through to the phase PCG. At
turb512 p_tol 1e-8 on the forced-sliver (1,1) mesh the halo-frozen rounds
contract the cut-boundary error only ~4x/round: pressure iters went
[1.27,1.005] -> [6.87,5.07] and fwd 3110 -> 1742
(runs/ab_shard_kernels_r5.log). `auto` therefore engages it only when NO
axis is cut (all live-roll — where it is pcg2-equivalent).

Extent-1 mesh axes (r5): an axis whose mesh extent is 1 is not actually
partitioned — slivers on it would be identity ppermutes feeding the
shard's OWN edge rows, frozen one trip stale. Such axes use live
in-kernel rolls (exact AND faster: no collectives, no outer-round lag for
their coupling); an ALL-extent-1 mesh takes a fast path in
sharded_solvers() that keeps the full single-chip kernel program.
DIFFPISO_SHARD_FORCE_SLIVERS=1 forces the frozen-sliver program for A/B
honesty: on the single-chip (1,1) mesh that measures the REAL
multi-device program structure (still exact — the self-slivers are the
true wrap rows, converged through the outer trips).

Measured decomposition of the sharded-vs-plain gap ((1,1) mesh, turb512,
runs/ab_gap_decomp.log): plain 6532/1535 (fwd/grad30); plain with the
FV/corrector/unmasked-assembly glue kernels OFF 5897/1485 (-10% — the
no_pallas() glue share); sharded live-roll structure 3574/1041 — the
remaining ~40% is the solver trip/launch structure + the assembly/stencil
kernels GSPMD cannot partition. Real multi-chip meshes buy back the
structure cost with N-way compute; the (1,1) case now bypasses it
entirely (fast path).

Shapes: shard_map needs mesh-divisible global dims. Staggered momentum
components carry +1 faces on bounded axes; they are ZERO-padded to
divisible here — a zero stencil row with zero rhs has residual identically
0 and never couples (boundary rows' roll-wrap coefficients are zero by
construction), so padding is exact, not approximate. The pressure path
requires divisible planes outright (the rank-one shift and deflation sums
would need in-kernel index masks under padding); non-divisible pressure
shapes fall back to the GSPMD jnp path, as does everything when the
context below is not active.

Usage: trace the step inside `sharded_solvers(mesh, axis_names)`; the
solver impls in solvers/base.py consult `current()` and dispatch here.
The context also enters `no_pallas()` for the REST of the trace (assembly,
FV, correctors stay GSPMD-partitioned jnp).
"""

from __future__ import annotations

import contextlib
import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    _PALLAS_AVAILABLE = False

# tests flip this to run the exact production kernels on the CPU mesh
_INTERPRET = False


def _roll(x, shift, axis):
    return pltpu.roll(x, shift % x.shape[axis], axis)


# -- context -------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ShardedSolveCtx:
    mesh: Mesh
    # mesh-axis name per trailing spatial dim (None = that dim is local)
    axis_names: Tuple[Optional[str], ...]
    # momentum accelerator knobs (mirror DIFFPISO_ADV_JACOBI_K / max_launches)
    k_sweeps: int = 4
    max_trips: int = 9
    # pressure whole-solve tier: block-Jacobi rounds before the Krylov
    # fall-through (each round = one local-solve launch + one halo trip)
    max_rounds: int = 4

    @property
    def extents(self):
        return tuple(
            self.mesh.shape[a] if a is not None else 1 for a in self.axis_names
        )


_CTX: list = []


@contextlib.contextmanager
def sharded_solvers(mesh: Mesh, axis_names: Sequence[Optional[str]],
                    k_sweeps: int = 4, max_trips: int = 9,
                    max_rounds: int = 4):
    """Trace-time context: PISO solves dispatch to the per-shard kernel
    solvers in this module; everything else traces under no_pallas() (the
    GSPMD-partitionable roll/reduction formulation). Enter INSIDE the jit
    body, around the region being traced — same trace-time discipline as
    no_pallas()/batched_safe_pallas() (ops/pallas_stencil.py).

    TRIVIAL mesh fast path (r5): when every mesh axis has extent 1 the
    trace is not actually partitioned — the correct program for that
    \"mesh\" is the plain single-chip one (whole-solve jac2/pcg2 + fused
    assembly/FV/corrector kernels), so the context becomes a no-op and the
    trace keeps ALL kernels (measured: the r4 sharded structure cost 3110
    vs plain 6418 fwd at turb512 on the (1,1) mesh,
    runs/ab_shard_kernels_r5.log). DIFFPISO_SHARD_FORCE_SLIVERS=1
    suppresses the fast path — the honest structural proxy for a real
    multi-device mesh."""
    from diffpiso_tpu.ops.pallas_stencil import no_pallas

    if all(
        e == 1 for e in mesh.shape.values()
    ) and not _force_slivers():
        yield None
        return

    ctx = ShardedSolveCtx(mesh, tuple(axis_names), k_sweeps, max_trips,
                          max_rounds)
    _CTX.append(ctx)
    try:
        with no_pallas():
            yield ctx
    finally:
        _CTX.pop()


def current() -> Optional[ShardedSolveCtx]:
    return _CTX[-1] if _CTX else None


def kernels_available() -> bool:
    """The per-shard kernels lower on TPU and run in interpret mode on the
    CPU test mesh (with the _roll monkeypatch, like every kernel suite)."""
    if not _PALLAS_AVAILABLE:
        return False
    return _INTERPRET or jax.default_backend() == "tpu"


def _force_slivers() -> bool:
    import os

    return os.environ.get("DIFFPISO_SHARD_FORCE_SLIVERS", "0") == "1"


def _active_axes(ctx: ShardedSolveCtx):
    """(axis_names_active, sharded): per spatial axis, the mesh-axis name to
    exchange halos over and whether the kernels treat it as sharded. Extent-1
    axes are LOCAL (live in-kernel rolls — exact, no collectives) unless
    DIFFPISO_SHARD_FORCE_SLIVERS=1 forces the frozen-sliver program (the
    single-chip A/B proxy for real multi-device structure)."""
    force = _force_slivers()
    names, sharded = [], []
    for a, e in zip(ctx.axis_names, ctx.extents):
        on = a is not None and (e > 1 or force)
        names.append(a if on else None)
        sharded.append(on)
    return tuple(names), tuple(sharded)


# -- halo sliver exchange -------------------------------------------------------------


def _perm(n: int, forward: bool):
    if forward:
        return [(i, (i + 1) % n) for i in range(n)]
    return [((i + 1) % n, i) for i in range(n)]


def _exchange(x, axis: int, name: str):
    """(up, dn) halo slivers for a block-sharded axis: `up` is the
    up-neighbor's LAST plane (feeds roll(x, +1)), `dn` the down-neighbor's
    FIRST plane (feeds roll(x, -1)). Cyclic — the global wrap edge carries
    either true periodic data or data that multiplies a zero boundary
    coefficient (bounded axes), exactly like the single-chip roll trick."""
    n = jax.lax.psum(1, name)
    last = jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)
    first = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    up = jax.lax.ppermute(last, name, _perm(n, True))
    dn = jax.lax.ppermute(first, name, _perm(n, False))
    return up, dn


# -- in-kernel halo-aware 5-point matvec ----------------------------------------------
# sliver layout per sharded axis ax (in axis order):
#   forward:   [up_x, dn_x]
#   transpose: [up_x, dn_x, up_hi, dn_lo]   (hi/lo coefficient slivers:
#              roll(lo*x, -1, ax) needs the dn-neighbor's first lo*x row,
#              roll(hi*x, +1, ax) the up-neighbor's last hi*x row)


def _mk_mv(sharded: Tuple[bool, bool], transpose: bool):
    """Returns mv(c, ly, hy, lx, hx, x, slv, frozen) computing S x (or
    S^T x) on a local block; slv is the flat sliver list; frozen=False
    zeroes the sliver contributions (the delta matvec of maintained
    -residual sweeps: a local update has no neighbor component)."""

    def take(slv, i, frozen):
        s = slv[i]
        return s if frozen else jnp.zeros_like(s)

    def mv(c, ly, hy, lx, hx, x, slv, frozen):
        i = 0
        if not transpose:
            if sharded[0]:
                up = take(slv, i, frozen)
                dn = take(slv, i + 1, frozen)
                i += 2
                xm0 = jnp.concatenate([up, x[:-1, :]], 0)
                xp0 = jnp.concatenate([x[1:, :], dn], 0)
            else:
                xm0 = _roll(x, 1, 0)
                xp0 = _roll(x, -1, 0)
            if sharded[1]:
                lf = take(slv, i, frozen)
                rt = take(slv, i + 1, frozen)
                i += 2
                xm1 = jnp.concatenate([lf, x[:, :-1]], 1)
                xp1 = jnp.concatenate([x[:, 1:], rt], 1)
            else:
                xm1 = _roll(x, 1, 1)
                xp1 = _roll(x, -1, 1)
            return c * x + ly * xm0 + hy * xp0 + lx * xm1 + hx * xp1
        # transpose: z = c x + roll(ly x, -1, 0) + roll(hy x, +1, 0) + ...
        z = c * x
        a0 = ly * x
        b0 = hy * x
        if sharded[0]:
            up_x = take(slv, i, frozen)
            dn_x = take(slv, i + 1, frozen)
            up_hy = slv[i + 2]
            dn_ly = slv[i + 3]
            i += 4
            z = z + jnp.concatenate([a0[1:, :], dn_ly * dn_x], 0)
            z = z + jnp.concatenate([up_hy * up_x, b0[:-1, :]], 0)
        else:
            z = z + _roll(a0, -1, 0) + _roll(b0, 1, 0)
        a1 = lx * x
        b1 = hx * x
        if sharded[1]:
            lf_x = take(slv, i, frozen)
            rt_x = take(slv, i + 1, frozen)
            lf_hx = slv[i + 2]
            rt_lx = slv[i + 3]
            i += 4
            z = z + jnp.concatenate([a1[:, 1:], rt_lx * rt_x], 1)
            z = z + jnp.concatenate([lf_hx * lf_x, b1[:, :-1]], 1)
        else:
            z = z + _roll(a1, -1, 1) + _roll(b1, 1, 1)
        return z

    return mv


def _n_slivers(sharded, transpose):
    per_axis = 4 if transpose else 2
    return per_axis * sum(sharded)


def _sliver_values(x, stencil_planes, axis_names, transpose):
    """Exchanged sliver list matching _mk_mv's layout. stencil_planes =
    (c, ly, hy, lx, hx); coefficient slivers are loop-invariant but cheap
    (one edge row each), so they ride the same exchange for simplicity."""
    _, ly, hy, lx, hx = stencil_planes
    lo = (ly, lx)
    hi = (hy, hx)
    slv = []
    for ax, name in enumerate(axis_names):
        if name is None:
            continue
        up_x, dn_x = _exchange(x, ax, name)
        slv += [up_x, dn_x]
        if transpose:
            up_hi, _ = _exchange(hi[ax], ax, name)
            _, dn_lo = _exchange(lo[ax], ax, name)
            slv += [up_hi, dn_lo]
    return slv


# -- momentum: measure + k frozen-halo Jacobi sweeps (one launch) --------------------


def _mk_momentum_kernel(transpose, sharded, k):
    mv = _mk_mv(sharded, transpose)
    ns = _n_slivers(sharded, transpose)

    def kernel(*refs):
        c, ly, hy, lx, hx, b, x = (r[:] for r in refs[:7])
        slv = [r[:] for r in refs[7:7 + ns]]
        sgn, tol = refs[7 + ns][0], refs[7 + ns][1]
        out_x, out_n, r_s = refs[8 + ns], refs[9 + ns], refs[10 + ns]

        def A(v, frozen):
            return sgn * mv(c, ly, hy, lx, hx, v, slv, frozen)

        out_x[:] = x
        r_s[:] = b - A(x, True)
        n0 = jnp.max(jnp.abs(r_s[:]))
        out_n[0] = n0
        d = sgn * c
        iv = jnp.where(jnp.abs(d) > 1e-30, 1.0 / d, 1.0)

        # maintained-residual sweeps with PER-SWEEP exit (jac2's
        # discipline): a trip whose ENTRY measure already passes tol runs
        # ZERO sweeps (the n0 >= tol guard), so its launch is measure-only
        # and the reported norm is EXACT — the outer trip loop exits on it
        # without a closing launch. Trips that do sweep drive the
        # maintained norm an order PAST tol: the frozen-halo maintained
        # residual UNDERESTIMATES the true boundary error by the sliver
        # lag, and exiting exactly at tol limit-cycles one trip above it
        # (caught by runs/check_shard_kernels.py). x rides the output
        # window, r a VMEM scratch (jac13d's ref-resident-state lesson:
        # scalar-only while carries).
        tol_in = 0.1 * tol

        def cond(carry):
            j, n = carry
            return (j < k) & (n >= tol_in) & (n0 >= tol)

        def body(carry):
            j, n = carry
            dlt = iv * r_s[:]
            out_x[:] = out_x[:] + dlt
            rn = r_s[:] - A(dlt, False)
            r_s[:] = rn
            return j + 1, jnp.max(jnp.abs(rn))

        jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), n0))

    return kernel


def _momentum_launch(stencil_planes, b, x, slv, sgn, tol, transpose, sharded,
                     k):
    kernel = _mk_momentum_kernel(transpose, sharded, k)
    vmem = [pl.BlockSpec(memory_space=pltpu.VMEM)] * (7 + len(slv))
    nbytes = b.size * jnp.dtype(b.dtype).itemsize
    xo, n = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(b.shape, b.dtype),
            jax.ShapeDtypeStruct((1,), b.dtype),
        ),
        in_specs=vmem + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[pltpu.VMEM(b.shape, b.dtype)],
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            # 7 planes + slivers + x/r/delta temps; mirror the jac1 ceiling
            vmem_limit_bytes=min(120 * 1024 * 1024,
                                 max(48 * 1024 * 1024, 20 * nbytes)),
        ),
    )(*stencil_planes, b, x, *slv,
      jnp.stack([jnp.asarray(sgn, b.dtype), jnp.asarray(tol, b.dtype)]))
    return xo, n[0]


def _pad_to(a, extents):
    pads = [(0, (-s) % e) for s, e in zip(a.shape, extents)]
    return jnp.pad(a, pads) if any(p != (0, 0) for p in pads) else a


def sharded_momentum_solve(ctx: ShardedSolveCtx, st_cs, b_c, x_c, sgn,
                           transpose, tol):
    """Whole momentum Jacobi-Richardson solve on the mesh: per component,
    one shard_map region runs [halo exchange -> measure+k-sweep launch]
    trips until the measured entry residual passes tol (the converged trip
    ran zero sweeps, so that measurement is exact for the returned
    iterate).
    st_cs = [(c, lo, hi)] per component (GLOBAL planes), b_c/x_c global
    component arrays. Returns (x_components, joint_true_residual_norm).

    Bounded +1 faces are zero-padded to mesh-divisible shapes (exact: zero
    stencil rows with zero rhs stay at residual 0 and decouple)."""
    axis_names = ctx.axis_names
    active_names, sharded = _active_axes(ctx)
    mesh_axes = tuple(a for a in axis_names if a is not None)
    spec = P(*axis_names)
    k = ctx.k_sweeps
    max_trips = ctx.max_trips

    def body(c, ly, hy, lx, hx, b, x, sc):
        planes = (c, ly, hy, lx, hx)
        sgn_, tol_ = sc[0], sc[1]

        def pmax(v):
            for name in mesh_axes:
                v = jax.lax.pmax(v, name)
            return v

        def cond(state):
            _, n, t = state
            return (n > tol_) & (t < max_trips)

        def trip(state):
            x, _, t = state
            slv = _sliver_values(x, planes, active_names, transpose)
            x, n_entry = _momentum_launch(
                planes, b, x, slv, sgn_, tol_, transpose, sharded, k
            )
            return x, pmax(n_entry), t + 1

        dtype = b.dtype
        # exit-by-convergence returns an EXACT norm: the converged trip
        # measured n0 <= tol with fresh slivers and ran zero sweeps (per
        # -sweep in-kernel exit), so x is unchanged by it — no closing
        # launch needed. Exit-by-max_trips reports the (stale-high) entry
        # norm of the last trip, which conservatively routes to the
        # BiCGSTAB fallback in solvers/base.py.
        x, n, _ = jax.lax.while_loop(
            cond, trip, (x, jnp.asarray(jnp.inf, dtype),
                         jnp.zeros((), jnp.int32)))
        return x, n

    shard_fn = jax.shard_map(
        body, mesh=ctx.mesh,
        in_specs=(spec,) * 7 + (P(),),
        out_specs=(spec, P()),
        check_vma=False,
    )

    outs = []
    norm = None
    for (c, lo, hi), b, x in zip(st_cs, b_c, x_c):
        true_shape = b.shape
        ext = ctx.extents
        args = [
            _pad_to(a, ext) for a in (c, lo[0], hi[0], lo[1], hi[1], b, x)
        ]
        sc = jnp.stack([jnp.asarray(sgn, b.dtype), jnp.asarray(tol, b.dtype)])
        xo, n = shard_fn(*args, sc)
        xo = xo[tuple(slice(0, s) for s in true_shape)]
        outs.append(xo)
        norm = n if norm is None else jnp.maximum(norm, n)
    return tuple(outs), norm


def _adjoint_mode_ok(transpose_or_adjoint: bool) -> bool:
    """ADJOINT solves keep the GSPMD jnp path by default: measured on the
    (1,1) mesh at turb512 (runs/ab_shard_attr.log, 2 reps each), the
    kernel trips LOSE in the adjoint — grad30 never 860 vs momentum-only
    769 (-11%), pressure-only 649 (-25%), both 551 (-36%) — because
    adjoint solves are cold (more trips/iterations, each paying launch +
    collective glue) and the lagged in-kernel deflation costs ~0.5 extra
    iterations per pressure solve. Forward solves win (+40% fwd, same
    log). DIFFPISO_SHARDED_KERNELS_ADJ=auto re-enables for re-measurement."""
    import os

    if not transpose_or_adjoint:
        return True
    return os.environ.get("DIFFPISO_SHARDED_KERNELS_ADJ", "never") == "auto"


def momentum_eligible(ctx: ShardedSolveCtx, shapes, dtype,
                      transpose: bool = False) -> bool:
    """Per-shard momentum kernel gate: rank-2 f32 components whose padded
    per-shard blocks fit the jac1-style 20-plane ceiling; forward solves
    only by default (_adjoint_mode_ok).
    DIFFPISO_SHARDED_KERNELS: auto | never | momentum | pressure (the last
    two enable ONE family — attribution A/Bs)."""
    import os

    if os.environ.get("DIFFPISO_SHARDED_KERNELS", "auto") not in (
        "auto", "momentum",
    ):
        return False
    if not _adjoint_mode_ok(transpose):
        return False
    if not kernels_available():
        return False
    if len(ctx.axis_names) != 2:
        return False
    if any(len(s) != 2 for s in shapes):
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if itemsize > 4:
        return False
    for s in shapes:
        padded = [si + ((-si) % e) for si, e in zip(s, ctx.extents)]
        local = padded[0] // ctx.extents[0] * (padded[1] // ctx.extents[1])
        if 20 * local * itemsize > 120 * 1024 * 1024:
            return False
    return True


# -- pressure: distributed PCG with per-shard kernel phases --------------------------


def _mk_pcg_matvec_kernel(sharded):
    mv = _mk_mv(sharded, transpose=False)
    ns = _n_slivers(sharded, False)

    def kernel(*refs):
        c, ly, hy, lx, hx, p = (r[:] for r in refs[:6])
        slv = [r[:] for r in refs[6:6 + ns]]
        out_q, out_pq, out_sp = refs[6 + ns:9 + ns]
        q0 = mv(c, ly, hy, lx, hx, p, slv, True)
        out_q[:] = q0
        out_pq[0] = jnp.sum(p * q0)
        out_sp[0] = jnp.sum(p)

    return kernel


def _mk_pcg_update_kernel():
    def kernel(x, r, p, q0, sc, out_x, out_r, out_n, out_sr):
        # sc = (alpha, cs, cbar): cs = alpha*shift*S (the rank-one shift's
        # contribution to q), cbar = LAGGED deflation constant (previous
        # iteration's measured mean of r — pallas_krylov._pcg3_xr_kernel's
        # documented treatment)
        alpha, cs, cbar = sc[0], sc[1], sc[2]
        xn = x[:] + alpha * p[:]
        rn = r[:] - alpha * q0[:] - cs - cbar
        out_x[:] = xn
        out_r[:] = rn
        out_n[0] = jnp.max(jnp.abs(rn))
        out_sr[0] = jnp.sum(rn)

    return kernel


def _pcg_matvec_launch(planes, p, slv, sharded):
    vmem = [pl.BlockSpec(memory_space=pltpu.VMEM)] * (6 + len(slv))
    q, pq, sp = pl.pallas_call(
        _mk_pcg_matvec_kernel(sharded),
        out_shape=(
            jax.ShapeDtypeStruct(p.shape, p.dtype),
            jax.ShapeDtypeStruct((1,), p.dtype),
            jax.ShapeDtypeStruct((1,), p.dtype),
        ),
        in_specs=vmem,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=_INTERPRET,
    )(*planes, p, *slv)
    return q, pq[0], sp[0]


def _pcg_update_launch(x, r, p, q0, alpha, cs, cbar):
    sc = jnp.stack([jnp.asarray(v, x.dtype) for v in (alpha, cs, cbar)])
    s = jax.ShapeDtypeStruct(x.shape, x.dtype)
    one = jax.ShapeDtypeStruct((1,), x.dtype)
    xo, ro, n, sr = pl.pallas_call(
        _mk_pcg_update_kernel(),
        out_shape=(s, s, one, one),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=_INTERPRET,
    )(x, r, p, q0, sc)
    return xo, ro, n[0], sr[0]


# -- pressure whole-solve tier: block-Jacobi rounds with exact local solves ----------
# (r5, VERDICT r4 item 1) Each trip runs ONE launch per shard: measure the
# TRUE global residual against fresh slivers, then solve the halo-frozen
# diagonal block A_loc d = r exactly with a whole local PCG — the
# shard-local twin of pallas_krylov.fused_pcg2_solve (in-body eigenbasis
# preconditioner, bf16x3 HIGH contractions, per-iteration exit). Warm
# production solves (~1 recurrence iteration single-chip) finish in one
# round + one measure-only round; cold solves whose rounds stagnate
# (smooth global error a local solve cannot see) fall through to the r4
# per-iteration phase PCG, warm-started from the tier's iterate.


def _local_basis(kind: str, n: int, extent: int, cut: bool):
    """Host-side per-shard eigendecomposition of the 1-D operator's
    diagonal blocks. `cut=False` (axis not treated as sharded — live
    in-kernel rolls): the analytic global basis/eigs, leading dim 1.
    `cut=True`: reconstruct the dense 1-D operator T = V^T diag(eigs) V
    from the kind's analytic basis (provably consistent with the assembled
    stencil), drop every coupling that crosses a shard boundary (mask to
    the tridiagonal — this also removes the periodic wrap corners, which
    ride ppermute slivers at runtime), slice the `extent` diagonal blocks
    and eigh each. Cut blocks are strictly negative definite (the cut rows
    keep their full diagonal, so they are strictly dominant) — the local
    symbol needs no singular-mode guard except in the all-uncut case."""
    from diffpiso_tpu.solvers.fourier import _BASIS, _eigs

    if not cut:
        return _BASIS[kind](n)[None], _eigs(n, kind)[None]
    Vg = _BASIS[kind](n)
    wg = _eigs(n, kind)
    T = Vg.T @ (wg[:, None] * Vg)
    i = np.arange(n)
    T = np.where(np.abs(i[:, None] - i[None, :]) <= 1, T, 0.0)
    m = n // extent
    Vs, ws = [], []
    for s in range(extent):
        w, Q = np.linalg.eigh(T[s * m:(s + 1) * m, s * m:(s + 1) * m])
        Vs.append(Q.T)
        ws.append(w)
    return np.stack(Vs), np.stack(ws)


def _whole_tier_ok(mm_solver, shape, extents, dtype, sharded) -> bool:
    """Gate for the whole-solve block-Jacobi tier (DIFFPISO_SHARD_PCG2:
    auto | always | never). MEASURED NEGATIVE on actually-cut axes
    (runs/ab_shard_kernels_r5.log, forced-sliver (1,1) mesh at turb512
    p_tol 1e-8): pressure iters blew up [1.27,1.005] -> [6.87,5.07] and
    fwd fell 3110 -> 1742 vs the r4 phase path — halo-frozen block-Jacobi
    contracts the cut-boundary error only ~4x per round, while the phase
    PCG's matvec is EXACT every iteration (fresh ppermute slivers), so at
    tight tolerances exact-Krylov-with-launch-glue beats
    few-launch-stationary-rounds. `auto` therefore engages ONLY when no
    axis is cut (every axis live-roll — the trivial-mesh/pcg2-equivalent
    regime); `always` forces cut-axis engagement for re-measurement.
    Also needs the matmul-eigenbasis preconditioner family (the local
    blocks inherit its separable structure), sublane/lane-aligned local
    blocks, and pcg2-class VMEM residency on the LOCAL block
    (DIFFPISO_SHARD_PCG2_MIB, default 24)."""
    import os

    mode = os.environ.get("DIFFPISO_SHARD_PCG2", "auto")
    if mode == "never":
        return False
    if mode != "always" and any(sharded):
        return False
    if mm_solver is None:
        return False
    if any(k not in ("fourier", "dct2", "dct4") for k in mm_solver.kinds):
        return False
    m = [s // e for s, e in zip(shape, extents)]
    if not _INTERPRET and not (m[0] % 8 == 0 and m[1] % 128 == 0):
        return False
    from diffpiso_tpu.solvers.pallas_krylov import _pcg2_plane_bytes

    budget = int(os.environ.get("DIFFPISO_SHARD_PCG2_MIB", "24"))
    return _pcg2_plane_bytes(tuple(m), dtype) <= budget * 1024 * 1024


def _mk_pressure_whole_kernel(sharded, deflate_global, max_iter, precision):
    """measure + whole local PCG solve in ONE launch (the momentum
    kernel's measure+sweep discipline): entry residual r0 = b - A_global x
    with FRESH slivers (exact — S0 = psum'd global sum closes the rank-one
    shift), then CG on the halo-frozen diagonal block A_loc d = r0 - cbar
    with the per-shard eigenbasis as M^-1. The in-kernel `n0 >= tol` gate
    means a globally-converged trip runs ZERO iterations on every shard
    (every local n0 <= the global pmax), so x is unchanged and the
    reported entry norm is exact for the returned iterate."""
    from diffpiso_tpu.solvers.pallas_krylov import (
        _bf16x3_dot,
        _dot,
        _mosaic_precision,
    )

    mv = _mk_mv(sharded, transpose=False)
    ns = _n_slivers(sharded, False)

    def kernel(*refs):
        c, ly, hy, lx, hx, b, x = (r[:] for r in refs[:7])
        slv = [r[:] for r in refs[7:7 + ns]]
        sc = refs[7 + ns]
        v0, v1, sym = (r[:] for r in refs[8 + ns:11 + ns])
        out_x, out_n, out_sr, out_k = refs[11 + ns:]
        shift, S0 = sc[0], sc[1]
        tol, tol_in, cbar = sc[2], sc[3], sc[4]
        dtype = b.dtype
        eps = jnp.asarray(1e-30, dtype)
        nsize = jnp.asarray(b.size, dtype)

        r0 = b - (mv(c, ly, hy, lx, hx, x, slv, True) + shift * S0)
        out_sr[0] = jnp.sum(r0)
        rhs = r0 - cbar
        if deflate_global:
            # all axes uncut (the (1,1)-mesh live-roll case): the local sum
            # IS the global sum — exact in-kernel deflation, cbar rides 0
            rhs = rhs - jnp.sum(rhs) / nsize
        n0 = jnp.max(jnp.abs(rhs))
        out_n[0] = n0

        def A_loc(p):
            # frozen=False zeroes the sliver contributions: exactly the
            # halo-frozen diagonal block (uncut axes keep live rolls); the
            # rank-one shift's diagonal block is shift * 1_loc 1_loc^T
            return mv(c, ly, hy, lx, hx, p, slv, False) + shift * jnp.sum(p)

        if precision == jax.lax.Precision.HIGH and not _INTERPRET:
            v0_hi = v0.astype(jnp.bfloat16)
            v0_lo = (v0 - v0_hi.astype(v0.dtype)).astype(jnp.bfloat16)
            v1_hi = v1.astype(jnp.bfloat16)
            v1_lo = (v1 - v1_hi.astype(v1.dtype)).astype(jnp.bfloat16)

            def minv(r):
                h = _bf16x3_dot(v0_hi, v0_lo, r, ((1,), (0,)), True)
                h = _bf16x3_dot(v1_hi, v1_lo, h, ((1,), (1,)), False)
                h = h / sym
                h = _bf16x3_dot(v0_hi, v0_lo, h, ((0,), (0,)), True)
                return _bf16x3_dot(v1_hi, v1_lo, h, ((1,), (0,)), False)
        else:
            mp = _mosaic_precision(precision)

            def minv(r):
                h = _dot(v0, r, ((1,), (0,)), mp)
                h = _dot(h, v1, ((1,), (1,)), mp)
                h = h / sym
                h = _dot(v0, h, ((0,), (0,)), mp)
                return _dot(h, v1, ((1,), (0,)), mp)

        def project(v):
            if not deflate_global:
                return v
            return v - jnp.sum(v) / nsize

        out_x[:] = x
        # d rides the output window (x + d accumulated in place), r a VMEM
        # view of the loop state — scalar-only while carries (the jac13d
        # ref-resident-state lesson)
        def cond(state):
            _, _, _, rn, k = state
            return (rn >= tol_in) & (n0 >= tol) & jnp.isfinite(rn) & (
                k < max_iter
            )

        def body(state):
            r, p, rz, rn, k = state
            z = minv(r)
            rz_new = jnp.sum(r * z)
            beta = jnp.where(jnp.abs(rz) > eps, rz_new / rz, 0.0)
            p = z + beta * p
            q = A_loc(p)
            pq = jnp.sum(p * q)
            alpha = jnp.where(jnp.abs(pq) > eps, rz_new / pq, 0.0)
            out_x[:] = out_x[:] + alpha * p
            r = project(r - alpha * q)
            return r, p, rz_new, jnp.max(jnp.abs(r)), k + 1

        _, _, _, _, k = jax.lax.while_loop(
            cond, body,
            (rhs, jnp.zeros_like(rhs), jnp.asarray(1.0, dtype), n0,
             jnp.zeros((), jnp.int32)),
        )
        out_k[0] = k

    return kernel


def _pressure_whole_launch(planes, b, x, slv, v0, v1, sym, sc, sharded,
                           deflate_global, max_iter, precision):
    kernel = _mk_pressure_whole_kernel(sharded, deflate_global,
                                       int(max_iter), precision)
    dtype = b.dtype
    nbytes = b.size * jnp.dtype(dtype).itemsize
    basis_bytes = (v0.size + v1.size) * jnp.dtype(dtype).itemsize
    vmem = [pl.BlockSpec(memory_space=pltpu.VMEM)] * (7 + len(slv))
    xo, n, sr, k = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(b.shape, dtype),
            jax.ShapeDtypeStruct((1,), dtype),
            jax.ShapeDtypeStruct((1,), dtype),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        in_specs=vmem + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            # pcg2's ceiling discipline on the LOCAL block: planes + bases
            # + the while-body stack margin (44 MiB measured for pcg2)
            vmem_limit_bytes=min(
                127 * 1024 * 1024,
                max(96 * 1024 * 1024,
                    16 * nbytes + basis_bytes + 44 * 1024 * 1024),
            ),
        ),
    )(*planes, b, x, *slv, sc, v0, v1, sym)
    return xo, n[0], sr[0], k[0]


def pressure_eligible(ctx: ShardedSolveCtx, shape, dtype,
                      precond_kind, adjoint: bool = False) -> bool:
    """Per-shard pressure PCG gate: rank-2 f32 planes exactly divisible by
    the mesh (the rank-one shift / deflation sums would need in-kernel
    index masks under padding — non-divisible shapes keep the GSPMD path)
    and a preconditioner the distributed contractions cover (None or the
    matmul-eigenbasis family)."""
    import os

    if os.environ.get("DIFFPISO_SHARDED_KERNELS", "auto") not in (
        "auto", "pressure",
    ):
        return False
    if not _adjoint_mode_ok(adjoint):
        return False
    if not kernels_available():
        return False
    if len(ctx.axis_names) != 2 or len(shape) != 2:
        return False
    if jnp.dtype(dtype).itemsize > 4:
        return False
    if precond_kind not in (None, "dct_mm", "fft_mm", "channel_mm"):
        return False
    return all(s % e == 0 for s, e in zip(shape, ctx.extents))


def sharded_pressure_pcg(ctx: ShardedSolveCtx, lap, b, x0, tol, max_iter,
                         deflate_mean, mm_solver=None, weights=None,
                         residual_reset: int = 0):
    """Distributed spectral PCG with per-shard Pallas phases. Semantics
    follow krylov.pcg with LAGGED in-loop deflation (exact deflation on
    entry and at each verification, like fused_pcg3_solve) plus
    fused_pcg2_solve's verify-and-resume rounds: the in-loop exit rides the
    recurrence residual, and each round re-measures the TRUE residual and
    restarts the recurrence from it (f32 recurrence drift exceeds tight
    tolerances on 256^2-class planes — measured on TPU,
    runs/check_shard_kernels_tpu.py). Returns (x, iterations,
    true_resid_norm)."""
    axis_names = ctx.axis_names
    active_names, sharded = _active_axes(ctx)
    mesh_axes = tuple(a for a in axis_names if a is not None)
    spec = P(*axis_names)
    ay, ax = axis_names
    dtype = b.dtype
    n_total = float(np.prod(b.shape))
    shift = jnp.asarray(lap.shift, dtype)
    cold = x0 is None
    if cold:
        x0 = jnp.zeros_like(b)

    pc_args, pc_specs = (), ()
    if mm_solver is not None:
        from diffpiso_tpu.parallel.halo import _spectral_constants

        mats, eigs = _spectral_constants(mm_solver.kinds, b.shape, dtype)
        Vy, Vx = mats
        ey, ex = eigs
        w0 = jnp.asarray(weights[0], dtype)
        w1 = jnp.asarray(weights[1], dtype)
        pc_args = (Vy, Vy, Vx, Vx, ey, ex, w0, w1)
        pc_specs = (
            P(None, ay), P(ay, None), P(None, ax), P(ax, None),
            P(ay), P(ax), P(), P(),
        )

    # whole-solve block-Jacobi tier (r5): per-shard local eigendecomposed
    # preconditioners, stacked over the mesh axis so each shard reads its
    # own block's basis (edge vs interior cut blocks differ)
    tier = _whole_tier_ok(mm_solver, b.shape, ctx.extents, dtype, sharded)
    tier_args, tier_specs = (), ()
    if tier:
        prec_static = mm_solver._precision()
        for d in range(2):
            Vs, Es = _local_basis(
                mm_solver.kinds[d], b.shape[d], ctx.extents[d], sharded[d]
            )
            lead = active_names[d]
            tier_args += (jnp.asarray(Vs, dtype), jnp.asarray(Es, dtype))
            tier_specs += (P(lead, None, None), P(lead, None))
    n_pc = len(pc_args)

    def inner(c, ly, hy, lx, hx, b, x0, sc, *rest):
        from diffpiso_tpu.parallel.halo import _local_spectral_precond

        pc = rest[:n_pc]
        planes = (c, ly, hy, lx, hx)
        shift_, tol_ = sc[0], sc[1]
        eps = jnp.asarray(1e-30, dtype)

        def gsum(v):
            for name in mesh_axes:
                v = jax.lax.psum(v, name)
            return v

        def gmax(v):
            for name in mesh_axes:
                v = jax.lax.pmax(v, name)
            return v

        def precondition(r):
            if mm_solver is None:
                return r
            Vyc, Vyr, Vxc, Vxr, ey_, ex_, w0_, w1_ = pc
            return _local_spectral_precond(
                r, Vyc, Vyr, Vxc, Vxr, ey_, ex_, w0_, w1_, ay, ax
            )

        def matvec_jnp(p):
            # one-time entry/verification matvec (kernel phases carry the
            # loop); slivers + local stencil, exact shift via psum
            slv = _sliver_values(p, planes, active_names, False)
            q0, pq0, sp = _pcg_matvec_launch(planes, p, slv, sharded)
            S = gsum(sp)
            return q0 + shift_ * S

        def project(r):
            if not deflate_mean:
                return r
            return r - gsum(jnp.sum(r)) / n_total

        def cond(state):
            _, _, _, _, rnorm, _, k, done = state
            return (~done) & (k < max_iter)

        def body(state):
            x, r, p, rz, rnorm, cbar, k, done = state
            # z = M^-1 (r - cbar): the lagged mean keeps the max|r| exit
            # test honest at the f32 reduction-leak level (pcg3 treatment)
            z = precondition(r - cbar)
            rz_new = gsum(jnp.sum(r * z))
            beta = jnp.where(jnp.abs(rz) > eps, rz_new / rz, 0.0)
            p = z + beta * p
            slv = _sliver_values(p, planes, active_names, False)
            q0, pq0, sp = _pcg_matvec_launch(planes, p, slv, sharded)
            S = gsum(sp)
            pq = gsum(pq0) + shift_ * S * S
            alpha = jnp.where(jnp.abs(pq) > eps, rz_new / pq, 0.0)
            cs = alpha * shift_ * S
            x, r, n_part, sr = _pcg_update_launch(x, r, p, q0, alpha, cs,
                                                  cbar)
            rnorm = gmax(n_part)
            defl = jnp.asarray(1.0 if deflate_mean else 0.0, dtype)
            cbar = defl * gsum(sr) / n_total
            done = (rnorm < tol_) | ~jnp.isfinite(rnorm)
            return (x, r, p, rz_new, rnorm, cbar, k + 1, done)

        def run_pcg(x_in, r_in, rnorm_in, k_in):
            # verify-and-resume rounds (fused_pcg2_solve's treatment): the
            # in-loop exit test rides the RECURRENCE residual, which drifts
            # from the true residual at f32 on large planes; each round
            # re-measures b - A x and restarts the recurrence from it until
            # the TRUE residual passes (or iterations/rounds run out)
            def round_cond(carry):
                _, _, rnorm, k, rounds = carry
                return (
                    (rnorm > tol_) & (k < max_iter) & (rounds < 4)
                    & jnp.isfinite(rnorm)
                )

            def round_body(carry):
                x, r, rnorm, k, rounds = carry
                init = (
                    x, r, jnp.zeros_like(b), jnp.asarray(1.0, dtype), rnorm,
                    jnp.zeros((), dtype), k, jnp.zeros((), bool),
                )
                x, _, _, _, _, _, k, _ = jax.lax.while_loop(cond, body, init)
                rt = project(b - matvec_jnp(x))
                return x, rt, gmax(jnp.max(jnp.abs(rt))), k, rounds + 1

            x, _, rnorm, k, _ = jax.lax.while_loop(
                round_cond, round_body,
                (x_in, r_in, rnorm_in, k_in, jnp.zeros((), jnp.int32)),
            )
            return x, rnorm, k

        if tier:
            V0s, E0s, V1s, E1s = rest[n_pc:]
            v0, e0 = V0s[0], E0s[0]
            v1, e1 = V1s[0], E1s[0]
            w0_, w1_ = pc[6], pc[7]
            sym = w0_ * e0[:, None] + w1_ * e1[None, :]
            # all-uncut singular modes (the separable null space) follow
            # the _safe_symbol convention: +inf so h/sym zeroes them; cut
            # blocks are strictly definite and never trip the guard
            sym = jnp.where(jnp.abs(sym) < 1e-12,
                            jnp.asarray(jnp.inf, dtype), sym)
            deflate_global = deflate_mean and not any(sharded)
            # deflation constant, EXACT per trip (no pcg3-style lag): for
            # the row-sum-zero (all-Neumann rank-deficient) stencils that
            # deflate_mean targets, mean(b - A x) = mean(b) - shift*sum(x)
            # — both psum'd scalars the trip already needs, so the entry
            # measure is the properly projected norm even on trip 1 (a
            # lagged cbar mis-measured warm entries by the residual's
            # constant offset and cost a spurious round)
            mean_b = gsum(jnp.sum(b)) / n_total if deflate_mean else None
            theta = jnp.asarray(0.25, dtype)

            def tier_cond(state):
                _, n, n_prev, t, _ = state
                first = t == 0
                # stop on stagnation (a round must contract the measured
                # entry norm by >= 4x or the smooth global error has taken
                # over — fall through to the Krylov path)
                go = (n >= tol_) & (n < theta * n_prev) & jnp.isfinite(n)
                return (first | go) & (t < ctx.max_rounds)

            def tier_trip(state):
                x, n, n_prev, t, k_acc = state
                slv = _sliver_values(x, planes, active_names, False)
                S0 = gsum(jnp.sum(x))
                cbar = (
                    mean_b - shift_ * S0 if deflate_mean
                    else jnp.zeros((), dtype)
                )
                scl = jnp.stack([
                    shift_, S0, tol_, 0.1 * tol_, cbar,
                ])
                xn, n_part, sr_part, k_loc = _pressure_whole_launch(
                    planes, b, x, slv, v0, v1, sym, scl, sharded,
                    deflate_global, max_iter, prec_static,
                )
                n_new = gmax(n_part)
                return xn, n_new, n, t + 1, k_acc + k_loc

            x1, n1, _, _, k_acc = jax.lax.while_loop(
                tier_cond, tier_trip,
                (x0, jnp.asarray(jnp.inf, dtype), jnp.asarray(jnp.inf, dtype),
                 jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)),
            )

            def finish(_):
                # exit-by-convergence: the converged trip measured its
                # entry norm with fresh slivers and ran zero iterations on
                # every shard (local n0 <= the global pmax < tol), so x1 is
                # unchanged by it — n1 is exact for the returned iterate
                return x1, n1, k_acc

            def fall(_):
                rt = project(b - matvec_jnp(x1))
                return run_pcg(x1, rt, gmax(jnp.max(jnp.abs(rt))), k_acc)

            return jax.lax.cond(n1 < tol_, finish, fall, None)

        r0 = project(b - matvec_jnp(x0))
        rnorm0 = gmax(jnp.max(jnp.abs(r0)))

        def skip(_):
            return x0, rnorm0, jnp.zeros((), jnp.int32)

        def run(_):
            return run_pcg(x0, r0, rnorm0, jnp.zeros((), jnp.int32))

        return jax.lax.cond(rnorm0 < tol_, skip, run, None)

    shard_fn = jax.shard_map(
        inner, mesh=ctx.mesh,
        in_specs=(spec,) * 7 + (P(),) + pc_specs + tier_specs,
        out_specs=(spec, P(), P()),
        check_vma=False,
    )
    sc = jnp.stack([shift, jnp.asarray(tol, dtype)])
    x, rnorm, k = shard_fn(
        lap.center, lap.lo[0], lap.hi[0], lap.lo[1], lap.hi[1], b, x0, sc,
        *pc_args, *tier_args,
    )
    return x, k, rnorm
