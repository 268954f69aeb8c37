"""Matrix-free variable-coefficient pressure Laplacian.

TPU-native re-design of the reference's `calcPISOLaplaceMatrix` CUDA kernel
(CUDAsrc/laplace_op.cu.cc:80-179) and the DIA-format banded matvec
`calcZ_v4` (CUDAsrc/pressure_solve_op.cu.cc:58-92). The operator acts on the
pressure increment; its per-face weights are the `advection_influence`
field 1/(beta - A) * dx_factor evaluated on staggered faces
(diffpiso/piso_tf.py:16-19,54).

Semantics replicated exactly:

  for each cell and each axis d, neighbor n in {lo, hi}:
    diag -= infl(face)   if not(active(n)==0 and accessible(n)==0)
                         and active(cell)!=0          (laplace_op.cu.cc:125-134)
    off(n) = infl(face)  if active(n)==1 and accessible(n)==1
                         and not(active(cell)==0 and accessible(cell)==0)
                                                       (laplace_op.cu.cc:140-177)

  rank-deficient (all-Neumann) case: solve (L + s * 1 1^T) instead, with
  s = 0.1 * sum|diag| / n                 (pressure_solve_op.cu.cc:161-172)

Periodic axes wrap naturally through jnp.roll in the matvec (the reference
appends periodic offsets to its DIA index table,
pressure_solve_op.cu.cc:117-133).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffpiso_tpu.fields.grid import StaggeredField


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LaplaceStencil:
    center: jax.Array
    lo: Tuple[jax.Array, ...]
    hi: Tuple[jax.Array, ...]
    shift: jax.Array  # rank-one shift scale s (0 when full rank)
    periodic: Tuple[bool, ...] = dataclasses.field(metadata=dict(static=True))

    @property
    def rank(self) -> int:
        return self.center.ndim


def _nwin(mask: jax.Array, off: Sequence[int], res: Sequence[int]) -> jax.Array:
    idx = tuple(slice(1 + o, 1 + o + r) for o, r in zip(off, res))
    return mask[idx]


def _host_all_ones(mask) -> bool:
    """Trace-time static check that a mask is identically 1, ON THE HOST
    (np on the concrete closed-over array — the corrector-bridge idiom,
    ops/pallas_corrector.py): closed-over masks are concrete at trace time
    even inside jit/scan, while jnp reductions there would make tracers.
    Tracer-valued masks (donated as jit args) conservatively return False."""
    if isinstance(mask, jax.core.Tracer):
        return False
    try:
        return bool(np.all(np.asarray(mask) == 1))
    except Exception:
        return False


def assemble_pressure_laplacian(
    influence: StaggeredField,
    active_mask: jax.Array,
    accessible_mask: jax.Array,
    periodic: Sequence[bool],
    rank_deficient,
    dtype=None,
) -> LaplaceStencil:
    """Build the 5-point pressure-increment Laplacian.

    influence        — per-face weights 1/(beta - A) * dx_factor (StaggeredField)
    active/accessible — centered masks padded by one (resolution + 2). For
                       periodic axes the padding must wrap.
    rank_deficient   — bool (static or traced): all-Neumann singular system.
    """
    rank = influence.rank
    res = influence.resolution
    periodic = tuple(bool(p) for p in periodic)
    if dtype is None:
        dtype = influence.dtype

    from diffpiso_tpu.ops.pallas_assembly import (
        assembly_eligible,
        fused_laplace_assembly,
    )

    use_pallas = assembly_eligible(res, rank, dtype)
    if (
        not use_pallas
        and os.environ.get("DIFFPISO_UNMASKED_ASM", "auto") != "never"
        and all(periodic)
        and _host_all_ones(active_mask)
        and _host_all_ones(accessible_mask)
    ):
        # Unmasked all-periodic fast path (the 3-D turbulence class): every
        # mask plane folds to True, so diag = -(both faces per axis) and the
        # links are the raw face influences — skipping the where chains
        # entirely keeps XLA from streaming ~12 mask-sized operands per
        # assembly at 256^3 (the roofline3d 4.4 ms laplacian-assembly delta,
        # runs/roofline3d_256.log). Matches laplace_op.cu.cc:125-177 with
        # active==accessible==1.
        diag = jnp.zeros(res, dtype)
        lo_coeffs, hi_coeffs = [], []
        for d in range(rank):
            comp = influence.components[d].astype(dtype)
            infl_hi = jnp.roll(comp, -1, axis=d)
            diag = diag - comp - infl_hi
            lo_coeffs.append(comp)
            hi_coeffs.append(infl_hi)
        sum_abs = jnp.sum(jnp.abs(diag))
        n = float(np.prod(res))
        shift = jnp.where(
            jnp.asarray(rank_deficient, bool),
            0.1 * sum_abs / n,
            jnp.zeros((), dtype),
        ).astype(dtype)
        return LaplaceStencil(
            center=diag,
            lo=tuple(lo_coeffs),
            hi=tuple(hi_coeffs),
            shift=shift,
            periodic=periodic,
        )

    act = active_mask.astype(dtype)
    acc = accessible_mask.astype(dtype)
    act_c = act[tuple(slice(1, -1) for _ in range(rank))]
    acc_c = acc[tuple(slice(1, -1) for _ in range(rank))]
    cell_not_dead = jnp.logical_not((act_c == 0) & (acc_c == 0))
    cell_active = act_c != 0

    # Mask planes per axis/side. These depend only on the (typically
    # jit-constant) boundary masks, so XLA folds their construction; the
    # runtime work is the influence combination below — which the fused
    # Pallas kernel (ops/pallas_assembly.py) does in one launch on TPU.
    diag_m, link_m = [], []
    for d in range(rank):
        off_lo = tuple(-1 if i == d else 0 for i in range(rank))
        off_hi = tuple(1 if i == d else 0 for i in range(rank))
        act_lo, act_hi = _nwin(act, off_lo, res), _nwin(act, off_hi, res)
        acc_lo, acc_hi = _nwin(acc, off_lo, res), _nwin(acc, off_hi, res)
        nbr_counts_lo = jnp.logical_not((act_lo == 0) & (acc_lo == 0)) & cell_active
        nbr_counts_hi = jnp.logical_not((act_hi == 0) & (acc_hi == 0)) & cell_active
        link_lo = (act_lo == 1) & (acc_lo == 1) & cell_not_dead
        link_hi = (act_hi == 1) & (acc_hi == 1) & cell_not_dead
        if not periodic[d]:
            # Drop links across non-periodic domain edges: the reference's
            # DIA matvec would index out of bounds there (it relies on masks
            # zeroing the ring); we make that guarantee explicit so the roll
            # wrap in apply_laplacian is always harmless.
            n = res[d]
            idx = jnp.arange(n).reshape(
                tuple(n if i == d else 1 for i in range(rank))
            )
            link_lo = link_lo & (idx > 0)
            link_hi = link_hi & (idx < n - 1)
        diag_m.append((nbr_counts_lo, nbr_counts_hi))
        link_m.append((link_lo, link_hi))

    if use_pallas:
        planes = tuple(
            m.astype(dtype)
            for pair in (diag_m[0], diag_m[1], link_m[0], link_m[1])
            for m in pair
        )
        # matrix coefficients carry zero gradient (piso_tf.py:116-128); the
        # kernel has no AD rule, so make that explicit here
        comp_y = jax.lax.stop_gradient(influence.components[0].astype(dtype))
        comp_x = jax.lax.stop_gradient(influence.components[1].astype(dtype))
        diag, lo_y, hi_y, lo_x, hi_x, sum_abs = fused_laplace_assembly(
            comp_y, comp_x, planes, periodic, res, dtype
        )
        lo_coeffs, hi_coeffs = [lo_y, lo_x], [hi_y, hi_x]
    else:
        diag = jnp.zeros(res, dtype)
        lo_coeffs, hi_coeffs = [], []
        for d in range(rank):
            comp = influence.components[d].astype(dtype)
            if periodic[d]:
                # unique faces: lo face of cell i is face i, hi face wraps
                infl_lo = comp
                infl_hi = jnp.roll(comp, -1, axis=d)
            else:
                infl_lo = jax.lax.slice_in_dim(comp, 0, res[d], axis=d)
                infl_hi = jax.lax.slice_in_dim(comp, 1, res[d] + 1, axis=d)
            diag = diag - jnp.where(diag_m[d][0], infl_lo, 0.0)
            diag = diag - jnp.where(diag_m[d][1], infl_hi, 0.0)
            lo_coeffs.append(jnp.where(link_m[d][0], infl_lo, 0.0))
            hi_coeffs.append(jnp.where(link_m[d][1], infl_hi, 0.0))
        sum_abs = jnp.sum(jnp.abs(diag))

    n = float(np.prod(res))
    shift = jnp.where(
        jnp.asarray(rank_deficient, bool),
        0.1 * sum_abs / n,
        jnp.zeros((), dtype),
    ).astype(dtype)
    return LaplaceStencil(
        center=diag,
        lo=tuple(lo_coeffs),
        hi=tuple(hi_coeffs),
        shift=shift,
        periodic=periodic,
    )


def detect_rank_deficiency(active_mask, accessible_mask) -> jax.Array:
    """Auto-detect the all-Neumann (singular) pressure system from the mask
    boundary ring: deficient iff every ring cell has active == accessible
    (piso_cuda_pressure_solver.py:84-87). Rank-generic: the "ring" is every
    boundary face layer of the padded mask (edges/corners shared by several
    layers enter more than once — harmless for a product)."""
    act = jnp.asarray(active_mask)
    acc = jnp.asarray(accessible_mask)
    agree = acc * act + (1 - acc) * (1 - act)
    rank = agree.ndim
    parts = []
    for d in range(rank):
        for end in (0, -1):
            idx = tuple(
                end if i == d else slice(1, -1) for i in range(rank)
            )
            parts.append(agree[idx].reshape(-1))
    return jnp.prod(jnp.concatenate(parts)) != 0


def apply_laplacian(st: LaplaceStencil, p: jax.Array) -> jax.Array:
    """z = L p (+ s * sum(p) when rank-deficient).

    Non-periodic boundary coefficients are zero, so jnp.roll's wrap reads
    are harmless; on periodic axes the wrap is exactly the desired coupling.
    The operator is symmetric, so no transposed variant is needed for the
    adjoint pressure solve (piso_cuda_pressure_solver.py:97-107 re-uses the
    same solve)."""
    from diffpiso_tpu.ops.pallas_stencil import fused_stencil_matvec, pallas_eligible

    if pallas_eligible(p.shape, p.dtype):
        z = fused_stencil_matvec(st.center, st.lo, st.hi, p)
    else:
        z = st.center * p
        for d in range(st.rank):
            z = z + st.lo[d] * jnp.roll(p, 1, axis=d)
            z = z + st.hi[d] * jnp.roll(p, -1, axis=d)
    return z + st.shift * jnp.sum(p)


def laplacian_to_dense(st: LaplaceStencil) -> np.ndarray:
    """Dense matrix (including the rank-one shift) — test/debug only."""
    center = np.asarray(st.center, np.float64)
    S = center.shape
    n = int(np.prod(S))
    M = np.zeros((n, n))
    for flat in range(n):
        idx = np.unravel_index(flat, S)
        M[flat, flat] += center[idx]
        for d in range(len(S)):
            lo = np.asarray(st.lo[d])[idx]
            hi = np.asarray(st.hi[d])[idx]
            if lo != 0.0:
                j = list(idx)
                j[d] = (idx[d] - 1) % S[d]
                M[flat, int(np.ravel_multi_index(j, S))] += lo
            if hi != 0.0:
                j = list(idx)
                j[d] = (idx[d] + 1) % S[d]
                M[flat, int(np.ravel_multi_index(j, S))] += hi
    M += float(np.asarray(st.shift)) * np.ones((n, n))
    return M
