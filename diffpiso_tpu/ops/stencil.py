"""Matrix-free assembly of the implicit advection-diffusion operator.

TPU-native re-design of the reference's `CentralDifferenceMatrixCsr` CUDA op
(CUDAsrc/central_difference_csr_op.cu.cc:148-453 and its Python wrapper
diffpiso/piso_tf.py:85-137). Instead of CSR triplets for cuSPARSE, each
velocity component's operator is five dense coefficient tensors — center and
one per low/high neighbor per axis — laid out on the component's own face
grid. Applying the operator is five shift-multiply-accumulates, which XLA
fuses into a single VPU pass; the transposed operator (needed for the
implicit-function-theorem adjoint) is the same pattern with the coefficient
arrays shifted, eliminating the reference's csr2csc transposes
(multi_bicgstab_ilu_linear_solve_op.cu.cc:113-134).

Discretization semantics replicated exactly (2nd-order central FV fluxes):

  flux_{lo,hi}(d) = 0.5*(w + w shifted by -e_c) * faceArea_d,  w = velocity_d
                    padded by one cell                    (cu.cc:35-128)
  off-diag lo_d   = +0.5*flux_lo + nu*A_d/dx_d   if neighbor coupled
  off-diag hi_d   = -0.5*flux_hi + nu*A_d/dx_d               (cu.cc:256-279)
  diag           += +/-flux*(2-coupled)*0.5
                    - nu*A_d/dx_d*(coupled + (d!=c)*(1-coupled)*noslip*2)
                                                            (cu.cc:265-288)
  coupled(tBB)    = active(nbr)==1 or (interior and noslip(nbr))
                                                            (cu.cc:252-254)
  Dirichlet rows  -> identity row, advection diagonal A = 0 (cu.cc:214-238)
  matrix center   = diag - beta,   beta = prod(dx)/dt        (cu.cc:294)
"""

from __future__ import annotations

import dataclasses
import math as _math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffpiso_tpu.fields.grid import StaggeredField
from diffpiso_tpu.ops.fv import pad_staggered


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AdvectionStencil:
    """Per-component 5-point stencils of the advection-diffusion matrix M.

    center[c]  — matrix diagonal (advection diagonal minus beta; 1 on
                 Dirichlet rows)
    lo[c][d]   — coefficient coupling face i to its neighbor at i - e_d
    hi[c][d]   — coefficient coupling face i to its neighbor at i + e_d
    diag_A[c]  — the advection diagonal A (without -beta; 0 on Dirichlet
                 rows), used by the PISO correctors (piso_tf.py:54-73)
    """

    center: Tuple[jax.Array, ...]
    lo: Tuple[Tuple[jax.Array, ...], ...]
    hi: Tuple[Tuple[jax.Array, ...], ...]
    diag_A: Tuple[jax.Array, ...]

    @property
    def rank(self) -> int:
        return len(self.center)


def _win(arr: jax.Array, off: Sequence[int], size: Sequence[int]) -> jax.Array:
    """Static window of a 1-padded array: arr[1+off : 1+off+size] per axis."""
    idx = tuple(slice(1 + o, 1 + o + s) for o, s in zip(off, size))
    return arr[idx]


def _interior_masks(shape: Sequence[int], d: int, periodic: bool):
    """(interior_lo, interior_hi): face not on the lower/upper domain end
    along axis d (the CUDA domainBoundaryBool, cu.cc:166-172). Periodic axes
    have no domain ends — every face is interior."""
    if periodic:
        t = jnp.ones((1,) * len(shape), bool)
        return t, t
    n = shape[d]
    idx = jnp.arange(n).reshape(tuple(n if i == d else 1 for i in range(len(shape))))
    interior_lo = idx > 0
    interior_hi = idx < n - 1
    return interior_lo, interior_hi


def assemble_advection_stencil(
    velocity: StaggeredField,
    dx: Sequence[float],
    velocity_pad_modes,
    viscosity,
    beta,
    dirichlet_mask: StaggeredField,
    active_mask: jax.Array,
    accessible_mask: jax.Array,
    no_slip_mask: jax.Array | None,
    periodic: Sequence[bool],
) -> AdvectionStencil:
    """Assemble the per-component implicit operators M_c (see module doc).

    velocity        — current velocity (the operator linearizes advection
                      around it, Picard style)
    dx              — grid spacing (y, x)
    viscosity       — scalar, or StaggeredField of per-face viscosities
    beta            — prod(dx)/dt (may be a traced scalar)
    dirichlet_mask  — per-component bool fields marking Dirichlet faces
    active/accessible/no_slip masks — centered masks padded by one
                      (resolution + 2), reference README.md:61-66
    """
    rank = velocity.rank
    dx = tuple(float(v) for v in dx)
    periodic = tuple(bool(p) for p in periodic)
    assert periodic == velocity.periodic, (
        "velocity field periodicity must match the requested periodic axes "
        f"(got field {velocity.periodic}, requested {periodic}); periodic "
        "axes store unique faces"
    )

    # uniform-mask periodic fast path: one fused Pallas launch for all 12
    # stencil planes (ops/pallas_advassembly.py) — the r3 roofline measured
    # the jnp path's unaligned window slices at 45% of the 512^2 step
    from diffpiso_tpu.ops.pallas_advassembly import (
        advassembly3_eligible,
        advassembly_eligible,
        fused_advection_assembly,
        fused_advection_assembly_3d,
    )

    if advassembly_eligible(
        velocity, dirichlet_mask, active_mask, no_slip_mask, viscosity, periodic
    ):
        centers, los, his, diag_As = fused_advection_assembly(
            velocity, dx, viscosity, beta
        )
        return AdvectionStencil(center=centers, lo=los, hi=his, diag_A=diag_As)
    if advassembly3_eligible(
        velocity, dirichlet_mask, active_mask, no_slip_mask, viscosity, periodic
    ):
        centers, los, his, diag_As = fused_advection_assembly_3d(
            velocity, dx, viscosity, beta
        )
        return AdvectionStencil(center=centers, lo=los, hi=his, diag_A=diag_As)
    # general-mask rank-2 fast path (bounded domains: cavity/channels/mixing
    # layers) — masks are kernel DATA, so no uniformity requirement
    from diffpiso_tpu.ops.pallas_advassembly import (
        advassembly_masked_eligible,
        fused_advection_assembly_masked,
    )

    if advassembly_masked_eligible(velocity, active_mask, viscosity, periodic):
        vel_pad_f = pad_staggered(velocity, velocity_pad_modes, 1)
        centers, los, his, diag_As = fused_advection_assembly_masked(
            vel_pad_f, velocity, dx, viscosity, beta, dirichlet_mask,
            active_mask, no_slip_mask, periodic,
        )
        return AdvectionStencil(center=centers, lo=los, hi=his, diag_A=diag_As)
    dxprod = _math.prod(dx)
    area = tuple(dxprod / dx[d] for d in range(rank))
    dtype = velocity.dtype

    vel_pad = pad_staggered(velocity, velocity_pad_modes, 1)
    active_mask = active_mask.astype(dtype)
    accessible_mask = accessible_mask.astype(dtype)
    if no_slip_mask is None:
        no_slip_mask = jnp.zeros_like(active_mask, dtype=bool)
    no_slip_b = no_slip_mask.astype(bool)

    centers, los, his, diag_As = [], [], [], []
    for c in range(rank):
        S = velocity.components[c].shape
        e = [tuple(1 if i == d else 0 for i in range(rank)) for d in range(rank)]
        neg_ec = tuple(-v for v in e[c])

        if isinstance(viscosity, StaggeredField):
            nu = viscosity.components[c].astype(dtype)
        else:
            nu = jnp.asarray(viscosity, dtype)

        diag = jnp.zeros(S, dtype)
        lo_c, hi_c = [], []
        for d in range(rank):
            w = vel_pad[d]
            zero_off = (0,) * rank
            ed_minus_ec = tuple(a - b for a, b in zip(e[d], e[c]))
            flux_lo = 0.5 * (_win(w, zero_off, S) + _win(w, neg_ec, S)) * area[d]
            flux_hi = 0.5 * (_win(w, e[d], S) + _win(w, ed_minus_ec, S)) * area[d]

            interior_lo, interior_hi = _interior_masks(S, d, periodic[d])
            off_lo = tuple(-v for v in e[d])
            # high centered neighbor sits at +e_d for d != c, at 0 for d == c
            # (the face between two cells belongs to the upper one),
            # cu.cc:273 `offset = 1-(d==c)`.
            off_hi = e[d] if d != c else zero_off

            act_lo = _win(active_mask, off_lo, S)
            act_hi = _win(active_mask, off_hi, S)
            ns_lo = _win(no_slip_b, off_lo, S)
            ns_hi = _win(no_slip_b, off_hi, S)

            tbb_lo = (act_lo == 1.0) | (interior_lo & ns_lo)
            tbb_hi = (act_hi == 1.0) | (interior_hi & ns_hi)
            tbb_lo_f = tbb_lo.astype(dtype)
            tbb_hi_f = tbb_hi.astype(dtype)

            visc = nu * (area[d] / dx[d])
            # links across periodic wraps always exist (interior is all-True
            # there); non-periodic boundary links are dropped
            link_lo = interior_lo
            link_hi = interior_hi
            coeff_lo = jnp.where(tbb_lo & link_lo, 0.5 * flux_lo + visc, 0.0)
            coeff_hi = jnp.where(tbb_hi & link_hi, -0.5 * flux_hi + visc, 0.0)

            wall = 1.0 if d != c else 0.0
            diag = diag + flux_lo * (2.0 - tbb_lo_f) * 0.5 - visc * (
                tbb_lo_f + wall * (1.0 - tbb_lo_f) * ns_lo.astype(dtype) * 2.0
            )
            diag = diag - flux_hi * (2.0 - tbb_hi_f) * 0.5 - visc * (
                tbb_hi_f + wall * (1.0 - tbb_hi_f) * ns_hi.astype(dtype) * 2.0
            )
            lo_c.append(coeff_lo)
            hi_c.append(coeff_hi)

        dmask = dirichlet_mask.components[c].astype(bool)
        center = jnp.where(dmask, jnp.ones((), dtype), diag - jnp.asarray(beta, dtype))
        lo_c = tuple(jnp.where(dmask, 0.0, v) for v in lo_c)
        hi_c = tuple(jnp.where(dmask, 0.0, v) for v in hi_c)
        diag_A = jnp.where(dmask, 0.0, diag)

        centers.append(center)
        los.append(lo_c)
        his.append(hi_c)
        diag_As.append(diag_A)

    return AdvectionStencil(
        center=tuple(centers), lo=tuple(los), hi=tuple(his), diag_A=tuple(diag_As)
    )


# -- application ----------------------------------------------------------------


def _apply_component(center, lo, hi, x):
    from diffpiso_tpu.ops.pallas_stencil import fused_stencil_matvec, pallas_eligible

    if pallas_eligible(x.shape, x.dtype):
        return fused_stencil_matvec(center, lo, hi, x)
    y = center * x
    for d in range(x.ndim):
        y = y + lo[d] * jnp.roll(x, 1, axis=d)
        y = y + hi[d] * jnp.roll(x, -1, axis=d)
    return y


def _apply_component_T(center, lo, hi, x):
    # (M^T x)[i] = center[i] x[i] + sum_d lo[i+e_d] x[i+e_d] + hi[i-e_d] x[i-e_d]
    from diffpiso_tpu.ops.pallas_stencil import fused_stencil_matvec, pallas_eligible

    if pallas_eligible(x.shape, x.dtype):
        return fused_stencil_matvec(center, lo, hi, x, transpose=True)
    y = center * x
    for d in range(x.ndim):
        y = y + jnp.roll(lo[d] * x, -1, axis=d)
        y = y + jnp.roll(hi[d] * x, 1, axis=d)
    return y


def apply_stencil(st: AdvectionStencil, field: StaggeredField, negate: bool = False) -> StaggeredField:
    """y = M v (or -M v). Boundary coefficients are zero on non-periodic axes
    so the wrap-around reads introduced by jnp.roll contribute nothing."""
    outs = []
    for c in range(st.rank):
        y = _apply_component(st.center[c], st.lo[c], st.hi[c], field.components[c])
        outs.append(-y if negate else y)
    return StaggeredField(tuple(outs), periodic=field.periodic)


def apply_stencil_transpose(
    st: AdvectionStencil, field: StaggeredField, negate: bool = False
) -> StaggeredField:
    """y = M^T v (or -M^T v) — adjoint operator for IFT backward solves."""
    outs = []
    for c in range(st.rank):
        y = _apply_component_T(st.center[c], st.lo[c], st.hi[c], field.components[c])
        outs.append(-y if negate else y)
    return StaggeredField(tuple(outs), periodic=field.periodic)


def explicit_H(st: AdvectionStencil, w: StaggeredField, beta) -> StaggeredField:
    """H w = M w - (A - beta) w — the off-diagonal part of M applied to w,
    used by PISO corrector 2 (explicit_H_csr, piso_helpers.py:209-223)."""
    mw = apply_stencil(st, w)
    outs = []
    for c in range(st.rank):
        outs.append(
            mw.components[c]
            - (st.diag_A[c] - jnp.asarray(beta, w.dtype)) * w.components[c]
        )
    return StaggeredField(tuple(outs), periodic=w.periodic)


# -- test utilities ---------------------------------------------------------------


def stencil_to_dense(st: AdvectionStencil, c: int) -> np.ndarray:
    """Dense matrix of component c's operator (row-major over (y, x)).
    Test/debug only — the scipy bridge the reference exposes as
    convert_to_scipy_csr (piso_helpers.py:326-343)."""
    center = np.asarray(st.center[c])
    S = center.shape
    n = int(np.prod(S))
    M = np.zeros((n, n), dtype=np.float64)
    strides = [int(np.prod(S[d + 1 :])) for d in range(len(S))]
    for flat in range(n):
        idx = np.unravel_index(flat, S)
        M[flat, flat] += center[idx]
        for d in range(len(S)):
            lo = np.asarray(st.lo[c][d])[idx]
            hi = np.asarray(st.hi[c][d])[idx]
            if lo != 0.0:
                j = list(idx)
                j[d] = (idx[d] - 1) % S[d]
                M[flat, int(np.ravel_multi_index(j, S))] += lo
            if hi != 0.0:
                j = list(idx)
                j[d] = (idx[d] + 1) % S[d]
                M[flat, int(np.ravel_multi_index(j, S))] += hi
    return M
