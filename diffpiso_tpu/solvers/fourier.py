"""Spectral Poisson solver for periodic boxes.

Capability parity with the reference's FourierSolver
(PhiFlow/phi/physics/pressuresolver/fourier.py) / fourier_poisson
(phi/math/nd.py:312-368), with a PISO twist: for the fully periodic,
constant-coefficient pressure system the 5-point Laplacian diagonalizes
exactly in Fourier space, so the pressure "solve" is two FFTs — no Krylov
iterations at all. TPU FFTs run on the XLA FFT unit and cost a few matvec
equivalents, so this path replaces hundreds of CG iterations in the
decaying-turbulence configuration.

The discrete symbol of the stencil  w * (p[i-1] - 2 p[i] + p[i+1])  along an
axis of length n is  w * (2 cos(2 pi k / n) - 2),  exact for the same
matrix CG iterates on (not the continuous -k^2).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _stencil_symbol(weights, shape, eig_fn):
    """sum_d w_d * eig_fn(n_d)[k_d], broadcast over an N-d spectrum grid."""
    rank = len(shape)
    return sum(
        weights[d]
        * eig_fn(shape[d]).reshape(
            tuple(-1 if i == d else 1 for i in range(rank))
        )
        for d in range(rank)
    )


@dataclasses.dataclass(frozen=True)
class FourierPressureSolver:
    """Direct spectral solve of  L p = rhs  for the uniform periodic
    Laplacian with per-axis face weight w_d (influence = 1/(beta - A) *
    dx_factor, constant over the box when viscosity is uniform; A varies by
    O(flux) — for the PISO correctors on a periodic box the reference's A is
    velocity-dependent, so this solver applies when using the
    constant-coefficient approximation w_d = mean influence. The Krylov path
    remains the exact option)."""

    def solve(self, weights, rhs, guess=None, tol=None):
        """weights: one scalar per axis; rhs: any rank. Returns zero-mean p
        with L p = rhs - mean(rhs) (the compatible projection)."""
        symbol = _stencil_symbol(
            weights,
            rhs.shape,
            lambda n: jnp.cos(2 * jnp.pi * jnp.arange(n) / n) * 2 - 2,
        )
        rhs_hat = jnp.fft.fftn(rhs)
        symbol = jnp.where(jnp.abs(symbol) < 1e-12, 1.0, symbol)
        p_hat = rhs_hat / symbol
        p_hat = p_hat.at[(0,) * rhs.ndim].set(0.0)  # zero-mean gauge
        return jnp.real(jnp.fft.ifftn(p_hat)).astype(rhs.dtype)


@dataclasses.dataclass(frozen=True)
class NeumannSpectralSolver:
    """Direct spectral solve of the homogeneous-Neumann 5-point Laplacian
    via DCT-II: the Neumann stencil (mirror ghost cells, the all-closed/
    all-open pressure BC of the lid cavity — laplace_op.cu.cc:118-135 builds
    exactly this matrix from the masks) diagonalizes in the half-sample-
    symmetric cosine basis with per-axis symbol w_d * (2 cos(pi k / n) - 2).

    Used standalone it inverts the constant-coefficient system exactly
    (zero-mean gauge on the rank-deficient all-Neumann matrix); used as a
    PCG preconditioner it captures the boundary behavior the periodic FFT
    preconditioner gets wrong, collapsing iteration counts on bounded
    domains — this is the TPU answer to the reference's float64 CG grind."""

    def solve(self, weights, rhs, guess=None, tol=None):
        from jax.scipy.fft import dctn, idctn

        symbol = _stencil_symbol(
            weights,
            rhs.shape,
            lambda n: 2.0 * jnp.cos(jnp.pi * jnp.arange(n) / n) - 2.0,
        )
        rhs_hat = dctn(rhs, type=2)
        symbol = jnp.where(jnp.abs(symbol) < 1e-12, 1.0, symbol)
        p_hat = rhs_hat / symbol
        p_hat = p_hat.at[(0,) * rhs.ndim].set(0.0)  # zero-mean gauge (null space)
        return idctn(p_hat, type=2).astype(rhs.dtype)

    def precondition(self, weights, r):
        """Preconditioner application optimized for awkward grid sizes.

        TPU FFTs are fast only on 2/3/5-smooth lengths; odd sizes (the
        cavity's 513-row grid) fall into fragmented Bluestein-style
        decompositions — profiled at ~0.29 ms vs ~0.03 ms for 512. A
        preconditioner need not be the exact inverse, so apply the DCT
        solve on the largest smooth corner block (exact for the lid cavity,
        whose extra row is inactive identity rows) and scale the remaining
        rows/columns by the stencil diagonal. Block-diagonal => symmetric,
        same sign => definite: PCG theory holds."""
        gs = tuple(_smooth_size(n) for n in r.shape)
        if gs == r.shape:
            return self.solve(weights, r)
        diag = -2.0 * sum(weights)
        blk = tuple(slice(0, g) for g in gs)
        block = self.solve(weights, r[blk])
        out = r / diag  # remainder rows/cols: diagonal (Jacobi) scaling
        out = out.at[blk].set(block.astype(r.dtype))
        # restore the global zero-mean invariant the PCG callers rely on
        # (precond_zero_mean): the remainder rows leak a mean component,
        # which otherwise feeds the rank-one-shift null direction and can
        # blow up the search when those rows are active (inactive identity
        # rows, as in the lid cavity's dummy row, contribute r = 0 and this
        # is a no-op)
        return out - jnp.mean(out)


def dct4(x: jax.Array, axis: int = -1) -> jax.Array:
    """DCT-IV along `axis` via one length-2n complex FFT (jax.scipy.fft has
    only type 2):  X_k = sum_i x_i cos(pi (2i+1)(2k+1) / 4n)
                      = Re[ e^{-i pi (2k+1)/4n} * FFT_{2n}(x_i e^{-i pi i/2n})_k ]."""
    n = x.shape[axis]
    x = jnp.moveaxis(x, axis, -1)
    i = jnp.arange(n)
    y = x.astype(jnp.complex64) * jnp.exp(-1j * jnp.pi * i / (2 * n))
    Y = jnp.fft.fft(y, n=2 * n, axis=-1)[..., :n]
    k = jnp.arange(n)
    out = 2.0 * jnp.real(jnp.exp(-1j * jnp.pi * (2 * k + 1) / (4 * n)) * Y)
    return jnp.moveaxis(out, -1, axis)  # scipy's unnormalized convention


def idct4(x: jax.Array, axis: int = -1) -> jax.Array:
    """DCT-IV is self-inverse up to 1/(2n) in the unnormalized convention."""
    return dct4(x, axis) / (2.0 * x.shape[axis])


@dataclasses.dataclass(frozen=True)
class ChannelSpectralSolver:
    """Spectral inverse for the CHANNEL pressure layout: Neumann walls in y
    (closed boundaries) and Neumann-inflow / Dirichlet-outflow in x — the
    spatial-mixing-layer configuration (compute_mixingLayer_masks,
    piso_helpers.py:73-133: accessible zeroed at y walls and x=0, open ring
    at x=nx). Basis: DCT-II in y (x_{-1}=x_0 mirror), DCT-IV in x (mirror at
    the inflow face, zero at the outflow face). Eigenvalues
      lam_y(k) = w_y (2 cos(pi k / ny) - 2)
      lam_x(k) = w_x (2 cos(pi (k + 1/2) / nx) - 2)
    and lam_x < 0 for ALL k: the preconditioner is nonsingular, matching the
    outflow-pinned (non-rank-deficient) operator — unlike the all-Neumann
    DCT-II, whose zero mode makes PCG on this system stall outright
    (measured: 2000-iteration cap vs ~1000 for plain CG at 128x512).
    Exactness note: the operator's outflow row uses a zero ghost CELL while
    DCT-IV zeroes the ghost FACE — a half-cell mismatch at one column, fine
    for preconditioning."""

    def solve(self, weights, rhs, guess=None, tol=None):
        from jax.scipy.fft import dctn, idctn

        ny, nx = rhs.shape
        ky = 2.0 * jnp.cos(jnp.pi * jnp.arange(ny) / ny) - 2.0
        kx = 2.0 * jnp.cos(jnp.pi * (jnp.arange(nx) + 0.5) / nx) - 2.0
        symbol = weights[0] * ky[:, None] + weights[1] * kx[None, :]
        rhs_hat = dct4(dctn(rhs, type=2, axes=(0,)), axis=1)
        p_hat = rhs_hat / symbol  # symbol < 0 everywhere: no gauge fixing
        return idctn(idct4(p_hat, axis=1), type=2, axes=(0,)).astype(rhs.dtype)

    def precondition(self, weights, r):
        ny, nx = r.shape
        gy, gx = _smooth_size(ny), _smooth_size(nx)
        if (gy, gx) == (ny, nx):
            return self.solve(weights, r)
        block = self.solve(weights, r[:gy, :gx])
        out = r / (-2.0 * (weights[0] + weights[1]))
        return out.at[:gy, :gx].set(block.astype(r.dtype))


# -- matmul spectral transforms (MXU path; shards under GSPMD) --------------------
#
# The FFT-based preconditioners above are fastest single-chip, but XLA's FFT
# lowers to an opaque custom-call that GSPMD cannot partition (and XLA:CPU's
# FFT thunk rejects sharded layouts outright), so round 1 had to DISABLE
# spectral preconditioning under spatial sharding. The TPU-native fix is to
# express the transforms as dense contractions with precomputed orthonormal
# eigenbases: a matmul is the one op the SPMD partitioner handles best (it
# inserts all-gather/reduce-scatter over ICI on its own) and it runs on the
# MXU. At preconditioning sizes (n <= ~2048) the O(n) extra arithmetic is
# cheaper than the per-kernel launch overhead the FFT path pays anyway, and
# awkward (non-2/3/5-smooth) lengths lose their penalty entirely — no
# _smooth_size block hack needed.


def dct2_basis(n: int) -> np.ndarray:
    """Orthonormal DCT-II analysis matrix V (rows = eigenvectors of the
    homogeneous-Neumann second-difference stencil): V[k, i] =
    s_k cos(pi k (2i+1) / 2n), eigenvalue 2 cos(pi k / n) - 2. V V^T = I."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    V = np.cos(np.pi * k * (2 * i + 1) / (2 * n))
    V[0] *= np.sqrt(1.0 / n)
    V[1:] *= np.sqrt(2.0 / n)
    return V


def dct4_basis(n: int) -> np.ndarray:
    """Orthonormal DCT-IV matrix: V[k, i] = sqrt(2/n) cos(pi (2k+1)(2i+1)/4n)
    — eigenvectors of the Neumann-lo / Dirichlet-hi(face) stencil with
    eigenvalue 2 cos(pi (k + 1/2) / n) - 2. Self-inverse (V = V^T = V^-1)."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    return np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k + 1) * (2 * i + 1) / (4 * n))


def fourier_basis(n: int) -> np.ndarray:
    """Orthonormal REAL Fourier basis (rows = eigenvectors of the periodic
    second-difference stencil). Row ordering pairs each cosine with its sine;
    the eigenvalue of row r is 2 cos(2 pi freq(r) / n) - 2 (see
    fourier_eigs)."""
    i = np.arange(n)[None, :]
    rows = [np.full((1, n), np.sqrt(1.0 / n))]
    for k in range(1, (n - 1) // 2 + 1):
        rows.append(np.sqrt(2.0 / n) * np.cos(2 * np.pi * k * i / n))
        rows.append(np.sqrt(2.0 / n) * np.sin(2 * np.pi * k * i / n))
    if n % 2 == 0:
        rows.append(np.sqrt(1.0 / n) * np.cos(np.pi * i))
    return np.concatenate(rows, axis=0)


def _eigs(n: int, kind: str) -> np.ndarray:
    if kind == "dct2":
        return 2.0 * np.cos(np.pi * np.arange(n) / n) - 2.0
    if kind == "dct4":
        return 2.0 * np.cos(np.pi * (np.arange(n) + 0.5) / n) - 2.0
    if kind == "fourier":
        freqs = [0] + [k for k in range(1, (n - 1) // 2 + 1) for _ in (0, 1)]
        if n % 2 == 0:
            freqs.append(n // 2)
        return 2.0 * np.cos(2 * np.pi * np.asarray(freqs) / n) - 2.0
    raise ValueError(kind)


_BASIS = {"dct2": dct2_basis, "dct4": dct4_basis, "fourier": fourier_basis}


@dataclasses.dataclass(frozen=True)
class MatmulSpectralSolver:
    """Spectral inverse of a separable constant-coefficient stencil applied
    as per-axis dense contractions with precomputed orthonormal eigenbases.

    kinds — per-axis basis: 'dct2' (homogeneous Neumann — the bounded-domain
    pressure layout), 'dct4' (Neumann-in/Dirichlet-out — the channel x-axis),
    'fourier' (periodic). Replaces NeumannSpectralSolver /
    ChannelSpectralSolver / FourierPressureSolver where the computation must
    shard (GSPMD) or batch (vmap); the inverse transform is the transpose
    contraction. zero_mean fixes the gauge of the all-singular combination
    (every axis' zero mode) like the FFT solvers' p_hat[0...]=0."""

    kinds: Tuple[str, ...]
    shape: Tuple[int, ...]
    # MXU pass count for the contractions. "high" (3 bf16 passes, ~f32
    # quality) measured r3 on the v5e: iteration counts identical to
    # "highest" (6 passes) at the production tolerances (1e-6/1e-8) while
    # the headline runs ~13% faster (turb fwd 2084 vs 1836 steps/s, grad30
    # 691 vs 608, cavity 2389 vs 2225; zero warns). "default" (1 pass) is
    # NOT enough — the preconditioner residual floor lands near 1e-3 and
    # solves stall (cavity warned on 12% of steps).
    precision: str = "high"

    def _precision(self):
        return {
            "default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST,
        }[self.precision]

    def _mats(self, dtype):
        return [
            jnp.asarray(_BASIS[k](n), dtype)
            for k, n in zip(self.kinds, self.shape)
        ]

    def _symbol(self, weights, dtype):
        rank = len(self.shape)
        return sum(
            weights[d]
            * jnp.asarray(_eigs(self.shape[d], self.kinds[d]), dtype).reshape(
                tuple(-1 if i == d else 1 for i in range(rank))
            )
            for d in range(rank)
        )

    def solve(self, weights, rhs, guess=None, tol=None):
        if tuple(rhs.shape) == tuple(self.shape):
            from diffpiso_tpu.solvers.pallas_krylov import (
                spectral_eligible,
                spectral_eligible_3d,
            )

            rank = len(self.shape)
            if (rank == 2 and spectral_eligible(rhs.shape, rhs.dtype)) or (
                rank == 3 and spectral_eligible_3d(rhs.shape, rhs.dtype)
            ):
                w = jnp.stack([
                    jnp.asarray(wd, rhs.dtype) for wd in weights
                ])
                return _mm_solve_fused(self, w, rhs)
        return _mm_solve_xla(self, weights, rhs)

    # preconditioning needs no smooth-size block handling: matmuls don't
    # care about awkward lengths
    precondition = solve


def _safe_symbol(solver: "MatmulSpectralSolver", weights, dtype):
    """Eigenvalue symbol with singular modes (|S| < 1e-12 — the all-Neumann
    / periodic null space) replaced by +inf, so the kernels' plain
    `h / S` zeroes them (IEEE finite/inf = 0) with the SAME rounding as the
    XLA path's guarded divide on nonsingular modes. Computed in XLA and
    passed into the fused Pallas kernels as data: doing the where/divide
    chain in-kernel cost ~3 full-plane VMEM temporaries and blew the
    16 MiB scoped-vmem stack at 512^2."""
    symbol = solver._symbol(weights, dtype)
    singular = jnp.abs(symbol) < 1e-12
    return jnp.where(singular, jnp.inf, symbol)


def _mm_solve_xla(solver: "MatmulSpectralSolver", weights, rhs):
    """The reference XLA path: per-axis tensordot contractions (any rank)."""
    prec = solver._precision()
    mats = solver._mats(rhs.dtype)
    h = rhs
    for d, V in enumerate(mats):
        h = jnp.tensordot(V, h, axes=([1], [d]), precision=prec)
        h = jnp.moveaxis(h, 0, d)
    symbol = solver._symbol(weights, rhs.dtype)
    singular = jnp.abs(symbol) < 1e-12
    h = jnp.where(singular, 0.0, h / jnp.where(singular, 1.0, symbol))
    for d, V in enumerate(mats):
        h = jnp.tensordot(V.T, h, axes=([1], [d]), precision=prec)
        h = jnp.moveaxis(h, 0, d)
    return h.astype(rhs.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _mm_solve_fused(solver: "MatmulSpectralSolver", w, rhs):
    """Pallas-fused apply (solvers/pallas_krylov.py): rank 2 — ONE launch
    holding all four MXU contractions with the spectrum resident in VMEM;
    rank 3 — three launches (z-gridded plane transforms + column-blocked
    z-transform/symbol-divide) vs the XLA path's ~12 full-field HBM round
    trips. custom_vjp because pallas_call has no autodiff rule — the
    backward pass recomputes through the XLA path (the operator is linear;
    poisson_solve's gradient='autodiff' mode differentiates through
    preconditioner applications inside pcg)."""
    from diffpiso_tpu.solvers.pallas_krylov import (
        fused_spectral_apply,
        fused_spectral_apply_3d,
    )

    mats = solver._mats(rhs.dtype)
    eigs = [
        jnp.asarray(_eigs(n, k), rhs.dtype)
        for n, k in zip(solver.shape, solver.kinds)
    ]
    if len(solver.shape) == 2:
        symbol = _safe_symbol(solver, (w[0], w[1]), rhs.dtype)
        return fused_spectral_apply(
            mats[0], mats[1], symbol, rhs, solver._precision(),
        )
    eyx = (w[1] * eigs[1][:, None] + w[2] * eigs[2][None, :]).reshape(1, -1)
    return fused_spectral_apply_3d(
        mats[0], mats[1], mats[2], eigs[0].reshape(-1, 1), eyx, w[0], rhs,
        solver._precision(),
    )


def _mm_fused_fwd(solver, w, rhs):
    return _mm_solve_fused(solver, w, rhs), (w, rhs)


def _mm_fused_bwd(solver, res, ct):
    w, rhs = res
    rank = len(solver.shape)
    _, vjp = jax.vjp(
        lambda w_, r_: _mm_solve_xla(
            solver, tuple(w_[d] for d in range(rank)), r_
        ),
        w, rhs,
    )
    return vjp(ct)


_mm_solve_fused.defvjp(_mm_fused_fwd, _mm_fused_bwd)


def _smooth_size(n: int) -> int:
    """Largest 2,3,5-smooth integer <= n (fast-FFT length)."""
    def smooth(m):
        for p in (2, 3, 5):
            while m % p == 0:
                m //= p
        return m == 1

    m = int(n)
    while m > 1 and not smooth(m):
        m -= 1
    return m


def fourier_poisson(rhs: jax.Array, dx) -> jax.Array:
    """Continuous-symbol spectral Poisson solve (nabla^2 p = rhs) on a
    periodic box — the direct analog of phi.math.fourier_poisson."""
    shape = rhs.shape
    ks = [np.fft.fftfreq(n, d=float(dxi)) * 2 * np.pi for n, dxi in zip(shape, dx)]
    k2 = sum(
        jnp.asarray(k**2).reshape([-1 if i == d else 1 for i in range(len(shape))])
        for d, k in enumerate(ks)
    )
    k2 = jnp.where(k2 == 0, 1.0, k2)
    rhs_hat = jnp.fft.fftn(rhs)
    p_hat = -rhs_hat / k2
    p_hat = p_hat.at[(0,) * len(shape)].set(0.0)
    return jnp.real(jnp.fft.ifftn(p_hat)).astype(rhs.dtype)
