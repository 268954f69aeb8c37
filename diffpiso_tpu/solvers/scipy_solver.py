"""Scipy sparse direct solver — the CPU oracle path.

Capability parity with the reference's LinearSolverScipy
(diffpiso/linear_solver.py:33-57): an exact host-side sparse solve wrapped
so it composes with the device graph (tf.py_function -> jax.pure_callback)
and carries the implicit-function-theorem adjoint (gradient = solve with
the transposed operator, linear_solver.py:50-55). Use for debugging and as
the trusted reference against the matrix-free Krylov solvers; every call
round-trips host<->device, so it is NOT a production path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from diffpiso_tpu.ops.laplace import LaplaceStencil
from diffpiso_tpu.ops.stencil import AdvectionStencil


def _dense_from_stencil(st, component: int | None = None) -> np.ndarray:
    from diffpiso_tpu.ops.laplace import laplacian_to_dense
    from diffpiso_tpu.ops.stencil import stencil_to_dense

    if isinstance(st, LaplaceStencil):
        return laplacian_to_dense(st)
    return stencil_to_dense(st, component)


def _host_solve(matrix: np.ndarray, rhs: np.ndarray, transpose: bool, out_dtype) -> np.ndarray:
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    m = sp.csr_matrix(np.asarray(matrix, np.float64))
    if transpose:
        m = m.T.tocsr()
    # factorize in float64, return in the caller's dtype (float64 callers —
    # the cast_to_double oracle paths — keep full precision)
    return spla.spsolve(m, np.asarray(rhs, np.float64).ravel()).astype(out_dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def scipy_sparse_solve(matrix: jax.Array, rhs: jax.Array, transpose: bool = False):
    """Solve (dense-represented) matrix @ x = rhs on the host with scipy's
    sparse direct factorization. matrix: (n, n); rhs: any shape with n
    elements; returns x with rhs's shape."""
    out_shape = jax.ShapeDtypeStruct(rhs.shape, rhs.dtype)
    return jax.pure_callback(
        lambda m, b: _host_solve(m, b, transpose, rhs.dtype).reshape(rhs.shape),
        out_shape,
        matrix,
        rhs,
    )


def _fwd(matrix, rhs, transpose):
    x = scipy_sparse_solve(matrix, rhs, transpose)
    return x, matrix


def _bwd(transpose, matrix, g):
    # IFT adjoint: solve the transposed system on the cotangent; the matrix
    # gets zero gradient (Picard linearization, piso_tf.py:116-128)
    db = scipy_sparse_solve(matrix, g, not transpose)
    return jnp.zeros_like(matrix), db


scipy_sparse_solve.defvjp(_fwd, _bwd)


class ScipySolver:
    """Drop-in oracle with the AdvectionSolver/PressureSolver calling shape:
    solve(operator_stencil, rhs_field_or_array) -> exact solution. Builds the
    dense operator once per call (test-scale grids only)."""

    def solve_pressure(self, lap: LaplaceStencil, rhs: jax.Array) -> jax.Array:
        dense = jnp.asarray(_dense_from_stencil_traced(lap))
        return scipy_sparse_solve(dense, rhs)

    def solve_advection(
        self, st: AdvectionStencil, component: int, rhs_flat: jax.Array,
        transpose=False,
    ):
        dense = jnp.asarray(_dense_from_stencil_traced(st, component))
        return scipy_sparse_solve(dense, rhs_flat, transpose)


def _dense_from_stencil_traced(st, component: int | None = None):
    """Materialize the dense operator; works outside jit (tests)."""
    host = jax.tree_util.tree_map(np.asarray, st)
    return _dense_from_stencil(host, component)


# -- sparse CSR bridges (vectorized; production-size oracles) --------------------


def _coeffs_to_csr(center: np.ndarray, lo, hi, shift: float = 0.0):
    """Build a scipy CSR matrix from 5/7-point stencil coefficient arrays.

    Vectorized equivalent of stencil_to_dense / laplacian_to_dense that
    scales to production grids (512^2 and beyond) — the role the reference's
    convert_to_scipy_csr bridge plays for its CUDA CSR buffers
    (diffpiso/piso_helpers.py:326-343). Neighbor columns wrap modulo the
    axis length, matching apply_stencil's jnp.roll semantics (non-periodic
    boundary coefficients are zero by construction, so wraps are inert).
    shift != 0 (the rank-one all-Neumann regularization) is returned as a
    separate scalar — callers handle it via Sherman-Morrison or pinning
    (adding s*1*1^T would densify the matrix).
    """
    import scipy.sparse as sp

    center = np.asarray(center, np.float64)
    S = center.shape
    n = center.size
    idx = np.indices(S)
    flat = np.arange(n)
    rows = [flat]
    cols = [flat]
    vals = [center.ravel()]
    for d in range(len(S)):
        for arr, delta in ((lo[d], -1), (hi[d], +1)):
            coeff = np.asarray(arr, np.float64).ravel()
            j = [idx[i] for i in range(len(S))]
            j[d] = (idx[d] + delta) % S[d]
            col = np.ravel_multi_index(tuple(j), S).ravel()
            nz = coeff != 0.0
            rows.append(flat[nz])
            cols.append(col[nz])
            vals.append(coeff[nz])
    m = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n),
    ).tocsr()
    return m


def stencil_to_scipy_csr(st: AdvectionStencil, component: int):
    """Sparse CSR of one advection-diffusion component operator."""
    host = jax.tree_util.tree_map(np.asarray, st)
    return _coeffs_to_csr(host.center[component], host.lo[component], host.hi[component])


def laplacian_to_scipy_csr(lap: LaplaceStencil):
    """Sparse CSR of the pressure Laplacian (WITHOUT the rank-one shift).
    Returns (csr_matrix, shift_scalar); see _coeffs_to_csr on the shift."""
    host = jax.tree_util.tree_map(np.asarray, lap)
    return _coeffs_to_csr(host.center, host.lo, host.hi), float(host.shift)
