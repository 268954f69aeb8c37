"""Oracle tests for the advection-diffusion stencil assembly.

The oracle is an independent scalar (per-row) numpy implementation of the
discretization rules documented in diffpiso_tpu/ops/stencil.py, evaluated
against the vectorized JAX assembly on random velocities and random masks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from diffpiso_tpu import StaggeredField
from diffpiso_tpu.fields.material import SYMMETRIC
from diffpiso_tpu.ops import (
    apply_stencil,
    apply_stencil_transpose,
    assemble_advection_stencil,
    explicit_H,
    stencil_to_dense,
)
from diffpiso_tpu.ops.fv import pad_staggered


def oracle_dense(c, vel_pad, S, dx, nu, beta, dmask, active, no_slip):
    """Row-by-row dense assembly of component c's matrix M and diagonal A."""
    rank = 2
    dxprod = dx[0] * dx[1]
    area = [dxprod / dx[d] for d in range(rank)]
    n = S[0] * S[1]
    M = np.zeros((n, n))
    A = np.zeros(n)
    e = [(1, 0), (0, 1)]
    for j in range(S[0]):
        for i in range(S[1]):
            row = j * S[1] + i
            if dmask[j, i]:
                M[row, row] = 1.0
                continue
            diag = 0.0
            for d in range(rank):
                w = vel_pad[d]
                bj, bi = j + 1, i + 1
                ec, ed = e[c], e[d]
                flo = 0.5 * (w[bj, bi] + w[bj - ec[0], bi - ec[1]]) * area[d]
                fhi = 0.5 * (
                    w[bj + ed[0], bi + ed[1]]
                    + w[bj + ed[0] - ec[0], bi + ed[1] - ec[1]]
                ) * area[d]
                loc = (j, i)[d]
                interior_lo = loc > 0
                interior_hi = loc < S[d] - 1
                nb_lo = (bj - ed[0], bi - ed[1])
                hi_off = ed if d != c else (0, 0)
                nb_hi = (bj + hi_off[0], bi + hi_off[1])
                nu_face = nu if np.isscalar(nu) else nu[c][j, i]
                visc = nu_face * area[d] / dx[d]

                tbb_lo = (active[nb_lo] == 1) or (interior_lo and no_slip[nb_lo])
                tbb_hi = (active[nb_hi] == 1) or (interior_hi and no_slip[nb_hi])
                if tbb_lo and interior_lo:
                    col = row - (S[1] if d == 0 else 1)
                    M[row, col] += 0.5 * flo + visc
                if tbb_hi and interior_hi:
                    col = row + (S[1] if d == 0 else 1)
                    M[row, col] += -0.5 * fhi + visc
                diag += flo * (2 - tbb_lo) * 0.5 - visc * (
                    tbb_lo + (d != c) * (1 - tbb_lo) * no_slip[nb_lo] * 2
                )
                diag += -fhi * (2 - tbb_hi) * 0.5 - visc * (
                    tbb_hi + (d != c) * (1 - tbb_hi) * no_slip[nb_hi] * 2
                )
            M[row, row] = diag - beta
            A[row] = diag
    return M, A


def make_case(seed=0, res=(4, 5), nu_field=False):
    rng = np.random.RandomState(seed)
    ny, nx = res
    vel = StaggeredField(
        (
            jnp.asarray(rng.randn(ny + 1, nx), jnp.float32),
            jnp.asarray(rng.randn(ny, nx + 1), jnp.float32),
        )
    )
    dmask = StaggeredField(
        (
            jnp.asarray(rng.rand(ny + 1, nx) < 0.25),
            jnp.asarray(rng.rand(ny, nx + 1) < 0.25),
        )
    )
    active = rng.randint(0, 2, (ny + 2, nx + 2)).astype(np.float32)
    accessible = rng.randint(0, 2, (ny + 2, nx + 2)).astype(np.float32)
    no_slip = rng.rand(ny + 2, nx + 2) < 0.3
    if nu_field:
        nu = StaggeredField(
            (
                jnp.asarray(np.abs(rng.randn(ny + 1, nx)), jnp.float32),
                jnp.asarray(np.abs(rng.randn(ny, nx + 1)), jnp.float32),
            )
        )
    else:
        nu = 0.05
    dx = (0.5, 0.25)
    beta = 7.3
    return vel, dmask, active, accessible, no_slip, nu, dx, beta


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("nu_field", [False, True])
def test_assembly_matches_oracle(seed, nu_field):
    vel, dmask, active, accessible, no_slip, nu, dx, beta = make_case(seed, nu_field=nu_field)
    st = assemble_advection_stencil(
        vel, dx, SYMMETRIC, nu, beta, dmask,
        jnp.asarray(active), jnp.asarray(accessible), jnp.asarray(no_slip),
        periodic=(False, False),
    )
    vel_pad = [np.asarray(p, np.float64) for p in pad_staggered(vel, SYMMETRIC, 1)]
    nu_np = nu if np.isscalar(nu) else [np.asarray(c) for c in (nu.components if isinstance(nu, StaggeredField) else nu)]
    if isinstance(nu, StaggeredField):
        nu_np = [np.asarray(c) for c in nu.components]
    for c in range(2):
        S = vel.components[c].shape
        M_expected, A_expected = oracle_dense(
            c, vel_pad, S, dx, nu_np if not np.isscalar(nu) else nu, beta,
            np.asarray(dmask.components[c]), active, no_slip,
        )
        M_actual = stencil_to_dense(st, c)
        np.testing.assert_allclose(M_actual, M_expected, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(st.diag_A[c]).reshape(-1), A_expected, rtol=1e-5, atol=1e-5
        )


def test_apply_matches_dense():
    vel, dmask, active, accessible, no_slip, nu, dx, beta = make_case(3)
    st = assemble_advection_stencil(
        vel, dx, SYMMETRIC, nu, beta, dmask,
        jnp.asarray(active), jnp.asarray(accessible), jnp.asarray(no_slip),
        periodic=(False, False),
    )
    rng = np.random.RandomState(7)
    x = StaggeredField(
        (jnp.asarray(rng.randn(5, 5), jnp.float32), jnp.asarray(rng.randn(4, 6), jnp.float32))
    )
    y = apply_stencil(st, x)
    yT = apply_stencil_transpose(st, x)
    for c in range(2):
        M = stencil_to_dense(st, c)
        xf = np.asarray(x.components[c]).reshape(-1)
        np.testing.assert_allclose(
            np.asarray(y.components[c]).reshape(-1), M @ xf, rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(yT.components[c]).reshape(-1), M.T @ xf, rtol=1e-4, atol=1e-4
        )


def test_explicit_H_is_offdiagonal_part():
    vel, dmask, active, accessible, no_slip, nu, dx, beta = make_case(4)
    st = assemble_advection_stencil(
        vel, dx, SYMMETRIC, nu, beta, dmask,
        jnp.asarray(active), jnp.asarray(accessible), jnp.asarray(no_slip),
        periodic=(False, False),
    )
    rng = np.random.RandomState(8)
    w = StaggeredField(
        (jnp.asarray(rng.randn(5, 5), jnp.float32), jnp.asarray(rng.randn(4, 6), jnp.float32))
    )
    h = explicit_H(st, w, beta)
    for c in range(2):
        M = stencil_to_dense(st, c)
        A = np.asarray(st.diag_A[c], np.float64).reshape(-1)
        wf = np.asarray(w.components[c]).reshape(-1)
        expected = M @ wf - (A - beta) * wf
        np.testing.assert_allclose(
            np.asarray(h.components[c]).reshape(-1), expected, rtol=1e-4, atol=1e-4
        )


def test_pure_diffusion_interior_values():
    # zero velocity, all-active interior: off-diag = nu*A_d/dx_d,
    # diag = -sum_d 2*nu*A_d/dx_d (classic FV Laplacian), center = diag - beta
    ny, nx = 6, 6
    vel = StaggeredField.zeros((ny, nx))
    dmask = StaggeredField(
        (jnp.zeros((ny + 1, nx), bool), jnp.zeros((ny, nx + 1), bool))
    )
    active = np.zeros((ny + 2, nx + 2), np.float32)
    active[1:-1, 1:-1] = 1
    nu, dx, beta = 0.1, (0.5, 0.5), 2.0
    st = assemble_advection_stencil(
        vel, dx, SYMMETRIC, nu, beta, dmask,
        jnp.asarray(active), jnp.asarray(active), None, (False, False),
    )
    visc = nu * 0.25 / 0.5 / 0.5  # nu * area/dx^2... area=dxprod/dx=0.5; /dx=1 -> nu
    visc = nu * (0.25 / 0.5) / 0.5
    u_lo_x = np.asarray(st.lo[1][1])
    # interior u faces away from boundary influence
    np.testing.assert_allclose(u_lo_x[2:-2, 2:-2], visc, rtol=1e-6)
    center_u = np.asarray(st.center[1])
    np.testing.assert_allclose(center_u[2:-2, 2:-2], -4 * visc - beta, rtol=1e-6)
