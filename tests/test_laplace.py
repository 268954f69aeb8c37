"""Oracle tests for the pressure-increment Laplacian assembly."""

import jax.numpy as jnp
import numpy as np
import pytest

from diffpiso_tpu import StaggeredField
from diffpiso_tpu.ops import apply_laplacian, assemble_pressure_laplacian, laplacian_to_dense


def oracle_dense(res, infl, active, accessible, shift_scale):
    ny, nx = res
    n = ny * nx
    L = np.zeros((n, n))
    for j in range(ny):
        for i in range(nx):
            row = j * nx + i
            cj, ci = j + 1, i + 1
            act_c, acc_c = active[cj, ci], accessible[cj, ci]
            cell_not_dead = not (act_c == 0 and acc_c == 0)
            diag = 0.0
            for d, (dj, di) in enumerate([(1, 0), (0, 1)]):
                # face weights: lo face of cell = component-d face at (j, i),
                # hi face at (j, i)+e_d on the component grid
                infl_lo = infl[d][j, i]
                infl_hi = infl[d][j + dj, i + di]
                for sign, infl_f, (nj, ni) in [
                    (-1, infl_lo, (cj - dj, ci - di)),
                    (+1, infl_hi, (cj + dj, ci + di)),
                ]:
                    act_n, acc_n = active[nj, ni], accessible[nj, ni]
                    if not (act_n == 0 and acc_n == 0) and act_c != 0:
                        diag -= infl_f
                    if act_n == 1 and acc_n == 1 and cell_not_dead:
                        jj, ii = j + sign * dj, i + sign * di
                        if 0 <= jj < ny and 0 <= ii < nx:
                            L[row, jj * nx + ii] += infl_f
            L[row, row] = diag
    L += shift_scale
    return L


def make_case(seed=0, res=(4, 5)):
    rng = np.random.RandomState(seed)
    ny, nx = res
    infl = StaggeredField(
        (
            jnp.asarray(np.abs(rng.randn(ny + 1, nx)) + 0.1, jnp.float32),
            jnp.asarray(np.abs(rng.randn(ny, nx + 1)) + 0.1, jnp.float32),
        )
    )
    active = rng.randint(0, 2, (ny + 2, nx + 2)).astype(np.float32)
    accessible = rng.randint(0, 2, (ny + 2, nx + 2)).astype(np.float32)
    return infl, active, accessible


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_laplacian_matches_oracle(seed):
    infl, active, accessible = make_case(seed)
    st = assemble_pressure_laplacian(
        infl, jnp.asarray(active), jnp.asarray(accessible),
        periodic=(False, False), rank_deficient=False,
    )
    assert float(st.shift) == 0.0
    infl_np = [np.asarray(c, np.float64) for c in infl.components]
    expected = oracle_dense((4, 5), infl_np, active, accessible, 0.0)
    np.testing.assert_allclose(laplacian_to_dense(st), expected, rtol=1e-5, atol=1e-6)


def test_rank_one_shift():
    infl, active, accessible = make_case(3)
    st = assemble_pressure_laplacian(
        infl, jnp.asarray(active), jnp.asarray(accessible),
        periodic=(False, False), rank_deficient=True,
    )
    diag = np.asarray(st.center, np.float64)
    expected_shift = 0.1 * np.abs(diag).sum() / diag.size
    np.testing.assert_allclose(float(st.shift), expected_shift, rtol=1e-5)
    # apply includes shift * sum(p)
    p = jnp.asarray(np.random.RandomState(1).randn(4, 5), jnp.float32)
    z = np.asarray(apply_laplacian(st, p))
    dense = laplacian_to_dense(st)
    np.testing.assert_allclose(z.reshape(-1), dense @ np.asarray(p).reshape(-1), rtol=1e-4, atol=1e-4)


def test_interior_uniform_is_five_point():
    # all-fluid interior with constant influence w: classic 5-point Laplacian
    ny, nx = 6, 7
    w = 0.7
    infl = StaggeredField(
        (jnp.full((ny + 1, nx), w, jnp.float32), jnp.full((ny, nx + 1), w, jnp.float32))
    )
    active = np.zeros((ny + 2, nx + 2), np.float32)
    active[1:-1, 1:-1] = 1
    st = assemble_pressure_laplacian(
        infl, jnp.asarray(active), jnp.asarray(active),
        periodic=(False, False), rank_deficient=False,
    )
    center = np.asarray(st.center)
    np.testing.assert_allclose(center[1:-1, 1:-1], -4 * w, rtol=1e-6)
    # boundary cells: dead (active=0, accessible=0) outside neighbors drop
    # both diagonal and off-diagonal contributions (pure Neumann)
    np.testing.assert_allclose(center[0, 1:-1], -3 * w, rtol=1e-6)
    np.testing.assert_allclose(center[0, 0], -2 * w, rtol=1e-6)
    # symmetry for physically consistent masks
    dense = laplacian_to_dense(st)
    np.testing.assert_allclose(dense, dense.T, atol=1e-6)


@pytest.mark.parametrize("rank", [2, 3])
def test_unmasked_periodic_fast_path_matches_masked(rank, monkeypatch):
    """The all-periodic all-ones fast path (host static mask check) must
    produce the identical stencil to the general masked assembly."""
    from diffpiso_tpu.ops import laplace as lap_mod

    rng = np.random.RandomState(3)
    res = (6, 5) if rank == 2 else (4, 6, 5)
    comps = tuple(
        jnp.asarray(np.abs(rng.randn(*res)) + 0.1, jnp.float32)
        for _ in range(rank)
    )
    infl = StaggeredField(comps, periodic=(True,) * rank)
    ones = jnp.ones(tuple(r + 2 for r in res), jnp.float32)

    fast = assemble_pressure_laplacian(
        infl, ones, ones, (True,) * rank, rank_deficient=True
    )
    monkeypatch.setattr(lap_mod, "_host_all_ones", lambda m: False)
    slow = assemble_pressure_laplacian(
        infl, ones, ones, (True,) * rank, rank_deficient=True
    )
    np.testing.assert_allclose(np.asarray(fast.center), np.asarray(slow.center), rtol=1e-6)
    for d in range(rank):
        np.testing.assert_allclose(np.asarray(fast.lo[d]), np.asarray(slow.lo[d]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(fast.hi[d]), np.asarray(slow.hi[d]), rtol=1e-6)
    np.testing.assert_allclose(float(fast.shift), float(slow.shift), rtol=1e-6)


def test_fast_path_declines_under_tracing_and_masks():
    """Tracer-valued or non-ones masks must take the general path (the host
    check is conservative), and results must stay oracle-correct."""
    import jax

    from diffpiso_tpu.ops import laplace as lap_mod

    assert not lap_mod._host_all_ones(
        jnp.zeros((4, 4)).at[1:-1, 1:-1].set(1.0)
    )

    seen = []

    def spy(m):
        seen.append(True)
        return False

    # under jit the closed-over concrete mask is NOT a tracer (fast path ok);
    # a mask that is a jit ARG is a tracer and must decline
    def f(mask):
        return lap_mod._host_all_ones(mask)

    res = jax.jit(lambda m: jnp.asarray(f(m), jnp.float32))(jnp.ones((4, 4)))
    assert float(res) == 0.0
