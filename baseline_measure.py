"""Measure the reference-protocol CPU baseline for bench.py's vs_baseline.

Provenance chain (VERDICT round-1 item 2; full derivation in BASELINE.md):

The reference repository publishes no performance numbers. Its own
BASELINE.json names "Lid-driven cavity 2D (lid_driven_cavity_2d.py, scipy
linear solves on CPU)" as a canonical configuration: the reference ships
`LinearSolverScipy` (diffpiso/linear_solver.py:33-57), which performs every
momentum solve with `scipy.sparse.linalg.spsolve` on the CSR matrix and whose
gradient is one transposed spsolve; pressure corrections on the CPU path use
the same sparse direct machinery (PhiFlow's SparseSciPy solver,
phi/physics/pressuresolver/sparse.py). This script reproduces that protocol
at the benchmark workload (512^2 lid cavity) ON THIS MACHINE and times it:

  per forward PISO step (piso_tf.py:11-81):
    - assemble + LU-factorize + solve the u and v advection systems
      (matrices change every step: they linearize around the velocity)
    - LU-factorize the pressure Laplacian once (it also changes per step:
      influence = 1/(beta - A)) and back-substitute twice (correctors 1, 2)
  per backward (adjoint) step (linear_solver.py:163-175,
  piso_cuda_pressure_solver.py:90-109):
    - one TRANSPOSED advection solve per component (reusing the forward
      factorization via SuperLU trans='T' — generous to the reference,
      which re-ran spsolve from scratch)
    - two more pressure back-substitutions (L is symmetric)

  grad30 steps/s = 30-step-unrolled-gradient protocol = each step pays
  forward + adjoint cost (matching bench.py's metric definition).

Matrices are assembled by this repo's stencil ops — proven entry-by-entry
equal to the reference's CUDA assembly by the oracle tests
(tests/test_stencil.py, tests/test_laplace.py) — around a band-limited
random velocity field scaled to the lid speed, so magnitudes and sparsity
match a developed flow. The singular all-Neumann pressure system is handled
by pinning one row (identity) + zero-mean projection, the sparse-direct
equivalent of the reference's rank-one shift (pressure_solve_op.cu.cc:161-172).

Run:  JAX_PLATFORMS=cpu python baseline_measure.py [--n 512] [--reps 3]
Writes BASELINE_MEASURED.json and prints the numbers to paste into bench.py.
"""

import argparse
import json
import time

import numpy as np


def smooth_noise(shape, seed, amplitude=1.0, cutoff=16):
    """Band-limited random field (so advective fluxes look like a developed
    flow rather than white noise)."""
    rng = np.random.RandomState(seed)
    f = rng.randn(*shape)
    F = np.fft.rfft2(f)
    ky = np.fft.fftfreq(shape[0])[:, None] * shape[0]
    kx = np.fft.rfftfreq(shape[1])[None, :] * shape[1]
    F *= np.exp(-(ky**2 + kx**2) / (2 * cutoff**2))
    g = np.fft.irfft2(F, s=shape)
    return (amplitude * g / np.max(np.abs(g))).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--case", default="cavity", choices=["cavity", "turb"])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    import bench
    from diffpiso_tpu.core.piso import piso_step
    from diffpiso_tpu.fields.grid import StaggeredField
    from diffpiso_tpu.ops.laplace import assemble_pressure_laplacian
    from diffpiso_tpu.ops.stencil import assemble_advection_stencil
    from diffpiso_tpu.solvers.scipy_solver import (
        laplacian_to_scipy_csr,
        stencil_to_scipy_csr,
    )

    n = args.n
    if args.case == "cavity":
        domain, sim, step = bench.build(n, 1e-6)
        dt = 0.2 / n
        # developed-flow-like velocity (see module docstring)
        vel = StaggeredField(
            (
                jnp.asarray(smooth_noise((n + 2, n), 0)),
                jnp.asarray(smooth_noise((n + 1, n + 1), 1)),
            )
        )
    else:  # turb: periodic box, the headline workload's system
        domain, sim, step, initial_state = bench.build_turbulence(n, 1e-6)
        dt = 0.4 / n
        vel, _ = initial_state(seed=0)
    dx = domain.dx
    beta = float(np.prod(dx)) / dt

    st = assemble_advection_stencil(
        vel, dx, domain.velocity_pad_modes(), sim.viscosity, beta,
        sim.dirichlet_mask, sim.active_mask, sim.accessible_mask,
        sim.no_slip_mask, sim.bool_periodic,
    )
    influence = StaggeredField(
        tuple(1.0 / (beta - a) for a in st.diag_A), periodic=sim.bool_periodic
    )
    lap = assemble_pressure_laplacian(
        influence, sim.active_mask, sim.accessible_mask, sim.bool_periodic,
        rank_deficient=True,
    )

    timings = {}

    def timeit(name, fn, reps=args.reps):
        fn()  # warm-up (allocator, caches)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        dt_ = (time.perf_counter() - t0) / reps
        timings[name] = dt_
        print(f"  {name}: {dt_*1e3:.1f} ms")
        return out

    print(f"[baseline] scipy-CPU reference protocol at {n}^2")

    # advection systems: factorize + solve each step (matrix is per-step)
    adv_lu = []
    for c in range(2):
        m = stencil_to_scipy_csr(st, c).tocsc()
        rhs = np.random.RandomState(2 + c).randn(m.shape[0])
        lu_holder = {}

        def facsolve(m=m, rhs=rhs, h=lu_holder):
            h["lu"] = spla.splu(m)
            return h["lu"].solve(rhs)

        timeit(f"advection[{c}] splu+solve", facsolve)
        adv_lu.append(lu_holder["lu"])

    # transposed advection solves (adjoint; factorization reused)
    for c in range(2):
        rhs = np.random.RandomState(10 + c).randn(adv_lu[c].shape[0])
        timeit(f"advection[{c}] transpose solve", lambda lu=adv_lu[c], r=rhs: lu.solve(r, trans="T"))

    # pressure: pin row 0 (rank-one-shift equivalent), factorize once/step,
    # 2 forward + 2 adjoint back-substitutions
    L, _shift = laplacian_to_scipy_csr(lap)
    L = L.tolil()
    # inactive cells (the cavity's dummy row) have all-zero rows: identity
    # them for the direct factorization (the iterative path handles them via
    # zero rhs + the rank-one shift)
    diag = np.asarray(lap.center).ravel()
    dead = np.where(diag == 0.0)[0]
    for i in dead:
        L[i, i] = 1.0
    # all-Neumann null space: pin the first active cell (sparse-direct
    # equivalent of the reference's rank-one shift)
    pin = int(np.where(diag != 0.0)[0][0])
    L[pin, :] = 0.0
    L[pin, pin] = 1.0
    L = L.tocsc()
    ph = {}

    def p_factor():
        ph["lu"] = spla.splu(L)
        return ph["lu"]

    timeit("pressure splu (1x/step)", p_factor)
    prhs = np.random.RandomState(5).randn(L.shape[0])
    prhs -= prhs.mean()
    timeit("pressure back-substitution", lambda: ph["lu"].solve(prhs))

    fwd_step = (
        timings["advection[0] splu+solve"]
        + timings["advection[1] splu+solve"]
        + timings["pressure splu (1x/step)"]
        + 2 * timings["pressure back-substitution"]
    )
    adjoint_extra = (
        timings["advection[0] transpose solve"]
        + timings["advection[1] transpose solve"]
        + 2 * timings["pressure back-substitution"]
    )
    grad_step = fwd_step + adjoint_extra

    result = {
        "protocol": "reference scipy-CPU config (see baseline_measure.py docstring / BASELINE.md)",
        "case": args.case,
        "n": n,
        "fwd_steps_per_sec": round(1.0 / fwd_step, 4),
        "grad30_steps_per_sec": round(1.0 / grad_step, 4),
        "fwd_step_seconds": fwd_step,
        "grad_step_seconds": grad_step,
        "component_timings_seconds": timings,
    }
    with open(f"BASELINE_MEASURED_{args.case}.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in ("fwd_steps_per_sec", "grad30_steps_per_sec")}))


if __name__ == "__main__":
    main()
