"""Headline benchmark: PISO steps/sec at 512^2, forward and with a 30-step
unrolled gradient (the protocol from SURVEY.md par.6 / BASELINE.md).

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N/BASELINE}

The reference repo publishes no numbers (BASELINE.md), so vs_baseline is
computed against a documented nominal estimate of the CUDA reference at this
workload: REFERENCE_NOMINAL_STEPS_PER_SEC below. All diagnostics go to
stderr; only the JSON line goes to stdout.

Workload definition (mirrors the reference's training configuration,
spatial_mixing_layer_differentiable_training.py:30-62 scaled to 512^2):
  - lid-cavity-style bounded domain at 512^2, float32 on TPU
  - solver tolerance 1e-6 (training-grade; reference solver_precision)
  - "fwd+grad30": one jax.grad evaluation of a 30-step unrolled rollout
    w.r.t. a forcing field; steps/s counts the 30 physics steps per grad
    evaluation (each includes its adjoint solves, like the reference's
    unrolled training iteration).
"""

import argparse
import json
import sys
import time

import numpy as np

# Rough, documented estimate of the CUDA/TF1 reference on its era GPU for the
# same metric (no published numbers exist; see BASELINE.md). Forward step at
# 512^2 ~ 30 ms (dual BiCGSTAB-ILU + 2x f64 CG + per-step host round trip of
# the full state, README.md:104-117) -> ~33 steps/s forward; a 30-step
# unrolled grad roughly doubles the solve count -> ~15 steps/s.
REFERENCE_NOMINAL_FWD = 33.0
REFERENCE_NOMINAL_GRAD30 = 15.0


def build(n, tol, max_p_iter=600):
    import jax.numpy as jnp

    from diffpiso_tpu import Box, Domain, OPEN
    from diffpiso_tpu.core import (
        SimulationParameters,
        lid_driven_cavity_masks,
        piso_step,
    )
    from diffpiso_tpu.solvers import AdvectionSolver, PressureSolver

    dm, dv, active, accessible, no_slip = lid_driven_cavity_masks(n)
    domain = Domain((n + 1, n), Box.from_size((1.0 + 1.0 / n, 1.0)), boundaries=OPEN)
    sim = SimulationParameters(
        dirichlet_mask=dm,
        dirichlet_values=dv,
        active_mask=active,
        accessible_mask=accessible,
        no_slip_mask=no_slip,
        viscosity=1e-3,
        laplace_rank_deficient=True,
        linear_solver=AdvectionSolver(max_iterations=100),
        pressure_solver=PressureSolver(
            max_iterations=max_p_iter,
            deflate_mean=True,
            # Neumann-exact spectral preconditioner: measured 2 iterations /
            # 5.8 ms per cold 512^2 adjoint solve vs 32 it / 11.8 ms for
            # "fft" and 248 it / 10.2 ms unpreconditioned.
            preconditioner="dct",
            adjoint_preconditioner="dct",
        ),
    )
    dt = 0.2 / n  # CFL-ish for lid speed 1

    def step(vel, p, g1, g2, forcing):
        out = piso_step(
            vel, p, dt, domain, sim,
            forcing_term=forcing,
            pressure_inc1_guess=g1,
            pressure_inc2_guess=g2,
            advection_tol=tol,
            pressure_tol=tol,
        )
        return out

    return domain, sim, step


def bench_forward(domain, step, steps_per_call, reps):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(vel, p):
        def body(carry, _):
            vel, p, g1, g2 = carry
            out = step(vel, p, g1, g2, None)
            return (out.velocity, out.pressure, out.pressure_inc1, out.pressure_inc2), out.p_iterations

        (vel, p, _, _), iters = jax.lax.scan(
            body, (vel, p, jnp.zeros_like(p), jnp.zeros_like(p)), None,
            length=steps_per_call,
        )
        return vel, p, iters

    vel = domain.staggered_grid(0.0)
    p = domain.centered_grid(0.0)
    # spin up so the flow (and solver iteration counts) are realistic
    vel, p, iters = run(vel, p)
    jax.block_until_ready(p)
    t0 = time.perf_counter()
    total_iters = []
    for _ in range(reps):
        vel, p, iters = run(vel, p)
    jax.block_until_ready(p)
    dt_total = time.perf_counter() - t0
    sps = steps_per_call * reps / dt_total
    print(
        f"[bench] fwd: {sps:.2f} steps/s "
        f"(mean pressure iters/step: {np.asarray(iters).mean(0)})",
        file=sys.stderr,
    )
    return sps


def bench_grad(domain, step, unroll, reps):
    import jax
    import jax.numpy as jnp

    vel0 = domain.staggered_grid(0.0)
    p0 = domain.centered_grid(0.0)
    forcing0 = domain.staggered_grid(0.0)

    def loss_fn(forcing, vel, p):
        def body(carry, _):
            vel, p, g1, g2 = carry
            out = step(vel, p, g1, g2, forcing)
            return (out.velocity, out.pressure, out.pressure_inc1, out.pressure_inc2), None

        (vel, p, _, _), _ = jax.lax.scan(
            body, (vel, p, jnp.zeros_like(p), jnp.zeros_like(p)), None, length=unroll
        )
        return sum(jnp.sum(c**2) for c in vel.components)

    grad_fn = jax.jit(jax.grad(loss_fn))
    g = grad_fn(forcing0, vel0, p0)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(reps):
        g = grad_fn(forcing0, vel0, p0)
    jax.block_until_ready(g)
    dt_total = time.perf_counter() - t0
    sps = unroll * reps / dt_total
    print(f"[bench] grad{unroll}: {sps:.2f} unrolled steps/s per grad eval", file=sys.stderr)
    return sps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--quick", action="store_true", help="small CPU smoke run")
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()

    if args.quick:
        args.n = 64

    import os

    import jax

    # Persistent compilation cache: the 512^2 scan+grad programs take minutes
    # to compile on the tunneled TPU; caching makes reruns start in seconds.
    cache_dir = os.environ.get(
        "DIFFPISO_JAX_CACHE", os.path.expanduser("~/.cache/diffpiso_jax_cache")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    print(f"[bench] devices: {jax.devices()}", file=sys.stderr)
    domain, sim, step = build(args.n, args.tol)

    steps_per_call = 5 if args.quick else 20
    reps = 2 if args.quick else 3
    fwd_sps = bench_forward(domain, step, steps_per_call, reps)

    if args.fwd_only:
        result = {
            "metric": f"piso_steps_per_sec_{args.n}sq_fwd",
            "value": round(fwd_sps, 3),
            "unit": "steps/s",
            "vs_baseline": round(fwd_sps / REFERENCE_NOMINAL_FWD, 3),
        }
        print(json.dumps(result))
        return

    unroll = 5 if args.quick else 30
    grad_sps = bench_grad(domain, step, unroll, 1 if args.quick else 2)

    result = {
        "metric": f"piso_steps_per_sec_{args.n}sq_fwd_plus_grad{unroll}",
        "value": round(grad_sps, 3),
        "unit": "steps/s",
        "vs_baseline": round(grad_sps / REFERENCE_NOMINAL_GRAD30, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
