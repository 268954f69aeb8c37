"""Lid-driven cavity — the code-validation case (reference:
lid_driven_cavity_2d.py). Runs the PISO solver to steady state and writes
velocity/pressure snapshots; at Re=1000 the centerline profiles converge to
the Ghia et al. (1982) benchmark.

Usage:
    python examples/lid_driven_cavity.py [--N 128] [--re 1000] [--steps 2500]
        [--dt 0.01] [--out runs/ldc] [--plot]

TPU-native differences from the reference: the whole rollout runs on device
via one jitted step under a python loop (or lax.scan inside snapshot
intervals) — no placeholder feeds, no host round trips; the solver accuracy
schedule (loose for the first 5 steps, then tight — reference
lid_driven_cavity_2d.py:70-78,110-111) is a traced runtime value.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from diffpiso_tpu import Box, Domain, OPEN
from diffpiso_tpu.core import SimulationParameters, lid_driven_cavity_masks, piso_step
from diffpiso_tpu.solvers import AdvectionSolver, PressureSolver


def build(N, re, f64=False):
    dm, dv, active, accessible, no_slip = lid_driven_cavity_masks(N)
    domain = Domain((N + 1, N), Box.from_size((1.0 + 1.0 / N, 1.0)), boundaries=OPEN)
    dtype = "float64" if f64 else None
    sim = SimulationParameters(
        dirichlet_mask=dm,
        dirichlet_values=dv,
        active_mask=active,
        accessible_mask=accessible,
        no_slip_mask=no_slip,
        viscosity=1.0 / re,
        laplace_rank_deficient=True,
        linear_solver=AdvectionSolver(max_iterations=100, dtype=dtype),
        pressure_solver=PressureSolver(
            max_iterations=1000,
            dtype=dtype,
            deflate_mean=True,
            preconditioner="dct",
            adjoint_preconditioner="dct",
        ),
    )
    return domain, sim


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=128)
    ap.add_argument("--re", type=float, default=1000.0)
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--dt", type=float, default=0.01)
    ap.add_argument("--out", type=str, default="runs/ldc")
    ap.add_argument("--snapshot-every", type=int, default=100)
    ap.add_argument("--f64", action="store_true", help="float64 solves (CPU oracle)")
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args()

    domain, sim = build(args.N, args.re, args.f64)
    os.makedirs(args.out, exist_ok=True)

    @jax.jit
    def step(vel, p, tol):
        out = piso_step(vel, p, args.dt, domain, sim, advection_tol=tol, pressure_tol=tol)
        return out.velocity, out.pressure, out.warn, out.p_iterations

    vel = domain.staggered_grid(0.0)
    p = domain.centered_grid(0.0)

    tol = 1e-3  # loosened for the first 5 steps like the reference
    t0 = time.perf_counter()
    for i in range(args.steps):
        vel, p, warn, p_iters = step(vel, p, jnp.float32(tol))
        if i == 5:
            tol = 1e-8 if args.f64 else 3e-6
        if i % args.snapshot_every == 0:
            jax.block_until_ready(p)
            print(
                f"step {i:5d}  warn={bool(warn)}  p_iters={np.asarray(p_iters)}  "
                f"u_mid={float(vel.components[1][args.N // 2, args.N // 2]):+.5f}  "
                f"({(time.perf_counter() - t0):.1f}s)"
            )
            np.savez(
                os.path.join(args.out, f"state_{i:06d}.npz"),
                velocity=np.asarray(vel.staggered_tensor()),
                pressure=np.asarray(p),
            )
    jax.block_until_ready(p)
    dtime = time.perf_counter() - t0
    print(f"done: {args.steps} steps in {dtime:.1f}s ({args.steps / dtime:.2f} steps/s)")
    np.savez(
        os.path.join(args.out, "state_final.npz"),
        velocity=np.asarray(vel.staggered_tensor()),
        pressure=np.asarray(p),
    )

    # centerline profiles for Ghia comparison
    u = np.asarray(vel.components[1])
    v = np.asarray(vel.components[0])
    u_centerline = u[: args.N, args.N // 2]  # u(y) at x=0.5 (cavity rows only)
    v_centerline = 0.5 * (v[: args.N + 1, args.N // 2 - 1] + v[: args.N + 1, args.N // 2])
    np.savez(os.path.join(args.out, "centerlines.npz"), u=u_centerline, v=v_centerline)
    print("u(y) centerline min/max:", u_centerline.min(), u_centerline.max())

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from diffpiso_tpu.ops import vorticity

        fig, axes = plt.subplots(2, 2, figsize=(10, 10))
        for ax, (data, title) in zip(
            axes.flat,
            [
                (np.asarray(vel.components[0]), "$v$"),
                (np.asarray(vel.components[1]), "$u$"),
                (np.asarray(vorticity(vel, domain.dx)), r"$\omega$"),
                (np.asarray(p), "$p$"),
            ],
        ):
            im = ax.imshow(data, origin="lower")
            ax.set_title(title)
            fig.colorbar(im, ax=ax)
        fig.savefig(os.path.join(args.out, "final.png"), dpi=100)
        print("plot saved")


if __name__ == "__main__":
    main()
