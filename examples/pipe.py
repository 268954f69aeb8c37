"""Plane channel (pipe) flow driven to the analytic Poiseuille profile.

The diffpiso_tpu analog of PhiFlow/demos/pipe.py, upgraded with a
quantitative oracle: a body force G drives flow between no-slip walls
(periodic x, core/masks.py channel_masks); at steady state the u profile
must match u(y) = G/(2 nu) * y (H - y). Prints the relative L2 error.

Run:  python examples/pipe.py --ny 32 --steps 2500 [--cpu]
(steady state needs ~H^2/nu time units; ~2300 steps at the default dt)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ny", type=int, default=32)
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--nu", type=float, default=0.1)
    ap.add_argument("--force", type=float, default=0.01)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from diffpiso_tpu import Box, Domain, OPEN, PERIODIC
    from diffpiso_tpu.core import SimulationParameters, channel_masks, piso_step
    from diffpiso_tpu.fields import StaggeredField
    from diffpiso_tpu.solvers import AdvectionSolver, PressureSolver

    ny, nx = args.ny, args.nx
    dm, dv, active, accessible, no_slip = channel_masks(ny, nx)
    domain = Domain((ny, nx), Box.from_size((float(ny), float(nx))),
                    boundaries=(OPEN, PERIODIC))
    sim = SimulationParameters(
        dirichlet_mask=dm,
        dirichlet_values=dv,
        active_mask=active,
        accessible_mask=accessible,
        no_slip_mask=no_slip,
        viscosity=args.nu,
        laplace_rank_deficient=True,  # periodic x + closed walls: all-Neumann
        bool_periodic=(False, True),
        linear_solver=AdvectionSolver(max_iterations=100),
        pressure_solver=PressureSolver(max_iterations=400, deflate_mean=True),
    )
    vel = StaggeredField(
        (jnp.zeros((ny + 1, nx), jnp.float32), jnp.zeros((ny, nx), jnp.float32)),
        periodic=(False, True),
    )
    p = domain.centered_grid(0.0)
    forcing = StaggeredField(
        (jnp.zeros((ny + 1, nx), jnp.float32),
         jnp.full((ny, nx), args.force, jnp.float32)),
        periodic=(False, True),
    )
    dt = 0.25 * min(domain.dx) ** 2 / args.nu  # diffusive CFL

    @jax.jit
    def run_chunk(vel, p, g1, g2):
        def body(carry, _):
            vel, p, g1, g2 = carry
            out = piso_step(
                vel, p, dt, domain, sim, forcing_term=forcing,
                pressure_inc1_guess=g1, pressure_inc2_guess=g2,
                advection_tol=1e-7, pressure_tol=1e-7,
            )
            return (out.velocity, out.pressure, out.pressure_inc1,
                    out.pressure_inc2), out.warn

        (vel, p, g1, g2), warns = jax.lax.scan(
            body, (vel, p, g1, g2), None, length=50
        )
        return vel, p, g1, g2, warns

    g1 = jnp.zeros_like(p)
    g2 = jnp.zeros_like(p)
    for chunk in range(max(1, args.steps // 50)):
        vel, p, g1, g2, warns = run_chunk(vel, p, g1, g2)
        assert not bool(jnp.any(warns))
        umax = float(jnp.max(vel.components[1]))
        print(f"step {(chunk+1)*50}: u_max = {umax:.4f}")

    # analytic Poiseuille: u(y) = G/(2 nu) y (H - y), y at cell centers
    H = float(ny) * domain.dx[0]
    yc = (np.arange(ny) + 0.5) * domain.dx[0]
    u_exact = args.force / (2 * args.nu) * yc * (H - yc)
    u_num = np.asarray(vel.components[1]).mean(axis=1)
    rel = np.linalg.norm(u_num - u_exact) / np.linalg.norm(u_exact)
    print(f"Poiseuille profile relative L2 error: {rel:.4f}")
    if args.steps * dt > 0.8 * H * H / args.nu:
        assert rel < 0.05, rel
    else:
        print('(not yet steady: run more steps for the analytic check)')


if __name__ == "__main__":
    main()
