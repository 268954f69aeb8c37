"""Moving and rotating obstacles stirring a fluid, with passive markers.

The diffpiso_tpu analog of three reference demos at once:
  PhiFlow/demos/moving_obstacle.py — a translating obstacle drags fluid,
  PhiFlow/demos/rotating_bar.py    — a spinning obstacle stirs it,
  PhiFlow/demos/marker.py          — passive tracers advected by the flow.

A disc translates on a circular path (GeometryMovement supplies the rigid
-body velocity from the trajectory's finite difference) while a second,
spinning disc stirs; a dye field rides the velocity as a passive marker.

Run:  python examples/moving_obstacles.py --n 96 --steps 200 [--cpu]
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
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--dt", type=float, default=0.5)
    ap.add_argument("--out", default="runs")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from diffpiso_tpu.app import App, render_dashboard
    from diffpiso_tpu.core.chorin import FlowState, incompressible_flow_step
    from diffpiso_tpu.fields import Box, Domain, PERIODIC, StaggeredField
    from diffpiso_tpu.fields.geometry import Sphere
    from diffpiso_tpu.ops.advect import advect_centered
    from diffpiso_tpu.physics import GeometryMovement, Obstacle

    n = args.n
    domain = Domain((n, n), Box.from_size((float(n), float(n))),
                    boundaries=PERIODIC)
    vel = StaggeredField((jnp.zeros((n, n)), jnp.zeros((n, n))),
                         periodic=(True, True))
    # dye stripes as passive markers (marker.py)
    jj, ii = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    dye = jnp.asarray(((jj // (n // 8)) % 2).astype(np.float32))

    orbit_r, orbit_w = 0.22 * n, 0.15
    mover = GeometryMovement(
        lambda t: Sphere(
            center=(0.5 * n + orbit_r * np.sin(orbit_w * t),
                    0.5 * n + orbit_r * np.cos(orbit_w * t)),
            radius=0.06 * n,
        )
    )
    spinner = Obstacle(Sphere(center=(0.3 * n, 0.3 * n), radius=0.08 * n),
                       angular_velocity=0.6)

    app = App("moving_obstacles", base_dir=args.out, record_every=10)
    state = {"flow": FlowState(velocity=vel), "dye": dye,
             "orbiter": mover.step(Obstacle(mover.geometry_at(0.0)), 0.0, 0.0)}

    def step_fn(s):
        t = app.steps * args.dt
        orbiter = mover.step(s["orbiter"], t, args.dt)
        flow = incompressible_flow_step(
            s["flow"], domain, args.dt, obstacles=[orbiter, spinner], tol=1e-5
        )
        dye = advect_centered(s["dye"], flow.velocity, args.dt, domain.dx)
        return {"flow": flow, "dye": dye, "orbiter": orbiter}

    app.set_step(step_fn, state)
    app.add_field("dye", lambda: app.state["dye"])
    app.add_field(
        "speed",
        lambda: jnp.sqrt(sum(
            c[: n, : n] ** 2 for c in app.state["flow"].velocity.components
        )),
    )
    app.log_every = 20
    for i in range(args.steps):
        app.step()
        if (i + 1) % 50 == 0:
            sp = float(jnp.max(jnp.abs(app.state["flow"].velocity.components[1])))
            print(f"step {i+1}: max|u| = {sp:.3f}")
    path = render_dashboard(app)
    print("dashboard:", path)


if __name__ == "__main__":
    main()
