"""Smoke inflow whose source region moves along a trajectory.

The diffpiso_tpu analog of the reference's moving-inflow demo
(PhiFlow/demos/moving_inflow.py): a sphere inflow oscillates vertically
(center y = 32 + 15 sin(0.1 t), moving_inflow.py:4-5) while buoyant smoke
rises in a CLOSED domain.

Where the library's standard Inflow pre-samples its geometry mask once at
construction (physics/effect.py), a MOVING inflow needs the mask re-sampled
every step — done here in-graph: the antialiased sphere mask is a smooth
jnp function of the (traced) center, so the jitted step takes the center as
an argument and never retraces as the source moves. This is the effect-level
twin of GeometryMovement for obstacles (physics/obstacle.py:48-67).

Run:  python examples/moving_inflow.py --steps 200
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
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--dt", type=float, default=0.5)
    ap.add_argument("--rate", type=float, default=0.2)
    ap.add_argument("--out", default="runs")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from diffpiso_tpu.app import App, render_dashboard
    from diffpiso_tpu.core.chorin import FlowState, incompressible_flow_step
    from diffpiso_tpu.fields import Box, CLOSED, Domain, StaggeredField
    from diffpiso_tpu.fields.geometry import cell_center_points
    from diffpiso_tpu.physics.effect import FieldEffect, GROW

    n = args.n
    box = Box.from_size((float(n), float(n)))
    domain = Domain((n, n), box, boundaries=CLOSED)
    radius = 5.0 * n / 64.0
    pts = cell_center_points((n, n), box)  # (n, n, 2), constant under jit

    def inflow_center(t):
        # moving_inflow.py:4-5, scaled to the domain
        return jnp.stack([
            jnp.asarray(10.0 * n / 64.0),
            (32.0 + 15.0 * jnp.sin(t * 0.1)) * n / 64.0,
        ])

    def sphere_mask(center):
        # antialiased over one cell width (geometry.py:146-155), but from a
        # TRACED center so the source can move without retracing
        sd = jnp.sqrt(jnp.sum((pts - center) ** 2, -1)) - radius
        return jnp.clip(0.5 - sd, 0.0, 1.0)

    vel = StaggeredField(
        (jnp.zeros((n + 1, n)), jnp.zeros((n, n + 1))), periodic=(False, False)
    )
    state = {"flow": FlowState(velocity=vel, density=jnp.zeros((n, n))),
             "t": jnp.asarray(0.0)}

    @jax.jit
    def step(s):
        t = s["t"] + args.dt
        inflow = FieldEffect(sphere_mask(inflow_center(t)) * args.rate,
                             mode=GROW)
        flow = incompressible_flow_step(
            s["flow"], domain, args.dt, buoyancy_factor=0.1,
            density_effects=[inflow], tol=1e-5, rank_deficient=True,
        )
        return {"flow": flow, "t": t}

    app = App("moving_inflow", base_dir=args.out, record_every=10)
    app.set_step(step, state)
    app.add_field("density", lambda: app.state["flow"].density)
    app.add_field(
        "speed",
        lambda: jnp.linalg.norm(app.state["flow"].velocity.at_centers(), axis=-1),
    )
    app.run(args.steps)
    d = app.state["flow"].density
    # the wandering source must have deposited smoke across the sweep range
    ys = np.asarray(jnp.sum(d, axis=1))
    occupied = np.flatnonzero(ys > 0.05 * ys.max())
    print(f"density total {float(jnp.sum(d)):.1f}; smoke spans y rows "
          f"{occupied.min()}..{occupied.max()}")
    print("dashboard:", render_dashboard(app))


if __name__ == "__main__":
    main()
