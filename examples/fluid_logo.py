"""Buoyant smoke around a logo built from box obstacles.

The diffpiso_tpu analog of the reference's fluid-logo demo
(PhiFlow/demos/fluid_logo.py): a CLOSED domain containing the TUM logo as
a union of axis-aligned box obstacles (fluid_logo.py:19-22), three
inflows of different rates (fluid_logo.py:30), and buoyant smoke that
rises through the lettering. Exercises the obstacle hard-BC path and
GROW-mode density effects together in one projection-solver flow.

Run:  python examples/fluid_logo.py --steps 200
Live: python examples/fluid_logo.py --serve
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def tum_logo_obstacles(scale, Obstacle, BoxGeometry):
    """The reference's create_tum_logo (fluid_logo.py:19-22), boxes given
    as (y, x) lower/upper corners on the 100x100 design grid."""
    obs = []
    for x in range(1, 10, 2):
        obs.append(((41, 15 + x * 7), (83, 15 + (x + 1) * 7)))
    obs += [((41, 43), (48, 50)), ((83, 15), (90, 43)), ((83, 50), (90, 85))]
    from diffpiso_tpu.fields import Box

    return [
        Obstacle(BoxGeometry(Box(
            (lo[0] * scale, lo[1] * scale), (hi[0] * scale, hi[1] * scale)
        )))
        for lo, hi in obs
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--dt", type=float, default=0.5)
    ap.add_argument("--out", default="runs")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--serve", action="store_true")
    ap.add_argument("--port", type=int, default=8050)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from diffpiso_tpu.app import App, EditableFloat, render_dashboard
    from diffpiso_tpu.core.chorin import FlowState, incompressible_flow_step
    from diffpiso_tpu.fields import (
        Box,
        BoxGeometry,
        CLOSED,
        Domain,
        StaggeredField,
    )
    from diffpiso_tpu.physics import Obstacle
    from diffpiso_tpu.physics.effect import Inflow

    n = args.n
    scale = n / 100.0  # the reference designs on box[0:100, 0:100]
    box = Box.from_size((float(n), float(n)))
    domain = Domain((n, n), box, boundaries=CLOSED)
    obstacles = tum_logo_obstacles(scale, Obstacle, BoxGeometry)

    # three inflows, rates 1.0 / 0.8 / 0.1 (fluid_logo.py:30)
    def inflow_box(lo, hi, rate):
        return Inflow(
            BoxGeometry(Box((lo[0] * scale, lo[1] * scale),
                            (hi[0] * scale, hi[1] * scale))),
            (n, n), box, rate=rate,
        )

    density_effects = [
        inflow_box((6, 14), (10, 21), 1.0),
        inflow_box((6, 79), (10, 86), 0.8),
        inflow_box((49, 43), (50, 46), 0.1),
    ]

    vel = StaggeredField(
        (jnp.zeros((n + 1, n)), jnp.zeros((n, n + 1))), periodic=(False, False)
    )
    state = FlowState(velocity=vel, density=jnp.zeros((n, n)))

    app = App("fluid_logo", base_dir=args.out, record_every=10)
    buoyancy = app.add_control(EditableFloat("buoyancy", 0.1, (0.0, 1.0)))

    @jax.jit
    def step(s, buoy):
        return incompressible_flow_step(
            s, domain, args.dt, buoyancy_factor=buoy,
            obstacles=obstacles, density_effects=density_effects, tol=1e-5,
            rank_deficient=True,  # CLOSED walls + solid obstacles: all-Neumann
        )

    app.set_step(lambda s: step(s, jnp.float32(buoyancy.value)), state)
    app.add_field("density", lambda: app.state.density)
    app.add_field(
        "speed",
        lambda: jnp.linalg.norm(app.state.velocity.at_centers(), axis=-1),
    )
    if args.serve:
        from diffpiso_tpu.app import show

        show(app, port=args.port)
        return
    app.run(args.steps)
    d = app.state.density
    print(f"density: total {float(jnp.sum(d)):.1f}, max {float(jnp.max(d)):.3f}")
    print("dashboard:", render_dashboard(app))


if __name__ == "__main__":
    main()
