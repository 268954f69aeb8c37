"""A spinning bar stirring a closed box of fluid.

One-to-one analog of PhiFlow/demos/rotating_bar.py: a thin bar obstacle
rotates at a constant angular velocity (the reference updates the obstacle
with `geometry.rotated(angular_velocity * dt)` and copies the rate onto
`obstacle.angular_velocity` so the projection sees the rigid-body swirl).
Here the bar is a `RotatedBox` whose angle advances each step; the
obstacle's `angular_velocity` feeds `apply_obstacle_velocities`, so the
fluid is dragged by the true tangential wall velocity — check the swirl
direction and the projected divergence below.

Run:  python examples/rotating_bar.py --n 128 --steps 120 [--cpu]
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
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--dt", type=float, default=1.0)
    ap.add_argument("--omega", type=float, default=0.1,
                    help="bar angular velocity (reference default 0.1)")
    ap.add_argument("--out", default="runs")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from diffpiso_tpu.app import App, render_dashboard
    from diffpiso_tpu.core.chorin import FlowState, incompressible_flow_step
    from diffpiso_tpu.fields import (
        Box,
        CLOSED,
        Domain,
        RotatedBox,
        StaggeredField,
        geometry_mask,
    )
    from diffpiso_tpu.ops.fv import fv_divergence
    from diffpiso_tpu.physics import Obstacle

    n = args.n
    size = 100.0  # reference: Domain([128,128], CLOSED, box=box([100,100]))
    box = Box.from_size((size, size))
    domain = Domain((n, n), box, boundaries=CLOSED)
    vel = StaggeredField(
        (jnp.zeros((n + 1, n)), jnp.zeros((n, n + 1))), periodic=(False, False)
    )
    # the bar: long in x, thin in y, centered (reference box[10:90, 48:52]
    # in its x-first convention)
    bar = Obstacle(
        RotatedBox(center=(50.0, 50.0), half_size=(2.0, 40.0), angle=0.0),
        angular_velocity=args.omega,
    )

    app = App("rotating_bar", base_dir=args.out,
              record_every=max(args.steps // 6, 1))
    state = {"flow": FlowState(velocity=vel), "bar": bar}

    def step_fn(s):
        bar = s["bar"]
        bar = Obstacle(
            bar.geometry.rotated(args.omega * args.dt),
            angular_velocity=args.omega,
        )
        flow = incompressible_flow_step(
            s["flow"], domain, args.dt, obstacles=[bar], tol=1e-5,
            rank_deficient=True,  # CLOSED walls: all-Neumann pressure
        )
        return {"flow": flow, "bar": bar}

    app.set_step(step_fn, state)
    app.add_field(
        "domain",
        lambda: geometry_mask(app.state["bar"].geometry, (n, n), box,
                              antialias=True),
    )
    app.add_field(
        "speed",
        lambda: jnp.sqrt(
            app.state["flow"].velocity.components[0][:n, :n] ** 2
            + app.state["flow"].velocity.components[1][:n, :n] ** 2
        ),
    )
    for i in range(args.steps):
        app.step()
        if (i + 1) % max(args.steps // 4, 1) == 0:
            v = app.state["flow"].velocity
            div = fv_divergence(v, domain.dx)
            fluid = 1.0 - geometry_mask(app.state["bar"].geometry, (n, n), box)
            print(
                f"step {i+1}: max|u| = {float(jnp.max(jnp.abs(v.components[1]))):.3f}"
                f"  max|div| (fluid) = {float(jnp.max(jnp.abs(div * fluid))):.2e}"
            )
    speed = np.asarray(app.fields["speed"]())
    assert np.isfinite(speed).all()
    assert speed.max() > 1e-3, "bar should have stirred the fluid"
    print("dashboard:", render_dashboard(app))


if __name__ == "__main__":
    main()
