"""Heat relaxation: a heated plate and a movable cold sphere.

One-to-one analog of PhiFlow/demos/heat_equilibrium.py: a horizontal plate
near the top is heated (HeatSource, rate 1) and a sphere at the bottom is
cooled (ColdSource, rate 1); the sphere position is an editable control
(the reference exposes EditableInt X/Y sliders; here --sphere-y/--sphere-x
plus live App controls). Diffusion (diffusivity 0.2) relaxes the field
toward the equilibrium between the two sources — the script reports the
step-to-step residual as it settles.

Run:  python examples/heat_equilibrium.py --steps 300 [--cpu]
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
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--dt", type=float, default=1.0)
    ap.add_argument("--sphere-y", type=int, default=20)
    ap.add_argument("--sphere-x", type=int, default=32)
    ap.add_argument("--out", default="runs")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from diffpiso_tpu.app import App, EditableInt, render_dashboard
    from diffpiso_tpu.fields import Box, BoxGeometry, Sphere
    from diffpiso_tpu.physics import ColdSource, HeatDiffusion, HeatSource

    n = args.n
    f = n / 64.0  # reference domain is 64^2; scale its geometry with --n
    box = Box.from_size((float(n), float(n)))
    physics = HeatDiffusion(diffusivity=0.2, dx=1.0, periodic=False)
    # heated plate spanning the domain near the top (reference
    # box[44:46, 0:64] in its x-first convention)
    plate = HeatSource(
        BoxGeometry(Box((44.0 * f, 0.0), (46.0 * f, float(n)))), (n, n), box,
        rate=1.0,
    )

    app = App("heat_equilibrium", base_dir=args.out,
              record_every=max(args.steps // 6, 1))
    cx = app.add_control(EditableInt("X", args.sphere_x, (14, 50)))
    cy = app.add_control(EditableInt("Y", args.sphere_y, (4, 40)))

    def cold_source():
        return ColdSource(
            Sphere((cy.value * f, cx.value * f), max(4.0 * f, 1.5)), (n, n),
            box, rate=1.0,
        )

    def step_fn(t):
        effects = (plate.field, cold_source().field)
        return physics.step(t, dt=args.dt, effects=effects)

    app.set_step(step_fn, jnp.zeros((n, n), jnp.float32))
    app.add_field("temperature", lambda: app.state)

    prev = app.state
    for i in range(args.steps):
        app.step()
        if (i + 1) % max(args.steps // 5, 1) == 0:
            resid = float(jnp.max(jnp.abs(app.state - prev)))
            print(
                f"step {i+1}: T in [{float(jnp.min(app.state)):+.3f}, "
                f"{float(jnp.max(app.state)):+.3f}]  step residual {resid:.2e}"
            )
        prev = app.state

    t = np.asarray(app.state)
    assert np.isfinite(t).all()
    assert t.max() > 0.0 and t.min() < 0.0, "both sources should imprint"
    print("dashboard:", render_dashboard(app))


if __name__ == "__main__":
    main()
