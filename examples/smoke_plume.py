"""Buoyant smoke plume via the Chorin projection solver + App recording.

The diffpiso_tpu analog of the reference's flagship PhiFlow demo
(PhiFlow/demos/simpleplume.py / smoke_datagen_interactive.py): density is
advected by a divergence-free velocity and drives a buoyancy force; the App
records frames and renders the static HTML dashboard.

Run:  python examples/smoke_plume.py --n 64 --steps 100
Live: python examples/smoke_plume.py --serve            # browser dashboard
      (play/pause/step + live buoyancy slider at http://127.0.0.1:8050/;
      the reference's interactive Dash GUI experience, phi/viz/dash/)
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
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--dt", type=float, default=0.5)
    ap.add_argument("--out", default="runs")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--serve", action="store_true",
                    help="serve the live dashboard instead of a batch run")
    ap.add_argument("--port", type=int, default=8050)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from diffpiso_tpu.app import App, EditableFloat, render_dashboard
    from diffpiso_tpu.core.chorin import FlowState, incompressible_flow_step
    from diffpiso_tpu.fields import Domain, PERIODIC, StaggeredField

    n = args.n
    domain = Domain((n, n), boundaries=PERIODIC)
    vel = StaggeredField(
        (jnp.zeros((n, n)), jnp.zeros((n, n))), periodic=(True, True)
    )
    # a blob of smoke near the bottom
    jj, ii = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    density = jnp.asarray(
        np.exp(-((jj - n * 0.15) ** 2 + (ii - n * 0.5) ** 2) / (n * 0.06) ** 2),
        jnp.float32,
    )

    app = App("smoke_plume", base_dir=args.out, record_every=10)
    buoyancy = app.add_control(EditableFloat("buoyancy", 0.2, (0.0, 2.0)))

    @jax.jit
    def step(state, buoy):
        return incompressible_flow_step(
            state, domain, args.dt, buoyancy_factor=buoy
        )

    # the control value enters as a traced argument so live slider edits
    # take effect without retracing
    app.set_step(lambda s: step(s, jnp.float32(buoyancy.value)),
                 FlowState(velocity=vel, density=density))
    app.add_field("density", lambda: app.state.density)
    app.add_field(
        "speed",
        lambda: jnp.linalg.norm(app.state.velocity.at_centers(), axis=-1),
    )
    if args.serve:
        from diffpiso_tpu.app import show

        show(app, port=args.port)  # blocks; ctrl-c to exit
        return
    app.run(args.steps)
    print("dashboard:", render_dashboard(app))
    print("scene:", app.scene.directory, "frames:", app.scene.frames("density"))


if __name__ == "__main__":
    main()
