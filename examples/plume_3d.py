"""3-D buoyant plume via the PISO solver, viewable in the WebGL volume view.

The diffpiso_tpu analog of PhiFlow/demos/simpleplume_3d.py: a hot blob
rises in a periodic 3-D box — density is advected semi-Lagrangian (N-d
grid_sample, ops/resample.py), drives a vertical buoyancy forcing on the
axis-0 faces, and the 3-D PISO step keeps the velocity divergence-free
(the reference's native-3-D kernels, central_difference_csr_op.cu.cc:103).

Run:   python examples/plume_3d.py --n 32 --steps 60 [--cpu]
Live:  python examples/plume_3d.py --serve   # then open /volume?field=density
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def advect_centered_3d(data, velocity, dt, dx):
    """Semi-Lagrangian advection of a centered 3-D scalar (grid_sample)."""
    from diffpiso_tpu.ops.resample import resample_field

    n = data.shape
    centered = velocity.at_centers()  # (..., 3) channels in axis order
    coords = jnp.stack(
        jnp.meshgrid(*[(jnp.arange(s) + 0.5) * d for s, d in zip(n, dx)],
                     indexing="ij"),
        axis=-1,
    )
    departure = coords - dt * centered
    return resample_field(data, (0.0,) * 3, dx, departure, modes="circular")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--dt", type=float, default=0.5)
    ap.add_argument("--buoyancy", type=float, default=0.08)
    ap.add_argument("--out", default="runs")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--serve", action="store_true")
    ap.add_argument("--port", type=int, default=8050)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from diffpiso_tpu.app import App, AppServer, render_dashboard
    from diffpiso_tpu.core import piso_step
    from diffpiso_tpu.core.setups import decaying_turbulence_setup
    from diffpiso_tpu.fields import StaggeredField
    from diffpiso_tpu.ops.fv import centered_to_faces

    n = args.n
    domain, sim = decaying_turbulence_setup((n, n, n), viscosity=1e-3,
                                            max_iterations=(60, 300))
    vel = StaggeredField(
        tuple(jnp.zeros((n, n, n), jnp.float32) for _ in range(3)),
        periodic=(True, True, True),
    )
    p = domain.centered_grid(0.0)
    zz, yy, xx = np.meshgrid(np.arange(n), np.arange(n), np.arange(n),
                             indexing="ij")
    density = jnp.asarray(
        np.exp(-(((zz - 0.2 * n) ** 2 + (yy - 0.5 * n) ** 2
                  + (xx - 0.5 * n) ** 2) / (0.08 * n) ** 2)),
        jnp.float32,
    )

    @jax.jit
    def step(vel, p, density, g1, g2):
        density = advect_centered_3d(density, vel, args.dt, domain.dx)
        buoy = centered_to_faces(density * args.buoyancy, 0, "circular")
        forcing = StaggeredField(
            (buoy,) + tuple(jnp.zeros_like(vel.components[i]) for i in (1, 2)),
            periodic=(True, True, True),
        )
        out = piso_step(
            vel, p, args.dt, domain, sim, forcing_term=forcing,
            pressure_inc1_guess=g1, pressure_inc2_guess=g2,
            advection_tol=1e-5, pressure_tol=1e-5,
        )
        return out.velocity, out.pressure, density, out.pressure_inc1, \
            out.pressure_inc2, out.warn

    app = App("plume3d", base_dir=args.out, record_every=0)
    state = dict(vel=vel, p=p, density=density,
                 g1=jnp.zeros_like(p), g2=jnp.zeros_like(p))

    def step_fn(s):
        vel, p, density, g1, g2, warn = step(
            s["vel"], s["p"], s["density"], s["g1"], s["g2"]
        )
        return dict(vel=vel, p=p, density=density, g1=g1, g2=g2)

    app.set_step(step_fn, state)
    app.add_field("density", lambda: app.state["density"])
    app.add_field("w", lambda: app.state["vel"].components[0])

    if args.serve:
        AppServer(app, port=args.port).start(block=True)
        return
    for i in range(args.steps):
        app.step()
        if (i + 1) % 20 == 0:
            zc = float(
                jnp.sum(app.state["density"]
                        * jnp.arange(n)[:, None, None])
                / jnp.sum(app.state["density"])
            )
            print(f"step {i+1}: plume height (cells) = {zc:.2f}")
    print("final max vertical velocity:",
          float(jnp.max(app.state["vel"].components[0])))


if __name__ == "__main__":
    main()
