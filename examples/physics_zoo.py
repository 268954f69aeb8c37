"""Run the classic physics families side by side in one World.

The diffpiso_tpu analog of the reference's small PhiFlow demos
(PhiFlow/demos/burgers_sim.py, heat_equilibrium.py, reactiondiffusion.py,
wavepacket.py, flame.py): Burgers, heat diffusion, Gray-Scott patterns,
a quantum wave packet, and Kuramoto-Sivashinsky chaos — all stepped by one
jitted World function.

Run:  python examples/physics_zoo.py --steps 200
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
    ap.add_argument("--dt", type=float, default=0.02)
    ap.add_argument("--out", default="runs")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from diffpiso_tpu.app import App, render_dashboard
    from diffpiso_tpu.fields import noise
    from diffpiso_tpu.physics import (
        Burgers,
        HeatDiffusion,
        KuramotoSivashinsky,
        Pattern,
        ReactionDiffusion,
        Schroedinger,
        World,
        harmonic_potential,
        psquare,
        seed_pattern,
        wave_packet,
    )

    n = args.n
    key = jax.random.PRNGKey(0)
    world = World()
    world.add(
        "burgers",
        noise(key, (n, n), channels=2, scale=6.0),
        Burgers(dx=1.0 / n, periodic=True, default_viscosity=0.002),
    )
    world.add(
        "heat",
        noise(jax.random.fold_in(key, 1), (n, n), scale=4.0),
        HeatDiffusion(diffusivity=0.05, dx=1.0 / n, periodic=True),
    )
    world.add(
        "pattern",
        Pattern(
            u=jnp.ones((n, n)) - 0.5 * seed_pattern((n, n), "EXP", size=5),
            v=0.25 * seed_pattern((n, n), "EXP", size=5),
        ),
        ReactionDiffusion(),
    )
    world.add(
        "qwave",
        wave_packet((n, n), (n * 0.5, n * 0.3), n * 0.06, (0.0, 1.0)),
        Schroedinger(mass=0.2),
    )
    world.add(
        "ks",
        noise(jax.random.fold_in(key, 2), (128,), scale=4.0) * 0.1,
        KuramotoSivashinsky(),
    )

    step_fn = world.jitted_step(dt=args.dt)

    app = App("physics_zoo", base_dir=args.out, record_every=max(args.steps // 5, 1))
    app.set_step(step_fn, world.collection.values_pytree())
    app.add_field("burgers_speed", lambda: jnp.linalg.norm(app.state["burgers"], axis=-1))
    app.add_field("heat", lambda: app.state["heat"])
    app.add_field("pattern_v", lambda: app.state["pattern"].v)
    app.add_field("qwave_p", lambda: psquare(app.state["qwave"]))
    app.add_field("ks", lambda: app.state["ks"])
    app.run(args.steps)

    for name, v in app.state.items():
        leaves = jax.tree_util.tree_leaves(v)
        ok = all(np.isfinite(np.asarray(l)).all() for l in leaves)
        print(f"  {name:12s} finite={ok}")
        assert ok, name
    print("dashboard:", render_dashboard(app))


if __name__ == "__main__":
    main()
