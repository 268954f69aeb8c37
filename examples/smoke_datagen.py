"""Batched smoke-dataset generation: many simulations in parallel, one
Scene per sample.

The diffpiso_tpu analog of the reference's commandline datagen demo
(PhiFlow/demos/smoke_datagen_commandline.py): `count` simulations run in
PARALLEL — the reference uses world.batch_size=10 through its batched TF
graph; here the whole projection step is vmapped, so the batch shares one
compiled program and the per-sample inflow locations (y=8, x random,
smoke_datagen_commandline.py:9-10) enter as a batched mask argument.
Each sample writes its own Scene directory in the reference's
sim_%06d / name_%06d.npz layout (utils/io.py).

Run:  python examples/smoke_datagen.py --count 10 --steps 32
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
    ap.add_argument("--count", type=int, default=10, help="parallel sims")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--dt", type=float, default=1.0)
    ap.add_argument("--out", default="runs/smoke_data")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from diffpiso_tpu.core.chorin import FlowState, incompressible_flow_step
    from diffpiso_tpu.fields import Box, CLOSED, Domain, StaggeredField
    from diffpiso_tpu.fields.geometry import cell_center_points
    from diffpiso_tpu.physics.effect import FieldEffect, GROW
    from diffpiso_tpu.utils.io import Scene

    n, B = args.n, args.count
    box = Box.from_size((float(n), float(n)))
    domain = Domain((n, n), box, boundaries=CLOSED)

    # per-sample inflow spheres: y=8, x uniform in [8, 56] (scaled)
    rng = np.random.default_rng(args.seed)
    xs = 8.0 + rng.uniform(size=B) * 48.0
    centers = np.stack([np.full(B, 8.0), xs], -1) * (n / 64.0)
    pts = cell_center_points((n, n), box)
    masks = jnp.stack([
        jnp.clip(
            0.5 - (jnp.sqrt(jnp.sum((pts - jnp.asarray(c)) ** 2, -1))
                   - 4.0 * n / 64.0),
            0.0, 1.0,
        )
        for c in centers
    ])  # (B, n, n)

    def single_step(state, mask):
        inflow = FieldEffect(mask * 0.5, mode=GROW)
        return incompressible_flow_step(
            state, domain, args.dt, buoyancy_factor=0.2,
            density_effects=[inflow], tol=1e-5, rank_deficient=True,
        )

    batched_step = jax.jit(jax.vmap(single_step))

    vel = StaggeredField(
        (jnp.zeros((B, n + 1, n)), jnp.zeros((B, n, n + 1))),
        periodic=(False, False),
    )
    state = FlowState(velocity=vel, density=jnp.zeros((B, n, n)))

    scenes = [Scene.create(args.out, category="smoke") for _ in range(B)]
    print(f"created {B} scenes starting with {scenes[0].directory}")

    for i in range(args.steps):
        state = batched_step(state, masks)
        d = np.asarray(state.density)
        v = [np.asarray(c) for c in state.velocity.components]
        for b, scene in enumerate(scenes):
            # async: compression runs on the native writer pool while the
            # next batched step executes (utils/io.py wait_pending_writes
            # is the end-of-run barrier)
            scene.write(
                {"density": d[b], "vy": v[0][b], "vx": v[1][b]}, frame=i,
                async_=True,
            )
        if (i + 1) % 8 == 0:
            print(f"step {i + 1}: mean density {d.mean():.4f}, "
                  f"mean |v| {np.mean(np.abs(v[1])):.4f}")

    from diffpiso_tpu.utils.io import wait_pending_writes

    wait_pending_writes()
    print(f'data written to "{os.path.dirname(scenes[0].directory)}" '
          f"({B} sims x {args.steps} frames)")


if __name__ == "__main__":
    main()
