"""Forward DNS of the spatially-evolving mixing layer (reference:
spatial_mixing_layer.py). The whole snapshot interval runs on device inside
one jitted scan — no per-step host round trips.

Usage:
    python examples/spatial_mixing_layer.py [--hrres 128 512] [--steps 2000]
        [--out runs/sml] [--save-every 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from diffpiso_tpu.core import piso_step, spatial_mixing_layer_setup
from diffpiso_tpu.utils import Scene, StepTimer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hrres", type=int, nargs=2, default=[128, 512])
    ap.add_argument("--box", type=float, nargs=2, default=[64.0, 256.0])
    ap.add_argument("--dt", type=float, default=0.2)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--save-every", type=int, default=50)
    ap.add_argument("--perturbation", type=float, nargs=2, default=[0.082, 0.018])
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--out", type=str, default="runs/sml")
    args = ap.parse_args()

    setup = spatial_mixing_layer_setup(
        simulation=dict(
            HRres=tuple(args.hrres), box_size=tuple(args.box), dt=args.dt
        ),
        max_iterations=(500, 2000),
    )
    scene = Scene.create(args.out, "mixing_layer")
    scene.put_description(vars(args))
    amps = tuple(args.perturbation)

    @jax.jit
    def chunk(vel, p, t0):
        def body(carry, i):
            vel, p = carry
            pert = setup.perturbation(t0 + i * setup.dt, amps)
            out = piso_step(
                vel, p, setup.dt, setup.domain, setup.sim,
                dirichlet_values=setup.dirichlet_values(pert),
                advection_tol=args.tol, pressure_tol=args.tol,
            )
            return (out.velocity, out.pressure), out.warn

        (vel, p), warns = jax.lax.scan(
            body, (vel, p), jnp.arange(args.save_every, dtype=jnp.float32)
        )
        return vel, p, jnp.any(warns)

    vel, p = setup.initial_state()
    timer = StepTimer()
    for i in range(0, args.steps, args.save_every):
        with timer:
            vel, p, warn = chunk(vel, p, jnp.float32(i * setup.dt))
            jax.block_until_ready(p)
        scene.write(
            dict(velocity=np.asarray(vel.staggered_tensor())[None], pressure=np.asarray(p)[None, ..., None]),
            i + args.save_every,
        )
        print(
            f"steps {i + args.save_every:6d}  warn={bool(warn)}  "
            f"{args.save_every / timer.times[-1]:.1f} steps/s"
        )
    timer.save(scene.directory)
    print("scene:", scene.directory)


if __name__ == "__main__":
    main()
