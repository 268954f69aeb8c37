"""Load mantaflow-convention scenes through the MantaScalar crop stream.

The diffpiso_tpu analog of the reference's loader demo
(PhiFlow/demos/loader_mantaflow.py): mantaflow writes scalar grids one cell
LARGER than the simulation resolution, so scalar fields must be cropped by
one on the positive sides before they align with the staggered arrays —
that is exactly what the MantaScalar stream does (learning/stream.py,
phi/data/stream.py:202-233 parity). The reference feeds each loaded batch
through a TF session step; here each batch seeds a jitted
incompressible-flow step.

With no --scene argument a synthetic mantaflow-layout scene is generated
first (pressure at (N+1)^2, centered velocity pair at N^2), so the demo is
self-contained.

Run:  python examples/load_manta.py
      python examples/load_manta.py --scene path/to/sim_000000
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def make_synthetic_manta_scene(out_dir: str, n: int, frames: int):
    """Write a scene in mantaflow's conventions: scalars one cell larger."""
    from diffpiso_tpu.utils.io import Scene

    scene = Scene.create(out_dir, category="manta")
    rng = np.random.default_rng(0)
    for f in range(frames):
        # mantaflow scalar layout: (n+1, n+1); velocities at (n, n) per axis
        scene.write(
            {
                "pressure": rng.standard_normal((n + 1, n + 1)).astype(np.float32),
                "vel": rng.standard_normal((n, n, 2)).astype(np.float32) * 0.1,
            },
            frame=f,
        )
    return scene.directory


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=None,
                    help="existing mantaflow scene dir (default: synthesize)")
    ap.add_argument("--res", type=int, default=63,
                    help="simulation resolution (mantaflow res - 1)")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--out", default="runs/manta_data")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from diffpiso_tpu.core.chorin import FlowState, incompressible_flow_step
    from diffpiso_tpu.fields import CLOSED, Domain, StaggeredField
    from diffpiso_tpu.learning.stream import (
        MantaScalar,
        SceneSource,
        SourceStream,
        StreamReader,
    )

    n = args.res
    scene_dir = args.scene or make_synthetic_manta_scene(
        args.out, n, args.frames
    )
    print(f"reading {scene_dir}")

    # MantaScalar crops the (n+1)-sized scalar grids to n
    # (loader_mantaflow.py:13-16: "allocate one size smaller ... and crop
    # scalar fields via MantaScalar() channels")
    reader = StreamReader(
        [SceneSource(scene_dir)],
        [MantaScalar(SourceStream("pressure")), SourceStream("vel")],
    )
    print(f"{len(reader)} frames indexed")

    domain = Domain((n, n), boundaries=CLOSED)

    @jax.jit
    def step(state):
        return incompressible_flow_step(
            state, domain, 0.5, tol=1e-5, rank_deficient=True
        )

    stats = []
    for i in range(len(reader)):
        pressure, vel_c = reader[i]
        pressure = pressure[0]
        vel_c = vel_c[0]
        # mantaflow stores centered velocity channels (y, x); lift to MAC
        # faces by replicating the last face (the loader demo's state copy)
        vy = np.concatenate([vel_c[..., 0], vel_c[-1:, :, 0]], axis=0)
        vx = np.concatenate([vel_c[..., 1], vel_c[:, -1:, 1]], axis=1)
        state = FlowState(
            velocity=StaggeredField(
                (jnp.asarray(vy), jnp.asarray(vx)), periodic=(False, False)
            ),
            density=jnp.asarray(pressure),  # the reference also feeds
            # pressure in as density ("warning - note uses pressure to
            # density here", loader_mantaflow.py:37)
        )
        out = step(state)
        stats.append(
            [
                float(np.abs(pressure).mean()),
                float(np.abs(vel_c).mean()),
                float(jnp.abs(out.density).mean()),
            ]
        )
        print(
            f"frame {i}: |p| {stats[-1][0]:.4f}  |v| {stats[-1][1]:.4f}  "
            f"stepped |density| {stats[-1][2]:.4f}"
        )
    print(
        f"MantaScalar demo done, {len(stats)} batches read, abs-mean "
        f"{np.mean(np.asarray(stats)):.4f}"
    )


if __name__ == "__main__":
    main()
