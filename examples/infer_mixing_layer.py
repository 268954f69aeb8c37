"""Long inference rollout with a trained closure (reference:
spatial_mixing_layer_differentiable_inference.py): restore checkpoint, roll
out, record per-step wall-clock into performance_<hostname>.npz.

Usage:
    python examples/infer_mixing_layer.py \
        --model runs/training/.../checkpoints/epoch_1 [--steps 2500]

(--model accepts an orbax checkpoint directory produced by training_run —
a tagged epoch_<E>/last_working dir or a step_<N> dir; a training_run
checkpoint stores the full train state, so the params sub-tree is used —
or a legacy pickle file.)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from diffpiso_tpu.core import spatial_mixing_layer_setup
from diffpiso_tpu.learning import TrainingConfig, load_params, make_rollout_fn
from diffpiso_tpu.utils import Scene, StepTimer, device_memory_stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", type=str, default=None, help="orbax checkpoint dir (or legacy pkl); omit for no-model run")
    ap.add_argument("--hrres", type=int, nargs=2, default=[64, 256])
    ap.add_argument("--box", type=float, nargs=2, default=[64.0, 256.0])
    ap.add_argument("--dt", type=float, default=0.4)
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--perturbation", type=float, nargs=2, default=[0.082, 0.018])
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--padding", type=str, default="VALID")
    ap.add_argument("--out", type=str, default="runs/inference")
    args = ap.parse_args()

    setup = spatial_mixing_layer_setup(
        simulation=dict(HRres=tuple(args.hrres), box_size=tuple(args.box), dt=args.dt),
        max_iterations=(2000, 4000),
    )
    cfg = TrainingConfig(
        step_count=args.chunk,
        advection_tol=args.tol,
        pressure_tol=args.tol,
        padding=args.padding,
        restore_shape=args.padding == "VALID",
        perturb_inlet=True,
    )
    params = load_params(args.model) if args.model else None
    if isinstance(params, dict) and "params" in params:
        params = params["params"]  # full-train-state checkpoint from training_run
    rollout = make_rollout_fn(setup, cfg, with_network=params is not None)
    rollout = jax.jit(rollout)

    amps = tuple(args.perturbation)
    scene = Scene.create(args.out, "inference")
    scene.put_description(vars(args))

    vel, p = setup.initial_state()
    timer = StepTimer()
    for i in range(0, args.steps, args.chunk):
        perts = jnp.stack(
            [setup.perturbation((i + t) * setup.dt, amps) for t in range(args.chunk)]
        )
        with timer:
            vels, ps, warn = rollout(params, vel, p, perts)
            jax.block_until_ready(ps)
        vel = jax.tree_util.tree_map(lambda a: a[-1], vels)
        p = ps[-1]
        scene.write(
            dict(velocity=np.asarray(vel.staggered_tensor())[None], pressure=np.asarray(p)[None, ..., None]),
            i + args.chunk,
        )
        print(
            f"steps {i + args.chunk:6d}  warn={bool(warn)}  "
            f"{args.chunk / timer.times[-1]:.2f} steps/s  mem={device_memory_stats()}"
        )
    path = timer.save(scene.directory)
    print(f"per-chunk timings saved to {path}; scene: {scene.directory}")


if __name__ == "__main__":
    main()
