"""Differentiable closure training on the spatial mixing layer (reference:
spatial_mixing_layer_differentiable_training.py). Expects a dataset of
npz frame sequences (produce one with examples/spatial_mixing_layer.py or
examples/make_training_data.py for a quick synthetic set).

Usage:
    python examples/train_mixing_layer.py --dataset runs/sml/mixing_layer_000000 \
        [--hrres 64 256] [--steps 10] [--epochs 2]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from diffpiso_tpu.core import spatial_mixing_layer_setup
from diffpiso_tpu.learning import (
    SequenceDataset,
    TrainingConfig,
    create_base_dir,
    training_run,
)
from diffpiso_tpu.models import init_fullyconv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", type=str, nargs="+", required=True)
    ap.add_argument("--characteristics", type=float, nargs="+", default=[0.082, 0.018],
                    help="perturbation amplitudes per dataset (pairs)")
    ap.add_argument("--time-offset", type=float, default=0.0)
    ap.add_argument("--hrres", type=int, nargs=2, default=[64, 256])
    ap.add_argument("--box", type=float, nargs=2, default=[64.0, 256.0])
    ap.add_argument("--dt", type=float, default=0.4)
    ap.add_argument("--dx-ratio", type=int, default=1)
    ap.add_argument("--dt-ratio", type=int, default=1)
    ap.add_argument("--steps", type=int, default=10, help="unrolled step count")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--start-frame", type=int, default=0)
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--val-frames", type=int, default=100)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--loss-factors", type=float, nargs=4, default=[50.0, 0.5, 2.0, 0.5])
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--padding", type=str, default="VALID")
    ap.add_argument("--out", type=str, default="runs/training")
    args = ap.parse_args()

    setup = spatial_mixing_layer_setup(
        simulation=dict(
            HRres=tuple(args.hrres), box_size=tuple(args.box),
            dt=args.dt * args.dt_ratio, dx_ratio=args.dx_ratio,
        ),
        max_iterations=(2000, 4000),
    )
    cfg = TrainingConfig(
        step_count=args.steps,
        loss_influence_range=args.steps,
        learning_rate=args.lr,
        epochs=args.epochs,
        loss_factors=tuple(args.loss_factors),
        advection_tol=args.tol,
        pressure_tol=args.tol,
        padding=args.padding,
        restore_shape=args.padding == "VALID",
    )

    n_sets = len(args.dataset)
    amps = np.asarray(args.characteristics, np.float32).reshape(n_sets, -1)
    dt_data = args.dt * args.dt_ratio

    def characs(set_idx, n_frames):
        return [
            (args.time_offset + i * dt_data, *amps[set_idx])
            for i in range(args.start_frame, args.start_frame + n_frames)
        ]

    train_ds = SequenceDataset(
        args.dataset,
        characteristics=[characs(s, args.frames) for s in range(n_sets)],
        start_frame=[args.start_frame] * n_sets,
        frame_count=[args.frames] * n_sets,
        step_count=cfg.step_count,
        dt_ratio=args.dt_ratio,
        dx_ratio=args.dx_ratio,
    )
    val_ds = SequenceDataset(
        args.dataset,
        characteristics=[characs(s, args.val_frames) for s in range(n_sets)],
        start_frame=[args.start_frame + args.frames] * n_sets,
        frame_count=[args.val_frames] * n_sets,
        step_count=cfg.step_count,
        dt_ratio=args.dt_ratio,
        dx_ratio=args.dx_ratio,
    )

    base_dir = create_base_dir(
        args.out, f"/diffpiso_tpu_{args.steps}step_{args.hrres[0]}-{args.hrres[1]}_"
    )
    params = init_fullyconv(jax.random.PRNGKey(42))
    params, hist, val_hist = training_run(
        base_dir, setup, cfg, params, train_ds, val_dataset=val_ds
    )
    print(f"training done. final loss {hist[-1]:.4g}; artifacts in {base_dir}")


if __name__ == "__main__":
    main()
