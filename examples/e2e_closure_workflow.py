"""The complete reference workflow end to end, at demo scale:

  1. DNS of the spatial mixing layer                  (spatial_mixing_layer.py)
  2. coarsen snapshots in space/time into a dataset    (README.md:143-151)
  3. train the CNN closure through unrolled PISO steps (spatial_mixing_layer_differentiable_training.py)
  4. inference rollout with the trained closure        (spatial_mixing_layer_differentiable_inference.py)

Run (demo scale, a few minutes on the TPU):
    python examples/e2e_closure_workflow.py --out /tmp/e2e
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hrres", type=int, nargs=2, default=[64, 256])
    ap.add_argument("--box", type=float, nargs=2, default=[32.0, 128.0])
    ap.add_argument("--dns-steps", type=int, default=160)
    ap.add_argument("--skip-frames", type=int, default=20)
    ap.add_argument("--dt", type=float, default=0.2)
    ap.add_argument("--dx-ratio", type=int, default=2)
    ap.add_argument("--dt-ratio", type=int, default=2)
    ap.add_argument("--unroll", type=int, default=4)
    ap.add_argument("--train-iters", type=int, default=8)
    ap.add_argument("--infer-chunks", type=int, default=5)
    ap.add_argument("--tol", type=float, default=1e-5)
    ap.add_argument("--out", type=str, default="runs/e2e")
    args = ap.parse_args()
    t_start = time.perf_counter()

    import optax

    from diffpiso_tpu.core import piso_step, spatial_mixing_layer_setup
    from diffpiso_tpu.eval.spectra import ek_spectrum_1d
    from diffpiso_tpu.learning import (
        SequenceDataset,
        TrainingConfig,
        make_loss_fn,
        make_rollout_fn,
        make_train_step,
    )
    from diffpiso_tpu.learning.training import _sample_to_device
    from diffpiso_tpu.models import init_fullyconv
    from diffpiso_tpu.utils import Scene

    amps = (0.082, 0.018)

    # ---- 1. DNS ---------------------------------------------------------------
    hr = spatial_mixing_layer_setup(
        simulation=dict(HRres=tuple(args.hrres), box_size=tuple(args.box), dt=args.dt),
        max_iterations=(300, 1200),
    )
    scene = Scene.create(args.out, "dns")
    scene.put_description(vars(args))

    @jax.jit
    def dns_step(vel, p, t):
        pert = hr.perturbation(t, amps)
        out = piso_step(
            vel, p, hr.dt, hr.domain, hr.sim,
            dirichlet_values=hr.dirichlet_values(pert),
            viscosity_field=hr.viscosity_field,
            advection_tol=args.tol, pressure_tol=args.tol,
        )
        return out.velocity, out.pressure

    vel, p = hr.initial_state()
    for i in range(args.dns_steps):
        vel, p = dns_step(vel, p, jnp.asarray(i * hr.dt, jnp.float32))
        scene.write(
            {
                "velocity": np.asarray(vel.staggered_tensor()),
                "pressure": np.asarray(p),
            },
            frame=i,
        )
    print(f"[e2e] DNS done: {args.dns_steps} frames in {scene.directory}")

    # ---- 2. dataset (coarsen x{dx_ratio} in space, x{dt_ratio} in time) --------
    lrres = (args.hrres[0] // args.dx_ratio, args.hrres[1] // args.dx_ratio)
    lr = spatial_mixing_layer_setup(
        simulation=dict(
            HRres=lrres, box_size=tuple(args.box), dt=args.dt * args.dt_ratio
        ),
        max_iterations=(300, 1200),
    )
    n_frames = args.dns_steps - args.skip_frames
    characs = [
        [(args.skip_frames + i) * args.dt, *amps] for i in range(n_frames)
    ]
    dataset = SequenceDataset(
        [scene.directory], [characs], [args.skip_frames], [n_frames],
        args.unroll, dt_ratio=args.dt_ratio, dx_ratio=args.dx_ratio,
    )
    print(f"[e2e] dataset: {len(dataset)} sequences at {lrres}")

    # ---- 3. closure training ----------------------------------------------------
    cfg = TrainingConfig(
        step_count=args.unroll, learning_rate=1e-4, padding="SAME",
        loss_factors=(50.0, 0.5, 0.0, 0.0),
        advection_tol=args.tol, pressure_tol=args.tol,
    )
    rollout = make_rollout_fn(lr, cfg)
    loss_fn = make_loss_fn(lr, cfg, rollout)
    params = init_fullyconv(jax.random.PRNGKey(0))
    opt = optax.adam(cfg.learning_rate)
    opt_state = opt.init(params)
    train_step = make_train_step(loss_fn, opt)

    losses = []
    it = 0
    for sample in dataset.iterate(shuffle=True, seed=0):
        batch = _sample_to_device(lr, cfg, sample)
        params, opt_state, loss, parts, warn = train_step(params, opt_state, *batch)
        losses.append(float(loss))
        it += 1
        if it >= args.train_iters:
            break
    print(f"[e2e] trained {it} iters, loss {losses[0]:.4f} -> {losses[-1]:.4f}")
    assert np.isfinite(losses).all(), losses

    # ---- 4. inference rollout with the trained closure ---------------------------
    infer = jax.jit(make_rollout_fn(lr, cfg, with_network=True))
    vel_i, p_i = lr.initial_state()
    t0 = args.skip_frames * args.dt
    for chunk in range(args.infer_chunks):
        perts = jnp.stack(
            [
                lr.perturbation(t0 + (chunk * args.unroll + t) * lr.dt, amps)
                for t in range(cfg.step_count)
            ]
        )
        vels, ps, warn = infer(params, vel_i, p_i, perts)
        vel_i = type(vel_i)(
            tuple(c[-1] for c in vels.components), periodic=vel_i.periodic
        )
        p_i = ps[-1]
    assert all(np.isfinite(np.asarray(c)).all() for c in vel_i.components)
    centered = vel_i.at_centers()
    ek = np.asarray(ek_spectrum_1d(centered, axis=1))
    print(
        f"[e2e] inference rollout OK ({args.infer_chunks * args.unroll} steps), "
        f"E(k) peak at k={int(ek[1:].argmax()) + 1}, warn={bool(warn)}"
    )
    print(f"[e2e] total wall: {time.perf_counter() - t_start:.1f}s")
    print("[e2e] WORKFLOW COMPLETE")


if __name__ == "__main__":
    main()
