"""Train a small CNN to predict the velocity field from the smoke density.

The diffpiso_tpu analog of the reference's minimal learning demo
(PhiFlow/demos/simple_tfmodel.py): a 4-layer conv net (5/5/3/3 kernels,
32 features, ReLU, linear head — simple_tfmodel.py:27-42) maps the marker
density to the centered velocity, trained with an L2 loss over generated
smoke simulations. The reference needs a pre-generated dataset on disk and
a TF1 LearningApp; here the dataset is produced in-process by a vmapped
batch of plume simulations (one compiled program simulates all training
sims at once) and training is a jitted optax Adam loop — data generation,
training and validation in one self-contained script.

Run:  python examples/simple_model.py --sims 10 --steps-per-sim 24
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def generate_dataset(n, sims, steps, dt, seed):
    """Vmapped plume batch (smoke_datagen.py pattern): returns stacked
    (density, centered velocity) frame pairs."""
    from diffpiso_tpu.core.chorin import FlowState, incompressible_flow_step
    from diffpiso_tpu.fields import Box, CLOSED, Domain, StaggeredField
    from diffpiso_tpu.fields.geometry import cell_center_points
    from diffpiso_tpu.physics.effect import FieldEffect, GROW

    box = Box.from_size((float(n), float(n)))
    domain = Domain((n, n), box, boundaries=CLOSED)
    rng = np.random.default_rng(seed)
    xs = n * (0.15 + 0.7 * rng.uniform(size=sims))
    pts = cell_center_points((n, n), box)
    masks = jnp.stack(
        [
            jnp.clip(
                0.5
                - (
                    jnp.sqrt(
                        jnp.sum((pts - jnp.asarray([n * 0.12, x])) ** 2, -1)
                    )
                    - 0.08 * n
                ),
                0.0,
                1.0,
            )
            for x in xs
        ]
    )

    def single_step(state, mask):
        inflow = FieldEffect(mask * 0.5, mode=GROW)
        return incompressible_flow_step(
            state, domain, dt, buoyancy_factor=0.2, density_effects=[inflow],
            tol=1e-5, rank_deficient=True,
        )

    batched = jax.jit(jax.vmap(single_step))
    vel = StaggeredField(
        (jnp.zeros((sims, n + 1, n)), jnp.zeros((sims, n, n + 1))),
        periodic=(False, False),
    )
    state = FlowState(velocity=vel, density=jnp.zeros((sims, n, n)))
    dens_frames, vel_frames = [], []
    for _ in range(steps):
        state = batched(state, masks)
        dens_frames.append(state.density)
        vel_frames.append(jax.vmap(lambda v: v.at_centers())(state.velocity))
    # (sims * steps, n, n, 1) and (sims * steps, n, n, 2)
    d = jnp.concatenate(dens_frames)[..., None]
    v = jnp.concatenate(vel_frames)
    return d, v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--sims", type=int, default=10)
    ap.add_argument("--steps-per-sim", type=int, default=24)
    ap.add_argument("--val-sims", type=int, default=2,
                    help="of --sims, how many are held out (the reference's "
                         "train 0-8 / val 8-10 split)")
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import optax

    from diffpiso_tpu.models.networks import fullyconv_apply, init_fullyconv

    print("generating data ...")
    d, v = generate_dataset(args.n, args.sims, args.steps_per_sim, 1.0, 0)
    per = args.steps_per_sim
    n_train = (args.sims - args.val_sims) * per
    d_train, v_train = d[:n_train], v[:n_train]
    d_val, v_val = d[n_train:], v[n_train:]
    print(f"dataset: {n_train} train / {d.shape[0] - n_train} val frames")

    # the reference's "very simple conv net" (simple_tfmodel.py:27-42):
    # kernels 5/5/3/3, 32 features, ReLU, linear 2-channel head
    params = init_fullyconv(
        jax.random.PRNGKey(0), in_channels=1, out_channels=2,
        kernels=(5, 5, 3, 3), features=(32, 32, 32),
    )
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    def loss_fn(p, dens, vel):
        pred = fullyconv_apply(p, dens, padding="SAME")
        return jnp.mean((pred - vel) ** 2)

    @jax.jit
    def train_step(p, s, dens, vel):
        l, g = jax.value_and_grad(loss_fn)(p, dens, vel)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, l

    rng = np.random.default_rng(1)
    val0 = float(loss_fn(params, d_val, v_val))
    for it in range(args.iters):
        idx = rng.integers(0, n_train, size=args.batch)
        params, opt_state, l = train_step(
            params, opt_state, d_train[idx], v_train[idx]
        )
        if (it + 1) % 50 == 0:
            vl = float(loss_fn(params, d_val, v_val))
            print(f"iter {it + 1:4d}: train {float(l):.3e}  val {vl:.3e}")
    val1 = float(loss_fn(params, d_val, v_val))
    print(
        f"validation loss {val0:.3e} -> {val1:.3e} "
        f"({val0 / max(val1, 1e-30):.1f}x reduction)"
    )
    assert val1 < val0, "training did not reduce the validation loss"


if __name__ == "__main__":
    main()
