"""Gradient optimization THROUGH the pressure projection.

The diffpiso_tpu analog of PhiFlow/demos/optimize_pressure.py (and the
spirit of vortex_fit.py): find a divergence-carrying velocity field whose
incompressible projection matches a target flow, by descending gradients
that flow through the Poisson solve — the IFT custom_vjp adjoint
(solvers/poisson.py gradient='implicit', solver_api.py:133-175 semantics).

Run:  python examples/optimize_pressure.py --n 64 --iters 100 [--cpu]
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
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--lr", type=float, default=0.5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import optax

    from diffpiso_tpu.core.chorin import divergence_free
    from diffpiso_tpu.fields import Domain, PERIODIC, StaggeredField
    from diffpiso_tpu.fields.noise import random_solenoidal

    n = args.n
    domain = Domain((n, n), boundaries=PERIODIC)
    target = random_solenoidal(domain, jax.random.PRNGKey(7))

    def loss_fn(vel_raw):
        vel = StaggeredField(vel_raw, periodic=(True, True))
        projected, _ = divergence_free(vel, domain, tol=1e-6)
        return sum(
            jnp.mean((a - b) ** 2)
            for a, b in zip(projected.components, target.components)
        )

    params = tuple(
        0.01 * jax.random.normal(k, (n, n))
        for k in jax.random.split(jax.random.PRNGKey(0), 2)
    )
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    loss0 = None
    for i in range(args.iters):
        params, opt_state, loss = train_step(params, opt_state)
        if loss0 is None:
            loss0 = float(loss)
        if (i + 1) % max(1, args.iters // 10) == 0:
            print(f"iter {i+1:4d}: loss {float(loss):.3e}")
    print(f"loss reduced {loss0:.3e} -> {float(loss):.3e} "
          f"({loss0/float(loss):.1f}x) by gradients through the Poisson solve")
    assert float(loss) < 0.1 * loss0


if __name__ == "__main__":
    main()
