"""All six Gray-Scott parameter presets, simulated in ONE vmapped program.

The diffpiso_tpu analog of the reference's reaction-diffusion preset demo
(PhiFlow/demos/sample_patterns.py: diagonal/maze/coral/flood/dots/
dots_and_stripes). The reference runs one preset per process behind the Dash
GUI; here the (du, dv, f, k) table enters as a batched argument, so all six
patterns integrate side by side in a single jit(vmap(scan)) — the TPU-native
way to sweep parameters.

Run:  python examples/sample_patterns.py --steps 4000
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PRESETS = {
    # PhiFlow/demos/sample_patterns.py:6-13
    "diagonal": (0.17, 0.03, 0.06, 0.056),
    "maze": (0.19, 0.05, 0.06, 0.062),
    "coral": (0.16, 0.08, 0.06, 0.062),
    "flood": (0.19, 0.05, 0.06, 0.02),
    "dots": (0.19, 0.05, 0.04, 0.065),
    "dots_and_stripes": (0.19, 0.03, 0.04, 0.061),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=126)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--dt", type=float, default=1.0)
    ap.add_argument("--out", default="runs")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from diffpiso_tpu.physics.reaction_diffusion import (
        Pattern,
        ReactionDiffusion,
        seed_pattern,
    )

    n = args.n
    # the reference seeds u = v = EXP bump at (80, 40) size 3
    # (sample_patterns.py:17); scale the center with the grid
    center = [80.0 * n / 126.0, 40.0 * n / 126.0]
    seed = seed_pattern((n, n), mode="EXP", center=center, size=3, factor=1.0)
    u0 = jnp.ones((n, n)) - seed  # u starts saturated, depleted at the seed
    v0 = seed

    names = list(PRESETS)
    params = jnp.asarray([PRESETS[k] for k in names], jnp.float32)  # (6, 4)

    @jax.jit
    def run(params_one):
        du, dv, f, k = params_one
        phys = ReactionDiffusion(du=du, dv=dv, f=f, k=k)

        def body(pat, _):
            return phys.step(pat, dt=args.dt), ()

        out, _ = jax.lax.scan(body, Pattern(u0, v0), None, length=args.steps)
        return out

    out = jax.vmap(run)(params)
    u = np.asarray(out.u)
    v = np.asarray(out.v)
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "sample_patterns.npz")
    np.savez_compressed(path, u=u, v=v, names=np.asarray(names))
    for i, name in enumerate(names):
        print(
            f"{name:18s} u in [{u[i].min():.3f}, {u[i].max():.3f}]  "
            f"v mean {v[i].mean():.4f}  structure "
            f"{np.abs(np.diff(v[i], axis=1)).mean():.5f}"
        )
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 3, figsize=(12, 8))
        for ax, name, vi in zip(axes.ravel(), names, v):
            ax.imshow(vi, origin="lower", cmap="magma")
            ax.set_title(name)
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "sample_patterns.png"), dpi=110)
        print(f"wrote {args.out}/sample_patterns.png and {path}")
    except Exception as e:  # matplotlib optional
        print(f"wrote {path} (plot skipped: {e})")


if __name__ == "__main__":
    main()
