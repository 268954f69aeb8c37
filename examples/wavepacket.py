"""A Schroedinger wave packet hitting a glass slab and a solid bar.

One-to-one analog of PhiFlow/demos/wavepacket.py: a Gaussian wave packet
(size 6 * scale, wave vector (1, 0.6)/scale in lattice units) propagates
across a (128*scale)^2 domain containing a step potential of height 1
("glass box" — partial transmission/reflection) and a solid obstacle bar
(amplitude zeroed inside). The split-step Fourier integrator renormalizes
|psi|^2 each step; the script checks probability conservation and reports
how much probability tunnels past the glass.

Run:  python examples/wavepacket.py --scale 2 --steps 60 [--cpu]
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
    ap.add_argument("--scale", type=int, default=2,
                    help="domain = (128*scale)^2 (reference SCALE=4)")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--dt", type=float, default=1.0)
    ap.add_argument("--mass", type=float, default=0.2)
    ap.add_argument("--out", default="runs")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from diffpiso_tpu.app import App, render_dashboard
    from diffpiso_tpu.physics import Schroedinger, psquare, step_potential, wave_packet

    s = args.scale
    n = 128 * s
    res = (n, n)
    physics = Schroedinger(mass=args.mass, margin=1, normalize=True)

    # reference geometry (x-first box[30S:50S, :] glass + box[80S:90S, :]
    # bar) mapped to (y, x): bands across the full width
    glass = np.zeros(res, np.float32)
    glass[30 * s:50 * s, :] = 1.0
    bar = np.zeros(res, np.float32)
    bar[80 * s:90 * s, :] = 1.0
    potential = step_potential(jnp.asarray(glass), height=1.0)
    bar = jnp.asarray(bar)

    # packet launched toward the glass (reference center [50,50], size 6,
    # k = (1, 0.6) at scale 1)
    psi0 = wave_packet(
        res,
        center=(50.0 * s, 50.0 * s),
        size=6.0 * s,
        wave_vector=(1.0 / s, 0.6 / s),
    )
    psi0 = psi0 / jnp.sqrt(jnp.sum(psquare(psi0))).astype(psi0.dtype)

    step_fn = jax.jit(
        lambda amp: physics.step(
            amp, dt=args.dt, potentials=(potential,), obstacle_mask=bar
        )
    )

    app = App("wavepacket", base_dir=args.out,
              record_every=max(args.steps // 6, 1))
    app.set_step(step_fn, psi0)
    app.add_field("real", lambda: jnp.real(app.state))
    app.add_field("imag", lambda: jnp.imag(app.state))
    app.add_field("probability", lambda: psquare(app.state))
    app.add_field("domain", lambda: 0.5 * jnp.asarray(glass) + bar)
    app.add_field("zoomed", lambda: jnp.real(app.state)[:128, :128])

    for i in range(args.steps):
        app.step()
        if (i + 1) % max(args.steps // 4, 1) == 0:
            p = psquare(app.state)
            total = float(jnp.sum(p))
            past_glass = float(jnp.sum(p[50 * s:, :]))
            print(
                f"step {i+1}: total probability {total:.6f}  "
                f"beyond the glass {past_glass:.4f}"
            )

    p = np.asarray(psquare(app.state))
    assert np.isfinite(p).all()
    assert abs(p.sum() - 1.0) < 1e-3, "probability must stay normalized"
    assert p[: 30 * s].sum() < 1.0 - 1e-4, "packet should have moved"
    print("dashboard:", render_dashboard(app))


if __name__ == "__main__":
    main()
