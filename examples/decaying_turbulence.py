"""Decaying homogeneous 2-D turbulence in a periodic box (one of the
reference capability configs, BASELINE.json). Random solenoidal initial
field with a prescribed energy peak; evolves under the no-model PISO solver;
writes spectra for k^-3 enstrophy-cascade inspection
(evaluation_tools.plot_spectra analog).

Usage:
    python examples/decaying_turbulence.py [--n 256] [--steps 500]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from diffpiso_tpu import StaggeredField
from diffpiso_tpu.fields.noise import random_solenoidal
from diffpiso_tpu.core import piso_step
from diffpiso_tpu.core.setups import decaying_turbulence_setup
from diffpiso_tpu.eval import ek_spectrum_2d
from diffpiso_tpu.utils import Scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--dt", type=float, default=0.01)
    ap.add_argument("--nu", type=float, default=1e-4)
    ap.add_argument("--save-every", type=int, default=50)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--out", type=str, default="runs/turb")
    args = ap.parse_args()

    domain, sim = decaying_turbulence_setup(
        (args.n, args.n), viscosity=args.nu, max_iterations=(200, 1500)
    )
    vel = random_solenoidal(domain, jax.random.PRNGKey(0))
    p = domain.centered_grid(0.0)
    scene = Scene.create(args.out, f"turb{args.n}")
    scene.put_description(vars(args))

    @jax.jit
    def chunk(vel, p):
        def body(carry, _):
            vel, p = carry
            out = piso_step(
                vel, p, args.dt, domain, sim,
                advection_tol=args.tol, pressure_tol=args.tol,
            )
            return (out.velocity, out.pressure), out.warn

        (vel, p), warns = jax.lax.scan(body, (vel, p), None, length=args.save_every)
        return vel, p, jnp.any(warns)

    import time

    for i in range(0, args.steps, args.save_every):
        t0 = time.perf_counter()
        vel, p, warn = chunk(vel, p)
        jax.block_until_ready(p)
        sps = args.save_every / (time.perf_counter() - t0)
        spectrum = np.asarray(ek_spectrum_2d(vel.at_centers()))
        scene.write(
            dict(
                velocity=np.asarray(vel.staggered_tensor())[None],
                pressure=np.asarray(p)[None, ..., None],
                spectrum=spectrum,
            ),
            i + args.save_every,
        )
        ke = float(sum(jnp.sum(c**2) for c in vel.components))
        print(
            f"steps {i + args.save_every:6d}  warn={bool(warn)}  KE={ke:.4f}  "
            f"E(k) peak at k={int(np.argmax(spectrum))}  {sps:.1f} steps/s"
        )
    print("scene:", scene.directory)


if __name__ == "__main__":
    main()
