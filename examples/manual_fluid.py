"""A "manual" incompressible fluid sim built op-by-op, eager or compiled.

The diffpiso_tpu analog of the reference's backend-duality demo
(PhiFlow/demos/manual_fluid_numpy_or_tf.py): the same 3-line simulation core
— advect density, advect velocity + buoyancy, project — written directly
against the op layer (ops/advect.py, core/chorin.divergence_free) rather
than through FlowState/IncompressibleFlow. The reference contrasts a NumPy
eager loop with a TF1 graph that unrolls GRAPH_STEPS and round-trips state
through session feeds; here the SAME function runs eagerly (`--eager`, the
numpy analog: op dispatch per call, easy printf debugging) or under
jit + lax.scan unrolling `--graph-steps` per call with state resident on
device (the graph analog, minus the host round-trip). Supports 2-D and 3-D
like the reference's DIM switch.

Run:  python examples/manual_fluid.py --steps 12
      python examples/manual_fluid.py --eager --dim 3
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
    ap.add_argument("--res", type=int, default=32)
    ap.add_argument("--dim", type=int, default=2, choices=(2, 3))
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--graph-steps", type=int, default=3,
                    help="scan length per jit call (the TF GRAPH_STEPS)")
    ap.add_argument("--dt", type=float, default=0.6)
    ap.add_argument("--eager", action="store_true",
                    help="run op-by-op without jit (the NumPy-mode analog)")
    ap.add_argument("--out", default="runs")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from diffpiso_tpu.core.chorin import divergence_free
    from diffpiso_tpu.fields import CLOSED, Domain, StaggeredField
    from diffpiso_tpu.ops.advect import advect_centered, advect_semi_lagrangian
    from diffpiso_tpu.ops.fv import centered_to_faces

    n, dim = args.res, args.dim
    res = (n,) * dim
    domain = Domain(res, boundaries=CLOSED)

    # inflow block like manual_fluid_numpy_or_tf.py:70-76 (center band)
    inflow = np.zeros(res, np.float32)
    if dim == 2:
        inflow[n // 2 : n // 4 * 3, n // 4 : n // 4 * 3] = 1.0
    else:
        inflow[n // 2 : n // 4 * 3, n // 4 : n // 4 * 3, n // 4 : n // 4 * 3] = 1.0
    inflow = jnp.asarray(inflow)

    def sim_step(density, velocity):
        # the 3-line simulation core (manual_fluid_numpy_or_tf.py:78-81)
        density = advect_centered(density, velocity, args.dt, domain.dx) \
            + args.dt * inflow
        velocity = advect_semi_lagrangian(velocity, velocity, args.dt, domain.dx)
        buoy = 0.2 * 9.81 * args.dt * density  # force along -axis0 (up)
        velocity = StaggeredField(
            (velocity.components[0] + centered_to_faces(buoy, 0),)
            + velocity.components[1:],
            periodic=velocity.periodic,
        )
        velocity, _p = divergence_free(
            velocity, domain, tol=1e-5, rank_deficient=True
        )
        return density, velocity

    density = jnp.zeros(res)
    velocity = StaggeredField(
        tuple(
            jnp.zeros(tuple(r + (1 if d == a else 0) for a, r in enumerate(res)))
            for d in range(dim)
        ),
        periodic=(False,) * dim,
    )

    t0 = time.perf_counter()
    if args.eager:
        print(f"mode: eager (op dispatch per call), {dim}-D {res}")
        for i in range(args.steps):
            density, velocity = sim_step(density, velocity)
            print(
                f"step {i:3d}: density mean {float(density.mean()):.5f}, "
                f"velocity mean {float(velocity.components[0].mean()):.5f}"
            )
    else:
        print(f"mode: jit + scan of {args.graph_steps} (graph analog), "
              f"{dim}-D {res}")

        @jax.jit
        def run_chunk(density, velocity):
            def body(carry, _):
                d, v = carry
                return sim_step(d, v), ()

            (d, v), _ = jax.lax.scan(
                body, (density, velocity), None, length=args.graph_steps
            )
            return d, v

        for i in range(args.steps // args.graph_steps):
            density, velocity = run_chunk(density, velocity)
            print(
                f"chunk {i}: step {args.graph_steps * (i + 1):3d}, density "
                f"mean {float(density.mean()):.5f}, velocity mean "
                f"{float(velocity.components[0].mean()):.5f}"
            )
    print(f"done in {time.perf_counter() - t0:.2f}s")

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "manual_fluid.npz")
    np.savez_compressed(
        path,
        density=np.asarray(density),
        **{f"v{d}": np.asarray(c) for d, c in enumerate(velocity.components)},
    )
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
