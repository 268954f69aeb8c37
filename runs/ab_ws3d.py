"""r5 A/B: adjoint warm-start channels at the 256^3 grad10 protocol.

The 3-D backward is adjoint-solve-heavy (momentum solve = 23.5 of 41.4
ms/step forward, runs/roofline3d_256.log; its adjoint starts COLD every
backward step). The channels thread each backward step's adjoint
solutions to the preceding backward step as guesses (solvers/base.py
solve_*_ws). 2-D at 512^2 they bought +0.6% (runs/ab_adjoint_ws.log,
pre-remat); here the arms run under the production 'outputs' remat
protocol (DIFFPISO_REMAT3D default). Cost: 5 extra carry volumes/step
(~0.3 GB at 256^3 x 10 steps in the stash).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/diffpiso_jax_cache"),
)
import bench

from diffpiso_tpu.core import piso_step, zero_adjoint_channels

N, UNROLL, REPS = 256, 10, 4
domain, sim, step_plain, init3 = bench.build_turbulence_3d(N, 1e-5)
vel0, p0 = init3(seed=0)
run = bench._make_runner(step_plain, 20)
vel0, p0, _, _ = run(vel0, p0)
vel0, p0, _, _ = run(vel0, p0)
jax.block_until_ready(p0)
forcing0 = jax.tree_util.tree_map(jnp.zeros_like, vel0)

# channel-accepting step with the same physics params as the bench step
# (build_turbulence_3d: dt = 0.4/n, tol/p_tol as passed)
dt, tol, p_tol = 0.4 / N, 1e-5, 1e-8


def step_ws(vel, p, g1, g2, forcing, ch):
    return piso_step(vel, p, dt, domain, sim, forcing_term=forcing,
                     pressure_inc1_guess=g1, pressure_inc2_guess=g2,
                     advection_tol=tol, pressure_tol=p_tol,
                     adjoint_channels=ch)


def make_grad(ws):
    policy = jax.checkpoint_policies.save_only_these_names(
        "diffpiso_solve_out")
    stepc = step_ws if ws else None

    def loss_fn(forcing, vel, p):
        ch0 = zero_adjoint_channels(vel, p)

        def body(carry, _):
            vel, p, g1, g2, ch = carry
            if ws:
                fn = jax.checkpoint(stepc, policy=policy)
                out = fn(vel, p, g1, g2, forcing, ch)
                ch_next = out.adjoint_channels
            else:
                fn = jax.checkpoint(step_plain, policy=policy)
                out = fn(vel, p, g1, g2, forcing)
                ch_next = ch
            return (out.velocity, out.pressure, out.pressure_inc1,
                    out.pressure_inc2, ch_next), (out.p_iterations, out.warn)

        (v, pp, _, _, _), (iters, warns) = jax.lax.scan(
            body, (vel, p, jnp.zeros_like(p), jnp.zeros_like(p), ch0),
            None, length=UNROLL)
        return sum(jnp.sum(c ** 2) for c in v.components), (iters, warns)

    return jax.jit(jax.grad(loss_fn, has_aux=True))


results = {}
for rep in range(2):
    for ws in (False, True):
        g_fn = make_grad(ws)
        g, (iters, warns) = g_fn(forcing0, vel0, p0)
        jax.block_until_ready(g)
        assert not bool(jnp.any(warns))
        t0 = time.perf_counter()
        for _ in range(REPS):
            g, _ = g_fn(forcing0, vel0, p0)
        jax.block_until_ready(g)
        sps = UNROLL * REPS / (time.perf_counter() - t0)
        results.setdefault(ws, []).append(round(sps, 2))
        print(f"[ab] rep{rep} 256^3 ws={ws}: grad10 {sps:.2f}",
              file=sys.stderr, flush=True)
print(results)
