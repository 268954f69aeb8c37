"""Re-measure the adjoint warm-start channels at the r3b headline.

The r3a measurement (0.996x, recorded at solvers/base.py's channel
docstring) predates the whole-solve kernels: the grad trace now shows the
two COLD adjoint pcg2 solves cost 0.139 ms/ustep vs 0.051 for the
warm-started forward solves (runs/trace2d_grad.py) — ~25% of the 0.562 ms
grad step. Channels thread each backward step's adjoint solutions to the
preceding backward step as Krylov guesses; if they drop the adjoint
iteration counts to ~1, grad30 should gain ~10-20%.
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
from diffpiso_tpu.core.setups import decaying_turbulence_setup

N, UNROLL, REPS = 512, 30, 8
domain, sim = decaying_turbulence_setup((N, N), viscosity=1e-4)
dt = 0.4 / N
tol, p_tol = 1e-6, 1e-8


def step_plain(vel, p, g1, g2, forcing):
    return piso_step(vel, p, dt, domain, sim, forcing_term=forcing,
                     pressure_inc1_guess=g1, pressure_inc2_guess=g2,
                     advection_tol=tol, pressure_tol=p_tol)


def step_ws(vel, p, g1, g2, forcing, channels):
    return piso_step(vel, p, dt, domain, sim, forcing_term=forcing,
                     pressure_inc1_guess=g1, pressure_inc2_guess=g2,
                     advection_tol=tol, pressure_tol=p_tol,
                     adjoint_channels=channels)


from diffpiso_tpu.fields.noise import random_solenoidal

vel0 = random_solenoidal(domain, jax.random.PRNGKey(0))
p0 = domain.centered_grid(0.0)
run = bench._make_runner(step_plain, 50)
vel0, p0, _, _ = run(vel0, p0)
vel0, p0, _, _ = run(vel0, p0)
forcing0 = jax.tree_util.tree_map(jnp.zeros_like, vel0)


def make_grad(ws):
    def loss_fn(forcing, vel, p):
        ch0 = zero_adjoint_channels(vel, p)

        def body(carry, _):
            vel, p, g1, g2, ch = carry
            if ws:
                out = step_ws(vel, p, g1, g2, forcing, ch)
                ch_next = out.adjoint_channels
            else:
                out = step_plain(vel, p, g1, g2, forcing)
                ch_next = ch
            return (out.velocity, out.pressure, out.pressure_inc1,
                    out.pressure_inc2, ch_next), out.warn

        (v, pp, _, _, _), warns = jax.lax.scan(
            body, (vel, p, jnp.zeros_like(p), jnp.zeros_like(p), ch0),
            None, length=UNROLL)
        return sum(jnp.sum(c ** 2) for c in v.components), warns

    return jax.jit(jax.grad(loss_fn, has_aux=True))


results = {}
for rep in range(2):
    for ws in (False, True):
        g_fn = make_grad(ws)
        g, warns = g_fn(forcing0, vel0, p0)
        jax.block_until_ready(g)
        assert not bool(jnp.any(warns))
        t0 = time.perf_counter()
        for _ in range(REPS):
            g, _ = g_fn(forcing0, vel0, p0)
        jax.block_until_ready(g)
        sps = UNROLL * REPS / (time.perf_counter() - t0)
        results.setdefault(ws, []).append(round(sps, 1))
        print(f"[ab] rep{rep} ws={ws}: grad30 {sps:.1f}",
              file=sys.stderr, flush=True)

# gradient parity between the two paths (the channels must be exact)
g0, _ = make_grad(False)(forcing0, vel0, p0)
g1, _ = make_grad(True)(forcing0, vel0, p0)
deltas = [
    float(jnp.max(jnp.abs(a - b)) / jnp.maximum(jnp.max(jnp.abs(a)), 1e-30))
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1))
]
print(f"[ab] grad parity rel-deltas: {deltas}", file=sys.stderr)
print(results)
