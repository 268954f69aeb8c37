"""Flip-condition probe for DIFFPISO_BATCHED_PALLAS: batched rollouts whose
PER-SAMPLE planes are the 512^2 production shape (the condition recorded in
learning/training.py:343 — 'a workload whose per-sample planes are large
enough that each program saturates the core').

Mirrors make_batched_train_step's trace gating exactly (batched_safe_pallas
vs no_pallas around a vmapped piso_step) on the 512^2 turbulence step:
fwd = scan of vmapped steps (warm-start guesses carried, outputs feed the
next input, so nothing hoists); grad10 = value_and_grad of a mean final
-energy loss over the vmapped 10-step unroll. Within-process A/B, 2 reps.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/diffpiso_jax_cache"),
)
import bench
from diffpiso_tpu.ops.pallas_stencil import batched_safe_pallas, no_pallas

ap = argparse.ArgumentParser()
ap.add_argument("--n", type=int, default=512)
ap.add_argument("--batch", type=int, default=4)
ap.add_argument("--steps-per-call", type=int, default=50)
ap.add_argument("--reps", type=int, default=2)
ap.add_argument("--unroll", type=int, default=10)
ap.add_argument("--fwd-only", action="store_true")
args = ap.parse_args()

domain, sim, step, initial_state = bench.build_turbulence(args.n, 1e-6)
states = [initial_state(seed=s) for s in range(args.batch)]
vel0 = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *[s[0] for s in states])
p0 = jnp.stack([s[1] for s in states])


def one_step(vel, p, g1, g2):
    out = step(vel, p, g1, g2, None)
    return out.velocity, out.pressure, out.pressure_inc1, out.pressure_inc2


def make_fwd(mode):
    # the gate context must be active at TRACE time (inside the jit body),
    # matching make_batched_train_step — wrapping the jit *definition* is a
    # no-op because tracing is deferred to the first call
    @jax.jit
    def run(vel, p):
        ctx = batched_safe_pallas() if mode == "auto" else no_pallas()
        with ctx:
            def body(carry, _):
                vel, p, g1, g2 = carry
                return jax.vmap(one_step)(vel, p, g1, g2), ()

            (vel, p, _, _), _ = jax.lax.scan(
                body, (vel, p, jnp.zeros_like(p), jnp.zeros_like(p)),
                None, length=args.steps_per_call,
            )
        return vel, p

    return run


def make_grad(mode):
    def loss_fn(vel, p):
        def body(carry, _):
            vel, p, g1, g2 = carry
            return jax.vmap(one_step)(vel, p, g1, g2), ()

        (vel, _, _, _), _ = jax.lax.scan(
            body, (vel, p, jnp.zeros_like(p), jnp.zeros_like(p)),
            None, length=args.unroll,
        )
        return sum(jnp.mean(c**2) for c in vel.components)

    @jax.jit
    def run(vel, p):
        # ctx active across the WHOLE grad trace (fwd + transpose), like
        # make_batched_train_step's `with ctx: vmap(value_and_grad(...))`
        ctx = batched_safe_pallas() if mode == "auto" else no_pallas()
        with ctx:
            return jax.value_and_grad(loss_fn)(vel, p)

    return run


def measure_fwd(mode, vel, p):
    run = make_fwd(mode)
    vel, p = run(vel, p)  # spinup + compile
    jax.block_until_ready(p)
    best = 0.0
    for _ in range(args.reps):
        t0 = time.perf_counter()
        vel, p = run(vel, p)
        jax.block_until_ready(p)
        dt = time.perf_counter() - t0
        best = max(best, args.steps_per_call * args.batch / dt)
    return best, (vel, p)


def measure_grad(mode, vel, p):
    run = make_grad(mode)
    l, g = run(vel, p)
    jax.block_until_ready(l)
    best = 0.0
    for _ in range(args.reps):
        t0 = time.perf_counter()
        l, g = run(vel, p)
        jax.block_until_ready(l)
        dt = time.perf_counter() - t0
        best = max(best, args.unroll * args.batch / dt)
    return best


results = {}
# interleave modes so tunnel drift hits both equally
for mode in ("never", "auto", "never", "auto"):
    f, (vd, pd) = measure_fwd(mode, vel0, p0)
    results.setdefault(("fwd", mode), []).append(round(f, 1))
    print(f"[ab] fwd {mode}: {f:.1f} sample-steps/s", file=sys.stderr, flush=True)
    if not args.fwd_only:
        g = measure_grad(mode, vd, pd)
        results.setdefault(("grad", mode), []).append(round(g, 1))
        print(f"[ab] grad{args.unroll} {mode}: {g:.1f} sample-steps/s",
              file=sys.stderr, flush=True)
print(results)
