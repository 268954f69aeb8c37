"""Roofline refresh for the r5 step: the 'outputs' remat grad protocol.

Same chunk-delta protocol as runs/roofline_r4.py (fwd: wall(200)-wall(50)
deltas; grad: unroll 30-10 deltas), with the gradient measured at the r5
production protocol — jax.checkpoint(policy=save_only_these_names(
'diffpiso_solve_out')) per step — so the bwd-only device figure is
comparable to the VERDICT r4 item 4 target (bwd <= 0.35 ms/step).
Writes BENCH_DETAIL.json roofline["turb_512sq_r5_outputs_remat"].
"""
import json
import os
import re
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

N = 512
domain, sim, step, init2 = bench.build_turbulence(N, 1e-6)
vel, p = init2(seed=0)

run50 = bench._make_runner(step, 50)
run200 = bench._make_runner(step, 200)
vel, p, iters, warns = run50(vel, p)
vel, p, iters, warns = run50(vel, p)  # developed + compiled


def wall(fn, vel, p, reps=8):
    out = fn(vel, p)
    jax.block_until_ready(out[1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(vel, p)
    jax.block_until_ready(out[1])
    return (time.perf_counter() - t0) / reps, out


w50, _ = wall(run50, vel, p)
w200, out = wall(run200, vel, p)
fwd_dev_ms = (w200 - w50) * 1000.0 / 150.0
fwd_dispatch_ms = w50 * 1000.0 - 50 * fwd_dev_ms
print(f"[roofline] fwd device {fwd_dev_ms:.4f} ms/step, "
      f"per-call overhead {fwd_dispatch_ms:.2f} ms", file=sys.stderr)

step_r = jax.checkpoint(
    step,
    policy=jax.checkpoint_policies.save_only_these_names(
        "diffpiso_solve_out"),
)


def grad_wall(unroll, reps=6):
    forcing0 = jax.tree_util.tree_map(jnp.zeros_like, vel)

    def loss_fn(forcing, vel, p):
        def body(carry, _):
            vel, p, g1, g2 = carry
            o = step_r(vel, p, g1, g2, forcing)
            return (o.velocity, o.pressure, o.pressure_inc1,
                    o.pressure_inc2), o.warn

        (v, pp, _, _), warns = jax.lax.scan(
            body, (vel, p, jnp.zeros_like(p), jnp.zeros_like(p)), None,
            length=unroll)
        return sum(jnp.sum(c ** 2) for c in v.components), warns

    g_fn = jax.jit(jax.grad(loss_fn, has_aux=True))
    g, _ = g_fn(forcing0, vel, p)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(reps):
        g, _ = g_fn(forcing0, vel, p)
    jax.block_until_ready(g)
    return (time.perf_counter() - t0) / reps


gw10 = grad_wall(10)
gw30 = grad_wall(30)
grad_dev_ms = (gw30 - gw10) * 1000.0 / 20.0
bwd_ms = grad_dev_ms - fwd_dev_ms
print(f"[roofline] grad device {grad_dev_ms:.4f} ms/unrolled-step "
      f"(fwd-replay+bwd under outputs remat), bwd-only ~{bwd_ms:.4f}",
      file=sys.stderr)

entry = {
    "grid": "512^2 turb (developed, tol 1e-6/1e-8), r5 defaults (whole-solve"
            " kernels + corrector bridge + 'outputs' remat grad protocol)",
    "protocol": "chunk-length deltas as turb_512sq_r4; grad wraps each step"
                " in jax.checkpoint(save_only_these_names("
                "'diffpiso_solve_out')) — the production protocol",
    "fwd_device_ms_per_step": round(fwd_dev_ms, 4),
    "per_jit_call_overhead_ms": round(fwd_dispatch_ms, 2),
    "grad_device_ms_per_unrolled_step": round(grad_dev_ms, 4),
    "bwd_device_ms_per_step": round(bwd_ms, 4),
    "note": "VERDICT r4 item 4 target: bwd <= 0.35 ms/step; the r4 figure"
            " was 0.4688 (no remat). The 'outputs' policy removes the stash"
            " round-trip and replays assembly/FV instead (grad30 headline"
            " 1557 -> 1822, runs/ab_remat512.log).",
}
path = "/root/repo/BENCH_DETAIL.json"
detail = json.load(open(path))
detail.setdefault("roofline", {})["turb_512sq_r5_outputs_remat"] = entry
json.dump(detail, open(path, "w"), indent=1)
print(json.dumps(entry))
