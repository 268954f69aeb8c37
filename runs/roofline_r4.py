"""Roofline refresh for the r4 step (corrector bridge on at the 512^2 class).

Counts compiled HLO kernels in the 512^2 turb step (fixed ops in the scan
body + ops inside nested whiles) and measures per-step device time by
chunk-length deltas (wall(200-step chunk) - wall(50-step chunk) removes
the ~25 ms tunnel dispatch), for BOTH the forward step and the unrolled
gradient. Writes/updates BENCH_DETAIL.json roofline entries."""
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

# kernel counts from the optimized HLO of the 200-step chunk
txt = run200.lower(vel, p).compile().as_text()

kernels = len(re.findall(r"^\s*%?(?:\w+[\w.-]*) = .*(?:fusion|custom-call)\(",
                         txt, re.M))
whiles = len(re.findall(r" = .*while\(", txt))
ccalls = len(re.findall(r"custom-call", txt))
print(f"[roofline] HLO: ~{kernels} fusion/custom-call ops, {whiles} whiles, "
      f"{ccalls} custom-call mentions", file=sys.stderr)

# gradient: per-unrolled-step device time from unroll deltas
def grad_wall(unroll, reps=6):
    forcing0 = jax.tree_util.tree_map(jnp.zeros_like, vel)

    def loss_fn(forcing, vel, p):
        def body(carry, _):
            vel, p, g1, g2 = carry
            o = step(vel, p, g1, g2, forcing)
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
print(f"[roofline] grad device {grad_dev_ms:.4f} ms/unrolled-step "
      f"(fwd+bwd), bwd-only ~{grad_dev_ms - fwd_dev_ms:.4f}",
      file=sys.stderr)

entry = {
    "grid": "512^2 turb (developed, tol 1e-6/1e-8), r4 kernels (whole-solve + corrector bridge + LARGE tier gates at defaults)",
    "protocol": "chunk-length deltas: (wall(200-step scan) - wall(50)) / 150"
                " removes per-call dispatch; grad via unroll 30-10 deltas",
    "fwd_device_ms_per_step": round(fwd_dev_ms, 4),
    "per_jit_call_overhead_ms": round(fwd_dispatch_ms, 2),
    "grad_device_ms_per_unrolled_step": round(grad_dev_ms, 4),
    "bwd_device_ms_per_step": round(grad_dev_ms - fwd_dev_ms, 4),
    "hlo_fusion_or_customcall_ops_in_chunk_module": kernels,
    "hlo_while_ops": whiles,
    "vs_r3b": "r3b whole-solve roofline (turb_512sq_r3b_whole_solve):"
              " device 0.1307 ms/step, 98 fusions — the r4 corrector bridge"
              " (DIFFPISO_FUSED_CORR) folds FVgrad+update+explicit_H+div"
              " between the two pressure solves into one launch",
    "note": "VERDICT r3 item 5 target was <=0.09 ms/step (2x the 0.0428 HBM"
            " floor); this entry records where the r4 corrector bridge"
            " landed against it",
}
path = os.path.join(os.path.dirname(__file__), "..", "BENCH_DETAIL.json")
detail = json.load(open(path))
detail.setdefault("roofline", {})["turb_512sq_r4_corrector"] = entry
json.dump(detail, open(path, "w"), indent=1)
print(json.dumps(entry))
