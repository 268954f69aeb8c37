"""Within-process A/B of the fused corrector-1 bridge
(DIFFPISO_FUSED_CORR never vs auto) at turb 512^2 and 1024^2 — VERDICT r3
item 5 (the inter-solve glue). fwd 200-step chunks + grad30, 2 interleaved
reps."""
import os
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/diffpiso_jax_cache"),
)
import bench


def measure(mode, n):
    os.environ["DIFFPISO_FUSED_CORR"] = mode
    domain, sim, step, initial_state = bench.build_turbulence(n, 1e-6)
    vel, p = initial_state(seed=0)
    chunks = 200 if n <= 512 else 100
    fwd, iters, (vel_d, p_d) = bench.bench_forward(
        step, vel, p, chunks, 6, spinup_calls=2
    )
    g, _ = bench.bench_grad(step, vel_d, p_d, 30, 8)
    return fwd, g


results = {}
for rep in range(2):
    for n in (512, 1024):
        for mode in ("never", "auto"):
            f, g = measure(mode, n)
            results.setdefault((n, mode), []).append(
                (round(f, 1), round(g, 1))
            )
            print(f"[ab] rep{rep} turb{n}/{mode}: fwd {f:.1f} grad30 {g:.1f}",
                  file=sys.stderr, flush=True)
print(results)
