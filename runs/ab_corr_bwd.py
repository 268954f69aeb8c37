"""r5 A/B: the fused corrector VJP kernels at the turb512 grad30 headline.

Modes (2 interleaved reps, 'outputs' remat protocol — the production
grad path, where the bridge backward runs once per replayed step):
  never — jax.vjp XLA recompute (the r4 backward)
  auto  — fused one-launch backward kernels (bridge + tail)
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/diffpiso_jax_cache"),
)
import bench

results = {}
domain, sim, step, initial_state = bench.build_turbulence(512, 1e-6)
vel, p = initial_state(seed=0)
fwd, iters, (vel_d, p_d) = bench.bench_forward(step, vel, p, 200, 8,
                                               spinup_calls=2)
print(f"[ab] control fwd {fwd:.1f}", file=sys.stderr, flush=True)
for rep in range(2):
    for mode in ("never", "auto"):
        os.environ["DIFFPISO_FUSED_CORR_BWD"] = mode
        g, _ = bench.bench_grad(step, vel_d, p_d, 30, 8, remat="outputs")
        results.setdefault(mode, []).append(round(g, 1))
        print(f"[ab] rep{rep} turb512 corr_bwd={mode}: grad30 {g:.1f}",
              file=sys.stderr, flush=True)
print(results)
