"""Within-process A/B of the ROW-TILED corrector bridge at turb 1024^2 —
the re-flip condition recorded against the monolithic bridge's -7.6% loss
there (runs/ab_corr.log). never = all-XLA glue; auto now dispatches the
tiled variant at the 1024^2 class (pallas_corrector._variant). fwd
100-step chunks + grad30, 2 interleaved reps.
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


def measure(mode, n):
    os.environ["DIFFPISO_FUSED_CORR"] = mode
    from diffpiso_tpu.ops import pallas_corrector as pc

    if mode == "auto":
        assert pc._variant((n, n), "float32") == "tiled", (n, mode)
    domain, sim, step, initial_state = bench.build_turbulence(n, 1e-6)
    vel, p = initial_state(seed=0)
    fwd, iters, (vel_d, p_d) = bench.bench_forward(
        step, vel, p, 100, 6, spinup_calls=2
    )
    g, _ = bench.bench_grad(step, vel_d, p_d, 30, 8)
    return fwd, g


results = {}
for rep in range(2):
    for mode in ("never", "auto"):
        f, g = measure(mode, 1024)
        results.setdefault(mode, []).append((round(f, 1), round(g, 1)))
        print(f"[ab] rep{rep} turb1024/{mode}: fwd {f:.1f} grad30 {g:.1f}",
              file=sys.stderr, flush=True)
print(results)
