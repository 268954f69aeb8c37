"""Within-process A/B of DIFFPISO_ADV_JACOBI modes on the 3-D 128^3 workload.

The 3-D z-plane-gridded Jacobi sweep (pallas_krylov.fused_jacobi_sweep_3d)
pays one launch PER sweep (cross-plane deps forbid in-launch chaining), so
unlike 2-D the launch amortization argument is weaker — measure all/adjoint/
never interleaved to decide the 3-D default. Env is read at trace time, so
each mode gets a fresh build + jit.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/diffpiso_jax_cache"),
)
import bench


def measure(mode):
    os.environ["DIFFPISO_ADV_JACOBI"] = mode
    domain, sim, step, initial_state = bench.build_turbulence_3d(128, 1e-6)
    vel, p = initial_state(seed=0)
    fwd, iters, (vel_d, p_d) = bench.bench_forward(
        step, vel, p, 50, 3, spinup_calls=2
    )
    g, _ = bench.bench_grad(step, vel_d, p_d, 10, 4)
    return fwd, g


results = {}
for rep in range(2):
    for mode in ("never", "all", "adjoint"):
        f, g = measure(mode)
        results.setdefault(mode, []).append((round(f, 1), round(g, 1)))
        print(f"[ab] rep{rep} {mode}: fwd {f:.1f} grad10 {g:.1f}",
              file=sys.stderr, flush=True)
print(results)
