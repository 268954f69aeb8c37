"""Within-process A/B of DIFFPISO_FUSED_FV on the 3-D 128^3 workload.

The fused z-gridded divergence/gradient kernels (ops/pallas_fv.py) replace
the XLA roll chains that runs/roofline3d.py measured at ~10x the HBM floor.
Env is read at trace time, so each mode gets a fresh build + jit.
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
    os.environ["DIFFPISO_FUSED_FV"] = mode
    domain, sim, step, initial_state = bench.build_turbulence_3d(128, 1e-6)
    vel, p = initial_state(seed=0)
    fwd, iters, (vel_d, p_d) = bench.bench_forward(
        step, vel, p, 50, 3, spinup_calls=2
    )
    g, _ = bench.bench_grad(step, vel_d, p_d, 10, 4)
    return fwd, g


results = {}
for rep in range(2):
    for mode in ("never", "auto"):
        f, g = measure(mode)
        results.setdefault(mode, []).append((round(f, 1), round(g, 1)))
        print(f"[ab] rep{rep} {mode}: fwd {f:.1f} grad10 {g:.1f}",
              file=sys.stderr, flush=True)
print(results)
