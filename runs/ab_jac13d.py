"""Within-process A/B of the 3-D whole-solve momentum tier
(DIFFPISO_FUSED_JAC13D) at 128^3: never = the z-plane-gridded k-sweep
launches (the prior default), auto = one single-program launch per
component with the full volume VMEM-resident."""
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/diffpiso_jax_cache"),
)
import bench


def measure(mode):
    os.environ["DIFFPISO_FUSED_JAC13D"] = mode
    domain, sim, step, init3 = bench.build_turbulence_3d(128, 1e-6)
    vel, p = init3(seed=0)
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
        print(f"[ab] rep{rep} jac13d={mode}: fwd {f:.1f} grad10 {g:.1f}",
              file=sys.stderr, flush=True)
print(results)
