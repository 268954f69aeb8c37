"""Within-process A/B of the alignment-gated DIFFPISO_FUSED_PCG2=auto
(adjoint solves fuse only on sublane/lane-aligned planes) vs never.
Cavity is the workload the gate exists for (513x512: adjoint falls back to
XLA, forward stays fused); one turb rep sanity-checks the aligned path."""
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

CAV_SPINUP = int(os.environ.get("AB_CAV_SPINUP", "2000"))


def measure(mode, workload):
    os.environ["DIFFPISO_FUSED_PCG2"] = mode
    if workload == "turb":
        domain, sim, step, initial_state = bench.build_turbulence(512, 1e-6)
        vel, p = initial_state(seed=0)
        fwd, iters, (vel_d, p_d) = bench.bench_forward(
            step, vel, p, 200, 8, spinup_calls=1
        )
    else:
        domain, sim, step = bench.build(512, 1e-6)
        vel = domain.staggered_grid(0.0)
        p = domain.centered_grid(0.0)
        fwd, iters, (vel_d, p_d) = bench.bench_forward(
            step, vel, p, 200, 8, spinup_calls=max(1, CAV_SPINUP // 200)
        )
    g, _ = bench.bench_grad(step, vel_d, p_d, 30, 8)
    return fwd, g, np.asarray(iters).mean(0)


results = {}
plan = [
    (0, "cavity", "never"), (0, "cavity", "auto"),
    (1, "cavity", "never"), (1, "cavity", "auto"),
    (0, "turb", "never"), (0, "turb", "auto"),
]
for rep, workload, mode in plan:
    f, g, it = measure(mode, workload)
    results.setdefault((workload, mode), []).append((round(f, 1), round(g, 1)))
    print(
        f"[ab] rep{rep} {workload}/{mode}: fwd {f:.1f} grad30 {g:.1f}"
        f" iters {np.round(it, 2)}",
        file=sys.stderr, flush=True,
    )
print(results)
