"""Within-process A/B of DIFFPISO_FUSED_PCG2 (whole-solve one-launch spectral PCG) on the 512^2 workloads.

The fused MatmulSpectralSolver apply (pallas_krylov.fused_spectral_apply)
replaces the 4-tensordot XLA chain with one MXU Pallas launch per
preconditioner application (~3 applications/step incl. z0). Env is read at
trace time, so each mode gets a fresh build + jit. turb exercises fft_mm on
512x512; cavity exercises dct_mm on the unaligned 513x512 pressure grid.
"""
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
for rep in range(2):
    for workload in ("turb", "cavity"):
        for mode in ("never", "auto"):
            f, g, it = measure(mode, workload)
            results.setdefault((workload, mode), []).append(
                (round(f, 1), round(g, 1))
            )
            print(
                f"[ab] rep{rep} {workload}/{mode}: fwd {f:.1f} grad30 {g:.1f}"
                f" iters {np.round(it, 2)}",
                file=sys.stderr, flush=True,
            )
print(results)
