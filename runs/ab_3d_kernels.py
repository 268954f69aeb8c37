"""Within-process A/B of the r3 gated 3-D kernels at 128^3.

Sweeps DIFFPISO_FUSED_SPECTRAL (rank-3 fused fft_mm preconditioner) and
DIFFPISO_FUSED_ADV3 (z-gridded fused advection assembly) — plus the
combined config — against the current defaults. The plane-block Jacobi
chain (DIFFPISO_ADV_JACOBI_K in-launch sweeps) is already default-on and
covered by runs/ab_jac3d.py. Env is read at trace time, fresh build per
mode.
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

MODES = [
    ("never", "never", "never"),
    ("auto", "never", "never"),
    ("never", "auto", "never"),
    ("auto", "auto", "never"),
    ("auto", "auto", "auto"),
]


def measure(spectral, adv3, pcg3):
    os.environ["DIFFPISO_FUSED_SPECTRAL"] = spectral
    os.environ["DIFFPISO_FUSED_ADV3"] = adv3
    os.environ["DIFFPISO_FUSED_PCG3"] = pcg3
    domain, sim, step, initial_state = bench.build_turbulence_3d(128, 1e-6)
    vel, p = initial_state(seed=0)
    fwd, iters, (vel_d, p_d) = bench.bench_forward(
        step, vel, p, 50, 3, spinup_calls=2
    )
    g, _ = bench.bench_grad(step, vel_d, p_d, 10, 4)
    return fwd, g, np.asarray(iters).mean(0)


results = {}
for rep in range(2):
    for spectral, adv3, pcg3 in MODES:
        f, g, it = measure(spectral, adv3, pcg3)
        results.setdefault((spectral, adv3, pcg3), []).append(
            (round(f, 1), round(g, 1))
        )
        print(
            f"[ab] rep{rep} spectral={spectral} adv3={adv3} pcg3={pcg3}: "
            f"fwd {f:.1f} grad10 {g:.1f} iters {np.round(it, 2)}",
            file=sys.stderr, flush=True,
        )
print(results)
