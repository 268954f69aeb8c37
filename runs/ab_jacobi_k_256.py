"""Sweeps-per-launch A/B at 256^3 (DIFFPISO_ADV_JACOBI_K = 4 | 8 | 16):
the 256^3 roofline (runs/roofline3d_256.log) shows the momentum solve
dominating the step (23.5 of 41.4 ms standalone-cold), and each z-block
launch pays a full HBM round of 10 volumes — the zblock kernel's
per-sweep exit makes extra in-launch sweeps nearly free when converged,
so if the solve runs >k sweeps, raising k trades frozen-boundary
staleness for whole HBM rounds. fwd 20-step chunks x3 + remat grad10,
interleaved.
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


def measure(k, n=256):
    os.environ["DIFFPISO_ADV_JACOBI_K"] = str(k)
    domain, sim, step, initial_state = bench.build_turbulence_3d(n, 1e-6)
    vel, p = initial_state(seed=0)
    fwd, iters, (vel_d, p_d) = bench.bench_forward(
        step, vel, p, 20, 3, spinup_calls=2
    )
    g, _ = bench.bench_grad(step, vel_d, p_d, 10, 4, remat=True)
    return fwd, g


results = {}
for rep in range(2):
    for k in (4, 8, 16):
        f, g = measure(k)
        results.setdefault(k, []).append((round(f, 1), round(g, 1)))
        print(f"[ab] rep{rep} turb3d256/K={k}: fwd {f:.1f} grad10 {g:.1f}",
              file=sys.stderr, flush=True)
print(results)
