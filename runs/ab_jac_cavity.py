"""Within-process A/B of DIFFPISO_ADV_JACOBI on the 512^2 developed cavity.

The cavity is the warm-start-regime workload: BiCGSTAB's skip path exits
converged momentum solves after one residual check, so the Jacobi
accelerator's k-sweep launch can only lose there unless the k=1 probe
launch (krylov.py) restores the cheap exit. Interleaved never/all to
decide whether the probe pays.
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


def measure(mode):
    os.environ["DIFFPISO_ADV_JACOBI"] = mode
    domain, sim, step = bench.build(512, 1e-6)
    vel = domain.staggered_grid(0.0)
    p = domain.centered_grid(0.0)
    fwd, iters, (vel_d, p_d) = bench.bench_forward(
        step, vel, p, 200, 8, spinup_calls=10
    )
    g, _ = bench.bench_grad(step, vel_d, p_d, 30, 8)
    return fwd, g


results = {}
for rep in range(2):
    for mode in ("never", "all"):
        f, g = measure(mode)
        results.setdefault(mode, []).append((round(f, 1), round(g, 1)))
        print(f"[ab] rep{rep} {mode}: fwd {f:.1f} grad30 {g:.1f}",
              file=sys.stderr, flush=True)
print(results)
