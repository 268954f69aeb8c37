"""Within-process A/B: per-step jax.checkpoint (remat) in the 30-step
unrolled gradient at the 512^2 turb headline.

r2 measured-and-rejected remat for speed — but that predates the
whole-solve kernels: the forward step is now 6.7x cheaper (156 us), so
replaying it in the backward scan may beat reading the per-step stash
(dozens of f32[30,512,512] dynamic-slice round trips) from HBM.
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


def measure(remat, n=512):
    domain, sim, step, initial_state = bench.build_turbulence(n, 1e-6)
    vel, p = initial_state(seed=0)
    fwd, iters, (vel_d, p_d) = bench.bench_forward(
        step, vel, p, 200, 2, spinup_calls=1
    )
    g, _ = bench.bench_grad(step, vel_d, p_d, 30, 8, remat=remat)
    return g


results = {}
for rep in range(2):
    for remat in (False, "solves", True):
        g = measure(remat)
        results.setdefault(remat, []).append(round(g, 1))
        print(f"[ab] rep{rep} remat={remat}: grad30 {g:.1f}",
              file=sys.stderr, flush=True)
print(results)
