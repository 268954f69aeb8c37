"""Within-process A/B of the 256^3 z-block momentum tier
(DIFFPISO_FUSED_JACZB never vs auto) — VERDICT r3 item 3a. never = the
per-plane-frozen sweep launch (eligible_3d path, the r3 256^3 fallback);
auto = fused_jacobi_zblock_3d (k full 3-D sweeps per launch, live
z-coupling within bz-plane blocks). fwd 20-step chunks x3 + remat grad10
x4 reps, 2 interleaved reps."""
import os
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/diffpiso_jax_cache"),
)
import bench


def measure(mode, n=256):
    os.environ["DIFFPISO_FUSED_JACZB"] = mode
    domain, sim, step, initial_state = bench.build_turbulence_3d(n, 1e-6)
    vel, p = initial_state(seed=0)
    fwd, iters, (vel_d, p_d) = bench.bench_forward(
        step, vel, p, 20, 3, spinup_calls=2
    )
    g, _ = bench.bench_grad(step, vel_d, p_d, 10, 4, remat=True)
    return fwd, g


results = {}
for rep in range(2):
    for mode in ("never", "auto"):
        f, g = measure(mode)
        results.setdefault(mode, []).append((round(f, 1), round(g, 1)))
        print(f"[ab] rep{rep} turb3d256/{mode}: fwd {f:.1f} grad10 {g:.1f}",
              file=sys.stderr, flush=True)
print(results)
