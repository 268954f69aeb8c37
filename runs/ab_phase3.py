"""Within-process A/B of the monolithic rank-3 PCG phase kernels
(DIFFPISO_FUSED_PHASE3 never vs auto) at 128^3 turbulence — the 3-D
pressure tier (VERDICT r3 item 3b: PCG3's 6 z-gridded launches lost;
these are 2 whole-volume launches per iteration + XLA preconditioner).
fwd 20-step chunks x4 + grad10 x6 reps, 2 interleaved reps."""
import os
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/diffpiso_jax_cache"),
)
import jax.numpy as jnp

import bench
from diffpiso_tpu.solvers.pallas_krylov import eligible3

os.environ["DIFFPISO_FUSED_PHASE3"] = "auto"
assert eligible3((128, 128, 128), jnp.float32)
assert not eligible3((256, 256, 256), jnp.float32)  # past the 110 MiB tier


def measure(mode, n=128):
    os.environ["DIFFPISO_FUSED_PHASE3"] = mode
    domain, sim, step, initial_state = bench.build_turbulence_3d(n, 1e-6)
    vel, p = initial_state(seed=0)
    fwd, iters, (vel_d, p_d) = bench.bench_forward(
        step, vel, p, 20, 4, spinup_calls=2
    )
    g, _ = bench.bench_grad(step, vel_d, p_d, 10, 6)
    return fwd, g


results = {}
for rep in range(2):
    for mode in ("never", "auto"):
        f, g = measure(mode)
        results.setdefault(mode, []).append((round(f, 1), round(g, 1)))
        print(f"[ab] rep{rep} turb3d128/{mode}: fwd {f:.1f} grad10 {g:.1f}",
              file=sys.stderr, flush=True)
print(results)
