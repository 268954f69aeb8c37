"""Within-process A/B of DIFFPISO_FUSED_FV on the 512^2 turbulence headline
(the monolithic 2-D div/grad kernels). Env is read at trace time, so each
mode gets a fresh build + jit."""
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
    os.environ["DIFFPISO_FUSED_FV"] = mode
    domain, sim, step, initial_state = bench.build_turbulence(512, 1e-6)
    vel, p = initial_state(seed=0)
    fwd, iters, (vel_d, p_d) = bench.bench_forward(
        step, vel, p, 200, 8, spinup_calls=2
    )
    g, _ = bench.bench_grad(step, vel_d, p_d, 30, 8)
    return fwd, g


results = {}
for rep in range(2):
    for mode in ("never", "auto"):
        f, g = measure(mode)
        results.setdefault(mode, []).append((round(f, 1), round(g, 1)))
        print(f"[ab] rep{rep} {mode}: fwd {f:.1f} grad30 {g:.1f}",
              file=sys.stderr, flush=True)
print(results)
