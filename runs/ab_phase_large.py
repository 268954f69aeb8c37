"""Within-process A/B of the LARGE-plane fused-phase tier
(DIFFPISO_FUSED_KRYLOV_LARGE never vs auto) at the two shapes whose
pressure loop was pure XLA in r3 (VERDICT item 2): turb 1024^2 (fwd 200
-step chunks + grad30) and the 512x2048 mixing-layer DNS (fwd + grad30 via
bench.workload_dns). 2 interleaved reps."""
import argparse
import os
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/diffpiso_jax_cache"),
)
import bench


def measure_turb(mode):
    os.environ["DIFFPISO_FUSED_KRYLOV_LARGE"] = mode
    domain, sim, step, initial_state = bench.build_turbulence(1024, 1e-6)
    vel, p = initial_state(seed=0)
    fwd, iters, (vel_d, p_d) = bench.bench_forward(
        step, vel, p, 200, 4, spinup_calls=2
    )
    g, _ = bench.bench_grad(step, vel_d, p_d, 30, 8)
    return fwd, g


def measure_dns(mode):
    os.environ["DIFFPISO_FUSED_KRYLOV_LARGE"] = mode
    args = argparse.Namespace(quick=False, tol=1e-6, fwd_only=False)
    out = bench.workload_dns(args, (512, 2048))
    return out["fwd_steps_per_sec"], out.get("grad30_steps_per_sec", 0.0)


results = {}
for rep in range(2):
    for wl, fn in (("turb1024", measure_turb), ("dns", measure_dns)):
        for mode in ("never", "auto"):
            f, g = fn(mode)
            results.setdefault((wl, mode), []).append(
                (round(f, 1), round(g, 1))
            )
            print(
                f"[ab] rep{rep} {wl}/{mode}: fwd {f:.1f} grad30 {g:.1f}",
                file=sys.stderr, flush=True,
            )
print(results)
