"""Within-process A/B of the per-component whole-solve momentum tier
(DIFFPISO_FUSED_JAC1) at the shapes past the joint-kernel budget:
1024^2 turbulence and the 512x2048 DNS grid. Baseline never = the
generic unfused XLA BiCGSTAB loop (these shapes had NO momentum
accelerator before this tier)."""
import argparse
import os
import sys
import types

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/diffpiso_jax_cache"),
)
import bench

ap = argparse.ArgumentParser()
ap.add_argument("--workloads", default="turb1024,dns_big")
ap.add_argument("--reps", type=int, default=2)
args_cli = ap.parse_args()


def measure_turb(mode, n):
    os.environ["DIFFPISO_FUSED_JAC1"] = mode
    domain, sim, step, initial_state = bench.build_turbulence(n, 1e-6)
    vel, p = initial_state(seed=0)
    fwd, iters, (vel_d, p_d) = bench.bench_forward(
        step, vel, p, 50, 8, spinup_calls=1
    )
    g, _ = bench.bench_grad(step, vel_d, p_d, 30, 8)
    return fwd, g, np.asarray(iters).mean(0)


def measure_dns(mode, hrres):
    os.environ["DIFFPISO_FUSED_JAC1"] = mode
    a = types.SimpleNamespace(quick=False, tol=1e-6, fwd_only=False)
    out = bench.workload_dns(a, hrres=hrres)
    return (
        out["fwd_steps_per_sec"],
        out.get("grad30_steps_per_sec", float("nan")),
        out["fwd_pressure_iters_per_step"],
    )


results = {}
for rep in range(args_cli.reps):
    for wl in args_cli.workloads.split(","):
        for mode in ("never", "auto"):
            if wl == "turb1024":
                f, g, it = measure_turb(mode, 1024)
            else:
                f, g, it = measure_dns(mode, (512, 2048))
            results.setdefault((wl, mode), []).append(
                (round(f, 1), round(g, 1))
            )
            print(
                f"[ab] rep{rep} {wl}/jac1={mode}: fwd {f:.1f} grad30 {g:.1f}"
                f" iters {np.round(np.asarray(it, float), 2)}",
                file=sys.stderr, flush=True,
            )
print(results)
