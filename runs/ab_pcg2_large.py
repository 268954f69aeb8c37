"""Within-process A/B of the whole-solve spectral PCG at the LARGE shapes:
1024^2 turbulence and both DNS mixing-layer grids, with the plane budget
raised (DIFFPISO_PCG2_MIB=96) so they become eligible. Decides whether the
default budget moves past the 512^2 class. Also re-runs 512^2 turb to
measure the bf16x3 HIGH fix (the first A/B accidentally ran the
preconditioner at HIGHEST — 6 passes — inside the kernel)."""
import argparse
import os
import sys
import types

sys.path.insert(0, "/root/repo")
# NOTE: raising DIFFPISO_PCG2_MIB past the default puts the 1024^2/dns_big
# shapes on a hard Mosaic scoped-vmem wall inside the full step (the
# kernel's reservation tracks its ceiling; compiles OOM ~1.3 MiB over the
# limit at 96/108/116 MiB) — see pcg2_eligible. Default budget kept here:
# dns_small is the remaining large-ish eligible shape.
os.environ.setdefault("DIFFPISO_PCG2_MIB", "24")
import numpy as np
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/diffpiso_jax_cache"),
)
import bench

ap = argparse.ArgumentParser()
ap.add_argument("--workloads", default="turb512,turb1024,dns_small,dns_big")
ap.add_argument("--reps", type=int, default=2)
args_cli = ap.parse_args()


def measure_turb(mode, n):
    os.environ["DIFFPISO_FUSED_PCG2"] = mode
    domain, sim, step, initial_state = bench.build_turbulence(n, 1e-6)
    vel, p = initial_state(seed=0)
    spc = 200 if n <= 512 else 50
    fwd, iters, (vel_d, p_d) = bench.bench_forward(
        step, vel, p, spc, 8, spinup_calls=1
    )
    g, _ = bench.bench_grad(step, vel_d, p_d, 30, 8)
    return fwd, g, np.asarray(iters).mean(0)


def measure_dns(mode, hrres):
    os.environ["DIFFPISO_FUSED_PCG2"] = mode
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
            if wl == "turb512":
                f, g, it = measure_turb(mode, 512)
            elif wl == "turb1024":
                f, g, it = measure_turb(mode, 1024)
            elif wl == "dns_small":
                f, g, it = measure_dns(mode, (128, 512))
            else:
                f, g, it = measure_dns(mode, (512, 2048))
            results.setdefault((wl, mode), []).append(
                (round(f, 1), round(g, 1))
            )
            print(
                f"[ab] rep{rep} {wl}/{mode}: fwd {f:.1f} grad30 {g:.1f}"
                f" iters {np.round(np.asarray(it, float), 2)}",
                file=sys.stderr, flush=True,
            )
print(results)
