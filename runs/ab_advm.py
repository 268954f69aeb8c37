"""Within-process A/B of DIFFPISO_FUSED_ADVM (general-mask fused assembly)
on the bounded workloads: 512^2 developed cavity and the 128x512 DNS
mixing layer. Env read at trace time; fresh build per mode."""
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

CAV_SPINUP = int(os.environ.get("AB_CAV_SPINUP", "2000"))


def measure_cavity(mode, fvm, n=512):
    os.environ["DIFFPISO_FUSED_ADVM"] = mode
    os.environ["DIFFPISO_FUSED_FVM"] = fvm
    domain, sim, step = bench.build(n, 1e-6)
    vel = domain.staggered_grid(0.0)
    p = domain.centered_grid(0.0)
    fwd, iters, (vel_d, p_d) = bench.bench_forward(
        step, vel, p, 200, 8, spinup_calls=max(1, CAV_SPINUP // 200)
    )
    g, _ = bench.bench_grad(step, vel_d, p_d, 30, 8)
    return fwd, g, np.asarray(iters).mean(0)


results = {}
for rep in range(2):
    for mode, fvm in (("never", "never"), ("auto", "never"),
                      ("never", "auto"), ("auto", "auto")):
        f, g, it = measure_cavity(mode, fvm)
        results.setdefault(("cavity", mode, fvm), []).append(
            (round(f, 1), round(g, 1))
        )
        print(
            f"[ab] rep{rep} cavity/advm={mode}/fvm={fvm}: fwd {f:.1f} grad30 {g:.1f}"
            f" iters {np.round(it, 2)}",
            file=sys.stderr, flush=True,
        )
# the monolithic masked assembly is VMEM-ineligible at 512 (Mosaic compile
# fails when forced — see runs/check_spectral_lowering.py); its only
# engagement window is <=~320, so measure the ADVM axis where it can run
for rep in range(2):
    for mode in ("never", "auto"):
        f, g, it = measure_cavity(mode, "never", n=256)
        results.setdefault(("cavity256", mode, "never"), []).append(
            (round(f, 1), round(g, 1))
        )
        print(
            f"[ab] rep{rep} cavity256/advm={mode}: fwd {f:.1f} grad30 {g:.1f}"
            f" iters {np.round(it, 2)}",
            file=sys.stderr, flush=True,
        )
print(results)
