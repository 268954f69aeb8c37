"""Within-process A/B of the whole-solve momentum kernel (DIFFPISO_FUSED_JAC2).

turb512: ADV_JACOBI=all with jac2 never vs auto (does the one-launch
whole-solve beat the probe + k-sweep launch loop?).
cavity: three-way — ADV_JACOBI=never (the r3 recommendation for the
warm-start class), all+jac2=never, all+jac2=auto. The whole-solve kernel
exits warm-converged solves after ONE launch (init residual only), so it
may flip the cavity recommendation back to the accelerator.
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


def measure_turb(jac, jac2):
    os.environ["DIFFPISO_ADV_JACOBI"] = jac
    os.environ["DIFFPISO_FUSED_JAC2"] = jac2
    domain, sim, step, initial_state = bench.build_turbulence(512, 1e-6)
    vel, p = initial_state(seed=0)
    fwd, iters, (vel_d, p_d) = bench.bench_forward(
        step, vel, p, 200, 8, spinup_calls=1
    )
    g, _ = bench.bench_grad(step, vel_d, p_d, 30, 8)
    return fwd, g


def measure_cavity(jac, jac2):
    os.environ["DIFFPISO_ADV_JACOBI"] = jac
    os.environ["DIFFPISO_FUSED_JAC2"] = jac2
    domain, sim, step = bench.build(512, 1e-6)
    vel = domain.staggered_grid(0.0)
    p = domain.centered_grid(0.0)
    fwd, iters, (vel_d, p_d) = bench.bench_forward(
        step, vel, p, 200, 8, spinup_calls=10
    )
    g, _ = bench.bench_grad(step, vel_d, p_d, 30, 8)
    return fwd, g


CONFIGS = {
    "turb": [("all", "never"), ("all", "auto")],
    "cavity": [("never", "never"), ("all", "never"), ("all", "auto")],
}
results = {}
for rep in range(2):
    for wl, cfgs in CONFIGS.items():
        fn = measure_turb if wl == "turb" else measure_cavity
        for jac, jac2 in cfgs:
            f, g = fn(jac, jac2)
            results.setdefault((wl, jac, jac2), []).append(
                (round(f, 1), round(g, 1))
            )
            print(
                f"[ab] rep{rep} {wl}/jac={jac}/jac2={jac2}: "
                f"fwd {f:.1f} grad30 {g:.1f}",
                file=sys.stderr, flush=True,
            )
print(results)
