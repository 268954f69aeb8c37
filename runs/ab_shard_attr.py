"""Attribution A/B for the per-shard kernel loss (runs/ab_shard_kernels.log
showed kernels fwd 824 vs xla 2096 on the (1,1) mesh): which solve family
pays, and is the instability (rep0 192 vs rep1 824) reproducible?

Modes: never (GSPMD jnp), momentum (only the momentum trips kernelized),
pressure (only the distributed PCG kernelized), auto (both). 4 timed
chunks per mode to expose chunk-to-chunk instability.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/diffpiso_jax_cache"),
)
import numpy as np
from jax.sharding import Mesh

import bench
from diffpiso_tpu.parallel import shard_kernels as sk

mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("y", "x"))


def measure(mode, grad=False):
    os.environ["DIFFPISO_SHARDED_KERNELS"] = mode
    domain, sim, step, initial_state = bench.build_turbulence(512, 1e-6)
    vel, p = initial_state(seed=0)
    ctx = lambda: sk.sharded_solvers(mesh, ("y", "x"))
    run = bench._make_runner(step, 200, trace_ctx=ctx)
    vel, p, iters, warns = run(vel, p)  # spinup + compile
    jax.block_until_ready(p)
    for chunk in range(4):
        t0 = time.perf_counter()
        vel, p, iters, warns = run(vel, p)
        jax.block_until_ready(p)
        dt = time.perf_counter() - t0
        print(
            f"[attr] {mode} chunk{chunk}: {200/dt:.1f} steps/s "
            f"(p_iters {np.asarray(iters).mean(0)}, warn "
            f"{float(np.asarray(warns).mean()):.3f})",
            flush=True,
        )
    if grad:
        g, _ = bench.bench_grad(step, vel, p, 30, 8, trace_ctx=ctx)
        g2, _ = bench.bench_grad(step, vel, p, 30, 8, trace_ctx=ctx)
        print(f"[attr] {mode} grad30: {g:.1f} / {g2:.1f}", flush=True)


for mode in ("never", "momentum", "pressure", "auto"):
    measure(mode, grad=True)
