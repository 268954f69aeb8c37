"""Within-process A/B of the per-shard kernel solvers on ONE chip.

A multi-chip run is unavailable in this image (single tunneled TPU), but a
(1,1)-extent mesh with both axes named compiles the identical program
family a real mesh would — shard_map + ppermute slivers + psum scalars +
per-shard Pallas kernels — with identity permutes. Comparing on the same
chip isolates the QUESTION THAT MATTERS for scale-out (VERDICT r3 item 1):
what throughput does a sharded trace get per chip,

  xla     — the r3 multi-chip path: no_pallas(), GSPMD jnp formulation
  kernels — sharded_solvers(): per-shard whole-solve kernels
  plain   — unsharded single-chip reference (whole-solve kernel family,
            jac2+pcg2), the ceiling

at turb512, fwd (200-step scan chunks) + grad30, 2 interleaved reps.
"""
import os
import sys

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
from diffpiso_tpu.ops.pallas_stencil import no_pallas

mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("y", "x"))


def trace_ctx_for(mode):
    if mode == "kernels":
        return lambda: sk.sharded_solvers(mesh, ("y", "x"))
    if mode == "xla":
        return lambda: no_pallas()
    return None


def measure(mode):
    domain, sim, step, initial_state = bench.build_turbulence(512, 1e-6)
    vel, p = initial_state(seed=0)
    ctx = trace_ctx_for(mode)
    # spinup 2: the FIRST post-compile execution of the shard_map kernel
    # program pays a multi-second one-time cost through the tunnel
    # (runs/ab_shard_attr.log chunk0 — 34-44 steps/s, then steady ~2100+);
    # timing must start at steady state
    fwd, iters, (vel_d, p_d) = bench.bench_forward(
        step, vel, p, 200, 8, spinup_calls=2, trace_ctx=ctx
    )
    g, _ = bench.bench_grad(step, vel_d, p_d, 30, 8, trace_ctx=ctx)
    return fwd, g


results = {}
for rep in range(2):
    for mode in ("xla", "kernels", "plain"):
        f, g = measure(mode)
        results.setdefault(mode, []).append((round(f, 1), round(g, 1)))
        print(
            f"[ab] rep{rep} turb512/{mode}: fwd {f:.1f} grad30 {g:.1f}",
            file=sys.stderr, flush=True,
        )
print(results)
