"""r5 within-process A/B of the sharded solvers with the whole-solve
pressure tier (block-Jacobi rounds, parallel/shard_kernels.py) on ONE chip.

Modes at turb512 (fwd 200-step scan chunks + grad30, interleaved reps):

  xla       — no_pallas() GSPMD jnp formulation (the r3 multi-chip path)
  kernels   — sharded_solvers() at r5 defaults: on the (1,1) mesh the
              extent-1 axes use live in-kernel rolls, so the per-shard
              kernels ARE the single-chip whole-solve family + the
              shard_map/collective wrapper — what a 1-chip mesh user gets
  slivers   — DIFFPISO_SHARD_FORCE_SLIVERS=1: the honest structural proxy
              for a real multi-device mesh (frozen ppermute slivers, outer
              halo trips, cut local blocks) — THE number VERDICT r4 item 1
              gates on (>=80% of plain)
  adj       — slivers + DIFFPISO_SHARDED_KERNELS_ADJ=auto: adjoint solves
              also dispatch to the per-shard kernels (r4 measured -36%
              with the per-iteration path; the whole-solve tier is the
              re-attack)
  plain     — unsharded single-chip ceiling (jac2+pcg2)
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

MODES = {
    "xla": (no_pallas, {}),
    "kernels": (lambda: sk.sharded_solvers(mesh, ("y", "x")), {}),
    "slivers": (
        lambda: sk.sharded_solvers(mesh, ("y", "x")),
        {"DIFFPISO_SHARD_FORCE_SLIVERS": "1"},
    ),
    "adj": (
        lambda: sk.sharded_solvers(mesh, ("y", "x")),
        {
            "DIFFPISO_SHARD_FORCE_SLIVERS": "1",
            "DIFFPISO_SHARDED_KERNELS_ADJ": "auto",
        },
    ),
    "plain": (None, {}),
}


def measure(mode):
    ctx, env = MODES[mode]
    old = {}
    for k, v in env.items():
        old[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        domain, sim, step, initial_state = bench.build_turbulence(512, 1e-6)
        vel, p = initial_state(seed=0)
        fwd, iters, (vel_d, p_d) = bench.bench_forward(
            step, vel, p, 200, 8, spinup_calls=2, trace_ctx=ctx
        )
        g, _ = bench.bench_grad(step, vel_d, p_d, 30, 8, trace_ctx=ctx)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return fwd, g


results = {}
for rep in range(2):
    for mode in MODES:
        f, g = measure(mode)
        results.setdefault(mode, []).append((round(f, 1), round(g, 1)))
        print(
            f"[ab] rep{rep} turb512/{mode}: fwd {f:.1f} grad30 {g:.1f}",
            file=sys.stderr, flush=True,
        )
print(results)
