"""r5 gap decomposition: how much of the sharded-kernels vs plain gap is
the no_pallas() NON-SOLVE chains (assembly/FV/corrector forced to XLA
under shard_map traces)?

Modes at turb512 (fwd + grad30, 1 rep — coarse attribution):
  plain        — all kernels (ceiling, 6418-6483 from ab_shard_kernels_r5)
  plain_xglue  — plain solve kernels, but FV + corrector-bridge + advection
                 -assembly + unmasked-asm kernels OFF (XLA glue): the
                 structural ceiling for the current sharded design, which
                 no_pallas()-es everything except the solves
  kernels      — sharded_solvers() on the (1,1) mesh (r5 live rolls)
If plain_xglue ~= kernels, the remaining gap LIVES in the glue, and the
next sharded milestone is per-shard assembly/FV/corrector kernels, not
better solver kernels.
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

mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("y", "x"))

GLUE_ENVS = {
    "DIFFPISO_FUSED_FV": "never",
    "DIFFPISO_FUSED_CORR": "never",
    "DIFFPISO_UNMASKED_ASM": "never",
    "DIFFPISO_FUSED_FVM": "never",
}

MODES = {
    "plain": (None, {}),
    "plain_xglue": (None, GLUE_ENVS),
    "kernels": (lambda: sk.sharded_solvers(mesh, ("y", "x")), {}),
}

results = {}
for mode, (ctx, env) in MODES.items():
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
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
    results[mode] = (round(fwd, 1), round(g, 1))
    print(f"[ab] turb512/{mode}: fwd {fwd:.1f} grad30 {g:.1f}",
          file=sys.stderr, flush=True)
print(results)
