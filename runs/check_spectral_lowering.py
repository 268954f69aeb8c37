"""Mosaic lowering + equality smoke for fused_spectral_apply on the real TPU.

Checks every basis family and the unaligned cavity shape (513x512) against
the XLA tensordot path at both HIGH and HIGHEST contraction precision.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/diffpiso_jax_cache"),
)
os.environ["DIFFPISO_FUSED_SPECTRAL"] = "auto"

from diffpiso_tpu.solvers import fourier as fo
from diffpiso_tpu.solvers.pallas_krylov import (
    spectral_eligible,
    spectral_eligible_3d,
)

rng = np.random.RandomState(0)
for kinds, shape in [
    (("fourier", "fourier"), (512, 512)),
    (("dct2", "dct2"), (513, 512)),
    (("dct2", "dct4"), (256, 384)),
    (("fourier", "fourier", "fourier"), (128, 128, 128)),
]:
    for precision in ("high", "highest"):
        solver = fo.MatmulSpectralSolver(
            kinds=kinds, shape=shape, precision=precision
        )
        rhs = jnp.asarray(rng.randn(*shape), jnp.float32)
        w = tuple(jnp.float32(v) for v in (0.8, 1.2, 0.9)[: len(shape)])
        elig = spectral_eligible if len(shape) == 2 else spectral_eligible_3d
        assert elig(shape, rhs.dtype), (kinds, shape)
        out = jax.jit(lambda r: solver.solve(w, r))(rhs)
        ref = jax.jit(lambda r: fo._mm_solve_xla(solver, w, r))(rhs)
        out, ref = np.asarray(out), np.asarray(ref)
        scale = np.abs(ref).max()
        err = np.abs(out - ref).max() / scale
        print(f"{kinds} {shape} {precision}: rel-err {err:.2e}", flush=True)
        # both paths run at the same contraction precision but different
        # accumulation orders; this is a lowering smoke (exact-math equality
        # is pinned by the interpret-mode tests)
        assert err < 1e-4, (kinds, shape, precision, err)
print("LOWERING OK")
