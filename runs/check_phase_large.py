"""TPU lowering + parity check for the LARGE-plane fused-phase tier
(DIFFPISO_FUSED_KRYLOV_LARGE): the per-iteration PCG phase kernels
(fused_residual / fused_pcg_apply / fused_pcg_mm_update with the in-kernel
bf16x3 HIGH branch) at the shapes where the whole-solve pcg2 kernel hits
its Mosaic wall — 1024^2 (dct_mm) and 512x2048 (channel_mm, the 16 MiB
eigenbasis). Validates both sides of each eligibility boundary per the
CLAUDE.md contract discipline.

Run (TPU): python runs/check_phase_large.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/diffpiso_jax_cache"),
)

import jax.numpy as jnp
import numpy as np

from diffpiso_tpu import StaggeredField
from diffpiso_tpu.ops import apply_laplacian, assemble_pressure_laplacian
from diffpiso_tpu.solvers import pcg
from diffpiso_tpu.solvers.fourier import MatmulSpectralSolver
from diffpiso_tpu.solvers.pallas_krylov import (
    eligible,
    mm_update_large_eligible,
    pcg2_eligible,
)

assert jax.default_backend() == "tpu", jax.default_backend()

# -- gate boundaries -------------------------------------------------------------------
os.environ["DIFFPISO_FUSED_KRYLOV_LARGE"] = "auto"
assert eligible((1024, 1024), jnp.float32)  # kinds unknown -> shape-only
assert eligible((512, 2048), jnp.float32)
assert not eligible((2048, 2048), jnp.float32)  # 16 MiB plane: past the tier
# family restriction (runs/ab_phase_large.log): fourier wins, dct2 loses
assert eligible((1024, 1024), jnp.float32, large_kinds=("fourier", "fourier"))
assert not eligible((1024, 1024), jnp.float32, large_kinds=("dct2", "dct2"))
assert eligible((512, 512), jnp.float32, large_kinds=("dct2", "dct2"))  # small tier: no restriction
assert mm_update_large_eligible((1024, 1024), jnp.float32)
assert mm_update_large_eligible((1024, 1024), jnp.float32, kinds=("fourier", "fourier"))
assert not mm_update_large_eligible((512, 2048), jnp.float32, kinds=("dct2", "dct4"))
assert not mm_update_large_eligible((2048, 2048), jnp.float32)
assert not pcg2_eligible((1024, 1024), jnp.float32)  # pcg2 wall unchanged
os.environ["DIFFPISO_FUSED_KRYLOV_LARGE"] = "never"
assert not eligible((1024, 1024), jnp.float32)
assert eligible((512, 512), jnp.float32)  # small tier unaffected
print("gates: OK")


def solve_case(shape, kinds, seed, periodic=(False, False)):
    ny, nx = shape
    rng = np.random.RandomState(seed)
    py, px = (0 if p else 1 for p in periodic)
    infl = StaggeredField(
        (
            jnp.asarray(rng.rand(ny + py, nx) + 0.5, jnp.float32),
            jnp.asarray(rng.rand(ny, nx + px) + 0.5, jnp.float32),
        ),
        periodic=tuple(periodic),
    )
    act = np.zeros((ny + 2, nx + 2), np.float32)
    act[1:-1, 1:-1] = 1
    if any(periodic):
        act[:] = 1
    lap = assemble_pressure_laplacian(
        infl, jnp.asarray(act), jnp.asarray(act), periodic, True
    )
    y = jnp.asarray(rng.randn(ny, nx).astype(np.float32))
    rhs = apply_laplacian(lap, y)
    rhs = rhs - jnp.mean(rhs)
    mss = MatmulSpectralSolver(kinds=kinds, shape=shape)
    weights = tuple(jnp.mean(jnp.abs(l)) for l in lap.lo)

    def run(mode):
        os.environ["DIFFPISO_FUSED_KRYLOV_LARGE"] = mode

        @jax.jit
        def _s(rhs):
            return pcg(
                lambda p: apply_laplacian(lap, p), rhs, None,
                precond=lambda r: mss.precondition(weights, r),
                tol=1e-5, max_iter=200, deflate_mean=True,
                precond_zero_mean=True, stencil=lap,
                precond_mm=(mss, weights),
            )

        res = _s(rhs)
        jax.block_until_ready(res.x)
        return res

    ref = run("never")
    assert not bool(ref.warn)
    got = run("auto")
    assert not bool(got.warn)
    resid = apply_laplacian(lap, got.x) - rhs
    resid = resid - jnp.mean(resid)
    tn = float(jnp.max(jnp.abs(resid)))
    scale = float(jnp.max(jnp.abs(ref.x))) or 1.0
    d = float(jnp.max(jnp.abs(got.x - ref.x))) / scale
    print(
        f"pcg {shape} {kinds}: OK (never {int(ref.iterations)} it / auto "
        f"{int(got.iterations)} it, true resid {tn:.2e}, sol delta {d:.2e})"
    )
    assert tn < 1e-4, tn
    assert d < 1e-3, d


# fourier kinds: the measured LARGE-tier winner — 'auto' actually runs the
# phase kernels here (family gate admits it); parity vs the XLA loop
solve_case((1024, 1024), ("fourier", "fourier"), 7, periodic=(True, True))
# dct2 kinds: the family gate EXCLUDES these under auto (measured loser,
# runs/ab_phase_large.log) — this leg now checks auto == never dispatch
# doesn't perturb the solve. The dct4/channel_mm path at the real
# aspect/BCs is exercised by the dns leg of runs/ab_phase_large.py.
solve_case((512, 2048), ("dct2", "dct2"), 8)

# -- full step at turb1024 under the tier ----------------------------------------------
import bench

os.environ["DIFFPISO_FUSED_KRYLOV_LARGE"] = "auto"
domain, sim, step, initial_state = bench.build_turbulence(1024, 1e-6)
vel, p = initial_state(seed=0)
run = bench._make_runner(step, 10)
vel, p, iters, warns = run(vel, p)
jax.block_until_ready(p)
assert not bool(jnp.any(warns)), "warned inside the full step"
print(f"turb1024 full step x10: OK (pressure iters {np.asarray(iters).mean(0)})")
print("ALL LARGE-TIER CHECKS PASSED")
