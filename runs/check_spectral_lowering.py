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


# -- rank-3 fused advection assembly lowering check -------------------------------
os.environ["DIFFPISO_FUSED_ADV3"] = "auto"
import jax.numpy as jnp
from diffpiso_tpu import StaggeredField
from diffpiso_tpu.ops import pallas_advassembly, stencil as stencil_mod
from diffpiso_tpu.ops import pallas_stencil as ps
from diffpiso_tpu.fields.material import CIRCULAR

nz, ny, nx = 32, 64, 128
vel = StaggeredField(
    tuple(jnp.asarray(rng.randn(nz, ny, nx), jnp.float32) for _ in range(3)),
    periodic=(True, True, True),
)
dm = StaggeredField(
    tuple(jnp.zeros((nz, ny, nx), bool) for _ in range(3)),
    periodic=(True, True, True),
)
active = jnp.ones((nz + 2, ny + 2, nx + 2), jnp.float32)
dx3 = (0.7, 1.3, 0.9)
assert pallas_advassembly.advassembly3_eligible(
    vel, dm, active, None, 2e-3, (True, True, True)
)
with ps.no_pallas():
    want = stencil_mod.assemble_advection_stencil(
        vel, dx3, tuple(((CIRCULAR, CIRCULAR),) * 3), 2e-3, 1.7,
        dm, active, active, None, (True, True, True),
    )
got = jax.jit(
    lambda v: pallas_advassembly.fused_advection_assembly_3d(v, dx3, 2e-3, 1.7)
)(vel)
centers, los, his, diag_As = got
for c in range(3):
    np.testing.assert_allclose(np.asarray(centers[c]), np.asarray(want.center[c]),
                               rtol=1e-5, atol=1e-5)
    for d in range(3):
        np.testing.assert_allclose(np.asarray(los[c][d]), np.asarray(want.lo[c][d]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(his[c][d]), np.asarray(want.hi[c][d]),
                                   rtol=1e-5, atol=1e-5)
print("ADV3 LOWERING OK")


# -- fused rank-3 PCG + plane-block Jacobi lowering checks ------------------------
os.environ["DIFFPISO_FUSED_PCG3"] = "auto"
from diffpiso_tpu.ops.laplace import assemble_pressure_laplacian, apply_laplacian
from diffpiso_tpu.solvers import pallas_krylov as pk
from diffpiso_tpu.solvers import PressureSolver, solve_pressure_system

nz3, ny3, nx3 = 32, 64, 128
infl3 = StaggeredField(
    tuple(jnp.asarray(rng.rand(nz3, ny3, nx3) + 0.5, jnp.float32)
          for _ in range(3)),
    periodic=(True, True, True),
)
act3 = jnp.ones((nz3 + 2, ny3 + 2, nx3 + 2), jnp.float32)
lap3 = assemble_pressure_laplacian(infl3, act3, act3, (True, True, True), True)
rhs3 = rng.randn(nz3, ny3, nx3).astype(np.float32)
rhs3 -= rhs3.mean()
rhs3 = jnp.asarray(rhs3)
cfg3 = PressureSolver(max_iterations=300, deflate_mean=True,
                      preconditioner="fft_mm", adjoint_preconditioner="fft_mm")
assert pk.pcg3_eligible(rhs3.shape, rhs3.dtype)
x3, it3, warn3 = jax.jit(
    lambda r: solve_pressure_system(cfg3, lap3, r, None, 1e-5)
)(rhs3)
os.environ["DIFFPISO_FUSED_PCG3"] = "never"
x3r, it3r, warn3r = jax.jit(
    lambda r: solve_pressure_system(cfg3, lap3, r, None, 1e-5)
)(rhs3)
os.environ["DIFFPISO_FUSED_PCG3"] = "auto"
a3 = np.asarray(x3) - np.asarray(x3).mean()
b3 = np.asarray(x3r) - np.asarray(x3r).mean()
err3 = np.abs(a3 - b3).max()
print(f"pcg3: iters {int(it3)} vs {int(it3r)}, warn {bool(warn3)}, "
      f"delta {err3:.2e}", flush=True)
assert not bool(warn3) and err3 < 1e-4
assert abs(int(it3) - int(it3r)) <= 1
print("PCG3 LOWERING OK")

# plane-block Jacobi (k in-launch sweeps) — default-on path; validate the
# kernel lowers and converges on a diagonally dominant system
from diffpiso_tpu.solvers.pallas_krylov import fused_jacobi_sweep_3d

c3 = jnp.asarray(-8.0 + 0.3 * rng.randn(nz3, ny3, nx3), jnp.float32)
lo3 = tuple(jnp.asarray(0.4 * rng.randn(nz3, ny3, nx3), jnp.float32)
            for _ in range(3))
hi3 = tuple(jnp.asarray(0.4 * rng.randn(nz3, ny3, nx3), jnp.float32)
            for _ in range(3))
b3d = jnp.asarray(rng.randn(nz3, ny3, nx3), jnp.float32)
x3d = jnp.zeros_like(b3d)
sweep = jax.jit(lambda x: fused_jacobi_sweep_3d(
    (c3, lo3, hi3), b3d, x, jnp.float32(-1.0), False, k=4))
for _ in range(8):
    x3d, nrm = sweep(x3d)
# residual of the NEGATED system (sgn=-1): b - (-(S x))
q = c3 * x3d
for d in range(3):
    q = q + lo3[d] * jnp.roll(x3d, 1, axis=d) + hi3[d] * jnp.roll(x3d, -1, axis=d)
res3d = float(jnp.max(jnp.abs(b3d + q)))
print(f"jacobi plane-block: resid after 8 launches {res3d:.2e}", flush=True)
assert res3d < 1e-4
print("JACOBI3D LOWERING OK")


# -- masked (bounded) fused assembly lowering check -------------------------------
os.environ["DIFFPISO_FUSED_ADVM"] = "auto"
from diffpiso_tpu.core import lid_driven_cavity_masks
from diffpiso_tpu.fields.domain import Domain
from diffpiso_tpu.fields.box import Box
from diffpiso_tpu.fields.material import OPEN

# the monolithic masked kernel holds ~11 full planes per component: at the
# 512^2 cavity that is ~11.7 MB of operands+outputs and the Mosaic compile
# helper dies (measured 2026-08-18, forced-eligible probe; no diagnostic —
# helper subprocess exit 1). The eligibility formula caps it at ~nm<=320;
# validate at the largest eligible size and pin the 512 gate-off.
nm = 320
dmm, dvm, activem, accessiblem, no_slipm = lid_driven_cavity_masks(nm)
domainm = Domain((nm + 1, nm), Box.from_size((1.0 + 1.0 / nm, 1.0)),
                 boundaries=OPEN)
velm = StaggeredField(
    (jnp.asarray(rng.randn(nm + 2, nm), jnp.float32),
     jnp.asarray(rng.randn(nm + 1, nm + 1), jnp.float32)),
    periodic=(False, False),
)
with ps.no_pallas():
    wantm = stencil_mod.assemble_advection_stencil(
        velm, domainm.dx, domainm.velocity_pad_modes(), 1e-3, 2.0,
        dmm, activem, accessiblem, no_slipm, (False, False),
    )
assert pallas_advassembly.advassembly_masked_eligible(
    velm, activem, 1e-3, (False, False)
)
vel512 = StaggeredField(
    (jnp.zeros((514, 512), jnp.float32), jnp.zeros((513, 513), jnp.float32)),
    periodic=(False, False),
)
assert not pallas_advassembly.advassembly_masked_eligible(
    vel512, jnp.ones((515, 514), jnp.float32), 1e-3, (False, False)
), "512 cavity must stay on the jnp assembly path (Mosaic compile fails)"
gotm = jax.jit(
    lambda v: stencil_mod.assemble_advection_stencil(
        v, domainm.dx, domainm.velocity_pad_modes(), 1e-3, 2.0,
        dmm, activem, accessiblem, no_slipm, (False, False),
    )
)(velm)
for c in range(2):
    np.testing.assert_allclose(np.asarray(gotm.center[c]),
                               np.asarray(wantm.center[c]),
                               rtol=1e-5, atol=1e-5)
    for d in range(2):
        np.testing.assert_allclose(np.asarray(gotm.lo[c][d]),
                                   np.asarray(wantm.lo[c][d]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gotm.hi[c][d]),
                                   np.asarray(wantm.hi[c][d]),
                                   rtol=1e-5, atol=1e-5)
print("MASKED ASSEMBLY LOWERING OK")


# -- mixed/bounded fused FV lowering check ----------------------------------------
os.environ["DIFFPISO_FUSED_FVM"] = "auto"
from diffpiso_tpu.ops import fv as fv_mod, pallas_fv

nyf, nxf = 513, 512
pf = jnp.asarray(rng.randn(nyf, nxf), jnp.float32)
accf = jnp.ones((nyf + 2, nxf + 2), jnp.float32)
modesf = (("replicate", "replicate"), ("replicate", "replicate"))
with ps.no_pallas():
    wantg = fv_mod.fv_gradient(pf, (1.0, 1.0), modesf, accf)
gotg = jax.jit(lambda p_: fv_mod.fv_gradient(p_, (1.0, 1.0), modesf, accf))(pf)
for a, b in zip(gotg.components, wantg.components):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
velf = StaggeredField(
    (jnp.asarray(rng.randn(nyf + 1, nxf), jnp.float32),
     jnp.asarray(rng.randn(nyf, nxf + 1), jnp.float32)),
    periodic=(False, False),
)
with ps.no_pallas():
    wantd = fv_mod.fv_divergence(velf, (1.0, 1.0))
gotd = jax.jit(lambda v: fv_mod.fv_divergence(v, (1.0, 1.0)))(velf)
np.testing.assert_allclose(np.asarray(gotd), np.asarray(wantd), atol=1e-5)
print("BOUNDED FV LOWERING OK")
