"""Functional validation of the per-shard kernel solvers
(parallel/shard_kernels.py) on the virtual 8-device CPU mesh, interpret
mode. Run:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python runs/check_shard_kernels.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from diffpiso_tpu import StaggeredField
from diffpiso_tpu.ops import apply_laplacian, assemble_pressure_laplacian
from diffpiso_tpu.ops.stencil import AdvectionStencil, apply_stencil, apply_stencil_transpose
from diffpiso_tpu.parallel import shard_kernels as sk
from diffpiso_tpu.solvers import bicgstab, pcg

sk._INTERPRET = True
sk._roll = jnp.roll

mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("y", "x"))
ctx = sk.ShardedSolveCtx(mesh, ("y", "x"))

# -- momentum ------------------------------------------------------------------------
rng = np.random.RandomState(11)
ny, nx = 16, 32


def planes(scale, shape):
    return jnp.asarray(scale * rng.randn(*shape), jnp.float32)


comps = []
shapes = [(ny + 1, nx), (ny, nx + 1)]  # staggered +1 faces: padding path
# production-like dominance (CFL-bound coupling ~0.15 of the diagonal):
# converges through the per-shard trips, exercising the exit-by-convergence
# (exact reported norm) path; the stall/fallback path is asserted below
for sh in shapes:
    center = jnp.asarray(-4.0 + 0.3 * rng.randn(*sh), jnp.float32)
    lo = [np.array(planes(0.15, sh)) for _ in range(2)]
    hi = [np.array(planes(0.15, sh)) for _ in range(2)]
    # non-periodic axes carry ZERO wrap couplings (the real assembly's
    # invariant that makes both the single-chip roll trick and the
    # sharded zero-padding exact)
    for d in range(2):
        sl_lo = [slice(None)] * 2
        sl_lo[d] = 0
        lo[d][tuple(sl_lo)] = 0.0
        sl_hi = [slice(None)] * 2
        sl_hi[d] = -1
        hi[d][tuple(sl_hi)] = 0.0
    comps.append((center, tuple(jnp.asarray(l) for l in lo),
                  tuple(jnp.asarray(h) for h in hi)))
st = AdvectionStencil(
    center=tuple(c[0] for c in comps),
    lo=tuple(c[1] for c in comps),
    hi=tuple(c[2] for c in comps),
    diag_A=tuple(c[0] for c in comps),
)
b = StaggeredField(tuple(planes(1.0, sh) for sh in shapes),
                   periodic=(False, False))
diag = StaggeredField(tuple(-c for c in st.center), periodic=(False, False))

for transpose in (False, True):
    apply_fn = apply_stencil_transpose if transpose else apply_stencil
    ref = bicgstab(lambda v: apply_fn(st, v, negate=True), b, None,
                   tol=1e-6, max_iter=300, diag=diag)
    assert not bool(ref.warn), "reference solve failed"

    st_cs = [(st.center[i], st.lo[i], st.hi[i]) for i in range(2)]
    x0 = tuple(jnp.zeros_like(c) for c in b.components)

    @jax.jit
    def run():
        return sk.sharded_momentum_solve(
            ctx, st_cs, tuple(b.components), x0, -1.0, transpose, 1e-6)

    xs, n = run()
    for a, r in zip(xs, ref.x.components):
        scale = float(jnp.max(jnp.abs(r))) or 1.0
        d = float(jnp.max(jnp.abs(a - r))) / scale
        assert d < 1e-4, (transpose, d)
    # true residual check
    xf = StaggeredField(xs, periodic=(False, False))
    rr = jax.tree_util.tree_map(
        lambda bb, aa: bb - aa, b, apply_fn(st, xf, negate=True))
    rn = max(float(jnp.max(jnp.abs(c))) for c in rr.components)
    assert rn < 1e-4, rn
    # exit-by-convergence: the reported norm IS the exact residual of the
    # returned iterate (measure-only converged trip)
    assert float(n) < 1e-6 and abs(float(n) - rn) < 1e-6, (float(n), rn)
    print(f"momentum transpose={transpose}: OK (resid {rn:.2e}, "
          f"reported {float(n):.2e})")

# stall path: weakly-dominant couplings (ratio ~0.4) exhaust max_trips at a
# tight tol; the reported norm must be CONSERVATIVE (>= the true residual)
# so solvers/base.py routes the iterate to the BiCGSTAB fallback
rng_s = np.random.RandomState(5)
sh = (ny, nx)
center_s = jnp.asarray(-4.0 + 0.3 * rng_s.randn(*sh), jnp.float32)
los = [np.asarray(0.4 * rng_s.randn(*sh), np.float32) for _ in range(2)]
his = [np.asarray(0.4 * rng_s.randn(*sh), np.float32) for _ in range(2)]
for d in range(2):
    sl = [slice(None)] * 2
    sl[d] = 0
    los[d][tuple(sl)] = 0.0
    sl[d] = -1
    his[d][tuple(sl)] = 0.0
b_s = jnp.asarray(rng_s.randn(*sh), jnp.float32)
xs_s, n_s = jax.jit(
    lambda: sk.sharded_momentum_solve(
        ctx, [(center_s, tuple(map(jnp.asarray, los)),
               tuple(map(jnp.asarray, his)))],
        (b_s,), (jnp.zeros_like(b_s),), -1.0, False, 1e-7)
)()
st_s = AdvectionStencil(center=(center_s,),
                        lo=(tuple(map(jnp.asarray, los)),),
                        hi=(tuple(map(jnp.asarray, his)),),
                        diag_A=(center_s,))
r_s = (StaggeredField((b_s,), periodic=(False, False))
       .components[0]
       - apply_stencil(st_s, StaggeredField(
           (xs_s[0],), periodic=(False, False)), negate=True).components[0])
rn_s = float(jnp.max(jnp.abs(r_s)))
assert float(n_s) >= rn_s * 0.99, (float(n_s), rn_s)
print(f"momentum stall path: OK (reported {float(n_s):.2e} >= true "
      f"{rn_s:.2e}, fallback-bound)")

# -- pressure ------------------------------------------------------------------------
from diffpiso_tpu.solvers.fourier import MatmulSpectralSolver

ny, nx = 16, 32
infl = StaggeredField((
    jnp.asarray(rng.rand(ny + 1, nx) + 0.5, jnp.float32),
    jnp.asarray(rng.rand(ny, nx + 1) + 0.5, jnp.float32),
))
act = np.zeros((ny + 2, nx + 2), np.float32)
act[1:-1, 1:-1] = 1
lap = assemble_pressure_laplacian(
    infl, jnp.asarray(act), jnp.asarray(act), (False, False), True)
rhs = rng.randn(ny, nx).astype(np.float32)
rhs -= rhs.mean()
rhs = jnp.asarray(rhs)

mss = MatmulSpectralSolver(kinds=("dct2", "dct2"), shape=(ny, nx))
weights = tuple(jnp.mean(jnp.abs(l)) for l in lap.lo)
ref = pcg(lambda p: apply_laplacian(lap, p), rhs, None,
          precond=lambda r: mss.precondition(weights, r),
          tol=1e-6, max_iter=200, deflate_mean=True,
          precond_zero_mean=True)
assert not bool(ref.warn)

for warm in (False, True):
    x0 = ref.x if warm else None

    @jax.jit
    def runp(x0=x0):
        return sk.sharded_pressure_pcg(
            ctx, lap, rhs, x0, 1e-5, 200, True, mm_solver=mss,
            weights=weights)

    x, k, rn = runp()
    res = apply_laplacian(lap, x) - rhs
    res = res - jnp.mean(res)
    tn = float(jnp.max(jnp.abs(res)))
    assert tn < 1e-4, tn
    if warm:
        # the f32 recomputed residual of a converged guess sits near the
        # 1e-5 floor: at most one polish iteration
        assert int(k) <= 1, int(k)
    print(f"pressure warm={warm}: OK ({int(k)} iters, true resid {tn:.2e}, "
          f"reported {float(rn):.2e}, ref iters {int(ref.iterations)})")

# exact early exit: a zero rhs with zero guess must skip the loop entirely
x, k, rn = jax.jit(
    lambda: sk.sharded_pressure_pcg(
        ctx, lap, jnp.zeros_like(rhs), None, 1e-5, 200, True,
        mm_solver=mss, weights=weights)
)()
assert int(k) == 0 and float(rn) == 0.0, (int(k), float(rn))
print("pressure early-exit: OK")

print("ALL CHECKS PASSED")
