"""TPU lowering probe: do the whole-solve Pallas kernels batch under
jax.vmap (pallas adds a leading grid dim; each program runs its own
while-loop)? The historical no_pallas() rationale for the batched
training path was 'vmap can't batch the SMEM scalar blocks' — this
checks whether that still holds for the r3 whole-solve kernels, which
would unlock fused kernels inside make_batched_train_step."""
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
from diffpiso_tpu.solvers import pallas_krylov as pk

rng = np.random.RandomState(0)
B, n = 4, 256


def mk(scale, shp=(B, n, n)):
    return jnp.asarray(scale * rng.randn(*shp), jnp.float32)


c = jnp.asarray(-8.0 + 0.2 * rng.randn(B, n, n), jnp.float32)
ly, hy, lx, hx = mk(0.3), mk(0.3), mk(0.3), mk(0.3)
b = mk(1.0)
x = jnp.zeros((B, n, n), jnp.float32)


def solve1(c, ly, hy, lx, hx, b, x):
    return pk.fused_jacobi1_solve(
        (c, (ly, hy), (lx, hx)), b, x, -1.0, False, 1e-6, 33)


xo, nrm = jax.jit(jax.vmap(solve1))(c, ly, hy, lx, hx, b, x)
xo.block_until_ready()
print("vmap jac1 OK", xo.shape, np.asarray(nrm))

# reference: per-sample loop (parity, not absolute tol — the reported
# norm is the RECOMPUTED true residual, which drifts ~1e-7 past the
# maintained-residual exit test on both paths identically)
for i in range(B):
    xr, nr = jax.jit(solve1)(c[i], ly[i], hy[i], lx[i], hx[i], b[i], x[i])
    err = float(jnp.max(jnp.abs(xr - xo[i])))
    assert err < 1e-5, (i, err)
    assert abs(float(nr) - float(nrm[i])) < 1e-6, (i, float(nr), float(nrm[i]))
print("vmap jac1 parity OK")


def solve2(c0, ly0, hy0, lx0, hx0, b0, x0, c1, ly1, hy1, lx1, hx1, b1, x1):
    return pk.fused_jacobi2_solve(
        [(c0, (ly0, hy0), (lx0, hx0)), (c1, (ly1, hy1), (lx1, hx1))],
        (b0, b1), (x0, x1), -1.0, False, 1e-6, 33)


c2 = jnp.asarray(-8.0 + 0.2 * rng.randn(B, n, n), jnp.float32)
ly2, hy2, lx2, hx2 = mk(0.3), mk(0.3), mk(0.3), mk(0.3)
b2 = mk(1.0)
xo0, xo1, nrm2 = jax.jit(jax.vmap(solve2))(
    c, ly, hy, lx, hx, b, x, c2, ly2, hy2, lx2, hx2, b2, x)
xo0.block_until_ready()
print("vmap jac2 OK", xo0.shape, np.asarray(nrm2))

# -- whole-solve pcg2 under vmap (batched rhs, shared Laplacian + bases) --
os.environ["DIFFPISO_FUSED_PCG2"] = "all"
from diffpiso_tpu import StaggeredField
from diffpiso_tpu.ops import assemble_pressure_laplacian
from diffpiso_tpu.solvers import PressureSolver, solve_pressure_system

npp = 256
infl = StaggeredField(
    (
        jnp.asarray(rng.rand(npp, npp) + 0.5, jnp.float32),
        jnp.asarray(rng.rand(npp, npp) + 0.5, jnp.float32),
    ),
    periodic=(True, True),
)
act = jnp.ones((npp + 2, npp + 2), jnp.float32)
lap = assemble_pressure_laplacian(infl, act, act, (True, True), True)
rhsb = jnp.asarray(rng.randn(B, npp, npp), jnp.float32)
rhsb = rhsb - jnp.mean(rhsb, axis=(1, 2), keepdims=True)
cfg = PressureSolver(
    max_iterations=300, deflate_mean=True,
    preconditioner="fft_mm", adjoint_preconditioner="fft_mm",
)
solve_p = lambda r: solve_pressure_system(cfg, lap, r, None, 1e-6)
xb, itb, warnb = jax.jit(jax.vmap(solve_p))(rhsb)
xb.block_until_ready()
print("vmap pcg2 OK", xb.shape, np.asarray(itb), np.asarray(warnb))
for i in range(B):
    xi, iti, warni = jax.jit(solve_p)(rhsb[i])
    a = np.asarray(xb[i]) - np.asarray(xb[i]).mean()
    bb = np.asarray(xi) - np.asarray(xi).mean()
    err = np.abs(a - bb).max() / max(np.abs(bb).max(), 1e-30)
    assert err < 5e-4, (i, err)
    assert int(itb[i]) == int(iti), (int(itb[i]), int(iti))
print("vmap pcg2 parity OK")
print("VMAP KERNELS OK")
