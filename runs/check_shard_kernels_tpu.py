"""TPU lowering proof for the per-shard kernel solvers
(parallel/shard_kernels.py): on the single real chip, a (1,1)-extent mesh
with both axes named compiles the SAME shard_map + pallas_call + ppermute
program a multi-chip mesh would (identity permutes, full plane per shard).
Validates Mosaic lowering of the kernel bodies inside shard_map and the
full piso_step dispatch, plus numerical parity vs the unsharded step.

Run (TPU):  python runs/check_shard_kernels_tpu.py
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
from jax.sharding import Mesh

from diffpiso_tpu import StaggeredField
from diffpiso_tpu.core import piso_step
from diffpiso_tpu.core.setups import decaying_turbulence_setup
from diffpiso_tpu.ops import apply_laplacian, assemble_pressure_laplacian
from diffpiso_tpu.parallel import shard_kernels as sk
from diffpiso_tpu.solvers.fourier import MatmulSpectralSolver

assert jax.default_backend() == "tpu", jax.default_backend()
mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("y", "x"))
ctx = sk.ShardedSolveCtx(mesh, ("y", "x"))

# -- bare pressure PCG lowering -------------------------------------------------------
rng = np.random.RandomState(3)
ny, nx = 256, 256
infl = StaggeredField(
    (
        jnp.asarray(rng.rand(ny + 1, nx) + 0.5, jnp.float32),
        jnp.asarray(rng.rand(ny, nx + 1) + 0.5, jnp.float32),
    )
)
act = np.zeros((ny + 2, nx + 2), np.float32)
act[1:-1, 1:-1] = 1
lap = assemble_pressure_laplacian(
    infl, jnp.asarray(act), jnp.asarray(act), (False, False), True
)
# rhs must be a Laplacian image so |x| ~ O(1): a raw random rhs at 256^2
# yields |x| ~ 1/lambda_min ~ 6.6e3, putting an ABSOLUTE 1e-4 residual
# below the f32 matvec floor for ANY solver (production solves are
# O(1)-scaled)
y = jnp.asarray(rng.randn(ny, nx).astype(np.float32))
rhs = apply_laplacian(lap, y)
rhs = rhs - jnp.mean(rhs)
mss = MatmulSpectralSolver(kinds=("dct2", "dct2"), shape=(ny, nx))
weights = tuple(jnp.mean(jnp.abs(l)) for l in lap.lo)

x, k, rn = jax.jit(
    lambda: sk.sharded_pressure_pcg(
        ctx, lap, rhs, None, 1e-5, 200, True, mm_solver=mss, weights=weights
    )
)()
res = apply_laplacian(lap, x) - rhs
res = res - jnp.mean(res)
tn = float(jnp.max(jnp.abs(res)))
assert tn < 1e-4, tn
print(f"pressure pcg lowering: OK ({int(k)} iters, true resid {tn:.2e})")

# -- full piso_step under sharded_solvers ---------------------------------------------
n = 256
domain, sim = decaying_turbulence_setup(
    (n, n), viscosity=0.01, max_iterations=(50, 300)
)
vel = StaggeredField(
    (
        jnp.asarray(0.3 * rng.randn(n, n), jnp.float32),
        jnp.asarray(0.3 * rng.randn(n, n), jnp.float32),
    ),
    periodic=(True, True),
)
p = domain.centered_grid(0.0)


@jax.jit
def roll_ref(vel, p):
    def body(carry, _):
        vel, p = carry
        out = piso_step(vel, p, 0.05, domain, sim,
                        advection_tol=1e-6, pressure_tol=1e-6)
        return (out.velocity, out.pressure), out.warn

    (vel, p), warns = jax.lax.scan(body, (vel, p), None, length=2)
    return vel, p, warns


@jax.jit
def roll_sharded(vel, p):
    with sk.sharded_solvers(mesh, ("y", "x")):
        def body(carry, _):
            vel, p = carry
            out = piso_step(vel, p, 0.05, domain, sim,
                            advection_tol=1e-6, pressure_tol=1e-6)
            return (out.velocity, out.pressure), out.warn

        (vel, p), warns = jax.lax.scan(body, (vel, p), None, length=2)
        return vel, p, warns


vel_ref, p_ref, warns_ref = roll_ref(vel, p)
assert not bool(jnp.any(warns_ref))
vel_s, p_s, warns_s = roll_sharded(vel, p)
assert not bool(jnp.any(warns_s))
d = 0.0
for a, b in zip(vel_s.components, vel_ref.components):
    scale = float(jnp.max(jnp.abs(b))) or 1.0
    d = max(d, float(jnp.max(jnp.abs(a - b))) / scale)
assert d < 1e-3, d
print(f"full-step fwd lowering + parity: OK (rel delta {d:.2e})")


# -- gradient (IFT adjoints re-dispatch per-shard) ------------------------------------
def loss_of(vel, p):
    def body(carry, _):
        vel, p = carry
        out = piso_step(vel, p, 0.05, domain, sim,
                        advection_tol=1e-7, pressure_tol=1e-8)
        return (out.velocity, out.pressure), None

    (vel, p), _ = jax.lax.scan(body, (vel, p), None, length=2)
    return sum(jnp.sum(c ** 2) for c in vel.components)


@jax.jit
def grad_ref(vel, p):
    return jax.grad(lambda v: loss_of(v, p))(vel)


@jax.jit
def grad_sharded(vel, p):
    with sk.sharded_solvers(mesh, ("y", "x")):
        return jax.grad(lambda v: loss_of(v, p))(vel)


g_ref = grad_ref(vel, p)
g_s = grad_sharded(vel, p)
dg = 0.0
for a, b in zip(g_s.components, g_ref.components):
    scale = float(jnp.max(jnp.abs(b))) or 1.0
    dg = max(dg, float(jnp.max(jnp.abs(a - b))) / scale)
assert dg < 5e-3, dg
print(f"gradient lowering + parity: OK (rel delta {dg:.2e})")

print("ALL TPU LOWERING CHECKS PASSED")
