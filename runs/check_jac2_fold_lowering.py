"""r5: TPU lowering + parity proof for the batch-FOLDED whole-solve jac2
kernel at the batched-training shapes (mixing layer 64x256 components
(65,256)/(64,257), batch 8), both transpose arms.

Validates the Mosaic-side contract of the fold dispatch: rank-3 refs,
trailing-axes rolls, (B,1) two-stage reductions, per-sample masked while
body, (B,1) VMEM scalar out. Parity vs per-sample single-program solves
on the same chip.
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
from diffpiso_tpu.solvers import pallas_krylov as pk

B = 8
rng = np.random.RandomState(0)
for transpose in (False, True):
    for sh0, sh1 in (((65, 256), (64, 257)),):
        def mk(shp, s=0.3):
            return jnp.asarray(s * rng.randn(B, *shp), jnp.float32)

        c0 = jnp.asarray(-6.0 + 0.2 * rng.randn(B, *sh0), jnp.float32)
        c1 = jnp.asarray(-6.0 + 0.2 * rng.randn(B, *sh1), jnp.float32)
        args = (c0, mk(sh0), mk(sh0), mk(sh0), mk(sh0), mk(sh0, 1.0),
                jnp.zeros((B,) + sh0, jnp.float32),
                c1, mk(sh1), mk(sh1), mk(sh1), mk(sh1), mk(sh1, 1.0),
                jnp.zeros((B,) + sh1, jnp.float32))

        def solve2(a):
            (c0, ly0, hy0, lx0, hx0, b0, x0,
             c1, ly1, hy1, lx1, hx1, b1, x1) = a
            return pk.fused_jacobi2_solve(
                [(c0, (ly0, hy0), (lx0, hx0)),
                 (c1, (ly1, hy1), (lx1, hx1))],
                (b0, b1), (x0, x1), -1.0, transpose, 1e-6, 60)

        assert pk.jac2_fold_eligible(B, sh0, sh1, jnp.float32)
        xo0, xo1, nrm = jax.jit(jax.vmap(solve2))(args)
        jax.block_until_ready(nrm)
        ref = [solve2(jax.tree_util.tree_map(lambda x: x[i], args))
               for i in range(B)]
        e0 = max(float(jnp.max(jnp.abs(xo0[i] - ref[i][0]))) for i in range(B))
        e1 = max(float(jnp.max(jnp.abs(xo1[i] - ref[i][1]))) for i in range(B))
        # the returned norm is the TRUE exit residual, which (like the
        # solo kernel's) may sit slightly above tol from maintained-vs-
        # true drift — parity with the per-sample norms is the contract
        en = max(float(jnp.abs(nrm[i] - ref[i][2])) for i in range(B))
        nmax = float(jnp.max(nrm))
        print(f"[fold] transpose={transpose} shapes={sh0}/{sh1}: "
              f"max|dx0|={e0:.3e} max|dx1|={e1:.3e} max|dn|={en:.3e} "
              f"max n={nmax:.3e}")
        assert e0 < 1e-5 and e1 < 1e-5 and en < 1e-7 and nmax < 1e-4
# batched-sc variant (per-sample tolerances — the adjoint regime)
sh0, sh1 = (65, 256), (64, 257)
def mk(shp, s=0.3):
    return jnp.asarray(s * rng.randn(B, *shp), jnp.float32)

c0 = jnp.asarray(-6.0 + 0.2 * rng.randn(B, *sh0), jnp.float32)
c1 = jnp.asarray(-6.0 + 0.2 * rng.randn(B, *sh1), jnp.float32)
args = (c0, mk(sh0), mk(sh0), mk(sh0), mk(sh0), mk(sh0, 1.0),
        jnp.zeros((B,) + sh0, jnp.float32),
        c1, mk(sh1), mk(sh1), mk(sh1), mk(sh1), mk(sh1, 1.0),
        jnp.zeros((B,) + sh1, jnp.float32))
tols = jnp.asarray(np.geomspace(1e-3, 1e-7, B), jnp.float32)

def solve2t(a, tol):
    (c0, ly0, hy0, lx0, hx0, b0, x0,
     c1, ly1, hy1, lx1, hx1, b1, x1) = a
    return pk.fused_jacobi2_solve(
        [(c0, (ly0, hy0), (lx0, hx0)), (c1, (ly1, hy1), (lx1, hx1))],
        (b0, b1), (x0, x1), -1.0, True, tol, 80)

xo0, xo1, nrm = jax.jit(jax.vmap(solve2t))(args, tols)
jax.block_until_ready(nrm)
ref = [solve2t(jax.tree_util.tree_map(lambda x: x[i], args), tols[i])
       for i in range(B)]
e0 = max(float(jnp.max(jnp.abs(xo0[i] - ref[i][0]))) for i in range(B))
en = max(float(jnp.abs(nrm[i] - ref[i][2])) for i in range(B))
print(f"[fold] batched-sc (per-sample tol, adjoint regime): "
      f"max|dx0|={e0:.3e} max|dn|={en:.3e}")
assert e0 < 1e-5 and en < 1e-6
print("[fold] TPU lowering + parity OK")
