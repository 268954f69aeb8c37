"""Lowering check for the 256^3 z-block momentum kernel after the bz=8
shrink (the bz=16 cut OOM'd the Mosaic scoped-vmem stack at BOTH 64 and
96 MiB ceilings — runs/ab_zblock.log; the reservation partially tracks
whatever ceiling it is given, so the fix is smaller blocks under a tight
ceiling, not a bigger ceiling). Compiles the kernel standalone at the
exact 256^3 shapes (fwd + transpose) and runs one launch; also validates
the eligibility formula's boundary: _zblock_size must return 8 at 256^3.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/diffpiso_jax_cache"),
)
import jax.numpy as jnp
import numpy as np

from diffpiso_tpu.solvers.pallas_krylov import (
    _zblock_size,
    fused_jacobi_zblock_3d,
    zblock_eligible,
)

n = 256
shape = (n, n, n)
bz = _zblock_size(shape, jnp.float32)
print(f"_zblock_size({n}^3) = {bz}", file=sys.stderr)
assert bz == 8, bz
assert zblock_eligible(shape, jnp.float32) == 8

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 9)
mk = lambda k, s=0.05: s * jax.random.normal(k, shape, jnp.float32)
c = 4.0 + jnp.abs(mk(ks[0], 1.0))
lo = (mk(ks[1]), mk(ks[2]), mk(ks[3]))
hi = (mk(ks[4]), mk(ks[5]), mk(ks[6]))
b = mk(ks[7], 1.0)
x0 = jnp.zeros(shape, jnp.float32)

for transpose in (False, True):
    fn = jax.jit(
        lambda c, lo, hi, b, x: fused_jacobi_zblock_3d(
            (c, lo, hi), b, x, 1.0, transpose, 1e-6, 4, bz
        )
    )
    xo, n0 = fn(c, lo, hi, b, x0)
    jax.block_until_ready(xo)
    # entry residual of x=0 is max|b|
    print(
        f"transpose={transpose}: OK  entry_norm={float(n0):.4f} "
        f"(max|b|={float(jnp.max(jnp.abs(b))):.4f})  "
        f"x finite={bool(jnp.all(jnp.isfinite(xo)))}",
        file=sys.stderr,
    )
    assert np.isclose(float(n0), float(jnp.max(jnp.abs(b))), rtol=1e-5)
    assert bool(jnp.all(jnp.isfinite(xo)))
print("zblock 256^3 bz=8 lowering: OK")
