"""Compile-and-run check for the z-block rank-3 FV kernels at the 256^3
and 128^3 classes (both sides of the bz selection), plus the unmasked
Laplacian-assembly fast path inside a jit. Run on the TPU before the A/B
(runs/ab_asm_fvzb.py) — eligibility formulas are the contract."""
import os
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/diffpiso_jax_cache"),
)
from diffpiso_tpu.fields.grid import StaggeredField
from diffpiso_tpu.ops import fv, pallas_fv
from diffpiso_tpu.ops.laplace import assemble_pressure_laplacian

for n in (128, 256):
    plane = n * n * 4
    bz = pallas_fv._fv_bz(n, plane)
    print(f"n={n}: bz={bz}", flush=True)
    rng = np.random.RandomState(0)
    comps = tuple(jnp.asarray(rng.randn(n, n, n), jnp.float32)
                  for _ in range(3))
    field = StaggeredField(comps, periodic=(True, True, True))
    dx = (1.0 / n,) * 3
    modes = tuple(("circular", "circular") for _ in range(3))

    @jax.jit
    def roundtrip(f):
        d = fv.fv_divergence(f, dx)
        g = fv.fv_gradient(d, dx, modes)
        return fv.fv_divergence(g, dx)

    out = roundtrip(field)
    assert bool(jnp.all(jnp.isfinite(out))), n
    # XLA oracle (pallas gated off by env)
    os.environ["DIFFPISO_FUSED_FV"] = "never"

    @jax.jit
    def roundtrip_ref(f):
        d = fv.fv_divergence(f, dx)
        g = fv.fv_gradient(d, dx, modes)
        return fv.fv_divergence(g, dx)

    ref = roundtrip_ref(field)
    del os.environ["DIFFPISO_FUSED_FV"]
    err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-30))
    print(f"n={n}: fv roundtrip rel err {err:.2e}", flush=True)
    assert err < 1e-5, (n, err)

    # unmasked-assembly fast path vs masked, on device
    ones = jnp.ones((n + 2,) * 3, jnp.float32)
    st_fast = jax.jit(
        lambda f: assemble_pressure_laplacian(
            f, ones, ones, (True,) * 3, True)
    )(field)
    os.environ["DIFFPISO_UNMASKED_ASM"] = "never"
    st_slow = jax.jit(
        lambda f: assemble_pressure_laplacian(
            f, ones, ones, (True,) * 3, True)
    )(field)
    del os.environ["DIFFPISO_UNMASKED_ASM"]
    for a, b in zip((st_fast.center,) + st_fast.lo + st_fast.hi,
                    (st_slow.center,) + st_slow.lo + st_slow.hi):
        d = float(jnp.max(jnp.abs(a - b)))
        assert d == 0.0, (n, d)
    print(f"n={n}: unmasked assembly exact match", flush=True)
print("ALL OK")
