"""TPU lowering + parity probe for fused_jacobi1_solve_3d at the 128^3
eligibility boundary (the ref-resident rewrite after the value-hoisting
variant spilled 128 MiB of register stack and OOM'd, runs/ab_jac13d.log).

Direct kernel invocation at 128^3 (the largest eligible class: 15 volumes
= 120 MiB) on a diagonally dominant 7-point system, checked against the
numpy Jacobi iteration, both transposes.
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

from diffpiso_tpu.solvers import pallas_krylov


def system(n, seed=0):
    rng = np.random.RandomState(seed)
    off = [rng.rand(n, n, n).astype(np.float32) * 0.1 for _ in range(6)]
    c = (1.0 + rng.rand(n, n, n) * 0.5).astype(np.float32)
    b = rng.randn(n, n, n).astype(np.float32)
    return c, off, b


def np_solve(c, off, b, sgn, transpose, tol, max_sweeps):
    lz, hz, ly, hy, lx, hx = off

    def mv(p):
        if not transpose:
            q = c * p
            q += lz * np.roll(p, 1, 0) + hz * np.roll(p, -1, 0)
            q += ly * np.roll(p, 1, 1) + hy * np.roll(p, -1, 1)
            q += lx * np.roll(p, 1, 2) + hx * np.roll(p, -1, 2)
        else:
            q = c * p
            q += np.roll(lz * p, -1, 0) + np.roll(hz * p, 1, 0)
            q += np.roll(ly * p, -1, 1) + np.roll(hy * p, 1, 1)
            q += np.roll(lx * p, -1, 2) + np.roll(hx * p, 1, 2)
        return sgn * q

    x = np.zeros_like(b)
    r = b - mv(x)
    for _ in range(max_sweeps):
        if np.max(np.abs(r)) <= tol:
            break
        d = r / (sgn * c)
        x = x + d
        r = r - mv(d)
    return x, np.max(np.abs(b - mv(x)))


def check(n, transpose, sgn=-1.0, tol=1e-5):
    c, off, b = system(n)
    assert pallas_krylov.jac13d_eligible((n, n, n), np.float32), (
        f"{n}^3 must be eligible")
    st_c = (
        jnp.asarray(c),
        tuple(jnp.asarray(o) for o in off[0::2]),
        tuple(jnp.asarray(o) for o in off[1::2]),
    )
    xo, res = jax.jit(
        lambda: pallas_krylov.fused_jacobi1_solve_3d(
            st_c, jnp.asarray(b), jnp.zeros_like(jnp.asarray(b)),
            sgn, transpose, tol, 64)
    )()
    x_ref, res_ref = np_solve(c, off, b, sgn, transpose, tol, 64)
    d = float(np.max(np.abs(np.asarray(xo) - x_ref)))
    print(f"[jac13d] n={n} transpose={transpose}: res {float(res):.2e} "
          f"(np {res_ref:.2e}) max|dx| {d:.2e}", flush=True)
    assert float(res) <= 2 * tol
    assert d <= 1e-4 * max(1.0, float(np.max(np.abs(x_ref))))


if __name__ == "__main__":
    assert not pallas_krylov.jac13d_eligible((160, 160, 160), np.float32)
    for tr in (False, True):
        check(128, tr)
    print("[jac13d] lowering + parity OK", flush=True)
