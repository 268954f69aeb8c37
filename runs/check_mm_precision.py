"""r5: pin down WHY the in-kernel bf16x3 HIGH preconditioner inflates PCG
iterations ~3x for the dct family while the XLA path at nominally the
same Precision.HIGH does not (runs/ab_mm_dct.log).

Measures the relative error of one spectral-preconditioner apply
z = M^-1 r against an f64 numpy oracle, for:
  xla_high     — the production XLA path (set_precision 'high')
  xla_highest  — XLA at HIGHEST
  kern_bf16x3  — fused_pcg_mm_update's in-kernel 3-pass HIGH branch
  kern_highest — the kernel at Mosaic HIGHEST coercion
at the DNS channel basis (dct2 512 x dct4 2048) and the fourier 1024
control (the LARGE-tier family that wins). Hypothesis: the terminal's
--xla_allow_excess_precision=true lets XLA upgrade HIGH contractions, so
the XLA path's *effective* precision is above 3-pass bf16 — a quality the
Mosaic dot API cannot express between DEFAULT-x3 and HIGHEST.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/diffpiso_jax_cache"),
)
import jax.numpy as jnp

from diffpiso_tpu.solvers.fourier import (
    MatmulSpectralSolver,
    _BASIS,
    _eigs,
    _safe_symbol,
)
from diffpiso_tpu.solvers import pallas_krylov as pk
from diffpiso_tpu.solvers.pallas_krylov import fused_pcg_mm_update

assert jax.default_backend() == "tpu", jax.default_backend()

# standalone-probe ceilings: the production _auto_compiler_params budget
# is sized for the bf16x3 arm inside the solve loop; the isolated
# HIGHEST arm at 1024^2 needs ~61 MiB of scoped stack
from jax.experimental.pallas import tpu as pltpu

pk._auto_compiler_params = lambda *a, **k: pltpu.CompilerParams(
    vmem_limit_bytes=126 * 1024 * 1024)


def apply_oracle(solver, weights, r64):
    """f64 numpy: z = V0^T ((V0 r V1^T)/S) V1 with the solver's convention
    (mirrors MatmulSpectralSolver.solve / _mm_solve_xla)."""
    v0 = _BASIS[solver.kinds[0]](solver.shape[0]).astype(np.float64)
    v1 = _BASIS[solver.kinds[1]](solver.shape[1]).astype(np.float64)
    e0 = _eigs(solver.shape[0], solver.kinds[0]).astype(np.float64)
    e1 = _eigs(solver.shape[1], solver.kinds[1]).astype(np.float64)
    sym = (weights[0] * e0[:, None] + weights[1] * e1[None, :])
    sym_safe = np.where(np.abs(sym) < 1e-12, np.inf, sym)
    h = v0 @ r64  # (ny, nx) contracted over rows: matches kernel dims ((1,),(0,)) with contract_a
    h = h @ v1.T
    h = h / sym_safe
    h = v0.T @ h
    z = h @ v1
    return z


def run_case(name, shape, kinds, wscale=(1.0, 1.0), seed=0):
    rng = np.random.RandomState(seed)
    solver = MatmulSpectralSolver(kinds=kinds, shape=shape)
    weights = (np.float32(wscale[0]), np.float32(wscale[1]))
    # a smooth-ish residual (sum of long-wave modes + noise floor), the
    # regime where relative cancellation error matters
    y, x = np.meshgrid(np.arange(shape[0]), np.arange(shape[1]),
                       indexing="ij")
    r = (np.sin(2 * np.pi * 3 * y / shape[0]) *
         np.cos(2 * np.pi * 5 * x / shape[1])
         + 0.01 * rng.randn(*shape)).astype(np.float32)
    r -= r.mean()
    r32 = jnp.asarray(r)
    z64 = apply_oracle(solver, (float(weights[0]), float(weights[1])),
                       r.astype(np.float64))
    scale = np.max(np.abs(z64)) or 1.0

    outs = {}
    from diffpiso_tpu.solvers.fourier import _mm_solve_xla

    for label, prec in (("xla_high", "high"), ("xla_highest", "highest")):
        sp = MatmulSpectralSolver(kinds=kinds, shape=shape, precision=prec)
        z = jax.jit(lambda rr, s=sp: _mm_solve_xla(
            s, tuple(float(w) for w in weights), rr))(r32)
        outs[label] = np.asarray(jax.block_until_ready(z), np.float64)

    v0m, v1m = solver._mats(jnp.float32)
    sym = _safe_symbol(solver, tuple(jnp.asarray(w) for w in weights),
                       jnp.float32)
    zeros = jnp.zeros_like(r32)
    for label, prec in (("kern_bf16x3", jax.lax.Precision.HIGH),
                        ("kern_highest", jax.lax.Precision.HIGHEST)):
        po, rz = jax.jit(
            lambda v0, v1, s, rr, pp, pr=prec: fused_pcg_mm_update(
                v0, v1, s, 1.0, rr, pp, pr))(v0m, v1m, sym, r32, zeros)
        outs[label] = np.asarray(jax.block_until_ready(po), np.float64)

    print(f"[prec] {name} {shape} {kinds}:")
    for label, z in outs.items():
        err = np.max(np.abs(z - z64)) / scale
        print(f"[prec]   {label:<13} rel err vs f64: {err:.3e}")
    return outs, z64


run_case("fourier_1024", (1024, 1024), ("fourier", "fourier"),
         wscale=(1.0, 1.0))
run_case("dns_channel", (512, 2048), ("dct2", "dct4"),
         wscale=(1.0, 16.0))  # dx aspect: x cells 4x finer -> ~16x weight
print("[prec] done")
