"""r5: isolate WHICH fused piece inflates dns pressure iterations 3x under
DIFFPISO_FUSED_KRYLOV_LARGE=all (runs/ab_mm_dct.log: fwd iters
[1.02,0.43] -> [2.97,0.96]).

The precision probe (runs/check_mm_precision.log) already falsified the
r5 'bf16x3 precision' diagnosis: the in-kernel bf16x3 apply is 4x MORE
accurate than the XLA-HIGH path at the very dct2x dct4 basis (1.26e-5 vs
4.85e-5 rel-to-f64). So the inflation must come from the other phase
pieces or a loop-structure difference. Arms (dns 512x2048 fwd, real
workload, in-process sequential — iteration counts are deterministic,
throughput is secondary):

  never        — XLA loop (baseline iters)
  all          — fused residual + apply + mm-update (the measured loser)
  mm-only      — fused mm-update; residual/apply monkeypatched to exact
                 XLA equivalents (same signatures)
  phases-only  — fused residual/apply; mm-update monkeypatched to the
                 XLA HIGH contraction chain
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

import bench
from diffpiso_tpu.ops.laplace import apply_laplacian
from diffpiso_tpu.solvers import pallas_krylov as pk

orig = {k: getattr(pk, k) for k in
        ("fused_residual", "fused_pcg_apply", "fused_pcg_mm_update")}


def xla_residual(stencil, b, x, deflate):
    r = b - apply_laplacian(stencil, x)
    if deflate:
        r = r - jnp.mean(r)
    return r, jnp.max(jnp.abs(r))


def xla_pcg_apply(stencil, rz, x, r, p, deflate):
    q = apply_laplacian(stencil, p)
    pq = jnp.sum(p * q)
    eps = jnp.asarray(1e-30, pq.dtype)
    alpha = jnp.where(jnp.abs(pq) > eps, rz / pq, 0.0)
    xn = x + alpha * p
    rn = r - alpha * q
    if deflate:
        rn = rn - jnp.mean(rn)
    return xn, rn, jnp.max(jnp.abs(rn)), pq


def xla_mm_update(v0, v1, symbol, rz_old, r, p, precision):
    d = lambda a, b, dims: jax.lax.dot_general(
        a, b, (dims, ((), ())), precision=precision)
    h = d(v0, r, ((1,), (0,)))
    h = d(h, v1, ((1,), (1,)))
    h = h / symbol
    h = d(v0, h, ((0,), (0,)))
    z = d(h, v1, ((1,), (0,)))
    rz_new = jnp.sum(r * z)
    eps = jnp.asarray(1e-30, rz_new.dtype)
    beta = jnp.where(jnp.abs(jnp.asarray(rz_old, rz_new.dtype)) > eps,
                     rz_new / jnp.asarray(rz_old, rz_new.dtype), 0.0)
    return z + beta * p, rz_new


ARMS = [
    ("never", "never", {}),
    ("all", "all", {}),
    ("mm-only", "all", {"fused_residual": xla_residual,
                        "fused_pcg_apply": xla_pcg_apply}),
    ("phases-only", "all", {"fused_pcg_mm_update": xla_mm_update}),
]

results = {}
for name, mode, patches in ARMS:
    os.environ["DIFFPISO_FUSED_KRYLOV_LARGE"] = mode
    for k, v in patches.items():
        setattr(pk, k, v)
    try:
        args = bench.make_parser().parse_args([])
        args.fwd_only = True
        out = bench.workload_dns(args, (512, 2048))
    finally:
        for k in patches:
            setattr(pk, k, orig[k])
    results[name] = (out["fwd_steps_per_sec"],
                     out["fwd_pressure_iters_per_step"])
    print(f"[diag] {name}: fwd {out['fwd_steps_per_sec']:.1f} iters "
          f"{out['fwd_pressure_iters_per_step']}",
          file=sys.stderr, flush=True)
print(results)
