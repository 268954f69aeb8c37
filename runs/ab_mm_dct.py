"""r5 A/B: the LARGE-tier mm-update for the BOUNDED (dct-family) DNS solve.

r4 measured the dct2-basis LARGE tier LOSING 26% grad30 at the 512x2048
mixing layer (runs/ab_phase_large.log) and gated it to fourier-only. The
r5 diagnosis: the kernel re-split the f32 eigenbases to bf16 hi/lo on
EVERY launch — at the DNS basis sizes (512^2 + 2048^2 = 17.8 MiB f32)
that is ~36 MiB of per-iteration VPU traffic, ~2.2x the per-plane basis
cost of the fourier shapes that won. The splits are now hoisted to
constant-folded operands (pallas_krylov._bf16_split).

Modes at dns 512x2048 (fwd 100-step scan chunks + grad30, 2 reps):
  auto — fourier-only family gate: dns runs the pure XLA loop (r4 winner)
  all  — DIFFPISO_FUSED_KRYLOV_LARGE=all: phase kernels + pre-split
         mm-update on the dct2xdct4 basis
Also re-measures turb1024 auto (fourier) to confirm the hoist holds its
r4 win (+13% fwd) — a regression there vetoes the change.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/diffpiso_jax_cache"),
)
import argparse

import bench

results = {}


def run(tag, workload, mode):
    os.environ["DIFFPISO_FUSED_KRYLOV_LARGE"] = mode
    args = bench.make_parser().parse_args([])
    if workload == "dns":
        out = bench.workload_dns(args, (512, 2048))
    else:
        args.n = 1024
        out = bench.workload_turbulence(args)
    f = out.get("fwd_steps_per_sec")
    g = out.get("grad30_steps_per_sec")
    results.setdefault((workload, mode), []).append(
        (round(f or 0, 1), round(g or 0, 1))
    )
    print(f"[ab] {tag} {workload}/{mode}: fwd {f:.1f} grad30 {g:.1f}",
          file=sys.stderr, flush=True)


for rep in range(2):
    for workload, mode in (("dns", "auto"), ("dns", "all"),
                           ("turb1024", "auto")):
        run(f"rep{rep}", workload, mode)
print(results)
