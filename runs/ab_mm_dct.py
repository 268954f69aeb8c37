"""r5 A/B: the LARGE-tier mm-update for the BOUNDED (dct-family) DNS solve.

Round 1 of this A/B (log head) diagnosed the r4 dct loss: forcing the
tier on the dct2xdct4 basis (mode 'all', in-kernel bf16x3 HIGH) inflates
pressure iterations ~3x (grad [1.73,1.1] -> [5.4,3.1], grad30 110.8 ->
17.9) — preconditioner PRECISION, not launch overhead. It also vetoed
the pre-split-operand variant (fourier turb1024 iters 1.0 -> 2.0, fwd
830 -> 682): the in-kernel split is load-bearing; reverted.

Round 2 (appended): mode 'all-highest' — the dct-family contractions
coerce to Mosaic HIGHEST (true f32 quality, 6 passes), trading passes
for the 3x iterations. Arms at dns 512x2048: auto (XLA loop, the
incumbent) vs all-highest.
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
    for workload, mode in (("dns", "auto"), ("dns", "all-highest")):
        run(f"rep{rep}", workload, mode)
print(results)
