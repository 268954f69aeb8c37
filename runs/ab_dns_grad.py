"""r5: dns 512x2048 grad30 with the LARGE phase tier open to the dct
family (mode 'all') vs the fourier-only default.

runs/diag_dct_inflation.py overturned the r5 'bf16x3 precision'
diagnosis: the 3x iteration inflation in runs/ab_mm_dct.log was an
artifact of the since-reverted split-hoist commit (7f1b2bf, reverted in
dbb59c0) — at the current tree, mode 'all' holds iters at [1.02, 0.43],
identical to XLA, and loses only ~4-11% fwd throughput to the dense DCT
basis traffic at ~1 warm iteration/solve. The ADJOINT solves are cold
(many iterations amortizing the per-iteration launches) — the regime the
tier was built for. 2 interleaved reps of the full dns workload.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/diffpiso_jax_cache"),
)
import bench

results = {}
for rep in range(2):
    for mode in ("auto", "all"):
        os.environ["DIFFPISO_FUSED_KRYLOV_LARGE"] = mode
        args = bench.make_parser().parse_args([])
        out = bench.workload_dns(args, (512, 2048))
        results.setdefault(mode, []).append(
            (round(out["fwd_steps_per_sec"], 1),
             round(out["grad30_steps_per_sec"], 1)))
        print(f"[ab] rep{rep} dns mode={mode}: fwd "
              f"{out['fwd_steps_per_sec']:.1f} grad30 "
              f"{out['grad30_steps_per_sec']:.1f} "
              f"(grad iters {out['grad_pressure_iters_per_step']})",
              file=sys.stderr, flush=True)
print(results)
