"""r5 A/B: the batch-FOLDED whole-solve momentum kernel in batched
training (batch 8, 64x256, remat='none' — the b8 default).

Arms: DIFFPISO_FUSED_JAC2_FOLD never (all-XLA small-plane baseline, the
r4 measured winner) vs auto (fold mode: all-XLA except jac2 folded into
one VMEM-resident program per solve). 2 interleaved reps; batch-1 control
once (the fold path only affects vmapped traces).
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
    for mode in ("never", "auto"):
        os.environ["DIFFPISO_FUSED_JAC2_FOLD"] = mode
        args = bench.make_parser().parse_args([])
        args.batch = 8
        out = bench.workload_training(args)
        r = out.get("samples_per_sec")
        results.setdefault(mode, []).append(round(r, 2))
        print(f"[ab] rep{rep} train-b8 fold={mode}: {r:.2f} samples/s",
              file=sys.stderr, flush=True)
print(results)
