"""r5 A/B: bf16 closure CNN (mixed precision, f32 master weights) in the
batched training iteration.

The batch-8 profile (runs/profile_train_batch.log) puts the backward scan
at 42.6 of 57.7 ms device with per-step weight copy/convert traffic; the
network convs are the MXU-eligible share. Arms: network_dtype None (f32,
the stored row) vs bfloat16, at batch 8 and batch 1, 2 interleaved reps.
The physics solver stays f32 either way (TrainingConfig.network_dtype
scopes the cast to the CNN).
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
    for dtype in (None, "bfloat16"):
        args = bench.make_parser().parse_args([])
        args.network_dtype = dtype
        args.batch = 8
        out8 = bench.workload_training(args)
        r8 = out8.get("samples_per_sec")
        results.setdefault(("b8", str(dtype)), []).append(round(r8, 2))
        print(f"[ab] rep{rep} train-b8 dtype={dtype}: {r8:.2f} samples/s",
              file=sys.stderr, flush=True)
        args = bench.make_parser().parse_args([])
        args.network_dtype = dtype
        args.batch = 1
        out1 = bench.workload_training(args)
        r1 = out1.get("train_iterations_per_sec")
        results.setdefault(("b1", str(dtype)), []).append(round(r1, 2))
        print(f"[ab] rep{rep} train-b1 dtype={dtype}: {r1:.2f} it/s",
              file=sys.stderr, flush=True)
print(results)
