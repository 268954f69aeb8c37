"""r5 A/B: the 'outputs' rollout remat in the TRAINING iteration.

TrainingConfig.remat defaults to 'outputs' (the r5 grad protocol win:
+16% grad30 at turb512). Validate on the actual training workload
(64x256, 10-step unroll, 4 losses, Adam, batch 1 and batch 8): if the
small-plane replay cost outweighs the stash saving, flip the default.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/diffpiso_jax_cache"),
)
import dataclasses

import bench

results = {}
for rep in range(2):
    for mode in ("none", "outputs"):
        os.environ["DIFFPISO_TRAIN_REMAT"] = mode
        args = bench.make_parser().parse_args([])
        args.batch = 1
        out = bench.workload_training(args)
        r = out.get("train_iterations_per_sec")
        results.setdefault(("b1", mode), []).append(round(r, 2))
        print(f"[ab] rep{rep} train-b1 remat={mode}: {r:.2f} it/s",
              file=sys.stderr, flush=True)
        args.batch = 8
        out8 = bench.workload_training(args)
        r8 = out8.get("samples_per_sec")
        results.setdefault(("b8", mode), []).append(round(r8, 2))
        print(f"[ab] rep{rep} train-b8 remat={mode}: {r8:.2f} samples/s",
              file=sys.stderr, flush=True)
print(results)
