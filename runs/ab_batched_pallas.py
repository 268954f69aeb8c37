"""Within-process A/B of DIFFPISO_BATCHED_PALLAS on the training workload:
batch-8 (and batch-1) closure training at 64x256, 10-step unroll, 4 losses.
never = the r2 behavior (no_pallas: all-XLA batched rollouts); auto = the
whole-solve kernels ride into the vmapped trace via their grid-over-batch
custom_vmap rules (one program per sample)."""
import os
import sys
import types

sys.path.insert(0, "/root/repo")
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/diffpiso_jax_cache"),
)
import bench


def measure(mode, batch):
    os.environ["DIFFPISO_BATCHED_PALLAS"] = mode
    a = types.SimpleNamespace(
        quick=False, tol=1e-6, fwd_only=False, batch=batch,
        network_dtype=None,
    )
    out = bench.workload_training(a)
    return out["samples_per_sec"]


results = {}
for rep in range(2):
    for batch in (8, 1):
        for mode in ("never", "auto"):
            s = measure(mode, batch)
            results.setdefault((batch, mode), []).append(round(s, 1))
            print(f"[ab] rep{rep} batch{batch}/{mode}: {s:.1f} samples/s",
                  file=sys.stderr, flush=True)
print(results)
