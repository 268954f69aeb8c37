"""Post-fix check: turb1024 full protocol at r5 defaults.

Validates (a) the mm-update revert restores the r4 iteration profile
(fwd pressure iters ~[1.0, 0.99], fwd ~830), (b) the corrector tiled
bridge's new 48 MiB ceiling compiles inside the 'outputs'-remat backward
(the crash in runs/ab_mm_dct.log), and (c) what the outputs protocol does
to the 1024^2 grad30 row (r4: 277).
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

args = bench.make_parser().parse_args([])
args.n = 1024
out = bench.workload_turbulence(args)
print({k: v for k, v in out.items() if "steps" in k or "iters" in k})
