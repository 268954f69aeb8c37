"""r5 A/B: 256^3 grad10 remat policy (VERDICT r4 item 5).

r4 ran whole-step jax.checkpoint (grad10 7.4 steps/s, "remat-replay-
bound"). Diagnosis (runs + print_saved_residuals): the backward replay
re-ran the Krylov loops ONLY because the custom_vjp residual `warn` is
computed by the solve; everything downstream of a solve output is linear
in it (Picard), so no solution volume is needed by the backward at all.
The r5 'outputs' policy (save_only_these_names('diffpiso_solve_out'))
saves the warn scalars (+ the scan carries the step already keeps) and
the replay computes assembly/FV only — the solves DCE out.

Modes at 256^3 grad10 (4 reps each, interleaved 2x):
  step    — whole-step checkpoint (the r4 protocol)
  outputs — the r5 policy
CPU structural check (128^2 grad10): none 114.6 / step 144.3 /
solves 112.8 / outputs 108.0 ms.
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
    for mode in ("step", "outputs"):
        os.environ["DIFFPISO_REMAT3D"] = mode
        args = bench.make_parser().parse_args([])
        args.n3d = 256
        out = bench.workload_turb3d(args)
        f = out.get("fwd_steps_per_sec")
        g = out.get("grad10_steps_per_sec")
        results.setdefault(mode, []).append((round(f, 1), round(g, 2)))
        print(f"[ab] rep{rep} turb3d_256/{mode}: fwd {f:.1f} grad10 {g:.2f}",
              file=sys.stderr, flush=True)
print(results)
