"""r5 A/B: does the 'outputs' remat policy help the 512^2 grad30 headline?

Under save_only_these_names('diffpiso_solve_out') the backward scan keeps
only the solve outputs + carries: the forward stash traffic (every
intermediate of every unrolled step round-tripping HBM) collapses, at the
cost of replaying the assembly/FV/corrector chains. r3 measured the
'solves' policy at +1.8% (512^2) / -4% (1024^2); 'outputs' stashes less
AND replays the same chains. CPU structural check at 128^2 grad10:
outputs 108 ms vs none 114.6 ms. Modes: none | outputs, 2 interleaved
reps at turb512 grad30 (plus fwd as the process-health control).
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
domain, sim, step, initial_state = bench.build_turbulence(512, 1e-6)
vel, p = initial_state(seed=0)
fwd, iters, (vel_d, p_d) = bench.bench_forward(step, vel, p, 200, 8,
                                               spinup_calls=2)
print(f"[ab] control fwd {fwd:.1f}", file=sys.stderr, flush=True)
for rep in range(2):
    for mode in (False, "outputs"):
        g, _ = bench.bench_grad(step, vel_d, p_d, 30, 8, remat=mode)
        results.setdefault(str(mode), []).append(round(g, 1))
        print(f"[ab] rep{rep} turb512 remat={mode}: grad30 {g:.1f}",
              file=sys.stderr, flush=True)
print(results)
