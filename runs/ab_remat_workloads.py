"""r5 A/B: the 'outputs' remat policy across the other grad workloads.

turb512 measured +16-17% grad30 (1822/1797 vs 1557/1554,
runs/ab_remat512.log). Before flipping the bench grad protocol per
workload, measure cavity 512 (bounded, dct_mm, warm-start regime) and the
128x512 DNS (bounded channel) the same way: 2 interleaved reps each,
remat in {False, 'outputs'}.
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

# cavity (developed): reuse workload plumbing manually to control remat
domain, sim, step = bench.build(512, 1e-6)
vel = domain.staggered_grid(0.0)
p = domain.centered_grid(0.0)
fwd, it, (vel_d, p_d) = bench.bench_forward(step, vel, p, 200, 2,
                                            spinup_calls=10)
print(f"[ab] cavity control fwd {fwd:.1f}", file=sys.stderr, flush=True)
for rep in range(2):
    for mode in (False, "outputs"):
        g, _ = bench.bench_grad(step, vel_d, p_d, 30, 8, remat=mode)
        results.setdefault(("cavity", str(mode)), []).append(round(g, 1))
        print(f"[ab] rep{rep} cavity remat={mode}: grad30 {g:.1f}",
              file=sys.stderr, flush=True)
print(results)

# dns 128x512 (bounded channel): workload_dns owns its grad plumbing —
# flip via the bench-level env knob
for rep in range(2):
    for mode in ("none", "outputs"):
        os.environ["DIFFPISO_BENCH_REMAT2D"] = mode
        args = bench.make_parser().parse_args([])
        out = bench.workload_dns(args, (128, 512))
        g = out.get("grad30_steps_per_sec")
        results.setdefault(("dns", mode), []).append(round(g or 0, 1))
        print(f"[ab] rep{rep} dns remat={mode}: grad30 {g:.1f}",
              file=sys.stderr, flush=True)
print(results)
