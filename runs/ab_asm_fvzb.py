"""Within-process A/B of the two r4 follow-up levers at 256^3 (and a 128^3
regression check for the FV z-block):

  DIFFPISO_UNMASKED_ASM — all-periodic unmasked Laplacian-assembly fast
    path (skips the where-masked chains; runs/roofline3d_256.log showed a
    4.4 ms laplacian-assembly delta vs a ~0.8 ms floor).
  DIFFPISO_FV_ZBLOCK — bz-plane z-block grid for the rank-3 fused FV
    div/grad kernels (MB-class DMA blocks; the 1-plane grid measured 3.8x
    its HBM floor at 256^3).

4 configs x 2 interleaved reps at 256^3 (fwd 20-step chunks x3 + remat
grad10 x4), then FV-only never/auto at 128^3.
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


def measure(asm, fvzb, n):
    os.environ["DIFFPISO_UNMASKED_ASM"] = asm
    os.environ["DIFFPISO_FV_ZBLOCK"] = fvzb
    domain, sim, step, initial_state = bench.build_turbulence_3d(n, 1e-6)
    vel, p = initial_state(seed=0)
    fwd, iters, (vel_d, p_d) = bench.bench_forward(
        step, vel, p, 20, 3, spinup_calls=2
    )
    g, _ = bench.bench_grad(step, vel_d, p_d, 10, 4, remat=True)
    return fwd, g


results = {}
for rep in range(2):
    for asm, fvzb in (("never", "never"), ("auto", "never"),
                      ("never", "auto"), ("auto", "auto")):
        f, g = measure(asm, fvzb, 256)
        key = f"asm={asm}/fvzb={fvzb}"
        results.setdefault(key, []).append((round(f, 1), round(g, 1)))
        print(f"[ab] rep{rep} turb3d256/{key}: fwd {f:.1f} grad10 {g:.1f}",
              file=sys.stderr, flush=True)
print(results)

res128 = {}
for rep in range(2):
    for fvzb in ("never", "auto"):
        f, g = measure("auto", fvzb, 128)
        res128.setdefault(fvzb, []).append((round(f, 1), round(g, 1)))
        print(f"[ab] rep{rep} turb3d128/fvzb={fvzb}: fwd {f:.1f} grad10 {g:.1f}",
              file=sys.stderr, flush=True)
print(res128)
