"""r5 A/B: FFT-based channel preconditioner vs the matmul eigenbasis at
the 512x2048 DNS.

The corrected dct-tier diagnosis (runs/ab_dns_grad.log) bounds the dns
row by the preconditioner's own contraction traffic: channel_mm applies
dense 512^2 + 2048^2 DCT bases (O(n^2) per axis) every iteration. The
FFT-based ChannelSpectralSolver ('channel') is O(n log n) — the r3
"matmuls beat FFT custom-calls on the MXU" measurement was taken at the
512-class; at 2048 modes the crossover may flip. Arms swap ONLY the
preconditioner kind (forward AND adjoint), 2 interleaved reps of the
full dns workload.
"""
import dataclasses
import os
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/diffpiso_jax_cache"),
)
import bench
from diffpiso_tpu.core import setups as su

orig_setup = su.spatial_mixing_layer_setup
KIND = {"mm": "channel_mm", "fft": "channel"}


def make_patched(kind):
    def patched(*a, **k):
        s = orig_setup(*a, **k)
        ps = dataclasses.replace(
            s.sim.pressure_solver, preconditioner=kind,
            adjoint_preconditioner=kind)
        sim = dataclasses.replace(s.sim, pressure_solver=ps)
        return dataclasses.replace(s, sim=sim)

    return patched


results = {}
for rep in range(2):
    for arm, kind in KIND.items():
        su.spatial_mixing_layer_setup = make_patched(kind)
        bench.spatial_mixing_layer_setup = su.spatial_mixing_layer_setup
        try:
            args = bench.make_parser().parse_args([])
            out = bench.workload_dns(args, (512, 2048))
        finally:
            su.spatial_mixing_layer_setup = orig_setup
            bench.spatial_mixing_layer_setup = orig_setup
        results.setdefault(arm, []).append(
            (round(out["fwd_steps_per_sec"], 1),
             round(out["grad30_steps_per_sec"], 1)))
        print(f"[ab] rep{rep} dns precond={arm}: fwd "
              f"{out['fwd_steps_per_sec']:.1f} grad30 "
              f"{out['grad30_steps_per_sec']:.1f} iters "
              f"{out['fwd_pressure_iters_per_step']}"
              f"/{out['grad_pressure_iters_per_step']}",
              file=sys.stderr, flush=True)
print(results)
