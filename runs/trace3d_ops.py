"""128^3 forward-step trace with exclusive per-op attribution (the
trace2d_grad.py parser): where does the 3-D step's device time go?"""
import glob
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/diffpiso_jax_cache"),
)
import bench

N = int(os.environ.get("T3D_N", "128"))
STEPS = 30
domain, sim, step, init3 = bench.build_turbulence_3d(N, 1e-6)
vel, p = init3(seed=0)
run = bench._make_runner(step, STEPS)
vel, p, iters, warns = run(vel, p)
vel, p, iters, warns = run(vel, p)
jax.block_until_ready(p)

logdir = "/tmp/t3d_trace2"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    vel, p, iters, warns = run(vel, p)
    jax.block_until_ready(p)
print("mean pressure iters:", np.asarray(iters).mean(0))

from tensorflow.tsl.profiler.protobuf import xplane_pb2

paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(paths[0], "rb").read())

for plane in xs.planes:
    if "TPU" not in plane.name and "Device" not in plane.name:
        continue
    for line in plane.lines:
        tot = sum(ev.duration_ps for ev in line.events) / 1e9
        print(f"line '{line.name}': {len(line.events)} ev, "
              f"{tot/STEPS:.4f} ms/step")
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        tot, cnt = {}, {}
        for ev in line.events:
            name = plane.event_metadata[ev.metadata_id].name
            base = name.split(".")[0].lstrip("%")
            tot[base] = tot.get(base, 0.0) + ev.duration_ps / 1e9
            cnt[base] = cnt.get(base, 0) + 1
        for nm, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:25]:
            print(f"{ms/STEPS:8.4f} ms/step x{cnt[nm]/STEPS:<7.2f} {nm}")
        # pallas instruction split
        tot2, cnt2 = {}, {}
        for ev in line.events:
            name = plane.event_metadata[ev.metadata_id].name
            if "closed_call" not in name and "pallas" not in name:
                continue
            key = name[:130]
            tot2[key] = tot2.get(key, 0.0) + ev.duration_ps / 1e9
            cnt2[key] = cnt2.get(key, 0) + 1
        print("-- pallas instructions:")
        for nm, ms in sorted(tot2.items(), key=lambda kv: -kv[1])[:20]:
            print(f"{ms/STEPS:8.4f} ms/step x{cnt2[nm]/STEPS:<5.2f} {nm}")
