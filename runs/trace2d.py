"""Profile one 512^2 turb PISO scan chunk on the TPU and print the top
device kernels by total time (xplane parse, trace3d.py's 2-D twin)."""
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

N = int(os.environ.get("T2D_N", "512"))
STEPS = 50
domain, sim, step, init2 = bench.build_turbulence(N, 1e-6)
vel, p = init2(seed=0)
run = bench._make_runner(step, STEPS)
vel, p, iters, warns = run(vel, p)
vel, p, iters, warns = run(vel, p)
jax.block_until_ready(p)

logdir = "/tmp/t2d_trace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    vel, p, iters, warns = run(vel, p)
    jax.block_until_ready(p)
print("mean pressure iters:", np.asarray(iters).mean(0))

from tensorflow.tsl.profiler.protobuf import xplane_pb2

paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
assert paths, "no xplane written"
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(paths[0], "rb").read())

totals = {}
count = {}
device_total = 0.0
for plane in xs.planes:
    if "TPU" not in plane.name and "Device" not in plane.name:
        continue
    for line in plane.lines:
        lname = line.name.lower()
        if "step" in lname and "xla" not in lname:
            continue
        for ev in line.events:
            meta = plane.event_metadata[ev.metadata_id]
            name = meta.name
            dur = ev.duration_ps / 1e9  # ms
            totals[name] = totals.get(name, 0.0) + dur
            count[name] = count.get(name, 0) + 1
            device_total += dur

print(f"scan chunk: {STEPS} steps; planes parsed from {paths[0]}")
top = sorted(totals.items(), key=lambda kv: -kv[1])[:50]
for name, ms in top:
    print(f"{ms/STEPS:8.4f} ms/step  x{count[name]/STEPS:<6.1f} {name[:110]}")
print(f"device total (all lines, may double-count): {device_total/STEPS:.3f} ms/step")
