"""Profile ONE unrolled-gradient eval (30-step rollout loss) of the 512^2
turb workload on the TPU and print the top device kernels by total time —
the adjoint-path twin of trace2d.py. With the whole-solve kernels on
(fwd 6409 vs grad30 1468 steps/s, runs/ab_jac2.log) the adjoint is now the
headline bottleneck; this locates where its time goes (forward replay vs
adjoint solves vs VJP fusion chains)."""
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
UNROLL = 30
domain, sim, step, init2 = bench.build_turbulence(N, 1e-6)
vel, p = init2(seed=0)
run = bench._make_runner(step, 50)
vel, p, iters, warns = run(vel, p)  # developed state
jax.block_until_ready(p)

# the same grad program bench_grad times (bench.py:278-322)
import jax.numpy as jnp

forcing0 = jax.tree_util.tree_map(jnp.zeros_like, vel)


def loss_fn(forcing, vel, p):
    def body(carry, _):
        vel, p, g1, g2 = carry
        out = step(vel, p, g1, g2, forcing)
        return (
            out.velocity, out.pressure, out.pressure_inc1, out.pressure_inc2,
        ), (out.p_iterations, out.warn)

    (vel, p, _, _), (iters, warns) = jax.lax.scan(
        body, (vel, p, jnp.zeros_like(p), jnp.zeros_like(p)), None,
        length=UNROLL,
    )
    return sum(jnp.sum(c ** 2) for c in vel.components), (iters, warns)


grad_fn = jax.jit(jax.grad(loss_fn, has_aux=True))
g, _aux = grad_fn(forcing0, vel, p)
g, _aux = grad_fn(forcing0, vel, p)
jax.block_until_ready(g)

logdir = "/tmp/t2dg_trace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    g, _aux = grad_fn(forcing0, vel, p)
    jax.block_until_ready(g)

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

print(f"grad eval: {UNROLL}-step unrolled loss; planes from {paths[0]}")
top = sorted(totals.items(), key=lambda kv: -kv[1])[:50]
for name, ms in top:
    print(f"{ms/UNROLL:8.4f} ms/ustep  x{count[name]/UNROLL:<6.1f} {name[:110]}")
print(f"device total (all lines, may double-count): "
      f"{device_total/UNROLL:.3f} ms/unrolled-step")
