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


# r5: the grad protocol wraps the step in the 'outputs' remat policy
# (bench._remat2d default — backward replays assembly/FV, never solves);
# trace the SAME program bench_grad now times
step_fn = jax.checkpoint(
    step,
    policy=jax.checkpoint_policies.save_only_these_names(
        "diffpiso_solve_out"),
)


def loss_fn(forcing, vel, p):
    def body(carry, _):
        vel, p, g1, g2 = carry
        out = step_fn(vel, p, g1, g2, forcing)
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

for plane in xs.planes:
    if "TPU" not in plane.name and "Device" not in plane.name:
        continue
    print(f"== plane: {plane.name}")
    for line in plane.lines:
        tot = sum(ev.duration_ps for ev in line.events) / 1e9
        print(f"   line '{line.name}': {len(line.events)} events, "
              f"{tot/UNROLL:.4f} ms/ustep total")

# exclusive per-op attribution: use ONLY the op-level line (deepest,
# usually 'XLA Ops') — module/step lines double-count their children
for plane in xs.planes:
    if "TPU" not in plane.name and "Device" not in plane.name:
        continue
    oplines = [l for l in plane.lines if "op" in l.name.lower()]
    for line in oplines:
        totals, count = {}, {}
        for ev in line.events:
            name = plane.event_metadata[ev.metadata_id].name
            # bucket by op family for a readable split
            base = name.split(".")[0].lstrip("%")
            totals[base] = totals.get(base, 0.0) + ev.duration_ps / 1e9
            count[base] = count.get(base, 0) + 1
        ttotal = sum(totals.values())
        print(f"-- op line '{line.name}' exclusive total: "
              f"{ttotal/UNROLL:.4f} ms/ustep")
        for nm, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:40]:
            print(f"{ms/UNROLL:8.4f} ms/ustep  x{count[nm]/UNROLL:<7.2f} {nm}")

# per-kernel split of the pallas custom-calls (full instruction identity;
# the output signature identifies the kernel: (plane, plane, scalar) =
# jac2, (plane, scalar-f32, scalar-s32) = pcg2, single plane = matvec/FV)
for plane in xs.planes:
    if "TPU" not in plane.name and "Device" not in plane.name:
        continue
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        tot, cnt = {}, {}
        for ev in line.events:
            name = plane.event_metadata[ev.metadata_id].name
            if "closed_call" not in name and "custom-call" not in name:
                continue
            key = name[:160]
            tot[key] = tot.get(key, 0.0) + ev.duration_ps / 1e9
            cnt[key] = cnt.get(key, 0) + 1
        print("-- pallas calls by instruction:")
        for nm, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:30]:
            print(f"{ms/UNROLL:8.4f} ms/ustep x{cnt[nm]/UNROLL:<5.2f} {nm}")
