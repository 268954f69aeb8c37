"""AOT lowering proof for the per-shard solver programs at a REAL
multi-chip topology (VERDICT r4 missing #3 / next-round item 6).

runs/check_shard_kernels_tpu.py compiles the program family on the single
real chip as a (1,1) mesh — identity permutes. This script closes the gap
to TPU reality: it AOT-compiles the shard_map solver programs for a
v5e:2x2 TOPOLOGY (4 chips, real ICI collectives) using the chipless
PJRT compile-only path (jax.experimental.topologies — libtpu compiles
locally, no TPU attached, no tunnel), proving Mosaic kernel lowering +
ppermute/psum partitioning at n_devices > 1:

  1. bare sharded momentum Jacobi-Richardson solve (ppermute slivers +
     measure+k-sweep launches, both components),
  2. bare sharded pressure phase PCG (matvec/update launches, distributed
     eigenbasis preconditioner via psum_scatter, verify-and-resume),
  3. the FULL piso_step forward traced under sharded_solvers on the 2x2
     mesh (solves on per-shard kernels, rest GSPMD).

Run:  python runs/check_shard_kernels_aot.py   (CPU-side; ~minutes)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-4")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diffpiso_tpu import StaggeredField
from diffpiso_tpu.core import piso_step
from diffpiso_tpu.core.setups import decaying_turbulence_setup
from diffpiso_tpu.ops import assemble_pressure_laplacian
from diffpiso_tpu.ops.stencil import AdvectionStencil
from diffpiso_tpu.parallel import shard_kernels as sk
from diffpiso_tpu.solvers.fourier import MatmulSpectralSolver

# the kernel gates consult the executing backend; AOT compiles against the
# topology with no backend attached, so force the availability check (the
# compile itself is the proof)
sk.kernels_available = lambda: True

topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x2")
mesh = Mesh(np.array(topo.devices).reshape(2, 2), ("y", "x"))
ctx = sk.ShardedSolveCtx(mesh, ("y", "x"))
print(f"[aot] topology v5e:2x2 -> {len(topo.devices)} devices", flush=True)

NY, NX = 256, 256
f32 = jnp.float32


def sds(shape, spec):
    return jax.ShapeDtypeStruct(shape, f32,
                                sharding=NamedSharding(mesh, spec))


# -- 1. bare momentum solve -----------------------------------------------------------
def momentum(c0, l00, h00, l01, h01, c1, l10, h10, l11, h11, b0, b1, x0, x1):
    st_cs = [(c0, (l00, l01), (h00, h01)), (c1, (l10, l11), (h10, h11))]
    xs, n = sk.sharded_momentum_solve(
        ctx, st_cs, (b0, b1), (x0, x1), -1.0, False, 1e-6
    )
    return xs[0], xs[1], n


spec = P("y", "x")
args = [sds((NY, NX), spec) for _ in range(14)]
low1 = jax.jit(momentum).lower(*args)
c1 = low1.compile()
hlo = c1.as_text()
n_cc, n_perm = hlo.count("custom-call"), hlo.count("collective-permute")
print(f"[aot] momentum solve (2x2, ppermute slivers + kernel trips): "
      f"COMPILED — {n_cc} custom-calls (Mosaic kernels), "
      f"{n_perm} collective-permutes, {hlo.count('all-reduce')} all-reduces "
      f"in the optimized HLO", flush=True)
assert n_cc > 0 and n_perm > 0, "kernel/collective lowering missing"

# -- 2. bare pressure phase PCG -------------------------------------------------------
rng = np.random.RandomState(3)
infl = StaggeredField(
    (jnp.ones((NY, NX), f32), jnp.ones((NY, NX), f32)),
    periodic=(True, True),
)
act = jnp.ones((NY + 2, NX + 2), f32)
lap = assemble_pressure_laplacian(infl, act, act, (True, True), True)
mss = MatmulSpectralSolver(kinds=("fourier", "fourier"), shape=(NY, NX))
weights = tuple(jnp.mean(jnp.abs(l)) for l in lap.lo)


def pressure(b, x0):
    x, k, rn = sk.sharded_pressure_pcg(
        ctx, lap, b, x0, 1e-6, 200, True, mm_solver=mss, weights=weights
    )
    return x, k, rn


c2 = jax.jit(pressure).lower(sds((NY, NX), spec), sds((NY, NX), spec)).compile()
print("[aot] pressure phase PCG (2x2, distributed eigenbasis M^-1 + "
      "matvec/update launches): COMPILED", flush=True)

# -- 3. full piso_step under sharded_solvers ------------------------------------------
domain, sim = decaying_turbulence_setup((NY, NX), viscosity=1e-4)
dt = 0.4 / NY


def step(v0, v1, p, g1, g2):
    vel = StaggeredField((v0, v1), periodic=(True, True))
    with sk.sharded_solvers(mesh, ("y", "x")):
        out = piso_step(
            vel, p, dt, domain, sim,
            pressure_inc1_guess=g1, pressure_inc2_guess=g2,
            advection_tol=1e-6, pressure_tol=1e-8,
        )
    return out.velocity.components + (out.pressure,)


c3 = jax.jit(step).lower(*[sds((NY, NX), spec) for _ in range(5)]).compile()
print("[aot] FULL piso_step under sharded_solvers (2x2): COMPILED",
      flush=True)
ma = c3.memory_analysis()
print(f"[aot] step memory: args {ma.argument_size_in_bytes / 1e6:.2f} MB, "
      f"temps {ma.temp_size_in_bytes / 1e6:.2f} MB", flush=True)
print("[aot] ALL PROGRAMS COMPILED for v5e:2x2 — Mosaic kernels + ICI "
      "collectives lower at n_devices=4", flush=True)
