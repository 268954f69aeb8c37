"""512^2 cavity phase-level roofline (the bounded-workload twin of
runs/roofline3d.py): time each PISO phase in its own long scan against the
full developed-cavity step, to locate where the bounded step's time goes
(masked jnp assembly vs momentum vs pressure vs FV) and steer the
DIFFPISO_FUSED_ADVM/FVM rollout. Env gates apply at trace time — run once
per gate config:

    python runs/roofline_cavity.py                 # defaults
    DIFFPISO_FUSED_ADVM=auto DIFFPISO_FUSED_FVM=auto python runs/roofline_cavity.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/diffpiso_jax_cache"),
)
import bench
from diffpiso_tpu.fields.grid import StaggeredField

N = int(os.environ.get("RC_N", "512"))
SCAN = 100
REPS = 4
HBM_GBS = 819.0
SPINUP = int(os.environ.get("RC_SPINUP", "2000"))

domain, sim, step = bench.build(N, 1e-6)
vel = domain.staggered_grid(0.0)
p = domain.centered_grid(0.0)
run = bench._make_runner(step, 200)
for _ in range(max(1, SPINUP // 200)):
    vel, p, iters, warns = run(vel, p)
print("developed iters", np.asarray(iters).mean(0), file=sys.stderr)

dt = 0.2 / N
dx = domain.dx
dxprod = float(np.prod(dx))
beta = dxprod / dt
from diffpiso_tpu.ops.stencil import assemble_advection_stencil, explicit_H
from diffpiso_tpu.ops.laplace import assemble_pressure_laplacian
from diffpiso_tpu.ops.fv import fv_divergence, fv_gradient
from diffpiso_tpu.solvers.base import (
    solve_advection_system,
    solve_pressure_system,
)


def make_stencil(v):
    return assemble_advection_stencil(
        v, dx, domain.velocity_pad_modes(), sim.viscosity, beta,
        sim.dirichlet_mask, sim.active_mask, sim.accessible_mask,
        sim.no_slip_mask, sim.bool_periodic,
    )


def make_laplacian(st):
    A = StaggeredField(st.diag_A, periodic=vel.periodic)
    dx_factor = dxprod / (dx[0] ** 2)
    influence = StaggeredField(
        tuple(dx_factor / (beta - a) for a in A.components),
        periodic=vel.periodic,
    )
    return assemble_pressure_laplacian(
        influence, sim.active_mask, sim.accessible_mask, sim.bool_periodic,
        sim.laplace_rank_deficient,
    )


def chain(v, s):
    return StaggeredField(
        tuple(c + 1e-20 * s for c in v.components), periodic=v.periodic
    )


def timeit(name, fn, *args, scan=SCAN, bytes_per_iter=None):
    @jax.jit
    def loop(a0):
        def body(c, _):
            return fn(*c), ()

        out, _ = jax.lax.scan(body, a0, None, length=scan)
        return out

    r = loop(args)
    jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = loop(r)
    jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    ms = (time.perf_counter() - t0) / (REPS * scan) * 1e3
    floor = ""
    if bytes_per_iter:
        floor_ms = bytes_per_iter / (HBM_GBS * 1e6)
        floor = f"  (HBM floor {floor_ms:.3f} ms, {ms/max(floor_ms,1e-9):.1f}x)"
    print(f"{name:28s} {ms:7.3f} ms{floor}", flush=True)
    return ms


F = (N + 1) * N * 4  # one f32 component plane (approx)

stencil = make_stencil(vel)
lap = make_laplacian(stencil)
rhs_p = fv_divergence(vel, dx) / dt


def do_assembly(v, s):
    st = make_stencil(v)
    sc = st.center[0].mean()
    return (chain(v, sc), s + sc)


def do_momentum(v, s):
    rhs = StaggeredField(
        tuple(c * (1.0 + 1e-20 * s) for c in v.components), periodic=v.periodic
    )
    x, warn = solve_advection_system(sim.linear_solver, stencil, rhs, v, 1e-6)
    sc = x.components[0].mean()
    return (chain(v, sc), s + sc)


def do_step(v, p, g1, g2):
    out = step(v, p, g1, g2, None)
    return (out.velocity, out.pressure, out.pressure_inc1, out.pressure_inc2)


def do_div(v, s):
    d = fv_divergence(v, dx)
    sc = d.mean()
    return (chain(v, sc), s + sc)


def do_grad(pp, s):
    g = fv_gradient(pp * (1.0 + 1e-20 * s), dx, domain.pressure_pad_modes(),
                    sim.accessible_mask)
    sc = g.components[0].mean()
    return (pp + 1e-20 * sc, s + sc)


def do_pressure_warm(r, s):
    # the developed-cavity regime: warm-started solves that mostly early-exit
    rr = r * (1.0 + 1e-20 * s)
    x, iters, warn = solve_pressure_system(sim.pressure_solver, lap, rr,
                                           rr * 0.9, 1e-6)
    sc = x.mean()
    return (r + 1e-20 * sc, s + sc)


def do_pressure_cold(r, s):
    rr = r * (1.0 + 1e-20 * s)
    x, iters, warn = solve_pressure_system(sim.pressure_solver, lap, rr,
                                           None, 1e-6)
    sc = x.mean()
    return (r + 1e-20 * sc, s + sc)


def do_lap_assembly(v, s):
    st = make_stencil(v)
    l = make_laplacian(st)
    sc = l.center.mean()
    return (chain(v, sc), s + sc)


def do_h(v, s):
    h = explicit_H(stencil, v, beta)
    sc = h.components[0].mean()
    return (chain(v, sc), s + sc)


z = jnp.float32(0)
ms_asm = timeit("advection assembly", do_assembly, vel, z,
                bytes_per_iter=(3 + 12) * F)
ms_mom = timeit("momentum solve", do_momentum, vel, z)
ms_div = timeit("fv_divergence", do_div, vel, z, bytes_per_iter=3 * F)
ms_grd = timeit("fv_gradient (masked)", do_grad, p, z, bytes_per_iter=3 * F)
ms_prw = timeit("pressure solve (warm)", do_pressure_warm, rhs_p, z)
ms_prc = timeit("pressure solve (cold)", do_pressure_cold, rhs_p, z)
ms_la = timeit("adv+laplacian assembly", do_lap_assembly, vel, z)
ms_h = timeit("explicit_H", do_h, vel, z, bytes_per_iter=14 * F)
ms_step = timeit("FULL PISO step (developed)", do_step, vel, p,
                 jnp.zeros_like(p), jnp.zeros_like(p))
print(
    f"sum(asm+mom+2div+3grad+2warm-prs+lapdelta+H) ~ "
    f"{ms_asm + ms_mom + 2*ms_div + 3*ms_grd + 2*ms_prw + (ms_la - ms_asm) + ms_h:.3f}"
    f" ms vs full {ms_step:.3f} ms; component {F/1e6:.2f} MB"
)
