"""128^3 phase-level roofline: time each PISO phase in its own long scan
(outputs chained through a dependency so XLA can't hoist), compare the
total against the full step and each phase against its HBM floor.

All device times amortized over SCAN-length chunks (tunnel cost model,
CLAUDE.md). Call conventions mirror core/piso.py:130-250.
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

N = int(os.environ.get("R3D_N", "128"))
SCAN = 30
REPS = 3
HBM_GBS = 819.0

domain, sim, step, init3 = bench.build_turbulence_3d(N, 1e-6)
vel, p = init3(seed=0)
run = bench._make_runner(step, 10)
vel, p, iters, warns = run(vel, p)  # develop + project
vel, p, iters, warns = run(vel, p)
print("developed iters", np.asarray(iters).mean(0), file=sys.stderr)

dt = 0.4 / N
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


def safe_timeit(name, fn, *args, **kw):
    """One phase failing to compile (an over-budget pallas_call can kill
    the tunnel's compile helper) must not lose the remaining phases."""
    try:
        return timeit(name, fn, *args, **kw)
    except Exception as e:  # pragma: no cover
        print(f"{name:28s}  FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return float("nan")


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


F = N * N * N * 4  # one f32 field

stencil = make_stencil(vel)
lap = make_laplacian(stencil)
rhs_p = fv_divergence(vel, dx) / dt


def do_assembly(v, s):
    st = make_stencil(v)
    sc = st.center[0].mean()
    return (chain(v, sc), s + sc)


def do_momentum(v, st, s):
    # st rides the scan carry: a closed-over 256^3 stencil would inline
    # ~0.5 GiB of constants into the compile request (tunnel HTTP 413)
    rhs = StaggeredField(
        tuple(c * (1.0 + 1e-20 * s) for c in v.components), periodic=v.periodic
    )
    x, warn = solve_advection_system(
        sim.linear_solver, st, rhs, v, 1e-6
    )
    sc = x.components[0].mean()
    return (chain(v, sc), st, s + sc)


def do_step(v, p, g1, g2):
    out = step(v, p, g1, g2, None)
    return (out.velocity, out.pressure, out.pressure_inc1, out.pressure_inc2)


def do_div(v, s):
    d = fv_divergence(v, dx)
    sc = d.mean()
    return (chain(v, sc), s + sc)


def do_pressure(r, lp, s):
    rr = r * (1.0 + 1e-20 * s)
    x, iters, warn = solve_pressure_system(
        sim.pressure_solver, lp, rr, None, 1e-8
    )
    sc = x.mean()
    return (r + 1e-20 * sc, lp, s + sc)


def do_lap_assembly(v, s):
    st = make_stencil(v)  # realistic: influence depends on the stencil diag
    l = make_laplacian(st)
    sc = l.center.mean()
    return (chain(v, sc), s + sc)


def do_h(v, st, s):
    h = explicit_H(st, v, beta)
    sc = h.components[0].mean()
    return (chain(v, sc), st, s + sc)


z = jnp.float32(0)
ms_asm = safe_timeit("advection assembly", do_assembly, vel, z,
                bytes_per_iter=(3 + 24) * F)
ms_mom = safe_timeit("momentum solve (stencil'd)", do_momentum, vel, stencil, z)
ms_div = safe_timeit("fv_divergence", do_div, vel, z, bytes_per_iter=4 * F)
ms_prs = safe_timeit("pressure solve (cold)", do_pressure, rhs_p, lap, z)
ms_la = safe_timeit("adv+laplacian assembly", do_lap_assembly, vel, z)
ms_h = safe_timeit("explicit_H", do_h, vel, stencil, z,
                   bytes_per_iter=(3 + 21 + 3) * F)
ms_step = safe_timeit("FULL PISO step", do_step, vel, p, jnp.zeros_like(p),
                 jnp.zeros_like(p))
print(
    f"sum(asm+mom+2x div+2x prs+lapdelta+H) ~ "
    f"{ms_asm + ms_mom + 2*ms_div + 2*ms_prs + (ms_la - ms_asm) + ms_h:.3f} "
    f"ms vs full {ms_step:.3f} ms; field {F/1e6:.1f} MB"
)
