"""512x2048 mixing-layer DNS phase roofline (the two weakest per-cell
BENCH_DETAIL rows: dns fwd ~614 / grad30 ~113 steps/s). Times each PISO
phase in its own long scan (chunk-chained carries, tunnel cost model —
CLAUDE.md) against its HBM floor, plus full-step fwd via chunk-length
deltas and bwd via unroll deltas — the same protocols as runs/roofline2.py
and runs/roofline3d.py. Phase call conventions mirror core/piso.py.
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
from diffpiso_tpu.core import piso_step
from diffpiso_tpu.core.setups import spatial_mixing_layer_setup
from diffpiso_tpu.fields.grid import StaggeredField
from diffpiso_tpu.ops.stencil import assemble_advection_stencil, explicit_H
from diffpiso_tpu.ops.laplace import assemble_pressure_laplacian
from diffpiso_tpu.ops.fv import fv_divergence, fv_gradient
from diffpiso_tpu.solvers.base import (
    solve_advection_system,
    solve_pressure_system,
)

HRRES = (512, 2048)
SCAN = 30
REPS = 3
HBM_GBS = 819.0
TOL = 1e-6

setup = spatial_mixing_layer_setup(
    simulation={"HRres": HRRES, "dt": 0.2 * 128 / HRRES[0]},
    max_iterations=(200, 2000),
)
domain, sim, dt = setup.domain, setup.sim, setup.dt
dx = domain.dx
dxprod = float(np.prod(dx))
beta = dxprod / dt
vel, p = setup.initial_state()
pert = setup.perturbation(0.0)
dv = setup.dirichlet_values(pert)


@jax.jit
def run50(vel, p, t0):
    def body(carry, i):
        vel, p, g1, g2 = carry
        out = piso_step(
            vel, p, dt, domain, sim,
            dirichlet_values=setup.dirichlet_values(
                setup.perturbation(t0 + i * dt)),
            pressure_inc1_guess=g1, pressure_inc2_guess=g2,
            advection_tol=TOL, pressure_tol=TOL,
        )
        return (out.velocity, out.pressure, out.pressure_inc1,
                out.pressure_inc2), out.p_iterations

    (vel, p, _, _), iters = jax.lax.scan(
        body, (vel, p, jnp.zeros_like(p), jnp.zeros_like(p)),
        jnp.arange(50, dtype=jnp.float32))
    return vel, p, iters


t = 0.0
for _ in range(4):  # develop
    vel, p, iters = run50(vel, p, t)
    t += 50 * dt
jax.block_until_ready(p)
print("developed iters", np.asarray(iters).mean(0), file=sys.stderr)


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
    try:
        return timeit(name, fn, *args, **kw)
    except Exception as e:  # pragma: no cover
        print(f"{name:30s}  FAILED: {type(e).__name__}: {str(e)[:200]}",
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
    print(f"{name:30s} {ms:7.3f} ms{floor}", flush=True)
    return ms


F = HRRES[0] * HRRES[1] * 4
stencil = make_stencil(vel)
lap = make_laplacian(stencil)
rhs_p = fv_divergence(vel, dx) / dt


def do_assembly(v, s):
    st = make_stencil(v)
    sc = st.center[0].mean()
    return (chain(v, sc), s + sc)


def do_momentum(v, st, s):
    # st rides the scan carry — a closed-over stencil inlines its planes
    # as constants into the tunnel compile request (HTTP 413 at rank 3;
    # avoid the same failure mode here)
    rhs = StaggeredField(
        tuple(c * (1.0 + 1e-20 * s) for c in v.components),
        periodic=v.periodic)
    x, warn = solve_advection_system(sim.linear_solver, st, rhs, v, TOL)
    sc = x.components[0].mean()
    return (chain(v, sc), st, s + sc)


def do_div(v, s):
    d = fv_divergence(v, dx)
    sc = d.mean()
    return (chain(v, sc), s + sc)


def do_grad(r, s):
    g = fv_gradient(r * (1.0 + 1e-20 * s), dx, domain.pressure_pad_modes(),
                    sim.accessible_mask)
    sc = g.components[0].mean()
    return (r * (1.0 + 1e-20 * sc), s + sc)


def do_pressure_cold(r, lp, s):
    rr = r * (1.0 + 1e-20 * s)
    x, iters, warn = solve_pressure_system(
        sim.pressure_solver, lp, rr, None, TOL)
    sc = x.mean()
    return (r * (1.0 + 1e-20 * sc), lp, s + sc)


def do_pressure_warm(r, lp, x0, s):
    rr = r * (1.0 + 1e-20 * s)
    x, iters, warn = solve_pressure_system(
        sim.pressure_solver, lp, rr, x0, TOL)
    sc = x.mean()
    return (r * (1.0 + 1e-20 * sc), lp, x, s + sc)


def do_h(v, st, s):
    h = explicit_H(st, v, beta)
    sc = h.components[0].mean()
    return (chain(v, sc), st, s + sc)


z = jnp.float32(0)
ms_asm = safe_timeit("advection assembly", do_assembly, vel, z,
                bytes_per_iter=(3 + 24) * F)
ms_mom = safe_timeit("momentum solve", do_momentum, vel, stencil, z)
ms_div = safe_timeit("fv_divergence", do_div, vel, z,
                bytes_per_iter=4 * F)
ms_grd = safe_timeit("fv_gradient (masked)", do_grad, rhs_p, z,
                bytes_per_iter=4 * F)
ms_prc = safe_timeit("pressure solve (cold)", do_pressure_cold, rhs_p, lap, z)
x_sol, _, _ = solve_pressure_system(sim.pressure_solver, lap, rhs_p, None,
                                    TOL)
ms_prw = safe_timeit("pressure solve (warm x0)", do_pressure_warm, rhs_p, lap, x_sol, z)
ms_h = safe_timeit("explicit_H", do_h, vel, stencil, z,
               bytes_per_iter=(3 + 21 + 3) * F)


def do_step(v, p, g1, g2):
    out = piso_step(v, p, dt, domain, sim, dirichlet_values=dv,
                    pressure_inc1_guess=g1, pressure_inc2_guess=g2,
                    advection_tol=TOL, pressure_tol=TOL)
    return (out.velocity, out.pressure, out.pressure_inc1,
            out.pressure_inc2)


ms_step = safe_timeit("FULL PISO step", do_step, vel, p, jnp.zeros_like(p),
                 jnp.zeros_like(p))
print(
    f"sum(asm+mom+2x div+grad+cold prs+warm prs+H) ~ "
    f"{ms_asm + ms_mom + 2 * ms_div + ms_grd + ms_prc + ms_prw + ms_h:.3f} "
    f"ms vs full {ms_step:.3f} ms; field {F/1e6:.1f} MB", flush=True)


# -- backward: unroll deltas (roofline2 protocol) ---------------------------------------
def grad_wall(unroll, reps=4):
    forcing0 = jax.tree_util.tree_map(jnp.zeros_like, vel)

    def loss_fn(forcing, vel, p):
        def body(carry, _):
            vel, p, g1, g2 = carry
            o = piso_step(vel, p, dt, domain, sim, dirichlet_values=dv,
                          forcing_term=forcing,
                          pressure_inc1_guess=g1, pressure_inc2_guess=g2,
                          advection_tol=TOL, pressure_tol=TOL)
            return (o.velocity, o.pressure, o.pressure_inc1,
                    o.pressure_inc2), o.warn

        (v, pp, _, _), warns = jax.lax.scan(
            body, (vel, p, jnp.zeros_like(p), jnp.zeros_like(p)), None,
            length=unroll)
        return sum(jnp.sum(c ** 2) for c in v.components), warns

    g_fn = jax.jit(jax.grad(loss_fn, has_aux=True))
    g, _ = g_fn(forcing0, vel, p)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(reps):
        g, _ = g_fn(forcing0, vel, p)
    jax.block_until_ready(g)
    return (time.perf_counter() - t0) / reps


gw10 = grad_wall(10)
gw30 = grad_wall(30)
grad_dev_ms = (gw30 - gw10) * 1000.0 / 20.0
print(f"grad device {grad_dev_ms:.3f} ms/unrolled-step (fwd+bwd); "
      f"fwd-only full step {ms_step:.3f} -> bwd-only ~"
      f"{grad_dev_ms - ms_step:.3f} ms", flush=True)
