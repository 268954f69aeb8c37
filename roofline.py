"""Launch-count roofline for one PISO step (VERDICT r2 item 3).

Answers, with numbers: how many kernel launches does one PISO step cost
(forward and per unrolled-gradient step), what the per-launch overhead
actually is on this runtime (measured, not assumed), how the step time
splits into launch overhead vs bandwidth/compute, and therefore how much
headroom the single-chip number has left.

Method (three independent measurements that must agree):
  * STATIC LAUNCH COUNT from the compiled optimized HLO: every
    instruction of an executed computation that lowers to its own TPU
    kernel/thunk counts 1; while-loop bodies count per iteration
    (iteration counts measured at runtime); lax.cond counts the heavier
    branch; lax.scan trip counts multiply nested loops.
  * PER-LAUNCH COST CALIBRATION: a while loop over a chain of k trivial
    dependent kernels on tiny tensors (pure overhead, ~zero bytes/flops),
    two chain lengths -> slope = us per kernel inside a compiled loop.
    (The ~30 us figure in CLAUDE.md is the PER-JIT-CALL dispatch cost
    through the tunnel — visible in the single-call timing below — NOT
    the in-loop per-kernel cost, which this measures.)
  * SIZE SWEEP: per-step time (inside a 50-step lax.scan, the headline
    protocol) at n = 128..1024. The grid-size-independent intercept of
    t(n) = a + b*n^2 is the launch-bound component; b*n^2 is
    bandwidth/compute (v5e HBM ~819 GB/s floor printed alongside).

Writes a `roofline` section into BENCH_DETAIL.json and prints tables to
stderr. Run on the TPU: `python roofline.py` (~minutes; uses the shared
compile cache).

Reference anchor: the fused CUDA CG loop (pressure_solve_op.cu.cc:291-356)
runs ~0 launches per iteration on-GPU; the TPU equivalent of that bar is
the fused pallas iteration (solvers/pallas_krylov.py).
"""

import json
import re
import sys
import time

import numpy as np

# opcodes that execute as their own kernel/thunk on the TPU runtime.
# parameter/constant/tuple plumbing is free; fusions and custom-calls are
# the launches. while/conditional are control thunks whose bodies execute.
_LAUNCH_OPS = (
    "fusion",
    "custom-call",
    "copy",
    "copy-start",
    "all-reduce",
    "all-gather",
    "collective-permute",
    "reduce-scatter",
    "fft",
    "sort",
    "dot",
    "convolution",
    "dynamic-slice",
    "dynamic-update-slice",
    "slice",
    "concatenate",
    "reduce",
    "broadcast",
    "transpose",
    "reshape",
    "iota",
    "pad",
    "select",
    "add",
    "multiply",
    "subtract",
    "divide",
)


# HLO opcode vocabulary (subset; enough to identify the opcode token that
# follows the result type on an instruction line — type strings / metadata
# like `f32[`, `T(8,128)`, `op_name="jit(...)"` never collide because the
# match requires a known lowercase opcode immediately before '(')
_OPCODES = set(
    """abs add after-all all-gather all-reduce all-to-all and atan2 batch-norm-grad
    bitcast bitcast-convert broadcast call ceil cholesky clamp clz collective-permute
    compare complex concatenate conditional constant convert convolution copy
    copy-done copy-start cosine custom-call divide domain dot dynamic-slice
    dynamic-update-slice exponential exponential-minus-one fft floor fusion gather
    get-dimension-size get-tuple-element imag infeed iota is-finite log log-plus-one
    logistic map maximum minimum multiply negate not opt-barrier or outfeed pad
    parameter partition-id popcnt power real recv recv-done reduce reduce-precision
    reduce-scatter reduce-window remainder replica-id reshape reverse rng
    rng-bit-generator rng-get-and-update-state round-nearest-afz
    round-nearest-even rsqrt scatter select select-and-scatter send send-done
    set-dimension-size shift-left shift-right-arithmetic shift-right-logical sign
    sine slice sort sqrt cbrt subtract tan tanh transpose triangular-solve tuple
    while xor""".split()
)


def _opcode_of(line):
    for m in re.finditer(r"([a-z][a-z0-9\-]*)\(", line):
        if m.group(1) in _OPCODES:
            return m.group(1)
    return None


def parse_hlo(text):
    """Split optimized HLO text into computations.

    Returns dict name -> {"ops": [opcodes...], "calls": [(opcode, kinds)]}
    where kinds maps 'condition'/'body'/'branches'/'to_apply' -> [names].
    """
    comps = {}
    cur = None
    for line in text.splitlines():
        stripped = line.strip()
        if stripped.endswith("{") and "->" in stripped and " = " not in stripped:
            m = re.match(r"(?:ENTRY\s+)?%?([\w\.\-]+)\s*\(", stripped)
            if m:
                cur = m.group(1)
                comps[cur] = {"ops": [], "calls": []}
                continue
        if stripped == "}":
            cur = None
            continue
        if cur is None or " = " not in line:
            continue
        op = _opcode_of(line)
        if op is None:
            continue
        kinds = {}
        for attr, key in (
            ("condition", "condition"),
            ("body", "body"),
            ("branch_computations", "branches"),
            ("to_apply", "to_apply"),
            ("called_computations", "to_apply"),
        ):
            for mm in re.finditer(
                attr + r"=\{?%?([\w\.\-]+(?:,\s*%?[\w\.\-]+)*)\}?", line
            ):
                kinds.setdefault(key, []).extend(
                    x.strip().lstrip("%") for x in mm.group(1).split(",")
                )
        # metadata source hint (maps while loops back to solver call sites)
        src = re.search(r'source_file="([^"]+)" source_line=(\d+)', line)
        comps[cur]["ops"].append(op)
        if kinds or op in ("while", "conditional"):
            kinds["src"] = f"{src.group(1).split('/')[-1]}:{src.group(2)}" if src else ""
            comps[cur]["calls"].append((op, kinds))
    return comps


def analyze(comps, entry, _depth=0):
    """Walk computation `entry`: returns (fixed_launches, loops).

    fixed_launches — launches at this level outside any while loop
    (conditionals contribute their heavier branch: an upper bound for the
    taken path). loops — a TREE of while loops: each entry
    {src, per_iter, children} where per_iter counts the launches of one
    iteration of the loop body+condition EXCLUDING nested loops (those are
    the children, to be multiplied by their own trip counts)."""
    info = comps.get(entry)
    if info is None or _depth > 16:
        return 0.0, []
    fixed = 0.0
    loops = []
    for op in info["ops"]:
        if op in ("while", "conditional", "call", "parameter", "constant",
                  "tuple", "get-tuple-element", "bitcast", "after-all"):
            continue
        if op in _LAUNCH_OPS:
            fixed += 1
    for op, kinds in info["calls"]:
        if op == "while":
            body = kinds.get("body", [None])[0]
            cond = kinds.get("condition", [None])[0]
            per, children = 0.0, []
            if body:
                per, children = analyze(comps, body, _depth + 1)
            if cond:
                c, cl = analyze(comps, cond, _depth + 1)
                per += c
                children += cl
            loops.append(
                {"src": kinds.get("src", ""), "per_iter": per + 1,
                 "children": children}
            )  # +1: the loop-condition evaluation/branch thunk
            fixed += 2  # loop entry/exit
        elif op == "conditional":
            branches = [
                analyze(comps, nm, _depth + 1) for nm in kinds.get("branches", [])
            ]
            if branches:
                heavier = max(branches, key=lambda t: t[0])
                fixed += heavier[0]
                loops += heavier[1]
        # fusion/custom-call to_apply bodies are fused code, not launches
    return fixed, loops


def _assign_iters(loops, p_iters, mom_iters, adj_factor=None, scan_trips=1.0):
    """Assign measured iteration counts to the while-loop tree by source.

    krylov.py loops are Krylov iterations: bicgstab bodies get mom_iters,
    cg/pcg bodies get the measured pressure counts in order of appearance
    (corrector 1, corrector 2, then — in a grad module — adjoint solves at
    the given cold-start count). Non-krylov loops are lax.scan trip loops
    and get `scan_trips`. Nested loops multiply by every enclosing trip
    count. Returns (total_loop_launches, display rows)."""
    import inspect

    from diffpiso_tpu.core import piso as piso_mod
    from diffpiso_tpu.solvers import krylov

    def _range_of(fn):
        lines, start = inspect.getsourcelines(fn)
        return range(start, start + len(lines))

    bicg_range = _range_of(krylov.bicgstab)

    def _piso_call_kind(line):
        """Classify a while loop whose metadata points at a piso.py line:
        look at the surrounding source for the solver call it came from."""
        src_lines, start = inspect.getsourcelines(piso_mod)
        lo = max(0, line - start - 3)
        hi = min(len(src_lines), line - start + 3)
        window = "".join(src_lines[lo:hi])
        if "solve_advection_system" in window:
            return "momentum"
        if "solve_pressure_system" in window:
            return "pressure"
        return None

    state = {"pressure_seen": 0}
    rows = []

    def iters_of(lp):
        src = lp["src"]
        kind = None
        if "krylov.py" in src:
            line = int(src.split(":")[1])
            kind = "momentum" if line in bicg_range else "pressure"
        elif "piso.py" in src:
            kind = _piso_call_kind(int(src.split(":")[1]))
        elif "base.py" in src:
            kind = "pressure"  # solver wrappers
        if kind == "momentum":
            return mom_iters, "momentum bicgstab"
        if kind == "pressure":
            i = state["pressure_seen"]
            state["pressure_seen"] += 1
            if i < len(p_iters):
                return float(p_iters[i]), f"pressure pcg corrector {i + 1}"
            a = adj_factor if adj_factor is not None else float(np.max(p_iters))
            return a, "adjoint pressure pcg (cold-start assumption)"
        return scan_trips, "scan trip loop"

    def walk(lp, outer_mult):
        iters, kind = iters_of(lp)
        mult = outer_mult * iters
        total = mult * lp["per_iter"]
        rows.append(
            {"src": lp["src"], "kind": kind,
             "launches_per_iter": lp["per_iter"], "iters": round(iters, 3),
             "effective_launches": round(total, 1)}
        )
        for ch in lp["children"]:
            total += walk(ch, mult)
        return total

    total = sum(walk(lp, 1.0) for lp in loops)
    return total, rows


def measure(step_fn, args, reps=3):
    import jax

    out = step_fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step_fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def momentum_iterations(domain, sim, vel, p, dt, tol):
    """Measured BiCGSTAB iteration count for the predictor solve on the
    developed state (replicates the piso_step predictor block)."""
    import math as _math

    import jax
    import jax.numpy as jnp

    from diffpiso_tpu.ops.fv import fv_gradient
    from diffpiso_tpu.ops.stencil import assemble_advection_stencil
    from diffpiso_tpu.solvers.base import _adv_solve_impl

    dx = domain.dx
    beta = _math.prod(dx) / dt

    @jax.jit
    def run(vel, p):
        stencil = assemble_advection_stencil(
            vel, dx, domain.velocity_pad_modes(), sim.viscosity, beta,
            sim.dirichlet_mask, sim.active_mask, sim.accessible_mask,
            sim.no_slip_mask, sim.bool_periodic,
        )
        p_grad = fv_gradient(p, dx, domain.pressure_pad_modes(), sim.accessible_mask)
        rhs = vel * beta - p_grad
        x, result = _adv_solve_impl(
            sim.linear_solver, stencil, rhs, vel, tol, transpose=False
        )
        return result.iterations

    return float(run(vel, p))


def launch_report(compiled_text, p_iters, mom_iters, adj_factor=None,
                  scan_trips=1.0):
    comps = parse_hlo(compiled_text)
    entry = next((nm for nm in comps if nm.startswith("main")), list(comps)[0])
    fixed, loops = analyze(comps, entry)
    loop_total, rows = _assign_iters(
        loops, p_iters, mom_iters, adj_factor, scan_trips
    )
    return fixed, loop_total, rows


def calibrate_per_launch_cost(plane=(512, 512), K=400):
    """Measured marginal per-kernel cost inside a compiled while loop at a
    REALISTIC plane size: chains of k dependent elementwise kernels
    (optimization_barrier pins kernel boundaries; kernels counted from the
    compiled HLO), two chain lengths, slope = s/kernel — this includes the
    kernel's own HBM traffic (2 x plane bytes at ~819 GB/s) plus the fixed
    per-kernel pipeline overhead, which is the quantity the step model
    needs. NB on tiny (8,128) tensors the TPU sequencer runs ops at ~30 ns
    each — per-op dispatch is NOT a GPU-style launch; the overhead scales
    with the memory pipeline, hence calibrating at the working size.
    Honest microbenchmark per CLAUDE.md: the chain is data-dependent so
    XLA cannot hoist it."""
    import jax
    import jax.numpy as jnp

    def make(m):
        @jax.jit
        def run(x):
            def body(c):
                x, i = c
                for _ in range(m):
                    # optimization_barrier pins a kernel boundary — without
                    # it XLA fuses the whole chain into ONE kernel and both
                    # chain lengths count identically
                    x = jax.lax.optimization_barrier(jnp.tanh(x) + 1e-6 * i)
                return (x, i + 1)

            return jax.lax.while_loop(lambda c: c[1] < K, body, (x, 0.0))[0]

        return run

    x = jnp.ones(plane, jnp.float32)
    results = {}
    for m in (4, 16):
        run = make(m)
        comp = run.lower(x).compile()
        comps = parse_hlo(comp.as_text())
        entry = next((nm for nm in comps if nm.startswith("main")), None)
        _, loops = analyze(comps, entry)
        kernels_per_iter = loops[0]["per_iter"] if loops else m
        out = run(x)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(5):  # min over repeats: tunnel timing jitter
            t0 = time.perf_counter()
            out = run(x)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        results[m] = (kernels_per_iter, best / K)
    (k1, t1), (k2, t2) = results[4], results[16]
    per_launch = (t2 - t1) / (k2 - k1)
    return per_launch, results


def main():
    import os

    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get(
        "DIFFPISO_JAX_CACHE", os.path.expanduser("~/.cache/diffpiso_jax_cache")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench

    n = int(os.environ.get("ROOFLINE_N", "512"))
    unroll = int(os.environ.get("ROOFLINE_UNROLL", "30"))

    # ---- per-launch cost calibration ----
    per_launch, calib = calibrate_per_launch_cost()
    print(f"[roofline] calibrated in-loop per-kernel cost: "
          f"{per_launch*1e6:.2f} us (chains: {calib})", file=sys.stderr)

    # ---- size sweep on DEVICE time: two chunk lengths per size separate
    # the ~25-30 ms per-JIT-CALL tunnel overhead (r3 trace: the device
    # executes the scan with ZERO idle; everything above device time is
    # per-call) from the true per-step device time:
    #   wall(c) = overhead + c * device  =>  device = (wall(c2)-wall(c1))/(c2-c1)
    sweep, overheads = {}, {}
    c1, c2 = 100, 400
    for ns in (128, 256, 512, 1024):
        domain_s, sim_s, step_s, init_s = bench.build_turbulence(
            ns, 1e-6, p_tol=1e-8
        )
        v_s, p_s = init_s(seed=0)
        run_spin = bench._make_runner(step_s, c1)
        v_s, p_s, it_s, _ = run_spin(v_s, p_s)
        jax.block_until_ready(p_s)
        walls = {}
        for c in (c1, c2):
            run_s = bench._make_runner(step_s, c)
            _, pp, it_s, _ = run_s(v_s, p_s)
            jax.block_until_ready(pp)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _, pp, it_s, _ = run_s(v_s, p_s)
                jax.block_until_ready(pp)
                best = min(best, time.perf_counter() - t0)
            walls[c] = best
        device = (walls[c2] - walls[c1]) / (c2 - c1)
        sweep[ns] = device
        overheads[ns] = walls[c1] - c1 * device
        print(f"[roofline] sweep n={ns}: device {device*1e3:.4f} ms/step, "
              f"per-call overhead {overheads[ns]*1e3:.1f} ms "
              f"(iters {np.asarray(it_s).mean(0)})", file=sys.stderr)
    # least-squares fit a + b*n^2 over the DEVICE times
    xs = np.array([ns * ns for ns in sweep], float)
    ys = np.array([sweep[ns] for ns in sweep], float)
    A = np.stack([np.ones_like(xs), xs], 1)
    (a_fit, b_fit), *_ = np.linalg.lstsq(A, ys, rcond=None)

    domain, sim, step, initial_state = bench.build_turbulence(n, 1e-6, p_tol=1e-8)
    vel, p = initial_state(seed=0)
    dt = 0.4 / n

    @jax.jit
    def one_step(vel, p, g1, g2):
        out = step(vel, p, g1, g2, None)
        return (out.velocity, out.pressure, out.pressure_inc1,
                out.pressure_inc2, out.p_iterations, out.warn)

    run = bench._make_runner(step, 50)
    for _ in range(2):
        vel, p, iters, warns = run(vel, p)
    jax.block_until_ready(p)
    _, _, iters50, _ = run(vel, p)
    p_iters = np.asarray(iters50).mean(0)
    mom_iters = momentum_iterations(domain, sim, vel, p, dt, 1e-6)
    print(f"[roofline] developed iters/step: pressure {p_iters}, "
          f"momentum bicgstab {mom_iters}", file=sys.stderr)

    # warm-regime single step (guesses from the previous step, like the
    # scan carries) vs the scan-amortized per-step time
    out_prev = one_step(vel, p, jnp.zeros_like(p), jnp.zeros_like(p))
    g1w, g2w = out_prev[2], out_prev[3]
    vel_w, p_w = out_prev[0], out_prev[1]
    single_call = measure(one_step, (vel_w, p_w, g1w, g2w))
    step_time = sweep.get(n) or single_call

    # ---- static launch count (forward step) ----
    compiled = jax.jit(
        lambda v, pp, a, b: one_step(v, pp, a, b)
    ).lower(vel, p, g1w, g2w).compile()
    fixed, loop_total, rows = launch_report(compiled.as_text(), p_iters, mom_iters)
    launches = fixed + loop_total

    # HBM floor: per Krylov iteration the fused kernels read 5 stencil
    # planes + 2-3 vectors and write 1-2 (solvers/pallas_krylov.py); fixed
    # part reads/writes state + stencil assembly (~20 planes). v5e ~819 GB/s.
    plane = n * n * 4
    iters_total = float(np.sum(p_iters)) + mom_iters * 2
    bytes_floor = plane * (20 + 8 * iters_total)
    BW = 819e9
    # ---- arithmetic intensity / MFU (VERDICT r4 item 8) ----
    # Analytic FLOPs/step, mirroring the bytes model. Dominant exact term:
    # the matmul-eigenbasis preconditioner — per apply, 4 dense
    # contractions of 2*n0*n1*(n0+n1) flops at Precision.HIGH = 3 bf16
    # MXU passes each. Stencil matvecs ~11 flops/cell/iteration; the
    # assembly/FV/corrector glue is an ~200 flops/cell-order ESTIMATE
    # (elementwise chains, VPU-bound — their cost is bandwidth, not
    # flops, so the estimate barely moves the total).
    p_applies = float(np.sum(p_iters)) + 2.0  # + the two entry z0 applies
    mm_flops = p_applies * 3 * 4 * 2 * n * n * (n + n)
    stencil_flops = iters_total * 11 * n * n
    glue_flops = 200 * n * n
    flops_step = mm_flops + stencil_flops + glue_flops
    V5E_BF16_PEAK = 197e12
    # the size sweep separates the step into a grid-INDEPENDENT component
    # (the fit intercept: per-kernel pipeline setup, scalar/SMEM work, loop
    # control — the launch-bound part) and a grid-dependent component
    # (b*n^2: HBM round trips between unfused kernels + compute). The
    # implied fixed cost per kernel = intercept / static kernel count.
    implied_fixed_per_kernel = a_fit / max(launches, 1.0)
    grid_dependent_ms = (step_time - a_fit) * 1e3

    fwd = {
        "grid": f"{n}^2 turb (developed, tol 1e-6/1e-8)",
        "device_ms_per_step": round(sweep.get(n, step_time) * 1e3, 4),
        "per_jit_call_overhead_ms": round(overheads.get(n, 0.0) * 1e3, 2),
        "single_dispatched_call_ms": round(single_call * 1e3, 4),
        "launches_fixed": round(fixed, 1),
        "launches_in_loops": round(loop_total, 1),
        "launches_total": round(launches, 1),
        "device_intercept_ms": round(a_fit * 1e3, 4),
        "implied_fixed_us_per_kernel": round(implied_fixed_per_kernel * 1e6, 2),
        "hbm_floor_ms_at_819GBs": round(bytes_floor / BW * 1e3, 4),
        "flops_per_step": round(flops_step / 1e9, 3),
        "flops_unit": "GFLOP (analytic: MXU preconditioner contractions "
                      "exact incl. 3x HIGH passes; stencil 11/cell/iter; "
                      "glue ~200/cell estimate)",
        "achieved_tflops": round(
            flops_step / max(sweep.get(n, step_time), 1e-9) / 1e12, 2),
        "pct_of_v5e_bf16_peak": round(
            100 * flops_step / max(sweep.get(n, step_time), 1e-9)
            / V5E_BF16_PEAK, 2),
        "mxu_compute_floor_ms": round(mm_flops / V5E_BF16_PEAK * 1e3, 4),
        "vmem_resident_loop_marginal_ns_per_kernel": round(per_launch * 1e9, 1),
        "device_sweep_ms_per_step": {
            str(k): round(v * 1e3, 4) for k, v in sweep.items()
        },
        "fit_bandwidth_ms_at_512sq": round(b_fit * 512 * 512 * 1e3, 4),
        "pressure_iters": [round(float(x), 3) for x in p_iters],
        "momentum_iters": round(mom_iters, 2),
        "headroom_note": (
            "wall time = device time + ~25-30 ms per jit call (tunnel): "
            "amortize with long scan chunks. Device time splits into a "
            "size-independent intercept (per-kernel fixed cost x ~558 "
            "kernels) + bandwidth/compute bounded below by the HBM floor; "
            "kernel-count reduction attacks the intercept"
        ),
        "loops": rows,
    }
    print("[roofline] FORWARD:", json.dumps(
        {k: v for k, v in fwd.items() if k != "loops"}, indent=1), file=sys.stderr)
    for r in rows:
        print(f"  loop {r['kind']:36s} {r['launches_per_iter']:5.0f} launches/iter"
              f" x {r['iters']:7.2f} iters  ({r['src']})", file=sys.stderr)

    # ---- grad step (unrolled) ----
    forcing0 = jax.tree_util.tree_map(jnp.zeros_like, vel)

    def loss_fn(forcing, vel, p):
        def body(carry, _):
            vel, p, a, b = carry
            out = step(vel, p, a, b, forcing)
            return (out.velocity, out.pressure, out.pressure_inc1,
                    out.pressure_inc2), out.p_iterations

        (vel, p, _, _), iters = jax.lax.scan(
            body, (vel, p, jnp.zeros_like(p), jnp.zeros_like(p)), None,
            length=unroll,
        )
        return sum(jnp.sum(c**2) for c in vel.components), iters

    grad_fn = jax.jit(jax.grad(loss_fn, has_aux=True))
    gcomp = grad_fn.lower(forcing0, vel, p).compile()
    g, giters = grad_fn(forcing0, vel, p)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(2):
        g, giters = grad_fn(forcing0, vel, p)
        jax.block_until_ready(g)
    grad_time = (time.perf_counter() - t0) / 2
    gp_iters = np.asarray(giters).mean(0)
    # the grad module has fwd scan + bwd scan: pressure loops appear as
    # [fwd c1, fwd c2, adjoint...] — adjoint solves are cold, assume the
    # cold-start count ~ first-step count of the fwd (labeled assumption)
    adj_cold = float(np.asarray(giters).max())
    gfixed, gloop_total, grows = launch_report(
        gcomp.as_text(), gp_iters, mom_iters, adj_factor=adj_cold,
        scan_trips=float(unroll),
    )
    glaunches = gfixed + gloop_total
    glaunch_s = glaunches * implied_fixed_per_kernel
    grad_step = {
        "grid": f"{n}^2 turb grad{unroll}",
        "measured_grad_time_ms": round(grad_time * 1e3, 3),
        "measured_ms_per_unrolled_step": round(grad_time / unroll * 1e3, 4),
        "launches_total": round(glaunches, 1),
        "launches_per_unrolled_step": round(glaunches / unroll, 1),
        "launchbound_model_ms": round(glaunch_s * 1e3, 3),
        "launchbound_fraction_of_measured": round(glaunch_s / grad_time, 3),
        "fwd_pressure_iters": [round(float(x), 3) for x in gp_iters],
        "adjoint_cold_iters_assumed": round(adj_cold, 2),
        "loops": grows,
    }
    print("[roofline] GRAD:", json.dumps(
        {k: v for k, v in grad_step.items() if k != "loops"}, indent=1),
        file=sys.stderr)
    for r in grows:
        print(f"  loop {r['kind']:36s} {r['launches_per_iter']:5.0f} launches/iter"
              f" x {r['iters']:7.2f} iters  ({r['src']})", file=sys.stderr)

    detail = {}
    if os.path.exists("BENCH_DETAIL.json"):
        with open("BENCH_DETAIL.json") as f:
            detail = json.load(f)
    detail.setdefault("roofline", {})
    detail["roofline"][f"turb_{n}sq_fwd"] = {
        k: v for k, v in fwd.items()
    }
    detail["roofline"][f"turb_{n}sq_grad{unroll}"] = {
        k: v for k, v in grad_step.items()
    }
    with open("BENCH_DETAIL.json", "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps({
        "metric": "roofline_launches_per_fwd_step", "value": round(launches, 1),
        "unit": "launches", "device_ms_per_step": fwd["device_ms_per_step"],
        "per_jit_call_overhead_ms": fwd["per_jit_call_overhead_ms"],
    }))


if __name__ == "__main__":
    main()
