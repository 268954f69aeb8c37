"""Matrix-free Krylov solvers (BiCGSTAB, CG) over JAX pytrees.

TPU-native replacements for the reference's cuSPARSE/cuBLAS solver ops:

  bicgstab <- MultiBicgstabIluLinearSolve
              (CUDAsrc/multi_bicgstab_ilu_linear_solve_op.cu.cc:144-512)
  cg       <- PressureSolveOp's CG loop
              (CUDAsrc/pressure_solve_op.cu.cc:140-418)

Design decisions (idiomatic TPU, not a port):

* Operators are closures applying 5-point stencils — no sparse formats; all
  reductions are jnp sums, which XLA turns into on-chip tree reductions (and
  into `psum` collectives under shard_map).
* The reference solves the u/v systems concurrently on two CUDA streams
  (cu.cc:493-512). Here both components live in one pytree and one Krylov
  loop iterates on the joint block-diagonal system until the *joint*
  residual converges — bigger fused tensor ops instead of stream
  parallelism; identical fixed point.
* ILU(0) preconditioning is replaced by Jacobi (inverse diagonal): the
  implicit system is strongly diagonally dominant (diagonal carries
  -beta = -prod(dx)/dt), so triangular solves — hostile to TPU — buy little.
* Iteration is a `lax.while_loop` with a static `max_iter` bound; the
  convergence test is the max-norm check the reference's CG performs
  (pressure_solve_op.cu.cc:95-101) evaluated every iteration (no H<->D
  copies to amortize under jit).
* Failure semantics preserved: a non-finite or >100*tol final residual
  triggers one restart from zeros (multi_..._op.cu.cc:392-408), and the
  `warn` flag is returned for gradient gating (linear_solver.py:173).
"""

from __future__ import annotations

import os
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class SolveResult(NamedTuple):
    x: Any  # pytree matching b
    iterations: jax.Array  # int32 scalar
    residual_norm: jax.Array  # max-norm of final residual
    converged: jax.Array  # bool scalar
    warn: jax.Array  # bool scalar: solve failed / do not trust gradients


# -- pytree linear algebra -------------------------------------------------------


def tree_vdot(a, b):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return sum(jnp.sum(x * y) for x, y in zip(leaves_a, leaves_b))


def _tree_max_abs(a):
    return jnp.max(jnp.stack([jnp.max(jnp.abs(l)) for l in jax.tree_util.tree_leaves(a)]))


def _axpy(alpha, x, y):
    return jax.tree_util.tree_map(lambda xi, yi: alpha * xi + yi, x, y)


def _scale(alpha, x):
    return jax.tree_util.tree_map(lambda xi: alpha * xi, x)


def _add(x, y):
    return jax.tree_util.tree_map(jnp.add, x, y)


def _sub(x, y):
    return jax.tree_util.tree_map(jnp.subtract, x, y)


def _zeros_like(x):
    return jax.tree_util.tree_map(jnp.zeros_like, x)


# -- BiCGSTAB -----------------------------------------------------------------


def _bicgstab_once(apply_A, precond, b, x0, tol, max_iter, residual_fn=None):
    eps = jnp.asarray(1e-30, jax.tree_util.tree_leaves(b)[0].dtype)

    def resid(x):
        # residual_fn fuses matvec+subtract+max into one kernel per
        # component (fused_stencil_residual) — the warm-start entry and the
        # true-residual verification are the hot path of every warm solve
        if residual_fn is not None:
            return residual_fn(b, x)
        r = _sub(b, apply_A(x))
        return r, _tree_max_abs(r)

    r0, rnorm0 = resid(x0)
    rhat = r0

    def cond(state):
        _, r, *_rest, k, done = state
        return (~done) & (k < max_iter)

    def body(state):
        x, r, p, v, rho, alpha, omega, k, done = state
        rho_new = tree_vdot(rhat, r)
        breakdown = jnp.abs(rho_new) < eps
        beta = (rho_new / jnp.where(breakdown, 1.0, rho)) * (
            alpha / jnp.where(jnp.abs(omega) < eps, 1.0, omega)
        )
        p = _axpy(beta, _axpy(-omega, v, p), r)
        phat = precond(p)
        v = apply_A(phat)
        denom = tree_vdot(rhat, v)
        alpha = rho_new / jnp.where(jnp.abs(denom) < eps, 1.0, denom)
        s = _axpy(-alpha, v, r)
        shat = precond(s)
        t = apply_A(shat)
        tt = tree_vdot(t, t)
        omega = tree_vdot(t, s) / jnp.where(jnp.abs(tt) < eps, 1.0, tt)
        x = _axpy(alpha, phat, _axpy(omega, shat, x))
        r = _axpy(-omega, t, s)
        rnorm = _tree_max_abs(r)
        done = (rnorm < tol) | breakdown | ~jnp.isfinite(rnorm)
        return (x, r, p, v, rho_new, alpha, omega, k + 1, done)

    one = jnp.ones((), jax.tree_util.tree_leaves(b)[0].dtype)

    def run_solve(_):
        init = (
            x0, r0, _zeros_like(b), _zeros_like(b), one, one, one,
            jnp.zeros((), jnp.int32), jnp.zeros((), bool),
        )
        x, r, *_rest, k, _done = jax.lax.while_loop(cond, body, init)
        # true residual (the recurrence residual can drift)
        _r_true, rt_norm = resid(x)
        return x, rt_norm, k

    def skip_solve(_):
        # the warm start already satisfies the tolerance (r0 is exact):
        # skip loop + verification (PISO predictors on near-steady flow hit
        # this often — same early-exit rationale as pcg)
        return x0, rnorm0, jnp.zeros((), jnp.int32)

    return jax.lax.cond(rnorm0 < tol, skip_solve, run_solve, None)


def _bicgstab_once_fused(stencil, inv_diag, b, x0, tol, max_iter, resid,
                         negate, transpose):
    """The BiCGSTAB loop with the 3-launch-per-component fused phase
    kernels (solvers/pallas_krylov.py fused_bicg_phase_*): identical
    recurrence and guards to _bicgstab_once; rhat.r for the NEXT iteration
    is emitted by the x-phase so each iteration costs exactly 3 launches
    per velocity component plus scalar glue."""
    from diffpiso_tpu.solvers.pallas_krylov import (
        fused_bicg_phase_p,
        fused_bicg_phase_s,
        fused_bicg_phase_x,
    )

    dtype = jax.tree_util.tree_leaves(b)[0].dtype
    eps = jnp.asarray(1e-30, dtype)
    sgn = -1.0 if negate else 1.0
    ncomp = len(stencil.center)
    st_cs = [
        (stencil.center[i], stencil.lo[i], stencil.hi[i]) for i in range(ncomp)
    ]
    invd = tuple(inv_diag.components)

    r0, rnorm0 = resid(x0)
    rhat = tuple(r0.components)
    rho0 = sum(jnp.sum(rh * rh) for rh in rhat)

    def guard(v):
        return jnp.where(jnp.abs(v) < eps, 1.0, v)

    def cond(state):
        return (~state[-1]) & (state[-2] < max_iter)

    def body(state):
        x_c, r_c, p_c, v_c, rho, rho_new, alpha, omega, k, done = state
        breakdown = jnp.abs(rho_new) < eps
        beta = (rho_new / jnp.where(breakdown, 1.0, rho)) * (alpha / guard(omega))
        outs = [
            fused_bicg_phase_p(st_cs[c], invd[c], r_c[c], p_c[c], v_c[c],
                               rhat[c], beta, omega, sgn, transpose)
            for c in range(ncomp)
        ]
        pn_c = tuple(o[0] for o in outs)
        vn_c = tuple(o[1] for o in outs)
        denom = sum(o[2] for o in outs)
        alpha_n = rho_new / guard(denom)
        outs = [
            fused_bicg_phase_s(st_cs[c], invd[c], r_c[c], vn_c[c], alpha_n,
                               sgn, transpose)
            for c in range(ncomp)
        ]
        s_c = tuple(o[0] for o in outs)
        t_c = tuple(o[1] for o in outs)
        tt = sum(o[2] for o in outs)
        ts = sum(o[3] for o in outs)
        omega_n = ts / guard(tt)
        outs = [
            fused_bicg_phase_x(invd[c], pn_c[c], s_c[c], t_c[c], x_c[c],
                               rhat[c], alpha_n, omega_n)
            for c in range(ncomp)
        ]
        xn_c = tuple(o[0] for o in outs)
        rn_c = tuple(o[1] for o in outs)
        rnorm = outs[0][2]
        for o in outs[1:]:
            rnorm = jnp.maximum(rnorm, o[2])
        rho_next = sum(o[3] for o in outs)
        done = (rnorm < tol) | breakdown | ~jnp.isfinite(rnorm)
        return (xn_c, rn_c, pn_c, vn_c, rho_new, rho_next, alpha_n, omega_n,
                k + 1, done)

    one = jnp.ones((), dtype)
    zeros_c = tuple(jnp.zeros_like(c) for c in rhat)

    def run_solve(_):
        init = (
            tuple(x0.components), rhat, zeros_c, zeros_c, one, rho0, one, one,
            jnp.zeros((), jnp.int32), jnp.zeros((), bool),
        )
        x_c, *_rest, k, _done = jax.lax.while_loop(cond, body, init)
        xf = type(b)(tuple(x_c), periodic=b.periodic)
        _r_true, rt_norm = resid(xf)
        return xf, rt_norm, k

    def skip_solve(_):
        return x0, rnorm0, jnp.zeros((), jnp.int32)

    return jax.lax.cond(rnorm0 < tol, skip_solve, run_solve, None)


def bicgstab(
    apply_A: Callable,
    b,
    x0=None,
    *,
    tol=1e-6,
    max_iter: int = 1000,
    diag=None,
    residual_fn=None,
    stencil=None,
    negate: bool = False,
    transpose: bool = False,
) -> SolveResult:
    """Jacobi-preconditioned BiCGSTAB on a pytree system.

    diag — pytree of operator diagonals (for Jacobi preconditioning); None
    disables preconditioning. Restarts once from a zero guess if the final
    residual is non-finite or >100*tol (the reference's recovery policy,
    multi_bicgstab_ilu_linear_solve_op.cu.cc:392-408); warn is set when even
    the restart fails.

    stencil/negate/transpose — the advection stencil behind apply_A: when
    given (with diag) and every component fits the fused-kernel budget, the
    loop runs the 3-launch-per-component fused phases
    (pallas_krylov.fused_bicg_phase_*; ~10 kernels/component otherwise).
    """
    if x0 is None:
        x0 = _zeros_like(b)
    tol = jnp.asarray(tol, jax.tree_util.tree_leaves(b)[0].dtype)

    if diag is not None:
        inv_diag = jax.tree_util.tree_map(
            lambda d: jnp.where(jnp.abs(d) > 1e-30, 1.0 / d, 1.0), diag
        )
        precond = lambda v: jax.tree_util.tree_map(jnp.multiply, inv_diag, v)
    else:
        inv_diag = None
        precond = lambda v: v

    # DIFFPISO_FUSED_BICG: auto (default) | never | fwd-only (skip the
    # transposed adjoint solves — A/B hook for the backward path)
    mode = os.environ.get("DIFFPISO_FUSED_BICG", "auto")
    fused = False
    if (
        mode != "never"
        and not (mode == "fwd-only" and transpose)
        and stencil is not None
        and inv_diag is not None
        and hasattr(b, "components")
    ):
        from diffpiso_tpu.solvers.pallas_krylov import eligible

        fused = all(
            c.ndim == 2 and eligible(c.shape, c.dtype) for c in stencil.center
        )

    def resid(x):
        if residual_fn is not None:
            return residual_fn(b, x)
        r = _sub(b, apply_A(x))
        return r, _tree_max_abs(r)

    def once(x_init):
        if fused:
            return _bicgstab_once_fused(
                stencil, inv_diag, b, x_init, tol, max_iter, resid,
                negate, transpose,
            )
        return _bicgstab_once(apply_A, precond, b, x_init, tol, max_iter,
                              residual_fn)

    # Jacobi-Richardson accelerator (DIFFPISO_ADV_JACOBI: all|adjoint|never):
    # the advection system is diagonally dominant by beta = prod(dx)/dt, so
    # k VMEM-resident sweeps per launch (fused_jacobi_sweeps) usually reach
    # tol in ONE launch per component; the Krylov loop below then
    # short-circuits. If dominance fails (large dt), the sweeps stop at
    # max_launches and BiCGSTAB runs from wherever they got — identical
    # failure/warn semantics, sweeps never count as iterations.
    # Measured at the 512^2 headline (k-sweep A/B, within-process, reps=8):
    # 'all' (default, k=4): grad30 1024 vs 921 steps/s (+11%) at fwd 2625
    # vs 2705 (-3%) — under unrolled gradients the win is larger than the
    # adjoint solves alone explain (adjoint-only: grad30 955), because the
    # sweep's forward subgraph also stores far fewer per-step intermediates
    # for the backward scan than the 10-tuple BiCGSTAB while-carry.
    # Forward-heavy workloads (DNS production runs) can set 'adjoint'.
    jac_mode = os.environ.get("DIFFPISO_ADV_JACOBI", "all")
    jac_on = jac_mode == "all" or (jac_mode == "adjoint" and transpose)
    jac3d = False
    jac13d = False
    jac_zb = None
    jac2 = False
    jac1 = False
    if (
        jac_on
        and not fused
        and stencil is not None
        and inv_diag is not None
        and hasattr(b, "components")
    ):
        from diffpiso_tpu.solvers.pallas_krylov import (
            eligible_3d,
            jac13d_eligible,
            zblock_eligible,
        )

        # 3-D tiers: the single-program WHOLE-SOLVE per-component kernel
        # (128^3-class volumes fit VMEM outright) > the z-BLOCK-gridded
        # k-full-3-D-sweeps launch (256^3 class: live z-coupling within
        # bz-plane blocks, frozen only at block edges) > the per-plane
        # -frozen k-in-plane-sweeps launch (legacy fallback)
        jac13d = all(
            c.ndim == 3 and jac13d_eligible(c.shape, c.dtype)
            for c in stencil.center
        )
        jac_zb = None
        if not jac13d and all(c.ndim == 3 for c in stencil.center):
            zbs = [zblock_eligible(c.shape, c.dtype) for c in stencil.center]
            if all(zbs):
                jac_zb = zbs
        jac3d = not jac13d and jac_zb is None and all(
            c.ndim == 3 and eligible_3d(c.shape, c.dtype)
            for c in stencil.center
        )
    if (
        jac_on
        and not jac3d
        and jac_zb is None
        and stencil is not None
        and inv_diag is not None
        and hasattr(b, "components")
    ):
        from diffpiso_tpu.solvers.pallas_krylov import (
            jac1_eligible,
            jac2_eligible,
        )

        # whole-solve single-launch momentum kernel (covers both the fused
        # 512^2 class AND larger 2-D shapes where the 12-plane fused-BiCGSTAB
        # budget is exceeded but the 26-plane jac2 ceiling is not); when the
        # JOINT kernel is over budget, per-component whole-solve launches
        # (jac1: 1024^2/dns-class) are the fallback tier
        comps = list(stencil.center)
        if all(c.ndim == 2 for c in comps):
            jac2 = jac2_eligible(tuple(c.shape for c in comps),
                                 comps[0].dtype)
            jac1 = not jac2 and all(
                jac1_eligible(c.shape, c.dtype) for c in comps
            )
    if (fused or jac3d or jac13d or jac_zb or jac2 or jac1) and jac_on:
        from diffpiso_tpu.solvers.pallas_krylov import (
            fused_jacobi1_solve,
            fused_jacobi1_solve_3d,
            fused_jacobi2_solve,
            fused_jacobi_sweep_3d,
            fused_jacobi_sweeps,
            fused_jacobi_zblock_3d,
        )

        sgn = -1.0 if negate else 1.0
        ncomp = len(stencil.center)
        st_cs = [
            (stencil.center[i], stencil.lo[i], stencil.hi[i])
            for i in range(ncomp)
        ]
        b_c = tuple(b.components)
        sweeps_per_launch = int(os.environ.get("DIFFPISO_ADV_JACOBI_K", "4"))
        # 3-D launches chain k PLANE-BLOCK sweeps (z-coupling frozen at the
        # input iterate, k in-plane sweeps in VMEM) — same launch budget as
        # the 2-D path
        max_launches = 8

        def jcond(state):
            _, n, j = state
            return (n > tol) & (j < max_launches)

        def jbody(state):
            x_c, _, j = state
            if jac_zb is not None:
                outs = [
                    fused_jacobi_zblock_3d(
                        st_cs[ci], b_c[ci], x_c[ci], sgn, transpose, tol,
                        sweeps_per_launch, jac_zb[ci],
                    )
                    for ci in range(ncomp)
                ]
            elif jac3d:
                outs = [
                    fused_jacobi_sweep_3d(
                        st_cs[ci], b_c[ci], x_c[ci], sgn, transpose,
                        k=sweeps_per_launch,
                    )
                    for ci in range(ncomp)
                ]
            else:
                outs = [
                    fused_jacobi_sweeps(
                        st_cs[ci], b_c[ci], x_c[ci],
                        sweeps_per_launch, sgn, transpose,
                    )
                    for ci in range(ncomp)
                ]
            n = outs[0][1]
            for o in outs[1:]:
                n = jnp.maximum(n, o[1])
            return (tuple(o[0] for o in outs), n, j + 1)

        dtype = jax.tree_util.tree_leaves(b)[0].dtype
        if jac2:
            # whole-solve: the ENTIRE sweep loop (init residual, per-sweep
            # convergence test, true exit residual) runs as ONE launch for
            # both components — replaces the probe pair + per-trip launch
            # pairs below; same total sweep budget
            xo0, xo1, jn = fused_jacobi2_solve(
                st_cs, b_c, tuple(x0.components), sgn, transpose, tol,
                1 + max_launches * sweeps_per_launch,
            )
            x_c = (xo0, xo1)
        elif jac1 or jac13d:
            # per-component whole-solve launches (exact: the system is
            # block-diagonal per component); jn = max over components
            solve1 = fused_jacobi1_solve_3d if jac13d else fused_jacobi1_solve
            outs = [
                solve1(
                    st_cs[ci], b_c[ci], tuple(x0.components)[ci], sgn,
                    transpose, tol, 1 + max_launches * sweeps_per_launch,
                )
                for ci in range(ncomp)
            ]
            jn = outs[0][1]
            for o in outs[1:]:
                jn = jnp.maximum(jn, o[1])
            x_c = tuple(o[0] for o in outs)
        elif jac3d or jac_zb is not None:
            # these kernels report the PRE-update (entry) residual, so the
            # first trip's norm is x0's true residual: warm-converged solves
            # exit after one launch with no probe needed (the z-block kernel
            # additionally runs ZERO sweeps in that launch, making the
            # reported norm exact for the returned iterate)
            init = (tuple(x0.components), jnp.asarray(jnp.inf, dtype),
                    jnp.zeros((), jnp.int32))
            x_c, jn, _ = jax.lax.while_loop(jcond, jbody, init)
        else:
            # k=1 probe launch (2 in-core matvecs): warm-started solves that
            # are already at tol exit as cheaply as the Krylov skip path did,
            # instead of paying a full k-sweep launch (cavity-class flows)
            probe = [
                fused_jacobi_sweeps(st_cs[ci], b_c[ci],
                                    tuple(x0.components)[ci], 1, sgn,
                                    transpose)
                for ci in range(ncomp)
            ]
            n0 = probe[0][1]
            for o in probe[1:]:
                n0 = jnp.maximum(n0, o[1])
            init = (tuple(o[0] for o in probe), n0, jnp.zeros((), jnp.int32))
            x_c, jn, _ = jax.lax.while_loop(jcond, jbody, init)
        x0 = type(b)(x_c, periodic=b.periodic)
        x, rnorm, k = jax.lax.cond(
            jn < tol,
            lambda _: (x0, jn, jnp.zeros((), jnp.int32)),
            lambda _: once(x0),
            None,
        )
    else:
        x, rnorm, k = once(x0)

    bad = (~jnp.isfinite(rnorm)) | (rnorm > 100.0 * tol)

    def restart(_):
        xr, rr, kr = once(_zeros_like(b))
        return xr, rr, k + kr  # report TOTAL work, both attempts

    def keep(_):
        return x, rnorm, k

    x, rnorm, k2 = jax.lax.cond(bad, restart, keep, None)
    warn = (~jnp.isfinite(rnorm)) | (rnorm > 100.0 * tol)
    return SolveResult(
        x=x,
        iterations=k2,
        residual_norm=rnorm,
        converged=rnorm < tol,
        warn=warn,
    )


# -- CG ------------------------------------------------------------------------


def cg(
    apply_A: Callable,
    b,
    x0=None,
    *,
    tol=1e-6,
    max_iter: int = 2000,
    residual_reset: int = 0,
    deflate_mean: bool = False,
    stencil=None,
) -> SolveResult:
    """Conjugate gradients in the reference CG's exact recurrence
    (pressure_solve_op.cu.cc:257-357):

      z = A p;  alpha = (p.r)/(p.z);  x += alpha p;  r -= alpha z
      beta = -(r.z)/(p.z);  p = r + beta p

    with the optional full residual re-computation every `residual_reset`
    iterations (which also resets the search direction, cu.cc:260-274).
    Convergence: max|r_i| < tol.

    residual_reset is essential in float32: the recurrence residual drifts
    from the true residual and CG stalls (measured: an all-Neumann 32^2
    system stalls at 0.6 after 3000 iters without resets, converges in 243
    with reset=50). The reference sidesteps this by casting to float64
    (piso_cuda_pressure_solver.py:56-58), a luxury TPUs don't have natively.

    stencil — the raw LaplaceStencil behind apply_A, enabling the fused
    single-launch Pallas iteration (solvers/pallas_krylov.py) on eligible
    shapes; apply_A remains the semantic definition and the fallback.

    deflate_mean subtracts the mean from the residual every iteration —
    projecting out the constant null space of the all-Neumann (rank
    deficient) pressure system so float32 rounding cannot feed the
    indefinite rank-one-shift direction.
    """
    cold = x0 is None
    if cold:
        x0 = _zeros_like(b)
    dtype = jax.tree_util.tree_leaves(b)[0].dtype
    tol = jnp.asarray(tol, dtype)
    eps = jnp.asarray(1e-300 if dtype == jnp.float64 else 1e-30, dtype)

    if deflate_mean:
        project = lambda v: jax.tree_util.tree_map(lambda a: a - jnp.mean(a), v)
    else:
        project = lambda v: v

    fused = False
    if stencil is not None and not isinstance(b, (tuple, list, dict)):
        leaves = jax.tree_util.tree_leaves(b)
        if len(leaves) == 1 and hasattr(leaves[0], "shape"):
            from diffpiso_tpu.solvers.pallas_krylov import eligible, eligible3

            # rank-2 planes or 128^3-class volumes (monolithic rank-3
            # phase kernels, pallas_krylov.eligible3)
            fused = eligible(leaves[0].shape, leaves[0].dtype) or \
                eligible3(leaves[0].shape, leaves[0].dtype)
    if fused:
        from diffpiso_tpu.solvers.pallas_krylov import (
            fused_cg_iteration,
            fused_residual,
        )

    # zero guess -> r0 = b without an A x0 matvec (see pcg's kernel-count
    # discipline note)
    if cold:
        r0 = project(b)
        rnorm0 = _tree_max_abs(r0)
    elif fused:
        r0, rnorm0 = fused_residual(stencil, b, x0, deflate_mean)
    else:
        r0 = project(_sub(b, apply_A(x0)))
        rnorm0 = _tree_max_abs(r0)

    def cond(state):
        x, r, p, k, done = state
        return (~done) & (k < max_iter)

    def body(state):
        x, r, p, k, done = state
        if residual_reset > 0:
            def reset(args):
                x, r, p = args
                if fused:
                    rr, _ = fused_residual(stencil, b, x, deflate_mean)
                else:
                    rr = project(_sub(b, apply_A(x)))
                return x, rr, rr

            def keep(args):
                return args

            x, r, p = jax.lax.cond(
                (k + 1) % residual_reset == 0, reset, keep, (x, r, p)
            )
        if fused:
            x, r, p, rnorm = fused_cg_iteration(stencil, x, r, p, deflate_mean)
        else:
            z = apply_A(p)
            pz = tree_vdot(p, z)
            pr = tree_vdot(p, r)
            alpha = jnp.where(jnp.abs(pz) > eps, pr / pz, 0.0)
            x = _axpy(alpha, p, x)
            r = project(_axpy(-alpha, z, r))
            rnorm = _tree_max_abs(r)
            beta = jnp.where(jnp.abs(pz) > eps, -tree_vdot(r, z) / pz, 0.0)
            p = _axpy(beta, p, r)
        done = (rnorm < tol) | ~jnp.isfinite(rnorm)
        return (x, r, p, k + 1, done)

    def run_solve(_):
        init = (x0, r0, r0, jnp.zeros((), jnp.int32), jnp.zeros((), bool))
        x, r, p, k, _ = jax.lax.while_loop(cond, body, init)
        if fused:
            _, rn = fused_residual(stencil, b, x, deflate_mean)
            return x, rn, k
        r_true = project(_sub(b, apply_A(x)))
        return x, _tree_max_abs(r_true), k

    def skip_solve(_):
        return x0, rnorm0, jnp.zeros((), jnp.int32)

    x, rnorm, k = jax.lax.cond(rnorm0 < tol, skip_solve, run_solve, None)
    # warn = failed solve: non-finite OR stalled far above tolerance (the
    # bicgstab criterion, multi_..._op.cu.cc:392-408)
    warn = (~jnp.isfinite(rnorm)) | (rnorm > 100.0 * tol)
    return SolveResult(x=x, iterations=k, residual_norm=rnorm, converged=rnorm < tol, warn=warn)


def pcg(
    apply_A: Callable,
    b,
    x0=None,
    *,
    precond: Callable,
    tol=1e-6,
    max_iter: int = 2000,
    residual_reset: int = 0,
    deflate_mean: bool = False,
    precond_zero_mean: bool = False,
    early_exit: bool = True,
    stencil=None,
    precond_mm=None,
) -> SolveResult:
    """Preconditioned CG: z = M^-1 r each iteration (e.g. one multigrid
    V-cycle or a spectral solve). This is the designed-in upgrade over the
    reference's unpreconditioned pressure CG — same convergence test
    (max|r_i| < tol), same deflation/reset machinery as `cg`.

    Kernel-count discipline (each HLO op costs ~30 us launch overhead on the
    tunneled TPU, far above its bandwidth cost at 512^2):
      * zero x0 -> r0 = b, no A x0 matvec;
      * already-converged systems (warm-started PISO correctors average
        0.5/0.05 iterations per step) skip the whole loop INCLUDING the
        z0 preconditioner application and the final verification matvec,
        via one lax.cond;
      * precond_zero_mean marks M^-1 outputs as mean-free (the spectral
        preconditioners zero the k=0 mode), eliding the explicit projection;
      * early_exit=False drops the whole-solve lax.cond wrapper (profiled at
        ~0.24 ms of pure overhead) for callers that KNOW the solve is cold
        and non-trivial — the adjoint solves.

    precond_mm — optional (MatmulSpectralSolver, weights): when the fused
    kernels are eligible and the preconditioner is the rank-2 matmul
    spectral inverse over the full grid, the M^-1 application folds INTO
    the fused p-update launch (pallas_krylov.fused_pcg_mm_update): one
    launch per iteration instead of apply + separate update, and z never
    round-trips HBM. Must describe the same operator as `precond` (the
    non-fused path keeps calling `precond`).
    """
    cold = x0 is None
    if cold:
        x0 = _zeros_like(b)
    dtype = jax.tree_util.tree_leaves(b)[0].dtype
    tol = jnp.asarray(tol, dtype)
    eps = jnp.asarray(1e-300 if dtype == jnp.float64 else 1e-30, dtype)

    if deflate_mean:
        project = lambda v: jax.tree_util.tree_map(lambda a: a - jnp.mean(a), v)
        project_z = project if not precond_zero_mean else (lambda v: v)
    else:
        project = lambda v: v
        project_z = lambda v: v

    fused = False
    if stencil is not None and not isinstance(b, (tuple, list, dict)):
        leaves = jax.tree_util.tree_leaves(b)
        if len(leaves) == 1 and hasattr(leaves[0], "shape"):
            from diffpiso_tpu.solvers.pallas_krylov import eligible, eligible3

            # rank-2 planes or 128^3-class volumes (monolithic rank-3
            # phase kernels, pallas_krylov.eligible3); the LARGE-plane
            # tier additionally needs the measured-winning basis family
            # (all-'fourier' — runs/ab_phase_large.log)
            kinds_l = (
                tuple(precond_mm[0].kinds)
                if precond_mm is not None
                and hasattr(precond_mm[0], "kinds")
                else None
            )
            fused = eligible(leaves[0].shape, leaves[0].dtype,
                             large_kinds=kinds_l) or \
                eligible3(leaves[0].shape, leaves[0].dtype)
    if fused:
        from diffpiso_tpu.solvers.pallas_krylov import (
            fused_pcg_apply,
            fused_pcg_update,
            fused_residual,
        )

    # fully-fused rank-2 whole-solve spectral PCG (ONE launch for the
    # entire solve incl. init residual, preconditioned loop, and
    # verification) — see pallas_krylov.fused_pcg2_solve
    if (
        stencil is not None
        and precond_mm is not None
        and precond_zero_mean
        and not isinstance(b, (tuple, list, dict))
    ):
        leaves2 = jax.tree_util.tree_leaves(b)
        if len(leaves2) == 1 and getattr(leaves2[0], "ndim", 0) == 2:
            from diffpiso_tpu.solvers.pallas_krylov import (
                fused_pcg2_solve,
                pcg2_eligible,
            )

            solver_mm2, w_mm2 = precond_mm
            leaf2 = leaves2[0]
            if (
                len(solver_mm2.shape) == 2
                and tuple(solver_mm2.shape) == tuple(leaf2.shape)
                and pcg2_eligible(leaf2.shape, leaf2.dtype,
                                  early_exit=early_exit,
                                  periodic=getattr(stencil, "periodic",
                                                   None))
            ):
                x2, rn2, k2 = fused_pcg2_solve(
                    stencil, leaf2, None if cold else x0, solver_mm2, w_mm2,
                    tol, max_iter, deflate_mean=deflate_mean,
                )
                warn2 = (~jnp.isfinite(rn2)) | (rn2 > 100.0 * tol)
                return SolveResult(
                    x=x2, iterations=k2, residual_norm=rn2,
                    converged=rn2 < tol, warn=warn2,
                )

    # fully-fused rank-3 spectral-PCG loop (z-gridded launch kernels):
    # dispatches the whole solve when the stencil, preconditioner, and
    # shapes line up — see pallas_krylov.fused_pcg3_solve
    if (
        stencil is not None
        and precond_mm is not None
        and precond_zero_mean
        and not isinstance(b, (tuple, list, dict))
    ):
        leaves3 = jax.tree_util.tree_leaves(b)
        if len(leaves3) == 1 and getattr(leaves3[0], "ndim", 0) == 3:
            from diffpiso_tpu.solvers.pallas_krylov import (
                fused_pcg3_solve,
                pcg3_eligible,
            )

            solver_mm3, w_mm3 = precond_mm
            leaf3 = leaves3[0]
            if (
                len(solver_mm3.shape) == 3
                and tuple(solver_mm3.shape) == tuple(leaf3.shape)
                and pcg3_eligible(leaf3.shape, leaf3.dtype)
            ):
                x3, rn3, k3 = fused_pcg3_solve(
                    stencil, leaf3, None if cold else x0, solver_mm3, w_mm3,
                    tol, max_iter, deflate_mean=deflate_mean,
                    early_exit=early_exit,
                )
                warn3 = (~jnp.isfinite(rn3)) | (rn3 > 100.0 * tol)
                return SolveResult(
                    x=x3, iterations=k3, residual_norm=rn3,
                    converged=rn3 < tol, warn=warn3,
                )

    mm_update = None
    if fused and precond_mm is not None:
        solver_mm, w_mm = precond_mm
        leaf = jax.tree_util.tree_leaves(b)[0]
        if (
            len(solver_mm.shape) == 2
            and tuple(solver_mm.shape) == tuple(leaf.shape)
            # project_z must be the identity: *_mm singular-mode zeroing
            # provides the mean-free output the callers promise via
            # precond_zero_mean
            and (precond_zero_mean or not deflate_mean)
        ):
            from diffpiso_tpu.solvers.pallas_krylov import (
                fused_pcg_mm_update,
                mm_update_large_eligible,
                spectral_eligible,
            )

            # small planes: spectral_eligible (measured-never default —
            # pcg2 owns the whole solve there anyway); LARGE planes (past
            # pcg2's Mosaic wall): the bf16x3 mm-update vs the XLA loop
            if spectral_eligible(leaf.shape, leaf.dtype) or \
                    mm_update_large_eligible(
                        leaf.shape, leaf.dtype,
                        kinds=tuple(solver_mm.kinds)):
                from diffpiso_tpu.solvers.fourier import _safe_symbol

                v0m, v1m = solver_mm._mats(leaf.dtype)
                sym_mm = _safe_symbol(solver_mm, w_mm, leaf.dtype)
                prec_mm = solver_mm._precision()
                # 'all-highest' (runs/ab_mm_dct2.py): an A/B arm coercing
                # non-fourier contractions to Mosaic HIGHEST (6 passes).
                # Measured loser (-27% fwd / -48% grad30 at dns) — and the
                # iteration-inflation story that motivated it was later
                # overturned (runs/diag_dct_inflation.log: the bf16x3
                # branch holds iterations identical to XLA; the dct-family
                # loss is basis-contraction throughput). Kept as a
                # measurement arm only.
                from diffpiso_tpu.solvers.pallas_krylov import _large_mode

                if _large_mode() == "all-highest" and any(
                    k != "fourier" for k in solver_mm.kinds
                ):
                    prec_mm = jax.lax.Precision.HIGHEST
                zeros_leaf = jnp.zeros_like(leaf)

                def mm_update(rz_old, r_, p_):
                    return fused_pcg_mm_update(
                        v0m, v1m, sym_mm, rz_old, r_, p_, prec_mm
                    )

    if cold:
        r0 = project(b)
        rnorm0 = _tree_max_abs(r0)
    elif fused:
        r0, rnorm0 = fused_residual(stencil, b, x0, deflate_mean)
    else:
        r0 = project(_sub(b, apply_A(x0)))
        rnorm0 = _tree_max_abs(r0)

    def cond(state):
        x, r, p, rz, k, done = state
        return (~done) & (k < max_iter)

    def body(state):
        x, r, p, rz, k, done = state
        if residual_reset > 0:
            def reset(args):
                x, r, p, rz = args
                if fused:
                    rr, _ = fused_residual(stencil, b, x, deflate_mean)
                else:
                    rr = project(_sub(b, apply_A(x)))
                if mm_update is not None:
                    zz, rrzz = mm_update(1.0, rr, zeros_leaf)
                    return x, rr, zz, rrzz
                zz = project_z(precond(rr))
                return x, rr, zz, tree_vdot(rr, zz)

            def keep(args):
                return args

            x, r, p, rz = jax.lax.cond(
                (k + 1) % residual_reset == 0, reset, keep, (x, r, p, rz)
            )
        if fused:
            x, r, rnorm, _pq = fused_pcg_apply(stencil, rz, x, r, p, deflate_mean)
            if mm_update is not None:
                p, rz_new = mm_update(rz, r, p)
            else:
                z = project_z(precond(r))
                p, rz_new = fused_pcg_update(rz, r, z, p)
        else:
            q = apply_A(p)
            pq = tree_vdot(p, q)
            alpha = jnp.where(jnp.abs(pq) > eps, rz / pq, 0.0)
            x = _axpy(alpha, p, x)
            r = project(_axpy(-alpha, q, r))
            rnorm = _tree_max_abs(r)
            z = project_z(precond(r))
            rz_new = tree_vdot(r, z)
            beta = jnp.where(jnp.abs(rz) > eps, rz_new / rz, 0.0)
            p = _axpy(beta, p, z)
        done = (rnorm < tol) | ~jnp.isfinite(rnorm)
        return (x, r, p, rz_new, k + 1, done)

    def run_solve(_):
        if mm_update is not None:
            z0, rz0 = mm_update(1.0, r0, zeros_leaf)
        else:
            z0 = project_z(precond(r0))
            rz0 = tree_vdot(r0, z0)
        init = (
            x0, r0, z0, rz0, jnp.zeros((), jnp.int32),
            jnp.zeros((), bool),
        )
        x, r, p, rz, k, _ = jax.lax.while_loop(cond, body, init)
        if fused:
            _, rn = fused_residual(stencil, b, x, deflate_mean)
            return x, rn, k
        r_true = project(_sub(b, apply_A(x)))
        return x, _tree_max_abs(r_true), k

    def skip_solve(_):
        # r0 IS the true residual of x0; nothing to verify or solve
        return x0, rnorm0, jnp.zeros((), jnp.int32)

    if early_exit:
        x, rnorm, k = jax.lax.cond(rnorm0 < tol, skip_solve, run_solve, None)
    else:
        x, rnorm, k = run_solve(None)
    # warn = failed solve: non-finite OR stalled far above tolerance (the
    # bicgstab criterion, multi_..._op.cu.cc:392-408) — gates gradients and
    # triggers the training loop's skip/rollback
    warn = (~jnp.isfinite(rnorm)) | (rnorm > 100.0 * tol)
    return SolveResult(x=x, iterations=k, residual_norm=rnorm, converged=rnorm < tol, warn=warn)


def print_residual(apply_A, x, b, tag: str = "residual"):
    """Debug hook printing ||Ax - b||_max from inside a jitted computation
    (the reference's py_func residual printer, linear_solver.py:198-206 —
    here via jax.debug.print, which works under jit/scan). Returns x
    unchanged so it can be spliced into a pipeline."""
    r = _tree_max_abs(_sub(b, apply_A(x)))
    jax.debug.print(tag + ": ||Ax-b||_max = {r}", r=r)
    return x
