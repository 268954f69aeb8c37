"""Differentiable solver wrappers with implicit-function-theorem adjoints.

Mirrors the reference's solver layer:

  solve_advection_system  <- LinearSolverCudaMultiBicgstabILU.solve
                             (diffpiso/linear_solver.py:114-178)
  solve_pressure_system   <- PisoPressureSolverCudaCustom.solve
                             (diffpiso/piso_cuda_pressure_solver.py:36-114)

Differentiation strategy (identical to the reference):

* the backward pass of a linear solve is another linear solve with the
  transposed operator applied to the cotangent (linear_solver.py:163-175);
  the pressure Laplacian is symmetric so the same CG is reused
  (piso_cuda_pressure_solver.py:97-107),
* the operator coefficients receive ZERO gradient — the Jacobian of the
  matrix assembly w.r.t. velocity is deliberately dropped (Picard-style
  linearization of the adjoint, piso_tf.py:116-128),
* gradients of failed solves are gated to zero via (1 - warn)
  (linear_solver.py:173).

Tolerances are runtime values (the reference feeds accuracy through a
placeholder and tightens it during a run, lid_driven_cavity_2d.py:70-78,110),
so they trace through jit; iteration caps are static.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from diffpiso_tpu.fields.grid import StaggeredField
from diffpiso_tpu.ops.laplace import LaplaceStencil, apply_laplacian
from diffpiso_tpu.ops.stencil import (
    AdvectionStencil,
    apply_stencil,
    apply_stencil_transpose,
)
from diffpiso_tpu.solvers.krylov import (
    SolveResult,
    _tree_max_abs,
    _zeros_like as _zeros_like_tree,
    bicgstab,
    cg,
)


def _adjoint_tol(tol, cotangent):
    """Tolerance for the backward (adjoint) solve, scaled by the cotangent's
    magnitude. The forward tolerance is absolute on a physics-scaled rhs
    (divergence ~ O(dx*u)); cotangents of typical losses are O(1)-O(1e3), so
    reusing the absolute tolerance would force the adjoint solves through
    many times more iterations for accuracy the gradient direction doesn't
    need. Relative accuracy of the adjoint solve equals relative accuracy of
    the gradient (the reference sidesteps this by converging its float64 CG
    essentially fully).

    Validated at training scale (tests/test_gradient_fidelity.py): a 10-step
    f32 rollout gradient at tol=1e-6 with this relaxation is within ~2e-4
    relative l2 of the f64 tol=1e-11 ground truth — an order of magnitude
    below the ~3e-3 bias the (reference-mandated) Picard linearization
    itself introduces, so the relaxation costs nothing."""
    return tol * jnp.maximum(1.0, _tree_max_abs(cotangent))


# -- advection-diffusion (predictor) solve ---------------------------------------


@dataclasses.dataclass(frozen=True)
class AdvectionSolver:
    """Config for the implicit momentum solve. The reference's equivalent
    knobs: accuracy/max_iterations/cast_to_double
    (linear_solver.py:116-125)."""

    max_iterations: int = 1000
    precondition: bool = True
    dtype: str | None = None  # e.g. "float64" for the CPU-oracle path

    def solve(self, stencil, rhs, guess=None, tol=1e-6):
        return solve_advection_system(self, stencil, rhs, guess, tol)


def _adv_operator_diag(stencil: AdvectionStencil, periodic):
    # operator is -M, so the Jacobi diagonal is -center (= beta - diag >= 0)
    return StaggeredField(tuple(-c for c in stencil.center), periodic=periodic)


def _make_adv_residual_fn(stencil, transpose: bool):
    """Fused per-component residual (matvec + subtract + max in one pallas
    launch each, joint max outside) for the '-M' advection operator:
    r = b + M x. None when any component is pallas-ineligible.

    OFF by default: in-process A/B at the 512^2 turbulence headline measured
    it 3.5% SLOWER than XLA's fused chain (on 943/949 vs off 974/983
    steps/s) — the advection solve's residual ops fuse into their neighbors
    under XLA, so the extra pallas launches don't pay. Kept available
    (DIFFPISO_FUSED_ADV_RESID=always) and correctness-tested for platforms
    where the trade-off differs."""
    import os

    from diffpiso_tpu.ops.pallas_stencil import (
        fused_stencil_residual,
        pallas_eligible,
    )

    if os.environ.get("DIFFPISO_FUSED_ADV_RESID", "never") != "always":
        return None
    if not all(
        c.ndim == 2 and pallas_eligible(c.shape, c.dtype)
        for c in stencil.center
    ):
        return None  # the fused residual kernel is 2-D-only

    def residual_fn(b, x):
        comps, norms = [], []
        for ci in range(len(b.components)):
            r, n = fused_stencil_residual(
                stencil.center[ci], stencil.lo[ci], stencil.hi[ci],
                b.components[ci], x.components[ci],
                negate=True, transpose=transpose,
            )
            comps.append(r)
            norms.append(n)
        r_tree = StaggeredField(tuple(comps), periodic=b.periodic)
        rnorm = norms[0]
        for n in norms[1:]:
            rnorm = jnp.maximum(rnorm, n)
        return r_tree, rnorm

    return residual_fn


def _sharded_adv_solve(ctx, cfg, stencil, rhs, guess, tol, transpose):
    """Momentum solve on a device mesh with per-shard Pallas kernels
    (parallel/shard_kernels.py): whole Jacobi-Richardson solve as
    [ppermute halo exchange -> measure+k-sweep launch] trips, falling back
    to the GSPMD jnp BiCGSTAB from the Jacobi iterate if diagonal
    dominance was not enough (identical failure/warn semantics to the
    single-chip accelerator in krylov.bicgstab)."""
    from diffpiso_tpu.parallel import shard_kernels as _sk

    apply_fn = apply_stencil_transpose if transpose else apply_stencil
    ncomp = len(stencil.center)
    st_cs = [
        (stencil.center[i], stencil.lo[i], stencil.hi[i]) for i in range(ncomp)
    ]
    x0 = guess if guess is not None else _zeros_like_tree(rhs)
    x_c, jn = _sk.sharded_momentum_solve(
        ctx, st_cs, tuple(rhs.components), tuple(x0.components), -1.0,
        transpose, tol,
    )
    x0f = type(rhs)(tuple(x_c), periodic=rhs.periodic)
    tol_ = jnp.asarray(tol, rhs.dtype)

    def skip(_):
        return x0f, jn, jnp.zeros((), jnp.int32)

    def fallback(_):
        res = bicgstab(
            lambda v: apply_fn(stencil, v, negate=True), rhs, x0f,
            tol=tol, max_iter=cfg.max_iterations,
            diag=_adv_operator_diag(stencil, rhs.periodic)
            if cfg.precondition else None,
        )
        return res.x, res.residual_norm, res.iterations

    x, rnorm, k = jax.lax.cond(jn < tol_, skip, fallback, None)
    warn = (~jnp.isfinite(rnorm)) | (rnorm > 100.0 * tol_)
    result = SolveResult(
        x=x, iterations=k, residual_norm=rnorm, converged=rnorm < tol_,
        warn=warn,
    )
    return x, result


def _adv_solve_impl(cfg: AdvectionSolver, stencil, rhs, guess, tol, transpose: bool):
    apply_fn = apply_stencil_transpose if transpose else apply_stencil
    in_dtype = rhs.dtype
    if cfg.dtype is not None:
        dt = jnp.dtype(cfg.dtype)
        stencil = jax.tree_util.tree_map(lambda a: a.astype(dt), stencil)
        rhs = rhs.astype(dt)
        guess = None if guess is None else guess.astype(dt)
    from diffpiso_tpu.parallel import shard_kernels as _sk

    _ctx = _sk.current()
    if _ctx is not None and _sk.momentum_eligible(
        _ctx, tuple(c.shape for c in stencil.center), rhs.dtype, transpose
    ):
        x, result = _sharded_adv_solve(
            _ctx, cfg, stencil, rhs, guess, tol, transpose
        )
        x = x.astype(in_dtype) if cfg.dtype is not None else x
        x, result = _name_solve_out(x, result)
        return x, result
    result = bicgstab(
        lambda v: apply_fn(stencil, v, negate=True),
        rhs,
        guess,
        tol=tol,
        max_iter=cfg.max_iterations,
        diag=_adv_operator_diag(stencil, rhs.periodic) if cfg.precondition else None,
        residual_fn=_make_adv_residual_fn(stencil, transpose),
        # fused 3-launch-per-component BiCGSTAB phases where eligible
        stencil=stencil,
        negate=True,
        transpose=transpose,
    )
    x = result.x.astype(in_dtype) if cfg.dtype is not None else result.x
    x, result = _name_solve_out(x, result)
    return x, result


def _name_solve_out(x, result):
    """Tag the solve SOLUTION (and warn) for the r5 'outputs' remat policy:
    under jax.checkpoint(step, policy=save_only_these_names(
    'diffpiso_solve_out')) the backward replay keeps exactly the solve
    outputs and recomputes the cheap assembly/FV/corrector chains — the
    Krylov loops are never re-run (their outputs cut the replay graph),
    and the per-step stash is ~10 volumes instead of the ~31 operator
    coefficients the 'diffpiso_solve_res' policy saves (which does not fit
    HBM at 256^3 x 10 unrolled steps). The adjoint solves re-derive their
    operators from the replayed assembly. No-op outside jax.checkpoint."""
    from jax.ad_checkpoint import checkpoint_name

    x = jax.tree_util.tree_map(
        lambda a: checkpoint_name(jnp.asarray(a), "diffpiso_solve_out"), x
    )
    result = result._replace(
        warn=checkpoint_name(result.warn, "diffpiso_solve_out")
    )
    return x, result


def _name_solve_res(res):
    """Tag custom_vjp residuals for remat policies: under
    jax.checkpoint(step, policy=save_only_these_names('diffpiso_solve_res'))
    the backward scan keeps EXACTLY these (the operator coefficients the
    adjoint solves need) and replays the cheap linear chains — without the
    tag, a remat'd backward would re-run the whole forward INCLUDING the
    solves to reconstruct them (the reason plain per-step remat measured
    -10% at 512^2, runs/ab_remat.log). No-op outside jax.checkpoint."""
    from jax.ad_checkpoint import checkpoint_name

    return jax.tree_util.tree_map(
        lambda a: checkpoint_name(jnp.asarray(a), "diffpiso_solve_res"), res
    )


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def solve_advection_system(cfg: AdvectionSolver, stencil, rhs, guess, tol):
    """Solve (-M) v = rhs for the velocity predictor. Returns (v, warn)."""
    x, result = _adv_solve_impl(cfg, stencil, rhs, guess, tol, transpose=False)
    return x, result.warn


def _adv_fwd(cfg, stencil, rhs, guess, tol):
    x, result = _adv_solve_impl(cfg, stencil, rhs, guess, tol, transpose=False)
    return (x, result.warn), _name_solve_res(
        (stencil, guess, result.warn, tol))


def _adv_bwd(cfg, residuals, cotangents):
    stencil, guess, warn, tol = residuals
    g, _g_warn = cotangents
    db, adj_result = _adv_solve_impl(
        cfg, stencil, g, None, _adjoint_tol(tol, g), transpose=True
    )
    # gate on the forward warn (linear_solver.py:173) AND on the adjoint
    # solve's own failure — a diverged transpose solve is finite garbage the
    # training loop's NaN check would never see
    gate = (1.0 - warn.astype(db.dtype)) * (
        1.0 - adj_result.warn.astype(db.dtype)
    )
    db = db * gate
    return (
        _zeros_like_tree(stencil),
        db,
        _zeros_like_tree(guess),
        jnp.zeros_like(tol),
    )


solve_advection_system.defvjp(_adv_fwd, _adv_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def solve_advection_system_ws(cfg: AdvectionSolver, stencil, rhs, guess, tol,
                              adj_channel):
    """solve_advection_system plus the adjoint warm-start channel (see
    solve_pressure_system_ws for the construction): the transpose-solve of
    the backward pass starts from the NEXT backward step's adjoint solution
    instead of cold. Returns (v, warn, adj_out); wire adj_out into the next
    step's adj_channel through the rollout scan carry."""
    x, result = _adv_solve_impl(cfg, stencil, rhs, guess, tol, transpose=False)
    return x, result.warn, _zeros_like_tree(rhs)


def _adv_ws_fwd(cfg, stencil, rhs, guess, tol, adj_channel):
    x, result = _adv_solve_impl(cfg, stencil, rhs, guess, tol, transpose=False)
    return (
        (x, result.warn, _zeros_like_tree(rhs)),
        _name_solve_res((stencil, guess, result.warn, tol)),
    )


def _adv_ws_bwd(cfg, residuals, cotangents):
    stencil, guess, warn, tol = residuals
    g, _g_warn, adj_guess = cotangents
    db, adj_result = _adv_solve_impl(
        cfg, stencil, g, adj_guess, _adjoint_tol(tol, g), transpose=True
    )
    gate = (1.0 - warn.astype(db.dtype)) * (
        1.0 - adj_result.warn.astype(db.dtype)
    )
    db = db * gate
    return (
        _zeros_like_tree(stencil),
        db,
        _zeros_like_tree(guess),
        jnp.zeros_like(tol),
        db,
    )


solve_advection_system_ws.defvjp(_adv_ws_fwd, _adv_ws_bwd)


# -- pressure (corrector) solve ----------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PressureSolver:
    """Config for the pressure-increment CG solve. Reference knobs:
    accuracy/max_iterations/residual_reset/randomized_restarts/cast_to_double
    (piso_cuda_pressure_solver.py:38-49)."""

    max_iterations: int = 2000
    # residual resets keep float32 CG from stalling (see krylov.cg); the
    # reference used 1000 with float64 (combined_training_integrated.py:487)
    residual_reset: int = 50
    # project out the constant null space of all-Neumann systems each
    # iteration (float32-safe alternative to relying on the rank-one shift)
    deflate_mean: bool = False
    dtype: str | None = None  # "float64" reproduces cast_to_double=True
    # Preconditioning (None mirrors the reference's unpreconditioned CG):
    #  "fft": spectral inverse with the mean stencil weights — one fused
    #         FFT pair per iteration; measured at 512^2 (variable
    #         coefficients, tol 1e-4): 101 iters / 25 ms where plain f32 CG
    #         stalls at its 4000-iteration cap with residual 9e-2.
    #  "mg":  aggregation-multigrid V-cycle (fewest iterations, but the
    #         coarse-level cascade is latency-bound on TPU: 35 ms same test).
    preconditioner: str | None = None
    # preconditioner for the backward (adjoint) solve; "same" inherits.
    # Adjoint solves start cold (no warm start exists), where FFT-PCG pays
    # off even when the warm-started forward prefers plain CG.
    adjoint_preconditioner: str | None = "same"
    # retry count from pseudo-randomly perturbed guesses when a solve fails
    # — the reference's cuRAND randomized restarts
    # (pressure_solve_op.cu.cc:359-396); deterministic here (counter-based
    # jax.random keys) so results reproduce
    randomized_restarts: int = 0

    def solve(self, laplacian, rhs, guess=None, tol=1e-6):
        return solve_pressure_system(self, laplacian, rhs, guess, tol)


def _make_pressure_precond(kind: str | None, lap: LaplaceStencil):
    if kind is None:
        return None
    if kind == "mg":
        from diffpiso_tpu.solvers.multigrid import build_mg_hierarchy, v_cycle

        hier = build_mg_hierarchy(lap, min_size=32)
        return lambda r: v_cycle(hier, r)
    if kind == "fft":
        from diffpiso_tpu.solvers.fourier import FourierPressureSolver

        weights = tuple(jnp.mean(jnp.abs(l)) for l in lap.lo)
        fps = FourierPressureSolver()
        return lambda r: fps.solve(weights, r)
    if kind == "dct":
        # Neumann-exact spectral inverse (bounded domains): unlike "fft" it
        # matches the zero-flux boundary rows of the pressure Laplacian, so
        # PCG only has to correct the variable-coefficient part.
        from diffpiso_tpu.solvers.fourier import NeumannSpectralSolver

        weights = tuple(jnp.mean(jnp.abs(l)) for l in lap.lo)
        nss = NeumannSpectralSolver()
        return lambda r: nss.precondition(weights, r)
    if kind == "channel":
        # Neumann walls + Neumann-inflow/Dirichlet-outflow (the mixing-layer
        # layout): DCT-II x DCT-IV basis, nonsingular
        from diffpiso_tpu.solvers.fourier import ChannelSpectralSolver

        weights = tuple(jnp.mean(jnp.abs(l)) for l in lap.lo)
        css = ChannelSpectralSolver()
        return lambda r: css.precondition(weights, r)
    if kind in ("dct_mm", "fft_mm", "channel_mm"):
        # Matmul (MXU) variants of the spectral inverses: identical
        # mathematics applied through precomputed orthonormal eigenbases
        # instead of FFTs, so they partition under GSPMD (the sharded
        # multi-chip pressure solve keeps its preconditioner — round-1's
        # multichip dryrun had to fall back to plain CG) and batch under
        # vmap. See solvers/fourier.py MatmulSpectralSolver.
        from diffpiso_tpu.solvers.fourier import MatmulSpectralSolver

        rank = lap.center.ndim
        if kind == "dct_mm":
            kinds = ("dct2",) * rank
        elif kind == "fft_mm":
            kinds = ("fourier",) * rank
        else:
            kinds = ("dct2",) * (rank - 1) + ("dct4",)
        weights = tuple(jnp.mean(jnp.abs(l)) for l in lap.lo)
        mss = MatmulSpectralSolver(kinds=kinds, shape=lap.center.shape)
        fn = lambda r: mss.precondition(weights, r)
        # pcg folds this application into its fused p-update launch when the
        # kernels are eligible (krylov.pcg precond_mm)
        fn.mm_info = (mss, weights)
        return fn
    raise ValueError(f"unknown preconditioner {kind!r}")


def _pressure_solve_impl(
    cfg: PressureSolver, lap: LaplaceStencil, rhs, guess, tol, adjoint: bool = False
):
    in_dtype = rhs.dtype
    if cfg.dtype is not None:
        dt = jnp.dtype(cfg.dtype)
        lap = jax.tree_util.tree_map(lambda a: a.astype(dt), lap)
        rhs = rhs.astype(dt)
        guess = None if guess is None else guess.astype(dt)
    result = _pressure_solve_once(cfg, lap, rhs, guess, tol, adjoint)
    # randomized restarts from perturbed guesses on failure
    # (pressure_solve_op.cu.cc:359-396): the perturbation kicks CG off a
    # stagnated Krylov subspace; keys are counter-based so runs reproduce
    for attempt in range(cfg.randomized_restarts):
        def retry(res=result, a=attempt):
            key = jax.random.fold_in(jax.random.PRNGKey(42), a)
            scale = 0.01 * (jnp.max(jnp.abs(res.x)) + jnp.max(jnp.abs(rhs)))
            perturbed = res.x + scale * jax.random.normal(
                key, res.x.shape, res.x.dtype
            )
            return _pressure_solve_once(cfg, lap, rhs, perturbed, tol, adjoint)

        result = jax.lax.cond(result.warn, lambda _: retry(), lambda _: result, None)
    x = result.x.astype(in_dtype) if cfg.dtype is not None else result.x
    x, result = _name_solve_out(x, result)
    return x, result


def _pressure_solve_once(
    cfg: PressureSolver, lap: LaplaceStencil, rhs, guess, tol, adjoint: bool
):
    kind = cfg.preconditioner
    if adjoint and cfg.adjoint_preconditioner != "same":
        kind = cfg.adjoint_preconditioner
    from diffpiso_tpu.parallel import shard_kernels as _sk

    _ctx = _sk.current()
    if (
        _ctx is not None
        and not isinstance(rhs, (tuple, list, dict))
        and getattr(rhs, "ndim", 0) == 2
        and _sk.pressure_eligible(_ctx, rhs.shape, rhs.dtype, kind, adjoint)
    ):
        # distributed PCG with per-shard kernel phases: the matmul
        # -eigenbasis preconditioner runs as sharded contractions +
        # psum_scatter (parallel/halo.py), matvec/update phases as one
        # Pallas launch each (L is symmetric: the adjoint reuses it)
        mm, w = None, None
        if kind is not None:
            precond_fn = _make_pressure_precond(kind, lap)
            mm, w = precond_fn.mm_info
        x, k, rn = _sk.sharded_pressure_pcg(
            _ctx, lap, rhs, guess, tol, cfg.max_iterations,
            cfg.deflate_mean, mm_solver=mm, weights=w,
        )
        tol_ = jnp.asarray(tol, rhs.dtype)
        warn = (~jnp.isfinite(rn)) | (rn > 100.0 * tol_)
        return SolveResult(
            x=x, iterations=k, residual_norm=rn, converged=rn < tol_,
            warn=warn,
        )
    precond = _make_pressure_precond(kind, lap)
    if precond is not None:
        from diffpiso_tpu.solvers.krylov import pcg

        result = pcg(
            lambda p: apply_laplacian(lap, p),
            rhs,
            guess,
            precond=precond,
            tol=tol,
            max_iter=cfg.max_iterations,
            # adjoint solves are cold, converge in a handful of iterations
            # and never early-exit: drop the reset cond (pointless below
            # `residual_reset` iterations, costs kernels every iteration)
            # and the whole-solve early-exit wrapper
            residual_reset=0 if adjoint else cfg.residual_reset,
            deflate_mean=cfg.deflate_mean,
            # spectral preconditioners zero the k=0 mode -> output is
            # mean-free already; skip the explicit projection kernels
            precond_zero_mean=kind in ("fft", "dct", "fft_mm", "dct_mm"),
            early_exit=not adjoint,
            stencil=lap,
            precond_mm=getattr(precond, "mm_info", None),
        )
    else:
        result = cg(
            lambda p: apply_laplacian(lap, p),
            rhs,
            guess,
            tol=tol,
            max_iter=cfg.max_iterations,
            residual_reset=cfg.residual_reset,
            deflate_mean=cfg.deflate_mean,
            stencil=lap,
        )
    return result


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def solve_pressure_system(cfg: PressureSolver, laplacian, rhs, guess, tol):
    """Solve L p = rhs. Returns (p, iterations, warn)."""
    x, result = _pressure_solve_impl(cfg, laplacian, rhs, guess, tol)
    return x, result.iterations, result.warn


def _pressure_fwd(cfg, laplacian, rhs, guess, tol):
    x, result = _pressure_solve_impl(cfg, laplacian, rhs, guess, tol)
    return (x, result.iterations, result.warn), _name_solve_res(
        (laplacian, guess, result.warn, tol))


def _pressure_bwd(cfg, residuals, cotangents):
    laplacian, guess, warn, tol = residuals
    g, _g_iters, _g_warn = cotangents
    # L is symmetric: the adjoint solve reuses the forward operator
    adj_tol = _adjoint_tol(tol, g)
    db, adj_result = _pressure_solve_impl(
        cfg, laplacian, g, None, adj_tol, adjoint=True
    )
    # gate on the forward warn (linear_solver.py:173 semantics) AND on an
    # outright adjoint failure (non-finite or residual past the 100*tol
    # failed-solve criterion the forward restart uses) — a diverged adjoint
    # is finite garbage the training loop's NaN check would never see
    adj_failed = adj_result.warn | (
        adj_result.residual_norm > 100.0 * jnp.asarray(adj_tol, db.dtype)
    )
    gate = (1.0 - warn.astype(db.dtype)) * (1.0 - adj_failed.astype(db.dtype))
    db = db * gate
    return (
        _zeros_like_tree(laplacian),
        db,
        _zeros_like_tree(guess),
        jnp.zeros_like(tol),
    )


solve_pressure_system.defvjp(_pressure_fwd, _pressure_bwd)


# -- adjoint warm-start channel (VERDICT r2 item 8) ---------------------------------
# MEASURED RESULT (r3, 512^2 turb grad30 on the TPU, within-process A/B):
# 0.996x pre-whole-solve kernels; RE-MEASURED r3b after the whole-solve
# kernels exposed the adjoint solves as 0.139 ms/ustep vs the forward's
# 0.051 (runs/trace2d_grad.py): 1510 vs 1501 grad30 (+0.6%, parity 9e-7,
# runs/ab_adjoint_ws.log) — the cold spectral-preconditioned adjoints
# already sit at ~1-2 iterations, so the channel shaves little; the
# fwd/adjoint cost gap is iteration count the preconditioner cannot
# remove (consecutive cotangents correlate less than consecutive
# pressure increments). r5, 3-D: measured NEGATIVE at 256^3 grad10 under
# the outputs-remat protocol (8.73 vs 8.83, runs/ab_ws3d.log) — the 5
# extra carry volumes/step cost more than the ~1-2 cold launches the
# diagonally-dominant momentum adjoint would save. The channels are
# kept: they are exact, cost only zeros in the primal, and pay off
# whenever the adjoint solver is NOT spectrally preconditioned or runs
# at tolerances with high cold counts.
# The backward scan of an unrolled rollout solves one pressure adjoint per
# corrector per step from a COLD start (the forward's p_inc warm starts,
# linear_solver.py:149, have no backward analog in the reference).
# Consecutive backward steps' cotangents are highly correlated, so the
# previous adjoint solution is an excellent guess — but a custom_vjp cannot
# carry state between backward-scan iterations directly. The channel trick:
# the solve takes an extra input `adj_channel` and returns an extra output
# `adj_out` (primal value: zeros, never used). Callers wire the scan carry
# `channel(t+1) = out.adj_out(t)`. Under reverse-mode AD that identity
# chain runs BACKWARD: the cotangent flowing into step t's adj_out is
# whatever step t+1's backward emitted for its adj_channel — which our bwd
# rule sets to the (gated) adjoint solution. So each backward step receives
# the previous (later-in-time) adjoint solution as its warm-start guess,
# and the chain terminates cold (zero cotangent from the loss) at the last
# step, exactly like the forward p_inc chain terminates at zeros.


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def solve_pressure_system_ws(cfg: PressureSolver, laplacian, rhs, guess, tol,
                             adj_channel):
    """solve_pressure_system plus the adjoint warm-start channel.

    Returns (p, iterations, warn, adj_out). Wire `adj_out` into the next
    step's `adj_channel` through the rollout scan carry (both are
    rhs-shaped; primal values are zeros and cost nothing)."""
    x, result = _pressure_solve_impl(cfg, laplacian, rhs, guess, tol)
    return x, result.iterations, result.warn, jnp.zeros_like(rhs)


def _pressure_ws_fwd(cfg, laplacian, rhs, guess, tol, adj_channel):
    x, result = _pressure_solve_impl(cfg, laplacian, rhs, guess, tol)
    return (
        (x, result.iterations, result.warn, jnp.zeros_like(rhs)),
        _name_solve_res((laplacian, guess, result.warn, tol)),
    )


def _pressure_ws_bwd(cfg, residuals, cotangents):
    laplacian, guess, warn, tol = residuals
    g, _g_iters, _g_warn, adj_guess = cotangents
    adj_tol = _adjoint_tol(tol, g)
    # adj_guess is the NEXT backward step's adjoint solution (zeros at the
    # chain end): the warm start this whole construction exists to deliver
    db, adj_result = _pressure_solve_impl(
        cfg, laplacian, g, adj_guess, adj_tol, adjoint=True
    )
    adj_failed = adj_result.warn | (
        adj_result.residual_norm > 100.0 * jnp.asarray(adj_tol, db.dtype)
    )
    gate = (1.0 - warn.astype(db.dtype)) * (1.0 - adj_failed.astype(db.dtype))
    db = db * gate
    return (
        _zeros_like_tree(laplacian),
        db,
        _zeros_like_tree(guess),
        jnp.zeros_like(tol),
        db,  # channel cotangent -> previous backward step's warm start
    )


solve_pressure_system_ws.defvjp(_pressure_ws_fwd, _pressure_ws_bwd)
