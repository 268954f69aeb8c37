"""Differentiable closure training.

TPU-native re-design of the reference's training engine
(diffpiso/combined_training_integrated.py:27-478):

  make_rollout_fn  <- run_piso_steps (:396-478): unrolled NN-closure + PISO
                      steps as one lax.scan, TBPTT via stop_gradient every
                      loss_influence_range steps (:436-438)
  make_train_step  <- the gradient/apply machinery (:74-83, 188-198) — but
                      gradients never leave the device: NaN checks and
                      warn-gated update skipping happen in-graph instead of
                      the reference's fetch-grads-to-numpy-and-feed-back
                      two-phase update
  training_run     <- the epoch loop (:158-384): last-working checkpoints,
                      warn-triggered parameter restore (+ optimizer re-init,
                      the analog of the reference's Adam reinit / graph
                      rebuild), intermediate-eval rollback when the L2 jumps
                      20x (:301-303), lr decay per epoch (:369-380)
"""

from __future__ import annotations

import dataclasses
import os
import pickle
import time
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffpiso_tpu.core.piso import piso_step
from diffpiso_tpu.core.setups import MixingLayerSetup
from diffpiso_tpu.fields.grid import StaggeredField
from diffpiso_tpu.learning.losses import (
    l2_field_loss,
    multistep_averaging_loss,
    spectral_energy_loss,
    strain_rate_loss,
)
from diffpiso_tpu.models.networks import fullyconv_apply
from diffpiso_tpu.ops.fv import centered_to_faces, fv_gradient


@dataclasses.dataclass(frozen=True)
class TrainingConfig:
    """Knobs mirroring training_dict
    (spatial_mixing_layer_differentiable_training.py:30-62)."""

    step_count: int = 10
    loss_influence_range: int = 10
    learning_rate: float = 1e-5
    lr_decay: float = 0.4
    epochs: int = 2
    pressure_included: bool = True
    padding: str = "VALID"
    restore_shape: bool = True
    buffer_width: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))
    # loss weights [L2, spectral, strain-rate, multistep] (:52)
    loss_factors: Tuple[float, float, float, float] = (50.0, 0.5, 2.0, 0.5)
    advection_tol: float = 1e-6
    pressure_tol: float = 1e-6
    checkpoint_every: int = 100
    rollback_threshold: float = 20.0
    perturb_inlet: bool = True
    eval_interval: int = 0  # 0 disables intermediate forward evals
    # mixed precision for the closure CNN only: 'bfloat16' runs the convs on
    # the MXU at 2x f32 rate with f32 master weights; the solver stays f32
    # (the physics tolerances need it). None = f32 throughout.
    network_dtype: Optional[str] = None
    # >1: run this many sequential training iterations per jit call
    # (make_chunked_train_step) — amortizes the ~26 ms/dispatch tunnel cost
    # that otherwise dominates the ~3-4 ms training iteration. Host-side
    # warn recovery / checkpoint / eval side effects then act on the
    # post-chunk state (updates of warned iterations are still skipped
    # in-graph per iteration, exactly as at scan_chunk=1).
    scan_chunk: int = 1
    # Rollout remat policy: "outputs" wraps each rollout step in
    # jax.checkpoint(policy=save_only_these_names('diffpiso_solve_out')) —
    # the backward keeps only the solve outputs + scan carries and replays
    # the assembly/FV chains, never a Krylov loop (the r5 bench grad
    # protocol: +16% grad30 at turb512, runs/ab_remat512.log; gradient
    # parity pinned by tests/test_gradient_fidelity.py). "none" stores the
    # full forward; "step" is whole-step remat (max memory savings, solve
    # replays). TPU training A/B at 64x256 (runs/ab_train_remat.log):
    # "outputs" wins +57% at batch 1 (38.9 -> 62.3 it/s; chunked 48 ->
    # 87.8) but loses ~5% under the batch-8 vmapped rollout (134 -> 127
    # samples/s — the replay re-runs per-SAMPLE work while the stash it
    # saves amortized across the batch), so prefer "none" for vmapped
    # batched training. DIFFPISO_TRAIN_REMAT overrides.
    remat: str = "outputs"


def _centered_gradient(p: jax.Array, dx) -> jax.Array:
    """Central-difference pressure gradient at cell centers, channels (d/dy,
    d/dx) — the reference's CenteredGrid.gradient() used for the NN input
    (run_piso_steps, combined_training_integrated.py:403)."""
    outs = []
    for d in range(p.ndim):
        pad = [(0, 0)] * p.ndim
        pad[d] = (1, 1)
        pp = jnp.pad(p, pad, mode="edge")
        hi = jax.lax.slice_in_dim(pp, 2, pp.shape[d], axis=d)
        lo = jax.lax.slice_in_dim(pp, 0, pp.shape[d] - 2, axis=d)
        outs.append((hi - lo) / (2.0 * float(dx[d])))
    return jnp.stack(outs, axis=-1)


def make_rollout_fn(setup: MixingLayerSetup, cfg: TrainingConfig, with_network: bool = True):
    """Returns rollout(params, vel0, p0, perturbations) ->
    (velocity_rollout (time-major StaggeredField), pressure_rollout, warn_any).

    The NN sees the pre-sponge region only and its forcing is zero-padded
    over the sponge (neural_network_wrapper,
    spatial_mixing_layer_differentiable_training.py:6-10)."""
    domain = setup.domain
    sponge_start = setup.sponge_start
    nx = domain.resolution[1]
    L = max(1, cfg.loss_influence_range)

    def nn_forcing(params, vel, p):
        nn_in = vel.at_centers()
        if cfg.pressure_included:
            nn_in = jnp.concatenate(
                [nn_in, _centered_gradient(p, domain.dx)], axis=-1
            )
        nn_in = nn_in[:, :sponge_start, :]
        nn_out = fullyconv_apply(
            params,
            nn_in,
            padding=cfg.padding,
            buffer_width=cfg.buffer_width,
            restore_shape=cfg.restore_shape,
            compute_dtype=jnp.dtype(cfg.network_dtype) if cfg.network_dtype else None,
        )
        nn_out = jnp.pad(nn_out, ((0, 0), (0, nx - sponge_start), (0, 0)))
        return StaggeredField(
            (
                centered_to_faces(nn_out[..., 0], 0),
                centered_to_faces(nn_out[..., 1], 1),
            )
        )

    def step_core(params, vel, p, pert):
        forcing = nn_forcing(params, vel, p) if with_network else None
        dv = setup.dirichlet_values(pert)
        out = piso_step(
            vel,
            p,
            setup.dt,
            domain,
            setup.sim,
            dirichlet_values=dv,
            forcing_term=forcing,
            advection_tol=cfg.advection_tol,
            pressure_tol=cfg.pressure_tol,
        )
        return out.velocity, out.pressure, out.warn

    import os

    remat = os.environ.get("DIFFPISO_TRAIN_REMAT",
                           getattr(cfg, "remat", "outputs"))
    if remat == "outputs":
        step_core = jax.checkpoint(
            step_core,
            policy=jax.checkpoint_policies.save_only_these_names(
                "diffpiso_solve_out"),
        )
    elif remat == "step":
        step_core = jax.checkpoint(step_core)

    def rollout(params, vel0, p0, perturbations):
        def body(carry, inp):
            vel, p, warn_acc = carry
            idx, pert = inp
            # TBPTT: cut the gradient tape every L steps (:436-438)
            cut = (idx > 0) & (idx % L == 0)
            vel = jax.tree_util.tree_map(
                lambda a: jnp.where(cut, jax.lax.stop_gradient(a), a), vel
            )
            p = jnp.where(cut, jax.lax.stop_gradient(p), p)

            vel_out, p_out, warn = step_core(params, vel, p, pert)
            return (vel_out, p_out, warn_acc | warn), (
                vel_out,
                p_out,
            )

        idxs = jnp.arange(cfg.step_count)
        (velT, pT, warn_any), (vels, ps) = jax.lax.scan(
            body, (vel0, p0, jnp.zeros((), bool)), (idxs, perturbations)
        )
        return vels, ps, warn_any

    return rollout


def rollout_targets_from_tensor(seq: jax.Array) -> StaggeredField:
    """(T, ny+1, nx+1, 2) stacked tensors -> time-major StaggeredField."""
    v = seq[:, :, :-1, 0]
    u = seq[:, :-1, :, 1]
    return StaggeredField((v, u))


def make_loss_fn(setup: MixingLayerSetup, cfg: TrainingConfig, rollout_fn):
    lf = cfg.loss_factors
    sponge = setup.sponge_start

    def loss_fn(params, vel0, p0, targets: StaggeredField, perturbations):
        vels, ps, warn = rollout_fn(params, vel0, p0, perturbations)
        total = jnp.zeros(())
        parts = []
        if lf[0]:
            c = jnp.sum(l2_field_loss(vels, targets, None, lf[0], sponge))
            total, parts = total + c, parts + [c]
        else:
            parts.append(jnp.zeros(()))
        if lf[1]:
            c = jnp.sum(
                spectral_energy_loss(
                    vels, targets, ((0, 0), (0, 0)), lf[1], sponge
                )
            )
            total, parts = total + c, parts + [c]
        else:
            parts.append(jnp.zeros(()))
        if lf[2]:
            c = jnp.sum(strain_rate_loss(vels, targets, setup.domain.dx, lf[2]))
            total, parts = total + c, parts + [c]
        else:
            parts.append(jnp.zeros(()))
        if lf[3]:
            c = jnp.sum(
                multistep_averaging_loss(
                    vels, targets, ((0, 0), (0, 0)), lf[3], cfg.loss_influence_range
                )
            )
            total, parts = total + c, parts + [c]
        else:
            parts.append(jnp.zeros(()))
        return total, (warn, jnp.stack(parts))

    return loss_fn


def make_train_step(loss_fn, optimizer):
    @jax.jit
    def train_step(params, opt_state, vel0, p0, targets, perturbations):
        (loss, (warn, parts)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, vel0, p0, targets, perturbations
        )
        finite = jnp.all(
            jnp.stack(
                [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]
            )
        )
        ok = jnp.logical_and(~warn, finite)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # warn / non-finite grads -> skip the update entirely
        # (the in-graph form of combined_training_integrated.py:188-198)
        params_out = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_params, params
        )
        opt_out = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_opt_state, opt_state
        )
        return params_out, opt_out, loss, parts, warn

    return train_step


def make_chunked_train_step(loss_fn, optimizer, chunk: int):
    """`chunk` SEQUENTIAL training iterations inside ONE jit call (lax.scan
    over stacked samples, carrying params + optimizer state).

    Why: every dispatched jit call costs ~25-30 ms through the tunneled
    runtime regardless of device work (CLAUDE.md cost model), so the
    per-call reference protocol (combined_training_integrated.py:188 — one
    session.run per iteration) is dispatch-bound: the 64x256 training
    iteration is ~3-4 ms of device work inside a ~26 ms wall. Scanning the
    optimizer loop amortizes the dispatch exactly like the simulation
    benches amortize over 200-step scan chunks. This is the sequential-SGD
    twin of make_batched_train_step (which averages ONE update over a
    batch); semantics match `chunk` consecutive make_train_step calls:
    per-iteration warn/non-finite gating skips that iteration's update
    in-graph. The host-level restore-after-2-warns policy (training_run)
    applies at chunk boundaries from the returned per-iteration warn array.

    train_chunk(params, opt_state, vel0s, p0s, targets, perts) — every
    sample input stacked on a leading `chunk` axis — returns
    (params, opt_state, losses[chunk], parts[4, chunk-ish pytree],
    warns[chunk])."""

    @jax.jit
    def train_chunk(params, opt_state, vel0s, p0s, targets, perts):
        def body(carry, inp):
            params, opt_state = carry
            v0, p0, t, pe = inp
            (loss, (warn, parts)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, v0, p0, t, pe)
            finite = jnp.all(
                jnp.stack(
                    [jnp.all(jnp.isfinite(g))
                     for g in jax.tree_util.tree_leaves(grads)]
                )
            )
            ok = jnp.logical_and(~warn, finite)
            updates, new_opt = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            params_out = jax.tree_util.tree_map(
                lambda n, o: jnp.where(ok, n, o), new_params, params
            )
            opt_out = jax.tree_util.tree_map(
                lambda n, o: jnp.where(ok, n, o), new_opt, opt_state
            )
            return (params_out, opt_out), (loss, parts, warn)

        (params, opt_state), (losses, parts, warns) = jax.lax.scan(
            body, (params, opt_state), (vel0s, p0s, targets, perts)
        )
        return params, opt_state, losses, parts, warns

    return train_chunk


def _batched_pallas_mode(vel0, threshold=512 * 512):
    """Trace-time gate for the batched-vmap pallas kernels
    (DIFFPISO_BATCHED_PALLAS: auto | never | size [default]).

    'size' resolves from the per-sample PLANE size of the batched velocity
    (leaves carry a leading batch axis, so a 2-D sample is a rank-3 leaf):
    'auto' once the largest component plane reaches the measured winning
    scale (512^2 — batch-4 A/B fwd +29%, grad10 +23%, 2 full interleaved
    reps, runs/ab_batched_512_r4.log), 'fold' below it: all-XLA (the
    grid-over-batch kernels measured -7% there,
    runs/ab_batched_pallas.log) EXCEPT the batch-FOLDED whole-solve
    momentum kernel — one program holding all B samples' planes in VMEM
    (pallas_krylov jac2_fold) — which replaces the intercept-bound solve
    while-loops. Rank-4 leaves (batched 3-D volumes) resolve to 'never':
    no 3-D batched A/B exists, and the trailing-two-axes product would
    misclassify a 64^3 volume as a 512^2 plane."""
    mode = os.environ.get("DIFFPISO_BATCHED_PALLAS", "size")
    if mode != "size":
        return mode
    elems = 0
    for a in jax.tree_util.tree_leaves(vel0):
        shape = getattr(a, "shape", ())
        if len(shape) > 3:
            return "never"
        if len(shape) == 3:
            elems = max(elems, int(np.prod(shape[-2:])))
    if elems >= threshold:
        return "auto"
    if os.environ.get("DIFFPISO_FUSED_JAC2_FOLD", "auto") == "never":
        return "never"
    return "fold"


def make_batched_train_step(loss_fn, optimizer, mesh=None,
                            force_no_pallas=False):
    """Data-parallel training step over a leading batch axis — the designed
    -in fix for the reference's batch_size=1 limitation (SURVEY.md par.2.5:
    solvers declare supports_batch=False, combined_training_integrated.py
    feeds single samples). Per-sample losses/grads come from vmap; samples
    whose solve warned or produced non-finite grads are masked OUT of the
    batch mean (the batched generalization of the reference's skip-update
    policy) instead of poisoning the whole step. With `mesh`, the batch axis
    is sharded over mesh axis 'data' (pjit DP: gradients all-reduce
    automatically).

    force_no_pallas (set automatically when `mesh` is given, and by
    make_sharded_train_step) overrides the batched-pallas size gate: a
    GSPMD-sharded trace cannot partition pallas_call
    (ops/pallas_stencil.py no_pallas), so sharded steps always trace the
    roll/reduction formulation regardless of per-sample plane size."""
    force_no_pallas = force_no_pallas or (mesh is not None)

    def _body(params, opt_state, vel0, p0, targets, perts):
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shard = lambda t: jax.tree_util.tree_map(
                lambda a: jax.lax.with_sharding_constraint(
                    a, NamedSharding(mesh, P("data"))
                ),
                t,
            )
            vel0, p0, targets, perts = map(shard, (vel0, p0, targets, perts))

        # Per-sample grads, masked individually: a warned solve usually
        # yields non-finite fields, so a batch-mean loss would be NaN and
        # NaN*0 stays NaN under reverse-mode — masking must happen on the
        # per-sample gradients, not the summed loss.
        def one(v, pp, t, pe):
            (loss, (warn, parts)), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, v, pp, t, pe
            )
            g_finite = jnp.all(
                jnp.stack(
                    [jnp.all(jnp.isfinite(x)) for x in jax.tree_util.tree_leaves(g)]
                )
            )
            valid = jnp.logical_and(~warn, jnp.isfinite(loss) & g_finite)
            return loss, warn, parts, g, valid

        # The whole-solve kernels (fused_jacobi1/2_solve, fused_pcg2_solve)
        # batch under vmap via explicit grid-over-batch custom_vmap rules
        # (one program per sample, each with its own while-loop), and
        # DIFFPISO_BATCHED_PALLAS=auto traces the batched rollout with them
        # on (batched_safe_pallas keeps only rule-carrying kernels).
        # Default: SIZE-gated, both regimes measured with 2 full
        # interleaved reps each. Small per-sample planes lose (batch-8
        # 64x256: 124 vs 134
        # samples/s, runs/ab_batched_pallas.log) — the grid serializes one
        # small program per sample while the all-XLA formulation fuses
        # across the batch. Production-scale planes win (batch-4 512^2:
        # fwd 2054-2085 vs 1599-1613, grad10 751-764 vs 614-616
        # sample-steps/s, runs/ab_batched_512_r4.log; the r3 log had one
        # truncated grad rep) — each program saturates the core, so
        # grid serialization costs nothing and the whole-solve kernels'
        # launch/HBM savings carry over. Threshold = the measured winning
        # scale (512^2 per-sample component planes).
        from diffpiso_tpu.ops.pallas_stencil import (
            batched_safe_pallas,
            fold_only_pallas,
            no_pallas,
        )
        import contextlib

        batched_mode = "never" if force_no_pallas else _batched_pallas_mode(vel0)
        with contextlib.ExitStack() as stack:
            if batched_mode == "auto":
                stack.enter_context(batched_safe_pallas())
            else:
                stack.enter_context(no_pallas())
                if batched_mode == "fold":
                    # small-plane batched trace: all-XLA except the
                    # batch-folded whole-solve momentum kernel
                    stack.enter_context(fold_only_pallas())
            losses, warns, parts, grads, valids = jax.vmap(one)(
                vel0, p0, targets, perts
            )
        w = valids.astype(losses.dtype)
        denom = jnp.maximum(jnp.sum(w), 1.0)
        loss = jnp.sum(jnp.where(valids, losses, 0.0)) / denom

        def mask_mean(g):
            wb = w.reshape((-1,) + (1,) * (g.ndim - 1))
            return jnp.sum(jnp.where(wb > 0, g, 0.0), axis=0) / denom

        grads = jax.tree_util.tree_map(mask_mean, grads)
        ok = jnp.any(valids)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        params_out = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_params, params
        )
        opt_out = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_opt_state, opt_state
        )
        return params_out, opt_out, loss, parts, warns

    train_step = jax.jit(_body)
    train_step._body = _body  # reused by make_batched_train_chunk
    return train_step


def make_batched_train_chunk(loss_fn, optimizer, chunk: int, mesh=None,
                             force_no_pallas=False):
    """`chunk` SEQUENTIAL batched training iterations inside ONE jit call:
    the composition of make_chunked_train_step (scan amortizes the
    ~25-30 ms per-jit-call tunnel dispatch — CLAUDE.md cost model) with
    make_batched_train_step (per-sample-masked vmapped updates). The r3
    training profile left these as separate paths while 36 of 84.9 ms per
    batch-8 64x256 iteration was dispatch + batch-independent work
    (VERDICT r3 item 8); scanning the batched update is the fix for the
    dispatch share. Measured (runs/ab_batched_chunk.log, 2 interleaved
    reps at batch-8 64x256): chunk-8 17.84 it/s (142.7 samples/s) vs
    17.09-17.17 per-call — +4%. The modest win quantifies the r3
    profile's split: most of the 36 ms fixed share is batch-INDEPENDENT
    DEVICE work (preconditioner setup, assembly, optimizer) that
    scanning cannot remove, not tunnel dispatch — the scan removes only
    the ~2-3 ms/call dispatch share at this already-one-jit-per-iter
    workload.

    train_chunk(params, opt_state, vel0s, p0s, targets, perts) — inputs
    stacked (chunk, batch, ...) — returns (params, opt_state,
    losses[chunk], parts, warns[chunk, batch])."""
    inner = make_batched_train_step(
        loss_fn, optimizer, mesh=mesh, force_no_pallas=force_no_pallas
    )._body

    @jax.jit
    def train_chunk(params, opt_state, vel0s, p0s, targets, perts):
        def body(carry, inp):
            params, opt_state = carry
            v0, p0, t, pe = inp
            params, opt_state, loss, parts, warns = inner(
                params, opt_state, v0, p0, t, pe
            )
            return (params, opt_state), (loss, parts, warns)

        (params, opt_state), (losses, parts, warns) = jax.lax.scan(
            body, (params, opt_state), (vel0s, p0s, targets, perts)
        )
        return params, opt_state, losses, parts, warns

    return train_chunk


def make_sharded_train_step(loss_fn, optimizer, mesh, example_batch,
                            spatial_axes=("space",), leading_axes=("data",)):
    """Multi-chip training step: data-parallel batch x spatial grid
    decomposition on the PaddedSpatialLayout (parallel/sharding.py) — the
    library-level form of the dryrun's sharded step (__graft_entry__.py).

    example_batch — (vel0, p0, targets, perts) with the TRUE (unpadded)
    shapes (arrays or ShapeDtypeStructs). Place inputs with the returned
    layout: `padded = layout.put(layout.pad(batch))`; the step unpads
    inside the jit, runs the batched per-sample-masked update (same
    semantics as make_batched_train_step), and GSPMD inserts the halo
    collective-permutes / gradient psums. The inner step is built with
    force_no_pallas=True so the trace always takes the roll/reduction
    formulation (GSPMD cannot partition pallas_call) — the batched-pallas
    size gate never applies to sharded traces.

    Returns (train_step, layout); train_step(params, opt_state,
    padded_batch) -> (params, opt_state, loss, parts, warns)."""
    from diffpiso_tpu.parallel.sharding import PaddedSpatialLayout

    layout = PaddedSpatialLayout(
        mesh, spatial_axes=spatial_axes, leading_axes=leading_axes
    )
    inner = make_batched_train_step(loss_fn, optimizer, force_no_pallas=True)

    @jax.jit
    def train_step(params, opt_state, padded_batch):
        vel0, p0, targets, perts = layout.unpad(padded_batch, example_batch)
        return inner(params, opt_state, vel0, p0, targets, perts)

    return train_step, layout


def stack_samples(setup, cfg, samples):
    """Stack per-sample device tuples from _sample_to_device into batched
    arrays for make_batched_train_step."""
    devs = [_sample_to_device(setup, cfg, s) for s in samples]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *devs)


def save_params(path: str, params):
    """Single-artifact param export. Orbax directory when available (the
    unified checkpoint backend, utils/checkpoint.py), pickle file otherwise;
    load_params auto-detects either layout."""
    from diffpiso_tpu.utils.checkpoint import _ORBAX

    params = jax.tree_util.tree_map(np.asarray, params)
    if _ORBAX:
        import orbax.checkpoint as ocp
        import shutil

        path = os.path.abspath(path)
        if os.path.exists(path):
            (shutil.rmtree if os.path.isdir(path) else os.remove)(path)
        ocp.PyTreeCheckpointer().save(path, params)
    else:  # pragma: no cover
        with open(path, "wb") as f:
            pickle.dump(params, f)


def load_params(path: str):
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        return ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    with open(path, "rb") as f:
        return pickle.load(f)


def _sample_to_device(setup, cfg, sample):
    vel_seq, p_seq, characs = sample
    vel0 = StaggeredField(
        (
            jnp.asarray(vel_seq[0, :, :-1, 0]),
            jnp.asarray(vel_seq[0, :-1, :, 1]),
        )
    )
    p0 = jnp.asarray(p_seq[0])
    targets = rollout_targets_from_tensor(jnp.asarray(vel_seq[1:]))
    data_time = float(characs[0])
    amps = tuple(float(a) for a in characs[1:]) or (0.082, 0.018)
    if cfg.perturb_inlet:
        perts = jnp.stack(
            [
                setup.perturbation(data_time + t * setup.dt, amps)
                for t in range(cfg.step_count)
            ]
        )
    else:
        perts = jnp.zeros((cfg.step_count, setup.domain.resolution[0] + 2))
    return vel0, p0, targets, perts


def _pack_hist(values):
    # orbax rejects zero-size arrays — prefix with the element count
    vals = np.asarray(values, np.float64)
    return np.concatenate([[float(vals.size)], vals])


def _unpack_hist(arr):
    arr = np.atleast_1d(np.asarray(arr, np.float64))
    return list(arr[1 : 1 + int(arr[0])])


def _train_ckpt_state(params, opt_state, epoch, it, lr, loss_hist, val_hist):
    """Full-train-state pytree for CheckpointManager — everything needed to
    resume an interrupted epoch exactly: params, optimizer state, position
    (epoch, iteration), current lr and loss curves."""
    return {
        "params": jax.tree_util.tree_map(np.asarray, params),
        "opt_state": jax.tree_util.tree_map(np.asarray, opt_state),
        "epoch": np.int64(epoch),
        "iteration": np.int64(it),
        "lr": np.float64(lr),
        "loss_history": _pack_hist(loss_hist),
        "val_history": _pack_hist(val_hist),
    }


def training_run(
    base_dir: str,
    setup: MixingLayerSetup,
    cfg: TrainingConfig,
    params,
    train_dataset,
    val_dataset=None,
    log_fn=print,
    resume: bool = False,
):
    """Epoch loop with warn recovery, checkpointing, and lr decay. Returns
    (params, train_loss_history, val_loss_history).

    All checkpoints go through utils/checkpoint.CheckpointManager (orbax):
    full-train-state step checkpoints in <base_dir>/checkpoints every
    cfg.checkpoint_every good iterations and at each epoch end, the
    'last_working' rolling tag (reference model_last_working,
    combined_training_integrated.py:193), and per-epoch 'epoch_<E>' tags
    (:264,369). With resume=True the latest step checkpoint is restored —
    params + optimizer state + position — and the run continues mid-epoch
    (sample order is deterministic per epoch, so the skip is exact)."""
    from diffpiso_tpu.utils.checkpoint import CheckpointManager

    os.makedirs(base_dir, exist_ok=True)
    mgr = CheckpointManager(os.path.join(base_dir, "checkpoints"))
    rollout_fn = make_rollout_fn(setup, cfg)
    loss_fn = make_loss_fn(setup, cfg, rollout_fn)

    lr = cfg.learning_rate
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    opt_state = optimizer.init(params)
    train_step = make_train_step(loss_fn, optimizer)
    train_chunk = (
        make_chunked_train_step(loss_fn, optimizer, cfg.scan_chunk)
        if cfg.scan_chunk > 1 else None
    )
    eval_loss = jax.jit(
        lambda p, v0, p0, t, pe: loss_fn(p, v0, p0, t, pe)[0]
    )

    loss_history, val_history = [], []
    start_epoch, resume_it = 0, -1
    if resume and mgr.latest_step() is not None:
        # two-phase restore: raw first (gives exact shapes for the metadata
        # arrays), then re-restore with the live params/opt_state spliced in
        # as the structure target so optax NamedTuple states round-trip
        raw = mgr.restore()
        target = dict(raw)
        target["params"] = params
        target["opt_state"] = opt_state
        st = mgr.restore(target=target)
        params = jax.tree_util.tree_map(jnp.asarray, st["params"])
        opt_state = st["opt_state"]
        start_epoch, resume_it = int(st["epoch"]), int(st["iteration"])
        lr = float(st["lr"])
        loss_history = _unpack_hist(st["loss_history"])
        val_history = _unpack_hist(st["val_history"])
        log_fn(f"[train] resumed from step {mgr.latest_step()} "
               f"(epoch {start_epoch}, iteration {resume_it})")

    last_working = jax.tree_util.tree_map(np.asarray, params)
    consecutive_warns = 0
    prev_eval = None

    def bookkeep(epoch, it, loss, warn):
        """Per-iteration host bookkeeping: warn recovery, checkpoints,
        intermediate evals. In chunked mode (cfg.scan_chunk>1) this runs
        after the chunk for each iteration it contained, acting on the
        post-chunk params (the in-graph per-iteration skip already guarded
        the updates themselves)."""
        nonlocal params, opt_state, consecutive_warns, last_working, prev_eval
        global_step = epoch * len(train_dataset) + it
        loss_history.append(float(loss))
        if bool(warn):
            consecutive_warns += 1
            log_fn(f"[train] e{epoch} i{it} WARN (solver failure), update skipped")
            if consecutive_warns >= 2:
                # reference: restore last-working weights + Adam re-init
                # (graph rebuild analog, :199-257)
                params = jax.tree_util.tree_map(jnp.asarray, last_working)
                opt_state = optimizer.init(params)
                opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
                consecutive_warns = 0
                log_fn(f"[train] e{epoch} i{it} restored last-working params")
        else:
            consecutive_warns = 0
            if it % cfg.checkpoint_every == 0:
                last_working = jax.tree_util.tree_map(np.asarray, params)
                state = _train_ckpt_state(
                    params, opt_state, epoch, it, lr, loss_history, val_history
                )
                # it == 0 would collide with the previous epoch-end save
                # (global_step epoch*len == (prev_epoch+1)*len) and
                # silently overwrite it — the epoch-boundary state is
                # already durable, so only the rolling tag updates here
                if it > 0:
                    mgr.save(global_step, state)
                mgr.save_tag("last_working", state)
                np.savez(
                    os.path.join(base_dir, "training_loss_progression.npz"),
                    np.asarray(loss_history),
                )
        if cfg.eval_interval and it > 0 and it % cfg.eval_interval == 0 and val_dataset is not None:
            v_sample = val_dataset.sample(0)
            ev = float(eval_loss(params, *_sample_to_device(setup, cfg, v_sample)))
            if prev_eval is not None and ev > cfg.rollback_threshold * prev_eval:
                params = jax.tree_util.tree_map(jnp.asarray, last_working)
                log_fn(f"[train] eval jumped {ev:.3g} > {cfg.rollback_threshold}x, rolled back")
            else:
                prev_eval = ev
                mgr.save_tag(
                    f"eval_e{epoch}_i{it}",
                    _train_ckpt_state(
                        params, opt_state, epoch, it, lr, loss_history, val_history
                    ),
                )

    for epoch in range(start_epoch, cfg.epochs):
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        t_epoch = time.perf_counter()
        pending = []  # (it, device_sample) awaiting a full scan chunk
        for it, sample in enumerate(train_dataset.iterate(shuffle=True, seed=epoch)):
            if epoch == start_epoch and it <= resume_it:
                continue  # deterministic per-epoch order -> exact mid-epoch skip
            dev = _sample_to_device(setup, cfg, sample)
            if train_chunk is not None:
                pending.append((it, dev))
                if len(pending) == cfg.scan_chunk:
                    stacked = jax.tree_util.tree_map(
                        lambda *xs: jnp.stack(xs), *[q[1] for q in pending]
                    )
                    params, opt_state, losses, parts, warns = train_chunk(
                        params, opt_state, *stacked
                    )
                    losses = np.asarray(losses)
                    warns = np.asarray(warns)
                    for j, (cit, _) in enumerate(pending):
                        bookkeep(epoch, cit, losses[j], warns[j])
                    pending = []
                continue
            vel0, p0, targets, perts = dev
            params, opt_state, loss, parts, warn = train_step(
                params, opt_state, vel0, p0, targets, perts
            )
            bookkeep(epoch, it, loss, warn)
        # tail samples that didn't fill a chunk run as single steps
        for cit, (vel0, p0, targets, perts) in pending:
            params, opt_state, loss, parts, warn = train_step(
                params, opt_state, vel0, p0, targets, perts
            )
            bookkeep(epoch, cit, loss, warn)

        # validation sweep (:305-366)
        if val_dataset is not None:
            for sample in val_dataset.iterate(shuffle=False):
                v0, pp0, tg, pe = _sample_to_device(setup, cfg, sample)
                val_history.append(float(eval_loss(params, v0, pp0, tg, pe)))
            np.savez(
                os.path.join(base_dir, "validation_loss_progression.npz"),
                np.asarray(val_history),
            )
        lr = lr * cfg.lr_decay
        state = _train_ckpt_state(
            params, opt_state, epoch + 1, -1, lr, loss_history, val_history
        )
        mgr.save((epoch + 1) * len(train_dataset), state)
        mgr.save_tag(f"epoch_{epoch}", state)
        log_fn(
            f"[train] epoch {epoch} done in {time.perf_counter() - t_epoch:.1f}s, "
            f"mean loss {np.mean(loss_history[-max(1, len(train_dataset)):]):.4g}, next lr {lr:.2e}"
        )
    return params, np.asarray(loss_history), np.asarray(val_history)
