"""End-to-end closure-training test: generate a tiny synthetic dataset with
the solver itself, then run training_run for one epoch and check the
machinery (rollout, losses, grads, checkpoints, warn gating) end to end."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from diffpiso_tpu.core import piso_step, spatial_mixing_layer_setup
from diffpiso_tpu.learning import (
    SequenceDataset,
    TrainingConfig,
    load_params,
    make_loss_fn,
    make_rollout_fn,
    make_train_step,
    training_run,
)
from diffpiso_tpu.models import init_fullyconv


@pytest.fixture(scope="module")
def tiny_setup():
    return spatial_mixing_layer_setup(
        simulation=dict(HRres=(16, 64), box_size=(8.0, 32.0), dt=0.4),
        max_iterations=(100, 200),
    )


@pytest.fixture(scope="module")
def tiny_dataset(tiny_setup, tmp_path_factory):
    """Run the solver forward and store frames in the reference npz layout."""
    path = tmp_path_factory.mktemp("mldata")
    setup = tiny_setup
    vel, p = setup.initial_state()

    @jax.jit
    def step(vel, p, t):
        out = piso_step(
            vel, p, setup.dt, setup.domain, setup.sim,
            dirichlet_values=setup.dirichlet_values(setup.perturbation(t)),
            advection_tol=1e-5, pressure_tol=1e-5,
        )
        return out.velocity, out.pressure

    for i in range(10):
        np.savez(path / f"velocity_{str(i).zfill(6)}.npz", np.asarray(vel.staggered_tensor())[None])
        np.savez(path / f"pressure_{str(i).zfill(6)}.npz", np.asarray(p)[None, ..., None])
        vel, p = step(vel, p, setup.dt * i)
    return str(path) + os.sep


def test_dataset_assembly(tiny_dataset):
    ds = SequenceDataset(
        [tiny_dataset],
        characteristics=[[(i * 0.4, 0.082, 0.018) for i in range(8)]],
        start_frame=[0],
        frame_count=[8],
        step_count=3,
        dt_ratio=1,
    )
    assert len(ds) == 5  # 8 - 3
    vel, pre, ch = ds.sample(0)
    assert vel.shape == (4, 17, 65, 2)
    assert pre.shape == (4, 16, 64)
    assert ch.shape == (3,)


def test_training_one_epoch(tiny_setup, tiny_dataset, tmp_path):
    setup = tiny_setup
    cfg = TrainingConfig(
        step_count=3,
        loss_influence_range=3,
        learning_rate=1e-4,
        epochs=1,
        advection_tol=1e-4,
        pressure_tol=1e-4,
        checkpoint_every=2,
        # the 16-row test grid is smaller than the CNN's VALID receptive
        # field, so use SAME here (the production config uses VALID at 64+)
        padding="SAME",
        restore_shape=False,
    )
    ds = SequenceDataset(
        [tiny_dataset],
        characteristics=[[(i * setup.dt, 0.082, 0.018) for i in range(6)]],
        start_frame=[0],
        frame_count=[6],
        step_count=cfg.step_count,
    )
    params0 = init_fullyconv(jax.random.PRNGKey(0))
    params, hist, val_hist = training_run(
        str(tmp_path), setup, cfg, params0, ds, val_dataset=ds, log_fn=lambda *a: None
    )
    assert len(hist) == len(ds)
    assert np.all(np.isfinite(hist))
    # params actually moved
    diff = sum(
        float(jnp.sum(jnp.abs(a - b))) for a, b in zip(params, params0)
    )
    assert diff > 0
    # checkpoints written through the unified orbax manager and loadable
    from diffpiso_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(os.path.join(str(tmp_path), "checkpoints"))
    assert mgr.has_tag("epoch_0") and mgr.has_tag("last_working")
    st = mgr.restore_tag("epoch_0")
    for a, b in zip(jax.tree_util.tree_leaves(st["params"]), params):
        np.testing.assert_array_equal(a, np.asarray(b))
    assert len(val_hist) == len(ds)


def test_training_resume_mid_epoch(tiny_setup, tiny_dataset, tmp_path):
    """Interrupt-and-resume: restoring the latest full-state checkpoint
    (params + optimizer state + epoch/iteration position) and continuing
    must reproduce the uninterrupted run's final params exactly (the
    orbax unification of the reference's weights-only tf.train.Saver,
    combined_training_integrated.py:152-154,193,264)."""
    import shutil

    setup = tiny_setup
    cfg = TrainingConfig(
        step_count=2,
        loss_influence_range=2,
        learning_rate=1e-4,
        epochs=1,
        advection_tol=1e-4,
        pressure_tol=1e-4,
        checkpoint_every=1,
        padding="SAME",
        restore_shape=False,
    )
    ds = SequenceDataset(
        [tiny_dataset],
        characteristics=[[(i * setup.dt, 0.082, 0.018) for i in range(6)]],
        start_frame=[0],
        frame_count=[6],
        step_count=cfg.step_count,
    )
    params0 = init_fullyconv(jax.random.PRNGKey(0))
    dir_full = os.path.join(str(tmp_path), "full")
    params_full, hist_full, _ = training_run(
        dir_full, setup, cfg, params0, ds, log_fn=lambda *a: None
    )

    # simulate an interruption after iteration 1: drop every checkpoint
    # newer than global step 1, then resume
    ckdir = os.path.join(dir_full, "checkpoints")
    for name in os.listdir(ckdir):
        if name.startswith("step_") and int(name.split("_")[1]) > 1:
            shutil.rmtree(os.path.join(ckdir, name))
    params_res, hist_res, _ = training_run(
        dir_full, setup, cfg, params0, ds, log_fn=lambda *a: None, resume=True
    )
    assert len(hist_res) == len(hist_full)
    np.testing.assert_allclose(hist_res, hist_full, rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(params_res), jax.tree_util.tree_leaves(params_full)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tbptt_truncation_blocks_gradients(tiny_setup):
    """With loss_influence_range=1 the gradient of a loss on step 2 w.r.t.
    the initial state must be zero (tape cut), while full range keeps it."""
    setup = tiny_setup
    base = dict(step_count=2, advection_tol=1e-4, pressure_tol=1e-4, perturb_inlet=False)
    vel0, p0 = setup.initial_state()
    perts = jnp.zeros((2, setup.domain.resolution[0] + 2))

    def last_step_energy(cfg):
        rollout = make_rollout_fn(setup, cfg, with_network=False)

        def f(v0):
            vels, ps, warn = rollout(None, v0, p0, perts)
            return sum(jnp.sum(c[-1] ** 2) for c in vels.components)

        g = jax.grad(f)(vel0)
        return sum(float(jnp.sum(jnp.abs(c))) for c in g.components)

    g_cut = last_step_energy(TrainingConfig(loss_influence_range=1, **base))
    g_full = last_step_energy(TrainingConfig(loss_influence_range=2, **base))
    assert g_cut == 0.0
    assert g_full > 0.0


def test_batched_train_step_matches_and_masks(tiny_setup, tiny_dataset):
    """make_batched_train_step: batch-of-2 loss equals the mean of the
    per-sample losses; warn mask has batch shape."""
    from diffpiso_tpu.learning.training import (
        _sample_to_device,
        make_batched_train_step,
        stack_samples,
    )

    setup = tiny_setup
    cfg = TrainingConfig(
        step_count=2, loss_influence_range=2, padding="SAME",
        loss_factors=(50.0, 0.0, 0.0, 0.0), advection_tol=1e-5,
        pressure_tol=1e-5,
    )
    dataset = SequenceDataset(
        [tiny_dataset],
        characteristics=[[(i * 0.4, 0.082, 0.018) for i in range(8)]],
        start_frame=[0], frame_count=[8], step_count=2, dt_ratio=1,
    )
    from diffpiso_tpu.learning import make_loss_fn, make_rollout_fn, make_train_step

    rollout = make_rollout_fn(setup, cfg)
    loss_fn = make_loss_fn(setup, cfg, rollout)
    params = init_fullyconv(jax.random.PRNGKey(0))
    opt = optax.sgd(1e-3)
    opt_state = opt.init(params)

    samples = [dataset.sample(0), dataset.sample(2)]
    batch = stack_samples(setup, cfg, samples)
    bstep = make_batched_train_step(loss_fn, opt)
    p_b, _, loss_b, parts, warns = bstep(params, opt_state, *batch)
    assert warns.shape == (2,)
    assert np.isfinite(float(loss_b))

    sstep = make_train_step(loss_fn, opt)
    l0 = float(sstep(params, opt_state, *_sample_to_device(setup, cfg, samples[0]))[2])
    l1 = float(sstep(params, opt_state, *_sample_to_device(setup, cfg, samples[1]))[2])
    np.testing.assert_allclose(float(loss_b), 0.5 * (l0 + l1), rtol=1e-3)


def test_batched_train_step_fold_mode_engages_and_matches(
        tiny_setup, tiny_dataset, monkeypatch):
    """End-to-end r5 fold integration: at small per-sample planes the
    batched step traces in mode 'fold' (no_pallas + fold_only_pallas) and
    the momentum solves dispatch the batch-FOLDED whole-solve kernel —
    verified by a trace-time spy — with the loss matching the all-XLA
    trace (the kernels converge to the same solver tolerance)."""
    from diffpiso_tpu.learning.training import (
        make_batched_train_step,
        stack_samples,
    )
    from diffpiso_tpu.solvers import pallas_krylov as pk

    monkeypatch.setattr(pk, "_INTERPRET", True)
    monkeypatch.setattr(pk, "_roll", lambda a, s, ax: jnp.roll(a, s, ax))
    monkeypatch.delenv("DIFFPISO_BATCHED_PALLAS", raising=False)
    monkeypatch.delenv("DIFFPISO_FUSED_JAC2_FOLD", raising=False)

    setup = tiny_setup
    cfg = TrainingConfig(
        step_count=2, loss_influence_range=2, padding="SAME",
        loss_factors=(50.0, 0.0, 0.0, 0.0), advection_tol=1e-5,
        pressure_tol=1e-5, remat="none",
    )
    dataset = SequenceDataset(
        [tiny_dataset],
        characteristics=[[(i * 0.4, 0.082, 0.018) for i in range(8)]],
        start_frame=[0], frame_count=[8], step_count=2, dt_ratio=1,
    )
    rollout = make_rollout_fn(setup, cfg)
    loss_fn = make_loss_fn(setup, cfg, rollout)
    params = init_fullyconv(jax.random.PRNGKey(0))
    opt = optax.sgd(1e-3)
    opt_state = opt.init(params)
    samples = [dataset.sample(0), dataset.sample(2)]
    batch = stack_samples(setup, cfg, samples)

    calls = []
    for name in ("_jacobi2_solve_kernel_bf", "_jacobi2_solve_kernel_bfs"):
        orig = getattr(pk, name)
        monkeypatch.setattr(
            pk, name,
            (lambda o: lambda *a, **k: calls.append(1) or o(*a, **k))(orig))
    bstep = make_batched_train_step(loss_fn, opt)
    _, _, loss_fold, _, warns = bstep(params, opt_state, *batch)
    assert calls, "fold-mode batched step did not dispatch the folded kernel"
    assert np.isfinite(float(loss_fold))

    monkeypatch.setenv("DIFFPISO_FUSED_JAC2_FOLD", "never")
    bstep2 = make_batched_train_step(loss_fn, opt)
    _, _, loss_xla, _, _ = bstep2(params, opt_state, *batch)
    np.testing.assert_allclose(float(loss_fold), float(loss_xla), rtol=1e-4)


def test_batched_train_chunk_matches_sequential_batched(tiny_setup, tiny_dataset):
    """make_batched_train_chunk (scan of batched updates — the VERDICT r3
    item-8 composition) must reproduce N consecutive
    make_batched_train_step calls: same per-iteration losses, same final
    params."""
    from diffpiso_tpu.learning.training import (
        make_batched_train_chunk,
        make_batched_train_step,
        stack_samples,
    )

    setup = tiny_setup
    cfg = TrainingConfig(
        step_count=2, loss_influence_range=2, padding="SAME",
        loss_factors=(50.0, 0.0, 0.0, 0.0), advection_tol=1e-5,
        pressure_tol=1e-5,
    )
    dataset = SequenceDataset(
        [tiny_dataset],
        characteristics=[[(i * 0.4, 0.082, 0.018) for i in range(8)]],
        start_frame=[0], frame_count=[8], step_count=2, dt_ratio=1,
    )
    rollout = make_rollout_fn(setup, cfg)
    loss_fn = make_loss_fn(setup, cfg, rollout)
    params = init_fullyconv(jax.random.PRNGKey(0))
    opt = optax.sgd(1e-3)
    opt_state = opt.init(params)

    batches = [
        stack_samples(setup, cfg, [dataset.sample(0), dataset.sample(2)]),
        stack_samples(setup, cfg, [dataset.sample(1), dataset.sample(3)]),
    ]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
    cstep = make_batched_train_chunk(loss_fn, opt, 2)
    p_c, o_c, losses, parts, warns = cstep(params, opt_state, *stacked)
    assert losses.shape == (2,) and warns.shape == (2, 2)

    bstep = make_batched_train_step(loss_fn, opt)
    p_s, o_s = params, opt_state
    ref_losses = []
    for b in batches:
        p_s, o_s, loss, _, warn = bstep(p_s, o_s, *b)
        ref_losses.append(float(loss))

    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref_losses),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_c),
                    jax.tree_util.tree_leaves(p_s)):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6 * scale)


def test_sharded_train_step_matches_batched(tiny_setup, tiny_dataset):
    """make_sharded_train_step (data x spatial mesh on the padded layout)
    must reproduce the plain batched step's loss and updated params to
    sharded-reduction tolerance on the 8-device CPU mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from diffpiso_tpu.learning.training import (
        make_batched_train_step,
        make_sharded_train_step,
        stack_samples,
    )
    from diffpiso_tpu.parallel import make_mesh, no_pallas

    setup = tiny_setup
    cfg = TrainingConfig(
        step_count=2, loss_influence_range=2, padding="SAME",
        loss_factors=(50.0, 0.0, 0.0, 0.0), advection_tol=1e-6,
        pressure_tol=1e-6,
    )
    dataset = SequenceDataset(
        [tiny_dataset],
        characteristics=[[(i * 0.4, 0.082, 0.018) for i in range(8)]],
        start_frame=[0], frame_count=[8], step_count=2, dt_ratio=1,
    )
    from diffpiso_tpu.learning import make_loss_fn, make_rollout_fn

    rollout = make_rollout_fn(setup, cfg)
    loss_fn = make_loss_fn(setup, cfg, rollout)
    params = init_fullyconv(jax.random.PRNGKey(0))
    opt = optax.sgd(1e-3)
    opt_state = opt.init(params)
    batch = stack_samples(
        setup, cfg, [dataset.sample(0), dataset.sample(2)]
    )

    bstep = make_batched_train_step(loss_fn, opt)
    p_ref, _, loss_ref, _, warns_ref = bstep(params, opt_state, *batch)
    assert not bool(jnp.any(warns_ref))

    mesh = make_mesh((2, 4), ("data", "space"))
    sstep, layout = make_sharded_train_step(loss_fn, opt, mesh, tuple(batch))
    padded = layout.put(layout.pad(tuple(batch)))
    # spatially sharded for real: trailing dims split 4-way
    for a in jax.tree_util.tree_leaves(padded):
        if a.ndim >= 2 and a.shape[-1] >= 4:
            assert a.addressable_shards[0].data.shape[-1] == a.shape[-1] // 4
    with no_pallas():
        p_sh, _, loss_sh, _, warns_sh = sstep(params, opt_state, padded)
    assert not bool(jnp.any(warns_sh))
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_sh), jax.tree_util.tree_leaves(p_ref)
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5 * scale)


def test_chunked_train_step_matches_sequential(tiny_setup, tiny_dataset):
    """make_chunked_train_step (N sequential updates per jit call via
    lax.scan — the tunnel-dispatch amortization path, cfg.scan_chunk) must
    reproduce N consecutive make_train_step calls: same per-iteration
    losses and the same final params."""
    from diffpiso_tpu.learning.training import (
        _sample_to_device,
        make_chunked_train_step,
    )

    setup = tiny_setup
    cfg = TrainingConfig(
        step_count=2, loss_influence_range=2, padding="SAME",
        loss_factors=(50.0, 0.0, 0.0, 0.0), advection_tol=1e-5,
        pressure_tol=1e-5,
    )
    dataset = SequenceDataset(
        [tiny_dataset],
        characteristics=[[(i * 0.4, 0.082, 0.018) for i in range(8)]],
        start_frame=[0], frame_count=[8], step_count=2, dt_ratio=1,
    )
    rollout = make_rollout_fn(setup, cfg)
    loss_fn = make_loss_fn(setup, cfg, rollout)
    params = init_fullyconv(jax.random.PRNGKey(0))
    opt = optax.sgd(1e-3)
    opt_state = opt.init(params)

    devs = [_sample_to_device(setup, cfg, dataset.sample(i)) for i in (0, 2, 3)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *devs)
    cstep = make_chunked_train_step(loss_fn, opt, 3)
    p_c, o_c, losses, parts, warns = cstep(params, opt_state, *stacked)
    assert losses.shape == (3,) and warns.shape == (3,)
    assert not bool(np.any(np.asarray(warns)))

    sstep = make_train_step(loss_fn, opt)
    p_s, o_s = params, opt_state
    ref_losses = []
    for d in devs:
        p_s, o_s, loss, _, warn = sstep(p_s, o_s, *d)
        ref_losses.append(float(loss))
        assert not bool(warn)

    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref_losses),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_c),
                    jax.tree_util.tree_leaves(p_s)):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6 * scale)


def test_training_run_scan_chunk_matches(tiny_setup, tiny_dataset, tmp_path):
    """training_run with cfg.scan_chunk=2 (chunked epoch loop + single-step
    tail) reaches the same loss history and final params as scan_chunk=1."""
    setup = tiny_setup
    base = dict(
        step_count=3, loss_influence_range=3, learning_rate=1e-4, epochs=1,
        advection_tol=1e-4, pressure_tol=1e-4, checkpoint_every=2,
        padding="SAME", restore_shape=False,
    )
    ds = SequenceDataset(
        [tiny_dataset],
        characteristics=[[(i * setup.dt, 0.082, 0.018) for i in range(6)]],
        start_frame=[0], frame_count=[6], step_count=3,
    )
    params0 = init_fullyconv(jax.random.PRNGKey(0))
    p1, h1, _ = training_run(
        str(tmp_path / "a"), setup, TrainingConfig(**base), params0, ds,
        log_fn=lambda *a: None,
    )
    p2, h2, _ = training_run(
        str(tmp_path / "b"), setup, TrainingConfig(**base, scan_chunk=2),
        params0, ds, log_fn=lambda *a: None,
    )
    assert len(h1) == len(h2) == len(ds)  # len(ds)=3: chunk of 2 + tail 1
    np.testing.assert_allclose(h2, h1, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p2),
                    jax.tree_util.tree_leaves(p1)):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5 * scale)


def test_batched_pallas_mode_size_gate(monkeypatch):
    """The batched-vmap pallas gate resolves by per-sample plane size:
    'auto' at the measured winning scale (512^2 component planes,
    runs/ab_batched_512.log), 'fold' below (all-XLA except the
    batch-folded whole-solve momentum kernel, runs/ab_batched_fold.log;
    plain 'never' when the fold gate is off); the env var still overrides
    both ways."""
    from diffpiso_tpu.learning.training import _batched_pallas_mode

    big = (
        jax.ShapeDtypeStruct((4, 512, 512), jnp.float32),
        jax.ShapeDtypeStruct((4, 512, 512), jnp.float32),
    )
    small = (
        jax.ShapeDtypeStruct((8, 64, 257), jnp.float32),
        jax.ShapeDtypeStruct((8, 65, 256), jnp.float32),
    )
    monkeypatch.delenv("DIFFPISO_BATCHED_PALLAS", raising=False)
    monkeypatch.delenv("DIFFPISO_FUSED_JAC2_FOLD", raising=False)
    assert _batched_pallas_mode(big) == "auto"
    assert _batched_pallas_mode(small) == "fold"
    monkeypatch.setenv("DIFFPISO_FUSED_JAC2_FOLD", "never")
    assert _batched_pallas_mode(small) == "never"
    monkeypatch.delenv("DIFFPISO_FUSED_JAC2_FOLD", raising=False)
    monkeypatch.setenv("DIFFPISO_BATCHED_PALLAS", "never")
    assert _batched_pallas_mode(big) == "never"
    monkeypatch.setenv("DIFFPISO_BATCHED_PALLAS", "auto")
    assert _batched_pallas_mode(small) == "auto"

    # 3-D samples (rank-4 leaves) resolve to 'never' regardless of size:
    # no 3-D batched A/B exists, and a 64^3 volume must not be
    # misclassified as a 512^2 plane (r3 advisor finding)
    monkeypatch.delenv("DIFFPISO_BATCHED_PALLAS", raising=False)
    vol = (jax.ShapeDtypeStruct((4, 64, 64, 64), jnp.float32),)
    assert _batched_pallas_mode(vol) == "never"
    big3d = (jax.ShapeDtypeStruct((2, 8, 512, 512), jnp.float32),)
    assert _batched_pallas_mode(big3d) == "never"


def test_sharded_trace_forces_no_pallas(monkeypatch):
    """A mesh-sharded batched step must trace under no_pallas() even when
    the size gate (or the env var) would resolve to 'auto': GSPMD cannot
    partition pallas_call (r3 advisor high finding). Verified by recording
    the no_pallas nesting depth at trace time inside the loss_fn."""
    from diffpiso_tpu.learning.training import make_batched_train_step
    from diffpiso_tpu.ops import pallas_stencil as ps
    from diffpiso_tpu.parallel import make_mesh

    monkeypatch.setenv("DIFFPISO_BATCHED_PALLAS", "auto")
    seen = {}

    def loss_fn(params, v, p, t, pe):
        seen["disabled_depth"] = ps._DISABLED_DEPTH
        seen["batched_safe_depth"] = ps._BATCHED_SAFE_DEPTH
        loss = jnp.sum((v - t) ** 2) + jnp.sum(params["w"] * 0.0)
        return loss, (jnp.zeros((), bool), {})

    params = {"w": jnp.ones((2,))}
    opt = optax.sgd(1e-3)
    opt_state = opt.init(params)
    batch = tuple(jnp.ones((2, 4, 4)) for _ in range(4))

    # without a mesh, env 'auto' keeps the batched-safe context (depth 0/1)
    step = make_batched_train_step(loss_fn, opt)
    step(params, opt_state, *batch)
    assert seen["disabled_depth"] == 0 and seen["batched_safe_depth"] == 1

    # with a mesh, the trace must run under no_pallas regardless of the gate
    mesh = make_mesh((min(2, len(jax.devices())),), ("data",))
    step_m = make_batched_train_step(loss_fn, opt, mesh=mesh)
    step_m(params, opt_state, *batch)
    assert seen["disabled_depth"] == 1

    # explicit override without a mesh behaves the same
    step_f = make_batched_train_step(loss_fn, opt, force_no_pallas=True)
    step_f(params, opt_state, *batch)
    assert seen["disabled_depth"] == 1
