"""A/B of make_batched_train_chunk (scan of batched updates) vs the
per-call batched step at the reference training scale (64x256, 10-step
unroll, batch 8) — VERDICT r3 item 8. The r3 profile attributed 36 of
84.9 ms/iteration to dispatch + batch-independent work; scanning the
batched update inside one jit amortizes the ~26 ms/call tunnel dispatch.
Reports iterations/s for chunk in {1 (plain step), 4, 8}, 2 interleaved
reps, plus the implied dispatch share."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/diffpiso_jax_cache"),
)
import jax.numpy as jnp
import optax

from diffpiso_tpu.core.setups import spatial_mixing_layer_setup
from diffpiso_tpu.learning.training import (
    TrainingConfig,
    make_batched_train_chunk,
    make_batched_train_step,
    make_loss_fn,
    make_rollout_fn,
)
from diffpiso_tpu.models.networks import init_fullyconv

BATCH = 8
res = (64, 256)
setup = spatial_mixing_layer_setup(
    simulation={"HRres": res, "dt": 0.4}, max_iterations=(200, 2000)
)
cfg = TrainingConfig(
    step_count=10, loss_influence_range=10, padding="VALID",
    advection_tol=1e-6, pressure_tol=1e-6,
)
rollout_fn = make_rollout_fn(setup, cfg)
loss_fn = make_loss_fn(setup, cfg, rollout_fn)
optimizer = optax.adam(1e-5)
params0 = init_fullyconv(jax.random.PRNGKey(0), in_channels=4)
opt0 = optimizer.init(params0)

vel0, p0 = setup.initial_state()
perts = jnp.stack(
    [setup.perturbation(550.0 + i * setup.dt) for i in range(cfg.step_count)]
)
vels, ps, _ = jax.jit(make_rollout_fn(setup, cfg, with_network=False))(
    None, vel0, p0, perts
)
targets = vels
stack_b = lambda t: jax.tree_util.tree_map(
    lambda a: jnp.stack([a] * BATCH), t
)
batch1 = tuple(map(stack_b, (vel0, p0, targets, perts)))


def measure_step():
    step = make_batched_train_step(loss_fn, optimizer)
    p, o = params0, opt0
    for _ in range(2):  # compile + warm
        p, o, loss, parts, warn = step(p, o, *batch1)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(8):
        p, o, loss, parts, warn = step(p, o, *batch1)
    jax.block_until_ready(loss)
    return 8 / (time.perf_counter() - t0)


def measure_chunk(chunk):
    stack_c = lambda t: jax.tree_util.tree_map(
        lambda a: jnp.stack([a] * chunk), t
    )
    batch_c = tuple(map(stack_c, batch1))
    cstep = make_batched_train_chunk(loss_fn, optimizer, chunk)
    p, o = params0, opt0
    for _ in range(2):
        p, o, losses, parts, warns = cstep(p, o, *batch_c)
    jax.block_until_ready(losses)
    reps = max(1, 16 // chunk)
    t0 = time.perf_counter()
    for _ in range(reps):
        p, o, losses, parts, warns = cstep(p, o, *batch_c)
    jax.block_until_ready(losses)
    return chunk * reps / (time.perf_counter() - t0)


results = {}
for rep in range(2):
    for name, fn in (("step", measure_step),
                     ("chunk4", lambda: measure_chunk(4)),
                     ("chunk8", lambda: measure_chunk(8))):
        it_s = fn()
        results.setdefault(name, []).append(round(it_s, 2))
        print(f"[ab] rep{rep} batch8/{name}: {it_s:.2f} it/s "
              f"({BATCH * it_s:.1f} samples/s)", file=sys.stderr, flush=True)
print(results)
