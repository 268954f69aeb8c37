"""Tests for the struct system (parity with PhiFlow/tests/test_struct.py)
and the checkpoint manager."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffpiso_tpu.fields import struct
from diffpiso_tpu.utils.checkpoint import CheckpointManager


@struct.definition()
class Sim:
    velocity: jax.Array = struct.variable()
    pressure: jax.Array = struct.variable()
    viscosity: float = struct.constant(default=0.1)


def test_struct_is_pytree_with_static_constants():
    s = Sim(velocity=jnp.ones((4, 4)), pressure=jnp.zeros((4, 4)), viscosity=0.5)
    leaves = jax.tree_util.tree_leaves(s)
    assert len(leaves) == 2  # viscosity is static aux data

    doubled = struct.smap(lambda x: 2 * x, s)
    np.testing.assert_allclose(np.asarray(doubled.velocity), 2.0)
    assert doubled.viscosity == 0.5

    # constants participate in jit dispatch; variables trace
    calls = []

    @jax.jit
    def f(sim):
        calls.append(1)
        return sim.velocity * sim.viscosity

    f(s)
    # same static config + same avals -> cached
    f(s.copied_with(velocity=jnp.full((4, 4), 3.0, s.velocity.dtype)))
    assert len(calls) == 1
    f(s.copied_with(viscosity=0.9))  # new static -> retrace
    assert len(calls) == 2


def test_struct_functional_api():
    s = Sim(velocity=jnp.ones((2, 3)), pressure=jnp.zeros((5,)), viscosity=0.1)
    assert struct.isstruct(s)
    assert not struct.isstruct(jnp.ones(3))
    shapes = struct.shape(s)
    assert shapes.velocity == (2, 3) and shapes.pressure == (5,)
    leaves = struct.flatten(s)
    rebuilt = struct.unflatten(s, leaves)
    np.testing.assert_allclose(np.asarray(rebuilt.velocity), 1.0)
    zipped = struct.szip([s, struct.smap(lambda x: x + 1, s)])
    assert len(zipped.velocity) == 2


def test_struct_grad_through_definition():
    s = Sim(velocity=jnp.ones((3, 3)), pressure=jnp.zeros((3, 3)), viscosity=2.0)

    def loss(sim):
        return jnp.sum(sim.velocity**2 * sim.viscosity)

    g = jax.grad(loss)(s)
    np.testing.assert_allclose(np.asarray(g.velocity), 4.0)


@pytest.mark.parametrize("use_orbax", [False, True])
def test_checkpoint_roundtrip_and_prune(tmp_path, use_orbax):
    if use_orbax:
        pytest.importorskip("orbax.checkpoint")
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2, use_orbax=use_orbax)
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}, "step": np.int32(7)}
    for s in [1, 2, 3]:
        mgr.save(s, jax.tree_util.tree_map(lambda x: x, state))
    assert mgr.steps() == [2, 3]  # pruned to keep=2
    restored = mgr.restore()
    np.testing.assert_allclose(
        np.asarray(restored["params"]["w"]), np.arange(6).reshape(2, 3)
    )
    r2 = mgr.restore(step=2)
    assert np.asarray(r2["step"]) == 7


def test_checkpoint_tags(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep=1, use_orbax=False)
    mgr.save_tag("model_last_working", {"w": jnp.ones(3)})
    out = mgr.restore_tag("model_last_working")
    np.testing.assert_allclose(np.asarray(out["w"]), 1.0)


def test_async_checkpoint_save_restore(tmp_path):
    """async_save=True: saves land on orbax's background thread; wait()
    makes them durable; reads self-synchronize."""
    import numpy as np

    from diffpiso_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path), async_save=True)
    state = {"w": jnp.arange(6.0), "step": np.int64(3)}
    mgr.save(3, state)
    mgr.save_tag("last_working", state)
    # restore without an explicit wait(): _read synchronizes itself
    out = mgr.restore(3)
    np.testing.assert_array_equal(np.asarray(out["w"]), np.arange(6.0))
    out2 = mgr.restore_tag("last_working")
    assert int(out2["step"]) == 3
    # overwriting an async-saved tag must not race the in-flight write
    mgr.save_tag("last_working", {"w": jnp.zeros(6), "step": np.int64(4)})
    mgr.wait()
    assert int(mgr.restore_tag("last_working")["step"]) == 4
