"""Tests for the classic physics families + World orchestration (parity with
the reference's demo/physics smoke tests, PhiFlow/tests/test_burgers.py,
test_schroedinger.py, test_world.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from diffpiso_tpu.physics import (
    Burgers,
    HeatDiffusion,
    IncompressibleFlow,
    KuramotoSivashinsky,
    Pattern,
    Physics,
    ReactionDiffusion,
    Schroedinger,
    Static,
    StateDependency,
    World,
    psquare,
    seed_pattern,
    wave_packet,
)


def test_heat_decays_and_conserves_periodic():
    n = 32
    x = jnp.arange(n) / n
    t0 = jnp.sin(2 * jnp.pi * x[:, None]) * jnp.cos(2 * jnp.pi * x[None, :]) + 1.0
    physics = HeatDiffusion(diffusivity=0.1, dx=1.0 / n, periodic=True)
    t1 = physics.step(t0, dt=0.001)
    # mean conserved, variance strictly decays
    np.testing.assert_allclose(float(jnp.mean(t1)), float(jnp.mean(t0)), atol=1e-6)
    assert float(jnp.var(t1)) < float(jnp.var(t0))


def test_burgers_step_viscous_decay_and_transport():
    n = 64
    x = jnp.arange(n) / n
    # 1-D velocity field embedded in 2-D (u only, constant in y)
    u = jnp.sin(2 * jnp.pi * x)[None, :].repeat(4, 0)
    v = jnp.stack([jnp.zeros_like(u), u], -1)  # channels (vy, vx)
    physics = Burgers(dx=1.0 / n, periodic=True, default_viscosity=0.01)
    out = physics.step(v, dt=0.01)
    assert out.shape == v.shape
    assert np.isfinite(np.asarray(out)).all()
    # viscosity + nonlinearity must not increase the max amplitude
    assert float(jnp.max(jnp.abs(out))) <= float(jnp.max(jnp.abs(v))) + 1e-5
    # energy decays
    assert float(jnp.sum(out**2)) < float(jnp.sum(v**2))


def test_burgers_is_differentiable():
    physics = Burgers(dx=0.1, periodic=True)
    v0 = jnp.ones((8, 8, 2)) * 0.3

    def loss(v):
        out = physics.step(v, dt=0.05)
        return jnp.sum(out**2)

    g = jax.grad(loss)(v0)
    assert np.isfinite(np.asarray(g)).all()


def test_ks_runs_zero_mean():
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.rand(64).astype(np.float32)) * 0.1
    physics = KuramotoSivashinsky(periodic=True)
    for _ in range(5):
        u = physics.step(u, dt=0.05)
    assert np.isfinite(np.asarray(u)).all()
    np.testing.assert_allclose(float(jnp.mean(u)), 0.0, atol=1e-6)


def test_reaction_diffusion_fixed_point_and_patterning():
    physics = ReactionDiffusion()
    # (u=1, v=0) is a fixed point of the Gray-Scott reaction terms
    p0 = Pattern(u=jnp.ones((16, 16)), v=jnp.zeros((16, 16)))
    p1 = physics.step(p0, dt=1.0)
    np.testing.assert_allclose(np.asarray(p1.u), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p1.v), 0.0, atol=1e-6)
    # perturbed state stays bounded
    p = Pattern(
        u=jnp.ones((16, 16)) - 0.5 * seed_pattern((16, 16), "EXP", size=2),
        v=0.25 * seed_pattern((16, 16), "EXP", size=2),
    )
    for _ in range(10):
        p = physics.step(p, dt=1.0)
    assert float(jnp.max(jnp.abs(p.u))) < 2.0
    assert float(jnp.max(jnp.abs(p.v))) < 2.0


def test_schroedinger_norm_preserved_and_packet_moves():
    n = 64
    amp = wave_packet((n, n), center=(20.0, 20.0), size=4.0, wave_vector=(0.0, 1.5))
    from diffpiso_tpu.physics import normalize_probability

    amp = normalize_probability(amp)
    physics = Schroedinger(mass=0.1, margin=1)

    def center_of_mass(a):
        p = np.asarray(psquare(a))
        jj, ii = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        return (p * jj).sum() / p.sum(), (p * ii).sum() / p.sum()

    _, x0 = center_of_mass(amp)
    for _ in range(5):
        amp = physics.step(amp, dt=0.05)
    np.testing.assert_allclose(float(jnp.sum(psquare(amp))), 1.0, rtol=1e-5)
    _, x1 = center_of_mass(amp)
    assert x1 > x0 + 0.05  # packet moved along +x (wave_vector direction)


def test_world_dependency_order_and_jit():
    world = World()

    class Source(Physics):
        def step(self, value, dt=1.0, **deps):
            return value + 1.0

    class Sink(Physics):
        def __init__(self):
            super().__init__([StateDependency("srcs", "source", blocking=True)])

        def step(self, value, dt=1.0, srcs=(), **deps):
            return value + sum(srcs)

    world.add("a", jnp.asarray(0.0), Source(), tags=("source",))
    world.add("b", jnp.asarray(0.0), Sink())
    step = world.jitted_step(dt=1.0)
    vals = world.collection.values_pytree()
    vals = step(vals)
    # blocking: sink sees the UPDATED source (0+1), regardless of dict order
    np.testing.assert_allclose(float(vals["a"]), 1.0)
    np.testing.assert_allclose(float(vals["b"]), 1.0)
    vals = step(vals)
    np.testing.assert_allclose(float(vals["b"]), 3.0)


def test_world_eager_step_and_static():
    world = World()
    world.add("const", jnp.asarray(5.0))  # Static physics default
    world.add("temp", jnp.ones((8, 8)), HeatDiffusion(0.1, periodic=True))
    world.step(dt=0.1)
    np.testing.assert_allclose(float(world["const"]), 5.0)
    assert world.collection.records["temp"].age == 0.1


def test_incompressible_flow_world_smoke():
    from diffpiso_tpu.core.chorin import FlowState
    from diffpiso_tpu.fields.domain import Domain
    from diffpiso_tpu.fields.material import PERIODIC
    from diffpiso_tpu.fields.grid import StaggeredField
    from diffpiso_tpu.ops.fv import fv_divergence

    n = 16
    domain = Domain((n, n), boundaries=PERIODIC)
    rng = np.random.RandomState(0)
    vel = StaggeredField(
        (
            jnp.asarray(rng.randn(n, n).astype(np.float32)) * 0.1,
            jnp.asarray(rng.randn(n, n).astype(np.float32)) * 0.1,
        ),
        periodic=(True, True),
    )
    world = World()
    world.add("fluid", FlowState(velocity=vel), IncompressibleFlow(domain))
    world.step(dt=0.1)
    world.step(dt=0.1)
    out = world["fluid"].velocity
    div = fv_divergence(out, domain.dx)
    assert float(jnp.max(jnp.abs(div))) < 1e-4
