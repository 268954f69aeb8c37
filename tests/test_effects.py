"""Field effects (reference phi/physics/field/effect.py): GROW/ADD/FIX
semantics, the standard constructors, Gravity addition, and integration with
incompressible_flow_step (fluid.py:92-118 effect application order)."""

import jax.numpy as jnp
import numpy as np

from diffpiso_tpu.core.chorin import FlowState, incompressible_flow_step
from diffpiso_tpu.fields import Box, Domain, PERIODIC
from diffpiso_tpu.fields.geometry import Sphere
from diffpiso_tpu.fields.grid import StaggeredField
from diffpiso_tpu.physics import (
    Accelerator,
    ConstantVelocity,
    FieldEffect,
    Gravity,
    HeatSource,
    Inflow,
    effect_applied,
)


def test_grow_add_fix_semantics():
    f = jnp.zeros((4, 4))
    grow = FieldEffect(jnp.ones((4, 4)) * 2.0, mode="grow")
    np.testing.assert_allclose(np.asarray(effect_applied(grow, f, 0.5)), 1.0)
    add = FieldEffect(jnp.ones((4, 4)) * 3.0, mode="add")
    np.testing.assert_allclose(np.asarray(effect_applied(add, f, 0.5)), 3.0)
    m = jnp.zeros((4, 4)).at[1:3, 1:3].set(1.0)
    fix = FieldEffect(jnp.full((4, 4), 7.0), bounds_mask=m, mode="fix")
    out = np.asarray(effect_applied(fix, f + 1.0, 0.5))
    assert out[2, 2] == 7.0 and out[0, 0] == 1.0


def test_inflow_and_heat_sources():
    box = Box.from_size((8.0, 8.0))
    inflow = Inflow(Sphere(center=(4.0, 4.0), radius=1.5), (8, 8), box, rate=2.0)
    d = effect_applied(inflow, jnp.zeros((8, 8)), dt=1.0)
    assert float(d[4, 4]) > 1.9  # center grows at ~rate
    assert float(d[0, 0]) == 0.0
    heat = HeatSource(Sphere(center=(4.0, 4.0), radius=1.5), (8, 8), box, rate=1.0)
    t = effect_applied(heat, jnp.zeros((8, 8)), dt=2.0)
    assert float(t[4, 4]) > 1.9


def test_accelerator_and_constant_velocity_on_staggered():
    box = Box.from_size((8.0, 8.0))
    vel = StaggeredField((jnp.zeros((8, 8)), jnp.zeros((8, 8))),
                         periodic=(True, True))
    fan = Accelerator(Sphere(center=(4.0, 4.0), radius=2.0), (0.0, 1.5),
                      (8, 8), box, periodic=(True, True))
    out = effect_applied(fan, vel, dt=2.0)
    assert float(out.components[1][4, 4]) > 2.5  # ~ 1.5 * 2
    assert float(out.components[0][4, 4]) == 0.0

    cv = ConstantVelocity(Sphere(center=(4.0, 4.0), radius=2.0), (0.25, -0.5),
                          (8, 8), box, periodic=(True, True))
    out2 = effect_applied(cv, vel, dt=123.0)  # FIX ignores dt
    np.testing.assert_allclose(float(out2.components[0][4, 4]), 0.25, atol=0.05)
    np.testing.assert_allclose(float(out2.components[1][4, 4]), -0.5, atol=0.1)
    assert float(out2.components[1][0, 0]) == 0.0


def test_gravity_addition():
    g = Gravity(-9.81) + Gravity(-0.19)
    np.testing.assert_allclose(float(g.gravity), -10.0)
    gv = Gravity((-1.0, 0.0)) + Gravity(-2.0)
    np.testing.assert_allclose(np.asarray(gv.gravity), [-3.0, 0.0])


def test_effects_in_flow_step():
    n = 16
    domain = Domain((n, n), Box.from_size((float(n), float(n))),
                    boundaries=PERIODIC)
    vel = StaggeredField((jnp.zeros((n, n)), jnp.zeros((n, n))),
                         periodic=(True, True))
    density = jnp.zeros((n, n))
    inflow = Inflow(Sphere(center=(4.0, 8.0), radius=2.0), (n, n), domain.box)
    state = FlowState(velocity=vel, density=density)
    for _ in range(3):
        state = incompressible_flow_step(
            state, domain, dt=0.5, buoyancy_factor=0.1,
            density_effects=[inflow], tol=1e-6,
        )
    d = np.asarray(state.density)
    assert d.max() > 1.0  # inflow filled smoke
    assert np.all(np.isfinite(np.asarray(state.velocity.components[0])))


def test_accelerator_3d_defaults():
    """Review regression: rank-generic periodic default (previously a 2-tuple
    hardcode crashed 3-D construction)."""
    fan = Accelerator(
        Sphere(center=(4.0, 4.0, 4.0), radius=2.0), (0.0, 0.0, 1.0), (8, 8, 8)
    )
    assert len(fan.field.components) == 3
    assert float(fan.field.components[2][4, 4, 4]) > 0.5
