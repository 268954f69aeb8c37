"""Modular plume: density, forces and flow as SEPARATE World states.

The diffpiso_tpu analog of the reference's modular demo
(PhiFlow/demos/modular_simpleplume.py): instead of one monolithic smoke
state, the World holds
  * 'velocity'  — a FlowState stepped by IncompressibleFlow (advect +
                  external forces + projection; no built-in buoyancy),
  * 'marker'    — a passive scalar stepped by a Drift physics (advected by
                  the velocity, fed by an Inflow sphere — the reference's
                  [Drift(), FieldPhysics('marker')] + Inflow),
  * 'gforce'    — a force field recomputed each step proportional to the
                  marker (the reference's ProportionalGForce('marker',
                  -0.1)), tagged 'velocity_effect' so IncompressibleFlow's
                  blocking StateDependency picks it up.
World.make_step_fn resolves the dependency order (marker -> gforce ->
velocity) and the whole heterogeneous collection steps inside one
jit + lax.scan.

Run:  python examples/modular_plume.py --steps 100
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--dt", type=float, default=0.5)
    ap.add_argument("--out", default="runs")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from diffpiso_tpu.core.chorin import FlowState
    from diffpiso_tpu.fields import Box, CLOSED, Domain, StaggeredField
    from diffpiso_tpu.fields.geometry import Sphere
    from diffpiso_tpu.ops.advect import advect_centered
    from diffpiso_tpu.ops.fv import centered_to_faces
    from diffpiso_tpu.physics.base import Physics, StateDependency
    from diffpiso_tpu.physics.effect import Inflow, effect_applied
    from diffpiso_tpu.physics.fluid import IncompressibleFlow
    from diffpiso_tpu.physics.world import World

    ny, nx = 80, 64  # modular_simpleplume.py:3 Domain([80, 64], CLOSED)
    box = Box.from_size((float(ny), float(nx)))
    domain = Domain((ny, nx), box, boundaries=CLOSED)
    inflow = Inflow(
        Sphere(center=(10.0, 32.0), radius=5.0), (ny, nx), box, rate=0.2
    )

    class Drift(Physics):
        """Passive-scalar advection + inflow (the reference's Drift +
        FieldPhysics('marker') pair, modular_simpleplume.py:5)."""

        def __init__(self):
            super().__init__(
                [StateDependency("velocity", "velocityfield", single_state=True)]
            )

        def step(self, marker, dt=1.0, velocity=None, **deps):
            marker = advect_centered(marker, velocity.velocity, dt, domain.dx)
            return effect_applied(inflow, marker, dt)

    class ProportionalGForce(Physics):
        """Staggered force ~ factor * g * marker along the gravity axis
        (the reference's ProportionalGForce('marker', -0.1):
        factor < 0 turns gravity into buoyancy)."""

        def __init__(self, factor=-0.1, g=-9.81):
            super().__init__(
                [StateDependency("markers", "marker", blocking=True)]
            )
            self.scale = factor * g

        def step(self, force, dt=1.0, markers=(), **deps):
            m = markers[0]
            fy = centered_to_faces(self.scale * m, 0)
            return StaggeredField(
                (fy, jnp.zeros_like(force.components[1])),
                periodic=force.periodic,
            )

    world = World()
    vel = StaggeredField(
        (jnp.zeros((ny + 1, nx)), jnp.zeros((ny, nx + 1))),
        periodic=(False, False),
    )
    zero_force = StaggeredField(
        (jnp.zeros((ny + 1, nx)), jnp.zeros((ny, nx + 1))),
        periodic=(False, False),
    )
    world.add(
        "velocity",
        FlowState(velocity=vel, density=None),
        physics=IncompressibleFlow(
            domain, buoyancy_factor=0.0, tol=1e-5, rank_deficient=True
        ),
        tags=("velocityfield",),
    )
    world.add("marker", jnp.zeros((ny, nx)), physics=Drift(), tags=("marker",))
    world.add(
        "gforce", zero_force, physics=ProportionalGForce(),
        tags=("velocity_effect",),
    )

    step_fn = world.make_step_fn(dt=args.dt)

    @jax.jit
    def run_chunk(values, k=10):
        def body(v, _):
            return step_fn(v), ()

        v, _ = jax.lax.scan(body, values, None, length=k)
        return v

    values = world.collection.values_pytree()
    for i in range(args.steps // 10):
        values = run_chunk(values)
        m = values["marker"]
        print(
            f"step {10 * (i + 1):4d}: marker total {float(m.sum()):9.2f}, "
            f"max {float(m.max()):.3f}, plume height "
            f"{int(np.asarray(m > 0.1).any(axis=1).nonzero()[0].max(initial=0))}"
        )

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "modular_plume.npz")
    np.savez_compressed(
        path,
        marker=np.asarray(values["marker"]),
        vy=np.asarray(values["velocity"].velocity.components[0]),
        vx=np.asarray(values["velocity"].velocity.components[1]),
    )
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
