"""IncompressibleFlow + Drift as Physics (PhiFlow/phi/physics/fluid.py:
75-118 and :140-159), wrapping the Chorin projection step and passive
marker advection so smoke/fluid/marker states participate in World
orchestration alongside other physics."""

from __future__ import annotations

import jax.numpy as jnp

from diffpiso_tpu.core.chorin import FlowState, incompressible_flow_step
from diffpiso_tpu.fields.domain import Domain
from diffpiso_tpu.fields.grid import CenteredField, StaggeredField
from diffpiso_tpu.physics.base import Physics, StateDependency


class IncompressibleFlow(Physics):
    def __init__(
        self,
        domain: Domain,
        buoyancy_factor: float = 0.0,
        accessible_mask=None,
        tol: float = 1e-5,
        rank_deficient=None,
    ):
        super().__init__(
            [StateDependency("forces", "velocity_effect", blocking=True)]
        )
        self.domain = domain
        self.buoyancy_factor = buoyancy_factor
        self.accessible_mask = accessible_mask
        self.tol = tol
        # traced-mask jits cannot auto-detect singularity (chorin.py);
        # closed/periodic boxes with no open boundary must pass True
        self.rank_deficient = rank_deficient

    def step(self, state: FlowState, dt=1.0, forces=(), **deps) -> FlowState:
        total_force = None
        for f in forces or ():
            total_force = f if total_force is None else total_force + f
        return incompressible_flow_step(
            state,
            self.domain,
            dt,
            buoyancy_factor=self.buoyancy_factor,
            forces=total_force,
            accessible_mask=self.accessible_mask,
            tol=self.tol,
            rank_deficient=self.rank_deficient,
        )


class Drift(Physics):
    """Passive advection by the world's velocity (fluid.py:140-159).

    Steps any built-in field type with the velocity carried by the state
    named `velocity_state` (a FlowState, StaggeredField, or anything with
    a `.velocity` attribute): dense centered fields ride the
    semi-Lagrangian advection, staggered fields self-advect-style ride
    advect_semi_lagrangian, and SampledFields move their points with the
    interpolated velocity (fields/sampled.py).

    conserve=True renormalizes advected GRID fields to keep their total
    (the reference's `.normalized(field)` guard, fluid.py:157-158); it is
    a no-op for SampledFields, whose values are untouched by advection.
    use_updated_velocity=True makes the dependency blocking, so this state
    steps after the velocity state and reads its updated value
    (fluid.py:150's StateDependency blocking flag).
    """

    def __init__(
        self,
        domain: Domain,
        use_updated_velocity: bool = False,
        conserve: bool = True,
        velocity_state: str = "velocity",
    ):
        super().__init__(
            [
                StateDependency(
                    "velocity",
                    "velocityfield",
                    single_state=True,
                    blocking=use_updated_velocity,
                    state_name=velocity_state,
                )
            ]
        )
        self.domain = domain
        self.conserve = conserve

    def step(self, field, dt=1.0, velocity=None, **deps):
        from diffpiso_tpu.fields.sampled import SampledField, advect_points
        from diffpiso_tpu.ops.advect import (
            advect_centered,
            advect_semi_lagrangian,
        )

        if velocity is None:
            raise ValueError("Drift needs a velocity state in the World")
        vel = getattr(velocity, "velocity", velocity)
        if isinstance(field, SampledField):
            return advect_points(field, vel, self.domain.box, dt)
        if isinstance(field, StaggeredField):
            return advect_semi_lagrangian(field, vel, dt, self.domain.dx)
        data = field.data if isinstance(field, CenteredField) else field
        out = advect_centered(data, vel, dt, self.domain.dx)
        if self.conserve:
            total = jnp.sum(data)
            new_total = jnp.sum(out)
            # renormalize only when the totals are commensurate: a (near-)
            # mean-zero tracer would otherwise get an unbounded factor, and
            # the untaken total/new_total branch must be kept NaN-free for
            # the gradient (double-where: grad of the untaken branch is
            # inf*0 = NaN with a single where)
            ok = jnp.abs(new_total) > 1e-6 * jnp.abs(total)
            denom = jnp.where(ok, new_total, 1.0)
            out = out * jnp.where(ok, total / denom, 1.0)
        return CenteredField(out) if isinstance(field, CenteredField) else out
