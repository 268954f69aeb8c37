"""IncompressibleFlow as a Physics (PhiFlow/phi/physics/fluid.py:75-118),
wrapping the Chorin projection step so smoke/fluid states participate in
World orchestration alongside other physics."""

from __future__ import annotations

from diffpiso_tpu.core.chorin import FlowState, incompressible_flow_step
from diffpiso_tpu.fields.domain import Domain
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
