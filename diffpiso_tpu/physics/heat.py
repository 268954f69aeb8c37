"""Heat diffusion: dT/dt = alpha lap T (PhiFlow/phi/physics/heat.py)."""

from __future__ import annotations

from typing import Sequence

from diffpiso_tpu.ops.math_ext import diffuse
from diffpiso_tpu.physics.base import Physics


class HeatDiffusion(Physics):
    def __init__(
        self,
        diffusivity: float = 0.1,
        dx: Sequence[float] | float = 1.0,
        periodic: bool = False,
        substeps: int = 1,
    ):
        super().__init__()
        self.diffusivity = diffusivity
        self.dx = dx
        self.periodic = periodic
        self.substeps = substeps

    def step(self, temperature, dt=1.0, effects=(), **deps):
        t = diffuse(
            temperature,
            dt * self.diffusivity,
            self.dx,
            periodic=self.periodic,
            substeps=self.substeps,
        )
        for effect in effects or ():
            t = t + effect * dt
        return t
