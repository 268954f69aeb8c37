"""Burgers equation: dv/dt + (v . grad) v = nu lap v.

Capability parity with PhiFlow/phi/physics/burgers.py (Burgers.step_velocity:
diffuse -> semi-Lagrangian self-advection). Velocity is a centered vector
array (*spatial, d); spectral diffusion on periodic domains, explicit
substeps otherwise.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from diffpiso_tpu.fields.material import CIRCULAR, REPLICATE
from diffpiso_tpu.ops.math_ext import diffuse
from diffpiso_tpu.ops.resample import grid_sample
from diffpiso_tpu.physics.base import Physics


def advect_centered_vector(v: jnp.ndarray, w: jnp.ndarray, dt, dx, periodic):
    """Semi-Lagrangian advection of centered vector field v by velocity w
    (both (*spatial, d), channel order matching the spatial axes)."""
    d = v.shape[-1]
    spatial = v.shape[:-1]
    grids = jnp.meshgrid(
        *[jnp.arange(n, dtype=v.dtype) for n in spatial], indexing="ij"
    )
    idx = jnp.stack(grids, axis=-1)
    dxv = jnp.asarray(dx, v.dtype)
    pts = idx - dt * w / dxv
    modes = tuple(CIRCULAR if p else REPLICATE for p in periodic)
    return grid_sample(v, pts, modes)


class Burgers(Physics):
    def __init__(
        self,
        dx: Sequence[float] | float = 1.0,
        periodic: Sequence[bool] | bool = True,
        default_viscosity: float = 0.1,
        diffusion_substeps: int = 1,
    ):
        super().__init__()
        self.dx = dx
        self.periodic = periodic
        self.default_viscosity = default_viscosity
        self.diffusion_substeps = diffusion_substeps

    def _norm(self, v):
        d = v.shape[-1]
        dx = (self.dx,) * d if isinstance(self.dx, (int, float)) else tuple(self.dx)
        per = (
            (self.periodic,) * d
            if isinstance(self.periodic, bool)
            else tuple(self.periodic)
        )
        return dx, per

    def step(self, v, dt=1.0, viscosity=None, **deps):
        nu = self.default_viscosity if viscosity is None else viscosity
        dx, per = self._norm(v)
        spatial_axes = tuple(range(v.ndim - 1))
        v = diffuse(
            v,
            dt * nu,
            dx,
            periodic=all(per),
            substeps=self.diffusion_substeps,
            axes=spatial_axes,
        )
        return advect_centered_vector(v, v, dt, dx, per)
