"""Simulation domain: resolution + physical box + boundary materials.

Capability parity with the reference's Domain (PhiFlow/phi/physics/domain.py:14-212)
restricted to what the PISO solver consumes: grid factories, dx, and per-side
boundary materials that determine padding modes and periodicity.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax.numpy as jnp

from diffpiso_tpu.fields.box import Box
from diffpiso_tpu.fields.grid import StaggeredField
from diffpiso_tpu.fields.material import Material


def _normalize_boundaries(boundaries, rank: int):
    """Normalize to ((lo, hi), ...) per axis, axis order (y, x)."""
    if isinstance(boundaries, Material):
        return tuple(((boundaries, boundaries)) for _ in range(rank))
    boundaries = tuple(boundaries)
    assert len(boundaries) == rank, "need one boundary entry per axis"
    out = []
    for b in boundaries:
        if isinstance(b, Material):
            out.append((b, b))
        else:
            lo, hi = b
            out.append((lo, hi))
    return tuple(out)


@dataclasses.dataclass(frozen=True)
class Domain:
    resolution: Tuple[int, ...]
    box: Box
    boundaries: Tuple[Tuple[Material, Material], ...]

    def __init__(self, resolution: Sequence[int], box: Box | None = None, boundaries=None):
        resolution = tuple(int(r) for r in resolution)
        if box is None:
            box = Box.from_size(tuple(float(r) for r in resolution))
        if boundaries is None:
            from diffpiso_tpu.fields.material import OPEN

            boundaries = OPEN
        object.__setattr__(self, "resolution", resolution)
        object.__setattr__(self, "box", box)
        object.__setattr__(
            self, "boundaries", _normalize_boundaries(boundaries, len(resolution))
        )
        for lo, hi in self.boundaries:
            assert lo.periodic == hi.periodic, "periodicity must match on both sides"

    # -- geometry -------------------------------------------------------------
    @property
    def rank(self) -> int:
        return len(self.resolution)

    @property
    def dx(self) -> Tuple[float, ...]:
        return self.box.dx(self.resolution)

    @property
    def periodic(self) -> Tuple[bool, ...]:
        return tuple(lo.periodic for lo, hi in self.boundaries)

    # -- pad modes ------------------------------------------------------------
    def velocity_pad_modes(self):
        """((lo_mode, hi_mode) per axis) for padding staggered velocity."""
        return tuple((lo.velocity_pad, hi.velocity_pad) for lo, hi in self.boundaries)

    def pressure_pad_modes(self):
        return tuple((lo.pressure_pad, hi.pressure_pad) for lo, hi in self.boundaries)

    # -- shapes ---------------------------------------------------------------
    def centered_shape(self) -> Tuple[int, ...]:
        return self.resolution

    def staggered_component_shape(self, d: int) -> Tuple[int, ...]:
        """Component d's face-array shape: +1 along d unless periodic (then
        only the unique faces are stored)."""
        return tuple(
            r + (1 if i == d and not self.periodic[i] else 0)
            for i, r in enumerate(self.resolution)
        )

    # -- factories ------------------------------------------------------------
    def centered_grid(self, value=0.0, dtype=jnp.float32):
        return jnp.full(self.centered_shape(), value, dtype)

    def staggered_grid(self, value=0.0, dtype=jnp.float32) -> StaggeredField:
        comps = tuple(
            jnp.full(self.staggered_component_shape(d), value, dtype)
            for d in range(self.rank)
        )
        return StaggeredField(comps, periodic=self.periodic)
