"""Boundary materials and the padding modes they induce.

Mirrors the semantics of the reference's Material constants
(PhiFlow/phi/physics/material.py:70-108):

  OPEN      — fluid may enter/leave;   pressure pads replicate, velocity pads symmetric
  SLIPPERY  — solid, free-slip wall;   pressure pads zero,      velocity pads replicate
  STICKY    — solid, no-slip wall;     pressure pads zero,      velocity pads symmetric
  PERIODIC  — wraps around

The three derived pad modes correspond to the reference's
extrapolation_mode / accessible_extrapolation_mode / vector_extrapolation_mode
after being run through diffpiso's _custom_pad_mode translation
(diffpiso/piso_helpers.py:16-32): 'periodic'->circular, 'boundary'->replicate,
'constant'->symmetric (for velocity) or zero (for pressure padding via
CenteredGrid.padded).
"""

from __future__ import annotations

import dataclasses

# Pad mode constants used across ops.
ZERO = "zero"
REPLICATE = "replicate"
SYMMETRIC = "symmetric"
CIRCULAR = "circular"


@dataclasses.dataclass(frozen=True)
class Material:
    name: str
    solid: bool
    periodic: bool = False
    friction: float = 0.0

    @property
    def open(self) -> bool:
        return (not self.solid) and (not self.periodic)

    @property
    def scalar_pad(self) -> str:
        """Pad mode for generic centered scalar fields (extrapolation_mode)."""
        if self.periodic:
            return CIRCULAR
        return REPLICATE if self.solid else ZERO

    @property
    def pressure_pad(self) -> str:
        """Pad mode for pressure (accessible_extrapolation_mode).

        Reference: pressure_extrapolation() maps materials through
        accessible_extrapolation_mode (diffpiso/piso_tf.py:140-162), and
        CenteredGrid.padded turns 'boundary' into replicate and 'constant'
        into zero padding.
        """
        if self.periodic:
            return CIRCULAR
        return ZERO if self.solid else REPLICATE

    @property
    def velocity_pad(self) -> str:
        """Pad mode for staggered velocity (vector_extrapolation_mode through
        _custom_pad_mode): periodic->circular, free-slip solid->replicate,
        open & no-slip solid->symmetric."""
        if self.periodic:
            return CIRCULAR
        if self.solid and self.friction == 0.0:
            return REPLICATE
        return SYMMETRIC

    def __repr__(self):
        return self.name


OPEN = Material("open", solid=False)
CLOSED = NO_STICK = SLIPPERY = Material("slippery", solid=True, friction=0.0)
NO_SLIP = STICKY = Material("sticky", solid=True, friction=1.0)
PERIODIC = Material("periodic", solid=False, periodic=True)
