"""Field effects: localized sources/sinks/forcings applied between steps.

Parity with the reference's phi/physics/field/effect.py: FieldEffect with
modes GROW (rate integrated by dt), ADD (one-shot), FIX (clamp the value
inside a region), the standard constructors (Inflow, HeatSource, ColdSource,
Fan/Accelerator, ConstantVelocity) and the Gravity state (effect.py:16-99).
The reference applies them inside Fluid/Smoke/Heat steps
(fluid.py:92-118 effect_applied); here incompressible_flow_step accepts
density_effects / velocity_effects.

TPU-native: effects are frozen pytrees holding PRE-SAMPLED arrays (geometry
masks sampled once at construction, antialiased), so applying one inside a
jitted step is pure arithmetic — no geometry resampling per step."""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from diffpiso_tpu.fields.box import Box
from diffpiso_tpu.fields.geometry import Geometry, geometry_mask
from diffpiso_tpu.fields.grid import StaggeredField
from diffpiso_tpu.ops.fv import centered_to_faces

GROW = "grow"
ADD = "add"
FIX = "fix"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FieldEffect:
    """field — the effect's sampled values (array, StaggeredField, or
    scalar); mode — GROW integrates field*dt, ADD adds once, FIX imposes
    `field` where bounds_mask is 1 (effect.py:16-60)."""

    field: Any
    bounds_mask: Any = None
    mode: str = dataclasses.field(default=GROW, metadata=dict(static=True))


def effect_applied(effect: FieldEffect, target, dt):
    """Apply one effect to a target field (effect.py:47-59). Works on plain
    arrays and StaggeredFields (leaf-wise)."""

    def one(t, f, m):
        if effect.mode == GROW:
            return t + dt * f
        if effect.mode == ADD:
            return t + f
        if effect.mode == FIX:
            return t * (1.0 - m) + m * f
        raise ValueError(effect.mode)

    if isinstance(target, StaggeredField):
        fs = (
            effect.field.components
            if isinstance(effect.field, StaggeredField)
            else (effect.field,) * len(target.components)
        )
        ms = (
            effect.bounds_mask.components
            if isinstance(effect.bounds_mask, StaggeredField)
            else (effect.bounds_mask,) * len(target.components)
        )
        return StaggeredField(
            tuple(one(t, f, m) for t, f, m in zip(target.components, fs, ms)),
            periodic=target.periodic,
        )
    return one(target, effect.field, effect.bounds_mask)


def _staggered_from_centered(centered, vector, periodic):
    from diffpiso_tpu.fields.material import CIRCULAR, REPLICATE

    comps = []
    for d in range(len(vector)):
        mode = CIRCULAR if periodic[d] else REPLICATE
        comps.append(centered_to_faces(centered, d, mode) * float(vector[d]))
    return StaggeredField(tuple(comps), periodic=periodic)


def Inflow(geometry: Geometry, resolution, box: Optional[Box] = None, rate=1.0):
    """Continuous density source (effect.py:62)."""
    return FieldEffect(
        geometry_mask(geometry, resolution, box, antialias=True) * rate, mode=GROW
    )


def HeatSource(geometry: Geometry, resolution, box=None, rate=1.0):
    return FieldEffect(
        geometry_mask(geometry, resolution, box, antialias=True) * rate, mode=GROW
    )


def ColdSource(geometry: Geometry, resolution, box=None, rate=1.0):
    return FieldEffect(
        geometry_mask(geometry, resolution, box, antialias=True) * (-rate), mode=GROW
    )


def Accelerator(
    geometry: Geometry,
    acceleration: Sequence[float],
    resolution,
    box: Optional[Box] = None,
    periodic: Optional[Tuple[bool, ...]] = None,
):
    """Continuous body force on the velocity inside a region
    (effect.py:63; Fan is its deprecated alias, :69)."""
    periodic = periodic or (False,) * len(resolution)
    m = geometry_mask(geometry, resolution, box, antialias=True)
    return FieldEffect(
        _staggered_from_centered(m, tuple(acceleration), periodic), mode=GROW
    )


Fan = Accelerator  # effect.py:69


def ConstantVelocity(
    geometry: Geometry,
    velocity: Sequence[float],
    resolution,
    box: Optional[Box] = None,
    periodic: Optional[Tuple[bool, ...]] = None,
):
    """Clamp the velocity to a constant inside the region (effect.py:64)."""
    periodic = periodic or (False,) * len(resolution)
    m = geometry_mask(geometry, resolution, box, antialias=True)
    mask_st = _staggered_from_centered(m, (1.0,) * len(resolution), periodic)
    value_st = StaggeredField(
        tuple(
            jnp.full_like(c, float(velocity[d]))
            for d, c in enumerate(mask_st.components)
        ),
        periodic=periodic,
    )
    return FieldEffect(value_st, bounds_mask=mask_st, mode=FIX)


@dataclasses.dataclass(frozen=True)
class Gravity:
    """Gravity state (effect.py:76-99); vectors or scalars add."""

    gravity: Any = -9.81

    def __add__(self, other: "Gravity") -> "Gravity":
        a = jnp.asarray(self.gravity, jnp.float32)
        b = jnp.asarray(other.gravity, jnp.float32)
        if a.ndim == 0 and b.ndim == 0:
            return Gravity(a + b)
        rank = max(a.size if a.ndim else 1, b.size if b.ndim else 1)

        def vec(g):
            if g.ndim == 0:
                return jnp.concatenate([g[None], jnp.zeros(rank - 1, g.dtype)])
            return g

        return Gravity(vec(a) + vec(b))
