from diffpiso_tpu.fields.box import Box
from diffpiso_tpu.fields.material import (
    Material,
    OPEN,
    CLOSED,
    NO_SLIP,
    NO_STICK,
    PERIODIC,
    SLIPPERY,
    STICKY,
)
from diffpiso_tpu.fields.grid import CenteredField, StaggeredField
from diffpiso_tpu.fields.domain import Domain
from diffpiso_tpu.fields.geometry import (
    BoxGeometry,
    Geometry,
    RotatedBox,
    Sphere,
    Union,
    cell_center_points,
    geometry_mask,
    rotated,
    union,
    union_mask,
)
from diffpiso_tpu.fields.noise import noise, noise_staggered, random_solenoidal
from diffpiso_tpu.fields.sampled import (
    SampledField,
    advect_points,
    distribute_points,
    regular_points,
    velocity_at_points,
)
from diffpiso_tpu.fields.extrapolate import create_surface_mask, extrapolate
from diffpiso_tpu.fields.angular_velocity import AngularVelocity, gaussian_falloff
from diffpiso_tpu.fields import struct

__all__ = [
    "Box",
    "Material",
    "OPEN",
    "CLOSED",
    "NO_SLIP",
    "NO_STICK",
    "PERIODIC",
    "SLIPPERY",
    "STICKY",
    "CenteredField",
    "StaggeredField",
    "Domain",
    "BoxGeometry",
    "Geometry",
    "RotatedBox",
    "Sphere",
    "Union",
    "cell_center_points",
    "geometry_mask",
    "rotated",
    "union",
    "union_mask",
    "noise",
    "noise_staggered",
    "random_solenoidal",
    "AngularVelocity",
    "gaussian_falloff",
    "SampledField",
    "advect_points",
    "create_surface_mask",
    "distribute_points",
    "extrapolate",
    "regular_points",
    "velocity_at_points",
]
