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
]
