"""Axis-aligned box describing the physical extent of a domain.

Capability parity with the reference's AABox (PhiFlow/phi/geom/_box.py) for
the subset the solver uses: lower/upper corners, size, and grid spacing.
Axis order is (y, x) to match array index order throughout the framework.
Boxes are static (hashable python tuples) so they can live in pytree
metadata and inside jit-traced closures without becoming tracers.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class Box:
    lower: Tuple[float, ...]
    upper: Tuple[float, ...]

    def __post_init__(self):
        object.__setattr__(self, "lower", tuple(float(v) for v in self.lower))
        object.__setattr__(self, "upper", tuple(float(v) for v in self.upper))
        assert len(self.lower) == len(self.upper)

    @staticmethod
    def from_size(size: Sequence[float], lower: Sequence[float] | None = None) -> "Box":
        size = tuple(float(s) for s in size)
        if lower is None:
            lower = (0.0,) * len(size)
        lower = tuple(float(v) for v in lower)
        return Box(lower, tuple(lo + s for lo, s in zip(lower, size)))

    @property
    def rank(self) -> int:
        return len(self.lower)

    @property
    def size(self) -> Tuple[float, ...]:
        return tuple(u - l for l, u in zip(self.lower, self.upper))

    @property
    def half_size(self) -> Tuple[float, ...]:
        return tuple(0.5 * s for s in self.size)

    def dx(self, resolution: Sequence[int]) -> Tuple[float, ...]:
        """Grid spacing per axis for a given cell resolution (y, x)."""
        return tuple(s / int(r) for s, r in zip(self.size, resolution))
