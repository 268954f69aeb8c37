"""Staggered / centered field containers (JAX pytrees).

Capability parity with the reference's CenteredGrid / StaggeredGrid
(PhiFlow/phi/physics/field/grid.py:26-249, staggered_grid.py:33-269) on a
TPU-native representation:

* arrays are (y, x) — no batch/channel axes baked in (batch via vmap),
* a staggered velocity is a tuple of per-axis face arrays
  (v: (ny+1, nx), u: (ny, nx+1)) instead of one padded (ny+1, nx+1, 2)
  tensor, so each component keeps a dense, tile-friendly layout,
* fields are registered pytrees: they flow through jit/grad/scan/shard_map.

`staggered_tensor()` / `from_staggered_tensor()` convert to/from the
reference's zero-padded stacked layout (stack_staggered_components /
unstack_staggered_tensor, staggered_grid.py:33-46) for I/O parity with
reference-produced npz data.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _binop(f):
    def op(self, other):
        if isinstance(other, StaggeredField):
            return StaggeredField(
                tuple(f(a, b) for a, b in zip(self.components, other.components)),
                periodic=self.periodic,
            )
        return StaggeredField(
            tuple(f(a, other) for a in self.components), periodic=self.periodic
        )

    return op


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StaggeredField:
    """Velocity on a MAC staggered grid.

    components[d] is the velocity along axis d, sampled on faces normal to
    axis d. Axis order: 0 = y, 1 = x; components = (v, u).

    Shapes: resolution + e_d on non-periodic axes (boundary faces on both
    ends stored, like the reference). On PERIODIC axes only the unique faces
    are stored (shape = resolution along d) — no duplicated wrap face, so
    arrays stay tile-aligned and wraps are plain rolls. `periodic` is static
    pytree metadata.
    """

    components: Tuple[jax.Array, ...]
    periodic: Tuple[bool, ...] = dataclasses.field(
        default=None, metadata=dict(static=True)
    )

    def __post_init__(self):
        object.__setattr__(self, "components", tuple(self.components))
        per = self.periodic
        if per is None:
            per = (False,) * len(self.components)
        object.__setattr__(self, "periodic", tuple(bool(p) for p in per))

    # -- shape --------------------------------------------------------------
    @property
    def rank(self) -> int:
        return len(self.components)

    @property
    def resolution(self) -> Tuple[int, ...]:
        return tuple(
            self.components[d].shape[d] - (0 if self.periodic[d] else 1)
            for d in range(len(self.components))
        )

    @property
    def dtype(self):
        return self.components[0].dtype

    # -- constructors ---------------------------------------------------------
    @staticmethod
    def zeros(resolution, dtype=jnp.float32, periodic=None) -> "StaggeredField":
        res = tuple(int(r) for r in resolution)
        if periodic is None:
            periodic = (False,) * len(res)
        comps = []
        for d in range(len(res)):
            shape = tuple(
                r + (1 if i == d and not periodic[i] else 0)
                for i, r in enumerate(res)
            )
            comps.append(jnp.zeros(shape, dtype))
        return StaggeredField(tuple(comps), periodic=periodic)

    @staticmethod
    def from_staggered_tensor(tensor, periodic=None) -> "StaggeredField":
        """Convert from the reference's stacked layout.

        Accepts (ny+1, nx+1, d) or (1, ny+1, nx+1, d) (batch of one).
        Channel c holds the component along axis c (channel 0 = y).
        Components are cropped to their native shapes: component d keeps the
        full extent along axis d (minus the duplicate wrap face if axis d is
        periodic) and drops the last (padding) entry along other axes
        (unstack_staggered_tensor, staggered_grid.py:33-39).
        """
        tensor = jnp.asarray(tensor)
        if tensor.ndim == 4:
            tensor = tensor[0]
        rank = tensor.shape[-1]
        if periodic is None:
            periodic = (False,) * rank
        comps = []
        for d in range(rank):
            idx = tuple(
                slice(None) if (i == d and not periodic[i]) else slice(0, -1)
                for i in range(rank)
            )
            comps.append(tensor[idx + (d,)])
        return StaggeredField(tuple(comps), periodic=periodic)

    def staggered_tensor(self) -> jax.Array:
        """Convert to the reference's stacked layout (ny+1, nx+1, d), padding
        each component with zeros on the upper side of its non-staggered axes
        (stack_staggered_components, staggered_grid.py:41-46). Periodic axes
        re-materialize the duplicate wrap face."""
        rank = self.rank
        padded = []
        for d, comp in enumerate(self.components):
            if self.periodic[d]:
                first = jax.lax.slice_in_dim(comp, 0, 1, axis=d)
                comp = jnp.concatenate([comp, first], axis=d)
            widths = tuple((0, 0) if i == d else (0, 1) for i in range(rank))
            padded.append(jnp.pad(comp, widths))
        return jnp.stack(padded, axis=-1)

    # -- sampling -------------------------------------------------------------
    def at_centers(self) -> jax.Array:
        """Linearly interpolate all components to cell centers.

        Returns (ny, nx, d) with channel order (v, u) — matching the
        reference's StaggeredGrid.at_centers() (staggered_grid.py:150)."""
        outs = []
        for d, comp in enumerate(self.components):
            if self.periodic[d]:
                hi = jnp.roll(comp, -1, axis=d)
                outs.append(0.5 * (comp + hi))
            else:
                lo = jax.lax.slice_in_dim(comp, 0, comp.shape[d] - 1, axis=d)
                hi = jax.lax.slice_in_dim(comp, 1, comp.shape[d], axis=d)
                outs.append(0.5 * (lo + hi))
        return jnp.stack(outs, axis=-1)

    # -- arithmetic -----------------------------------------------------------
    __add__ = _binop(lambda a, b: a + b)
    __radd__ = _binop(lambda a, b: b + a)
    __sub__ = _binop(lambda a, b: a - b)
    __rsub__ = _binop(lambda a, b: b - a)
    __mul__ = _binop(lambda a, b: a * b)
    __rmul__ = _binop(lambda a, b: b * a)
    __truediv__ = _binop(lambda a, b: a / b)
    __neg__ = lambda self: StaggeredField(
        tuple(-a for a in self.components), periodic=self.periodic
    )

    def astype(self, dtype) -> "StaggeredField":
        return StaggeredField(
            tuple(a.astype(dtype) for a in self.components), periodic=self.periodic
        )

    def flatten(self, x_first: bool = True) -> jax.Array:
        """Concatenate flattened components into one vector.

        x_first=True reproduces the reference's coord_flip=True ordering
        (u block first, then v; flatten_staggered_data,
        diffpiso/piso_helpers.py:175-185)."""
        comps = self.components[::-1] if x_first else self.components
        return jnp.concatenate([c.reshape(-1) for c in comps])

    @staticmethod
    def unflatten(flat, resolution, x_first: bool = True, periodic=None) -> "StaggeredField":
        res = tuple(int(r) for r in resolution)
        rank = len(res)
        if periodic is None:
            periodic = (False,) * rank
        order = range(rank - 1, -1, -1) if x_first else range(rank)
        comps = [None] * rank
        offset = 0
        for d in order:
            shape = tuple(
                r + (1 if i == d and not periodic[i] else 0)
                for i, r in enumerate(res)
            )
            n = int(np.prod(shape))
            comps[d] = flat[offset : offset + n].reshape(shape)
            offset += n
        return StaggeredField(tuple(comps), periodic=periodic)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CenteredField:
    """Thin wrapper for cell-centered scalar fields. Core APIs accept plain
    arrays; this exists for user-facing parity with the reference's
    CenteredGrid where a named type is clearer."""

    data: jax.Array

    @property
    def resolution(self):
        return self.data.shape

    def __add__(self, other):
        other = other.data if isinstance(other, CenteredField) else other
        return CenteredField(self.data + other)

    def __sub__(self, other):
        other = other.data if isinstance(other, CenteredField) else other
        return CenteredField(self.data - other)

    def __mul__(self, other):
        other = other.data if isinstance(other, CenteredField) else other
        return CenteredField(self.data * other)
