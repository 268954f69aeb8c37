"""Declarative immutable simulation-state containers ("structs").

Capability parity with the reference's struct system (PhiFlow/phi/struct/:
@struct.definition(), @struct.variable/@struct.constant, struct.map/
flatten/shape — struct/__init__.py:1-9, structdef.py, functions.py), which
PhiFlow uses to make Field/Domain/State containers mappable and feedable.

TPU-native redesign: JAX pytrees already ARE that protocol. `@definition`
turns a frozen dataclass into a registered pytree where `variable()` fields
are traced children (the struct.variable analog) and `constant()` fields are
static aux data (struct.constant — hashable, participates in jit cache
keys). map/flatten/shape/staticshape/isstruct mirror the reference's
functional API on top of jax.tree_util, so they work on ANY pytree, not just
definitions.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np


def variable(default=dataclasses.MISSING, **kw):
    """Field holding traced array data (struct.variable)."""
    return dataclasses.field(
        default=default, metadata={"struct": "variable"}, **kw
    )


def constant(default=dataclasses.MISSING, **kw):
    """Static configuration field (struct.constant): hashable aux data, part
    of the jit cache key, invisible to tree_map/grad."""
    return dataclasses.field(
        default=default, metadata={"struct": "constant"}, **kw
    )


def definition(cls=None, /, **dc_kwargs):
    """Class decorator: frozen dataclass + pytree registration
    (@struct.definition()). Unmarked fields default to variables."""

    def wrap(c):
        c = dataclasses.dataclass(frozen=True, **dc_kwargs)(c)
        data_fields, meta_fields = [], []
        for f in dataclasses.fields(c):
            if f.metadata.get("struct") == "constant":
                meta_fields.append(f.name)
            else:
                data_fields.append(f.name)
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=meta_fields
        )
        c.copied_with = _copied_with
        return c

    return wrap if cls is None else wrap(cls)


def _copied_with(self, **updates):
    """Immutable update (the reference's copied_with idiom)."""
    return dataclasses.replace(self, **updates)


# -- functional API over any pytree (struct.functions parity) -------------------


def smap(fn, *structs):
    """struct.map: apply fn to every variable leaf (tree_map)."""
    return jax.tree_util.tree_map(fn, *structs)


def flatten(struct_) -> list:
    """struct.flatten: list of variable leaves."""
    return jax.tree_util.tree_leaves(struct_)


def unflatten(struct_, leaves):
    treedef = jax.tree_util.tree_structure(struct_)
    return jax.tree_util.tree_unflatten(treedef, list(leaves))


def szip(structs):
    """struct.zip: a struct of tuples from a list of identical structs."""
    return jax.tree_util.tree_map(lambda *ls: ls, *structs)


def shape(struct_):
    """struct.shape: same structure with each leaf replaced by its shape."""
    return jax.tree_util.tree_map(lambda l: np.shape(l), struct_)


def staticshape(struct_):
    return shape(struct_)


def isstruct(obj: Any) -> bool:
    """True if obj is a non-leaf pytree (the struct.isstruct analog)."""
    leaves = jax.tree_util.tree_leaves(obj)
    return not (len(leaves) == 1 and leaves[0] is obj)
