"""World / StateCollection: dependency-ordered multi-physics stepping.

Capability parity with PhiFlow/phi/physics/world.py (World.add/step) and
collective.py (StateCollection dependency resolution). TPU-native redesign:
the collection's values form one pytree, and `make_step_fn` closes the
static structure (names, tags, physics, dependency order) over a pure
function of that pytree — so a whole heterogeneous world steps inside one
jit / lax.scan.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List

import jax

from diffpiso_tpu.physics.base import Physics, StateRecord, Static


class StateCollection:
    """Ordered mapping name -> StateRecord with tag lookup
    (phi/physics/collective.py StateCollection)."""

    def __init__(self, records: Dict[str, StateRecord] | None = None):
        self.records: Dict[str, StateRecord] = dict(records or {})

    def __getitem__(self, name: str):
        return self.records[name].value

    def __contains__(self, name: str):
        return name in self.records

    def names(self):
        return list(self.records)

    def with_tag(self, tag: str) -> List[str]:
        return [n for n, r in self.records.items() if tag in r.tags]

    def values_pytree(self):
        return {n: r.value for n, r in self.records.items()}


class World:
    """Registry of named states + their Physics; steps them in dependency
    order (world.py World.add/step)."""

    def __init__(self):
        self.collection = StateCollection()

    def add(self, name: str, value, physics: Physics | None = None, tags=()):
        self.collection.records[name] = StateRecord(
            name=name, value=value, tags=tuple(tags), physics=physics or Static()
        )
        return name

    def __getitem__(self, name: str):
        return self.collection[name]

    def _step_order(self) -> List[str]:
        """Topological order: states whose physics has blocking dependencies
        step after the states carrying those tags (collective.py's
        dependency graph, simplified to tag edges)."""
        names = self.collection.names()
        deps: Dict[str, set] = {n: set() for n in names}
        for n in names:
            rec = self.collection.records[n]
            for d in rec.physics.dependencies:
                if not d.blocking:
                    continue
                providers = (
                    [d.state_name]
                    if d.state_name is not None
                    else self.collection.with_tag(d.tag)
                )
                deps[n].update(p for p in providers if p in deps and p != n)
        order, done = [], set()

        def visit(n, stack=()):
            if n in done:
                return
            if n in stack:
                raise ValueError(f"circular blocking dependency through {n!r}")
            for p in sorted(deps[n]):
                visit(p, stack + (n,))
            done.add(n)
            order.append(n)

        for n in names:
            visit(n)
        return order

    def make_step_fn(self, dt=1.0) -> Callable[[Dict[str, Any]], Dict[str, Any]]:
        """Build a pure function values_dict -> values_dict stepping every
        state once in dependency order. jit/scan/grad-compatible as long as
        each Physics.step is."""
        order = self._step_order()
        records = dict(self.collection.records)

        def step_fn(values: Dict[str, Any]) -> Dict[str, Any]:
            out = dict(values)
            for n in order:
                rec = records[n]
                kwargs = {}
                for d in rec.physics.dependencies:
                    providers = (
                        [d.state_name]
                        if d.state_name is not None
                        else [m for m, r in records.items() if d.tag in r.tags]
                    )
                    # blocking deps read the updated values, non-blocking the old
                    src = out if d.blocking else values
                    vals = [src[p] for p in providers if p in src]
                    kwargs[d.parameter_name] = (
                        (vals[0] if vals else None) if d.single_state else tuple(vals)
                    )
                out[n] = rec.physics.step(out[n], dt=dt, **kwargs)
            return out

        return step_fn

    def step(self, dt=1.0):
        """Eager convenience: step all registered states in place."""
        fn = self.make_step_fn(dt)
        new_values = fn(self.collection.values_pytree())
        for n, v in new_values.items():
            rec = self.collection.records[n]
            rec.value = v
            rec.age += dt
        return self

    def jitted_step(self, dt=1.0):
        return jax.jit(self.make_step_fn(dt))
