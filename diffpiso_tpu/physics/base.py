"""State / Physics / StateDependency — the simulation orchestration protocol.

Capability parity with the reference's physics base layer
(PhiFlow/phi/physics/physics.py:1-187). TPU-native redesign: states are JAX
pytrees (so a World step composes under jit/scan/grad); identity metadata
(name, tags) is static aux data carried outside the traced arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple


@dataclasses.dataclass
class StateRecord:
    """A named, tagged slot in a StateCollection. `value` is an arbitrary
    pytree (array, NamedTuple state, dict...); `age` accumulates dt."""

    name: str
    value: Any
    tags: Tuple[str, ...] = ()
    age: float = 0.0
    physics: "Physics | None" = None


class StateDependency:
    """Declares that a Physics' step() wants states tagged `tag` passed as
    keyword `parameter_name` (physics.py StateDependency). blocking=True
    means those states are stepped first and the updated versions are
    passed."""

    def __init__(
        self,
        parameter_name: str,
        tag: str,
        single_state: bool = False,
        blocking: bool = False,
        state_name: str | None = None,
    ):
        self.parameter_name = parameter_name
        self.tag = tag
        self.single_state = single_state
        self.blocking = blocking
        self.state_name = state_name


class Physics:
    """Stateless time integrator: step(value, dt, **dependencies) -> value.

    Subclasses override step(). Unlike the reference (mutable TF1 graph
    construction), step must be a pure traced function of its pytree inputs
    so World.jitted_step can compile the whole collection."""

    def __init__(self, dependencies: Sequence[StateDependency] = ()):
        self.dependencies = tuple(dependencies)

    def step(self, value, dt=1.0, **dependent_states):
        raise NotImplementedError(type(self).__name__)


class Static(Physics):
    """No-op physics: the state is constant in time (physics.py STATIC)."""

    def step(self, value, dt=1.0, **dependent_states):
        return value


STATIC = Static()
