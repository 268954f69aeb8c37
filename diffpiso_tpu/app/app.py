"""Interactive-style simulation apps: field registry, controls, recording.

Capability parity with the reference's App / EditableValue system
(PhiFlow/phi/app/app.py, value.py, control.py) and LearningApp
(PhiFlow/phi/tf/app.py), redesigned for headless TPU jobs: instead of a live
Dash web server, an App steps a jitted simulation, exposes named field
viewers, applies EditableValue controls between (not inside) compiled steps,
records frames to a Scene directory, and renders a static HTML dashboard
(see diffpiso_tpu/app/display.py) that any browser can open from the run
directory — the zero-egress equivalent of the reference's web GUI.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from diffpiso_tpu.utils.io import Scene


@dataclasses.dataclass
class EditableValue:
    """A named control (phi/app/value.py EditableValue). `kind` is float/int/
    bool; bounds apply to numeric kinds. Values are plain Python scalars read
    between steps, so editing never retraces the compiled step."""

    name: str
    value: Any
    kind: str = "float"
    min_value: Optional[float] = None
    max_value: Optional[float] = None

    def set(self, v):
        if self.kind == "int":
            v = int(v)
        elif self.kind == "float":
            v = float(v)
        elif self.kind == "bool":
            v = bool(v)
        if self.min_value is not None:
            v = max(v, self.min_value)
        if self.max_value is not None:
            v = min(v, self.max_value)
        self.value = v
        return self.value


def EditableFloat(name, value, minmax=None):
    lo, hi = minmax if minmax else (None, None)
    return EditableValue(name, float(value), "float", lo, hi)


def EditableInt(name, value, minmax=None):
    lo, hi = minmax if minmax else (None, None)
    return EditableValue(name, int(value), "int", lo, hi)


def EditableBool(name, value):
    return EditableValue(name, bool(value), "bool")


class App:
    """Headless simulation app (phi/app/app.py App).

    Subclass (or compose) with a `step_fn(state) -> state`; register fields
    via add_field(name, getter) and controls via add_control. run(steps)
    drives the loop, recording every `record_every` steps.
    """

    def __init__(
        self,
        name: str = "app",
        base_dir: str = "runs",
        record_every: int = 10,
        scene: Optional[Scene] = None,
    ):
        self.name = name
        self.steps = 0
        self.record_every = record_every
        self.fields: Dict[str, Callable[[], np.ndarray]] = {}
        self.controls: Dict[str, EditableValue] = {}
        self.actions: Dict[str, Callable[[], None]] = {}
        self.scalars: Dict[str, List[float]] = {}
        self.scene = scene or Scene.create(base_dir, name)
        self._step_fn: Optional[Callable] = None
        self.state: Any = None
        self._t0 = time.perf_counter()

    # -- registry (App.add_field / EditableValue handling) --------------------
    def add_field(self, name: str, getter: Callable[[], Any]):
        self.fields[name] = getter

    def add_control(self, control: EditableValue):
        self.controls[control.name] = control
        return control

    def add_action(self, name: str, fn: Callable[[], None]):
        self.actions[name] = fn

    def log_scalar(self, name: str, value: float):
        self.scalars.setdefault(name, []).append(float(value))

    def set_step(self, step_fn: Callable, initial_state: Any):
        self._step_fn = step_fn
        self.state = initial_state

    # -- loop ------------------------------------------------------------------
    def step(self):
        assert self._step_fn is not None, "call set_step first"
        self.state = self._step_fn(self.state)
        self.steps += 1
        if self.record_every and self.steps % self.record_every == 0:
            self.record_frame()
        return self.state

    def run(self, steps: int):
        for _ in range(steps):
            self.step()
        return self.state

    def record_frame(self):
        arrays = {}
        for name, getter in self.fields.items():
            arrays[name] = np.asarray(getter())
        if arrays:
            self.scene.write(arrays, frame=self.steps)

    # -- status (App.status / progress string) ---------------------------------
    def status(self) -> dict:
        return {
            "name": self.name,
            "steps": self.steps,
            "wall_s": round(time.perf_counter() - self._t0, 3),
            "controls": {n: c.value for n, c in self.controls.items()},
            "scalars": {n: (v[-1] if v else None) for n, v in self.scalars.items()},
        }

    def save_status(self):
        path = os.path.join(self.scene.directory, "status.json")
        with open(path, "w") as f:
            json.dump(self.status(), f, indent=1)
        return path


class LearningApp(App):
    """App + training conveniences (phi/tf/app.py LearningApp): scalar loss
    curves, checkpoint save/load hooks, epoch bookkeeping."""

    def __init__(self, name="learning", base_dir="runs", record_every=0, **kw):
        super().__init__(name, base_dir, record_every, **kw)
        self.epoch = 0

    def add_objective(self, loss_value: float):
        self.log_scalar("loss", loss_value)

    def save_model(self, params, tag: str = "model"):
        from diffpiso_tpu.learning.training import save_params

        # orbax writes a directory; keep the name extension-free
        path = os.path.join(self.scene.directory, tag)
        save_params(path, params)
        return path

    def load_model(self, path: str):
        from diffpiso_tpu.learning.training import load_params

        return load_params(path)

    def end_epoch(self):
        self.epoch += 1
        self.save_status()
        # loss-curve npz, like the reference's per-epoch loss histories
        # (combined_training_integrated.py:379-380)
        np.savez(
            os.path.join(self.scene.directory, f"scalars_epoch{self.epoch:03d}.npz"),
            **{k: np.asarray(v) for k, v in self.scalars.items()},
        )
