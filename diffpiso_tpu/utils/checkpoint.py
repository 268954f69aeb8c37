"""Checkpoint / resume for full training state.

Capability parity with the reference's checkpointing (tf.train.Saver over
network weights, combined_training_integrated.py:52,193,264,369; PhiFlow's
Session.save/restore, phi/tf/session.py:102-127), upgraded TPU-native: the
WHOLE train state pytree (params + optimizer state + step + rng) goes
through orbax (sharding-aware, async-capable, multi-host-safe), with a plain
npz fallback for environments without orbax. The reference's
'model_last_working' rolling checkpoint is the `tag` argument.
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Any, Optional

import numpy as np

try:
    import orbax.checkpoint as ocp

    _ORBAX = True
except Exception:  # pragma: no cover
    _ORBAX = False


class CheckpointManager:
    """save(step, state) / restore(step=None -> latest) / latest_step().

    Layout: <directory>/step_<N>/ (orbax) or <directory>/step_<N>.ckpt
    (pickle-npz fallback). `keep` bounds retained step checkpoints; tagged
    checkpoints (save_tag/restore_tag) are never pruned."""

    def __init__(
        self,
        directory: str,
        keep: int = 5,
        use_orbax: Optional[bool] = None,
        async_save: bool = False,
    ):
        """async_save=True writes step/tag checkpoints on orbax's background
        thread so the training loop never blocks on IO (call wait() before
        reading a just-saved checkpoint or exiting)."""
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.keep = keep
        self.use_orbax = _ORBAX if use_orbax is None else use_orbax
        self.async_save = async_save and self.use_orbax
        if self.use_orbax:
            self._ckptr = ocp.PyTreeCheckpointer()
            self._async_ckptr = (
                ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
                if self.async_save
                else None
            )

    def wait(self):
        """Block until all in-flight async saves are durable."""
        if self.async_save and self._async_ckptr is not None:
            self._async_ckptr.wait_until_finished()

    # -- step checkpoints ------------------------------------------------------
    def _step_path(self, step: int) -> str:
        base = os.path.join(self.directory, f"step_{step:08d}")
        return base if self.use_orbax else base + ".ckpt"

    def steps(self):
        out = []
        for name in os.listdir(self.directory):
            m = re.fullmatch(r"step_(\d+)(\.ckpt)?", name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def latest_step(self) -> Optional[int]:
        s = self.steps()
        return s[-1] if s else None

    def save(self, step: int, state: Any):
        path = self._step_path(step)
        self._write(path, state)
        self._prune()
        return path

    def restore(self, step: Optional[int] = None, target: Any = None) -> Any:
        """Restore a step checkpoint. `target` (a pytree of the same
        structure, e.g. the live (params, opt_state) before restore) makes
        orbax rebuild custom containers — optax NamedTuple states round-trip
        instead of coming back as raw dicts."""
        if step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return self._read(self._step_path(step), target)

    # -- tagged checkpoints (model_last_working analog) --------------------------
    def save_tag(self, tag: str, state: Any):
        path = os.path.join(self.directory, tag if self.use_orbax else tag + ".ckpt")
        self._write(path, state)
        return path

    def restore_tag(self, tag: str, target: Any = None) -> Any:
        return self._read(
            os.path.join(self.directory, tag if self.use_orbax else tag + ".ckpt"),
            target,
        )

    def has_tag(self, tag: str) -> bool:
        path = os.path.join(self.directory, tag if self.use_orbax else tag + ".ckpt")
        return os.path.exists(path)

    # -- backends -----------------------------------------------------------------
    def _write(self, path: str, state: Any):
        if self.use_orbax:
            import shutil

            if self.async_save:
                # wait unconditionally: an in-flight save targeting this same
                # path may not have committed yet (tmp dir not renamed), so an
                # existence check alone would let two saves race — save #1's
                # background commit then collides with save #2's.
                self.wait()
            if os.path.exists(path):
                shutil.rmtree(path)
            if self.async_save:
                self._async_ckptr.save(path, state)
                return
            self._ckptr.save(path, state)
        else:
            import jax

            leaves, treedef = jax.tree_util.tree_flatten(state)
            with open(path, "wb") as f:
                pickle.dump(
                    {"treedef": treedef, "leaves": [np.asarray(l) for l in leaves]},
                    f,
                )

    def _read(self, path: str, target: Any = None) -> Any:
        if self.use_orbax:
            self.wait()  # never read a checkpoint that is still landing
            if target is not None:
                return self._ckptr.restore(path, item=target)
            return self._ckptr.restore(path)
        import jax

        with open(path, "rb") as f:
            data = pickle.load(f)
        out = jax.tree_util.tree_unflatten(data["treedef"], data["leaves"])
        if target is not None:
            out = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(target), jax.tree_util.tree_leaves(out)
            )
        return out

    def _prune(self):
        steps = self.steps()
        for s in steps[: max(0, len(steps) - self.keep)]:
            path = self._step_path(s)
            if os.path.isdir(path):
                import shutil

                shutil.rmtree(path)
            elif os.path.exists(path):
                os.remove(path)
