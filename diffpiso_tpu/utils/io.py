"""Simulation I/O in the reference's npz conventions.

Scene directories hold `<fieldname>_<frame:06d>.npz` files (PhiFlow's
fluidformat, phi/data/fluidformat.py:59-74; the entry scripts write
velocity_%06d.npz / pressure_%06d.npz), so data produced by either
framework is interchangeable. The storage conventions are replicated
exactly (fluidformat.py:21-37):

  * np.savez_compressed, one unnamed array per file; readers take the LAST
    entry of the npz (fluidformat.py:23).
  * a leading batch dim of size 1 is squeezed on write and re-added on
    read (fluidformat.py:24-26,32-33).
  * channel components are stored in XYZ order; this framework's axis
    order is (y, x) ["not x_first"], so channel-carrying arrays reverse
    their last axis on both write and read (fluidformat.py:27-28,35-36).
  * Scene paths are <dir>/<category>/sim_%06d (fluidformat.py:141).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Sequence

import numpy as np


def write_zipped_array(filename: str, array: np.ndarray, async_: bool = False):
    """Reference-exact npz write (fluidformat.py:31-37): squeeze a leading
    1-batch, store components XYZ (reverse our y-x channel order when the
    last dim is a >1 channel axis), savez_compressed. async_=True hands the
    file to the native background writer (learning/native_writer.py) —
    call wait_pending_writes() before reading any async frame back."""
    array = np.asarray(array)
    if array.ndim > 1 and array.shape[0] == 1:
        array = array[0, ...]
    if array.ndim > 1 and array.shape[-1] != 1 and array.shape[-1] <= array.ndim:
        # heuristic matches the reference: the trailing axis is a component
        # axis (size <= rank); stored order is always XYZ
        array = array[..., ::-1]
    if async_:
        from diffpiso_tpu.learning.native_writer import savez

        savez(filename, async_=True, level=6, arr_0=array)
        return
    np.savez_compressed(filename, array)


def wait_pending_writes():
    """Barrier for write_zipped_array(..., async_=True) / Scene.write
    async frames; raises if any background write failed."""
    from diffpiso_tpu.learning.native_writer import wait

    wait()


def read_zipped_array(filename: str) -> np.ndarray:
    """Reference-exact npz read (fluidformat.py:21-28): last npz entry,
    batch dim restored, components flipped back to our y-x order."""
    with np.load(filename) as f:
        array = f[f.files[-1]]  # last entry is the data array
    if array.shape[0] != 1 or array.ndim == 1:
        array = np.expand_dims(array, axis=0)
    if array.ndim > 1 and array.shape[-1] != 1 and array.shape[-1] <= array.ndim:
        array = array[..., ::-1]
    return array


def _filename(directory: str, name: str, frame: int) -> str:
    # fluidformat.py:72-74: "%s_%06i.npz"
    return os.path.join(directory, "%s_%06i.npz" % (name, frame))


def write_sim_frame(directory: str, arrays: Dict[str, np.ndarray], frame: int,
                    async_: bool = False):
    os.makedirs(directory, exist_ok=True)
    for name, arr in arrays.items():
        write_zipped_array(
            _filename(directory, name, frame), np.asarray(arr), async_=async_
        )


def read_sim_frame(directory: str, fieldnames: Sequence[str], frame: int):
    out = []
    for name in fieldnames:
        arr = read_zipped_array(_filename(directory, name, frame))
        # plain planes round-trip without the batch dim for in-framework use
        out.append(arr[0] if arr.shape[0] == 1 else arr)
    return out


class Scene:
    """A simulation output directory with frame-indexed npz fields and a
    JSON description (phi/data/fluidformat.py:130-260 Scene)."""

    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)

    @staticmethod
    def create(parent: str, name: str = "sim", category: str | None = None) -> "Scene":
        """Next free <parent>[/<category>]/<name>_%06d directory. With a
        category this is byte-identical to the reference's Scene.path
        layout <dir>/<category>/sim_%06d (fluidformat.py:141)."""
        base = os.path.join(parent, category) if category else parent
        i = 0
        while os.path.exists(os.path.join(base, "%s_%06d" % (name, i))):
            i += 1
        return Scene(os.path.join(base, "%s_%06d" % (name, i)))

    def write(self, arrays: Dict[str, np.ndarray], frame: int,
              async_: bool = False):
        """async_=True enqueues the frame on the native background writer
        (utils.io.wait_pending_writes() is the read-back barrier)."""
        write_sim_frame(self.directory, arrays, frame, async_=async_)

    def read(self, fieldnames: Sequence[str], frame: int):
        return read_sim_frame(self.directory, fieldnames, frame)

    def frames(self, fieldname: str = "velocity"):
        out = []
        for f in sorted(os.listdir(self.directory)):
            if f.startswith(fieldname + "_") and f.endswith(".npz"):
                out.append(int(f[len(fieldname) + 1 : -4]))
        return out

    def subpath(self, name: str, create: bool = False) -> str:
        path = os.path.join(self.directory, name)
        if create:
            os.makedirs(path, exist_ok=True)
        return path

    def put_description(self, desc: dict):
        with open(os.path.join(self.directory, "description.json"), "w") as f:
            json.dump(desc, f, indent=2, default=str)

    def get_description(self) -> dict:
        with open(os.path.join(self.directory, "description.json")) as f:
            return json.load(f)

    def exists_config(self) -> bool:
        return os.path.isfile(os.path.join(self.directory, "description.json"))


def save_source(script_path: str, run_dir: str):
    """Snapshot the entry script into the run directory for reproducibility
    (datamanagement.py:67-69 save_source; the reference's config system is
    'copy the script', combined_training_integrated.py:28)."""
    import shutil

    os.makedirs(run_dir, exist_ok=True)
    dst = os.path.join(run_dir, os.path.basename(script_path))
    shutil.copyfile(script_path, dst)
    return dst
