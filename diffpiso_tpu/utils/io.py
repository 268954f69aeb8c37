"""Simulation I/O in the reference's npz conventions.

Scene directories hold `<fieldname>_<frame:06d>.npz` files (PhiFlow's
fluidformat, phi/data/fluidformat.py; the entry scripts write
velocity_%06d.npz / pressure_%06d.npz), so data produced by either framework
is interchangeable."""

from __future__ import annotations

import json
import os
from typing import Dict, Sequence

import numpy as np


def write_sim_frame(directory: str, arrays: Dict[str, np.ndarray], frame: int):
    os.makedirs(directory, exist_ok=True)
    for name, arr in arrays.items():
        np.savez(
            os.path.join(directory, f"{name}_{str(frame).zfill(6)}.npz"),
            np.asarray(arr),
        )


def read_sim_frame(directory: str, fieldnames: Sequence[str], frame: int):
    out = []
    for name in fieldnames:
        path = os.path.join(directory, f"{name}_{str(frame).zfill(6)}.npz")
        with np.load(path) as f:
            out.append(f[f.files[0]])
    return out


class Scene:
    """A simulation output directory with frame-indexed npz fields and a
    JSON description (the lightweight analog of PhiFlow's Scene)."""

    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)

    @staticmethod
    def create(parent: str, name: str = "sim") -> "Scene":
        i = 0
        while os.path.exists(os.path.join(parent, f"{name}_{str(i).zfill(6)}")):
            i += 1
        return Scene(os.path.join(parent, f"{name}_{str(i).zfill(6)}"))

    def write(self, arrays: Dict[str, np.ndarray], frame: int):
        write_sim_frame(self.directory, arrays, frame)

    def read(self, fieldnames: Sequence[str], frame: int):
        return read_sim_frame(self.directory, fieldnames, frame)

    def frames(self, fieldname: str = "velocity"):
        out = []
        for f in sorted(os.listdir(self.directory)):
            if f.startswith(fieldname + "_") and f.endswith(".npz"):
                out.append(int(f[len(fieldname) + 1 : -4]))
        return out

    def put_description(self, desc: dict):
        with open(os.path.join(self.directory, "description.json"), "w") as f:
            json.dump(desc, f, indent=2, default=str)

    def get_description(self) -> dict:
        with open(os.path.join(self.directory, "description.json")) as f:
            return json.load(f)


def save_source(script_path: str, run_dir: str):
    """Snapshot the entry script into the run directory for reproducibility
    (datamanagement.py:67-69 save_source; the reference's config system is
    'copy the script', combined_training_integrated.py:28)."""
    import shutil

    os.makedirs(run_dir, exist_ok=True)
    dst = os.path.join(run_dir, os.path.basename(script_path))
    shutil.copyfile(script_path, dst)
    return dst
