"""npz frame-sequence data pipeline for closure training.

Equivalents of diffpiso/datamanagement.py:

  create_base_dir       <- :11-22  (incrementing run directories)
  data_path_assembler   <- :35-47  (frame sequences with dt_ratio striding
                                    and per-simulation characteristics)
  SequenceDataset       <- make_tf_dataset + load_function (:25-64), as a
                           plain python iterator (host-side IO; device work
                           stays in the jitted train step)

plus the bilinear staggered/centered resampling the reference does through
StaggeredGrid.at(...) when the dataset resolution differs from the training
grid (combined_training_integrated.py:170-175).
"""

from __future__ import annotations

import os
from collections.abc import Iterable
from typing import List, Sequence, Tuple

import numpy as np


def create_base_dir(path: str, name: str) -> str:
    i = 0
    while os.path.exists(path + name + str(i).zfill(6)):
        i += 1
    full = path + name + str(i).zfill(6)
    os.makedirs(full, exist_ok=True)
    return full


def data_path_assembler(
    paths: Sequence[str],
    field_names: Sequence[str],
    characteristics,
    start_frame: Sequence[int],
    frame_count: Sequence[int],
    step_count: Sequence[int],
    dt_ratio: int = 1,
):
    """File lists: for each sample, step_count+1 frames strided by dt_ratio
    per field, plus the sample's characteristics tuple."""
    file_list: Tuple[list, ...] = tuple([] for _ in range(len(field_names) + 1))
    for p, pth in enumerate(paths):
        for i in range(start_frame[p], start_frame[p] + frame_count[p] - step_count[p] * dt_ratio):
            for n, fname in enumerate(field_names):
                file_list[n].append(
                    [
                        os.path.join(pth, f"{fname}_{str(i + j * dt_ratio).zfill(6)}.npz")
                        for j in range(0, step_count[p] + 1)
                    ]
                )
            if isinstance(characteristics[p], Iterable):
                file_list[-1].append(characteristics[p][i - start_frame[p]])
            else:
                file_list[-1].append(characteristics[p])
    return file_list


def _load_npz(path: str) -> np.ndarray:
    from diffpiso_tpu.learning import native_loader

    return np.asarray(native_loader.load_npz(path), np.float32)


# -- bilinear resampling (HR data -> LR training grid) ----------------------------


def _bilinear_1d(data: np.ndarray, coords: np.ndarray, axis: int) -> np.ndarray:
    coords = np.clip(coords, 0, data.shape[axis] - 1)
    lo = np.floor(coords).astype(int)
    hi = np.minimum(lo + 1, data.shape[axis] - 1)
    w = (coords - lo).astype(data.dtype)
    lo_vals = np.take(data, lo, axis=axis)
    hi_vals = np.take(data, hi, axis=axis)
    shape = [1] * data.ndim
    shape[axis] = -1
    w = w.reshape(shape)
    return lo_vals * (1 - w) + hi_vals * w


def resample_staggered_tensor(tensor: np.ndarray, ratio: int) -> np.ndarray:
    """Downsample a stacked staggered tensor (..., NY+1, NX+1, 2) by an
    integer factor via bilinear sampling at the coarse face locations
    (equivalent to StaggeredGrid.at(coarse_grid))."""
    if ratio == 1:
        return tensor
    squeeze = tensor.ndim == 3
    if squeeze:
        tensor = tensor[None]
    NY, NX = tensor.shape[1] - 1, tensor.shape[2] - 1
    ny, nx = NY // ratio, NX // ratio
    # v: nodes at (y=j*ratio, x=(i+0.5)*ratio - 0.5) in fine index space
    v = tensor[..., 0]
    v = _bilinear_1d(v, np.arange(ny + 1) * ratio, axis=1)
    v = _bilinear_1d(v, (np.arange(nx) + 0.5) * ratio - 0.5, axis=2)
    u = tensor[..., 1]
    u = _bilinear_1d(u, (np.arange(ny) + 0.5) * ratio - 0.5, axis=1)
    u = _bilinear_1d(u, np.arange(nx + 1) * ratio, axis=2)
    out = np.zeros(tensor.shape[:1] + (ny + 1, nx + 1, 2), tensor.dtype)
    out[:, :, :nx, 0] = v
    out[:, :ny, :, 1] = u
    return out[0] if squeeze else out


def resample_centered(data: np.ndarray, ratio: int) -> np.ndarray:
    """Downsample a centered field (..., NY, NX) or (..., NY, NX, 1)."""
    if ratio == 1:
        return data
    squeeze_ch = data.shape[-1] == 1
    if squeeze_ch:
        data = data[..., 0]
    squeeze_b = data.ndim == 2
    if squeeze_b:
        data = data[None]
    NY, NX = data.shape[1], data.shape[2]
    ny, nx = NY // ratio, NX // ratio
    out = _bilinear_1d(data, (np.arange(ny) + 0.5) * ratio - 0.5, axis=1)
    out = _bilinear_1d(out, (np.arange(nx) + 0.5) * ratio - 0.5, axis=2)
    if squeeze_b:
        out = out[0]
    if squeeze_ch:
        out = out[..., None]
    return out


class SequenceDataset:
    """Iterates (velocity_seq, pressure_seq, characteristics) samples.

    velocity_seq: (step_count+1, ny+1, nx+1, 2) stacked staggered tensors at
    the training resolution; pressure_seq: (step_count+1, ny, nx)."""

    def __init__(
        self,
        paths: Sequence[str],
        characteristics,
        start_frame: Sequence[int],
        frame_count: Sequence[int],
        step_count: int,
        dt_ratio: int = 1,
        dx_ratio: int = 1,
    ):
        self.dx_ratio = dx_ratio
        lists = data_path_assembler(
            paths,
            ["velocity", "pressure"],
            characteristics,
            start_frame,
            frame_count,
            [step_count] * len(paths),
            dt_ratio,
        )
        self.velocity_files, self.pressure_files, self.characteristics = lists

    def __len__(self):
        return len(self.velocity_files)

    def sample(self, idx: int):
        vel = np.stack([_load_npz(f) for f in self.velocity_files[idx]])
        pre = np.stack([_load_npz(f) for f in self.pressure_files[idx]])
        if vel.ndim == 5:  # stored with batch dim (1, ny+1, nx+1, 2)
            vel = vel[:, 0]
        if pre.ndim == 5:
            pre = pre[:, 0]
        if pre.shape[-1] == 1:
            pre = pre[..., 0]
        vel = resample_staggered_tensor(vel, self.dx_ratio)
        pre = resample_centered(pre, self.dx_ratio)
        return vel, pre, np.asarray(self.characteristics[idx], np.float32)

    def iterate(self, shuffle: bool = True, seed=None, prefetch: int = 2):
        """Yield samples; the native loader pool decodes the next `prefetch`
        samples' files in background threads while the caller computes."""
        from diffpiso_tpu.learning import native_loader

        order = np.arange(len(self))
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        for pos, idx in enumerate(order):
            if prefetch and native_loader.available():
                upcoming = []
                for nxt in order[pos + 1 : pos + 1 + prefetch]:
                    upcoming += self.velocity_files[int(nxt)]
                    upcoming += self.pressure_files[int(nxt)]
                native_loader.prefetch(upcoming)
            yield self.sample(int(idx))
