"""Batched random-access reading over Scene directories.

Capability parity with the reference's data layer
(PhiFlow/phi/data/reader.py BatchReader, dataset.py Dataset, stream.py
streams): index the frames of many Scene directories, slice/shuffle them,
and iterate stacked numpy batches. Decoding goes through the native C++ npz
loader (native/npz_loader.cc) with background prefetch of the next batches,
so host IO overlaps device compute — the role TF's C++ tf.data runtime
plays in the reference.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import numpy as np

from diffpiso_tpu.learning import native_loader
from diffpiso_tpu.utils.io import Scene


class SceneDataset:
    """Flat index over (scene, frame) pairs for a set of field names
    (phi/data/dataset.py Dataset + fluidformat Scene discovery)."""

    def __init__(self, scenes: Sequence[Scene | str], fieldnames: Sequence[str]):
        self.scenes = [s if isinstance(s, Scene) else Scene(s) for s in scenes]
        self.fieldnames = list(fieldnames)
        self.index: List[Tuple[int, int]] = []
        for si, scene in enumerate(self.scenes):
            frames = scene.frames(self.fieldnames[0])
            for other in self.fieldnames[1:]:
                frames = [f for f in frames if f in set(scene.frames(other))]
            self.index += [(si, f) for f in frames]

    @staticmethod
    def from_directory(parent: str, fieldnames: Sequence[str], prefix: str = "sim"):
        """Discover all `<prefix>_NNNNNN` scene dirs under parent."""
        dirs = sorted(
            os.path.join(parent, d)
            for d in os.listdir(parent)
            if d.startswith(prefix + "_") and os.path.isdir(os.path.join(parent, d))
        )
        return SceneDataset(dirs, fieldnames)

    def __len__(self):
        return len(self.index)

    def paths(self, i: int) -> List[str]:
        si, frame = self.index[i]
        d = self.scenes[si].directory
        return [
            os.path.join(d, f"{name}_{str(frame).zfill(6)}.npz")
            for name in self.fieldnames
        ]

    def load(self, i: int) -> List[np.ndarray]:
        return [
            np.asarray(native_loader.load_npz(p), np.float32) for p in self.paths(i)
        ]


class BatchReader:
    """Iterate batches of stacked fields (phi/data/reader.py BatchReader).

    Yields one numpy array per field of shape (batch, *field_shape). The
    final short batch is dropped when drop_remainder (the reference's
    batching behavior with tf.data batch())."""

    def __init__(
        self,
        dataset: SceneDataset,
        batch_size: int = 1,
        shuffle: bool = False,
        seed: int | None = None,
        drop_remainder: bool = True,
        prefetch_batches: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.prefetch_batches = prefetch_batches

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_remainder and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed).shuffle(order)
        bs = self.batch_size
        n_batches = len(self)
        for b in range(n_batches):
            idxs = order[b * bs : (b + 1) * bs]
            if self.prefetch_batches and native_loader.available():
                upcoming: List[str] = []
                for nb in range(b + 1, min(b + 1 + self.prefetch_batches, n_batches)):
                    for i in order[nb * bs : (nb + 1) * bs]:
                        upcoming += self.dataset.paths(int(i))
                if upcoming:
                    native_loader.prefetch(upcoming)
            samples = [self.dataset.load(int(i)) for i in idxs]
            yield [np.stack(field) for field in zip(*samples)]
