"""Composable data streams over Scene sources.

Capability parity with the reference's streaming abstraction
(PhiFlow/phi/data/stream.py, 247 LoC): a DataStream names WHAT to read from
a simulation source (a field, the frame index, the scene handle), supports
elementwise arithmetic composition (stream derived from streams,
stream.py:21-43), frame re-selection (FrameSelect, stream.py:154-199), and
the consecutive_frames constructor used to build target sequences for
unrolled training (stream.py:236-247). StreamReader is the batch front-end
(phi/data/reader.py BatchReader): random-access `reader[i]` /
`reader[a:b]` over the flattened (source, frame) index, one stacked numpy
array per stream.

TPU-native redesign notes: sources are the repo's Scene directories
(utils/io.py) decoded through the native C++ npz loader when present; the
reference's 512 MB _BatchCache is replaced by a plain LRU over (source,
stream, frame) because host RAM, not GPU feed latency, is the constraint
here (device transfer happens once per batch under jit).
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Callable, List, Sequence, Tuple, Union

import numpy as np

from diffpiso_tpu.utils.io import Scene


class SceneSource:
    """A Scene directory as a stream data source (phi/data/source.py
    DataSource role): enumerable frames, per-field shapes, frame reads."""

    def __init__(self, scene: Union[Scene, str], frames: Sequence[int] | None = None):
        self.scene = scene if isinstance(scene, Scene) else Scene(scene)
        self._frames = list(frames) if frames is not None else None

    def frames(self, fieldname: str = "velocity") -> List[int]:
        if self._frames is not None:
            return self._frames
        return self.scene.frames(fieldname)

    def get(self, fieldname: str, frames: Sequence[int]) -> List[np.ndarray]:
        out = []
        for f in frames:
            path = os.path.join(
                self.scene.directory, f"{fieldname}_{str(f).zfill(6)}.npz"
            )
            from diffpiso_tpu.learning import native_loader

            out.append(np.asarray(native_loader.load_npz(path), np.float32))
        return out

    def shape(self, fieldname: str):
        fr = self.frames(fieldname)
        if not fr:
            return None
        return self.get(fieldname, fr[:1])[0].shape

    def size(self, fieldname: str = "velocity") -> int:
        return len(self.frames(fieldname))

    def __repr__(self):
        return f"SceneSource({self.scene.directory})"


class DataStream:
    """Abstract stream (stream.py:7-43). Subclasses define shape/size/
    frames/get; arithmetic composes streams elementwise."""

    def shape(self, source):
        raise NotImplementedError(self)

    def size(self, source):
        raise NotImplementedError(self)

    def get(self, source, indices):
        raise NotImplementedError(self)

    def frames(self, source):
        raise NotImplementedError(self)

    def _binop(self, other, fn):
        if isinstance(other, DataStream):
            return ElementwiseOperationStream([self, other], fn)
        return ElementwiseOperationStream([self], lambda a: fn(a, other))

    def __add__(self, other):
        return self._binop(other, lambda a, b: a + b)

    def __radd__(self, other):
        return self._binop(other, lambda a, b: b + a)

    def __sub__(self, other):
        return self._binop(other, lambda a, b: a - b)

    def __mul__(self, other):
        return self._binop(other, lambda a, b: a * b)

    def __rmul__(self, other):
        return self._binop(other, lambda a, b: b * a)

    def __truediv__(self, other):
        return self._binop(other, lambda a, b: a / b)


class SourceStream(DataStream):
    """Reads the named field from the source (stream.py:46-67)."""

    def __init__(self, name: str):
        self._name = name

    def shape(self, source):
        return source.shape(self._name)

    def size(self, source):
        return source.size(self._name)

    def frames(self, source):
        return source.frames(self._name)

    def get(self, source, indices):
        fr = self.frames(source)
        return source.get(self._name, [fr[i] for i in indices])

    def __repr__(self):
        return self._name


class _SourceFrame(DataStream):
    """Yields the frame numbers themselves (stream.py:70-84 FRAME)."""

    def shape(self, source):
        return (1,)

    def size(self, source):
        return source.size()

    def frames(self, source):
        return source.frames()

    def get(self, source, indices):
        fr = source.frames()
        return [np.asarray([fr[i]], np.int64) for i in indices]


FRAME = _SourceFrame()


class _SourceHandle(DataStream):
    """Yields the source object per index (stream.py:88-120 SCENE/SOURCE)."""

    def shape(self, source):
        return (1,)

    def size(self, source):
        return source.size()

    def frames(self, source):
        return source.frames()

    def get(self, source, indices):
        return [source for _ in indices]


SOURCE = _SourceHandle()


def _as_stream(s) -> DataStream:
    return s if isinstance(s, DataStream) else SourceStream(s)


class DerivedStream(DataStream):
    """Stream computed from other streams (stream.py:123-129)."""

    def __init__(self, input_streams):
        self.inputs = [_as_stream(s) for s in input_streams]

    def __repr__(self):
        return f"{type(self).__name__}({self.inputs})"


class ElementwiseOperationStream(DerivedStream):
    """function(*inputs) applied per frame (stream.py:132-151)."""

    def __init__(self, input_streams, function: Callable):
        super().__init__(input_streams)
        self.function = function

    def shape(self, source):
        return self.inputs[0].shape(source)

    def size(self, source):
        return self.inputs[0].size(source)

    def frames(self, source):
        return self.inputs[0].frames(source)

    def get(self, source, indices):
        per_input = [i.get(source, indices) for i in self.inputs]
        return [self.function(*vals) for vals in zip(*per_input)]


class FrameSelect(DerivedStream):
    """Re-index the input stream's frames (stream.py:154-199). `selector` is
    a FRAME NUMBER, a list of frame numbers, or a function mapping the full
    frame-number list (as returned by `frames()`) to the selected sub-list.
    Selected frame numbers are translated to positions of the underlying
    stream in get(), so non-contiguous / non-zero-based frame numbering
    works (the reference conflates numbers with positions and silently
    breaks for such scenes)."""

    def __init__(self, selector, stream):
        super().__init__([stream])
        self.stream = self.inputs[0]
        if callable(selector):
            self.selection_function = selector
        elif isinstance(selector, int):
            self.selection_function = lambda frames: [selector]
        else:
            self.selection_function = lambda frames: list(selector)

    def _selected(self, source):
        sel = self.selection_function(self.stream.frames(source))
        return [sel] if isinstance(sel, int) else list(sel)

    def shape(self, source):
        return self.stream.shape(source)

    def size(self, source):
        return len(self._selected(source))

    def frames(self, source):
        return self._selected(source)

    def get(self, source, indices):
        base = list(self.stream.frames(source))
        pos = {f: i for i, f in enumerate(base)}
        sel = self._selected(source)
        try:
            positions = [pos[sel[i]] for i in indices]
        except KeyError as e:
            raise KeyError(
                f"FrameSelect: selected frame {e.args[0]} is not among the "
                f"underlying stream's frames (first few: {base[:5]})"
            ) from None
        return self.stream.get(source, positions)


class MantaScalar(DerivedStream):
    """Crop one layer of cells on the positive sides of scalar fields —
    loads mantaflow scenes whose scalar grids are one cell larger than the
    staggered arrays (stream.py:202-233)."""

    def __init__(self, stream):
        super().__init__([stream])
        self.stream = self.inputs[0]

    def shape(self, source):
        s = self.stream.shape(source)
        if s is None:
            return None
        return tuple(d - 1 if i < 2 else d for i, d in enumerate(s))

    def size(self, source):
        return self.stream.size(source)

    def frames(self, source):
        return self.stream.frames(source)

    def get(self, source, indices):
        out = []
        for a in self.stream.get(source, indices):
            out.append(a[tuple(slice(0, d - 1) for d in a.shape[:2])])
        return out


def consecutive_frames(stream, n: int) -> Tuple[FrameSelect, ...]:
    """n streams whose i-th member yields the i-th frame of every length-n
    consecutive window (stream.py:236-247) — the standard way to construct
    (state, target_1, ..., target_{n-1}) tuples for unrolled training."""
    stream = _as_stream(stream)
    return tuple(
        FrameSelect(lambda frames, i=i: frames[i : len(frames) - n + 1 + i], stream)
        for i in range(n)
    )


class StreamReader:
    """Random-access batches over (sources x stream frames)
    (phi/data/reader.py BatchReader).

    reader[i] / reader[a:b] -> one stacked numpy array per stream;
    all_batches(batch_size) iterates the whole index. Each source
    contributes stream.size(source) consecutive indices (reader.py:101-124
    _IndexCache). A small LRU caches decoded frames."""

    def __init__(self, sources, streams, cache_frames: int = 256):
        self.sources = [
            s if isinstance(s, SceneSource) else SceneSource(s) for s in sources
        ]
        self.streams = [_as_stream(s) for s in streams]
        self._cache: OrderedDict = OrderedDict()
        self._cache_frames = cache_frames
        # index map: global index -> (source_idx, local_idx)
        self._index: List[Tuple[int, int]] = []
        for si, src in enumerate(self.sources):
            n = min(st.size(src) for st in self.streams)
            self._index += [(si, li) for li in range(n)]

    def __len__(self):
        return len(self._index)

    def _get_one(self, stream_idx: int, gi: int):
        si, li = self._index[gi]
        key = (stream_idx, si, li)
        if key in self._cache:
            self._cache.move_to_end(key)
            return self._cache[key]
        val = self.streams[stream_idx].get(self.sources[si], [li])[0]
        self._cache[key] = val
        while len(self._cache) > self._cache_frames:
            self._cache.popitem(last=False)
        return val

    def __getitem__(self, item):
        if isinstance(item, int):
            idxs = [item if item >= 0 else len(self) + item]
        elif isinstance(item, slice):
            idxs = list(range(*item.indices(len(self))))
        else:
            idxs = list(item)
        out = []
        for k, stream in enumerate(self.streams):
            vals = [self._get_one(k, i) for i in idxs]
            if isinstance(stream, _SourceHandle):
                out.append(vals)
            else:
                out.append(np.stack(vals))
        return tuple(out)

    def all_batches(self, batch_size: int = 1, loop: bool = False):
        """Iterate index batches; short final batch is kept
        (reader.py:95-97 all_batches with last=CLIP keeps it too)."""
        while True:
            for b in range(0, len(self), batch_size):
                yield self[b : b + batch_size]
            if not loop:
                return
