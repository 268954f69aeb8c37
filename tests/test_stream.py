"""Data streams (parity with PhiFlow/phi/data/stream.py): source streams,
elementwise composition, FrameSelect, consecutive_frames windows, FRAME/
SOURCE constants, and StreamReader batch access."""

import numpy as np

from diffpiso_tpu.learning.stream import (
    FRAME,
    SOURCE,
    ElementwiseOperationStream,
    FrameSelect,
    SceneSource,
    SourceStream,
    StreamReader,
    consecutive_frames,
)
from diffpiso_tpu.utils.io import Scene


def _make_scene(tmp_path, n_frames=6, shape=(3, 4), offset=0):
    scene = Scene.create(str(tmp_path), "sim")
    for f in range(n_frames):
        scene.write(
            {
                "velocity": np.full(shape, offset + f, np.float32),
                "pressure": np.full(shape, -(offset + f), np.float32),
            },
            frame=f,
        )
    return scene


def test_source_stream_and_arithmetic(tmp_path):
    src = SceneSource(_make_scene(tmp_path))
    vel = SourceStream("velocity")
    pre = SourceStream("pressure")
    assert vel.size(src) == 6
    assert vel.shape(src) == (3, 4)
    np.testing.assert_allclose(vel.get(src, [2])[0], 2.0)

    total = vel + pre  # == 0 everywhere
    np.testing.assert_allclose(total.get(src, [3])[0], 0.0)
    scaled = vel * 2.0 - 1.0
    np.testing.assert_allclose(scaled.get(src, [3])[0], 5.0)
    custom = ElementwiseOperationStream([vel, pre], lambda a, b: a - b)
    np.testing.assert_allclose(custom.get(src, [4])[0], 8.0)


def test_frame_select_and_frame_constant(tmp_path):
    src = SceneSource(_make_scene(tmp_path))
    vel = SourceStream("velocity")
    last_two = FrameSelect(lambda frames: frames[-2:], vel)
    assert last_two.size(src) == 2
    np.testing.assert_allclose(last_two.get(src, [0])[0], 4.0)
    one = FrameSelect(3, vel)
    assert one.size(src) == 1
    np.testing.assert_allclose(one.get(src, [0])[0], 3.0)
    assert FRAME.get(src, [2])[0][0] == 2


def test_consecutive_frames_windows(tmp_path):
    src = SceneSource(_make_scene(tmp_path))
    s0, s1, s2 = consecutive_frames("velocity", 3)
    # 6 frames -> 4 windows of length 3
    assert s0.size(src) == s1.size(src) == s2.size(src) == 4
    for w in range(4):
        np.testing.assert_allclose(s0.get(src, [w])[0], w)
        np.testing.assert_allclose(s1.get(src, [w])[0], w + 1)
        np.testing.assert_allclose(s2.get(src, [w])[0], w + 2)


def test_stream_reader_batches(tmp_path):
    scenes = [
        _make_scene(tmp_path, offset=0),
        _make_scene(tmp_path, offset=100),
    ]
    s0, s1 = consecutive_frames("velocity", 2)
    reader = StreamReader(scenes_to_sources(scenes), [s0, s1, FRAME, SOURCE])
    # 5 windows per scene
    assert len(reader) == 10
    cur, nxt, frame, source = reader[0:3]
    assert cur.shape == (3, 3, 4)
    np.testing.assert_allclose(nxt - cur, 1.0)
    assert list(frame[:, 0]) == [0, 1, 2]
    assert all(s is reader.sources[0] for s in source)
    # second scene's first window
    cur, nxt, frame, source = reader[5]
    np.testing.assert_allclose(cur, 100.0)
    # all_batches covers everything incl. the short final batch
    batches = list(reader.all_batches(batch_size=4))
    assert [b[0].shape[0] for b in batches] == [4, 4, 2]


def scenes_to_sources(scenes):
    return [SceneSource(s) for s in scenes]


def test_manta_scalar_crop(tmp_path):
    from diffpiso_tpu.learning.stream import MantaScalar

    src = SceneSource(_make_scene(tmp_path, shape=(5, 7)))
    cropped = MantaScalar(SourceStream("velocity"))
    assert cropped.shape(src) == (4, 6)
    a = cropped.get(src, [2])[0]
    assert a.shape == (4, 6)
    np.testing.assert_allclose(a, 2.0)
    assert cropped.size(src) == 6


def test_frame_select_non_contiguous_frames(tmp_path):
    """Review regression: frame numbers that are strided / non-zero-based
    must select by FRAME NUMBER, not list position (the reference conflates
    the two and silently reads wrong frames)."""
    scene = Scene.create(str(tmp_path), "sim")
    for f in (100, 110, 120, 130):
        scene.write({"velocity": np.full((2, 2), f, np.float32)}, frame=f)
    src = SceneSource(scene)
    vel = SourceStream("velocity")
    sel = FrameSelect(lambda frames: frames[-2:], vel)  # frames 120, 130
    np.testing.assert_allclose(sel.get(src, [0])[0], 120.0)
    np.testing.assert_allclose(sel.get(src, [1])[0], 130.0)
    one = FrameSelect(110, vel)  # a frame NUMBER
    np.testing.assert_allclose(one.get(src, [0])[0], 110.0)
    s0, s1 = consecutive_frames("velocity", 2)
    np.testing.assert_allclose(s0.get(src, [1])[0], 110.0)
    np.testing.assert_allclose(s1.get(src, [1])[0], 120.0)
