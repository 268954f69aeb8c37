"""Tests for SceneDataset/BatchReader (parity with PhiFlow/tests/test_data.py)."""

import numpy as np

from diffpiso_tpu.learning.reader import BatchReader, SceneDataset
from diffpiso_tpu.utils.io import Scene


def _make_scenes(tmp_path, n_scenes=2, n_frames=5, shape=(4, 6)):
    scenes = []
    for s in range(n_scenes):
        scene = Scene.create(str(tmp_path), "sim")
        for f in range(n_frames):
            scene.write(
                {
                    "velocity": np.full(shape, s * 100 + f, np.float32),
                    "pressure": np.full(shape, -(s * 100 + f), np.float32),
                },
                frame=f,
            )
        scenes.append(scene)
    return scenes


def test_scene_dataset_index_and_load(tmp_path):
    scenes = _make_scenes(tmp_path)
    ds = SceneDataset(scenes, ["velocity", "pressure"])
    assert len(ds) == 10
    vel, pre = ds.load(7)  # scene 1, frame 2
    np.testing.assert_allclose(vel, 102.0)
    np.testing.assert_allclose(pre, -102.0)


def test_scene_dataset_discovery(tmp_path):
    _make_scenes(tmp_path)
    ds = SceneDataset.from_directory(str(tmp_path), ["velocity"])
    assert len(ds) == 10


def test_batch_reader_batches_and_shuffle(tmp_path):
    scenes = _make_scenes(tmp_path)
    ds = SceneDataset(scenes, ["velocity", "pressure"])
    reader = BatchReader(ds, batch_size=4, shuffle=False)
    batches = list(reader)
    assert len(batches) == 2  # 10 // 4, remainder dropped
    vel, pre = batches[0]
    assert vel.shape == (4, 4, 6)
    np.testing.assert_allclose(vel[0], 0.0)
    np.testing.assert_allclose(pre[0], -0.0)

    r1 = [b[0][:, 0, 0].tolist() for b in BatchReader(ds, 4, shuffle=True, seed=1)]
    r2 = [b[0][:, 0, 0].tolist() for b in BatchReader(ds, 4, shuffle=True, seed=1)]
    assert r1 == r2  # deterministic under a seed
    r3 = [b[0][:, 0, 0].tolist() for b in BatchReader(ds, 4, shuffle=True, seed=2)]
    assert r1 != r3


def test_batch_reader_keep_remainder(tmp_path):
    scenes = _make_scenes(tmp_path)
    ds = SceneDataset(scenes, ["velocity"])
    reader = BatchReader(ds, batch_size=4, drop_remainder=False)
    batches = list(reader)
    assert len(batches) == 3
    assert batches[-1][0].shape[0] == 2
