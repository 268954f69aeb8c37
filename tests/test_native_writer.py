"""Native npz writer (native/npz_writer.cc): numpy-read round trips for
deflated/stored/async paths, np.savez layout compatibility, and the
async barrier. Skips when the toolchain is unavailable."""

import os

import numpy as np
import pytest

from diffpiso_tpu.learning import native_writer as nw


pytestmark = pytest.mark.skipif(
    not nw.native_available(), reason="native toolchain unavailable"
)


def _arrays():
    rng = np.random.RandomState(7)
    return {
        "velocity": rng.randn(2, 33, 65).astype(np.float32),
        "pressure": rng.randn(33, 65).astype(np.float64),
        "frames": np.arange(7, dtype=np.int64),
        "flag": np.asarray([True, False, True]),
        "scalar": np.float32(2.5).reshape(()),
    }


@pytest.mark.parametrize("level", [0, 6])
def test_round_trip(tmp_path, level):
    arrs = _arrays()
    path = tmp_path / f"rt_{level}.npz"
    nw.savez(path, level=level, **arrs)
    back = np.load(path)
    assert set(back.files) == set(arrs)
    for k, v in arrs.items():
        np.testing.assert_array_equal(back[k], v)
        assert back[k].dtype == np.asarray(v).dtype


def test_async_round_trip_and_barrier(tmp_path):
    arrs = _arrays()
    paths = [tmp_path / f"a_{i}.npz" for i in range(12)]
    for p in paths:
        nw.savez(p, async_=True, level=6, **arrs)
    nw.wait()
    for p in paths:
        back = np.load(p)
        np.testing.assert_array_equal(back["velocity"], arrs["velocity"])


def test_numpy_layout_compatible(tmp_path):
    """The container matches np.savez member naming (scene readers and the
    native LOADER both rely on '<name>.npy' members)."""
    import zipfile

    arrs = {"arr_0": np.arange(4, dtype=np.float32)}
    path = tmp_path / "compat.npz"
    nw.savez(path, level=6, **arrs)
    with zipfile.ZipFile(path) as z:
        assert z.namelist() == ["arr_0.npy"]
        z.testzip()  # CRC check of the deflate stream
    # and the native loader reads it back too
    from diffpiso_tpu.learning import native_loader as nl

    if nl.available():
        out = nl.load_npz(str(path))
        np.testing.assert_array_equal(out, arrs["arr_0"])


def test_scene_async_write_round_trip(tmp_path):
    """Scene.write(async_=True) + wait_pending_writes: byte-compatible with
    the synchronous reference-exact path (same XYZ flip, same member name,
    same read_sim_frame result)."""
    import numpy as np

    from diffpiso_tpu.utils.io import Scene, wait_pending_writes

    rng = np.random.RandomState(3)
    vel = rng.randn(16, 16, 2).astype(np.float32)
    s1 = Scene(str(tmp_path / "sync"))
    s2 = Scene(str(tmp_path / "async"))
    for f in range(3):
        s1.write({"velocity": vel * (f + 1)}, f)
        s2.write({"velocity": vel * (f + 1)}, f, async_=True)
    wait_pending_writes()
    for f in range(3):
        a = s1.read(["velocity"], f)[0]
        b = s2.read(["velocity"], f)[0]
        np.testing.assert_array_equal(a, b)
