"""Golden-fixture test: Scene directories must match the reference's
fluidformat naming/layout conventions exactly (VERDICT r2 item 9;
phi/data/fluidformat.py:21-74,141).

The reference-side behavior is replicated here as an independent oracle
(`_reference_read`, transcribed semantics of fluidformat.read_zipped_array
with GLOBAL_AXIS_ORDER not-x-first) so a layout drift in utils/io.py fails
against the oracle, not against itself."""

import os

import numpy as np

from diffpiso_tpu.utils.io import (
    Scene,
    read_sim_frame,
    read_zipped_array,
    write_sim_frame,
    write_zipped_array,
)


def _reference_read(filename):
    """fluidformat.py:21-28, y-x (not x_first) axis order."""
    file = np.load(filename)
    array = file[file.files[-1]]  # last entry must be the data array
    if array.shape[0] != 1 or len(array.shape) == 1:
        array = np.expand_dims(array, axis=0)
    if array.shape[-1] != 1 and array.shape[-1] <= array.ndim:
        array = array[..., ::-1]  # stored order is always XYZ
    return array


def test_filenames_match_reference_convention(tmp_path):
    # fluidformat.py:72-74: "%s_%06i.npz"
    d = str(tmp_path)
    write_sim_frame(d, {"velocity": np.zeros((4, 4)), "pressure": np.ones((4, 4))}, 7)
    write_sim_frame(d, {"velocity": np.zeros((4, 4))}, 123456)
    assert sorted(os.listdir(d)) == [
        "pressure_000007.npz",
        "velocity_000007.npz",
        "velocity_123456.npz",
    ]


def test_scene_directory_layout_matches_reference(tmp_path):
    # fluidformat.py:141: <dir>/<category>/sim_%06d
    s0 = Scene.create(str(tmp_path), category="mixing_layer")
    s1 = Scene.create(str(tmp_path), category="mixing_layer")
    assert s0.directory == os.path.join(str(tmp_path), "mixing_layer", "sim_000000")
    assert s1.directory == os.path.join(str(tmp_path), "mixing_layer", "sim_000001")
    s0.put_description({"grid": [4, 4]})
    assert s0.exists_config()
    assert s0.get_description() == {"grid": [4, 4]}
    # subpath mirrors Scene.subpath (fluidformat.py:143-149)
    sub = s0.subpath("plots", create=True)
    assert os.path.isdir(sub)


def test_npz_payload_readable_by_reference_semantics(tmp_path):
    rng = np.random.RandomState(0)
    d = str(tmp_path)

    # a phiflow-style staggered tensor (1, ny+1, nx+1, 2), components XYZ
    # on disk: the reference reading our file must see exactly what it
    # would see reading its own
    vel = rng.randn(1, 5, 5, 2).astype(np.float32)
    write_zipped_array(os.path.join(d, "velocity_000000.npz"), vel)
    got = _reference_read(os.path.join(d, "velocity_000000.npz"))
    np.testing.assert_array_equal(got, vel)

    # plain centered plane (our in-framework form)
    p = rng.randn(6, 4).astype(np.float32)
    write_zipped_array(os.path.join(d, "pressure_000001.npz"), p)
    got = _reference_read(os.path.join(d, "pressure_000001.npz"))
    np.testing.assert_array_equal(got[0], p)

    # our reader round-trips both
    np.testing.assert_array_equal(
        read_zipped_array(os.path.join(d, "velocity_000000.npz")), vel
    )
    np.testing.assert_array_equal(
        read_sim_frame(d, ["pressure"], 1)[0], p
    )


def test_npz_is_compressed_single_entry(tmp_path):
    # savez_compressed, one unnamed entry, LAST entry is the payload
    # (fluidformat.py:23 reads file.files[-1])
    path = os.path.join(str(tmp_path), "density_000000.npz")
    write_zipped_array(path, np.zeros((64, 64), np.float32))
    import zipfile

    with zipfile.ZipFile(path) as z:
        infos = z.infolist()
        assert len(infos) == 1
        assert infos[0].compress_type == zipfile.ZIP_DEFLATED  # compressed
    with np.load(path) as f:
        assert len(f.files) == 1


def test_scene_frames_listing(tmp_path):
    s = Scene.create(str(tmp_path))
    for i in (0, 2, 5):
        s.write({"velocity": np.zeros((3, 3))}, i)
    assert s.frames("velocity") == [0, 2, 5]
