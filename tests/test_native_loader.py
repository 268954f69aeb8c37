"""Native npz loader: byte-exact agreement with numpy across dtypes and
compression modes, prefetch correctness, and fallback behavior."""

import os

import numpy as np
import pytest

from diffpiso_tpu.learning import native_loader


@pytest.fixture(scope="module")
def built():
    if not native_loader.available():
        pytest.skip("native toolchain unavailable")
    return True


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.int32, np.bool_])
@pytest.mark.parametrize("compressed", [False, True])
def test_roundtrip(tmp_path, built, dtype, compressed):
    rng = np.random.RandomState(0)
    arr = (rng.rand(7, 13, 3) * 100).astype(dtype)
    path = str(tmp_path / f"t_{np.dtype(dtype).name}_{compressed}.npz")
    if compressed:
        np.savez_compressed(path, arr)
    else:
        np.savez(path, arr)
    out = native_loader.load_npz(path)
    assert out.dtype == arr.dtype
    np.testing.assert_array_equal(out, arr)


def test_named_member(tmp_path, built):
    a = np.arange(6, dtype=np.float32).reshape(2, 3)
    b = np.ones((4,), np.float32)
    path = str(tmp_path / "multi.npz")
    np.savez(path, alpha=a, beta=b)
    np.testing.assert_array_equal(native_loader.load_npz(path, "beta"), b)
    np.testing.assert_array_equal(native_loader.load_npz(path, "alpha"), a)


def test_prefetch_then_read(tmp_path, built):
    import time

    paths = []
    arrays = []
    for i in range(8):
        arr = np.random.RandomState(i).randn(64, 64).astype(np.float32)
        p = str(tmp_path / f"f{i}.npz")
        np.savez(p, arr)
        paths.append(p)
        arrays.append(arr)
    native_loader.prefetch(paths, n_threads=4)
    time.sleep(0.3)
    for p, arr in zip(paths, arrays):
        np.testing.assert_array_equal(native_loader.load_npz(p), arr)


def test_fallback_on_missing_file(built, tmp_path):
    with pytest.raises(Exception):
        native_loader.load_npz(str(tmp_path / "nope.npz"))
