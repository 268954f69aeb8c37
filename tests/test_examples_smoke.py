"""Example-script smoke tests: the demo inventory (PARITY.md §2.4, 25
examples) is part of the product surface, so a cheap subset runs each suite
to guard import/API regressions. Subprocess execution keeps the examples in
their native f32 config (conftest's x64-for-oracles setting breaks scan
carry dtypes in-process); each runs with tiny flags and --cpu on a tmp
output dir and must exit 0."""

import subprocess
import sys

import pytest


def _run(script, argv, timeout=240):
    proc = subprocess.run(
        [sys.executable, f"examples/{script}"] + argv + ["--cpu"],
        capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"{script} failed\nstdout: {proc.stdout[-2000:]}\n"
        f"stderr: {proc.stderr[-2000:]}"
    )


def test_manual_fluid_2d(tmp_path):
    _run("manual_fluid.py",
         ["--res", "16", "--steps", "4", "--graph-steps", "2",
          "--out", str(tmp_path)])
    assert (tmp_path / "manual_fluid.npz").exists()


def test_sample_patterns(tmp_path):
    _run("sample_patterns.py",
         ["--n", "32", "--steps", "40", "--out", str(tmp_path)])
    assert (tmp_path / "sample_patterns.npz").exists()


def test_modular_plume(tmp_path):
    _run("modular_plume.py", ["--steps", "4", "--out", str(tmp_path)])
    assert (tmp_path / "modular_plume.npz").exists()


def test_markers(tmp_path):
    _run("markers.py", ["--steps", "10", "--out", str(tmp_path)])
    import glob

    assert glob.glob(str(tmp_path / "markers_*" / "frame_0000.npz"))


def test_optimize_pressure():
    _run("optimize_pressure.py", ["--n", "24", "--iters", "40"])
