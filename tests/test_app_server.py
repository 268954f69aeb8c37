"""Live dashboard server (parity with the reference's phi/viz/dash web GUI):
real HTTP round-trips against AppServer — status, field PNGs, control edits,
play/pause/step actions."""

import json
import time
import urllib.request

import numpy as np
import pytest

from diffpiso_tpu.app import App, AppServer, EditableFloat


def _http(url, data=None):
    req = urllib.request.Request(
        url, data=json.dumps(data).encode() if data is not None else None
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.read()


@pytest.fixture
def served_app(tmp_path):
    app = App("srv-test", base_dir=str(tmp_path), record_every=0)
    speed = app.add_control(EditableFloat("speed", 1.0, (0.0, 4.0)))

    def step_fn(state):
        app.log_scalar("energy", float(np.sum(state**2)))
        return state * (1.0 - 0.01 * speed.value)

    app.set_step(step_fn, np.outer(np.sin(np.linspace(0, 3, 24)), np.ones(32)))
    app.add_field("u", lambda: app.state)
    app.add_action("reset", lambda: None)
    server = AppServer(app, port=0).start(block=False)  # port=0: ephemeral
    yield app, server, f"http://127.0.0.1:{server.port}"
    server.stop()


def test_status_page_and_field_png(served_app):
    app, server, base = served_app
    page = _http(base + "/").decode()
    assert "dashboard" in page
    st = json.loads(_http(base + "/api/status"))
    assert st["name"] == "srv-test"
    assert st["fields"] == ["u"]
    assert st["control_specs"][0]["name"] == "speed"
    assert "reset" in st["actions"]
    png = _http(base + "/api/field/u")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_actions_and_controls(served_app):
    app, server, base = served_app
    _http(base + "/api/action", {"name": "step"})
    _http(base + "/api/action", {"name": "step"})
    assert app.steps == 2
    # control edit is clamped to its bounds
    out = json.loads(_http(base + "/api/control", {"name": "speed", "value": 9.0}))
    assert out["value"] == 4.0
    assert app.controls["speed"].value == 4.0
    # scalars endpoint mirrors log_scalar history
    vals = json.loads(_http(base + "/api/scalars/energy"))
    assert len(vals) == 2 and vals[1] < vals[0]


def test_3d_field_slicing(tmp_path):
    """?axis=&index= select the rendered slice of a 3-D field (the
    webglviewer-analog volume navigation)."""
    app = App("srv-3d", base_dir=str(tmp_path), record_every=0)
    vol = np.arange(4 * 6 * 8, dtype=np.float32).reshape(4, 6, 8)
    app.set_step(lambda s: s, vol)
    app.add_field("q", lambda: app.state)
    server = AppServer(app, port=0).start(block=False)
    try:
        base = f"http://127.0.0.1:{server.port}"
        for url in ("/api/field/q", "/api/field/q?axis=1&index=2",
                    "/api/field/q?axis=2&index=0"):
            png = _http(base + url)
            assert png[:8] == b"\x89PNG\r\n\x1a\n", url
    finally:
        server.stop()


def test_play_pause_loop(served_app):
    app, server, base = served_app
    _http(base + "/api/action", {"name": "play"})
    deadline = time.time() + 10
    while app.steps < 3 and time.time() < deadline:
        time.sleep(0.05)
    _http(base + "/api/action", {"name": "pause"})
    assert app.steps >= 3
    paused_at = app.steps
    time.sleep(0.3)
    assert app.steps == paused_at


def test_webgl_volume_endpoint(tmp_path):
    """WebGL volume view (app/volume.py, VERDICT r2 'missing' item 1): the
    page serves the raycaster, the binary endpoint streams the normalized
    uint8 brick with shape/range metadata, and 2-D fields error cleanly."""
    import urllib.error

    app = App("vol-test", base_dir=str(tmp_path), record_every=0)
    rng = np.random.RandomState(0)
    vol = rng.rand(8, 12, 16).astype(np.float32) * 3.0 - 1.0
    app.set_step(lambda s: s, vol)
    app.add_field("q", lambda: app.state)
    app.add_field("plane", lambda: vol[0])
    server = AppServer(app, port=0).start(block=False)
    base = f"http://127.0.0.1:{server.port}"
    try:
        page = _http(base + "/volume?field=q").decode()
        assert "webgl2" in page.lower() and "sampler3D" in page
        req = urllib.request.Request(base + "/api/volume/q")
        with urllib.request.urlopen(req, timeout=10) as r:
            meta = json.loads(r.headers["X-Volume-Meta"])
            data = r.read()
        assert meta["shape"] == [8, 12, 16]
        np.testing.assert_allclose(meta["min"], float(vol.min()), rtol=1e-6)
        np.testing.assert_allclose(meta["max"], float(vol.max()), rtol=1e-6)
        arr = np.frombuffer(data, np.uint8).reshape(8, 12, 16)
        # normalization: argmax/argmin positions preserved, full range used
        assert arr.max() == 255 and arr.min() == 0
        # the true extrema map to the range ends (rounding may tie others)
        assert arr.flat[vol.argmax()] == 255
        assert arr.flat[vol.argmin()] == 0
        # 2-D field -> error surfaced as 500
        try:
            _http(base + "/api/volume/plane")
            raised = False
        except urllib.error.HTTPError as e:
            raised = e.code == 500
        assert raised
        # staggered-tensor magnitude reduction
        from diffpiso_tpu.app.volume import volume_payload

        stag = rng.rand(4, 5, 6, 3).astype(np.float32)
        data2, meta2 = volume_payload(stag)
        assert meta2["shape"] == [4, 5, 6]
        mag = np.sqrt((stag**2).sum(-1))
        np.testing.assert_allclose(meta2["max"], mag.max(), rtol=1e-6)
    finally:
        server.stop()
