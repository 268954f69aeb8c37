"""Tests for the App/LearningApp layer + HTML dashboard (parity with the
reference's App/EditableValue system, phi/app/)."""

import os

import numpy as np
import jax.numpy as jnp

from diffpiso_tpu.app import (
    App,
    EditableFloat,
    EditableInt,
    LearningApp,
    render_dashboard,
)


def _make_app(tmp_path):
    app = App("testapp", base_dir=str(tmp_path), record_every=2)
    dt = app.add_control(EditableFloat("dt", 0.1, (0.01, 1.0)))

    def step(x):
        return x + dt.value

    app.set_step(step, jnp.zeros((8, 8)))
    app.add_field("x", lambda: app.state)
    return app, dt


def test_app_steps_and_records(tmp_path):
    app, dt = _make_app(tmp_path)
    app.run(4)
    np.testing.assert_allclose(np.asarray(app.state), 0.4, atol=1e-6)
    # frames recorded at steps 2 and 4
    assert app.scene.frames("x") == [2, 4]
    (x2,) = app.scene.read(["x"], 2)
    np.testing.assert_allclose(x2, 0.2, atol=1e-6)


def test_editable_value_clamping_and_control_effect(tmp_path):
    app, dt = _make_app(tmp_path)
    dt.set(5.0)  # clamped to max 1.0
    assert dt.value == 1.0
    app.run(1)
    np.testing.assert_allclose(np.asarray(app.state), 1.0, atol=1e-6)
    n = EditableInt("n", 3, (1, 10))
    assert n.set(0.9) == 1


def test_status_and_dashboard(tmp_path):
    app, _ = _make_app(tmp_path)
    app.log_scalar("residual", 1e-3)
    app.run(2)
    status_path = app.save_status()
    assert os.path.exists(status_path)
    html_path = render_dashboard(app)
    text = open(html_path).read()
    assert "testapp" in text and "data:image/png;base64" in text


def test_learning_app_model_roundtrip(tmp_path):
    app = LearningApp("train", base_dir=str(tmp_path))
    params = {"w": jnp.ones((3, 3)), "b": jnp.zeros((3,))}
    path = app.save_model(params)
    loaded = app.load_model(path)
    np.testing.assert_allclose(np.asarray(loaded["w"]), 1.0)
    app.add_objective(0.5)
    app.add_objective(0.25)
    app.end_epoch()
    assert app.epoch == 1
    assert any(f.startswith("scalars_epoch") for f in os.listdir(app.scene.directory))
