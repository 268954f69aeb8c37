from diffpiso_tpu.app.app import (
    App,
    EditableBool,
    EditableFloat,
    EditableInt,
    EditableValue,
    LearningApp,
)
from diffpiso_tpu.app.display import render_dashboard
from diffpiso_tpu.app.server import AppServer, show

__all__ = [
    "AppServer",
    "show",
    "App",
    "EditableBool",
    "EditableFloat",
    "EditableInt",
    "EditableValue",
    "LearningApp",
    "render_dashboard",
]
