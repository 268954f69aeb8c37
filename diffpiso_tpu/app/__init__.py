from diffpiso_tpu.app.app import (
    App,
    EditableBool,
    EditableFloat,
    EditableInt,
    EditableValue,
    LearningApp,
)
from diffpiso_tpu.app.display import render_dashboard

__all__ = [
    "App",
    "EditableBool",
    "EditableFloat",
    "EditableInt",
    "EditableValue",
    "LearningApp",
    "render_dashboard",
]
