"""Static HTML dashboard for App runs.

The TPU-native replacement for the reference's Dash web GUI
(PhiFlow/phi/viz/dash/): instead of a live server (zero-egress TPU jobs
can't host one), render_dashboard() writes field heatmap PNGs + scalar
curves + control state into one self-contained index.html inside the run's
Scene directory. Re-run it any time (or pass refresh_s to embed a
meta-refresh) and open the file from anywhere with filesystem access.
"""

from __future__ import annotations

import base64
import html
import io
import os
from typing import Optional

import numpy as np


def _png_b64(fig) -> str:
    buf = io.BytesIO()
    fig.savefig(buf, format="png", bbox_inches="tight", dpi=110)
    return base64.b64encode(buf.getvalue()).decode()


def _field_panel(name: str, arr: np.ndarray):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    arr = np.asarray(arr)
    if arr.ndim == 3 and arr.shape[-1] <= 4:  # channels -> magnitude
        arr = np.linalg.norm(arr, axis=-1)
    while arr.ndim > 2:  # leading batch/time axes -> last entry
        arr = arr[-1]
    fig, ax = plt.subplots(figsize=(4.2, 3.4))
    if arr.ndim == 1:
        ax.plot(arr)
    else:
        im = ax.imshow(arr, origin="lower", cmap="RdBu_r", aspect="auto")
        fig.colorbar(im, ax=ax, shrink=0.85)
    ax.set_title(name)
    out = _png_b64(fig)
    plt.close(fig)
    return out


def _scalar_panel(scalars: dict):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6.0, 3.0))
    for name, values in scalars.items():
        if values:
            ax.plot(values, label=name)
    ax.set_xlabel("iteration")
    ax.set_yscale("log")
    ax.legend(loc="best", fontsize=8)
    ax.set_title("scalars")
    out = _png_b64(fig)
    plt.close(fig)
    return out


def render_dashboard(app, path: Optional[str] = None, refresh_s: int = 0) -> str:
    """Write index.html for an App; returns the file path."""
    path = path or os.path.join(app.scene.directory, "index.html")
    meta = (
        f'<meta http-equiv="refresh" content="{refresh_s}">' if refresh_s else ""
    )
    parts = [
        "<!doctype html><html><head><title>%s</title>%s" % (html.escape(app.name), meta),
        "<style>body{font-family:sans-serif;background:#fafafa;margin:20px}"
        ".card{display:inline-block;background:#fff;border:1px solid #ddd;"
        "border-radius:6px;padding:8px;margin:6px;vertical-align:top}"
        "table{border-collapse:collapse}td,th{border:1px solid #ccc;"
        "padding:3px 8px;font-size:13px}</style></head><body>",
        f"<h2>{html.escape(app.name)} — step {app.steps}</h2>",
    ]
    status = app.status()
    parts.append("<div class='card'><table><tr><th>control</th><th>value</th></tr>")
    for k, v in status["controls"].items():
        parts.append(f"<tr><td>{html.escape(k)}</td><td>{v}</td></tr>")
    parts.append(
        f"<tr><td>wall_s</td><td>{status['wall_s']}</td></tr></table></div>"
    )
    if app.scalars:
        parts.append(
            f"<div class='card'><img src='data:image/png;base64,{_scalar_panel(app.scalars)}'></div>"
        )
    for name, getter in app.fields.items():
        try:
            b64 = _field_panel(name, getter())
            parts.append(f"<div class='card'><img src='data:image/png;base64,{b64}'></div>")
        except Exception as e:  # field viewers must never kill the run
            parts.append(f"<div class='card'>{html.escape(name)}: {html.escape(str(e))}</div>")
    parts.append("</body></html>")
    with open(path, "w") as f:
        f.write("".join(parts))
    return path
