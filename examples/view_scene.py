"""Play back a recorded Scene in the dashboard.

The diffpiso_tpu analog of the reference's simulation viewer
(PhiFlow/demos/viewer.py): point it at a Scene directory (e.g. one written
by examples/smoke_datagen.py or any App run) and it plays the recorded
frames — stepping advances the frame with wrap-around looping
(viewer.py:21-25), every recorded field is exposed, and a Frame control
allows scrubbing in the live dashboard.

Run:  python examples/view_scene.py runs/smoke_data/smoke/sim_000000
Live: python examples/view_scene.py <scene_dir> --serve
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", help="Scene directory (…/sim_%06d)")
    ap.add_argument("--steps", type=int, default=0,
                    help="frames to play in batch mode (default: one loop)")
    ap.add_argument("--out", default="runs")
    ap.add_argument("--serve", action="store_true")
    ap.add_argument("--port", type=int, default=8050)
    args = ap.parse_args()

    import numpy as np

    from diffpiso_tpu.app import App, EditableInt, render_dashboard
    from diffpiso_tpu.utils.io import Scene

    scene = Scene(args.scene)
    # discover the recorded field names from the first frame's files
    first = sorted(
        f for f in os.listdir(args.scene) if f.endswith(".npz")
    )
    names = sorted({f.rsplit("_", 1)[0] for f in first})
    frames = {}
    for name in names:
        frames[name] = scene.frames(name)
    fmin = min(min(v) for v in frames.values() if v)
    fmax = max(max(v) for v in frames.values() if v)
    print(f"scene {args.scene}: fields {names}, frames {fmin}..{fmax}")

    app = App("viewer", base_dir=args.out, record_every=0)
    frame_ctl = app.add_control(EditableInt("frame", fmin, (fmin, fmax)))

    def step(state):
        nxt = int(frame_ctl.value) + 1
        if nxt > fmax:  # wrap-around looping (viewer.py:22-24)
            nxt = fmin
        frame_ctl.set(nxt)
        return state

    app.set_step(step, {"frame": fmin})

    def read(name):
        arr = scene.read([name], int(frame_ctl.value))[0]
        return np.asarray(arr)

    for name in names:
        app.add_field(name, lambda n=name: read(n))

    if args.serve:
        from diffpiso_tpu.app import show

        show(app, port=args.port)
        return
    nplay = args.steps or (fmax - fmin + 1)
    app.run(nplay)
    print("dashboard:", render_dashboard(app))


if __name__ == "__main__":
    main()
