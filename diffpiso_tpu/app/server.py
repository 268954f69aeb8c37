"""Live interactive dashboard server for Apps.

Capability parity with the reference's web GUI (PhiFlow/phi/viz/dash/,
~1,100 LoC Dash server + webglviewer): a browser UI that shows the running
simulation's fields live, plots scalar curves, exposes EditableValue
controls, and drives play / pause / single-step — the reference's
`show(App)` experience (phi/viz/dash/dash_gui.py).

TPU-native redesign: no Dash/Flask/react dependency — a single-file
stdlib ``http.server`` ThreadingHTTPServer serving one embedded HTML page
that polls JSON/PNG endpoints. The simulation loop runs in a worker thread
stepping the SAME jitted step the headless App uses; controls apply between
compiled steps (no retrace). Works over an SSH tunnel to a TPU VM, which is
how such dashboards are actually viewed in practice.

Endpoints:
  GET  /                    the dashboard page
  GET  /volume?field=<name> WebGL 3-D volume view (app/volume.py raycaster)
  GET  /api/status          app status + control/field/action specs
  GET  /api/field/<name>    current field rendered as PNG
  GET  /api/volume/<name>   3-D field as a uint8 brick (X-Volume-Meta hdr)
  GET  /api/scalars/<name>  full scalar history as JSON
  POST /api/control         {"name": ..., "value": ...}
  POST /api/action          {"name": "play"|"pause"|"step"|<custom>}
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import unquote

import numpy as np

from diffpiso_tpu.app.app import App

_PAGE = """<!DOCTYPE html>
<html><head><title>diffpiso_tpu dashboard</title><style>
body{font-family:sans-serif;margin:1em;background:#161a1e;color:#dfe3e8}
h2{margin:.2em 0}  .row{display:flex;gap:1.5em;flex-wrap:wrap}
.card{background:#20262c;border-radius:8px;padding:1em;margin:.5em 0}
button{background:#2d6cdf;color:#fff;border:0;border-radius:4px;
       padding:.4em .9em;margin-right:.4em;cursor:pointer}
input[type=range]{width:160px} img{image-rendering:pixelated;max-width:640px}
canvas{background:#14171a;border-radius:4px} select{padding:.2em}
small{color:#8b949e}
</style></head><body>
<h2>diffpiso_tpu <span id="name"></span></h2>
<div class="card">
 <button onclick="act('play')">&#9654; play</button>
 <button onclick="act('pause')">&#10074;&#10074; pause</button>
 <button onclick="act('step')">step</button>
 <span id="custom-actions"></span>
 <small id="stat"></small>
</div>
<div class="row">
 <div class="card"><select id="field" onchange="draw()"></select>
  <a id="vlink" style="color:#58a6ff;margin-left:.6em" target="_blank">3-D view</a><br>
  <img id="img" width="512"/></div>
 <div class="card"><select id="scalar" onchange="plot()"></select><br>
  <canvas id="chart" width="460" height="240"></canvas></div>
 <div class="card" id="controls"></div>
</div>
<script>
let spec=null;
async function act(name){await fetch('/api/action',{method:'POST',
  body:JSON.stringify({name})});refresh();}
async function setc(name,value){await fetch('/api/control',{method:'POST',
  body:JSON.stringify({name,value})});}
function opt(sel,names){const keep=sel.value;sel.innerHTML='';
  for(const n of names){const o=document.createElement('option');
    o.value=o.textContent=n;sel.appendChild(o);}
  if(names.includes(keep))sel.value=keep;}
async function refresh(){
  const r=await fetch('/api/status');spec=await r.json();
  document.getElementById('name').textContent=spec.name;
  document.getElementById('stat').textContent=
    ` step ${spec.steps} | ${spec.playing?'running':'paused'} | ${spec.wall_s}s`;
  opt(document.getElementById('field'),spec.fields);
  opt(document.getElementById('scalar'),spec.scalar_names);
  const ca=document.getElementById('custom-actions');
  if(ca.childElementCount===0)for(const a of spec.actions){
    const b=document.createElement('button');b.textContent=a;
    b.onclick=()=>act(a);ca.appendChild(b);}
  const cd=document.getElementById('controls');
  if(cd.childElementCount===0)for(const c of spec.control_specs){
    const d=document.createElement('div');
    d.innerHTML=`<label>${c.name}: <span id="v-${c.name}">${c.value}</span>
      </label><br>`;
    let inp=document.createElement('input');
    if(c.kind==='bool'){inp.type='checkbox';inp.checked=c.value;
      inp.onchange=()=>setc(c.name,inp.checked);}
    else{inp.type='range';
      inp.min=c.min!==null?c.min:(c.kind==='int'?0:0);
      inp.max=c.max!==null?c.max:(c.value*10||1);
      inp.step=c.kind==='int'?1:(inp.max-inp.min)/200;
      inp.value=c.value;
      inp.oninput=()=>{document.getElementById('v-'+c.name).textContent=inp.value;
        setc(c.name,parseFloat(inp.value));};}
    d.appendChild(inp);cd.appendChild(d);}
  draw();plot();}
function draw(){const f=document.getElementById('field').value;
  if(f){document.getElementById('img').src='/api/field/'+f+'?t='+Date.now();
    document.getElementById('vlink').href='/volume?field='+f;}}
async function plot(){const s=document.getElementById('scalar').value;
  if(!s)return;const vals=await(await fetch('/api/scalars/'+s)).json();
  const c=document.getElementById('chart'),x=c.getContext('2d');
  x.clearRect(0,0,c.width,c.height);if(!vals.length)return;
  const lo=Math.min(...vals),hi=Math.max(...vals),sp=(hi-lo)||1;
  x.strokeStyle='#58a6ff';x.beginPath();
  vals.forEach((v,i)=>{const px=i/(vals.length-1||1)*c.width,
    py=c.height-8-(v-lo)/sp*(c.height-16);
    i?x.lineTo(px,py):x.moveTo(px,py);});x.stroke();
  x.fillStyle='#8b949e';x.fillText(hi.toPrecision(4),4,12);
  x.fillText(lo.toPrecision(4),4,c.height-2);}
setInterval(refresh,1000);refresh();
</script></body></html>"""


def _render_png(arr: np.ndarray, axis: int = 0, index: Optional[int] = None) -> bytes:
    """Render a field snapshot to PNG. 2-D arrays become a viridis heatmap;
    trailing component axes ((..., 2/3) staggered tensors) render magnitude;
    3-D volumes render a slice — `axis`/`index` select it (defaults: first
    axis, mid plane; the webglviewer-analog slicing control)."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import cm

    a = np.asarray(arr, np.float64)
    if a.ndim >= 3 and a.shape[-1] in (2, 3) and a.ndim - 1 >= 2:
        a = np.sqrt(np.sum(a * a, axis=-1))
    while a.ndim > 2:
        ax = min(max(axis, 0), a.ndim - 1) if a.ndim == 3 else 0
        i = a.shape[ax] // 2 if index is None else min(max(index, 0), a.shape[ax] - 1)
        a = np.take(a, i, axis=ax)
    a = np.nan_to_num(a)
    lo, hi = float(a.min()), float(a.max())
    norm = (a - lo) / (hi - lo) if hi > lo else np.zeros_like(a)
    rgba = (cm.viridis(norm[::-1]) * 255).astype(np.uint8)  # y-up display
    import matplotlib.image

    buf = io.BytesIO()
    matplotlib.image.imsave(buf, rgba, format="png")
    return buf.getvalue()


class AppServer:
    """Serve a live dashboard for `app` and drive its loop.

    start() launches the HTTP server and a paused worker loop; play/pause/
    step come from the browser (or the REST API — curl works). block=True
    parks the caller forever (script entry points); tests drive it with
    block=False and talk HTTP."""

    def __init__(self, app: App, host: str = "127.0.0.1", port: int = 8050,
                 max_fps: float = 20.0):
        self.app = app
        self.host = host
        self.port = port
        self.playing = False
        self._stop = False
        self._lock = threading.Lock()
        self._min_dt = 1.0 / max_fps
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._threads = []

    # -- control surface ---------------------------------------------------------
    def do_action(self, name: str):
        if name == "play":
            self.playing = True
        elif name == "pause":
            self.playing = False
        elif name == "step":
            with self._lock:
                self.app.step()
        elif name in self.app.actions:
            with self._lock:
                self.app.actions[name]()
        else:
            raise KeyError(name)

    def set_control(self, name: str, value):
        return self.app.controls[name].set(value)

    def status(self) -> dict:
        st = self.app.status()
        st.update(
            playing=self.playing,
            fields=sorted(self.app.fields),
            scalar_names=sorted(self.app.scalars),
            actions=sorted(self.app.actions),
            control_specs=[
                {
                    "name": c.name,
                    "value": c.value,
                    "kind": c.kind,
                    "min": c.min_value,
                    "max": c.max_value,
                }
                for c in self.app.controls.values()
            ],
        )
        return st

    def field_png(self, name: str, axis: int = 0, index: Optional[int] = None) -> bytes:
        with self._lock:
            arr = np.asarray(self.app.fields[name]())
        return _render_png(arr, axis=axis, index=index)

    def field_volume(self, name: str):
        """(payload_bytes, meta) for the WebGL volume view (app/volume.py)."""
        from diffpiso_tpu.app.volume import volume_payload

        with self._lock:
            arr = np.asarray(self.app.fields[name]())
        return volume_payload(arr)

    # -- loop + server ------------------------------------------------------------
    def _worker(self):
        while not self._stop:
            if self.playing:
                t0 = time.perf_counter()
                with self._lock:
                    self.app.step()
                dt = time.perf_counter() - t0
                if dt < self._min_dt:
                    time.sleep(self._min_dt - dt)
            else:
                time.sleep(0.05)

    def start(self, block: bool = False):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, body: bytes, ctype="application/json"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                try:
                    path = unquote(self.path.split("?")[0])
                    if path == "/":
                        self._send(200, _PAGE.encode(), "text/html")
                    elif path == "/volume":
                        from diffpiso_tpu.app.volume import VOLUME_PAGE

                        self._send(200, VOLUME_PAGE.encode(), "text/html")
                    elif path.startswith("/api/volume/"):
                        data, meta = server.field_volume(path.split("/", 3)[3])
                        self.send_response(200)
                        self.send_header("Content-Type", "application/octet-stream")
                        self.send_header("Content-Length", str(len(data)))
                        self.send_header("X-Volume-Meta", json.dumps(meta))
                        self.end_headers()
                        self.wfile.write(data)
                    elif path == "/api/status":
                        self._send(200, json.dumps(server.status()).encode())
                    elif path.startswith("/api/field/"):
                        from urllib.parse import parse_qs, urlparse

                        q = parse_qs(urlparse(self.path).query)
                        axis = int(q.get("axis", ["0"])[0])
                        index = (
                            int(q["index"][0]) if "index" in q else None
                        )
                        self._send(
                            200,
                            server.field_png(path.split("/", 3)[3], axis, index),
                            "image/png",
                        )
                    elif path.startswith("/api/scalars/"):
                        name = path.split("/", 3)[3]
                        self._send(
                            200,
                            json.dumps(
                                [float(v) for v in server.app.scalars.get(name, [])]
                            ).encode(),
                        )
                    else:
                        self._send(404, b"{}")
                except Exception as e:  # surface errors to the client
                    self._send(500, json.dumps({"error": str(e)}).encode())

            def do_POST(self):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    if self.path == "/api/action":
                        server.do_action(req["name"])
                        self._send(200, b"{}")
                    elif self.path == "/api/control":
                        v = server.set_control(req["name"], req["value"])
                        self._send(200, json.dumps({"value": v}).encode())
                    else:
                        self._send(404, b"{}")
                except Exception as e:
                    self._send(500, json.dumps({"error": str(e)}).encode())

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._httpd.server_address[1]  # resolve port=0
        for target in (self._httpd.serve_forever, self._worker):
            t = threading.Thread(target=target, daemon=True)
            t.start()
            self._threads.append(t)
        print(f"[app] dashboard at http://{self.host}:{self.port}/")
        if block:
            try:
                while True:
                    time.sleep(3600)
            except KeyboardInterrupt:
                pass
            finally:
                self.stop()
        return self

    def stop(self):
        self._stop = True
        self.playing = False
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()


def show(app: App, host: str = "127.0.0.1", port: int = 8050, block: bool = True):
    """phi.flow `show(app)` analog: serve the dashboard for `app`."""
    return AppServer(app, host, port).start(block=block)
