"""Real-time WebGL 3-D volume rendering for the dashboard.

Capability parity with the reference's `webglviewer/` + webgl_util.py
(PhiFlow/phi/viz/dash/webgl_util.py:1-148): interactive in-browser volume
views of 3-D fields. The reference wraps a prebuilt JS viewer inside Dash;
this redesign is a self-contained WebGL2 raycaster (no external JS, no
Dash): the server streams the volume as a normalized uint8 brick
(`/api/volume/<name>`; shape + range in the X-Volume-Meta header) and the
page uploads it into a 3-D texture and ray-marches it with front-to-back
alpha compositing and an orbit camera. Works over the same SSH tunnel as
the rest of the dashboard.
"""

from __future__ import annotations

import json

import numpy as np


def volume_payload(arr: np.ndarray):
    """(bytes, meta) for a 3-D field: uint8-normalized C-order brick.
    Trailing component axes ((..., 3) staggered tensors) reduce to
    magnitude, mirroring webgl_util.py's reduce_component."""
    a = np.asarray(arr, np.float64)
    if a.ndim == 4 and a.shape[-1] in (2, 3):
        a = np.sqrt(np.sum(a * a, axis=-1))
    if a.ndim != 3:
        raise ValueError(f"volume endpoint needs a 3-D field, got {a.shape}")
    a = np.nan_to_num(a)
    lo, hi = float(a.min()), float(a.max())
    norm = (a - lo) / (hi - lo) if hi > lo else np.zeros_like(a)
    data = (norm * 255.0 + 0.5).astype(np.uint8)
    meta = {"shape": list(a.shape), "min": lo, "max": hi}
    return data.tobytes(), meta


VOLUME_PAGE = """<!DOCTYPE html>
<html><head><title>diffpiso_tpu volume</title><style>
body{font-family:sans-serif;margin:0;background:#101418;color:#dfe3e8;
     overflow:hidden}
#hud{position:absolute;left:1em;top:.7em}
canvas{display:block;width:100vw;height:100vh;cursor:grab}
small{color:#8b949e}
</style></head><body>
<div id="hud"><b id="title"></b> <small id="meta"></small><br>
<small>drag = orbit, wheel = zoom, d = density</small></div>
<canvas id="gl"></canvas>
<script>
const FIELD=new URLSearchParams(location.search).get('field');
document.getElementById('title').textContent=FIELD;
const canvas=document.getElementById('gl');
const gl=canvas.getContext('webgl2');
if(!gl){document.body.textContent='WebGL2 required';throw 'no webgl2';}

const VS=`#version 300 es
in vec2 p; out vec2 uv;
void main(){uv=p; gl_Position=vec4(p,0.,1.);}`;
const FS=`#version 300 es
precision highp float; precision highp sampler3D;
in vec2 uv; out vec4 color;
uniform sampler3D vol; uniform mat3 rot; uniform float dist; uniform float density;
uniform vec3 boxScale;
// viridis-ish colormap
vec3 cmap(float t){
  return vec3(0.267+t*(0.98-0.267)*t, 0.005+t*0.9, 0.329+0.55*t-0.85*t*t);
}
vec2 boxHit(vec3 ro, vec3 rd){
  vec3 inv=1./rd;
  vec3 t0=(vec3(-.5)*boxScale-ro)*inv, t1=(vec3(.5)*boxScale-ro)*inv;
  vec3 tmin=min(t0,t1), tmax=max(t0,t1);
  return vec2(max(max(tmin.x,tmin.y),tmin.z), min(min(tmax.x,tmax.y),tmax.z));
}
void main(){
  vec3 ro=rot*vec3(0.,0.,dist);
  vec3 rd=normalize(rot*vec3(uv.x, uv.y, -1.8));
  vec2 t=boxHit(ro,rd);
  if(t.y<max(t.x,0.)){color=vec4(0.06,0.08,0.1,1.);return;}
  float tn=max(t.x,0.);
  const int N=160;
  float dt=(t.y-tn)/float(N);
  vec3 acc=vec3(0.); float alpha=0.;
  for(int i=0;i<N;i++){
    vec3 p=ro+rd*(tn+(float(i)+.5)*dt);
    vec3 tc=p/boxScale+.5;
    float v=texture(vol, tc.zyx).r;  // data is (a0,a1,a2) C-order
    float a=1.-exp(-v*density*dt*12.);
    acc+=(1.-alpha)*a*cmap(v);
    alpha+=(1.-alpha)*a;
    if(alpha>0.985)break;
  }
  color=vec4(mix(vec3(0.06,0.08,0.1),acc,clamp(alpha+.15*alpha,0.,1.)),1.);
}`;
function sh(type,src){const s=gl.createShader(type);gl.shaderSource(s,src);
  gl.compileShader(s);
  if(!gl.getShaderParameter(s,gl.COMPILE_STATUS))throw gl.getShaderInfoLog(s);
  return s;}
const prog=gl.createProgram();
gl.attachShader(prog,sh(gl.VERTEX_SHADER,VS));
gl.attachShader(prog,sh(gl.FRAGMENT_SHADER,FS));
gl.linkProgram(prog);
if(!gl.getProgramParameter(prog,gl.LINK_STATUS))throw gl.getProgramInfoLog(prog);
gl.useProgram(prog);
const buf=gl.createBuffer();gl.bindBuffer(gl.ARRAY_BUFFER,buf);
gl.bufferData(gl.ARRAY_BUFFER,new Float32Array([-1,-1,3,-1,-1,3]),gl.STATIC_DRAW);
const locP=gl.getAttribLocation(prog,'p');
gl.enableVertexAttribArray(locP);gl.vertexAttribPointer(locP,2,gl.FLOAT,false,0,0);
const uRot=gl.getUniformLocation(prog,'rot'),
      uDist=gl.getUniformLocation(prog,'dist'),
      uDen=gl.getUniformLocation(prog,'density'),
      uBox=gl.getUniformLocation(prog,'boxScale');
let yaw=.6,pitch=.5,dist=1.9,density=4.,drag=null,shape=[1,1,1];
function draw(){
  canvas.width=innerWidth;canvas.height=innerHeight;
  gl.viewport(0,0,canvas.width,canvas.height);
  const cy=Math.cos(yaw),sy=Math.sin(yaw),cp=Math.cos(pitch),sp=Math.sin(pitch);
  // rot = Ry(yaw)*Rx(pitch), column-major
  gl.uniformMatrix3fv(uRot,false,[cy,0,-sy, sy*sp,cp,cy*sp, sy*cp,-sp,cy*cp]);
  gl.uniform1f(uDist,dist);gl.uniform1f(uDen,density);
  const m=Math.max(...shape);
  gl.uniform3f(uBox,shape[2]/m,shape[1]/m,shape[0]/m);
  gl.drawArrays(gl.TRIANGLES,0,3);
}
canvas.onmousedown=e=>drag=[e.clientX,e.clientY];
window.onmouseup=()=>drag=null;
window.onmousemove=e=>{if(!drag)return;
  yaw+=(e.clientX-drag[0])*.008;pitch+=(e.clientY-drag[1])*.008;
  pitch=Math.max(-1.5,Math.min(1.5,pitch));drag=[e.clientX,e.clientY];draw();};
canvas.onwheel=e=>{dist*=Math.exp(e.deltaY*.001);draw();e.preventDefault();};
window.onkeydown=e=>{if(e.key==='d'){density=density>16?1:density*1.6;draw();}};
window.onresize=draw;
async function load(){
  const r=await fetch('/api/volume/'+FIELD);
  if(!r.ok){document.getElementById('meta').textContent=' (not a 3-D field)';return;}
  const meta=JSON.parse(r.headers.get('X-Volume-Meta'));
  shape=meta.shape;
  document.getElementById('meta').textContent=
    ` ${shape.join('x')}  [${meta.min.toPrecision(3)}, ${meta.max.toPrecision(3)}]`;
  const data=new Uint8Array(await r.arrayBuffer());
  const tex=gl.createTexture();
  gl.bindTexture(gl.TEXTURE_3D,tex);
  gl.pixelStorei(gl.UNPACK_ALIGNMENT,1);
  gl.texImage3D(gl.TEXTURE_3D,0,gl.R8,shape[2],shape[1],shape[0],0,
                gl.RED,gl.UNSIGNED_BYTE,data);
  for(const p of [[gl.TEXTURE_MIN_FILTER,gl.LINEAR],[gl.TEXTURE_MAG_FILTER,gl.LINEAR],
    [gl.TEXTURE_WRAP_S,gl.CLAMP_TO_EDGE],[gl.TEXTURE_WRAP_T,gl.CLAMP_TO_EDGE],
    [gl.TEXTURE_WRAP_R,gl.CLAMP_TO_EDGE]])gl.texParameteri(gl.TEXTURE_3D,p[0],p[1]);
  draw();
}
load();setInterval(load,2000);
</script></body></html>"""
