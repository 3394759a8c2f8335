"""Host-side live viewer: a dependency-free HTTP shim for interactive scene
inspection.

Counterpart of the reference's viser/nerfview background viewer
(project/models/trainers/base.py:755-827). viser is not available in this
environment, so the viewer is a plain `http.server` in a daemon thread that
serves a self-contained orbit-controls HTML page and renders JPEG frames on
demand through the trainer's novel-view forward (camera refinement disabled,
base.py:325-329). Works standalone (`python -m ...tools.viewer --log_dir`)
or attached to a live training loop via `Viewer(render_fn, ...)` — renders
pause training only for the duration of one frame (the GIL plus jit dispatch
serialize naturally; matches the reference's viewer_lock semantics).
"""
from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html><html><head><title>bilateral_driving_tpu</title>
<style>body{margin:0;background:#111;color:#ccc;font:13px monospace}
#hud{position:fixed;top:8px;left:8px}
#stats{position:fixed;top:8px;right:8px;text-align:right}
#pause{cursor:pointer;border:1px solid #888;padding:2px 8px}</style></head>
<body><canvas id=c></canvas><div id=hud>drag: orbit &middot; wheel: dolly
&middot; shift-drag: pan &middot; [ ] : time</div>
<div id=stats><span id=tr></span> <span id=pause>pause</span></div><script>
const c=document.getElementById('c'),x=c.getContext('2d');
let az=0,el=0.2,r=12,cx=0,cy=0,cz=0,t=0,busy=false,dirty=true;
c.width=innerWidth;c.height=innerHeight;
const pb=document.getElementById('pause'),tr=document.getElementById('tr');
pb.onclick=async()=>{const r=await fetch('/pause',{method:'POST'});
 const j=await r.json();pb.textContent=j.paused?'resume':'pause';};
setInterval(async()=>{try{const r=await fetch('/stats');const j=await
 r.json();tr.textContent=`step ${j.step} | ${j.steps_per_s.toFixed(2)} it/s`+
 ` | ${j.num_points} pts | loss ${j.loss.toFixed(4)}`;
 pb.textContent=j.paused?'resume':'pause';}catch(e){}},1000);
function pose(){
 const ce=Math.cos(el),se=Math.sin(el),ca=Math.cos(az),sa=Math.sin(az);
 const eye=[cx+r*ce*sa,cy+r*ce*ca,cz+r*se];
 return {eye:eye,look:[cx,cy,cz],t:t};}
async function draw(){
 if(busy||!dirty)return;busy=true;dirty=false;
 const p=pose();
 const q=`/frame?eye=${p.eye}&look=${p.look}&t=${p.t}`;
 const img=new Image();
 img.onload=()=>{x.drawImage(img,0,0,c.width,c.height);busy=false;};
 img.onerror=()=>{busy=false;};
 img.src=q+'&_='+Date.now();}
setInterval(draw,100);
let mx=0,my=0,drag=false,pan=false;
c.onmousedown=e=>{drag=true;pan=e.shiftKey;mx=e.clientX;my=e.clientY};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{if(!drag)return;
 const dx=e.clientX-mx,dy=e.clientY-my;mx=e.clientX;my=e.clientY;
 if(pan){cx-=dx*0.02;cz+=dy*0.02}else{az+=dx*0.005;el+=dy*0.005}
 dirty=true};
c.onwheel=e=>{r*=Math.exp(e.deltaY*0.001);dirty=true;e.preventDefault()};
window.onkeydown=e=>{if(e.key==='[')t=Math.max(0,t-0.05);
 if(e.key===']')t=Math.min(1,t+0.05);dirty=true};
</script></body></html>"""


def _look_at(eye, look, up=(0.0, 0.0, 1.0)) -> np.ndarray:
    """OpenCV-convention camera-to-world from eye/look-at."""
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(look, np.float64) - eye
    fwd = fwd / max(np.linalg.norm(fwd), 1e-9)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right = right / max(np.linalg.norm(right), 1e-9)
    down = np.cross(fwd, right)
    m = np.eye(4)
    m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = right, down, fwd, eye
    return m


class Viewer:
    """Serve `render_fn(c2w (4,4) np, t float) -> (H, W, 3) float [0,1]`.

    Training-mode extras (nerfview "training" parity, reference
    base.py:755-762): `update_stats(step=..., steps_per_s=..., ...)` feeds
    the HUD's train-speed readout, and the page's pause button toggles
    `paused` — an attached training loop calls `wait_if_paused()` each
    step to honor it (the viewer keeps rendering while training sleeps)."""

    def __init__(self, render_fn: Callable, port: int = 8080,
                 host: str = "127.0.0.1"):
        self.render_fn = render_fn
        self.paused = False
        self._stats = {"step": 0, "steps_per_s": 0.0, "num_points": 0,
                       "loss": float("nan")}
        self._stats_lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):   # quiet
                pass

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/":
                    body = _PAGE.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if u.path == "/frame":
                    q = parse_qs(u.query)
                    eye = [float(v) for v in q["eye"][0].split(",")]
                    look = [float(v) for v in q["look"][0].split(",")]
                    t = float(q.get("t", ["0"])[0])
                    img = outer.render_fn(_look_at(eye, look), t)
                    buf = io.BytesIO()
                    from PIL import Image
                    Image.fromarray(
                        (np.clip(np.asarray(img), 0, 1) * 255).astype(
                            np.uint8)).save(buf, "JPEG", quality=85)
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                    self.end_headers()
                    self.wfile.write(buf.getvalue())
                    return
                if u.path == "/stats":
                    with outer._stats_lock:
                        body = json.dumps(
                            {**outer._stats, "paused": outer.paused}).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(body)
                    return
                self.send_response(404)
                self.end_headers()
                self.wfile.write(b"{}")

            def do_POST(self):
                if urlparse(self.path).path == "/pause":
                    outer.paused = not outer.paused
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(json.dumps(
                        {"paused": outer.paused}).encode())
                    return
                self.send_response(404)
                self.end_headers()

        self.server = ThreadingHTTPServer((host, port), Handler)
        self.port = self.server.server_address[1]
        self.thread: Optional[threading.Thread] = None

    def start(self):
        self.thread = threading.Thread(target=self.server.serve_forever,
                                       daemon=True)
        self.thread.start()
        return self

    def stop(self):
        self.server.shutdown()

    def update_stats(self, **kw) -> None:
        with self._stats_lock:
            self._stats.update({k: (float(v) if k != "step"
                                    and k != "num_points" else int(v))
                                for k, v in kw.items()})

    def wait_if_paused(self, poll_s: float = 0.2) -> None:
        """Block the calling (training) thread while the UI is paused."""
        import time as _time
        while self.paused:
            _time.sleep(poll_s)


def main():
    import argparse
    import functools
    import os

    import jax
    import jax.numpy as jnp

    from ..train import checkpoint, trainer
    from ..utils import config as config_lib
    from . import common

    p = argparse.ArgumentParser()
    p.add_argument("--log_dir", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("opts", nargs="*")
    args = p.parse_args()

    cfg = config_lib.load_config(os.path.join(args.log_dir, "config.yaml"),
                                 overrides=args.opts)
    key = jax.random.key(0)
    interpret = jax.default_backend() not in ("tpu", "axon")
    tcfg, data, params, statics, aux, masks = common.build_real_scene(
        key, cfg, interpret)
    state = trainer.init_state(key, tcfg, params, masks, aux)
    ckpt = args.checkpoint or checkpoint.latest_checkpoint(
        os.path.join(args.log_dir, "checkpoints"))
    if ckpt:
        state = checkpoint.restore_checkpoint(ckpt, state)
    full_statics = trainer.merge_statics(statics, state.aux)
    fwd = jax.jit(functools.partial(trainer.forward, tcfg, novel_view=True,
                                    in_test_set=True))
    base = data.get_batch(0)
    from ..data.scene import _pixel_viewdirs
    K = np.asarray(base["intrinsics"])
    h, w = base["pixels"].shape[:2]

    def render(c2w, t):
        b = dict(base)
        b["camera_to_world"] = jnp.asarray(c2w)
        b["viewdirs"] = jnp.asarray(_pixel_viewdirs(h, w, K, c2w))
        b["normed_time"] = jnp.asarray(t, jnp.float32)
        out = fwd(state.params, full_statics, state.masks, b, state.step)
        return np.asarray(out["rgb"])

    v = Viewer(render, port=args.port).start()
    print(f"viewer at http://127.0.0.1:{v.port}/ (ctrl-c to stop)")
    try:
        v.thread.join()
    except KeyboardInterrupt:
        v.stop()


if __name__ == "__main__":
    main()
