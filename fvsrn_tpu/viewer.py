"""Interactive browser viewer -- the headless-pod equivalent of the
reference's ImGui/OpenGL GUI (reference: gui/visualizer.{h,cpp}, gui/
main.cpp): orbit the camera around a scene, edit transfer-function
opacity/exposure, switch evaluation modes, and inspect renders live.

A TPU pod has no display stack, so instead of ImGui the viewer serves a
single-page UI over HTTP: drag to orbit, wheel to dolly, sliders for TF
scale and step size. Renders run through the same module tree as
everything else (``ImageEvaluatorSimple`` or a ``LoadedModel``); each
(width, height, stepsize) specializes one jitted render reused across
requests.

Usage::

    python -m fvsrn_tpu.viewer --equation MARSCHNER_LOBB --port 8787
    # or in code:
    from fvsrn_tpu.viewer import serve
    serve(evaluator, port=8787)
"""
from __future__ import annotations

import argparse
import functools
import io
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>fvsrn_tpu viewer</title><style>
body { margin:0; background:#111; color:#ddd; font:13px sans-serif; }
#wrap { display:flex; }
#img { cursor:grab; image-rendering:pixelated; }
#panel { padding:12px; min-width:220px; }
label { display:block; margin-top:10px; }
input[type=range] { width:200px; }
</style></head><body><div id="wrap">
<img id="img" width="512" height="512"/>
<div id="panel">
  <b>fvsrn_tpu viewer</b>
  <label>pitch <span id="pv"></span>
    <input id="pitch" type="range" min="-1.4" max="1.4" step="0.02" value="0.35"></label>
  <label>yaw <span id="yv"></span>
    <input id="yaw" type="range" min="0" max="6.28" step="0.02" value="0.6"></label>
  <label>distance <span id="dv"></span>
    <input id="dist" type="range" min="0.8" max="4" step="0.05" value="1.8"></label>
  <label>opacity scale <span id="ov"></span>
    <input id="opac" type="range" min="0.1" max="4" step="0.1" value="1"></label>
  <label>resolution
    <select id="res"><option>128</option><option selected>256</option>
    <option>512</option></select></label>
  <div id="stat" style="margin-top:12px;color:#8a8"></div>
</div></div>
<script>
const img = document.getElementById('img');
let busy = false, dirty = false;
let progressive = false, maxFrames = 32;
fetch('/meta').then(r => r.json()).then(m => {
  progressive = m.progressive; maxFrames = m.max_frames;
}).catch(() => {});
async function refresh() {
  if (busy) { dirty = true; return; }
  busy = true;
  const q = new URLSearchParams({
    pitch: pitch.value, yaw: yaw.value, distance: dist.value,
    opacity: opac.value, size: res.value, t: Date.now()});
  pv.textContent = pitch.value; yv.textContent = yaw.value;
  dv.textContent = dist.value; ov.textContent = opac.value;
  const t0 = performance.now();
  try {
    const r = await fetch('/render?' + q);
    const frames = +(r.headers.get('X-Frames') || 1);
    const old = img.src;
    img.src = URL.createObjectURL(await r.blob());
    if (old.startsWith('blob:')) URL.revokeObjectURL(old);
    stat.textContent = (performance.now() - t0).toFixed(0) + ' ms'
      + (progressive ? ' · ' + frames + ' passes' : '');
    busy = false;
    if (dirty) { dirty = false; refresh(); }
    else if (progressive && frames < maxFrames)
      setTimeout(refresh, 30);  // keep refining while idle (MC mode)
  } catch (e) { busy = false; }
}
for (const el of [pitch, yaw, dist, opac, res])
  el.addEventListener('input', refresh);
let drag = null;
img.addEventListener('mousedown', e => drag = [e.clientX, e.clientY]);
window.addEventListener('mouseup', () => drag = null);
window.addEventListener('mousemove', e => {
  if (!drag) return;
  yaw.value = (+yaw.value + (e.clientX - drag[0]) * 0.01 + 6.28) % 6.28;
  pitch.value = Math.max(-1.4, Math.min(1.4,
      +pitch.value + (e.clientY - drag[1]) * 0.01));
  drag = [e.clientX, e.clientY];
  refresh();
});
img.addEventListener('wheel', e => {
  e.preventDefault();
  dist.value = Math.max(0.8, Math.min(4,
      +dist.value * (e.deltaY > 0 ? 1.05 : 0.95)));
  refresh();
});
refresh();
</script></body></html>"""


class ViewerState:
    """Render backend shared by requests: one jitted render per
    (size, opacity-scaled TF) structure. Monte-Carlo evaluators render
    PROGRESSIVELY (reference: the GUI's refine loop between
    interactions, iimage_evaluator.h:43-71): repeated requests at the
    same camera/TF fold more passes into a running mean
    (:class:`~fvsrn_tpu.raytracer.evaluator.ProgressiveRenderer`); any
    parameter change resets the accumulator."""

    MAX_REFINE_FRAMES = 32

    def __init__(self, evaluator, max_steps_fn=None):
        import jax
        from .raytracer.dvr import max_steps_bound
        self.evaluator = evaluator
        self._lock = threading.Lock()
        self._prog = {}        # size -> ProgressiveRenderer
        self._prog_params = None

        @functools.lru_cache(maxsize=8)
        def make_render(size):
            steps = max_steps_bound(
                np.asarray(evaluator.volume.box_size),
                float(np.asarray(evaluator.ray_config.stepsize)))

            @jax.jit
            def render(ev):
                return ev.render(size, size, max_steps=steps)

            return render

        self._make_render = make_render

    @property
    def progressive(self) -> bool:
        return getattr(self.evaluator, "ray_mode", "dvr") == "mc"

    def render_png(self, pitch, yaw, distance, opacity, size):
        """Returns (png_bytes, accumulated_frames)."""
        from .camera import CameraOnASphere
        cam = CameraOnASphere.make(pitch=pitch, yaw=yaw, distance=distance)
        ev = self.evaluator.replace(camera=cam)
        if opacity != 1.0 and hasattr(ev.tf, "tensor"):
            t = np.asarray(ev.tf.tensor)
            t = t.copy()
            t[:, 3] = t[:, 3] * opacity
            ev = ev.replace(tf=type(ev.tf)(tensor=t.astype(np.float32)))
        frames = 1
        with self._lock:  # one TPU client: serialize renders
            if self.progressive:
                from .raytracer.evaluator import ProgressiveRenderer
                params = (pitch, yaw, distance, opacity, size)
                pr = self._prog.get(size)
                if pr is None:
                    pr = ProgressiveRenderer(ev, size, size)
                    self._prog[size] = pr
                    self._prog_params = None
                if params != self._prog_params:
                    # camera/TF moved: swap the evaluator (a traced
                    # argument of the compiled step) and restart
                    pr.evaluator = ev
                    pr.reset()
                    self._prog_params = params
                if pr.frames < self.MAX_REFINE_FRAMES:
                    pr.refine(1)
                img = np.asarray(pr.image)
                frames = pr.frames
            else:
                img = np.asarray(self._make_render(size)(ev))
        rgb = np.clip(np.moveaxis(img[0, :3], 0, -1), 0, 1)
        arr = (rgb * 255).astype(np.uint8)
        try:
            from PIL import Image
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            return buf.getvalue(), frames
        except ImportError:
            return _encode_png(arr), frames


def _encode_png(arr: np.ndarray) -> bytes:
    """Minimal PNG writer (rgb8) -- no-PIL fallback."""
    import struct
    import zlib

    h, w, _ = arr.shape
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data))

    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            u = urlparse(self.path)
            if u.path == "/":
                body = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if u.path == "/render":
                q = parse_qs(u.query)

                def f(k, d):
                    return float(q.get(k, [d])[0])

                try:
                    png, frames = state.render_png(
                        pitch=f("pitch", 0.35), yaw=f("yaw", 0.6),
                        distance=f("distance", 1.8),
                        opacity=f("opacity", 1.0),
                        size=int(f("size", 256)))
                except Exception as e:  # surface render errors as 500s
                    msg = json.dumps({"error": str(e)}).encode()
                    self.send_response(500)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(msg)))
                    self.end_headers()
                    self.wfile.write(msg)
                    return
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(png)))
                self.send_header("X-Frames", str(frames))
                self.end_headers()
                self.wfile.write(png)
                return
            if u.path == "/meta":
                body = json.dumps({
                    "progressive": state.progressive,
                    "max_frames": state.MAX_REFINE_FRAMES,
                }).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            self.send_response(404)
            self.end_headers()

    return Handler


def serve(evaluator, port: int = 8787, host: str = "127.0.0.1",
          block: bool = True):
    """Serve the viewer. ``block=False`` returns the server (tests)."""
    state = ViewerState(evaluator)
    server = ThreadingHTTPServer((host, port), make_handler(state))
    if block:
        print(f"fvsrn_tpu viewer on http://{host}:{server.server_port}/",
              flush=True)
        server.serve_forever()
    else:
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
    return server


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--equation", default="MARSCHNER_LOBB")
    p.add_argument("--cvol", default=None, help=".cvol volume to view")
    p.add_argument("--stepsize", type=float, default=1 / 256)
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--host", default="127.0.0.1")
    args = p.parse_args(argv)

    import fvsrn_tpu as fv
    if args.cvol:
        from .volume.grid import VolumeInterpolationGrid
        from .volume.volume import Volume
        vol = VolumeInterpolationGrid.make(Volume.load(args.cvol))
    else:
        vol = fv.VolumeInterpolationImplicit.make(args.equation)
    tf = fv.TransferFunctionPiecewiseLinear.make(
        rgb=[[0.1, 0.1, 0.8], [0.8, 0.3, 0.1], [1.0, 1.0, 0.6]],
        opacity=[0.0, 8.0, 25.0], positions=[0.0, 0.5, 1.0])
    cfg = fv.RayEvaluationSteppingDvr.make(stepsize=args.stepsize)
    cam = fv.CameraOnASphere.make(pitch=0.35, yaw=0.6, distance=1.8)
    ev = fv.ImageEvaluatorSimple(camera=cam, volume=vol, tf=tf,
                                 ray_config=cfg)
    serve(ev, port=args.port, host=args.host)
    return 0


if __name__ == "__main__":
    sys.exit(main())
