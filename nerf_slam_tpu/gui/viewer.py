"""Live viewer attach: an HTTP streaming endpoint over the viz stream.

The reference opens an interactive Open3D window with key bindings
(/root/reference/gui/open3d_gui.py:85-198); TPU hosts are headless, so
the live-attach equivalent is a tiny in-process HTTP server: a browser
(or curl) anywhere with network reach gets the latest keyframe, depth /
sigma heatmaps, trajectory JSON, point cloud, and can send the same
M/N/A/S/T commands back through the GUI->fusion queue back-channel
(open3d_gui.py:369-383).  Zero new dependencies: stdlib http.server in
a daemon thread + cv2 JPEG encoding; the SLAM/fusion loops never block
on a viewer being attached (state handoff is a dict swap under a lock).

Usage:
    gui = LiveViewer(HeadlessGui(out_dir), port=8090)
    GuiModule(gui)  # drop-in: same visualize()/pop_commands() contract
"""
from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html><html><head><title>nerf_slam_tpu</title>
<style>body{background:#111;color:#ddd;font-family:monospace}
img{image-rendering:pixelated;margin:4px;max-width:45vw}
button{margin:2px;background:#333;color:#ddd;border:1px solid #666}
#traj{border:1px solid #444}</style></head><body>
<h3>nerf_slam_tpu live viewer</h3>
<div id="stats"></div>
<div>
<button onclick="cmd('mesh')">[M]esh</button>
<button onclick="cmd('eval')">[N] eval</button>
<button onclick="cmd('toggle_mask')">[T]oggle mask</button>
<button onclick="cmd('rebuild')">[Z] rebuild</button>
<button onclick="cmd('sigma_thresh&value='+prompt('sigma thresh','10'))">
[A/S] sigma</button>
</div>
<img id="kf" src="/kf.jpg"><img id="depth" src="/depth.jpg">
<img id="sigma" src="/sigma.jpg"><img id="render" src="/render.jpg">
<br><canvas id="traj" width="480" height="480"></canvas>
<script>
function cmd(c){fetch('/cmd?name='+c)}
async function tick(){
 try{
  const s=await (await fetch('/state.json')).json();
  document.getElementById('stats').textContent=JSON.stringify(s.stats);
  for(const id of['kf','depth','sigma','render'])
   document.getElementById(id).src='/'+id+'.jpg?t='+Date.now();
  const c=document.getElementById('traj').getContext('2d');
  c.fillStyle='#111';c.fillRect(0,0,480,480);
  const tr=s.trajectory||[];
  if(tr.length){
   const xs=tr.map(p=>p.c2w[0][3]),zs=tr.map(p=>p.c2w[2][3]);
   const mx=Math.min(...xs),Mx=Math.max(...xs)+1e-6;
   const mz=Math.min(...zs),Mz=Math.max(...zs)+1e-6;
   const sc=440/Math.max(Mx-mx,Mz-mz);
   c.strokeStyle='#4af';c.beginPath();
   tr.forEach((p,i)=>{const x=20+(p.c2w[0][3]-mx)*sc,
    y=20+(p.c2w[2][3]-mz)*sc;i?c.lineTo(x,y):c.moveTo(x,y)});
   c.stroke();}
 }catch(e){}
 setTimeout(tick,1000);}
tick();
</script></body></html>"""


class LiveViewer:
    """Wraps a HeadlessGui, serving its stream over HTTP.

    Drop-in for GuiModule: ``visualize`` updates the served state then
    delegates; ``pop_commands`` merges HTTP-issued commands with the
    inner GUI's programmatic ones.
    """

    def __init__(self, gui, port: int = 8090, host: str = "0.0.0.0",
                 jpeg_quality: int = 85):
        self.gui = gui
        self.port = port
        self.jpeg_quality = jpeg_quality
        self._lock = threading.Lock()
        self._jpgs: Dict[str, bytes] = {}
        self._cloud: Optional[bytes] = None
        self._stats: Dict[str, Any] = {}
        self._http_cmds = []
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):      # quiet
                pass

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/":
                    self._send(200, "text/html", _PAGE.encode())
                elif u.path == "/state.json":
                    with viewer._lock:
                        body = json.dumps({
                            "stats": viewer._stats,
                            "trajectory": viewer.gui.trajectory[-512:],
                        }).encode()
                    self._send(200, "application/json", body)
                elif u.path.endswith(".jpg"):
                    name = u.path[1:-4]
                    with viewer._lock:
                        data = viewer._jpgs.get(name)
                    if data is None:
                        self._send(404, "text/plain", b"not yet")
                    else:
                        self._send(200, "image/jpeg", data)
                elif u.path == "/cloud.ply":
                    with viewer._lock:
                        data = viewer._cloud
                    if data is None:
                        self._send(404, "text/plain", b"not yet")
                    else:
                        self._send(200, "application/octet-stream", data)
                elif u.path == "/cmd":
                    q = parse_qs(u.query)
                    name = (q.get("name") or [""])[0]
                    cmd = {"cmd": name}
                    if "value" in q:
                        cmd["value"] = float(q["value"][0])
                    if name:
                        with viewer._lock:
                            viewer._http_cmds.append(cmd)
                    self._send(200, "text/plain", b"ok")
                else:
                    self._send(404, "text/plain", b"?")

            def _send(self, code, ctype, body):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                try:
                    self.wfile.write(body)
                except BrokenPipeError:
                    pass

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]   # resolved (port 0)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True,
            name="live-viewer")
        self._thread.start()

    # GuiModule contract -------------------------------------------------
    def visualize(self, packet: Optional[Dict[str, Any]]):
        out = self.gui.visualize(packet)
        if packet is not None and "cam0_poses" in packet:
            try:
                self._publish(packet)
            except Exception:
                pass                        # viewer must never kill SLAM
        return out

    def pop_commands(self):
        with self._lock:
            http_cmds, self._http_cmds = self._http_cmds, []
        # apply sigma_thresh locally too (mirrors HeadlessGui A/S keys)
        for c in http_cmds:
            if c["cmd"] == "sigma_thresh" and "value" in c:
                self.gui.sigma_thresh = float(c["value"])
        return self.gui.pop_commands() + http_cmds

    def close(self):
        self._server.shutdown()
        self._server.server_close()

    # internals ----------------------------------------------------------
    def _publish(self, packet):
        import cv2

        from ..utils import viz
        from .headless import backproject_packet

        nv = int(packet.get("viz_count",
                            np.asarray(packet["viz_idx"]).shape[0]))
        img = np.asarray(packet["cam0_images"])[nv - 1]
        idep = np.asarray(packet["cam0_idepths_up"])[nv - 1]
        cov = np.asarray(packet["cam0_depths_cov_up"])[nv - 1]
        with np.errstate(divide="ignore"):
            depth = np.where(idep > 1e-3, 1.0 / idep, 0.0)

        enc = [int(cv2.IMWRITE_JPEG_QUALITY), self.jpeg_quality]

        def jpg(rgb):
            ok, buf = cv2.imencode(
                ".jpg", cv2.cvtColor(np.ascontiguousarray(rgb),
                                     cv2.COLOR_RGB2BGR), enc)
            return buf.tobytes() if ok else b""

        jpgs = {
            "kf": jpg(img.astype(np.uint8)),
            "depth": jpg(viz.depth_to_rgb(depth)),
            "sigma": jpg(viz.sigma_to_rgb(cov)),
        }
        if "render_rgb" in packet:     # fusion-rendered current view
            r = np.asarray(packet["render_rgb"])
            jpgs["render"] = jpg((np.clip(r, 0, 1) * 255).astype(
                np.uint8) if r.dtype != np.uint8 else r)

        cloud = None
        if packet.get("is_last_frame") or self.gui.n_packets % 10 == 0:
            pts, cols = backproject_packet(packet, self.gui.sigma_thresh,
                                           stride=4)
            if pts.shape[0]:
                sel = slice(None)
                if pts.shape[0] > 200000:
                    sel = np.random.RandomState(0).choice(
                        pts.shape[0], 200000, replace=False)
                header = ("ply\nformat ascii 1.0\n"
                          f"element vertex {pts[sel].shape[0]}\n"
                          "property float x\nproperty float y\n"
                          "property float z\nproperty uchar red\n"
                          "property uchar green\nproperty uchar blue\n"
                          "end_header\n")
                rows = "".join(
                    f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} "
                    f"{int(c[0])} {int(c[1])} {int(c[2])}\n"
                    for p, c in zip(pts[sel], cols[sel]))
                cloud = (header + rows).encode()

        stats = {"n_keyframes": int(np.asarray(
            packet["viz_idx"])[nv - 1]) + 1, "n_packets":
            self.gui.n_packets, "sigma_thresh": self.gui.sigma_thresh}
        with self._lock:
            self._jpgs.update(jpgs)
            if cloud is not None:
                self._cloud = cloud
            self._stats = stats
