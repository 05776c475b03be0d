"""Interactive multi-scene viewer, served over HTTP (headless-TPU native).

Behavioral reference: visualizer.py (ti.GUI viewer). The interaction model
is preserved exactly — per-object (K, 4)/(K, 3) poses fed to the rasterizer
(:272-284), scene selection with keys 0-9 (0 = camera), WASD/QE/-/= moves
or rotates the camera or the selected object with the sign flip
(`move_factor`, :115), mouse drag orbits the camera or spins the selected
object about its center (:211-270), H/P hides/shows via the invalid mask
(:204-207) — but the surface is a self-contained web page (ti.GUI needs a
local display; TPU hosts are headless). The browser posts key/drag events
to /event and pulls JPEG frames from /frame; rendering is one jitted
rasterize call per frame on the device.

Run: python -m taichi_3d_gaussian_splatting_tpu.apps.visualizer \
         --parquet_path_list a.parquet b.parquet --port 8000
"""
from __future__ import annotations

import argparse
import io
import json
import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.models import scene as scene_lib
from taichi_3d_gaussian_splatting_tpu.models.scene import SceneConfig, merge_scenes
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    Camera,
    RasterizerConfig,
    rasterize,
)

TILE = 32


def _np_quat_multiply(a, b):
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ], axis=-1)


def _np_quat_rotate(q, v):
    qv = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * np.cross(qv, v)
    return v + w * t + np.cross(qv, t)


def _np_quat_conj(q):
    return q * np.asarray([-1.0, -1.0, -1.0, 1.0], q.dtype)


@dataclass
class VisualizerConfig:
    """Reference GaussianPointVisualizerConfig (:26-40)."""

    parquet_paths: List[str] = field(default_factory=list)
    image_height: int = 544
    image_width: int = 992
    camera_intrinsics: Optional[np.ndarray] = None
    step_size: float = 0.1
    mouse_sensitivity: float = 3.0
    port: int = 8000

    def __post_init__(self):
        if self.camera_intrinsics is None:
            self.camera_intrinsics = np.asarray(
                [[500.0, 0.0, self.image_width / 2],
                 [0.0, 500.0, self.image_height / 2],
                 [0.0, 0.0, 1.0]], np.float32)


class GaussianPointVisualizer:
    """State machine of the reference GaussianPointVisualizer (:43-290)."""

    def __init__(self, config: VisualizerConfig):
        self.config = config
        h = config.image_height - config.image_height % TILE
        w = config.image_width - config.image_width % TILE
        self.height, self.width = h, w
        scenes = [
            scene_lib.from_parquet(p, SceneConfig(max_num_points_ratio=None))
            for p in config.parquet_paths
        ]
        self.num_objects = len(scenes)
        self.object_ranges = []
        off = 0
        self.object_centers = []
        for s in scenes:
            self.object_ranges.append((off, off + s.capacity))
            self.object_centers.append(np.asarray(s.xyz).mean(axis=0))
            off += s.capacity
        self.scene = merge_scenes(scenes) if len(scenes) > 1 else scenes[0]
        if len(scenes) == 1:
            self.object_ranges = [(0, self.scene.capacity)]

        k = self.num_objects
        # per-object camera pose arrays (reference state :55-104): entry i
        # is the pose used for points with object_id == i
        self.q = np.tile(np.asarray([0, 0, 0, 1], np.float32), (k, 1))
        self.t = np.zeros((k, 3), np.float32)
        self.selected = 0  # 0 = camera, 1..k = object
        self.lock = threading.Lock()

        self.K = jnp.asarray(config.camera_intrinsics, jnp.float32)
        rcfg = RasterizerConfig(
            tile_size=TILE, rgb_only=True,
            interpret=jax.devices()[0].platform == "cpu",
        )
        camera = Camera(K=self.K, width=w, height=h)
        scene = self.scene

        def render(q, t, invalid):
            out = rasterize(
                scene.xyz, scene.features, invalid, q, t, camera, rcfg,
                sh_max_band=3, point_object_id=scene.object_id,
            )
            return jnp.clip(out.rgb, 0.0, 1.0)

        self._render = jax.jit(render)
        self._invalid = np.asarray(self.scene.invalid).copy()

    # -- event handling (reference :116-270) --------------------------------

    def _selection(self):
        if self.selected == 0:
            return np.arange(self.num_objects), 1.0
        return np.asarray([self.selected - 1]), -1.0

    def handle_key(self, key: str) -> None:
        with self.lock:
            sel, move_factor = self._selection()
            step = self.config.step_size
            if key.isdigit():
                idx = int(key)
                if idx <= self.num_objects:
                    self.selected = idx
                return
            if key in ("w", "s", "a", "d", "-", "="):
                axis = {"w": 2, "s": 2, "a": 0, "d": 0, "-": 1, "=": 1}[key]
                sign = {"w": 1, "s": -1, "a": -1, "d": 1, "-": 1, "=": -1}[key]
                delta = np.zeros((len(sel), 3), np.float32)
                delta[:, axis] = step * sign * move_factor
                self.t[sel] += _np_quat_rotate(self.q[sel], delta)
            elif key in ("q", "e"):
                sign = -1.0 if key == "q" else 1.0
                half = sign * step / 2 * move_factor
                dq = np.zeros((len(sel), 4), np.float32)
                dq[:, 3] = np.cos(half)
                dq[:, 1] = np.sin(half)
                qn = _np_quat_multiply(self.q[sel], dq)
                self.q[sel] = qn / np.linalg.norm(qn, axis=-1, keepdims=True)
            elif key == "h":
                lo, hi = self._selected_range()
                self._invalid[lo:hi] = True
            elif key == "p":
                lo, hi = self._selected_range()
                self._invalid[lo:hi] = False

    def _selected_range(self):
        if self.selected == 0:
            return 0, self.scene.capacity
        return self.object_ranges[self.selected - 1]

    def handle_drag(self, dx: float, dy: float) -> None:
        """Mouse orbit (reference :211-270): rotates the camera, or spins
        the selected object about its own center."""
        with self.lock:
            sel, _ = self._selection()
            angle_x = dx * self.config.mouse_sensitivity
            angle_y = dy * self.config.mouse_sensitivity
            object_selected = self.selected != 0
            if object_selected:
                center = self.object_centers[self.selected - 1][None]
                cam_to_center = _np_quat_rotate(
                    _np_quat_conj(self.q[sel]), center - self.t[sel])
            for angle, axis in ((angle_y, 1), (angle_x, 0)):
                dq = np.zeros((len(sel), 4), np.float32)
                dq[:, 3] = np.cos(angle / 2)
                dq[:, axis] = np.sin(angle / 2)
                qn = _np_quat_multiply(self.q[sel], dq)
                self.q[sel] = qn / np.linalg.norm(qn, axis=-1, keepdims=True)
            if object_selected:
                new_center = _np_quat_rotate(self.q[sel], cam_to_center)
                self.t[sel] = center - new_center

    # -- rendering ------------------------------------------------------------

    def frame_jpeg(self) -> bytes:
        from PIL import Image

        with self.lock:
            q = jnp.asarray(self.q)
            t = jnp.asarray(self.t)
            invalid = jnp.asarray(self._invalid)
        rgb = np.asarray(self._render(q, t, invalid))
        img = Image.fromarray((rgb * 255).astype(np.uint8), "RGB")
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=90)
        return buf.getvalue()


_PAGE = """<!doctype html><html><head><title>3DGS viewer</title><style>
body{margin:0;background:#111;color:#ccc;font-family:monospace}
#hud{position:fixed;top:4px;left:8px}</style></head><body>
<div id=hud>WASD/QE move/rotate &middot; drag orbits &middot; 0-9 select
scene &middot; H/P hide/show</div>
<img id=v draggable=false style="display:block;margin:auto"/>
<script>
const img=document.getElementById('v');let drag=null;
async function loop(){img.src='/frame?'+Date.now();}
img.onload=()=>setTimeout(loop,30);
img.onerror=()=>setTimeout(loop,1000);  // keep polling through hiccups
loop();
async function ev(b){await fetch('/event',{method:'POST',body:JSON.stringify(b)})}
window.onkeydown=e=>ev({key:e.key.toLowerCase()});
img.onmousedown=e=>drag=[e.clientX,e.clientY];
window.onmouseup=()=>drag=null;
window.onmousemove=e=>{if(!drag)return;
  /* clientY grows DOWN; the reference ti.GUI cursor frame grows UP, so
     the vertical drag flips sign to preserve its orbit direction */
  ev({dx:-(e.clientY-drag[1])/img.height,dy:(e.clientX-drag[0])/img.width});
  drag=[e.clientX,e.clientY];};
</script></body></html>"""


def make_server(vis: GaussianPointVisualizer, port: int,
                host: str = "127.0.0.1") -> ThreadingHTTPServer:
    """Build the HTTP server (port 0 = ephemeral; tests bind that way and
    read the actual port from ``server.server_address``)."""
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path.startswith("/frame"):
                data = vis.frame_jpeg()
                self.send_response(200)
                self.send_header("Content-Type", "image/jpeg")
                self.end_headers()
                self.wfile.write(data)
            else:
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(_PAGE.encode())

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n) or "{}")
            if "key" in body:
                vis.handle_key(body["key"])
            elif "dx" in body:
                vis.handle_drag(float(body["dx"]), float(body["dy"]))
            self.send_response(204)
            self.end_headers()

    # loopback by default: the server exposes unauthenticated scene
    # control/render; reach it over SSH port-forwarding, or opt in to a
    # wider bind with --host
    return ThreadingHTTPServer((host, port), Handler)


def serve(vis: GaussianPointVisualizer, port: int,
          host: str = "127.0.0.1") -> None:
    server = make_server(vis, port, host)
    print(f"viewer at http://localhost:{server.server_address[1]}/ "
          f"(bound to {host})")
    server.serve_forever()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--parquet_path_list", type=str, nargs="+",
                        required=True)
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--host", type=str, default="127.0.0.1",
                        help="bind address (default loopback; the viewer "
                        "is unauthenticated — prefer SSH port-forwarding "
                        "over 0.0.0.0)")
    parser.add_argument("--ftgmm", action="store_true", default=False,
                        help="run the GMM Fourier analysis at startup "
                             "(reference visualizer.py:107)")
    args = parser.parse_args()
    config = VisualizerConfig(parquet_paths=args.parquet_path_list,
                              port=args.port)
    vis = GaussianPointVisualizer(config)
    if args.ftgmm:
        from taichi_3d_gaussian_splatting_tpu.tools.ftgmm import ft_grab_scene

        print("ftgmm:", ft_grab_scene(vis.scene))
    serve(vis, args.port, host=args.host)


if __name__ == "__main__":
    main()
