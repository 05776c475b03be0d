"""Visualizer behavioral tests (reference visualizer.py:106-290 semantics).

Drives GaussianPointVisualizer directly on CPU (interpret-mode kernels,
tiny 64x64 viewport, two small parquets): keyboard/drag state machines per
selected object, hide/show invalid-mask ranges, JPEG framing, and one HTTP
GET/POST round-trip against the real server on an ephemeral port.
"""
import io
import json
import threading
import urllib.request

import numpy as np
import pandas as pd
import pytest

from taichi_3d_gaussian_splatting_tpu.apps.visualizer import (
    GaussianPointVisualizer,
    VisualizerConfig,
    _np_quat_conj,
    _np_quat_rotate,
    make_server,
)


def _write_parquet(path, n, seed, color):
    """Raw COLMAP-style parquet with points in front of the default camera
    (z forward, origin camera): z in [2, 4], xy in [-1, 1]."""
    rng = np.random.default_rng(seed)
    pts = np.stack([
        rng.uniform(-1.0, 1.0, n), rng.uniform(-1.0, 1.0, n),
        rng.uniform(2.0, 4.0, n),
    ], axis=-1)
    rgb = np.tile(np.asarray(color, np.float64)[None], (n, 1))
    pd.DataFrame({
        "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
        "r": rgb[:, 0], "g": rgb[:, 1], "b": rgb[:, 2],
    }).to_parquet(path)


@pytest.fixture(scope="module")
def vis(tmp_path_factory):
    d = tmp_path_factory.mktemp("vis")
    a, b = d / "a.parquet", d / "b.parquet"
    _write_parquet(a, 24, 0, (220, 40, 40))
    _write_parquet(b, 16, 1, (40, 220, 40))
    cfg = VisualizerConfig(
        parquet_paths=[str(a), str(b)],
        image_height=64, image_width=64,
        camera_intrinsics=np.asarray(
            [[60.0, 0.0, 32.0], [0.0, 60.0, 32.0], [0.0, 0.0, 1.0]],
            np.float32),
    )
    return GaussianPointVisualizer(cfg)


@pytest.fixture(autouse=True)
def _reset(vis):
    """Each test starts from the home state (module-scoped vis: the jitted
    render compile is the expensive part, shared across tests)."""
    vis.q = np.tile(np.asarray([0, 0, 0, 1], np.float32),
                    (vis.num_objects, 1))
    vis.t = np.zeros((vis.num_objects, 3), np.float32)
    vis.selected = 0
    vis._invalid = np.asarray(vis.scene.invalid).copy()
    yield


class TestKeyboard:
    def test_digit_selects_object(self, vis):
        vis.handle_key("1")
        assert vis.selected == 1
        vis.handle_key("0")
        assert vis.selected == 0
        # out-of-range digits are ignored (reference: keys map to loaded
        # scenes only)
        vis.handle_key("7")
        assert vis.selected == 0

    def test_w_moves_camera_all_objects(self, vis):
        vis.handle_key("w")
        # camera selected: every per-object pose advances +step along z
        np.testing.assert_allclose(
            vis.t, np.tile([0.0, 0.0, vis.config.step_size], (2, 1)),
            atol=1e-6)

    def test_w_moves_selected_object_with_sign_flip(self, vis):
        vis.handle_key("2")
        vis.handle_key("w")
        # object selected: only its row moves, with the reference's
        # move_factor sign flip (visualizer.py:115)
        np.testing.assert_allclose(
            vis.t[1], [0.0, 0.0, -vis.config.step_size], atol=1e-6)
        np.testing.assert_allclose(vis.t[0], 0.0, atol=0)

    def test_qe_rotate_unit_quaternion(self, vis):
        vis.handle_key("e")
        assert not np.allclose(vis.q[0], [0, 0, 0, 1])
        np.testing.assert_allclose(
            np.linalg.norm(vis.q, axis=-1), 1.0, atol=1e-6)
        vis.handle_key("q")  # inverse rotation restores the home pose
        np.testing.assert_allclose(vis.q[0], [0, 0, 0, 1], atol=1e-6)

    def test_hide_show_selected_object_range(self, vis):
        vis.handle_key("2")
        vis.handle_key("h")
        lo, hi = vis.object_ranges[1]
        assert vis._invalid[lo:hi].all()
        assert not vis._invalid[:lo].any()
        vis.handle_key("p")
        assert not vis._invalid.any()

    def test_hide_with_camera_selected_hides_everything(self, vis):
        vis.handle_key("h")
        assert vis._invalid.all()


class TestDrag:
    def test_camera_drag_rotates_without_translating(self, vis):
        vis.handle_drag(0.1, -0.05)
        assert not np.allclose(vis.q, [[0, 0, 0, 1]] * 2)
        np.testing.assert_allclose(
            np.linalg.norm(vis.q, axis=-1), 1.0, atol=1e-6)
        np.testing.assert_allclose(vis.t, 0.0, atol=0)

    def test_object_drag_spins_about_its_center(self, vis):
        """The object's center must stay fixed in the camera frame
        (reference :211-270: orbiting a selected object re-translates so
        the spin is about the object center)."""
        vis.handle_key("1")
        center = vis.object_centers[0]
        before = _np_quat_rotate(_np_quat_conj(vis.q[0]),
                                 center - vis.t[0])
        vis.handle_drag(0.2, 0.1)
        after = _np_quat_rotate(_np_quat_conj(vis.q[0]),
                                center - vis.t[0])
        np.testing.assert_allclose(after, before, atol=1e-5)
        np.testing.assert_allclose(vis.t[1], 0.0, atol=0)  # other object


class TestFrames:
    def test_frame_jpeg_decodable_and_reacts_to_state(self, vis):
        from PIL import Image

        f1 = vis.frame_jpeg()
        img = Image.open(io.BytesIO(f1))
        assert img.size == (vis.width, vis.height)
        base = np.asarray(img.convert("RGB"), np.float32)
        assert base.max() > 0  # the scene is actually in view
        vis.handle_key("h")  # hide everything
        f2 = vis.frame_jpeg()
        blank = np.asarray(
            Image.open(io.BytesIO(f2)).convert("RGB"), np.float32)
        assert np.abs(base - blank).max() > 10


class TestHTTP:
    def test_get_post_roundtrip(self, vis):
        server = make_server(vis, 0)
        port = server.server_address[1]
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        try:
            page = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=30).read()
            assert b"3DGS viewer" in page
            frame = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/frame", timeout=60).read()
            assert frame[:2] == b"\xff\xd8"  # JPEG SOI
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/event",
                data=json.dumps({"key": "2"}).encode(), method="POST")
            assert urllib.request.urlopen(req, timeout=30).status == 204
            assert vis.selected == 2
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/event",
                data=json.dumps({"dx": 0.1, "dy": 0.0}).encode(),
                method="POST")
            urllib.request.urlopen(req, timeout=30)
            assert not np.allclose(vis.q[1], [0, 0, 0, 1])
        finally:
            server.shutdown()
            server.server_close()
            thread.join(timeout=10)
