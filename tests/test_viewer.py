"""Offline viewer exports (utils/viewer): the headless analog of the
reference's Viewer/FrameDrawer/MapDrawer (src/Viewer.cc, src/FrameDrawer.cc,
src/MapDrawer.cc)."""

import os
import zlib

import numpy as np

from orbslam3_cpp_fork_tpu.utils import viewer


def test_save_png_roundtrip(tmp_path):
    img = (np.arange(40 * 60).reshape(40, 60) % 251).astype(np.uint8)
    p = tmp_path / "x.png"
    viewer.save_png(str(p), img)
    data = p.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    # PIL should be able to read it back exactly.
    from PIL import Image

    back = np.asarray(Image.open(p))
    assert np.array_equal(back, img)


def test_draw_frame_overlay(tmp_path):
    img = np.zeros((100, 120), np.float32)
    xy = np.array([[20, 30], [60, 50], [200, 300]], np.float32)  # last OOB
    valid = np.array([True, True, True])
    tracked = np.array([True, False, False])
    rgb = viewer.draw_frame(img, xy, valid, tracked, state="OK")
    assert rgb.shape == (118, 120, 3)
    # tracked keypoint drawn green, untracked blue
    assert (rgb[27:34, 17:24, 1] > 200).any()
    assert (rgb[47:54, 57:64, 2] > 200).any()
    viewer.save_png(str(tmp_path / "f.png"), rgb)


def test_map_exports(tmp_path):
    pts = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    mask = np.ones(50, bool)
    mask[40:] = False
    traj = np.cumsum(np.ones((8, 3), np.float32) * 0.1, axis=0)
    ply = tmp_path / "m.ply"
    html = tmp_path / "m.html"
    viewer.export_map_ply(str(ply), pts, traj, point_mask=mask)
    viewer.export_map_html(str(html), pts, traj, point_mask=mask)
    text = ply.read_text()
    assert "element vertex 48" in text  # 40 masked points + 8 kfs
    h = html.read_text()
    assert "landmarks" in h and '"traj"' in h


def test_system_viewer_writes_outputs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from orbslam3_cpp_fork_tpu.datasets import synthetic
    from orbslam3_cpp_fork_tpu.ops.camera import Camera
    from orbslam3_cpp_fork_tpu.runtime.system import System
    from orbslam3_cpp_fork_tpu.runtime.tracker import Sensor
    from orbslam3_cpp_fork_tpu.utils.settings import Settings

    W, H = 320, 240
    s = Settings(
        camera_type="PinHole",
        camera=Camera.pinhole(260.0, 260.0, W / 2, H / 2),
        width=W, height=H, fps=20.0, rgb=False,
        n_features=256, scale_factor=1.2, n_levels=4,
        ini_th_fast=20, min_th_fast=7,
    )
    slam = System(s, Sensor.MONOCULAR, use_viewer=True)
    scene = synthetic.make_scene(n_points=900, width=W, height=H, fx=260.0, seed=1)
    for i in range(4):
        t = i * 0.05
        R = np.eye(3, dtype=np.float32)
        pos = np.array([0.06 * i, 0.0, 0.0], np.float32)
        img = synthetic.render_frame(scene, R, pos)
        slam.track_monocular(img, t)
    slam.shutdown()
    assert os.path.exists("viewer_out/map.ply")
    assert os.path.exists("viewer_out/map.html")
    assert os.path.exists("viewer_out/frame_000000.png")


def test_live_viewer_endpoints():
    """Live viewer (utils/live_viewer): HTTP analog of the Pangolin
    viewer thread (src/System.cc:259, src/Viewer.cc:156). Serves the
    page, the annotated frame, and the map state."""
    import json
    import urllib.request

    from orbslam3_cpp_fork_tpu.utils.live_viewer import LiveViewer

    lv = LiveViewer(port=0)
    try:
        img = np.zeros((60, 80), np.float32)
        xy = np.array([[10, 10], [40, 30]], np.float32)
        lv.push_frame(
            img, xy, np.array([True, True]), np.array([True, False]),
            "OK", 7,
        )
        lv.state_provider = lambda: {
            "points": np.array([[0, 0, 5.0], [1, 1, 6.0]], np.float32),
            "traj": np.array([[0, 0, 0], [0.1, 0, 0]], np.float32),
            "n_keyframes": 2, "n_landmarks": 2, "n_loops": 0,
        }
        page = urllib.request.urlopen(lv.url, timeout=10).read()
        assert b"state.json" in page
        png = urllib.request.urlopen(lv.url + "frame.png", timeout=10).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        state = json.loads(
            urllib.request.urlopen(lv.url + "state.json", timeout=10).read()
        )
        assert state["state"] == "OK" and state["frame_id"] == 7
        assert len(state["points"]) == 2 and len(state["traj"]) == 2
    finally:
        lv.stop()


def test_live_viewer_in_system():
    """System(live_viewer=True) serves live map state while tracking."""
    import json
    import urllib.request

    from orbslam3_cpp_fork_tpu.datasets import synthetic
    from orbslam3_cpp_fork_tpu.ops.camera import Camera
    from orbslam3_cpp_fork_tpu.runtime.system import Sensor, System
    from orbslam3_cpp_fork_tpu.utils.settings import Settings

    W, H = 320, 240
    s = Settings(
        camera_type="PinHole",
        camera=Camera.pinhole(260.0, 260.0, W / 2, H / 2),
        width=W, height=H, fps=20.0, rgb=False,
        n_features=256, scale_factor=1.2, n_levels=4,
        ini_th_fast=20, min_th_fast=7,
    )
    slam = System(s, Sensor.MONOCULAR, live_viewer=True)
    url = slam.live_viewer.url
    scene = synthetic.make_scene(n_points=900, width=W, height=H, fx=260.0, seed=1)
    for i in range(4):
        img = synthetic.render_frame(
            scene, np.eye(3, dtype=np.float32),
            np.array([0.06 * i, 0.0, 0.0], np.float32),
        )
        slam.track_monocular(img, i * 0.05)
    state = json.loads(
        urllib.request.urlopen(url + "state.json", timeout=10).read()
    )
    assert state["frame_id"] >= 0
    slam.shutdown()
