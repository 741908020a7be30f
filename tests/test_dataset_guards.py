"""Timestamp-jump guards and multi-sequence ChangeDataset
(Tracking::Track guards src/Tracking.cc:1794-1827, System::ChangeDataset
src/System.cc:1412-1420)."""

import numpy as np

from orbslam3_cpp_fork_tpu.datasets import synthetic
from orbslam3_cpp_fork_tpu.ops.camera import Camera
from orbslam3_cpp_fork_tpu.runtime.system import System
from orbslam3_cpp_fork_tpu.runtime.tracker import Sensor, TrackState
from orbslam3_cpp_fork_tpu.utils.settings import Settings


def _system(W=320, H=240):
    s = Settings(
        camera_type="PinHole",
        camera=Camera.pinhole(260.0, 260.0, W / 2, H / 2),
        width=W, height=H, fps=20.0, rgb=False,
        n_features=256, scale_factor=1.2, n_levels=4,
        ini_th_fast=20, min_th_fast=7,
    )
    return System(s, Sensor.MONOCULAR)


def _run_frames(slam, scene, t0, n, step=0.05):
    for i in range(n):
        pos = np.array([0.05 * i, 0.0, 0.0], np.float32)
        img = synthetic.render_frame(scene, np.eye(3, dtype=np.float32), pos)
        slam.track_monocular(img, t0 + i * step)


def test_backwards_timestamp_spawns_fresh_start():
    slam = _system()
    scene = synthetic.make_scene(n_points=900, width=320, height=240, fx=260.0, seed=2)
    _run_frames(slam, scene, 10.0, 6)
    map_id_before = slam.tracker.map.map_id
    # A frame 5 seconds in the past must not corrupt the map: the tracker
    # resets (small map) or spawns a new one.
    img = synthetic.render_frame(scene, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
    slam.track_monocular(img, 5.0)
    st = slam.get_tracking_state()
    assert st in (TrackState.NO_IMAGES_YET, TrackState.NOT_INITIALIZED)
    assert slam.tracker.map.n_keyframes() <= 2
    assert slam.tracker.map.map_id >= map_id_before


def test_change_dataset_restarts_cleanly():
    slam = _system()
    scene = synthetic.make_scene(n_points=900, width=320, height=240, fx=260.0, seed=3)
    _run_frames(slam, scene, 0.0, 6)
    slam.change_dataset()
    # Second "sequence" starts at an arbitrary earlier clock; tracking
    # must re-initialize without tripping the timestamp guard.
    scene2 = synthetic.make_scene(n_points=900, width=320, height=240, fx=260.0, seed=4)
    _run_frames(slam, scene2, -100.0, 8)
    # tracker processed all frames without raising and re-initialized
    assert slam.tracker.frame_id == 14
