"""Stereo loop closing end-to-end: a stereo rig circles a ring scene
and revisits its start; the loop must close through the SE3 (fix_scale)
essential graph and global BA must keep the trajectory metric and
consistent — the reference's stereo loop path (src/LoopClosing.cc:1062
with mbFixScale=true) that round-2 review flagged as untested at
trajectory level.
"""

import numpy as np
import pytest

from orbslam3_cpp_fork_tpu.datasets import synthetic
from orbslam3_cpp_fork_tpu.ops.camera import Camera
from orbslam3_cpp_fork_tpu.ops.orb import OrbParams
from orbslam3_cpp_fork_tpu.runtime.tracker import (
    Sensor, Tracker, TrackerConfig, TrackState,
)
from orbslam3_cpp_fork_tpu.utils.evaluation import ate_rmse

pytestmark = pytest.mark.slow

BASELINE = 0.2


@pytest.fixture(scope="module")
def stereo_loop_run():
    scene = synthetic.make_ring_scene(
        seed=13, n_points=900, size_range=(9, 15)
    )
    n = 110
    Rs, ts = synthetic.circle_trajectory(
        n_frames=n, radius=2.5, total_angle=2.3 * np.pi
    )
    cam = Camera.pinhole(
        scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2]
    )
    fx = float(scene.K[0, 0])
    cfg = TrackerConfig(
        async_mapping=False,  # deterministic regression gate
        camera=cam, width=scene.width, height=scene.height,
        sensor=Sensor.STEREO, orb=OrbParams(n_features=1000),
        bf=BASELINE * fx, th_depth=BASELINE * 40.0,
        enable_loop_closing=True,
    )
    tracker = Tracker(cfg)
    assert tracker.loop_closer.cfg.fix_scale  # SE3 essential graph
    stamps = np.arange(n) * 0.05
    poses = []
    for i in range(n):
        img_l = synthetic.render_frame(scene, Rs[i], ts[i])
        Rr, tr = synthetic.stereo_right_pose(Rs[i], ts[i], BASELINE)
        img_r = synthetic.render_frame(scene, Rr, tr)
        poses.append(tracker.track_stereo(img_l, img_r, float(stamps[i])))
    return tracker, stamps, poses, Rs, ts


def test_stereo_loop_closes(stereo_loop_run):
    tracker, stamps, poses, Rs, ts = stereo_loop_run
    assert tracker.state == TrackState.OK
    assert sum(p is not None for p in poses) > 90
    assert tracker.loop_closer.n_loops_closed >= 1


def test_stereo_loop_trajectory_metric(stereo_loop_run):
    """After the SE3 essential graph + global BA the exported trajectory
    must be metric (unit-scale RMSE, no scale alignment allowed) and
    consistent around the whole ring."""
    tracker, stamps, poses, Rs, ts = stereo_loop_run
    ts_est, Twc = tracker.export_trajectory()
    assert len(ts_est) > 90
    res = ate_rmse(ts_est, Twc[:, :3, 3], stamps, ts)
    # Metric claim: unit-scale RMSE on the ~15.7 m ring.
    assert res.rmse < 0.25, res
    # The optimal scale must be ~1 (stereo fixes scale; a mono-style
    # scale drift would show up here).
    assert abs(res.scale - 1.0) < 0.05, res
