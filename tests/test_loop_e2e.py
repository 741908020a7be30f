"""End-to-end loop closure: a monocular camera circles inside a ring
scene (360 deg + overlap), accumulating drift; on revisiting the start
the loop closer must detect the loop, apply the Sim3 correction +
essential-graph optimization, and leave a consistent trajectory.

This is the regression the reference validates manually on EuRoC via
evaluate_ate_scale.py (SURVEY.md §4); here ground truth is exact.
"""

import logging

import numpy as np
import pytest

from orbslam3_cpp_fork_tpu.datasets import synthetic
from orbslam3_cpp_fork_tpu.ops.camera import Camera
from orbslam3_cpp_fork_tpu.ops.orb import OrbParams
from orbslam3_cpp_fork_tpu.runtime.tracker import Tracker, TrackerConfig, TrackState
from orbslam3_cpp_fork_tpu.utils.evaluation import ate_rmse

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def loop_run():
    logging.getLogger("orbslam3_tpu.loop").setLevel(logging.INFO)
    scene = synthetic.make_ring_scene(seed=11, n_points=900, size_range=(9, 15))
    n_frames = 110
    Rs, ts = synthetic.circle_trajectory(
        n_frames=n_frames, radius=2.5, total_angle=2.3 * np.pi
    )
    frames = synthetic.render_sequence(scene, Rs, ts)
    cam = Camera.pinhole(
        scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2]
    )
    cfg = TrackerConfig(
        async_mapping=False,  # deterministic regression gate
        camera=cam,
        width=scene.width,
        height=scene.height,
        orb=OrbParams(n_features=1000),
        enable_loop_closing=True,
    )
    tracker = Tracker(cfg)
    stamps = np.arange(n_frames) * 0.05
    poses = []
    for i, f in enumerate(frames):
        poses.append(tracker.track(f, float(stamps[i])))
    return tracker, stamps, poses, Rs, ts


def test_loop_closed(loop_run):
    tracker, stamps, poses, Rs, ts = loop_run
    assert tracker.state == TrackState.OK
    n_tracked = sum(p is not None for p in poses)
    assert n_tracked > 90, n_tracked
    assert tracker.loop_closer is not None
    assert tracker.loop_closer.n_loops_closed >= 1


def test_trajectory_consistent_after_loop(loop_run):
    tracker, stamps, poses, Rs, ts = loop_run
    ts_est, Twc = tracker.export_trajectory()
    assert len(ts_est) > 90
    res = ate_rmse(ts_est, Twc[:, :3, 3], stamps, ts)
    # Mono scale-aligned ATE on the ~16m loop. Measured: 0.038 with loop
    # closing vs 0.062 without — the correction must keep it under 6cm.
    assert res.rmse_scaled < 0.06, res
