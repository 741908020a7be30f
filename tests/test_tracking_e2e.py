"""End-to-end monocular SLAM regression on a synthetic sequence:
render -> track -> export trajectory -> ATE vs ground truth.

This is the sequence-level regression the reference runs offline on
EuRoC via evaluate_ate_scale.py (SURVEY.md §4); here the ground truth is
exact because the scene is rendered.
"""

import numpy as np
import pytest

from orbslam3_cpp_fork_tpu.datasets import synthetic
from orbslam3_cpp_fork_tpu.ops.camera import Camera
from orbslam3_cpp_fork_tpu.ops.orb import OrbParams
from orbslam3_cpp_fork_tpu.runtime.tracker import MonoTracker, TrackerConfig, TrackState
from orbslam3_cpp_fork_tpu.utils.evaluation import ate_rmse

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tracked():
    scene = synthetic.make_scene(seed=3)
    Rs, ts = synthetic.smooth_trajectory(n_frames=40, step=0.12, yaw_rate=0.002)
    frames = synthetic.render_sequence(scene, Rs, ts)
    cam = Camera.pinhole(
        scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2]
    )
    cfg = TrackerConfig(
        async_mapping=False,  # deterministic regression gate
        camera=cam,
        width=scene.width,
        height=scene.height,
        orb=OrbParams(n_features=600),
    )
    tracker = MonoTracker(cfg)
    stamps = np.arange(len(frames)) * 0.05
    poses = []
    for i, f in enumerate(frames):
        T = tracker.track(f, float(stamps[i]))
        poses.append(T)
    return tracker, stamps, poses, Rs, ts


def test_initializes_and_tracks(tracked):
    tracker, stamps, poses, Rs, ts = tracked
    assert tracker.state == TrackState.OK
    n_tracked = sum(p is not None for p in poses)
    assert n_tracked > 30, n_tracked
    assert tracker.map.n_keyframes() >= 2
    assert tracker.map.n_landmarks() > 100


def test_ate_vs_ground_truth(tracked):
    tracker, stamps, poses, Rs, ts = tracked
    ts_est, Twc = tracker.export_trajectory()
    assert len(ts_est) > 30
    pos_est = Twc[:, :3, 3]
    res = ate_rmse(ts_est, pos_est, stamps, ts)
    # Trajectory covers ~2.4m; demand scale-aligned ATE below 5cm.
    assert res.n_pairs > 30
    assert res.rmse_scaled < 0.05, res
