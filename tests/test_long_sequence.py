"""Long-sequence regression: two full circles of a ring scene with
image noise — exercises sustained keyframe insertion + culling, codebook
saturation, repeated revisits (loop detection on the second lap), and
trajectory export at scale. This is the long-horizon behavior the
per-feature e2e tests (40-120 frames) cannot see: capacity pressure,
cull policy, and drift accumulation over ~720 degrees of travel
(reference equivalent: a full EuRoC sequence through the examples +
evaluate_ate_scale.py, SURVEY.md §4)."""

import numpy as np
import pytest

from orbslam3_cpp_fork_tpu.datasets import synthetic
from orbslam3_cpp_fork_tpu.ops.camera import Camera
from orbslam3_cpp_fork_tpu.ops.orb import OrbParams
from orbslam3_cpp_fork_tpu.runtime.tracker import Tracker, TrackerConfig, TrackState
from orbslam3_cpp_fork_tpu.utils.evaluation import ate_rmse

pytestmark = pytest.mark.slow

N_FRAMES = 560


@pytest.fixture(scope="module")
def long_run():
    scene = synthetic.make_ring_scene(
        seed=11, n_points=1600, size_range=(8, 14), width=640, height=480
    )
    Rs, ts = synthetic.circle_trajectory(
        n_frames=N_FRAMES, radius=2.5, total_angle=4.3 * np.pi
    )
    cam = Camera.pinhole(
        scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2]
    )
    cfg = TrackerConfig(
        async_mapping=False,  # deterministic regression gate
        camera=cam, width=scene.width, height=scene.height,
        orb=OrbParams(n_features=800),
        enable_loop_closing=True,
    )
    tracker = Tracker(cfg)
    rng = np.random.default_rng(3)
    stamps = np.arange(N_FRAMES) * 0.05
    n_tracked = 0
    for i in range(N_FRAMES):
        img = synthetic.render_frame(scene, Rs[i], ts[i])
        img = np.clip(img + rng.normal(0, 3.0, img.shape), 0, 255).astype(
            np.float32
        )
        if tracker.track(img, float(stamps[i])) is not None:
            n_tracked += 1
    return tracker, stamps, Rs, ts, n_tracked


def test_long_sequence_survives(long_run):
    tracker, stamps, Rs, ts, n_tracked = long_run
    assert tracker.state == TrackState.OK
    assert n_tracked > 0.88 * N_FRAMES, n_tracked


def test_long_sequence_revisit_closes_loop(long_run):
    """The second lap re-observes the first: the online codebook +
    Sim3 validation must fire at least one loop correction."""
    tracker, *_ = long_run
    assert tracker.loop_closer.n_loops_closed >= 1


def test_long_sequence_culling_bounds_map(long_run):
    """KeyFrameCulling keeps the map sublinear in trajectory length on a
    revisit-heavy path (the second lap adds little new structure)."""
    tracker, *_ = long_run
    n_kf = tracker.map.n_keyframes()
    assert n_kf < 0.45 * N_FRAMES, n_kf
    assert tracker.map.n_landmarks() < tracker.map.cfg.max_landmarks


def test_long_sequence_ate(long_run):
    tracker, stamps, Rs, ts, _ = long_run
    ts_est, Twc = tracker.export_trajectory()
    assert len(ts_est) > 0.85 * N_FRAMES
    gt_pos = np.stack([-(R.T @ t) for R, t in zip(Rs, ts)])
    res = ate_rmse(ts_est, Twc[:, :3, 3], stamps, gt_pos)
    # ~31 m of travel around a 2.5 m circle, mono scale-aligned.
    assert res.rmse_scaled < 0.12, res
