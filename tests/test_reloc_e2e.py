"""Hard relocalization e2e (Tracking::Relocalization,
src/Tracking.cc:3452-3610): build a large map around a ring, then
teleport the camera back to the START region — far from every recent
keyframe — and require recovery through the keyframe-database +
PnP + projection-escalation path (recency candidates cannot match)."""

import numpy as np
import pytest

from orbslam3_cpp_fork_tpu.datasets import synthetic
from orbslam3_cpp_fork_tpu.ops.camera import Camera
from orbslam3_cpp_fork_tpu.ops.orb import OrbParams
from orbslam3_cpp_fork_tpu.runtime.tracker import Tracker, TrackerConfig, TrackState

pytestmark = pytest.mark.slow


def test_relocalize_far_from_recent():
    scene = synthetic.make_ring_scene(seed=23, n_points=900, size_range=(9, 15))
    n_map = 190
    # Cover most of the ring so the revisit region is far (in keyframes
    # and in angle) from the final tracked position.
    Rs, ts = synthetic.circle_trajectory(
        n_frames=n_map, radius=2.5, total_angle=1.75 * np.pi
    )
    cam = Camera.pinhole(
        scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2]
    )
    cfg = TrackerConfig(
        async_mapping=False,  # deterministic regression gate
        camera=cam, width=scene.width, height=scene.height,
        orb=OrbParams(n_features=1000),
        enable_loop_closing=True,
        time_recently_lost=5.0,
    )
    tracker = Tracker(cfg)
    stamps = np.arange(n_map + 30) * 0.05
    for i in range(n_map):
        img = synthetic.render_frame(scene, Rs[i], ts[i])
        tracker.track(img, float(stamps[i]))
    assert tracker.state == TrackState.OK
    n_kf = tracker.map.n_keyframes()
    assert n_kf >= 40, n_kf

    # Teleport: jump back to the trajectory start (angularly ~315 deg
    # away from the current position — none of the recent keyframes see
    # this region).
    tp = 6
    recovered_at = None
    for j in range(30):
        img = synthetic.render_frame(scene, Rs[tp], ts[tp])
        tracker.track(img, float(stamps[n_map + j]))
        if tracker.state == TrackState.OK and j >= 1:
            recovered_at = j
            break
    assert recovered_at is not None, "never relocalized after teleport"
    assert recovered_at <= 10, recovered_at

    # Recovered pose must match the teleport target's ground truth, up
    # to the map's monocular scale: compare viewing direction + position
    # against GT via the already-tracked trajectory scale.
    ts_est, Twc = tracker.export_trajectory()
    from orbslam3_cpp_fork_tpu.utils.evaluation import align_umeyama, ate_rmse

    gt_pos = np.stack([-(R.T @ t) for R, t in zip(Rs, ts)])
    res = ate_rmse(ts_est, Twc[:, :3, 3], stamps[:n_map], gt_pos)
    assert res.rmse_scaled < 0.2, res
    # The relocated frame pose: current tracker frame vs GT of pose tp,
    # compared in the Umeyama-aligned frame of the pre-teleport segment
    # (timestamp-associated).
    idx = {round(float(t), 6): i for i, t in enumerate(stamps[:n_map])}
    sel_e, sel_g = [], []
    for i, t in enumerate(ts_est):
        j = idx.get(round(float(t), 6))
        if j is not None:
            sel_e.append(i)
            sel_g.append(j)
    s, Ra, ta = align_umeyama(Twc[sel_e, :3, 3], gt_pos[sel_g], True)
    cur = tracker.last
    c_est = -cur.R.T @ cur.t
    c_est_aligned = s * (Ra @ c_est) + ta
    assert np.linalg.norm(c_est_aligned - gt_pos[tp]) < 0.3, (
        c_est_aligned, gt_pos[tp],
    )
