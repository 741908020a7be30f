"""Atlas multi-map: unrecoverable tracking loss spawns a new map
(CreateMapInAtlas); when the new map revisits the old one's territory,
place recognition proposes a merge and the maps are welded through the
validated Sim3 (LoopClosing::MergeLocal). The exported trajectory must
be consistent across the merge (keyframe aliases resolved)."""

import numpy as np
import pytest

from orbslam3_cpp_fork_tpu.datasets import synthetic
from orbslam3_cpp_fork_tpu.ops.camera import Camera
from orbslam3_cpp_fork_tpu.ops.orb import OrbParams
from orbslam3_cpp_fork_tpu.runtime.tracker import Tracker, TrackerConfig, TrackState
from orbslam3_cpp_fork_tpu.utils.evaluation import ate_rmse

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def merged_run():
    scene = synthetic.make_ring_scene(seed=11, n_points=900, size_range=(9, 15))
    n_frames = 120
    Rs, ts = synthetic.circle_trajectory(
        n_frames=n_frames, radius=2.5, total_angle=2.5 * np.pi
    )
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
        # Collapse the RECENTLY_LOST grace window (reference default 5 s,
        # Tracking.cc:71) so the 8-frame blind stretch falls through to
        # LOST and spawns the second Atlas map within this short run.
        time_recently_lost=0.15,
    )
    tracker = Tracker(cfg)
    tracker.reloc_patience = 3
    stamps = np.arange(n_frames) * 0.05
    blank = np.full((scene.height, scene.width), 35.0, np.float32)
    max_maps_seen = 1
    poses = []
    for i in range(n_frames):
        # Blind the camera for 8 frames mid-loop: forces LOST, and the
        # scene has moved on by the time vision returns -> new Atlas map.
        img = blank if 40 <= i < 48 else synthetic.render_frame(scene, Rs[i], ts[i])
        poses.append(tracker.track(img, float(stamps[i])))
        max_maps_seen = max(max_maps_seen, tracker.atlas.n_maps())
    return tracker, stamps, poses, Rs, ts, max_maps_seen


def test_new_map_spawned_then_merged(merged_run):
    tracker, stamps, poses, Rs, ts, max_maps_seen = merged_run
    assert max_maps_seen >= 2, "expected a second Atlas map after blinding"
    assert tracker.loop_closer.n_merges >= 1, "expected a map merge"
    assert tracker.atlas.n_maps() == 1, "maps should be welded back into one"
    assert tracker.state == TrackState.OK


def test_trajectory_consistent_across_merge(merged_run):
    tracker, stamps, poses, Rs, ts, max_maps_seen = merged_run
    ts_est, Twc = tracker.export_trajectory()
    # Tracked both segments (~40 before blinding, ~55+ after).
    assert len(ts_est) > 80, len(ts_est)
    res = ate_rmse(ts_est, Twc[:, :3, 3], stamps, ts)
    # Both segments must live in ONE consistent frame after the merge.
    assert res.rmse_scaled < 0.15, res
