"""Stereo matching kernel + stereo/RGB-D tracking regression.

Kernel-level: dense row-banded stereo match (ops/stereo.py) recovers
metric depth on a rendered stereo pair (the missing-middle test the
reference never had for Frame::ComputeStereoMatches).

Sequence-level: stereo and RGB-D trackers initialize from one frame and
track with *metric* scale (rmse without scale alignment), unlike mono.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_cpp_fork_tpu.datasets import synthetic
from orbslam3_cpp_fork_tpu.ops import stereo
from orbslam3_cpp_fork_tpu.ops.camera import Camera
from orbslam3_cpp_fork_tpu.ops.orb import OrbParams, extract_orb_jit
from orbslam3_cpp_fork_tpu.runtime.tracker import (
    Sensor,
    Tracker,
    TrackerConfig,
    TrackState,
)
from orbslam3_cpp_fork_tpu.utils.evaluation import ate_rmse

BASELINE = 0.2


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_scene(seed=5, n_points=1500)


def _render_pair(scene, R_wc, t_wc):
    img_l = synthetic.render_frame(scene, R_wc, t_wc)
    Rr, tr = synthetic.stereo_right_pose(R_wc, t_wc, BASELINE)
    img_r = synthetic.render_frame(scene, Rr, tr)
    return img_l, img_r


def test_stereo_match_depth(scene):
    R = np.eye(3, dtype=np.float32)
    t = np.zeros(3, np.float32)
    img_l, img_r = _render_pair(scene, R, t)
    dep_gt = synthetic.render_depth(scene, R, t)
    p = OrbParams(n_features=800)
    fl = extract_orb_jit(jnp.asarray(img_l), p)
    fr = extract_orb_jit(jnp.asarray(img_r), p)
    fx = float(scene.K[0, 0])
    bf = BASELINE * fx
    ur, depth, ok = stereo.compute_stereo_matches(
        jnp.asarray(img_l), jnp.asarray(img_r),
        fl.desc_i8, fl.xy, fl.level, fl.valid,
        fr.desc_i8, fr.xy, fr.level, fr.valid,
        jnp.float32(bf), jnp.float32(BASELINE),
    )
    ok = np.asarray(ok)
    depth = np.asarray(depth)
    xy = np.asarray(fl.xy)
    assert ok.sum() > 200, f"only {ok.sum()} stereo matches"
    # Compare to the rasterized depth at each matched keypoint.
    sel = np.nonzero(ok)[0]
    yi = np.clip(np.round(xy[sel, 1]).astype(int), 0, scene.height - 1)
    xi = np.clip(np.round(xy[sel, 0]).astype(int), 0, scene.width - 1)
    z_gt = dep_gt[yi, xi]
    has_gt = z_gt > 0
    rel = np.abs(depth[sel[has_gt]] - z_gt[has_gt]) / z_gt[has_gt]
    assert np.median(rel) < 0.05, np.median(rel)
    # At least 80% of matches within 10% of true depth.
    assert (rel < 0.10).mean() > 0.8, (rel < 0.10).mean()


@pytest.fixture(scope="module")
def stereo_tracked(scene):
    Rs, ts = synthetic.smooth_trajectory(n_frames=30, step=0.12, yaw_rate=0.002)
    cam = Camera.pinhole(
        scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2]
    )
    fx = float(scene.K[0, 0])
    cfg = TrackerConfig(
        async_mapping=False,  # deterministic regression gate
        camera=cam,
        width=scene.width,
        height=scene.height,
        sensor=Sensor.STEREO,
        orb=OrbParams(n_features=600),
        bf=BASELINE * fx,
        th_depth=BASELINE * 40.0,
    )
    tracker = Tracker(cfg)
    stamps = np.arange(len(Rs)) * 0.05
    poses = []
    for i in range(len(Rs)):
        img_l, img_r = _render_pair(scene, Rs[i], ts[i])
        poses.append(tracker.track_stereo(img_l, img_r, float(stamps[i])))
    return tracker, stamps, poses, Rs, ts


def test_stereo_tracks_metric(stereo_tracked):
    tracker, stamps, poses, Rs, ts = stereo_tracked
    assert tracker.state == TrackState.OK
    n_tracked = sum(p is not None for p in poses)
    assert n_tracked == len(poses), n_tracked  # no init delay with depth
    ts_est, Twc = tracker.export_trajectory()
    res = ate_rmse(ts_est, Twc[:, :3, 3], stamps, ts)
    assert res.n_pairs > 25
    # Stereo is metric: demand UNSCALED ATE below 6 cm and scale ~1.
    assert res.rmse < 0.06, res
    assert abs(res.scale - 1.0) < 0.03, res


def test_rgbd_tracks_metric(scene):
    Rs, ts = synthetic.smooth_trajectory(n_frames=20, step=0.12, yaw_rate=0.002)
    cam = Camera.pinhole(
        scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2]
    )
    fx = float(scene.K[0, 0])
    cfg = TrackerConfig(
        async_mapping=False,  # deterministic regression gate
        camera=cam,
        width=scene.width,
        height=scene.height,
        sensor=Sensor.RGBD,
        orb=OrbParams(n_features=600),
        bf=BASELINE * fx,
        th_depth=BASELINE * 40.0,
        depth_factor=1.0,
    )
    tracker = Tracker(cfg)
    stamps = np.arange(len(Rs)) * 0.05
    n_ok = 0
    for i in range(len(Rs)):
        img = synthetic.render_frame(scene, Rs[i], ts[i])
        dep = synthetic.render_depth(scene, Rs[i], ts[i])
        if tracker.track_rgbd(img, dep, float(stamps[i])) is not None:
            n_ok += 1
    assert tracker.state == TrackState.OK
    assert n_ok == len(Rs)
    ts_est, Twc = tracker.export_trajectory()
    res = ate_rmse(ts_est, Twc[:, :3, 3], stamps, ts)
    assert res.rmse < 0.06, res
    assert abs(res.scale - 1.0) < 0.03, res
