"""Stereo rectification precompute (utils/rectify.py).

The reference precomputes rectification with cv::stereoRectify +
cv::initUndistortRectifyMap (Settings::precomputeRectificationMaps,
src/Settings.cc:458-530) and remaps both images per frame
(System::TrackStereo, src/System.cc:282-301). These tests verify the
native replacement geometrically: epipolar rows align, disparity is
positive and metric (z = bf / d), and the inverse maps invert the
forward point transform.
"""

import numpy as np
import pytest

from orbslam3_cpp_fork_tpu.utils import rectify


def _project_raw(X_c, K, dist):
    """Project camera-frame points through the raw distorted pinhole."""
    xn = X_c[:, 0] / X_c[:, 2]
    yn = X_c[:, 1] / X_c[:, 2]
    xd, yd = rectify._distort_radtan(xn, yn, dist)
    u = K[0, 0] * xd + K[0, 2]
    v = K[1, 1] * yd + K[1, 2]
    return np.stack([u, v], axis=-1)


@pytest.fixture(scope="module")
def rig():
    K1 = np.array([[458.0, 0, 367.2], [0, 457.3, 248.4], [0, 0, 1.0]])
    K2 = np.array([[457.6, 0, 379.9], [0, 456.1, 255.2], [0, 0, 1.0]])
    dist1 = np.array([-0.28, 0.074, 1.8e-4, 1.5e-5, 0.0])
    dist2 = np.array([-0.284, 0.076, -1.0e-4, 2.0e-5, 0.0])
    # Camera 2 to the right of camera 1 with a ~1 degree misalignment.
    rot = rectify._rodrigues_inv(np.array([0.004, -0.015, 0.008]))
    T = np.eye(4)
    T[:3, :3] = rot
    T[:3, 3] = [0.110, 0.0004, -0.0008]  # EuRoC-like baseline
    return K1, dist1, K2, dist2, T


def test_rows_align_and_disparity_metric(rig):
    K1, dist1, K2, dist2, T = rig
    r = rectify.stereo_rectify(K1, dist1, K2, dist2, T, (480, 752))

    rng = np.random.default_rng(3)
    X1 = np.stack(
        [
            rng.uniform(-1.5, 1.5, 200),
            rng.uniform(-1.0, 1.0, 200),
            rng.uniform(2.0, 10.0, 200),
        ],
        axis=-1,
    )  # points in raw camera-1 frame
    T_21 = np.linalg.inv(T)
    X2 = X1 @ T_21[:3, :3].T + T_21[:3, 3]

    p1 = _project_raw(X1, K1, dist1)
    p2 = _project_raw(X2, K2, dist2)
    q1 = rectify.rectify_points(p1, K1, dist1, r.R1, r.K_new)
    q2 = rectify.rectify_points(p2, K2, dist2, r.R2, r.K_new)

    # Epipolar rows align after rectification.
    assert np.max(np.abs(q1[:, 1] - q2[:, 1])) < 0.1

    # Positive disparity consistent with metric depth: d = bf / z, with
    # z the depth in the rectified camera-1 frame.
    z_rect = (X1 @ r.R1.T)[:, 2]
    d = q1[:, 0] - q2[:, 0]
    assert np.all(d > 0)
    np.testing.assert_allclose(d, r.bf / z_rect, rtol=1e-3, atol=0.05)


def test_inverse_maps_invert_forward_transform(rig):
    K1, dist1, K2, dist2, T = rig
    r = rectify.stereo_rectify(K1, dist1, K2, dist2, T, (480, 752))
    # Sample interior rectified pixels; map -> raw; forward-rectify the
    # raw coords and require the original pixel back.
    vs, us = np.mgrid[100:400:40, 100:700:60]
    raw = np.stack([r.map1_x[vs, us], r.map1_y[vs, us]], axis=-1).reshape(-1, 2)
    rect_back = rectify.rectify_points(raw, K1, dist1, r.R1, r.K_new)
    expect = np.stack([us, vs], axis=-1).reshape(-1, 2).astype(np.float64)
    np.testing.assert_allclose(rect_back, expect, atol=2e-2)


def test_system_wires_rectification(rig):
    from orbslam3_cpp_fork_tpu.ops.camera import Camera
    from orbslam3_cpp_fork_tpu.runtime.system import System
    from orbslam3_cpp_fork_tpu.runtime.tracker import Sensor
    from orbslam3_cpp_fork_tpu.utils.settings import Settings

    K1, dist1, K2, dist2, T = rig
    s = Settings(
        camera_type="PinHole",
        camera=Camera.pinhole(
            K1[0, 0], K1[1, 1], K1[0, 2], K1[1, 2], dist=dist1
        ),
        camera2=Camera.pinhole(
            K2[0, 0], K2[1, 1], K2[0, 2], K2[1, 2], dist=dist2
        ),
        width=752,
        height=480,
        fps=20.0,
        rgb=False,
        n_features=500,
        scale_factor=1.2,
        n_levels=4,
        ini_th_fast=20,
        min_th_fast=7,
        Tlr=T,
        stereo_th_depth=35.0,
    )
    sys_ = System(s, Sensor.STEREO)
    assert sys_._rect is not None
    # Tracking camera is the rectified linear one: zero distortion.
    cam = sys_.tracker.cfg.camera
    assert float(np.abs(np.asarray(cam.dist)).max()) == 0.0
    assert sys_.tracker.cfg.bf == pytest.approx(
        sys_._rect.baseline * float(cam.fx), rel=1e-6
    )
    # One frame through the remap path (smoke: runs end to end).
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (480, 752)).astype(np.float32)
    sys_.track_stereo(img, img, 0.0)
