"""Fisheye (KB8) stereo matching + triangulation and TUM-VI settings.

Covers the TPU equivalents of Frame::ComputeStereoFishEyeMatches
(src/Frame.cc:1304) and KannalaBrandt8::TriangulateMatches
(src/CameraModels/KannalaBrandt8.cpp:364), plus the unrectified-rig
System/Settings plumbing (Examples/Stereo-Inertial/TUM-VI.yaml schema).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orbslam3_cpp_fork_tpu.ops import stereo
from orbslam3_cpp_fork_tpu.ops.camera import Camera, project, undistort_points
from orbslam3_cpp_fork_tpu.datasets import tumvi


def _rig():
    cam1, cam2, T12 = tumvi.default_cameras()
    R_rl = T12[:3, :3].T
    t_rl = -R_rl @ T12[:3, 3]
    return cam1, cam2, R_rl.astype(np.float32), t_rl.astype(np.float32)


def _make_features(n, seed=0):
    """Random 3D points in the left camera + matched descriptors."""
    rng = np.random.default_rng(seed)
    # points in front of both cameras, inside the shared FOV
    theta = rng.uniform(0.0, 0.9, n)  # off-axis angle (rad)
    phi = rng.uniform(-np.pi, np.pi, n)
    z = rng.uniform(1.0, 8.0, n)
    r = np.tan(theta) * z
    X = np.stack([r * np.cos(phi), r * np.sin(phi), z], 1).astype(np.float32)
    bits = rng.integers(0, 2, (n, 256)).astype(np.int8)
    return X, bits


def test_fisheye_stereo_depth_recovery():
    cam1, cam2, R_rl, t_rl = _rig()
    n = 256
    X, bits = _make_features(n)
    uv_l = np.asarray(project(cam1, jnp.asarray(X)))
    Xr = X @ R_rl.T + t_rl
    uv_r = np.asarray(project(cam2, jnp.asarray(Xr)))
    inside = (
        (uv_l > 8).all(1) & (uv_l < 504).all(1)
        & (uv_r > 8).all(1) & (uv_r < 504).all(1)
        & (Xr[:, 2] > 0.1)
    )
    # right features shuffled so matching is non-trivial
    perm = np.random.default_rng(1).permutation(n)
    lvl = np.zeros(n, np.int32)
    depth, ray, ok = stereo.match_stereo_fisheye(
        jnp.asarray(bits), jnp.asarray(uv_l), jnp.asarray(lvl),
        jnp.asarray(inside),
        jnp.asarray(bits[perm]), jnp.asarray(uv_r[perm]), jnp.asarray(lvl),
        jnp.asarray(inside[perm]),
        cam1, cam2, jnp.asarray(R_rl), jnp.asarray(t_rl),
        jnp.float32(0.0), jnp.float32(512.0),
    )
    ok = np.asarray(ok)
    depth = np.asarray(depth)
    # The parallax gate (cos < 0.9998, KannalaBrandt8.cpp:388) rejects
    # far points at the 10 cm TUM-VI baseline — count only those with
    # enough parallax: angle > ~1.15 deg <=> z < ~baseline/tan.
    enough = inside & (X[:, 2] < 4.0)
    assert ok[enough].mean() > 0.8, (ok[enough].sum(), enough.sum())
    rel = np.abs(depth[ok] - X[ok, 2]) / X[ok, 2]
    assert np.median(rel) < 0.02, np.median(rel)
    # all accepted depths positive
    assert (depth[ok] > 0).all()


def test_fisheye_stereo_rejects_unmatched():
    cam1, cam2, R_rl, t_rl = _rig()
    n = 128
    X, bits = _make_features(n, seed=2)
    uv_l = np.asarray(project(cam1, jnp.asarray(X)))
    # right descriptors completely different -> nothing should match
    rng = np.random.default_rng(3)
    bits_r = rng.integers(0, 2, (n, 256)).astype(np.int8)
    lvl = np.zeros(n, np.int32)
    valid = np.ones(n, bool)
    depth, _, ok = stereo.match_stereo_fisheye(
        jnp.asarray(bits), jnp.asarray(uv_l), jnp.asarray(lvl), jnp.asarray(valid),
        jnp.asarray(bits_r), jnp.asarray(uv_l), jnp.asarray(lvl), jnp.asarray(valid),
        cam1, cam2, jnp.asarray(R_rl), jnp.asarray(t_rl),
        jnp.float32(0.0), jnp.float32(512.0),
    )
    assert int(np.asarray(ok).sum()) == 0


def test_kb8_undistort_to_pinhole_plane():
    cam1, _, _, _ = _rig()
    rng = np.random.default_rng(0)
    X = np.stack(
        [rng.uniform(-1, 1, 64), rng.uniform(-1, 1, 64), np.ones(64)], 1
    ).astype(np.float32) * rng.uniform(2, 6, (64, 1)).astype(np.float32)
    uv = project(cam1, jnp.asarray(X))
    ud = np.asarray(undistort_points(cam1, uv))
    fx, fy, cx, cy = 190.97847715128717, 190.9733070521226, 254.93170605935475, 256.8974428996504
    want_u = fx * X[:, 0] / X[:, 2] + cx
    want_v = fy * X[:, 1] / X[:, 2] + cy
    assert np.allclose(ud[:, 0], want_u, atol=0.1)
    assert np.allclose(ud[:, 1], want_v, atol=0.1)


def test_tumvi_settings_build_system(tmp_path):
    yaml_text = """%YAML:1.0
File.version: "1.0"
Camera.type: "KannalaBrandt8"
Camera1.fx: 190.978477
Camera1.fy: 190.973307
Camera1.cx: 254.931706
Camera1.cy: 256.897443
Camera1.k1: 0.003482
Camera1.k2: 0.000715
Camera1.k3: -0.002053
Camera1.k4: 0.000202
Camera2.fx: 190.44237
Camera2.fy: 190.434438
Camera2.cx: 252.599497
Camera2.cy: 254.917231
Camera2.k1: 0.003400
Camera2.k2: 0.001766
Camera2.k3: -0.002663
Camera2.k4: 0.000330
Stereo.T_c1_c2: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [0.999999, 0.000792, 0.000694, 0.101063,
         -0.000823, 0.998899, 0.046895, 0.001946,
         -0.000656, -0.046896, 0.998900, 0.001015,
         0.0, 0.0, 0.0, 1.0]
Camera1.overlappingBegin: 0
Camera1.overlappingEnd: 511
Camera2.overlappingBegin: 0
Camera2.overlappingEnd: 511
Camera.width: 512
Camera.height: 512
Camera.fps: 20
Camera.RGB: 1
ORBextractor.nFeatures: 256
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 4
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
IMU.NoiseGyro: 0.00016
IMU.NoiseAcc: 0.0028
IMU.GyroWalk: 0.000022
IMU.AccWalk: 0.00086
IMU.Frequency: 200.0
IMU.T_b_c1: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [-0.99953, 0.00930, -0.02907, 0.04536,
         0.02941, 0.01216, -0.99949, -0.07139,
         -0.00894, -0.99988, -0.01243, -0.04491,
         0.0, 0.0, 0.0, 1.0]
"""
    p = tmp_path / "tumvi.yaml"
    p.write_text(yaml_text)
    from orbslam3_cpp_fork_tpu.runtime.system import System
    from orbslam3_cpp_fork_tpu.runtime.tracker import Sensor

    slam = System(str(p), Sensor.IMU_STEREO)
    cfg = slam.tracker.cfg
    assert cfg.camera2 is not None
    assert cfg.camera2.kind == "kb8"
    # bf from baseline * fx: |t| ~ 0.1011 m
    assert abs(cfg.bf - 0.1011 * 190.978477) / cfg.bf < 0.01
    assert cfg.lapping_l == (0.0, 511.0)
    # R_rl is a rotation, t_rl ~ -R^T t
    assert np.allclose(cfg.R_rl @ cfg.R_rl.T, np.eye(3), atol=1e-5)
    assert abs(np.linalg.norm(cfg.t_rl) - 0.1011) < 1e-3
