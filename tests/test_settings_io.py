"""Settings loader + trajectory IO + ATE evaluation tests
(parity targets: src/Settings.cc via test/Settings_test.cc fixture style,
System::SaveTrajectoryTUM, evaluation/evaluate_ate_scale.py)."""

import numpy as np
import pytest

from orbslam3_cpp_fork_tpu.utils import trajectory, evaluation
from orbslam3_cpp_fork_tpu.utils.settings import load_settings
from orbslam3_cpp_fork_tpu.utils import lie
import jax.numpy as jnp

PINHOLE_YAML = """%YAML:1.0
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: 458.654
Camera1.fy: 457.296
Camera1.cx: 367.215
Camera1.cy: 248.375
Camera1.k1: -0.28340811
Camera1.k2: 0.07395907
Camera1.p1: 0.00019359
Camera1.p2: 0.00001762
Camera.width: 752
Camera.height: 480
Camera.fps: 20
Camera.RGB: 1
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""

IMU_EXTRA = """IMU.NoiseGyro: 1.7e-4
IMU.NoiseAcc: 2.0e-3
IMU.GyroWalk: 1.9e-5
IMU.AccWalk: 3.0e-3
IMU.Frequency: 200.0
IMU.T_b_c1: !!opencv-matrix
   rows: 4
   cols: 4
   dt: f
   data: [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975,
         0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768,
         -0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949,
         0.0, 0.0, 0.0, 1.0]
"""


def test_load_pinhole(tmp_path):
    p = tmp_path / "settings.yaml"
    p.write_text(PINHOLE_YAML)
    s = load_settings(str(p))
    assert s.camera_type == "PinHole"
    assert abs(float(s.camera.fx) - 458.654) < 1e-4
    assert s.width == 752 and s.height == 480
    assert s.n_features == 1000
    assert s.imu is None


def test_load_imu(tmp_path):
    p = tmp_path / "settings.yaml"
    p.write_text(PINHOLE_YAML + IMU_EXTRA)
    s = load_settings(str(p))
    assert s.imu is not None
    assert s.imu.frequency == 200.0
    assert s.imu.Tbc.shape == (4, 4)
    np.testing.assert_allclose(s.imu.Tbc[3], [0, 0, 0, 1])


LEGACY_YAML = """%YAML:1.0
Camera.type: "PinHole"
Camera.fx: 435.2046959714599
Camera.fy: 435.2046959714599
Camera.cx: 367.4517211914062
Camera.cy: 252.2008514404297
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: 752
Camera.height: 480
Camera.fps: 20.0
Camera.bf: 47.90639384423901
Camera.RGB: 1
ThDepth: 35.0
Tbc: !!opencv-matrix
   rows: 4
   cols: 4
   dt: f
   data: [1.0, 0.0, 0.0, 0.01,
          0.0, 1.0, 0.0, 0.02,
          0.0, 0.0, 1.0, 0.03,
          0.0, 0.0, 0.0, 1.0]
IMU.NoiseGyro: 1.7e-4
IMU.NoiseAcc: 2.0e-3
IMU.GyroWalk: 1.9e-5
IMU.AccWalk: 3.0e-3
IMU.Frequency: 200
ORBextractor.nFeatures: 1200
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
LEFT.height: 480
LEFT.width: 752
LEFT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data: [-0.28, 0.07, 0.0002, 1.8e-05, 0.0]
LEFT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [458.654, 0.0, 367.215, 0.0, 457.296, 248.375, 0.0, 0.0, 1.0]
LEFT.R: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
LEFT.P: !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [435.2046959714599, 0, 367.4517211914062, 0, 0, 435.2046959714599, 252.2008514404297, 0, 0, 0, 1, 0]
RIGHT.height: 480
RIGHT.width: 752
RIGHT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data: [-0.284, 0.074, -0.0001, 2.0e-05, 0.0]
RIGHT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [457.587, 0.0, 379.999, 0.0, 456.134, 255.238, 0.0, 0.0, 1.0]
RIGHT.R: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
RIGHT.P: !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [435.2046959714599, 0, 367.4517211914062, -47.90639384423901, 0, 435.2046959714599, 252.2008514404297, 0, 0, 0, 1, 0]
"""

LEGACY_FISHEYE_YAML = """%YAML:1.0
Camera.type: "KannalaBrandt8"
Camera.fx: 190.978477
Camera.fy: 190.973307
Camera.cx: 254.931706
Camera.cy: 256.897443
Camera.k1: 0.003482389402
Camera.k2: 0.000715034845
Camera.k3: -0.002053236141
Camera.k4: 0.000202936736
Camera2.fx: 190.44236969414825
Camera2.fy: 190.4344384721956
Camera2.cx: 252.59949716835982
Camera2.cy: 254.91723064636983
Camera2.k1: 0.0034003170790442797
Camera2.k2: 0.001766278153469831
Camera2.k3: -0.00266312569781606
Camera2.k4: 0.0003299517423931039
Tlr: !!opencv-matrix
   rows: 3
   cols: 4
   dt: f
   data: [0.999997, -0.002318, 0.000343, 0.101063,
          0.002312, 0.999898, 0.014060, -0.001946,
          -0.000376, -0.014059, 0.999901, 0.000931]
Camera.lappingBegin: 0
Camera.lappingEnd: 511
Camera2.lappingBegin: 0
Camera2.lappingEnd: 511
Camera.width: 512
Camera.height: 512
Camera.fps: 20.0
Camera.RGB: 1
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


def test_load_legacy_pinhole_inertial(tmp_path):
    """Pre-1.0 flat-key schema (Tracking::Parse*ParamFile,
    src/Tracking.cc:604-1308; Examples_old/Stereo-Inertial/EuRoC.yaml)."""
    p = tmp_path / "legacy.yaml"
    p.write_text(LEGACY_YAML)
    s = load_settings(str(p))
    assert s.camera_type == "PinHole"
    assert abs(float(s.camera.fx) - 435.2046959714599) < 1e-4
    assert s.bf == pytest.approx(47.90639384423901)
    assert s.stereo_th_depth == 35.0
    assert s.n_features == 1200
    assert s.imu is not None and s.imu.frequency == 200.0
    np.testing.assert_allclose(s.imu.Tbc[:3, 3], [0.01, 0.02, 0.03], atol=1e-6)
    # Explicit LEFT/RIGHT rectification blocks parsed.
    assert s.left_rect is not None and s.right_rect is not None
    assert s.left_rect["K"].shape == (3, 3)
    assert s.right_rect["P"].shape == (3, 4)
    np.testing.assert_allclose(s.right_rect["P"][0, 3], -47.9064, atol=1e-3)


def test_load_legacy_fisheye_stereo(tmp_path):
    p = tmp_path / "legacy_kb8.yaml"
    p.write_text(LEGACY_FISHEYE_YAML)
    s = load_settings(str(p))
    assert s.camera_type == "KannalaBrandt8"
    assert s.camera2 is not None
    assert s.lapping1 == (0.0, 511.0)
    assert s.Tlr is not None
    np.testing.assert_allclose(s.Tlr[0, 3], 0.101063, atol=1e-5)


def test_load_rejects_malformed(tmp_path):
    p = tmp_path / "settings.yaml"
    p.write_text("%YAML:1.0\nSomething.else: 1\n")
    with pytest.raises((ValueError, KeyError)):
        load_settings(str(p))


def test_load_rejects_unknown_camera(tmp_path):
    p = tmp_path / "settings.yaml"
    p.write_text(PINHOLE_YAML.replace('"PinHole"', '"Weird"'))
    with pytest.raises((ValueError, KeyError)):
        load_settings(str(p))


def test_tum_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    n = 20
    ts = np.cumsum(rng.uniform(0.01, 0.1, n))
    T = np.tile(np.eye(4), (n, 1, 1))
    T[:, :3, :3] = np.asarray(
        lie.so3_exp(jnp.asarray(rng.normal(0, 0.5, (n, 3)).astype(np.float32)))
    )
    T[:, :3, 3] = rng.normal(0, 2.0, (n, 3))
    path = str(tmp_path / "traj.txt")
    trajectory.write_tum(path, ts, T)
    ts2, T2 = trajectory.read_tum(path)
    np.testing.assert_allclose(ts2, ts, atol=1e-6)
    np.testing.assert_allclose(T2, T, atol=1e-5)


def test_ate_alignment_recovers_sim3():
    rng = np.random.default_rng(6)
    n = 50
    ts = np.arange(n) * 0.1
    gt = np.cumsum(rng.normal(0, 0.1, (n, 3)), axis=0)
    R = np.asarray(lie.so3_exp(jnp.asarray([0.3, -0.2, 0.9])))
    est = 2.5 * (gt @ R.T) + np.array([4.0, -2.0, 1.0])
    # est = s R gt + t; evaluation must align it back with zero error.
    res = evaluation.ate_rmse(ts, est, ts, gt)
    assert res.n_pairs == n
    assert res.rmse_scaled < 1e-5
    assert abs(res.scale - 1 / 2.5) < 1e-6


def test_ate_unit_vs_scaled():
    rng = np.random.default_rng(7)
    n = 40
    ts = np.arange(n) * 0.1
    gt = np.cumsum(rng.normal(0, 0.1, (n, 3)), axis=0)
    est = 1.5 * gt  # pure scale error
    res = evaluation.ate_rmse(ts, est, ts, gt)
    assert res.rmse_scaled < 1e-6
    assert res.rmse > 0.01  # unit-scale error stays visible
