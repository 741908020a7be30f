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


def test_load_rejects_legacy(tmp_path):
    p = tmp_path / "settings.yaml"
    p.write_text("%YAML:1.0\nCamera.fx: 458.0\n")
    with pytest.raises(ValueError):
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
